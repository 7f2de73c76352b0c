"""Drift detection: reference-parity CDCStream / CDDA math + folds.

CDCStream (Ienco et al.): per-block DILCA distance-matrix summary +
mean/sigma control chart — see `dilca.py` / `cdcstream.py`.
CDDA: rough-set change degree over consecutive block pairs — `cdda.py`.
"""

from webvalid.drift.dilca import block_summary, encode_columns
from webvalid.drift.cdcstream import control_chart_fold, JAVA_DOUBLE_MIN, JAVA_DOUBLE_MAX
from webvalid.drift.cdda import change_degree, cdda_fold, column_histograms

__all__ = [
    "block_summary",
    "encode_columns",
    "control_chart_fold",
    "change_degree",
    "cdda_fold",
    "column_histograms",
    "JAVA_DOUBLE_MIN",
    "JAVA_DOUBLE_MAX",
]
