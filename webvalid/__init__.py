"""webvalid — a Ray-Data-native schema + constraint validation engine.

Validates Common-Crawl-style Parquet tables (url, warc_ts, html, text,
lang) at scale: per-partition column statistics (null fraction, min/max,
HyperLogLog distinct counts, TDigest quantiles), uniqueness via
groupby-count shuffles, referential integrity via broadcast / salted hash
joins, and per-column distribution-drift detection (CDCStream / CDDA
reference parity plus KS and chi-squared tests over mergeable sketches).

Drift-detection semantics reproduce `enezhadian/drift-detection`
(reference at /root/reference; see webvalid/drift/*). Everything runs as
`ray.data.Dataset` pipelines of `map_batches` over zero-copy Arrow
batches; no module in this package calls `ray.init()`.
"""

__version__ = "0.1.0"
