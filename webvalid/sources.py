"""Sources: Parquet (canonical) + CSV compat reader for categorical streams.

The reference consumes headerless CSV with every field an opaque
categorical string (reference: DataStreamReader/CategoricalRecordStreamReader.java:42-49,
65-72; header skip :46-48). `read_categorical_csv` reproduces that
contract on Ray Data: all columns read as strings (no type inference),
columns named c0..c{m-1}, and an explicit `row_index` column baked in
so the stream order survives Ray's unordered execution (the engine's
replacement for the reader's countSoFar cursor,
DataStreamReader.java:57-62 — SURVEY.md §2.1 S4).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv

import ray.data


def read_categorical_csv(path: str, has_header: bool = False,
                         num_columns: int | None = None):
    """Ray Dataset over a categorical CSV, all columns as strings.

    With `has_header=False` (the reference's mode, Main.java:30)
    columns are named c0..c{m-1}; `num_columns` may be given to skip
    sniffing. Row order → `row_index` column, assigned from the file's
    physical order (single file, read as one block then repartitioned —
    order is baked into the column, not the runtime).
    """
    if num_columns is None:
        # sniff arity from the first line
        with open(path, "rb") as f:
            first = f.readline().decode("utf-8", "replace").rstrip("\r\n")
        num_columns = first.count(",") + 1

    names = [f"c{i}" for i in range(num_columns)]
    read_opts = pacsv.ReadOptions(
        column_names=None if has_header else names,
        autogenerate_column_names=False,
    )
    convert_opts = pacsv.ConvertOptions(
        column_types={n: pa.string() for n in names} if not has_header else None,
    )
    table = pacsv.read_csv(path, read_options=read_opts, convert_options=convert_opts)
    if has_header:
        # force every column to string regardless of inferred types
        table = pa.table(
            {n: table[n].cast(pa.string()) for n in table.column_names}
        )
    table = table.append_column(
        "row_index", pa.array(range(table.num_rows), pa.int64())
    )
    return ray.data.from_arrow(table).repartition(max(1, table.num_rows // 50_000))


def csv_drift_segments(path: str, block_size: int, has_header: bool = False,
                       drift_coefficient: float = 3.0, min_change_degree: float = 0.1):
    """Run BOTH reference detectors over a categorical CSV, Ray-side.

    The exact pipeline of Main.runCDCStream / runCDDA (Main.java:26-40)
    re-expressed: partition by row_index // block_size, per-partition
    count states via map_batches, sequential folds. Returns
    {"cdcstream": [(start, end)...], "cdda": [...]}.
    """
    import pickle

    import pyarrow.compute as pc

    from webvalid.checks.drift_check import DriftPartial, merge_drift_state_dicts
    from webvalid.drift.cdcstream import control_chart_fold
    from webvalid.drift.cdda import cdda_fold
    from webvalid.drift.dilca import BlockStatistics, summary_of_stats
    from webvalid.pipeline import merge_keyed_states

    ds = read_categorical_csv(path, has_header=has_header)
    cols = tuple(c for c in ds.schema().names if c != "row_index")

    def add_pid(t: pa.Table) -> pa.Table:
        pid = pc.divide(t["row_index"], pa.scalar(block_size, pa.int64()))
        return t.append_column("partition_id", pid)

    partials = ds.map_batches(add_pid, batch_format="pyarrow").map_batches(
        DriftPartial(cols), batch_format="pyarrow"
    )
    merged = merge_keyed_states(partials, ("partition_id",), pickle.loads,
                                merge_drift_state_dicts)
    merged.sort(key=lambda r: r["partition_id"])
    states = [pickle.loads(r["state"]) for r in merged]
    sizes = [s["n"] for s in states]
    summaries = [
        summary_of_stats(BlockStatistics.from_counts(s["value_counts"], s["pairs"]))
        for s in states
    ]
    cdc_segments, _ = control_chart_fold(summaries, sizes, drift_coefficient)
    histograms = [s["value_counts"] for s in states]
    cdda_segments, _, _ = cdda_fold(histograms, sizes, min_change_degree)
    return {"cdcstream": cdc_segments, "cdda": cdda_segments}


def read_parquet_evolving(paths: list):
    """Schema-evolution-tolerant parquet read: files may be missing
    columns added later (or carry extras). The union schema is taken
    over the FOOTERS only (no data IO), and each file's Dataset is
    mapped through a batch transform that appends the missing columns
    as typed nulls — the explicit Ray-side version of DuckDB's
    union_by_name. Column order follows the union of first
    appearance; types must agree where columns overlap."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data

    schemas = [pq.read_schema(p) for p in paths]
    union: dict[str, pa.DataType] = {}
    for s in schemas:
        for f in s:
            if f.name in union:
                if union[f.name] != f.type:
                    raise ValueError(
                        f"column {f.name!r} type mismatch across files: "
                        f"{union[f.name]} vs {f.type}")
            else:
                union[f.name] = f.type
    names = list(union)

    def align(t: pa.Table) -> pa.Table:
        cols = []
        for name in names:
            if name in t.column_names:
                cols.append(t[name])
            else:
                cols.append(pa.nulls(t.num_rows, union[name]))
        return pa.table(dict(zip(names, cols)))

    parts = [ray.data.read_parquet(p).map_batches(align,
                                                  batch_format="pyarrow")
             for p in paths]
    return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
