"""Distributed connected components over an edge Dataset.

The dedup family (`ops/dedup.py`) emits near-duplicate PAIRS; turning
pairs into cluster assignments ("keep one doc per component") is a
connected-components problem. This module computes exact components
with the engine's mergeable-state pattern:

1. **Block-local contraction**: each edge batch is folded into a
   union-find and re-emitted as its spanning FOREST — at most
   (#distinct nodes in the batch − #components) edges, i.e. the batch
   graph minus every cycle. This is the associative partial state:
   components(edges) == components(forest(edges₁) ∪ forest(edges₂) ∪ …).
2. **Coalesced merge rounds**: forests from many batches merge in a
   second block-local round (Ray coalesces partial blocks via a large
   batch_size), shrinking again to a forest.
3. **Driver finish**: the final union-find runs over the last forest —
   O(#distinct nodes), never O(#edges).

Scale: the driver holds one int per distinct NODE, not per edge or per
row. For dedup graphs node-count ≪ corpus row-count (only docs that
appear in some candidate pair are nodes). For node sets beyond driver
memory, `connected_components_starlike` implements the alternating
large-star/small-star iteration (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) as repeated node-keyed groupby
rounds — fully distributed, the driver only sees an O(1) convergence
fingerprint per round.

Component labels are canonical: the MINIMUM node id in the component
(stable across partitionings; SQL-twinnable via a recursive CTE).

No reference analogue; north-rule/training-data addition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class _DSU:
    """Union-find with path halving; node ids are arbitrary ints."""

    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        r = p.setdefault(x, x)
        while r != p[r]:
            p[r] = p[p[r]]
            r = p[r]
        # path-halve the query chain too
        while p[x] != r:
            p[x], x = r, p[x]
        return r

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # root at the smaller id so labels are canonical as we go
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra

    def forest_table(self, src: str = "src", dst: str = "dst") -> pa.Table:
        """(root, node) edges for every non-root node + (root, root)
        self-edges ONLY for singletons, preserving isolated nodes.
        Emitting a self-edge for every root (as an earlier version did)
        doubles a perfect matching instead of contracting it — the
        forest bound is #nodes − #components + #singletons rows."""
        roots = {x: self.find(x) for x in list(self.parent)}
        r = np.fromiter(roots.values(), dtype=np.int64, count=len(roots))
        node = np.fromiter(roots.keys(), dtype=np.int64, count=len(roots))
        non_root = node != r
        uniq, counts = np.unique(r, return_counts=True)
        singles = uniq[counts == 1]
        a = np.concatenate([r[non_root], singles])
        b = np.concatenate([node[non_root], singles])
        return pa.table({src: pa.array(a), dst: pa.array(b)})

    def components(self) -> pd.DataFrame:
        nodes = sorted(self.parent)
        return pd.DataFrame(
            {"node": nodes, "component": [self.find(n) for n in nodes]}
        )


def _contract(batch: pa.Table, src: str, dst: str) -> pa.Table:
    dsu = _DSU()
    a = batch[src].to_numpy(zero_copy_only=False)
    b = batch[dst].to_numpy(zero_copy_only=False)
    for x, y in zip(a.tolist(), b.tolist()):
        dsu.union(x, y)
    return dsu.forest_table(src, dst)


def connected_components(edges_ds, src: str = "src", dst: str = "dst",
                         merge_batch_rows: int = 262144) -> pd.DataFrame:
    """(node, component) for every node appearing in `edges_ds`.

    `component` is the minimum node id reachable from `node`.
    """
    contracted = edges_ds.map_batches(
        lambda t: _contract(t, src, dst), batch_format="pyarrow"
    )
    # coalescing merge round: many small forests → few bigger forests
    merged = contracted.map_batches(
        lambda t: _contract(t, src, dst),
        batch_format="pyarrow", batch_size=merge_batch_rows,
    )
    final = _DSU()
    for t in merged.iter_batches(batch_format="pyarrow", batch_size=merge_batch_rows):
        a = t[src].to_numpy(zero_copy_only=False)
        b = t[dst].to_numpy(zero_copy_only=False)
        for x, y in zip(a.tolist(), b.tolist()):
            final.union(x, y)
    return final.components()


def dedup_components(pairs_ds, a_col: str = "doc_a", b_col: str = "doc_b") -> pd.DataFrame:
    """Cluster assignment from a near-duplicate pair table: one row per
    implicated doc, labeled by the minimum doc id of its cluster."""
    def rn(t: pa.Table) -> pa.Table:
        # not Dataset.rename_columns: that breaks on pandas-backed
        # blocks (from_pandas) on this Ray build
        return pa.table({"src": t[a_col], "dst": t[b_col]})

    return connected_components(pairs_ds.map_batches(rn, batch_format="pyarrow"))


def _star_round(edges_ds, phase: str, num_buckets: int = 64):
    """One large-star or small-star round (Kiveris et al., SoCC'14).

    Input/output: canonical DIRECTED edge table (src > dst is not
    assumed on input; output edges point child → candidate-center).

    Scale shape: neighborhoods are co-located by ONE groupby on
    `hash-bucket(u)` — O(num_buckets) Python calls per round, never
    O(#nodes) (the r3 version paid a `map_groups` call per node). Each
    bucket holds COMPLETE node neighborhoods by construction, so the
    per-bucket kernel is a pure vectorized run-kernel over a
    (u, v)-lexsorted view: run starts via diff, per-run min = first v
    of the run, per-row emission by mask, per-run fallbacks via
    logical_or.reduceat. Partitioning assumption: one bucket's edges
    fit a worker (bucket ≈ |E|·2/num_buckets rows; a single node's
    neighborhood cannot be split for a star round, same contract as
    the as-of join's key buckets)."""

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["src"].to_numpy(zero_copy_only=False)
        b = t["dst"].to_numpy(zero_copy_only=False)
        # per-batch dedup BEFORE the shuffle: raw pair tables (e.g. one
        # edge per event row) shrink by orders of magnitude here
        pairs = np.unique(np.stack([np.concatenate([a, b]),
                                    np.concatenate([b, a])], axis=1), axis=0)
        u = pairs[:, 0]
        # numpy % with a positive divisor is non-negative for any sign
        return pa.table({"u": pa.array(u),
                         "v": pa.array(pairs[:, 1]),
                         "ub": pa.array(u % np.int64(num_buckets))})

    def star_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        # exact global dedup within the bucket (sorted → dups adjacent);
        # mirrors the old per-group np.unique, keeping round outputs a
        # duplicate-free set so the convergence fingerprint is stable
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        u, v = u[keep], v[keep]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        lens = np.diff(np.r_[starts, len(u)])
        run_u = u[starts]
        run_m = np.minimum(run_u, v[starts])  # sorted: first v = min(nbrs)
        m_rows = np.repeat(run_m, lens)
        if phase == "large":
            mask = v > u  # m <= u < v, so targets never collide with m
            any_gt = np.logical_or.reduceat(mask, starts)
            fb = ~any_gt  # no larger neighbor: self-loop at current min
            src = np.concatenate([v[mask], run_u[fb]])
            dst = np.concatenate([m_rows[mask], run_m[fb]])
        else:
            # small-star: ≤-neighbors (minus the center and u itself —
            # u's own edge to m is emitted once per run below, which
            # reduces to the (u, u) keep-alive when u IS the center)
            mask = (v <= u) & (v != m_rows) & (v != u)
            src = np.concatenate([v[mask], run_u])
            dst = np.concatenate([m_rows[mask], run_m])
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    doubled = edges_ds.map_batches(both_dirs, batch_format="pyarrow")
    return doubled.groupby("ub").map_groups(star_bucket,
                                            batch_format="pyarrow")


def connected_components_starlike(edges_ds, src: str = "src", dst: str = "dst",
                                  max_rounds: int = 50) -> pd.DataFrame:
    """Exact connected components via alternating large-star/small-star
    rounds — NOTHING corpus-sized ever reaches the driver (per round:
    two node-keyed groupby shuffles; the driver sees only an O(1)
    convergence fingerprint). The scale path for node sets beyond
    driver memory; `connected_components` (forest contraction +
    O(#nodes) driver finish) is faster when the node set fits.

    Converges in O(log² n) rounds to star graphs centered at each
    component's minimum id; returns (node, component) like the DSU
    path (equivalence-tested).
    """
    from webvalid.sketches import hash64

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"src": t[src].cast(pa.int64()),
                         "dst": t[dst].cast(pa.int64())})

    cur = edges_ds.map_batches(rename, batch_format="pyarrow")

    def fingerprint(ds) -> tuple[int, int]:
        # order-insensitive edge-MULTISET hash: per-batch sums stay raw
        # uint64 (mod-2^64 wrap is linear, so the value is independent
        # of how Ray happened to partition the blocks); the driver sums
        # with the same wrap. A per-batch mod 2^63 here would make the
        # fingerprint partition-layout-dependent and converged graphs
        # could "never" converge.
        def fp(t: pa.Table) -> pa.Table:
            a = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
            b = t["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                mix = hash64(a * np.uint64(0x9E3779B97F4A7C15) ^ b)
                h = np.uint64(0) if len(mix) == 0 else mix.sum()  # sum only: linear
            return pa.table({"h": pa.array([int(h)], pa.uint64()),
                             "n": pa.array([len(a)], pa.int64())})

        parts = ds.map_batches(fp, batch_format="pyarrow").to_pandas()
        if len(parts) == 0:
            return (0, 0)
        h = int(parts["h"].astype(np.uint64).sum()) % (1 << 64)
        return (h, int(parts["n"].sum()))

    # materialize once: the emptiness check and round 1 both consume
    # `cur`, and the upstream edge pipeline (e.g. an LSH candidate
    # generator) can be expensive to recompute
    cur = cur.materialize()
    if cur.count() == 0:  # empty edge set → no components
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "component": pd.Series([], dtype="int64")})

    prev_fp = None
    for _ in range(max_rounds):
        cur = _star_round(cur, "large").materialize()
        cur = _star_round(cur, "small").materialize()
        cur_fp = fingerprint(cur)
        if cur_fp == prev_fp:
            break
        prev_fp = cur_fp
    else:
        raise RuntimeError(f"no convergence in {max_rounds} star rounds")

    # converged: every edge points node → its component min (stars);
    # emit (node, component) incl. the centers themselves
    def emit(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": pa.concat_arrays([t["src"].combine_chunks(),
                                      t["dst"].combine_chunks()]),
            "component": pa.concat_arrays([t["dst"].combine_chunks(),
                                           t["dst"].combine_chunks()]),
        })

    out = cur.map_batches(emit, batch_format="pyarrow").to_pandas()
    out = out.groupby("node", as_index=False)["component"].min()
    return out.sort_values("node").reset_index(drop=True)
