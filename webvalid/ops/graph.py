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
memory the known fix is the alternating large-star/small-star
iteration (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14) expressed as repeated groupby rounds; not needed at
this engine's design point and intentionally not implemented.

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
        self-edges for singletons, preserving isolated nodes."""
        roots = {x: self.find(x) for x in list(self.parent)}
        a = np.fromiter(roots.values(), dtype=np.int64, count=len(roots))
        b = np.fromiter(roots.keys(), dtype=np.int64, count=len(roots))
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
