"""Distributed connected components over a pair-edge Dataset.

The dedup family (MinHash/SimHash/embedding near-dup) produces verified
candidate PAIRS; grouping them into duplicate clusters is a connected-
components problem.  Rounds 1-2 ran union-find on the driver under the
documented assumption |pairs| ≪ |docs| — this module removes that driver
assumption: past ``driver_limit`` edges the components are computed by
ITERATIVE MIN-LABEL PROPAGATION entirely inside Ray Data:

    labels ← (node, node)                      # init: every node labels itself
    repeat:
        prop   = edges  ⋈ labels on src        # neighbours' labels
        jump   = labels ⋈ labels on label=node # pointer jumping: l(l(n))
        labels = (labels ∪ prop ∪ jump).groupby(node).Min(label)
        stop when sum(label) is unchanged      # labels only ever decrease

i.e. l'(n) = min(l(n), min_{v∈N(n)} l(v), l(l(n))).  Both GRACE bucket
joins and the Min fold fuse into ONE streaming execution per round over
(node, label) pairs — never the raw documents.  The pointer-jumping term
halves the remaining label-chain depth every round, so convergence is
O(log diameter) rounds instead of O(diameter), and the shallow clusters
near-dup actually produces converge in 2-3.  The label table is
repartitioned to a fixed block count before each materialize — without
that, every round's union(+join fan-out) compounds the block count and
round N pays O(N) scheduling overhead for the same data.  The label is
the MIN node id of the component — the same canonical representative the
driver union-find produces, so both paths are interchangeable and
equality-tested.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _union_find_components(a: np.ndarray, b: np.ndarray) -> pd.DataFrame:
    """Driver path: classic union-find with min-id representatives."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx
    nodes = sorted(set(a.tolist()) | set(b.tolist()))
    return pd.DataFrame({"node": nodes,
                         "component": [find(n) for n in nodes]})


def connected_components(pairs_ds, a_col: str = "a", b_col: str = "b",
                         max_iters: int = 50,
                         driver_limit: int = 2_000_000,
                         n_buckets: int = 64, n_blocks: int = 32):
    """(node, component) for the undirected graph of (a, b) edges;
    ``component`` = min node id in the component.  Node ids must be int64.

    Under ``driver_limit`` edges the fold is driver-side union-find (the
    |pairs| ≪ |docs| near-dup case); past it the distributed min-label
    propagation above runs — the 100 TB path, where neither the edge list
    nor the label table ever lands on the driver (only the scalar
    fixpoint aggregate does).  ``n_buckets`` sizes the GRACE joins so a
    bucket fits a worker heap; ``n_blocks`` is the fixed label-table
    block count (≈ cluster cores).  Returns pandas under the limit, a
    Dataset of (node, component) above it.
    """
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Min

    from timberjack_ray.functions.relational import bucket_hash_join
    from timberjack_ray.functions.util import collect_table_under

    small = collect_table_under(pairs_ds, driver_limit)
    if small is not None:
        a = small[a_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = small[b_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out = _union_find_components(a, b)
        out.attrs["mode"] = "driver"
        return out

    # distributed: materialize both edge directions once (consumed every
    # round), labels start as (node, node)
    def both_dirs(t: pa.Table) -> pa.Table:
        a = pc.cast(t[a_col], pa.int64())
        b = pc.cast(t[b_col], pa.int64())
        return pa.table({
            "src": pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a,
                                     b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b]),
            "dst": pa.concat_arrays([b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b,
                                     a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a]),
        })

    edges = pairs_ds.map_batches(both_dirs, batch_format="pyarrow") \
        .repartition(n_blocks).materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["src"], "label": t["src"]})

    labels = edges.map_batches(init_labels, batch_format="pyarrow") \
        .groupby("node").aggregate(Min("label", alias_name="label")) \
        .repartition(n_blocks).materialize()

    def as_nl(node_col: str, label_col: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({"node": t[node_col], "label": t[label_col]})
        return f

    prev_sum = None
    for _ in range(max_iters):
        # propagate: every edge carries its src's label to dst
        prop = bucket_hash_join(
            edges, labels, "src", "node",
            left_cols=["dst"], right_cols=["label"], n_buckets=n_buckets) \
            .map_batches(as_nl("dst", "label"), batch_format="pyarrow")
        # pointer jumping on the CURRENT labels: l(l(n)) — still halves
        # chain depth at the fixpoint and lets prop+jump+Min fuse into one
        # streaming execution per round
        lhs = labels.map_batches(
            lambda t: pa.table({"lbl": t["label"], "child": t["node"]}),
            batch_format="pyarrow")
        rhs = labels.map_batches(
            lambda t: pa.table({"node2": t["node"], "lbl2": t["label"]}),
            batch_format="pyarrow")
        jump = bucket_hash_join(lhs, rhs, "lbl", "node2",
                                left_cols=["child"], right_cols=["lbl2"],
                                n_buckets=n_buckets) \
            .map_batches(as_nl("child", "lbl2"), batch_format="pyarrow")
        labels = labels.union(prop).union(jump).groupby("node") \
            .aggregate(Min("label", alias_name="label")) \
            .repartition(n_blocks).materialize()
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.map_batches(
        lambda t: pa.table({"node": t["node"],
                            "component": t["label"]}),
        batch_format="pyarrow")


# -- deterministic integer PageRank -----------------------------------------

PAGERANK_TOTAL = 10**12  # fixed-point rank budget (1.0 == 10^12)


def _pagerank_driver(u: np.ndarray, v: np.ndarray, n_iter: int,
                     total: int = PAGERANK_TOTAL) -> pd.DataFrame:
    """Driver path: exact integer PageRank (numpy bincount loop)."""
    if len(u) == 0:
        return pd.DataFrame({"node": np.array([], np.int64),
                             "rank_fp": np.array([], np.int64)})
    nodes = np.unique(np.concatenate([u, v]))
    ui = np.searchsorted(nodes, u)
    vi = np.searchsorted(nodes, v)
    deg = np.bincount(ui, minlength=len(nodes)).astype(np.int64)
    r0 = total // len(nodes)
    base = (15 * r0) // 100
    r = np.full(len(nodes), r0, dtype=np.int64)
    for _ in range(n_iter):
        contrib = r[ui] // deg[ui]
        inflow = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(inflow, vi, contrib)
        r = base + (85 * inflow) // 100
    return pd.DataFrame({"node": nodes, "rank_fp": r})


def pagerank_int(edges_ds, u_col: str = "u", v_col: str = "v",
                 n_iter: int = 3, driver_limit: int = 2_000_000,
                 n_buckets: int = 64, n_blocks: int = 32,
                 total: int = PAGERANK_TOTAL):
    """PageRank on the INTEGER fixed-point domain (rank in ``total`` units,
    damping 0.85 as ``85·x // 100``, per-edge contribution ``r // outdeg``)
    — every operation is an int64 sum or floor-division, so the result is
    order-independent, bit-reproducible across both execution paths, and
    replayable by a SQL oracle with unrolled iterations.  Dangling nodes
    simply leak their mass (standard simplification; deterministic).

    Under ``driver_limit`` edges: one numpy loop.  Past it, the 100-TB
    path mirrors ``connected_components``: edges materialized once; per
    round (a) GRACE join edges ⋈ state on the src to emit per-edge
    integer contributions, (b) groupby-sum inflow per dst, (c) GRACE
    LEFT-OUTER join state ⋈ inflow to apply base + damped inflow (nodes
    with no in-edges keep the base term).  State is (node, rank, outdeg)
    — node-volume, never the driver's.  Returns pandas under the limit,
    a Dataset of (node, rank_fp) above it.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from timberjack_ray.functions.relational import bucket_hash_join
    from timberjack_ray.functions.util import collect_table_under

    small = collect_table_under(edges_ds, driver_limit)
    if small is not None:
        u = small[u_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = small[v_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out = _pagerank_driver(u, v, n_iter, total)
        out.attrs["mode"] = "driver"
        return out

    from ray.data.aggregate import Count

    edges = edges_ds.map_batches(
        lambda t: pa.table({"u": pc.cast(t[u_col], pa.int64()),
                            "v": pc.cast(t[v_col], pa.int64())}),
        batch_format="pyarrow").repartition(n_blocks).materialize()

    # node table with outdeg (0 for sink-only nodes)
    def nodes_of(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays([t["u"].combine_chunks(),
                                 t["v"].combine_chunks()])
        return pa.table({"node": both.unique()})

    nodes = edges.map_batches(nodes_of, batch_format="pyarrow") \
        .groupby("node").aggregate(Count(alias_name="_c")) \
        .map_batches(lambda t: pa.table({"node": t["node"]}),
                     batch_format="pyarrow")
    degs = edges.map_batches(
        lambda t: pa.table({"node": t["u"]}), batch_format="pyarrow") \
        .groupby("node").aggregate(Count(alias_name="outdeg"))
    n = nodes.count()
    if n == 0:  # zero-row input: collect_table_under bails on empty
        out = pd.DataFrame({"node": np.array([], np.int64),
                            "rank_fp": np.array([], np.int64)})
        out.attrs["mode"] = "driver"
        return out
    r0 = total // n
    base = (15 * r0) // 100

    state = bucket_hash_join(
        nodes, degs, "node", "node", left_cols=[], right_cols=["outdeg"],
        n_buckets=n_buckets, join_type="left outer") \
        .map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "rank_fp": pa.array(np.full(t.num_rows, r0, np.int64)),
                "outdeg": pc.coalesce(pc.cast(t["outdeg"], pa.int64()), 0)}),
            batch_format="pyarrow").repartition(n_blocks).materialize()

    def contribs(t: pa.Table) -> pa.Table:
        r = t["rank_fp"].to_numpy(zero_copy_only=False)
        d = t["outdeg"].to_numpy(zero_copy_only=False)
        return pa.table({"node": t["v"],
                         "c": pa.array(r // np.maximum(d, 1))})

    for _ in range(n_iter):
        inflow = bucket_hash_join(
            edges, state, "u", "node",
            left_cols=["v"], right_cols=["rank_fp", "outdeg"],
            n_buckets=n_buckets) \
            .map_batches(contribs, batch_format="pyarrow") \
            .groupby("node").aggregate(Sum("c", alias_name="inflow"))

        def apply_rank(t: pa.Table) -> pa.Table:
            s = pc.coalesce(pc.cast(t["inflow"], pa.int64()), 0) \
                .to_numpy(zero_copy_only=False)
            return pa.table({"node": t["node"],
                             "rank_fp": pa.array(base + (85 * s) // 100),
                             "outdeg": t["outdeg"]})

        state = bucket_hash_join(
            state, inflow, "node", "node",
            left_cols=["rank_fp", "outdeg"], right_cols=["inflow"],
            n_buckets=n_buckets, join_type="left outer") \
            .map_batches(apply_rank, batch_format="pyarrow") \
            .repartition(n_blocks).materialize()

    return state.map_batches(
        lambda t: pa.table({"node": t["node"], "rank_fp": t["rank_fp"]}),
        batch_format="pyarrow")
