"""Driver contract for the graft builder (Ray Data target).

``entry()`` — flagship parse→enrich→route→aggregate pipeline on the
synthesized sequences table (sf0.001 scale).  ``queries()`` — one entry per
implemented operator family from SURVEY.md §2 (+ the training-data ops),
each runnable on the driver's testdata tables; ``oracle_sql()`` — DuckDB
equivalents for every SQL-expressible query (same column names, so the
driver's order-insensitive value-hash comparison matches).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _rp(sf_dir: str, name: str, columns=None):
    import ray.data as rd

    from timberjack_ray.rayctx import tune_for_cluster

    tune_for_cluster()
    return rd.read_parquet(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def _splitmix_col(col) -> "np.ndarray":
    """Shared SQL-replayable column hasher for the HLL queries: splitmix64
    over the integer ids (the chain the hll_register_hist oracle replays)."""
    from timberjack_ray.functions.corpus import _splitmix64

    return _splitmix64(np.asarray(
        col.to_numpy(zero_copy_only=False)).astype(np.uint64))


_RESULT_FOLD_LIMIT = 5_000_000


def _collect_result(ds, limit: int = _RESULT_FOLD_LIMIT) -> pa.Table:
    """Driver-side fold for RESULT- or PARTIAL-sized datasets — the
    return-a-DataFrame gate contract's one legitimate materialization,
    made guard-visible (VERDICT r4 #4): streams through
    ``collect_table_under`` and RAISES past ``limit`` rows instead of
    silently holding an unbounded table.  A query whose result outgrows
    the limit must return the Dataset for the caller to stream/write.
    Empty inputs return a typed empty table from the Dataset schema."""
    frames: list[pa.Table] = []
    total = 0
    schema = None
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        if schema is None:
            schema = b.schema
        total += b.num_rows
        if total > limit:
            raise ValueError(
                f"query result exceeded the driver fold contract "
                f"({limit} rows) — stream the Dataset instead")
        if b.num_rows:
            frames.append(b)
    if frames:
        return pa.concat_tables(frames)
    if schema is not None:  # empty result, typed from the streamed blocks
        return schema.empty_table()
    sch = ds.schema()  # zero batches yielded: fall back to plan metadata
    sch = getattr(sch, "base_schema", sch)
    return sch.empty_table()


def _seq_dir(sf_dir: str) -> str:
    """Deterministic synthesized sequences table for this scale factor
    (input_hint shape; cached under /tmp, regenerated if absent)."""
    from timberjack_ray.data import synth

    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = 0.001
    n = int(min(max(2_000_000 * sf, 20_000), 2_000_000))
    out = f"/tmp/tj_sequences/n{n}"
    synth.generate_sequences(n, out, json_frac=0.3, rows_per_file=max(n // 32, 10_000))
    return out


def _seq_ds(sf_dir: str):
    import glob

    import ray.data as rd

    from timberjack_ray.rayctx import tune_for_cluster

    tune_for_cluster()
    return rd.read_parquet(sorted(glob.glob(os.path.join(_seq_dir(sf_dir), "part-*.parquet"))))


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship pipeline at sf0.001: synthesize sequences, run the full
    parse→enrich→route→aggregate DAG, return the aggregate counts table."""
    import shutil

    from timberjack_ray import AnalyzeConfig
    from timberjack_ray.data import synth
    from timberjack_ray.pipelines.analyze import analyze_parquet
    from timberjack_ray.rayctx import tune_for_cluster

    tune_for_cluster()
    seq = "/tmp/tj_entry_seq"
    out = "/tmp/tj_entry_routed"
    shutil.rmtree(out, ignore_errors=True)
    synth.generate_sequences(20_000, seq, json_frac=0.3, rows_per_file=2_500)
    paths = sorted(
        os.path.join(seq, f) for f in os.listdir(seq) if f.startswith("part-")
    )
    cfg = AnalyzeConfig(trend=True, stats=True)
    res = analyze_parquet(
        paths, cfg, out_dir=out, lookup=synth.source_lookup_dict(), num_partitions=32,
    )
    return res.counts  # (kind, key, n) DataFrame — stable schema, >0 rows


# ---------------------------------------------------------------------------
# queries (each callable: sf_dir -> Dataset | DataFrame | pa.Table)
# ---------------------------------------------------------------------------

def _scale100(v) -> np.ndarray:
    """Cent scaling via the shared floor(x·100 + ½) rule (util.scale_to_int_np)
    — one home for the SQL-ROUND-parity tie rule instead of inlined copies
    (r03 review).  Non-negative / ≤2-decimal precondition documented there."""
    from timberjack_ray.functions.util import scale_to_int_np

    return scale_to_int_np(np.asarray(v), 100)


def q_tpch_q1_qty(sf_dir: str):
    """A3-style grouped aggregate machinery on lineitem (SURVEY §2.5)."""
    from timberjack_ray.aggregates import merge_partials

    ds = _rp(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["l_returnflag", "l_linestatus", "sum_qty", "n"])

    p = ds.map_batches(partial, batch_format="pyarrow")
    out = merge_partials(p, ["l_returnflag", "l_linestatus"], ["sum_qty", "n"]).to_pandas()
    # floor(x + 0.5) = SQL ROUND's half-away-from-zero on non-negative sums
    out["sum_qty"] = np.floor(out["sum_qty"] + 0.5).astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


def q_event_type_counts(sf_dir: str):
    """A3: per-key counts via partial-per-batch + small shuffle."""
    from timberjack_ray.aggregates import counts_by

    return counts_by(_rp(sf_dir, "events", columns=["event_type"]), "event_type")


def q_event_trends(sf_dir: str):
    """A4: hour-bucket trend counts."""
    from timberjack_ray.aggregates import counts_by

    ds = _rp(sf_dir, "events", columns=["ts"])

    def bucket(t: pa.Table) -> pa.Table:
        return pa.table({"ts_hour": pc.strftime(t["ts"], "%Y-%m-%d %H")})

    return counts_by(ds.map_batches(bucket, batch_format="pyarrow"), "ts_hour")


def q_event_trends_gapfilled(sf_dir: str):
    """Dense-axis trend counts: hourly event counts with EMPTY HOURS
    zero-filled over [min, max] — time-series pipelines need the dense
    axis (a missing hour is a 0, not an absent row).  Counts travel as
    epoch-hour ints (partial+merge, #hours rows); the fill is a driver
    reindex over the bounded hour range, rendered to the same strftime
    key as event_trends."""
    from timberjack_ray.aggregates import counts_by

    ds = _rp(sf_dir, "events", columns=["ts"])

    def bucket(t: pa.Table) -> pa.Table:
        h = pc.divide(pc.cast(t["ts"], pa.int64()),
                      pa.scalar(3_600_000_000, pa.int64()))
        return pa.table({"h": h})

    c = counts_by(ds.map_batches(bucket, batch_format="pyarrow"), "h")
    hs = c["h"].to_numpy().astype(np.int64)
    dense = np.arange(hs.min(), hs.max() + 1, dtype=np.int64)
    n = pd.Series(c["n"].to_numpy(), index=hs).reindex(dense, fill_value=0)
    labels = pd.to_datetime(dense * 3600, unit="s").strftime("%Y-%m-%d %H")
    return pd.DataFrame({"ts_hour": labels, "n": n.to_numpy()}) \
        .astype({"n": "int64"}).reset_index(drop=True)


def q_event_top3(sf_dir: str):
    """K1: deterministic top-K (count desc, key asc) with rank."""
    from timberjack_ray.aggregates import counts_by, top_k

    ds = counts_by(_rp(sf_dir, "events", columns=["event_type"]), "event_type")
    top = top_k(ds, "event_type", "n", 3)
    top = top.sort_values(["n", "event_type"], ascending=[False, True]).reset_index(drop=True)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top


def q_props_field_filter(sf_dir: str):
    """M5: JSON field filter (exact string equality on extracted field)."""
    import json as _json

    from timberjack_ray.aggregates import counts_by

    ds = _rp(sf_dir, "events", columns=["event_type", "props"])

    def filt(t: pa.Table) -> pa.Table:
        keep = []
        for p in t["props"].to_pylist():
            try:
                obj = _json.loads(p)
                keep.append(str(obj.get("k")) == "42")
            except Exception:
                keep.append(False)
        return t.filter(pa.array(keep)).select(["event_type"])

    return counts_by(ds.map_batches(filt, batch_format="pyarrow"), "event_type")


def q_pattern_filter_docs(sf_dir: str):
    """M3: literal substring pattern filter (Arrow SIMD kernel)."""
    from timberjack_ray.aggregates import counts_by
    from timberjack_ray.kernels import pattern_mask

    ds = _rp(sf_dir, "documents", columns=["lang", "text"])

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pattern_mask(t["text"], "merge")).select(["lang"])

    return counts_by(ds.map_batches(filt, batch_format="pyarrow"), "lang")


def q_regex_extract_docs(sf_dir: str):
    """M6-style first-match regex extraction → grouped counts."""
    from timberjack_ray.aggregates import counts_by

    ds = _rp(sf_dir, "documents", columns=["text"])

    def ext(t: pa.Table) -> pa.Table:
        st = pc.extract_regex(t["text"], r"(?P<tok>spark|hash|join)")
        tok = pc.struct_field(st, "tok")
        out = pa.table({"tok": tok})
        return out.filter(pc.is_valid(tok))

    return counts_by(ds.map_batches(ext, batch_format="pyarrow"), "tok")


def q_enrich_customers(sf_dir: str):
    """ST6/§2.4: broadcast map-join enrich (customer → nation → region)."""
    import ray

    from timberjack_ray.aggregates import counts_by

    nation = _rp(sf_dir, "nation").to_pandas()
    region = _rp(sf_dir, "region").to_pandas()
    n2r = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    r2name = dict(zip(region["r_regionkey"], region["r_name"]))
    lookup_ref = ray.put({k: r2name[v] for k, v in n2r.items()})

    class Enrich:
        def __init__(self):
            self.lut = ray.get(lookup_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = t["c_nationkey"].to_pylist()
            return pa.table({"r_name": pa.array([self.lut[k] for k in keys])})

    ds = _rp(sf_dir, "customer", columns=["c_nationkey"])
    return counts_by(ds.map_batches(Enrich, batch_format="pyarrow", concurrency=2), "r_name")


def q_route_counts_docs(sf_dir: str):
    """Per-sink aggregate counts analog on documents (lang = sink key)."""
    from timberjack_ray.aggregates import merge_partials

    ds = _rp(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("lang").aggregate([("n_chars", "sum"), ([], "count_all")])
        return g.rename_columns(["lang", "sum_chars", "n"])

    p = ds.map_batches(partial, batch_format="pyarrow")
    out = merge_partials(p, ["lang"], ["sum_chars", "n"]).to_pandas()
    out["sum_chars"] = out["sum_chars"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out


def q_dedup_exact_docs(sf_dir: str):
    """§2.7 exact dedup: survivor = min(doc_id) per distinct text."""
    from timberjack_ray.functions.dedup import exact_dedup

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = exact_dedup(ds, col="text", id_col="doc_id").to_pandas()
    return out[["doc_id"]].astype({"doc_id": "int64"})


def q_decontaminate_docs(sf_dir: str):
    """Benchmark decontamination (functions/dedup.decontaminate): the
    held-out slice ``doc_id % 97 == 0`` plays the eval benchmark; training
    docs sharing ANY word-3-gram with it are dropped (GPT-3 appendix C /
    The Pile overlap rule).  Bench grams are a driver-folded distinct set
    broadcast once via ray.put; the training side is filtered in one
    streaming map_batches pass (searchsorted membership + per-doc
    reduceat) — no shuffle, no join, train side never materializes.
    Docs with <= 3 words contribute one whole-text gram in its OWN
    equivalence class (the oracle tags S:/L: to mirror that)."""
    from timberjack_ray.functions.dedup import decontaminate

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def side(keep_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            m = (t["doc_id"].to_numpy(zero_copy_only=False) % 97) == 0
            return t.filter(pa.array(m if keep_bench else ~m))
        return ds.map_batches(f, batch_format="pyarrow")

    out = decontaminate(side(False), side(True), col="text",
                        id_col="doc_id", k=3).to_pandas()
    return (out[["doc_id"]].astype({"doc_id": "int64"})
            .sort_values("doc_id").reset_index(drop=True))


def q_chunk_docs(sf_dir: str):
    """Context-window chunking (functions/corpus.chunk_documents): each
    doc's word stream becomes chunks of 12 words every 8 (4-word overlap)
    — the pre-training chunk step before packing.  Streaming flat-map, no
    shuffle; vectorized list_slice + binary_join per chunk index."""
    from timberjack_ray.functions.corpus import chunk_documents

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = chunk_documents(ds, window=12, stride=8).to_pandas()
    return (out.astype({"doc_id": "int64", "chunk_id": "int64",
                        "n_words": "int64"})
            .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))


def q_doc_token_counts(sf_dir: str):
    """Token counting (whitespace) per language."""
    from timberjack_ray.aggregates import merge_partials

    ds = _rp(sf_dir, "documents", columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        nw = pc.list_value_length(pc.split_pattern(t["text"], " ")).cast(pa.int64())
        g = pa.table({"lang": t["lang"], "nw": nw}).group_by("lang").aggregate(
            [("nw", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["lang", "total_words", "n"])

    p = ds.map_batches(partial, batch_format="pyarrow")
    out = merge_partials(p, ["lang"], ["total_words", "n"]).to_pandas()
    return out.astype({"total_words": "int64", "n": "int64"})


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 vs the vec_id=0 embedding (float64 math)."""
    import pyarrow.parquet as pq

    from timberjack_ray.functions.similarity import brute_force_topk

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    q0 = np.asarray(
        emb.filter(pc.equal(emb["vec_id"], 0))["embedding"][0].as_py(), dtype=np.float64
    )
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = brute_force_topk(ds, q0[None, :], k=10)
    return out[["vec_id", "rank"]].astype({"vec_id": "int64", "rank": "int64"})


def q_orders_price_stats(sf_dir: str):
    """A-family min/max/sum aggregates with partial-per-batch merge.  Sums
    are integer cents so partial+final float association can't drift from
    the oracle."""
    ds = _rp(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        from timberjack_ray.functions.util import scale_to_int

        # floor(x*100 + 0.5): same half-away-from-zero tie rule as SQL ROUND
        # on these non-negative prices (ADVICE r02)
        cents = scale_to_int(t["o_totalprice"], 100)
        t2 = pa.table({"o_orderpriority": t["o_orderpriority"],
                       "price": t["o_totalprice"], "cents": cents})
        g = t2.group_by("o_orderpriority").aggregate(
            [("price", "min"), ("price", "max"), ("cents", "sum"), ([], "count_all")]
        )
        return g.rename_columns(["o_orderpriority", "min_price", "max_price", "sum_cents", "n"])

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = p.groupby("o_orderpriority", as_index=False).agg(
        min_price=("min_price", "min"), max_price=("max_price", "max"),
        sum_cents=("sum_cents", "sum"), n=("n", "sum"))
    return out.astype({"sum_cents": "int64", "n": "int64"})


def q_distinct_users_per_type(sf_dir: str):
    """Exact grouped COUNT(DISTINCT): per-batch pair dedup + pair merge."""
    from timberjack_ray.functions.relational import distinct_count_by

    ds = _rp(sf_dir, "events", columns=["event_type", "user_id"])
    out = distinct_count_by(ds, "event_type", "user_id", name="n_users")
    return out.astype({"n_users": "int64"})


def q_top10_orders(sf_dir: str):
    """Global top-K without a distributed sort (per-batch top-K + merge)."""
    from timberjack_ray.functions.relational import sorted_topk

    ds = _rp(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = sorted_topk(ds, ["o_totalprice", "o_orderkey"], 10, descending=[True, False])
    return out.astype({"o_orderkey": "int64"})


def q_orders_by_nation(sf_dir: str):
    """Broadcast hash join (orders ⋈ customer) + grouped aggregate — the
    generic small-side join SURVEY.md §2.4 calls for."""
    import pyarrow.parquet as pq

    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.relational import broadcast_join

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    ds = _rp(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    joined = broadcast_join(ds, cust, keys="o_custkey", right_keys="c_custkey")

    def partial(t: pa.Table) -> pa.Table:
        from timberjack_ray.functions.util import scale_to_int

        cents = scale_to_int(t["o_totalprice"], 100)
        t2 = pa.table({"c_nationkey": t["c_nationkey"], "cents": cents})
        g = t2.group_by("c_nationkey").aggregate([("cents", "sum"), ([], "count_all")])
        return g.rename_columns(["c_nationkey", "sum_cents", "n"])

    p = joined.map_batches(partial, batch_format="pyarrow")
    out = merge_partials(p, ["c_nationkey"], ["sum_cents", "n"]).to_pandas()
    return out.astype({"c_nationkey": "int64", "sum_cents": "int64", "n": "int64"})


def q_sliding_window_counts(sf_dir: str):
    """Sliding-window event counts (1h windows, 30min slide): in-batch
    membership fan-out on the int64 timestamp array, partial counts, small
    merge."""
    from timberjack_ray.functions.window import sliding_counts

    ds = _rp(sf_dir, "events", columns=["ts"])
    out = sliding_counts(ds, "ts", width_s=3600, slide_s=1800)
    return out.astype({"window_start": "int64", "n": "int64"})


def q_asof_signup(sf_dir: str):
    """As-of join: each purchase matched to the user's latest signup at or
    before it (broadcast right side + per-key searchsorted)."""
    import pyarrow.parquet as pq

    from timberjack_ray.functions.relational import asof_join

    ev = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                       columns=["ts", "user_id", "event_type"])
    signup = ev.filter(pc.equal(ev["event_type"], "signup"))
    right = pa.table({
        "user_id": signup["user_id"],
        "ts": signup["ts"],
        "signup_ts": pc.cast(signup["ts"], pa.int64()),  # microseconds
    })
    ds = _rp(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase")),
        batch_format="pyarrow",
    )

    out = asof_join(ds, right, on="ts", by="user_id",
                    value_cols=["signup_ts"]).to_pandas()
    res = out[["event_id", "signup_ts_r"]].rename(columns={"signup_ts_r": "signup_us"})
    return res.astype({"event_id": "int64", "signup_us": "int64"})


def q_event_last_order_gap(sf_dir: str):
    """LARGE×LARGE as-of join (functions/relational.asof_join_bucketed):
    each event matched to the user's most recent order at or before it —
    neither side broadcast; both sides co-partition by hash(user) in ONE
    GRACE exchange, each bucket resolves with a segmented-cummax
    sort-merge (no per-key Python).  Aggregated to per-event-type match
    counts + total staleness seconds; only the matched TIME feeds the
    sums, so the answer is unambiguous under duplicate order timestamps
    and hash-gateable."""
    from timberjack_ray.functions.relational import asof_join_bucketed

    ev = _rp(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    orders = _rp(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    j = asof_join_bucketed(ev, orders, "user_id", "ts",
                           "o_custkey", "o_orderdate", ["event_type"],
                           n_buckets=32)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "sum_gap_s": pa.array([], pa.int64()),
                             "n_matched": pa.array([], pa.int64())})
        gap = pc.divide(pc.subtract(t["ts"], t["o_orderdate_matched"]),
                        pa.scalar(1_000_000, pa.int64()))
        t2 = pa.table({"event_type": t["event_type"], "gap_s": gap})
        g = t2.group_by("event_type").aggregate(
            [("gap_s", "sum"), ([], "count_all")])
        return g.rename_columns(["event_type", "sum_gap_s", "n_matched"])

    p = j.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = p.groupby("event_type", as_index=False).agg(
        sum_gap_s=("sum_gap_s", "sum"), n_matched=("n_matched", "sum"))
    return out.sort_values("event_type").reset_index(drop=True) \
        .astype({"sum_gap_s": "int64", "n_matched": "int64"})


def q_event_next_order_wait(sf_dir: str):
    """FORWARD as-of join (asof_join_bucketed direction="forward"): each
    event matched to the SAME user's earliest 'purchase' event at or
    after it — the conversion-lag / time-to-next-action direction (a
    purchase matches itself at wait 0).  Both sides are the large events
    table (the right side filtered map-side), so this exercises the
    LARGE×LARGE forward path: same single GRACE exchange and
    segmented-cummax kernel as the backward form (the time axis negates
    on the way in and out); per-type wait-sum partials."""
    from timberjack_ray.functions.relational import asof_join_bucketed

    ev = _rp(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    purch = _rp(sf_dir, "events", columns=["user_id", "ts", "event_type"]) \
        .map_batches(lambda t: t.filter(pc.equal(t["event_type"], "purchase"))
                     .select(["user_id", "ts"]),
                     batch_format="pyarrow")
    j = asof_join_bucketed(ev, purch, "user_id", "ts",
                           "user_id", "ts", ["event_type"],
                           n_buckets=32, direction="forward")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "sum_wait_s": pa.array([], pa.int64()),
                             "n_matched": pa.array([], pa.int64())})
        wait = pc.divide(pc.subtract(t["ts_matched"], t["ts"]),
                         pa.scalar(1_000_000, pa.int64()))
        t2 = pa.table({"event_type": t["event_type"], "wait_s": wait})
        g = t2.group_by("event_type").aggregate(
            [("wait_s", "sum"), ([], "count_all")])
        return g.rename_columns(["event_type", "sum_wait_s", "n_matched"])

    p = j.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = p.groupby("event_type", as_index=False).agg(
        sum_wait_s=("sum_wait_s", "sum"), n_matched=("n_matched", "sum"))
    return out.sort_values("event_type").reset_index(drop=True) \
        .astype({"sum_wait_s": "int64", "n_matched": "int64"})


def q_event_pairs_1h(sf_dir: str):
    """Banded range join (functions/relational.range_join): every ordered
    pair of same-user events at most 1 hour apart (b.ts in [a.ts − 1h,
    a.ts], b ≠ a) — the 'correlate nearby log events' primitive.  Broadcast
    right side + two searchsorted bounds + ragged expand per batch; for two
    large sides the documented scale path hash-partitions both on user_id."""
    import pyarrow.parquet as pq

    from timberjack_ray.functions.relational import range_join

    right = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                          columns=["user_id", "ts", "event_id"])
    ds = _rp(sf_dir, "events", columns=["event_id", "ts", "user_id"])
    joined = range_join(ds, right, on="ts", by="user_id",
                        value_cols=["event_id"],
                        lo=-3_600_000_000_000, hi=0)  # ns
    pairs = joined.map_batches(
        lambda t: t.filter(pc.not_equal(t["event_id"], t["event_id_r"])),
        batch_format="pyarrow",
    ).to_pandas()
    res = pairs[["event_id", "event_id_r"]].rename(
        columns={"event_id": "a_id", "event_id_r": "b_id"})
    return res.astype({"a_id": "int64", "b_id": "int64"}) \
        .sort_values(["a_id", "b_id"]).reset_index(drop=True)


def q_user_active_time(sf_dir: str):
    """Interval-union dwell time (sessions.interval_union_per_key): each
    event opens a 5-minute activity interval; a user's active seconds =
    the UNION length of their overlapping intervals — merged islands,
    not a sum of durations.  One bucket exchange; segment-reset running
    max via the composite accumulate; SQL replays the running-MAX(end)
    island rule."""
    from timberjack_ray.functions.sessions import interval_union_per_key

    ds = _rp(sf_dir, "events", columns=["user_id", "ts"])

    def iv(t: pa.Table) -> pa.Table:
        s = pc.cast(t["ts"], pa.int64())
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                         "s": s,
                         "e": pc.add(s, pa.scalar(300_000_000, pa.int64()))})

    j = interval_union_per_key(ds.map_batches(iv, batch_format="pyarrow"),
                               "user_id", "s", "e")
    out = _collect_result(j).to_pandas()  # one row per user (bounded)
    out["active_s"] = out["covered_us"] // 1_000_000
    return out[["user_id", "active_s"]].sort_values("user_id") \
        .reset_index(drop=True).astype({"user_id": "int64",
                                        "active_s": "int64"})


def q_mmr_diverse_topk(sf_dir: str):
    """MMR diverse top-10 vs the vec_id=0 embedding
    (similarity.mmr_select): retrieve-then-rerank — one streaming pass
    keeps per-batch top-m int-quantized candidates, the driver reranks
    the m-pool with the greedy λ-rational MMR rule (λ=0.7).  Rows-only:
    the greedy recurrence isn't SQL-expressible; the integer argmax +
    id-asc tie rule make it bit-deterministic, pinned vs a brute-force
    greedy reference in tests/test_functions.py."""
    import pyarrow.parquet as pq

    from timberjack_ray.functions.similarity import mmr_select

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    q0 = np.asarray(
        emb.filter(pc.equal(emb["vec_id"], 0))["embedding"][0].as_py(),
        dtype=np.float64)
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return mmr_select(ds, q0, k=10, lam_num=7, lam_den=10, m=128)


def q_join_size_exact(sf_dir: str):
    """Join-size planning pass: the EXACT output cardinality of
    events ⋈ orders on user — Σ_k |A_k|·|B_k| — computed from per-key
    count partials through cogroup_counts' single exchange (count rows,
    never raw rows), folding to ONE integer.  The planner input that
    decides broadcast vs GRACE vs skew_join; the sketch companion is
    selfjoin_size_ams."""
    from timberjack_ray.functions.relational import cogroup_counts

    j = cogroup_counts(_rp(sf_dir, "events", columns=["user_id"]),
                       _rp(sf_dir, "orders", columns=["o_custkey"]),
                       "user_id", "o_custkey", n_buckets=32)

    def prod(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"join_rows": pa.array([], pa.int64())})
        n = (t["n_left"].to_numpy(zero_copy_only=False)
             * t["n_right"].to_numpy(zero_copy_only=False)).sum()
        return pa.table({"join_rows": pa.array([int(n)], pa.int64())})

    p = j.map_batches(prod, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"join_rows": [int(p["join_rows"].sum())]})


def q_orders_upsert_latest(sf_dir: str):
    """MERGE / upsert (SCD keep-latest) semantics: a planted update
    stream (every 5th order re-emitted a day later with status 'U' —
    SQL-replayed) merges into the base table and the LATEST row per key
    wins, resolved as ONE packed-integer Max — (version, status) pack
    into one int64 so the winner and its payload travel together through
    a single mergeable aggregate (the dedup_keep_best shape on a fact
    table).  Per-batch per-key Max partials feed the GUARDED driver fold
    (key-bounded; degrades to the distributed groupby(Max) past the
    limit — the session-5 q18 pattern that avoids the Ray all-to-all's
    multi-second fixed cost at gate scales).  Output: final status
    census."""
    from timberjack_ray.aggregates import merge_partials_or_ds

    code = {"F": 0, "O": 1, "P": 2, "U": 3}
    dec = {v: k for k, v in code.items()}

    def aug(t: pa.Table) -> pa.Table:
        d = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(
            zero_copy_only=False)
        s = t["o_orderstatus"].to_pandas().map(code).to_numpy(np.int64)
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        packed = (d * 2 + 0) * 4 + s
        upd = k % 5 == 0
        pk = np.concatenate([packed, ((d[upd] + 86_400_000_000) * 2 + 1) * 4
                             + np.int64(code["U"])])
        kk = np.concatenate([k, k[upd]])
        g = pa.table({"o_orderkey": pa.array(kk), "pk": pa.array(pk)}) \
            .group_by("o_orderkey").aggregate([("pk", "max")])
        return g.rename_columns(["o_orderkey", "pk"])

    ds = _rp(sf_dir, "orders", columns=["o_orderkey", "o_orderdate",
                                        "o_orderstatus"])
    folded, mode = merge_partials_or_ds(
        ds.map_batches(aug, batch_format="pyarrow"),
        ["o_orderkey"], ["pk"], ops=["max"])

    def census_np(pk: np.ndarray) -> pd.DataFrame:
        s = pk % 4
        vals, cnts = np.unique(s, return_counts=True)
        return pd.DataFrame({"status": [dec[int(v)] for v in vals],
                             "n": cnts.astype(np.int64)})

    if mode == "driver":
        out = census_np(folded["pk"].to_numpy(zero_copy_only=False))
    else:  # pragma: no cover - past the fold guard
        def census(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"status": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            d = census_np(t["pk"].to_numpy(zero_copy_only=False))
            return pa.Table.from_pandas(d, preserve_index=False)

        p = folded.map_batches(census, batch_format="pyarrow").to_pandas()
        out = p.groupby("status", as_index=False).agg(n=("n", "sum"))
    return out.sort_values("status").reset_index(drop=True) \
        .astype({"n": "int64"})


def q_skewed_user_revenue(sf_dir: str):
    """Skew-aware hybrid join (relational.skew_join): events ⋈ orders on
    user with a PLANTED hot key (every 6th event cloned onto user 7 —
    SQL-replayed) — the one-bucket-straggler case a plain GRACE join
    degrades on.  The count pre-pass routes the hottest keys through a
    broadcast of their (small) right fan-in — hot rows never shuffle —
    while the cold remainder takes the normal GRACE exchange; the
    per-bucket aggregate (bucket_fn) applies on both paths so only
    (event_type, rev, n) partials ever leave workers."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.relational import skew_join
    from timberjack_ray.functions.util import scale_to_int

    def aug(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        clone = t.filter(pa.array(ids % 6 == 0))
        clone = clone.set_column(
            clone.schema.get_field_index("user_id"), "user_id",
            pa.array(np.full(clone.num_rows, 7, np.int64)))
        t = pa.concat_tables([t, clone])
        return pa.table({"user_id": pc.cast(t["user_id"], pa.int64()),
                         "event_type": t["event_type"]})

    def o_prep(t: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                         "pc_": scale_to_int(t["o_totalprice"], 100)})

    def agg(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [("pc_", "sum"), ([], "count_all")])
        return g.rename_columns(["event_type", "rev_c", "n"])

    ev = _rp(sf_dir, "events", columns=["event_id", "user_id", "event_type"]) \
        .map_batches(aug, batch_format="pyarrow")
    od = _rp(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]) \
        .map_batches(o_prep, batch_format="pyarrow")
    j = skew_join(ev, od, "user_id", "o_custkey",
                  ["event_type"], ["pc_"], hot_limit=4, n_buckets=32,
                  bucket_fn=agg)
    out = merge_partials(j, ["event_type"], ["rev_c", "n"]).to_pandas()
    return out.sort_values("event_type").reset_index(drop=True) \
        .astype({"rev_c": "int64", "n": "int64"})


def q_event_pairs_1h_grace(sf_dir: str):
    """The LARGE×LARGE form of event_pairs_1h
    (relational.range_join_bucketed): same band-join semantics but
    NEITHER side broadcasts — both co-partition by hash(user) in ONE
    tagged-union GRACE exchange; per bucket both band bounds come from
    composite-key searchsorted and matches emit by ragged expand.
    Closes range_join's documented two-large-sides gap the way
    asof_join_bucketed closed asof_join's."""
    from timberjack_ray.functions.relational import range_join_bucketed

    ev_l = _rp(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    ev_r = _rp(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    j = range_join_bucketed(ev_l, ev_r, "user_id", "ts", "event_id",
                            "user_id", "ts", "event_id",
                            lo_us=-3_600_000_000, hi_us=0, n_buckets=32)
    pairs = j.map_batches(
        lambda t: t.filter(pc.not_equal(t["a_id"], t["b_id"])),
        batch_format="pyarrow").to_pandas()
    return pairs.astype({"a_id": "int64", "b_id": "int64"}) \
        .sort_values(["a_id", "b_id"]).reset_index(drop=True)


def q_orders_top3_per_cust(sf_dir: str):
    """Grouped top-K (functions/relational.grouped_topk): 3 most expensive
    orders per customer, deterministic tie-break (price desc, orderkey asc).
    Per-batch vectorized prune to ≤ K per group bounds the exchange at
    K × groups, never raw rows; high-cardinality grouping exercises the
    distributed re-prune fallback path at scale."""
    from timberjack_ray.functions.relational import grouped_topk

    ds = _rp(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    out = grouped_topk(ds, "o_custkey", "o_totalprice", 3, tie_col="o_orderkey")
    return out[["o_custkey", "o_orderkey", "o_totalprice"]].astype(
        {"o_custkey": "int64", "o_orderkey": "int64", "o_totalprice": "float64"})


def q_doc_word_topk(sf_dir: str):
    """EXACT top-10 words over documents (functions/text.word_topk):
    per-batch Arrow split+group_by partials collapse to vocabulary size
    before the merge; defined (n desc, word asc) tie-break makes it
    hash-checkable."""
    from timberjack_ray.functions.text import word_topk

    ds = _rp(sf_dir, "documents", columns=["text"])
    out = word_topk(ds, k=10)
    return out[["word", "n"]].astype({"word": "str", "n": "int64"})


def q_heavy_hitter_words(sf_dir: str):
    """Count-Min-Sketch heavy hitters over document words in ONE streaming
    pass (functions/sketch.heavy_hitters): per-batch CMS table + exact
    top-C candidates, driver sums tables and ranks candidates.  Estimates
    over-count by ≤ ~2N/width, so this is rows-only checked; the exact
    variant is doc_word_topk."""
    from timberjack_ray.functions.sketch import heavy_hitters

    ds = _rp(sf_dir, "documents", columns=["text"])

    def explode(t: pa.Table) -> pa.Table:
        return pa.table({"word": pc.list_flatten(pc.split_pattern(t["text"], " "))})

    out = heavy_hitters(ds.map_batches(explode, batch_format="pyarrow"),
                        "word", k=10)
    return out.astype({"word": "str", "est_n": "int64"})


def q_value_histogram(sf_dir: str):
    """Fixed-width histogram per event_type (the north_star's per-source
    histogram shape): bin id computed vectorized per batch, partial counts
    merged — one small exchange, no sort."""
    from timberjack_ray.aggregates import counts_by

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])

    def binify(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(t["value"], 50.0)), pa.int64())
        return pa.table({"event_type": t["event_type"], "bin": b})

    out = counts_by(ds.map_batches(binify, batch_format="pyarrow"),
                    ["event_type", "bin"])
    return out.astype({"bin": "int64", "n": "int64"})


def q_session_counts(sf_dir: str):
    """Gap-based sessionization (1h gap) per user: hash-shuffle by user,
    vectorized diff/cumsum per group."""
    from timberjack_ray.functions.sessions import session_stats

    ds = _rp(sf_dir, "events", columns=["user_id", "ts"])
    out = session_stats(ds, "user_id", "ts", gap_s=3600)
    return out.astype({"user_id": "int64", "n_sessions": "int64"})


def q_value_quantiles(sf_dir: str):
    """Exact discrete quantiles via per-value counts (no distributed sort;
    merge volume = distinct values)."""
    from timberjack_ray.functions.sessions import exact_quantiles

    ds = _rp(sf_dir, "events", columns=["value"])
    out = exact_quantiles(ds, "value", [0.25, 0.5, 0.75, 0.95], scale=100)
    return out.astype({"value_scaled": "int64"})


def q_doc_repetition_ratio(sf_dir: str):
    """A7-analog scalar: total vs exact-distinct text count on documents."""
    from timberjack_ray.aggregates import counts_by

    ds = _rp(sf_dir, "documents", columns=["text"])
    counts = counts_by(ds, "text")
    total = int(counts["n"].sum())
    return pd.DataFrame({"n_total": [total], "n_distinct": [len(counts)]})


# --- non-SQL-expressible ops (driver records rows-only checks) -------------

def q_seq_level_counts(sf_dir: str):
    from timberjack_ray import AnalyzeConfig, analyze_dataset

    out = analyze_dataset(_seq_ds(sf_dir), AnalyzeConfig(stats=True, collect_lines=False))
    st = out.report["stats"]
    return pd.DataFrame(st["log_levels"]).astype({"count": "int64"})


def q_seq_trends(sf_dir: str):
    from timberjack_ray import AnalyzeConfig, analyze_dataset

    out = analyze_dataset(_seq_ds(sf_dir), AnalyzeConfig(trend=True, collect_lines=False))
    return pd.DataFrame(out.report["time_trends"]).astype({"count": "int64"})


def q_seq_top_errors(sf_dir: str):
    from timberjack_ray import AnalyzeConfig, analyze_dataset

    out = analyze_dataset(_seq_ds(sf_dir), AnalyzeConfig(stats=True, collect_lines=False))
    return pd.DataFrame(out.report["stats"]["error_types"]).astype({"count": "int64", "rank": "int64"})


def q_seq_count_pattern(sf_dir: str):
    from timberjack_ray import AnalyzeConfig, analyze_dataset

    out = analyze_dataset(_seq_ds(sf_dir), AnalyzeConfig(count=True, pattern="timeout"))
    return pd.DataFrame({"total": [out.report["total_count"]]})


def q_minhash_pairs(sf_dir: str):
    from timberjack_ray.functions.dedup import minhash_dedup

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    groups, pairs = minhash_dedup(ds, threshold=0.5)
    return pd.DataFrame({"n_pairs": [len(pairs)], "n_grouped_docs": [len(groups)]})


def q_ngram_jaccard_pairs(sf_dir: str):
    """EXACT word-trigram Jaccard similarity self-join (prefix filtering,
    functions/dedup.py ngram_jaccard_pairs): every (a, b, jacc) with
    Jaccard >= 0.6.  Unlike minhash/simhash this is exact, so it is
    DuckDB-hash-checkable pair for pair."""
    from timberjack_ray.functions.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        _rp(sf_dir, "documents", columns=["doc_id", "text"]), threshold=0.6
    ).to_pandas()
    return pairs[["a", "b", "jacc"]].astype(
        {"a": "int64", "b": "int64", "jacc": "float64"}
    ).sort_values(["a", "b"]).reset_index(drop=True)


def q_simhash_pairs(sf_dir: str):
    from timberjack_ray.functions.dedup import simhash_candidates

    pairs = simhash_candidates(
        _rp(sf_dir, "documents", columns=["doc_id", "text"])
    ).to_pandas().drop_duplicates(["a", "b"])
    return pd.DataFrame({"n_pairs": [len(pairs)]})


def q_embedding_near_dup(sf_dir: str):
    from timberjack_ray.functions.similarity import embedding_near_dup

    pairs = embedding_near_dup(
        _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"]), threshold=0.9
    ).to_pandas().drop_duplicates(["a", "b"])
    return pd.DataFrame({"n_pairs": [len(pairs)]})


def q_ann_ivf(sf_dir: str):
    """IVF approximate top-k (scale path; deterministic seeded centroids).
    Rows-only check — recall vs brute force is asserted in
    tests/test_functions.py."""
    import pyarrow.parquet as pq

    from timberjack_ray.functions.similarity import ivf_topk

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    q0 = np.asarray(
        emb.filter(pc.equal(emb["vec_id"], 0))["embedding"][0].as_py(), dtype=np.float64
    )
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ivf_topk(ds, q0[None, :], k=10, n_centroids=16, n_probe=4)
    return out[["vec_id", "rank"]].astype({"vec_id": "int64", "rank": "int64"})


def q_ann_ivf_full(sf_dir: str):
    """IVF top-k with n_probe = n_centroids (round 4): probing every cell
    makes the IVF plan EXACT, so the vectorized probe-matrix kernel is
    hash-checked against the same SQL cosine top-k oracle as brute force
    — the driver-checkable determinism anchor for the approximate family
    (ann_ivf keeps the honest n_probe<n_centroids recall path)."""
    import pyarrow.parquet as pq

    from timberjack_ray.functions.similarity import ivf_topk

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    q0 = np.asarray(
        emb.filter(pc.equal(emb["vec_id"], 0))["embedding"][0].as_py(),
        dtype=np.float64)
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = ivf_topk(ds, q0[None, :], k=10, n_centroids=8, n_probe=8)
    return out[["vec_id", "rank"]].astype({"vec_id": "int64", "rank": "int64"})


def q_quality_scores(sf_dir: str):
    from timberjack_ray.functions.text import QualityScorer

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    scored = ds.map_batches(QualityScorer, batch_format="pyarrow", concurrency=2).to_pandas()
    return scored[["doc_id", "quality"]].astype({"doc_id": "int64"})


def q_langid(sf_dir: str):
    from timberjack_ray.aggregates import counts_by
    from timberjack_ray.functions.text import LangId

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    pred = ds.map_batches(LangId, batch_format="pyarrow", concurrency=2)
    return counts_by(pred, "lang_pred")


def q_fingerprints(sf_dir: str):
    from timberjack_ray.functions.text import add_fingerprints

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(add_fingerprints, batch_format="pyarrow").to_pandas()
    return out[["doc_id", "fp64"]].astype({"doc_id": "int64", "fp64": "int64"})


def q_winnow_fingerprints(sf_dir: str):
    """Oracle-checked winnowing-style fingerprint (round 4 — converts the
    fingerprint family from rows-only to hash-checked): per doc the MIN
    over rolling 5-word-gram Horner hashes, word hash = codepoint Horner
    fold, short docs fall back to the whole-text content hash.  The
    DuckDB oracle replays every fold with HUGEINT modular arithmetic."""
    from timberjack_ray.functions.text import add_winnow_fp

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(add_winnow_fp, batch_format="pyarrow").to_pandas()
    return out[["doc_id", "fp"]].astype({"doc_id": "int64", "fp": "int64"})


def q_minhash_signatures(sf_dir: str):
    """Oracle-checked MinHash SIGNATURE primitive (round 4): 8-perm
    signatures over 3-word-gram Horner hashes with affine permutations
    ``g → (POLY_BASE^(p+1)·g + p·KNUTH32) mod 2^64`` — the DuckDB oracle
    replays the modular multiply with a 32-bit split (HUGEINT would
    overflow on a full 64×64 product).  The LSH pairing tier above this
    (minhash_pairs) stays rows-only; the signature math itself is now
    driver-checkable."""
    from timberjack_ray.functions.dedup import minhash_horner_signature

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(minhash_horner_signature,
                         batch_format="pyarrow").to_pandas()
    return out.sort_values(["doc_id", "perm"]).reset_index(drop=True) \
        .astype({"doc_id": "int64", "perm": "int64", "minhash": "int64"})


def q_simhash16(sf_dir: str):
    """Oracle-checked SimHash primitive (round 4): 16-bit signature where
    bit b is set iff a strict majority of the doc's words carry bit b of
    their codepoint-Horner hash — pure integer majority votes, replayed
    bit-by-bit in SQL.  The banded pairing tier (simhash_pairs) stays
    rows-only; the signature math is now driver-checkable."""
    from timberjack_ray.functions.dedup import simhash16_horner

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(simhash16_horner, batch_format="pyarrow") \
        .to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "simhash": "int64"})


def q_revenue_by_priority(sf_dir: str):
    """Large×large join path: GRACE-style bucketed shuffle hash join
    (orders ⋈ lineitem on orderkey — neither side broadcast), then a
    streamed partial-sum aggregate.  Each row crosses the exchange once;
    per-bucket joins are pyarrow C hash joins."""
    from timberjack_ray.functions.relational import bucket_hash_join

    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        from timberjack_ray.functions.util import scale_to_int

        cents = scale_to_int(t["l_extendedprice"], 100)
        return pa.table({"l_orderkey": t["l_orderkey"], "cents": cents})

    joined = bucket_hash_join(
        orders, li.map_batches(to_cents, batch_format="pyarrow"),
        "o_orderkey", "l_orderkey",
        left_cols=["o_orderpriority"], right_cols=["cents"], n_buckets=32)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderpriority").aggregate(
            [("cents", "sum"), ([], "count_all")])
        return g.rename_columns(["o_orderpriority", "sum_cents", "n"])

    p = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = p.groupby("o_orderpriority", as_index=False).agg(
        sum_cents=("sum_cents", "sum"), n=("n", "sum"))
    return out.astype({"sum_cents": "int64", "n": "int64"})


def q_value_quantiles_by_type(sf_dir: str):
    """Exact grouped discrete quantiles: (group, value)-histogram partials,
    histogram-sized merge, per-group cumulative walk."""
    from timberjack_ray.functions.relational import grouped_quantiles

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    out = grouped_quantiles(ds, "event_type", "value", [0.5, 0.9], scale=100)
    return out.astype({"event_type": "str", "value_scaled": "int64"})


def q_label_centroid_sums(sf_dir: str):
    """Per-label embedding centroid numerators (functions/similarity.
    grouped_centroid_sums): scaled-int element sums so the reduction is
    order-independent and the oracle replays it exactly; partials are
    centroid-volume (#labels × dim), never row-volume."""
    from timberjack_ray.functions.similarity import grouped_centroid_sums

    ds = _rp(sf_dir, "embeddings", columns=["label", "embedding"])
    out = grouped_centroid_sums(ds, "label", "embedding", scale=1e6)
    return out.astype({"label": "int64", "dim": "int64",
                       "sum_scaled": "int64", "n": "int64"})


def q_winsorized_value_sums(sf_dir: str):
    """Feature preprocessing: per-type value sums with outliers clamped to
    the type's exact [p05, p95] (functions/relational.winsorized_group_sums)
    — quantile thresholds from histogram-sized partials, then a broadcast
    clamp pass; all arithmetic on the cent-scaled int domain so the oracle
    replays it exactly."""
    from timberjack_ray.functions.relational import winsorized_group_sums

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    out = winsorized_group_sums(ds, "event_type", "value", 0.05, 0.95,
                                scale=100)
    return out.astype({"event_type": "str", "n": "int64",
                       "sum_wins_scaled": "int64"})


def q_user_rolling_value(sf_dir: str):
    """Per-user rolling 3-row sum ordered by (ts, event_id) — the
    SQL-window ROWS BETWEEN semantics via groupby shuffle + one numpy
    lexsort/prefix-sum per group; integer cents so sums are exact."""
    from timberjack_ray.functions.relational import rolling_sum_per_key

    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])
    out = rolling_sum_per_key(ds, "user_id", "ts", "event_id", "value",
                              window=3, scale=100)
    return out.astype({"event_id": "int64", "roll_sum": "int64"})


def q_user_value_window_1h(sf_dir: str):
    """Per-user TIME-RANGE windowed sum (relational.range_window_sum_per_key_ds):
    each event's sum of the user's cents-values over the trailing hour —
    the RANGE-frame window (equal-ts peers after the row included) so the
    answer is a pure function of (user, ts) and hash-gateable.  One bucket
    exchange; both frame bounds via composite-key searchsorted — no
    per-key Python."""
    from timberjack_ray.functions.relational import range_window_sum_per_key_ds

    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])
    out = range_window_sum_per_key_ds(ds, "user_id", "ts", "event_id",
                                      "value", width_us=3_600 * 1_000_000,
                                      scale=100)
    frames = [b.to_pandas() for b in
              out.iter_batches(batch_size=None, batch_format="pyarrow")]
    frames = [f for f in frames if len(f)]
    res = pd.concat(frames, ignore_index=True).rename(
        columns={"win_sum": "win_sum_c"})
    return res.sort_values("event_id").reset_index(drop=True) \
        .astype({"event_id": "int64", "win_sum_c": "int64"})


def q_actor_activity_full(sf_dir: str):
    """FULL OUTER per-actor activity (relational.cogroup_counts): order
    count and event count per actor id INCLUDING one-sided actors — the
    COGROUP form: tagged per-batch count partials from both sides cross
    ONE exchange; a missing side is a 0 by construction, no outer-join
    algorithm needed.  Output streams one row per distinct actor."""
    from timberjack_ray.functions.relational import cogroup_counts

    j = cogroup_counts(_rp(sf_dir, "orders", columns=["o_custkey"]),
                       _rp(sf_dir, "events", columns=["user_id"]),
                       "o_custkey", "user_id", n_buckets=32)
    frames = [b.to_pandas() for b in
              j.iter_batches(batch_size=None, batch_format="pyarrow")]
    out = pd.concat([f for f in frames if len(f)], ignore_index=True) \
        .rename(columns={"key": "actor_id", "n_left": "n_orders",
                         "n_right": "n_events"})
    return out.sort_values("actor_id").reset_index(drop=True) \
        .astype({"actor_id": "int64", "n_orders": "int64",
                 "n_events": "int64"})


def q_user_longest_streak(sf_dir: str):
    """Gaps-and-islands streak analysis (sessions.longest_streak_histogram):
    longest run of consecutive active DAYS per user, as a (streak_days,
    n_users) histogram.  Distinct (user, day) pairs shrink the single
    bucket exchange; islands via the day − rank identity, per-key max by
    maximum.reduceat — only the streak histogram leaves a bucket."""
    from timberjack_ray.functions.sessions import longest_streak_histogram

    ds = _rp(sf_dir, "events", columns=["user_id", "ts"])
    out = longest_streak_histogram(ds, "user_id", "ts")
    return out.rename(columns={"n_keys": "n_users"})


def q_shuffle_export_counts(sf_dir: str):
    """Shuffled training-data export: scramble-bucketed partitioned Parquet
    sink (resume unit = bucket directory), then counts re-read FROM THE
    WRITTEN FILES — validates the sink layout end-to-end, not just the
    in-memory plan."""
    import shutil

    import ray.data as rd

    from timberjack_ray.aggregates import counts_by
    from timberjack_ray.functions.corpus import KNUTH32

    ds = _rp(sf_dir, "documents", columns=["doc_id"])

    def bucketize(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        s = (ids * np.uint64(KNUTH32)) % np.uint64(2**32)
        b = (s >> np.uint64(28)).astype(np.int64)  # top 4 bits → 16 buckets
        return t.append_column("bucket", pa.array(b))

    out_dir = f"/tmp/tj_shuffle_export/{os.getpid()}"
    shutil.rmtree(out_dir, ignore_errors=True)
    ds.map_batches(bucketize, batch_format="pyarrow") \
        .write_parquet(out_dir, partition_cols=["bucket"])
    back = rd.read_parquet(out_dir)
    out = counts_by(back, "bucket")
    shutil.rmtree(out_dir, ignore_errors=True)
    out["bucket"] = out["bucket"].astype("int64")
    return out.astype({"bucket": "int64", "n": "int64"})


def q_quality_rule_violations(sf_dir: str):
    """C4-style rule-based filtering report: per rule, how many docs
    violate it (short doc / over-long words / single-word domination /
    too-few stopwords).  One vectorized pass; 4 counters merge."""
    from timberjack_ray.functions.text import _STOPWORDS

    stop = pa.array(sorted(set().union(*_STOPWORDS.values())))
    ds = _rp(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        n_words = pc.list_value_length(words).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        n = len(n_words)
        flat = pc.list_flatten(words)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        wl = pc.utf8_length(flat).cast(pa.int64()).to_numpy(zero_copy_only=False)
        offs = np.concatenate([[0], np.cumsum(n_words)])
        starts = np.minimum(offs[:-1], len(wl))  # len(wl) = sentinel slot
        sum_wl = np.add.reduceat(np.append(wl, 0), starts)[:n] if n else np.array([])
        sum_wl = np.where(n_words == 0, 0, sum_wl)
        mean_wl = sum_wl / np.maximum(n_words, 1)
        # single-word domination: max per-doc word frequency
        ids = np.repeat(np.arange(n), n_words)
        cnt = pd.DataFrame({"d": ids, "w": pd.factorize(flat.to_pandas())[0]}) \
            .groupby(["d", "w"]).size()
        max_freq = cnt.groupby(level=0).max().reindex(range(n), fill_value=0) \
            .to_numpy()
        stop_hits = pc.is_in(flat, value_set=stop).to_numpy(zero_copy_only=False)
        n_stop = np.add.reduceat(np.append(stop_hits, False), starts)[:n] if n \
            else np.array([])
        n_stop = np.where(n_words == 0, 0, n_stop)
        viol = {
            "too_short": n_words < 20,
            "long_words": mean_wl > 10,
            "one_word_dominates": max_freq > 0.2 * np.maximum(n_words, 1),
            "few_stopwords": n_stop < np.ceil(0.05 * n_words),
        }
        return pa.table({"rule": pa.array(list(viol)),
                         "n": pa.array([int(v.sum()) for v in viol.values()],
                                       pa.int64())})

    from timberjack_ray.aggregates import merge_partials
    out = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                         ["rule"], "n").to_pandas()
    return out.sort_values("rule").reset_index(drop=True).astype({"n": "int64"})


def q_dup_cluster_histogram(sf_dir: str):
    """Dedup diagnostics: histogram of exact-duplicate cluster sizes
    (how many distinct texts appear 1×, 2×, …).  (hash)-only shuffle →
    per-cluster counts → tiny size histogram."""
    from timberjack_ray.functions.corpus import add_content_hash

    ds = _rp(sf_dir, "documents", columns=["text"])

    def project(t: pa.Table) -> pa.Table:
        return add_content_hash(t).select(["chash"])

    from ray.data.aggregate import Count
    clusters = ds.map_batches(project, batch_format="pyarrow") \
        .groupby("chash").aggregate(Count(alias_name="sz"))

    def hist(t: pa.Table) -> pa.Table:
        g = t.group_by("sz").aggregate([([], "count_all")])
        return g.rename_columns(["cluster_size", "n_clusters"])

    from timberjack_ray.aggregates import merge_partials
    out = merge_partials(clusters.map_batches(hist, batch_format="pyarrow"),
                         ["cluster_size"], "n_clusters").to_pandas()
    return out.sort_values("cluster_size").reset_index(drop=True) \
        .astype({"cluster_size": "int64", "n_clusters": "int64"})


def q_order_chain_components(sf_dir: str):
    """Connected components (functions/graph.py) over a CHAIN graph: each
    customer's orders, sorted by key, are linked consecutively, so the
    component label (the MIN orderkey of the chain) must actually propagate
    hop by hop — a real union-find/label-propagation workload whose answer
    is still SQL-checkable (min orderkey per customer with ≥2 orders).

    Edge build is one bucketed exchange + a vectorized lexsort kernel (no
    per-customer Python); components run via graph.connected_components —
    driver union-find under the limit, distributed min-label propagation
    with pointer jumping past it (equality-tested paths)."""
    from timberjack_ray.functions.corpus import add_key_bucket
    from timberjack_ray.functions.graph import connected_components

    ds = _rp(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def seg_edges(t: pa.Table) -> pa.Table:
        cust = t["o_custkey"].to_numpy(zero_copy_only=False)
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, cust))
        cust, keys = cust[order], keys[order]
        same = cust[1:] == cust[:-1]
        return pa.table({"a": pa.array(keys[:-1][same], pa.int64()),
                         "b": pa.array(keys[1:][same], pa.int64())})

    pairs = add_key_bucket(ds, "o_custkey", 64).groupby("__kb") \
        .map_groups(lambda t: seg_edges(t), batch_format="pyarrow")
    out = connected_components(pairs)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    out = out.rename(columns={"node": "o_orderkey"})
    return out.sort_values("o_orderkey").reset_index(drop=True) \
        .astype({"o_orderkey": "int64", "component": "int64"})


def q_split_counts(sf_dir: str):
    """Deterministic content-keyed train/valid/test split (98/1/1): bucket =
    content-hash % 100 (functions/corpus.assign_split), so exact duplicates
    always co-locate in one split (no train/test leakage through dup
    clusters) and membership is re-derivable from the bytes by any engine.
    Per-(split, source) counts merge partials — rows never leave workers."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.corpus import assign_split

    ds = _rp(sf_dir, "documents", columns=["text", "source"])

    def partial(t: pa.Table) -> pa.Table:
        g = assign_split(t).select(["split", "source"]) \
            .group_by(["split", "source"]).aggregate([([], "count_all")])
        return g.rename_columns(["split", "source", "n"])

    out = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                         ["split", "source"], "n").to_pandas()
    return out.sort_values(["split", "source"]).reset_index(drop=True) \
        .astype({"n": "int64"})


def q_error_rate_anomalies(sf_dir: str):
    """Burst detection over the error stream: hourly tumbling counts, flag
    hours above 1.5× the mean observed-hour rate (functions/window.
    rate_anomalies).  Pruned read (ts + type only) → vectorized filter →
    per-window partials → window-bounded driver threshold."""
    import pyarrow.compute as pc

    from timberjack_ray.functions.window import rate_anomalies

    ds = _rp(sf_dir, "events", columns=["ts", "event_type"])

    def errors_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["event_type"], "error")).select(["ts"])

    out = rate_anomalies(ds.map_batches(errors_only, batch_format="pyarrow"),
                         "ts", width_s=3600, factor=1.5)
    return out.astype({"window_start": "int64", "n": "int64"})


def _plant_pii(t: pa.Table) -> pa.Table:
    """Deterministically append a contact line (email, IPv4, phone derived
    from doc_id/source) to each doc — the synth corpus carries no PII, so
    the scrub gate would otherwise be a trivial no-op.  The oracle builds
    the identical line with SQL string concat."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    id_s = pc.cast(t["doc_id"], pa.string())
    m256 = pc.cast(pa.array(ids % 256), pa.string())
    m100 = pc.cast(pa.array(ids % 100), pa.string())
    p4 = pc.utf8_lpad(pc.cast(pa.array(ids % 10000), pa.string()), 4,
                      padding="0")
    aug = pc.binary_join_element_wise(
        t["text"], " contact user", id_s, "@", t["source"],
        ".com ip 10.", m256, ".0.", m100, " tel 555-010-", p4, "")
    return t.append_column("aug", aug)


def q_pii_scrub_docs(sf_dir: str):
    """PII redaction (functions/text.scrub_pii): email → [EMAIL], IPv4 →
    [IP], phone → [PHONE], each one vectorized RE2 pass — pyarrow and
    DuckDB both run RE2, so the oracle replays the scrub byte-identically
    over the same planted contact lines."""
    from timberjack_ray.functions.text import scrub_pii

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def f(t: pa.Table) -> pa.Table:
        t = scrub_pii(_plant_pii(t), col="aug", out_col="scrubbed")
        return t.select(["doc_id", "scrubbed"])

    out = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64"})


def q_event_rule_violations(sf_dir: str):
    """Ingest-contract validation (functions/validate.validate): FK
    integrity (user_id ∈ customer keys, broadcast set), value-range and
    props-field rules — all masks evaluated in ONE streaming pass,
    (rule, checked, violations) counters merged.  The FK rule's clean 0
    and the nonzero range/props counts are all hash-checked."""
    from timberjack_ray.functions.validate import validate

    cust = _rp(sf_dir, "customer", columns=["c_custkey"]).to_pandas()
    cust_keys = pa.array(cust["c_custkey"].to_numpy().astype("int64"))

    def fk_user(t: pa.Table) -> pa.Array:
        return pc.invert(pc.is_in(t["user_id"], value_set=cust_keys))

    def value_in_range(t: pa.Table) -> pa.Array:
        return pc.or_(pc.less(t["value"], 0.0),
                      pc.greater_equal(t["value"], 100.0))

    def props_k_under_50(t: pa.Table) -> pa.Array:
        k = pc.struct_field(
            pc.extract_regex(t["props"], pattern=r'"k":\s*(?P<k>\d+)'), "k")
        # null (unparseable) counts as a violation via the validate contract
        return pc.greater_equal(pc.cast(k, pa.int64()), 50)

    ds = _rp(sf_dir, "events", columns=["user_id", "value", "props"])
    out = validate(ds, {"fk_user": fk_user,
                        "value_in_range": value_in_range,
                        "props_k_under_50": props_k_under_50})
    return out.astype({"n_checked": "int64", "n_violations": "int64"})


def q_events_profile(sf_dir: str):
    """Dataset profiling (functions/validate.profile_numeric): per-column
    count / nulls / min / max in one pass; partial volume is #batches ×
    #cols rows regardless of data size."""
    from timberjack_ray.functions.validate import profile_numeric

    ds = _rp(sf_dir, "events", columns=["event_id", "user_id", "value"])
    out = profile_numeric(ds, ["event_id", "user_id", "value"])
    return out.astype({"n": "int64", "n_null": "int64",
                       "min_v": "float64", "max_v": "float64"})


def q_dup_ngram_doc_frac(sf_dir: str):
    """Gopher repetition filter signal (functions/text.add_dup_ngram_frac):
    per-doc share of characters covered by duplicate word 2-grams, in
    capped basis points — one vectorized hash/lexsort/bincount pass per
    batch, no shuffle."""
    from timberjack_ray.functions.text import add_dup_ngram_frac

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(
        lambda t: add_dup_ngram_frac(t).select(["doc_id", "dup2_frac_bp"]),
        batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "dup2_frac_bp": "int64"})


def q_pii_counts(sf_dir: str):
    """PII audit (functions/text.pii_counts): total matches + affected docs
    per pattern over the planted corpus — 3-row partial per batch, tiny
    merge."""
    from timberjack_ray.functions.text import pii_counts

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "source"])
    aug = ds.map_batches(_plant_pii, batch_format="pyarrow")
    out = pii_counts(aug, col="aug")
    return out.astype({"n_matches": "int64", "n_docs": "int64"})


def q_recent_event_counts(sf_dir: str):
    """Predicate pushdown at the READ: the ts >= cutoff filter is handed to
    the Parquet scan (row-group statistics prune whole groups before any
    byte leaves storage), then a tiny counts merge."""
    import datetime as _dt

    import pyarrow.dataset as pds
    import ray.data as rd

    from timberjack_ray.aggregates import counts_by
    from timberjack_ray.rayctx import tune_for_cluster

    tune_for_cluster()
    cutoff = _dt.datetime(2024, 1, 15)  # mid-range: the filter must PRUNE, not empty
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "ts"],
                         filter=(pds.field("ts") >= pa.scalar(cutoff)))
    return counts_by(ds.select_columns(["event_type"]), "event_type")


def q_stratified_sample_events(sf_dir: str):
    """Stratified sampling — per-class keep rates (errors 100%, views 5%,
    rest 25%), the data-mixing primitive: deterministic multiplicative-hash
    mask with a per-row threshold from a broadcast rate map.  Output: kept
    counts per class."""
    from timberjack_ray.aggregates import counts_by
    from timberjack_ray.functions.corpus import KNUTH32

    rates = {"error": 4096, "view": 205}  # per-4096; default 1024 (25%)
    ds = _rp(sf_dir, "events", columns=["event_id", "event_type"])

    def keep(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_pandas()
        thr = et.map(rates).fillna(1024).to_numpy(np.int64) * np.int64(1 << 20)
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        scr = (ids * np.uint64(KNUTH32)) % np.uint64(2**32)
        return t.filter(pa.array(scr < thr.astype(np.uint64)))

    return counts_by(ds.map_batches(keep, batch_format="pyarrow"), "event_type")


def q_actor_ids_union(sf_dir: str):
    """Set op UNION (distinct): ids active as event users ∪ order customers.
    Schema-aligned map → Dataset.union → per-batch distinct partials →
    guarded driver fold (degrades to a distributed groupby past the
    limit; only (id, n) pairs ever travel)."""
    ev = _rp(sf_dir, "events", columns=["user_id"]) \
        .map_batches(lambda t: pa.table({"actor_id": t["user_id"]}),
                     batch_format="pyarrow")
    od = _rp(sf_dir, "orders", columns=["o_custkey"]) \
        .map_batches(lambda t: pa.table({"actor_id": pc.cast(t["o_custkey"], pa.int64())}),
                     batch_format="pyarrow")
    from timberjack_ray.aggregates import distinct_values_guarded

    folded, mode = distinct_values_guarded(ev.union(od), "actor_id")
    if mode == "distributed":  # pragma: no cover - past the fold guard
        out = folded.to_pandas()[["actor_id"]]
    else:
        out = folded.select(["actor_id"]).to_pandas()
    return out.sort_values("actor_id").reset_index(drop=True) \
        .astype({"actor_id": "int64"})


def q_actor_ids_intersect(sf_dir: str):
    """Set op INTERSECT: ids that are BOTH event users and order customers.
    The smaller distinct side broadcasts; the larger side filters with an
    Arrow is_in probe — no shuffle; survivors dedup via the guarded
    driver fold."""
    from timberjack_ray.aggregates import counts_by

    ev_ids = counts_by(_rp(sf_dir, "events", columns=["user_id"]), "user_id")
    small = pa.array(ev_ids["user_id"].astype("int64"))

    def keep(t: pa.Table) -> pa.Table:
        k = pc.cast(t["o_custkey"], pa.int64())
        return pa.table({"actor_id": k.filter(pc.is_in(k, value_set=small))})

    from timberjack_ray.aggregates import distinct_values_guarded

    folded, mode = distinct_values_guarded(
        _rp(sf_dir, "orders", columns=["o_custkey"])
        .map_batches(keep, batch_format="pyarrow"), "actor_id")
    if mode == "distributed":  # pragma: no cover - past the fold guard
        out = folded.to_pandas()[["actor_id"]]
    else:
        out = folded.select(["actor_id"]).to_pandas()
    return out.sort_values("actor_id").reset_index(drop=True) \
        .astype({"actor_id": "int64"})


def q_actor_ids_except(sf_dir: str):
    """Set op EXCEPT: customers who placed orders but NEVER produced an
    event — completes the union/intersect family.  The subtrahend side's
    distinct keys broadcast once (counts_by partials — merge volume =
    distinct event users); the minuend side anti-filters with an inverted
    Arrow is_in probe per batch (no shuffle); survivors dedup via the
    guarded driver fold (degrades to a distributed groupby past the
    limit)."""
    from timberjack_ray.aggregates import counts_by, distinct_values_guarded

    ev = counts_by(_rp(sf_dir, "events", columns=["user_id"]), "user_id")
    block = pa.array(ev["user_id"].astype("int64"))

    def keep(t: pa.Table) -> pa.Table:
        k = pc.cast(t["o_custkey"], pa.int64())
        return pa.table({"actor_id": k.filter(
            pc.invert(pc.is_in(k, value_set=block)))})

    folded, mode = distinct_values_guarded(
        _rp(sf_dir, "orders", columns=["o_custkey"])
        .map_batches(keep, batch_format="pyarrow"), "actor_id")
    if mode == "distributed":  # pragma: no cover - past the fold guard
        out = folded.to_pandas()[["actor_id"]]
    else:
        out = folded.select(["actor_id"]).to_pandas()
    return out.sort_values("actor_id").reset_index(drop=True) \
        .astype({"actor_id": "int64"})


def q_hdr_value_quantiles(sf_dir: str):
    """Mergeable HDR-histogram quantiles (≤1% relative error at sig=3) —
    the scale path when distinct-value cardinality breaks exact_quantiles'
    per-value histogram.  Approximate vs the TRUE quantiles by design,
    but the binning is deterministic (truncate to sig=3 significant
    digits), so the sketch OUTPUT is exactly SQL-replayable —
    ORACLE-CHECKED since round 5 (same replay as its _checked twin);
    the error bound vs numpy is asserted in tests/test_sketch.py."""
    from timberjack_ray.functions.sketch import hdr_quantiles

    ds = _rp(sf_dir, "events", columns=["value"])
    out = hdr_quantiles(ds, "value", [0.5, 0.9, 0.99], scale=100, sig=3)
    return out.astype({"value_scaled": "int64"})


def q_hdr_value_quantiles_checked(sf_dir: str):
    """Same HDR sketch, hash-checked: the binning is DETERMINISTIC
    (truncate to sig=3 significant decimal digits — no sampling), so the
    oracle reproduces bin ids, cumulative ranks and low edges in SQL and
    the approximate quantile values match bit-for-bit.  Promotes the
    sketch from rows-only to value-checked without weakening its scale
    story (per-batch mergeable bin counts, one tiny exchange)."""
    return q_hdr_value_quantiles(sf_dir)


def q_normalized_distinct_docs(sf_dir: str):
    """C4-style normalization dedup: lowercase, strip non-alnum, collapse
    whitespace — then count distinct normalized texts per lang (how many
    docs survive normalization-level dedup).  Vectorized RE2 chain; the
    (group, distinct-key) pair dedup collapses per batch before the merge."""
    from timberjack_ray.functions.relational import distinct_count_by

    ds = _rp(sf_dir, "documents", columns=["lang", "text"])

    def norm_text(t: pa.Table) -> pa.Table:
        x = pc.utf8_lower(t["text"])
        x = pc.replace_substring_regex(x, "[^a-z0-9 ]+", " ")
        x = pc.replace_substring_regex(x, " +", " ")
        x = pc.utf8_trim_whitespace(x)
        return pa.table({"lang": t["lang"], "norm": x})

    normed = ds.map_batches(norm_text, batch_format="pyarrow")
    out = distinct_count_by(normed, "lang", "norm")
    return out.astype({"lang": "str", "n_distinct": "int64"})


def q_session_spans(sf_dir: str):
    """Pins the full sessionize ASSIGNMENT (not just counts): per (user,
    session) event count and microsecond span.  Gap = 3600 s.  The oracle
    recomputes session ids with a LAG + running-sum window."""
    from timberjack_ray.functions.sessions import sessionize

    ds = _rp(sf_dir, "events", columns=["user_id", "ts"])
    sess = sessionize(ds, "user_id", "ts", gap_s=3600)

    def partial(t: pa.Table) -> pa.Table:
        us = t["ts"].cast(pa.int64())
        g = pa.table({"user_id": t["user_id"], "session_id": t["session_id"],
                      "us": us}) \
            .group_by(["user_id", "session_id"]).aggregate(
                [([], "count_all"), ("us", "min"), ("us", "max")])
        return g.rename_columns(["user_id", "session_id", "n_events",
                                 "min_us", "max_us"])

    # sessions arrive whole (one bucket per map_groups output block), but
    # merge with min/max anyway so block splits can never corrupt the spans
    p = _collect_result(
        sess.map_batches(partial, batch_format="pyarrow")).to_pandas()
    out = p.groupby(["user_id", "session_id"], as_index=False).agg(
        n_events=("n_events", "sum"), min_us=("min_us", "min"),
        max_us=("max_us", "max"))
    out["span_us"] = out["max_us"] - out["min_us"]
    return out[["user_id", "session_id", "n_events", "span_us"]].astype("int64")


def q_session_size_histogram(sf_dir: str):
    """Session-size distribution — the bounce-rate diagnostic (a
    1-event session is a bounce; the share is the consumer's division
    from this exact histogram): sessionize (bucketed segmented
    assignment) → per-(user, session) count partials merged split-proof
    → size histogram bounded by the longest session, never session
    count."""
    from timberjack_ray.functions.sessions import sessionize

    ds = _rp(sf_dir, "events", columns=["user_id", "ts"])
    sess = sessionize(ds, "user_id", "ts", gap_s=3600)

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["user_id", "session_id"]) \
            .group_by(["user_id", "session_id"]).aggregate(
                [([], "count_all")])
        return g.rename_columns(["user_id", "session_id", "n"])

    p = _collect_result(
        sess.map_batches(partial, batch_format="pyarrow")).to_pandas()
    per = p.groupby(["user_id", "session_id"], as_index=False).agg(
        n=("n", "sum"))
    out = per.groupby("n").size().reset_index(name="n_sessions") \
        .rename(columns={"n": "n_events"})
    return out.sort_values("n_events").reset_index(drop=True) \
        .astype({"n_events": "int64", "n_sessions": "int64"})


def q_rare_bigram_counts(sf_dir: str):
    """LM-free fluency proxy: per-doc count of corpus-rare bigrams
    (corpus count ≤ 2).  Two passes; the rare set broadcasts once and the
    membership probe is an Arrow C hash lookup per batch."""
    from timberjack_ray.functions.corpus import rare_bigram_counts

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = rare_bigram_counts(ds, "doc_id", "text", max_count=2)
    return out.astype({"doc_id": "int64", "n_rare": "int64"})


def q_audio_features(sf_dir: str):
    """Audio leg of the multimodal plumbing: actor-pool featurize stage
    (duration/RMS/ZCR + banded energy vector) over opaque binary payloads;
    decode stubbed (no codec in sandbox), batching/schema real."""
    import ray.data as rd

    from timberjack_ray.functions.multimodal import (audio_features,
                                                     make_fake_media_table)

    ds = rd.from_arrow(make_fake_media_table(500, media_type="audio/wav"))
    out = audio_features(ds).to_pandas()
    return out[["media_id", "duration_s", "rms", "zcr"]]


def q_seq_pack_tokens(sf_dir: str):
    """Context packing over the REAL pre-tokenized sequences table
    (input_hint shape: doc_id, tokens, n_tok, source): greedy 2048-token
    bins per source.  Only (doc_id, n_tok, source) reach the shuffle — the
    token arrays stay in place until a downstream gather materializes
    packed examples.  Rows-only (the sequences table is not an oracle
    view); the greedy fold itself is oracle-checked via seq_pack_bins."""
    from timberjack_ray.functions.corpus import pack_sequences

    ds = _seq_ds(sf_dir)

    def slim(t: pa.Table) -> pa.Table:
        return t.select(["source", "doc_id", "n_tok"])

    from timberjack_ray.functions.corpus import pack_sequences_ds

    packed = pack_sequences_ds(ds.map_batches(slim, batch_format="pyarrow"),
                               "source", "doc_id", "n_tok", budget=2048)
    out = _pack_summary(packed, "source", "n_tok", "n_seqs")
    return out.astype({"n_seqs": "int64", "n_bins": "int64", "sum_tok": "int64"})


def q_custs_without_orders(sf_dir: str):
    """Left-outer bucketed join path: customers LEFT JOIN their URGENT
    orders, keep the null-match rows (classic anti-join via outer join),
    count per nation.  (The priority filter makes the anti-join set
    NON-empty at every sf — in this synthetic data every customer has
    orders, but not every customer has an URGENT one.)  Co-partitioning
    makes per-bucket outer joins globally correct — a left row's matches,
    if any, are all in its bucket."""
    from timberjack_ray.aggregates import counts_by
    from timberjack_ray.functions.relational import bucket_hash_join

    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _rp(sf_dir, "orders",
                 columns=["o_custkey", "o_orderkey", "o_orderpriority"]) \
        .map_batches(
            lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
            .select(["o_custkey", "o_orderkey"]),
            batch_format="pyarrow")
    joined = bucket_hash_join(cust, orders, "c_custkey", "o_custkey",
                              left_cols=["c_nationkey"], right_cols=["o_orderkey"],
                              n_buckets=32, join_type="left outer")

    def no_order(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t["o_orderkey"]))

    out = counts_by(joined.map_batches(no_order, batch_format="pyarrow"),
                    "c_nationkey")
    return out.astype({"c_nationkey": "int64", "n": "int64"})


def q_curation_pipeline(sf_dir: str):
    """End-to-end data curation, oracle-checked as ONE chain: quality
    filter (≥0.65) → deterministic ~80% hash sample → exact dedup (min
    doc_id per replayable content hash) → greedy context packing (budget
    256) → per-source summary.

    Text is read once and dropped after the first pass; only (ids, hash,
    size) tuples reach the dedup exchange and the per-source packing scan.
    The DuckDB oracle replays every stage (quality expr, HUGEINT Horner
    hash, ROW_NUMBER dedup, recursive-CTE packing) in a single query."""
    from timberjack_ray.functions.corpus import (add_content_hash,
                                                 hash_sample_mask,
                                                 pack_sequences_ds)
    from timberjack_ray.functions.text import QualityScorer

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "source"])
    scored = ds.map_batches(QualityScorer, batch_format="pyarrow", concurrency=2)

    def project(t: pa.Table) -> pa.Table:
        t = add_content_hash(t)
        n_tok = pc.list_value_length(pc.split_pattern(t["text"], " ")).cast(pa.int64())
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = pa.array(hash_sample_mask(ids, 3277))  # ~80%
        slim = pa.table({"doc_id": t["doc_id"], "source": t["source"],
                         "chash": t["chash"], "n_tok": n_tok,
                         "quality": t["quality"], "keep": keep})
        mask = pc.and_(pc.greater_equal(slim["quality"], 0.65), slim["keep"])
        return slim.filter(mask).drop_columns(["quality", "keep"])

    slim = scored.map_batches(project, batch_format="pyarrow")
    survivors = slim.groupby("chash").map_groups(
        lambda t: t.sort_by("doc_id").slice(0, 1), batch_format="pyarrow")
    packed = pack_sequences_ds(survivors, "source", "doc_id", "n_tok",
                               budget=256, n_shards=4)
    out = _pack_summary(packed, "source", "n_tok", "n_docs")
    if not len(out):
        return pd.DataFrame({"source": [], "n_docs": [], "n_bins": [], "sum_tok": []})
    return out.astype({"n_docs": "int64", "n_bins": "int64", "sum_tok": "int64"})


def q_source_token_shares(sf_dir: str):
    """Domain-mixing shares: per-source token sums + integer ppm of the
    corpus total (the mixing-weight primitive; exact integer arithmetic)."""
    from timberjack_ray.aggregates import merge_partials

    ds = _rp(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(pc.split_pattern(t["text"], " ")).cast(pa.int64())
        g = pa.table({"source": t["source"], "n_tok": n_tok}) \
            .group_by("source").aggregate([("n_tok", "sum")])
        return g.rename_columns(["source", "sum_tok"])

    merged = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                            ["source"], "sum_tok").to_pandas()
    total = int(merged["sum_tok"].sum())
    merged["ppm"] = merged["sum_tok"] * 1_000_000 // total
    return merged.astype({"sum_tok": "int64", "ppm": "int64"})


def q_content_hash_docs(sf_dir: str):
    """Replayable polynomial content hash (Horner mod 2^64 over codepoints)
    — the engine-agnostic integrity checksum; oracle recomputes the same
    fold with HUGEINT modular arithmetic."""
    from timberjack_ray.functions.corpus import add_content_hash

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(add_content_hash, batch_format="pyarrow").to_pandas()
    return out[["doc_id", "chash"]].astype({"doc_id": "int64", "chash": "int64"})


def q_split_leakage(sf_dir: str):
    """Split-hygiene audit: distinct CONTENTS that leak across id-based
    train/eval splits (doc_id % 10) — the id-keyed split every naive
    pipeline uses, which duplicate texts straddle (the content-keyed
    split_counts scheme can't, by construction).  Every 7th doc is
    cloned under a shifted id (deterministic in-batch augmentation, the
    stream_near_dup_pairs pattern — base corpus has no raw dups at small
    sf), replayed identically by the oracle.  Per-batch distinct
    (chash, split) pairs → ONE groupby(chash) Min/Max(split) exchange
    (9 B pairs only; text never shuffles) → leaked = min≠max folds to
    two ints per batch."""
    from ray.data.aggregate import Max, Min

    from timberjack_ray.functions.corpus import add_content_hash

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def pre(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        clone = t.filter(pa.array(ids % 7 == 0))
        clone = clone.set_column(
            clone.schema.get_field_index("doc_id"), "doc_id",
            pc.add(clone["doc_id"], pa.scalar(1_000_001, pa.int64())))
        t = pa.concat_tables([t, clone])
        t = add_content_hash(t)
        s = pc.cast(pc.subtract(
            t["doc_id"],
            pc.multiply(pc.divide(t["doc_id"], pa.scalar(10, pa.int64())),
                        pa.scalar(10, pa.int64()))), pa.int64())
        return pa.table({"chash": pc.cast(t["chash"], pa.int64()), "s": s}) \
            .group_by(["chash", "s"]).aggregate([])

    g = ds.map_batches(pre, batch_format="pyarrow") \
        .groupby("chash").aggregate(Min("s", alias_name="mn"),
                                    Max("s", alias_name="mx"))

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n_leaked": pa.array([], pa.int64()),
                             "n_contents": pa.array([], pa.int64())})
        leaked = int(pc.sum(pc.cast(pc.not_equal(t["mn"], t["mx"]),
                                    pa.int64())).as_py() or 0)
        return pa.table({"n_leaked": pa.array([leaked], pa.int64()),
                         "n_contents": pa.array([t.num_rows], pa.int64())})

    p = g.map_batches(part, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"n_leaked": [int(p["n_leaked"].sum())],
                         "n_contents": [int(p["n_contents"].sum())]})


def q_sampled_docs(sf_dir: str):
    """Deterministic multiplicative-hash sample (~20%): reproducible across
    runs/engines/partitionings, no RNG coordination at 10^12 rows."""
    from timberjack_ray.functions.corpus import hash_sample

    ds = _rp(sf_dir, "documents", columns=["doc_id"])
    out = hash_sample(ds, "doc_id", keep_per_4096=819).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype({"doc_id": "int64"})


def q_user_interarrival(sf_dir: str):
    """Per-user event inter-arrival stats (groupby shuffle = the semantics;
    numpy sort+diff per group). Integer-exact vs the LAG-window oracle."""
    from timberjack_ray.functions.corpus import interarrival_stats

    ds = _rp(sf_dir, "events", columns=["user_id", "ts"])
    out = interarrival_stats(ds, "user_id", "ts")
    return out.astype({"user_id": "int64", "n_gaps": "int64",
                       "sum_gap_us": "int64", "max_gap_us": "int64"})


def q_seq_pack_bins(sf_dir: str):
    """Greedy context-window packing (budget 256 tokens) per source in
    doc_id order — the LLM pretraining packing step.  Sequential scan per
    group only; text is dropped before the shuffle (only (ids, sizes)
    move).  Oracle: recursive CTE replaying the same greedy fold."""
    from timberjack_ray.functions.corpus import pack_sequences

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def sizes(t: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(pc.split_pattern(t["text"], " ")).cast(pa.int64())
        return pa.table({"source": t["source"], "doc_id": t["doc_id"], "n_tok": n_tok})

    slim = ds.map_batches(sizes, batch_format="pyarrow")
    out = pack_sequences(slim, "source", "doc_id", "n_tok", budget=256)
    return out.astype({"doc_id": "int64", "n_tok": "int64", "pack_bin": "int64"})


def q_seq_pack_sharded(sf_dir: str):
    """SHARDED greedy context packing (budget 256, 4 deterministic
    doc-id-hash shards per source) — the 100-TB packer path: no task
    materializes a whole source, bins never straddle shards, global bin
    ids stay dense via per-shard prefix-sum bases.  Oracle: recursive CTE
    partitioned by (source, shard) + windowed base sum — the exact rule
    the distributed plan executes."""
    from timberjack_ray.functions.corpus import pack_sequences

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def sizes(t: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(
            pc.split_pattern(t["text"], " ")).cast(pa.int64())
        return pa.table({"source": t["source"], "doc_id": t["doc_id"],
                         "n_tok": n_tok})

    slim = ds.map_batches(sizes, batch_format="pyarrow")
    out = pack_sequences(slim, "source", "doc_id", "n_tok", budget=256,
                         n_shards=4)
    return out.astype({"doc_id": "int64", "n_tok": "int64",
                       "pack_bin": "int64"})


def _pack_summary(packed_ds, group_col: str, size_col: str,
                  count_name: str) -> pd.DataFrame:
    """Per-group (n, n_bins, sum_tok) folded from streaming per-batch
    partials — the packed Dataset (one row per input row) never collects."""

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(group_col).aggregate(
            [([], "count_all"), ("pack_bin", "max"), (size_col, "sum")])
        return g.rename_columns([group_col, count_name, "max_bin", "sum_tok"])

    p = packed_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(p):
        return pd.DataFrame({group_col: [], count_name: [], "n_bins": [],
                             "sum_tok": []})
    out = p.groupby(group_col, as_index=False).agg(
        **{count_name: (count_name, "sum")},
        n_bins=("max_bin", "max"), sum_tok=("sum_tok", "sum"))
    out["n_bins"] = out["n_bins"] + 1
    return out


def q_bigram_topk(sf_dir: str):
    """Exact top-10 word bigrams, (n desc, bigram asc); per-batch Arrow
    partial counts collapse to the distinct-bigram set before merging."""
    from timberjack_ray.functions.corpus import bigram_topk

    ds = _rp(sf_dir, "documents", columns=["text"])
    return bigram_topk(ds, k=10)


def q_doc_top_term(sf_dir: str):
    """Per-doc most-discriminative term: (tf desc, df asc, term asc) — the
    integer-exact core of tf-idf (idf monotone in df).  Two passes; the
    vocabulary-sized df table is broadcast once via ray.put."""
    from timberjack_ray.functions.corpus import top_discriminative_term

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = top_discriminative_term(ds, "doc_id", "text")
    return out.astype({"doc_id": "int64", "term": "str"})


def q_props_templates(sf_dir: str):
    """Message-template mining over the JSON props payload: digit runs →
    '#', count distinct templates (vectorized RE2 replace + tiny groupby)."""
    from timberjack_ray.functions.corpus import template_counts

    ds = _rp(sf_dir, "events", columns=["props"])
    return template_counts(ds, "props")


def q_quality_histogram(sf_dir: str):
    """Decile histogram of the quality score.  Bit-exact float pipeline
    (quality_scores is hash-green) ⇒ identical buckets both sides."""
    from timberjack_ray.aggregates import counts_by
    from timberjack_ray.functions.text import QualityScorer

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    scored = ds.map_batches(QualityScorer, batch_format="pyarrow", concurrency=2)

    def bucketize(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.multiply(t["quality"], 10.0)), pa.int64())
        return pa.table({"bucket": b})

    return counts_by(scored.map_batches(bucketize, batch_format="pyarrow"), "bucket")


def q_best_doc_per_lang(sf_dir: str):
    """Per-lang argmax by quality (grouped top-1, tie doc_id asc): the
    per-batch prune means the exchange carries ≤ groups rows per batch."""
    from timberjack_ray.functions.relational import grouped_topk
    from timberjack_ray.functions.text import QualityScorer

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    scored = ds.map_batches(QualityScorer, batch_format="pyarrow", concurrency=2)
    out = grouped_topk(scored, "lang", "quality", k=1, tie_col="doc_id",
                       descending=True)
    return out[["lang", "doc_id"]].astype({"lang": "str", "doc_id": "int64"})


def q_heavy_user_filter(sf_dir: str):
    """Bot filtering: drop events of the top-5 heaviest users (n desc,
    user_id asc) — heavy set computed in pass 1, broadcast into the pass-2
    filter (5 keys ride the task closure; no shuffle)."""
    from timberjack_ray.aggregates import counts_by

    per_user = counts_by(_rp(sf_dir, "events", columns=["user_id"]), "user_id")
    heavy = per_user.sort_values(["n", "user_id"], ascending=[False, True]) \
        .head(5)["user_id"].to_numpy()
    heavy_arr = pa.array(heavy.astype("int64"))

    def keep(t: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(t["user_id"], value_set=heavy_arr))
        return t.filter(mask)

    ds = _rp(sf_dir, "events", columns=["user_id", "event_type"])
    return counts_by(ds.map_batches(keep, batch_format="pyarrow"), "event_type")


def q_grouped_sample_events(sf_dir: str):
    """Deterministic per-group sample: 3 events per event_type in
    multiplicative-scramble order — grouped top-K over a hash-derived sort
    key (reproducible reservoir-style sampling without RNG state)."""
    from timberjack_ray.functions.corpus import KNUTH32
    from timberjack_ray.functions.relational import grouped_topk

    ds = _rp(sf_dir, "events", columns=["event_id", "event_type"])

    def scramble(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        s = (ids * np.uint64(KNUTH32)) % np.uint64(2**32)
        return t.append_column("scramble", pa.array(s.astype(np.int64)))

    keyed = ds.map_batches(scramble, batch_format="pyarrow")
    out = grouped_topk(keyed, "event_type", "scramble", k=3,
                       tie_col="event_id", descending=False)
    return out[["event_type", "event_id"]].astype(
        {"event_type": "str", "event_id": "int64"})


def q_approx_distinct_users_by_type(sf_dir: str):
    """GROUPED HyperLogLog distinct (round 5): approximate distinct
    users PER event_type — the per-segment cardinality planner
    (sketch.approx_distinct_by's shape) on the SQL-replayable splitmix64
    + IEEE-deterministic estimator, so it is hash-checked from day one.

    Scale shape: per batch, one 16 KiB register blob per group value
    (groups × 2^p bytes regardless of user cardinality), register-max
    merge per group on the driver, one milli estimate per group.  The
    oracle reconstructs per-(type, idx) max ranks with GROUP BY and runs
    the same estimate chain per type row."""
    from timberjack_ray.functions.corpus import _splitmix64
    from timberjack_ray.functions.sketch import (HyperLogLog,
                                                 hll_estimate_milli)

    P = 14

    def sketch(t: pa.Table) -> pa.Table:
        df = t.select(["event_type", "user_id"]).to_pandas()
        out_t, out_r = [], []
        for g, sub in df.groupby("event_type", sort=False):
            hll = HyperLogLog(P)
            hll.add_hashed(_splitmix64(
                sub["user_id"].to_numpy().astype(np.uint64)))
            out_t.append(g)
            out_r.append(hll.registers.tobytes())
        return pa.table({"event_type": pa.array(out_t, pa.string()),
                         "regs": pa.array(out_r, pa.binary())})

    ds = _rp(sf_dir, "events", columns=["event_type", "user_id"])
    merged: dict[str, HyperLogLog] = {}
    for b in ds.map_batches(sketch, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for g, regs in zip(b["event_type"].to_pylist(),
                           b["regs"].to_pylist()):
            if g not in merged:
                merged[g] = HyperLogLog(P)
            merged[g].merge_registers(np.frombuffer(regs, dtype=np.uint8))
    rows = [(g, hll_estimate_milli(h.registers))
            for g, h in sorted(merged.items())]
    return pd.DataFrame(rows, columns=["event_type",
                                       "distinct_users_milli"]) \
        .astype({"distinct_users_milli": "int64"})


def q_approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate distinct (scale path for 10^9+-cardinality
    families; <1% error at p=14).  ORACLE-CHECKED since round 5 (was
    rows-only): the registers come from the same splitmix64(user_id)
    path hll_register_hist already replays in SQL, and the ESTIMATE is
    made IEEE-deterministic — Σ 2^(64−M_j) folds as an EXACT integer
    (HUGEINT in SQL, python int here), the double conversion is
    round-half-even in both engines, alpha·m²·2⁶⁴/S is a fixed
    left-associated chain of single IEEE ops (the power-of-two factors
    are rounding-free), and the linear-counting branch uses libm log ≡
    DuckDB ln.  Emits the milli-scaled floor.  Approximate vs the TRUE
    distinct count by design (tolerance asserted in tests/test_sketch.py);
    exact vs the sketch's own definition."""
    P = 14

    from timberjack_ray.functions.sketch import (hll_estimate_milli,
                                                  hll_over)

    ds = _rp(sf_dir, "events", columns=["user_id"])
    total = hll_over(ds, "user_id", p=P, hasher=_splitmix_col)
    return pd.DataFrame({"approx_distinct_users_milli":
                         np.array([hll_estimate_milli(total.registers)],
                                  np.int64)})


def q_stream_levels(sf_dir: str):
    """S2 bounded-streaming path (stdin analog): line-iterator ingest through
    the same kernels; no Ray session needed."""
    from timberjack_ray import AnalyzeConfig
    from timberjack_ray.data import synth
    from timberjack_ray.stream import analyze_stream

    rep = analyze_stream(
        (synth.line_for(i) for i in range(5000)),
        AnalyzeConfig(stats=True, trend=True, collect_lines=False),
    )
    return pd.DataFrame(rep["stats"]["log_levels"]).astype({"count": "int64"})


def q_multimodal_decode(sf_dir: str):
    import ray.data as rd

    from timberjack_ray.functions.multimodal import decode_images, make_fake_media_table

    ds = rd.from_arrow(make_fake_media_table(500))
    out = decode_images(ds).to_pandas()
    return out[["media_id", "pixel_mean", "pixel_std"]]


def q_domain_rebalance(sf_dir: str):
    """Domain-mixing resample (functions/corpus.rebalance_sources):
    deterministically down-sample each source toward a UNIFORM token share
    — pass 1 measures per-source token sums (tiny merge), pass 2 filters
    with the multiplicative-hash mask and a broadcast per-source
    keep-per-4096 threshold.  Output: per-source surviving doc count +
    token sum; the oracle replays both passes (identical float64 rate
    expression, identical hash mask)."""
    from timberjack_ray.functions.corpus import rebalance_sources

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source", "text"])
    kept = rebalance_sources(ds)

    def partial(t: pa.Table) -> pa.Table:
        n_tok = pc.list_value_length(pc.split_pattern(t["text"], " ")).cast(pa.int64())
        g = pa.table({"source": t["source"], "tok": n_tok}) \
            .group_by("source").aggregate([("tok", "sum"), ([], "count_all")])
        return g.rename_columns(["source", "sum_tok", "n_docs"])

    from timberjack_ray.aggregates import merge_partials

    out = merge_partials(kept.map_batches(partial, batch_format="pyarrow"),
                         ["source"], ["sum_tok", "n_docs"]).to_pandas()
    return out.sort_values("source").reset_index(drop=True) \
        .astype({"sum_tok": "int64", "n_docs": "int64"})


def q_multimodal_decode_real(sf_dir: str):
    """Real-codec image leg (round 3): PNG payloads built in-process
    (encode_png) and decoded by backend="real" — the stdlib PNG decoder
    behind the Pillow import guard (functions/multimodal.decode_png).
    Solid-colour images make pixel_mean/std deterministic.  Rows-only."""
    import ray.data as rd

    from timberjack_ray.functions.multimodal import decode_images, encode_png

    n = 64
    payloads = [encode_png(np.full((8, 8, 3), (i * 3) % 256, np.uint8))
                for i in range(n)]
    t = pa.table({
        "media_id": pa.array([f"png-{i:04d}" for i in range(n)]),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(["image/png"] * n),
        "width": pa.array([8] * n, pa.int32()),
        "height": pa.array([8] * n, pa.int32()),
        "sample_rate": pa.array([0] * n, pa.int32()),
        "n_frames": pa.array([1] * n, pa.int32()),
    })
    out = decode_images(rd.from_arrow(t), backend="real").to_pandas()
    return out[["media_id", "pixel_mean", "pixel_std"]] \
        .sort_values("media_id").reset_index(drop=True)


def q_frame_sample_real(sf_dir: str):
    """Real video-container leg: MJPEG payloads muxed in-process as
    RIFF-AVI (even rows) AND ISO BMFF / MP4 (odd rows — round 4, VERDICT
    r3 #7) and frame-EXTRACTED by the same backend="real" stage — the
    pure-stdlib container walkers (functions/multimodal
    ._container_frames); MJPEG frames are self-contained JPEGs so
    extraction needs no codec.  Emits the sampled frame indices and byte
    sizes.  Rows-only."""
    import ray.data as rd

    from timberjack_ray.functions.multimodal import (mux_mjpeg_avi,
                                                     mux_mjpeg_mp4,
                                                     sample_frames)

    n = 32
    payloads = [
        (mux_mjpeg_avi if i % 2 == 0 else mux_mjpeg_mp4)(
            [b"\xff\xd8" + bytes([j]) * (10 + j) + b"\xff\xd9"
             for j in range(3 + i % 5)])
        for i in range(n)
    ]
    t = pa.table({
        "media_id": pa.array(
            [f"{'avi' if i % 2 == 0 else 'mp4'}-{i:04d}" for i in range(n)]),
        "payload": pa.array(payloads, pa.binary()),
    })
    out = sample_frames(rd.from_arrow(t), max_frames=3,
                        backend="real").to_pandas()
    out["frame_len"] = out["frame_bytes"].str.len().astype("int64")
    return out[["media_id", "frame_idx", "frame_len"]] \
        .sort_values(["media_id", "frame_idx"]).reset_index(drop=True)


def q_audio_features_real(sf_dir: str):
    """Real-codec audio leg (round 3): PCM WAV payloads built with the
    stdlib wave module and decoded by backend="real"
    (functions/multimodal.decode_wav).  Rows-only."""
    import io
    import wave

    import ray.data as rd

    from timberjack_ray.functions.multimodal import audio_features

    n, sr = 64, 8000
    payloads = []
    for i in range(n):
        x = np.sin(2 * np.pi * (220 + i) * np.arange(sr // 10) / sr)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(sr)
            wf.writeframes((x * 32767).astype(np.int16).tobytes())
        payloads.append(buf.getvalue())
    t = pa.table({
        "media_id": pa.array([f"wav-{i:04d}" for i in range(n)]),
        "payload": pa.array(payloads, pa.binary()),
        "media_type": pa.array(["audio/wav"] * n),
        "width": pa.array([0] * n, pa.int32()),
        "height": pa.array([0] * n, pa.int32()),
        "sample_rate": pa.array([sr] * n, pa.int32()),
        "n_frames": pa.array([1] * n, pa.int32()),
    })
    out = audio_features(rd.from_arrow(t), backend="real").to_pandas()
    return out[["media_id", "duration_s", "rms", "zcr"]] \
        .sort_values("media_id").reset_index(drop=True)


def q_user_funnel(sf_dir: str):
    """Ordered view→click→purchase funnel (functions/sessions.funnel_counts):
    one key-hash bucketed exchange of the (user, ts, type) projection, then
    per-bucket vectorized segmented step resolution — only len(steps) partial
    rows per bucket reach the merge."""
    from timberjack_ray.functions.sessions import funnel_counts

    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return funnel_counts(ds, "user_id", "ts", "event_type",
                         ["view", "click", "purchase"])


def q_weekly_event_growth(sf_dir: str):
    """Time-series growth: per (type, ISO-ish week = epoch_us // 7d)
    event counts with the week-over-week DELTA (LAG diff) — the
    monitoring series every telemetry pipeline charts.  Counts travel as
    (type, week) partials (merge bounded by types × weeks); the LAG is a
    driver walk over that bounded table, gap weeks contributing a full
    drop (delta vs 0 would be wrong — the diff is vs the PREVIOUS
    OBSERVED week, exactly what the SQL LAG does)."""
    from timberjack_ray.aggregates import merge_partials

    def bucket(t: pa.Table) -> pa.Table:
        w = pc.divide(pc.cast(t["ts"], pa.int64()),
                      pa.scalar(7 * 86_400_000_000, pa.int64()))
        g = pa.table({"event_type": t["event_type"], "week": w}) \
            .group_by(["event_type", "week"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "week", "n"])

    ds = _rp(sf_dir, "events", columns=["ts", "event_type"])
    h = merge_partials(ds.map_batches(bucket, batch_format="pyarrow"),
                       ["event_type", "week"], "n").to_pandas() \
        .sort_values(["event_type", "week"]).reset_index(drop=True)
    h["delta"] = h.groupby("event_type")["n"].diff().fillna(0)
    return h.astype({"week": "int64", "n": "int64", "delta": "int64"})


def q_funnel_step_latency(sf_dir: str):
    """Per-STEP conversion latency: for each funnel step ≥ 2, the exact
    P50 of the seconds from the previous step's first qualifying time
    (converted users only) — the "where does the funnel stall" metric.
    Same single exchange and masked-reduceat kernel as user_funnel, but
    each bucket emits (step, gap-seconds) HISTOGRAM partials; the
    quantile walk runs on the step×distinct-gap-bounded merge."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.corpus import _segments, add_key_bucket

    steps = ["view", "click", "purchase"]
    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    bucketed = add_key_bucket(
        ds.select_columns(["user_id", "ts", "event_type"]), "user_id", 64)
    big = np.iinfo(np.int64).max

    def per_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({"step": pa.array([], pa.int64()),
                          "gap_s": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        k = t["user_id"].to_numpy(zero_copy_only=False)
        ts = pc.cast(t["ts"].combine_chunks(), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ty = t["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, k))
        ks, ss, tys = k[order], ts[order], ty[order]
        starts, sizes = _segments(ks)
        prev = np.full(len(ks), np.iinfo(np.int64).min, dtype=np.int64)
        outs = []
        for j, step in enumerate(steps):
            masked = np.where((tys == step) & (ss > prev), ss, big)
            seg_min = np.minimum.reduceat(masked, starts) \
                if len(starts) else np.empty(0, np.int64)
            if j > 0:
                prev_first = prev[starts]
                conv = (seg_min < big) & (prev_first > np.iinfo(np.int64).min)
                gaps = (seg_min[conv] - prev_first[conv]) // 1_000_000
                v, n = np.unique(gaps, return_counts=True)
                outs.append(pa.table({
                    "step": pa.array(np.full(len(v), j + 1, np.int64)),
                    "gap_s": pa.array(v.astype(np.int64)),
                    "n": pa.array(n.astype(np.int64))}))
            prev = np.repeat(seg_min, sizes)
        return pa.concat_tables(outs) if outs else empty

    p = bucketed.groupby("__kb").map_groups(
        lambda t: per_bucket(t.drop_columns(["__kb"])),
        batch_format="pyarrow")
    h = merge_partials(p, ["step", "gap_s"], "n").to_pandas() \
        .sort_values(["step", "gap_s"])
    rows = []
    for step, g in h.groupby("step"):
        cum = g["n"].cumsum().to_numpy()
        tot = int(cum[-1])
        med = int(g["gap_s"].to_numpy()[
            np.searchsorted(cum, max(-(-tot // 2), 1), side="left")])
        rows.append((int(step), steps[int(step) - 1], med, tot))
    return pd.DataFrame(rows, columns=["step", "step_type", "p50_gap_s",
                                       "n_converted"]) \
        .astype({"step": "int64", "p50_gap_s": "int64",
                 "n_converted": "int64"})


def q_transition_latency(sf_dir: str):
    """Markov chain WITH holding times (transition_counts
    with_latency=True): per (cur_type, next_type), the count AND exact
    summed sojourn microseconds between adjacent same-user events —
    mean dwell is the consumer's division.  Same single exchange and
    alphabet²-bounded merge as event_transitions."""
    from timberjack_ray.functions.sessions import transition_counts

    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_type", "event_id"])
    return transition_counts(ds, "user_id", "ts", "event_type",
                             "event_id", with_latency=True)


def q_copurchase_top20(sf_dir: str):
    """Market-basket association output: the 20 most co-purchased part
    PAIRS (parts appearing together in the most orders) — the
    recommendation-rule miner over part_triangles' exact edge machinery:
    distinct (order, part) per batch → ONE order-bucket exchange →
    segmented d-offset pair expansion (fan-out bounded by order size) →
    guarded (u, v, n) edge fold → top-20 by (n desc, u, v)."""
    from timberjack_ray.aggregates import merge_partials_or_ds
    from timberjack_ray.functions.corpus import add_key_bucket
    from timberjack_ray.functions.graph import _offset_pairs

    def batch_distinct(t: pa.Table) -> pa.Table:
        return (t.select(["l_orderkey", "l_partkey"])
                .group_by(["l_orderkey", "l_partkey"]).aggregate([]))

    def per_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        g = t["l_orderkey"].to_numpy(zero_copy_only=False)
        i = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((i, g))
        gs, it = g[order], i[order]
        keep = np.r_[True, (gs[1:] != gs[:-1]) | (it[1:] != it[:-1])]
        gs, it = gs[keep], it[keep]
        a, b = _offset_pairs(gs, it)
        if not len(a):
            return empty
        tbl = pa.table({"u": pa.array(a), "v": pa.array(b)})
        gby = tbl.group_by(["u", "v"]).aggregate([([], "count_all")])
        return gby.rename_columns(["u", "v", "n"])

    ds = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"]) \
        .map_batches(batch_distinct, batch_format="pyarrow")
    bucketed = add_key_bucket(ds, "l_orderkey", 64)
    p = bucketed.groupby("__kb").map_groups(
        lambda t: per_bucket(t.drop_columns(["__kb"])),
        batch_format="pyarrow")
    edges, mode = merge_partials_or_ds(p, ["u", "v"], ["n"])
    if mode != "driver":  # pragma: no cover - past the edge guard
        # degraded fold = a Dataset with each (u,v) edge exactly once:
        # resolve the top-20 distributedly (per-batch top-k, ≤ 20×blocks
        # rows reach the driver) instead of concatenating every edge
        from timberjack_ray.functions.relational import sorted_topk
        out = sorted_topk(edges, ["n", "u", "v"], 20,
                          descending=[True, False, False])
        out = out[["u", "v", "n"]].reset_index(drop=True)
    else:
        out = edges.to_pandas().sort_values(
            ["n", "u", "v"], ascending=[False, True, True]).head(20) \
            .reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["rank", "u", "v", "n"]].astype("int64")


def q_ab_experiment_report(sf_dir: str):
    """A/B experiment census: users assign to arms by the deterministic
    multiplicative hash (no RNG state — the same subset-stable trick as
    sampled_docs, so an arm is reproducible across engines and reruns);
    per arm, exact (n_users, n_converted = users with MORE purchases
    than views — a predicate that actually splits this corpus).  The
    two-proportion test statistic is the consumer's float — these four
    ints are the sufficient statistics.  Per-batch distinct (user, flag)
    partials → guarded Max fold (user-bounded; distributed degrade
    kept)."""
    from timberjack_ray.aggregates import merge_partials_or_ds
    from timberjack_ray.functions.corpus import KNUTH32

    def partial(t: pa.Table) -> pa.Table:
        p_ = pc.cast(pc.equal(t["event_type"], "purchase"), pa.int64())
        v_ = pc.cast(pc.equal(t["event_type"], "view"), pa.int64())
        g = pa.table({"u": t["user_id"], "p": p_, "v": v_}) \
            .group_by("u").aggregate([("p", "sum"), ("v", "sum")])
        return g.rename_columns(["u", "p", "v"])

    ds = _rp(sf_dir, "events", columns=["user_id", "event_type"])
    folded, mode = merge_partials_or_ds(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["u"], ["p", "v"], ops=["sum", "sum"])

    def arm_stats(tbl: pa.Table) -> pd.DataFrame:
        u = tbl["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        f = (tbl["p"].to_numpy(zero_copy_only=False)
             > tbl["v"].to_numpy(zero_copy_only=False)).astype(np.int64)
        arm = (((u * np.uint64(KNUTH32)) % np.uint64(2**32))
               % np.uint64(2)).astype(np.int64)
        rows = [(a, int((arm == a).sum()), int(f[arm == a].sum()))
                for a in (0, 1)]
        return pd.DataFrame(rows, columns=["arm", "n_users", "n_converted"])

    if mode != "driver":  # pragma: no cover - past the user guard
        # degraded fold = a Dataset with each user exactly once: compute
        # per-batch (arm, n_users, n_converted) partials and sum-merge —
        # 2 rows per batch reach the driver, never the user table
        from timberjack_ray.aggregates import merge_partials
        p2 = folded.map_batches(
            lambda t: pa.Table.from_pandas(arm_stats(t),
                                           preserve_index=False),
            batch_format="pyarrow")
        out = merge_partials(p2, ["arm"], ["n_users", "n_converted"]) \
            .to_pandas()
        return out.sort_values("arm").reset_index(drop=True).astype("int64")
    return arm_stats(folded).astype("int64")


def q_customer_ltv_curve(sf_dir: str):
    """Cohort LTV curve: revenue cents by customer TENURE month (order
    date − that customer's first order, in 30-day buckets) — how value
    accrues over a relationship's lifetime.  ONE exchange on custkey;
    per bucket every customer resolves in one vectorized pass (lexsort +
    segmented min rebases each order to its customer's first date) and
    only (tenure_month, rev_c, n_orders) partials leave — bounded by the
    corpus time span, never customer count."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.corpus import _segments, add_key_bucket
    from timberjack_ray.functions.util import scale_to_int

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"c": t["o_custkey"],
                         "d": pc.cast(t["o_orderdate"], pa.int64()),
                         "m": scale_to_int(t["o_totalprice"], 100)})

    def per_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({"tenure_month": pa.array([], pa.int64()),
                          "rev_c": pa.array([], pa.int64()),
                          "n_orders": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        c = t["c"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        m = t["m"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, c))
        cs, ds_, ms = c[order], d[order], m[order]
        starts, sizes = _segments(cs)
        first = np.repeat(ds_[starts], sizes)
        month = (ds_ - first) // (30 * 86_400_000_000)
        g = pa.table({"tenure_month": pa.array(month),
                      "m": pa.array(ms)}) \
            .group_by("tenure_month").aggregate(
                [("m", "sum"), ([], "count_all")])
        return g.rename_columns(["tenure_month", "rev_c", "n_orders"])

    ds = _rp(sf_dir, "orders",
             columns=["o_custkey", "o_orderdate", "o_totalprice"]) \
        .map_batches(prep, batch_format="pyarrow")
    bucketed = add_key_bucket(ds, "c", 64)
    p = bucketed.groupby("__kb").map_groups(
        lambda t: per_bucket(t.drop_columns(["__kb"])),
        batch_format="pyarrow")
    out = merge_partials(p, ["tenure_month"], ["rev_c", "n_orders"]) \
        .to_pandas()
    return out.sort_values("tenure_month").reset_index(drop=True) \
        .astype({"tenure_month": "int64", "rev_c": "int64",
                 "n_orders": "int64"})


def q_error_cusum_alarms(sf_dir: str):
    """Sequential change-point detection — integer CUSUM over the hourly
    error-count series: S_t = max(0, S_{t-1} + x_t − k) with slack k =
    ceil(mean) + 1; windows where S reaches h = 5·k alarm, and S decays
    by k − x per quiet hour after the burst.  A PLANTED burst (every
    3rd error re-emitted into hour min+100 — the synth series is
    stationary, SQL-replayed) gives the detector something to find.
    Per-window counts fold to #windows rows; the CUSUM recursion is a
    driver walk over that bounded series (no SQL window expresses the
    max(0, ·) recursion — the oracle replays it with a RECURSIVE CTE,
    gap hours contributing x = 0).  Output: (hour, s) for alarmed
    windows only."""
    from timberjack_ray.aggregates import merge_partials

    def bucket(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "error"))
        h = pc.divide(pc.cast(t["ts"], pa.int64()),
                      pa.scalar(3_600_000_000, pa.int64())) \
            .to_numpy(zero_copy_only=False)
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        # planted burst: clones land at (corpus min hour + 100); the min
        # over THIS batch is wrong — emit clone counts keyed by a
        # sentinel and rebase after the merge (min hour is global)
        n_clone = int((ids % 3 == 0).sum())
        hh = np.concatenate([h, [np.iinfo(np.int64).min]])
        nn = np.concatenate([np.ones(len(h), np.int64), [n_clone]])
        g = pa.table({"h": pa.array(hh), "n": pa.array(nn)}) \
            .group_by("h").aggregate([("n", "sum")])
        return g.rename_columns(["h", "n"])

    ds = _rp(sf_dir, "events", columns=["ts", "event_type", "event_id"])
    cnt = merge_partials(ds.map_batches(bucket, batch_format="pyarrow"),
                         ["h"], "n").to_pandas().sort_values("h")
    sentinel = np.iinfo(np.int64).min
    burst_n = int(cnt.loc[cnt["h"] == sentinel, "n"].sum())
    cnt = cnt[cnt["h"] != sentinel]
    burst_h = int(cnt["h"].min()) + 100
    extra = pd.DataFrame({"h": [burst_h], "n": [burst_n]})
    cnt = pd.concat([cnt, extra]).groupby("h", as_index=False) \
        .agg(n=("n", "sum")).sort_values("h")
    hs = cnt["h"].to_numpy(np.int64)
    ns = cnt["n"].to_numpy(np.int64)
    dense = np.arange(hs.min(), hs.max() + 1, dtype=np.int64)
    x = np.zeros(len(dense), np.int64)
    x[np.searchsorted(dense, hs)] = ns
    total = int(ns.sum())
    k = -(-total // len(dense)) + 1  # ceil(mean) + 1 slack
    hthr = 5 * k
    s = 0
    rows = []
    for hh, xx in zip(dense.tolist(), x.tolist()):
        s = max(0, s + xx - k)
        if s >= hthr:
            rows.append((hh, s))
    return pd.DataFrame(rows, columns=["h", "s"]) \
        .astype({"h": "int64", "s": "int64"})


def q_signup_to_purchase_survival(sf_dir: str):
    """Survival-analysis inputs (sessions.survival_day_histogram): the
    per-day (n_event, n_censored) table for signup→first-purchase
    durations, never-converting users censored at the corpus max ts —
    the exact-integer Kaplan-Meier input (the estimator is the
    consumer's float product).  One corpus-max pre-pass + one bucketed
    exchange; only the day-bounded histogram leaves a bucket."""
    from timberjack_ray.functions.sessions import survival_day_histogram

    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return survival_day_histogram(ds, "user_id", "ts", "event_type",
                                  "signup", "purchase")


def q_order_value_lorenz(sf_dir: str):
    """Exact Lorenz-curve points — the value-concentration diagnostic
    behind the Gini family (source_skew_stats): at each decile of ORDERS
    (ranked by value asc), the exact cumulative cents held by that
    bottom share.  One (value-cents, n, sum) histogram pass
    (distinct-value-bounded); the driver walk resolves each decile's
    cumulative value in pure ints — equal values contribute equally, so
    the result is tie-order-independent and replays as a SQL
    running-sum window picked at ROW_NUMBER = ceil(N·d/10)."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.util import scale_to_int

    def partial(t: pa.Table) -> pa.Table:
        v = scale_to_int(t["o_totalprice"], 100)
        g = pa.table({"v": v}).group_by("v").aggregate(
            [([], "count_all")])
        g = g.rename_columns(["v", "n"])
        return g.append_column(
            "s", pc.multiply(g["v"], pc.cast(g["n"], pa.int64())))

    ds = _rp(sf_dir, "orders", columns=["o_totalprice"])
    h = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                       ["v"], ["n", "s"]).to_pandas().sort_values("v")
    v = h["v"].to_numpy(np.int64)
    n = h["n"].to_numpy(np.int64)
    s = h["s"].to_numpy(np.int64)
    cum_n = np.cumsum(n)
    cum_s = np.cumsum(s)
    N = int(cum_n[-1])
    rows = []
    for d in range(1, 11):
        k = -(-N * d // 10)  # ceil(N*d/10)
        i = int(np.searchsorted(cum_n, k, side="left"))
        below_n = int(cum_n[i - 1]) if i else 0
        below_s = int(cum_s[i - 1]) if i else 0
        cum_val = below_s + (k - below_n) * int(v[i])
        rows.append((d, k, cum_val))
    out = pd.DataFrame(rows, columns=["decile", "n_orders", "cum_value_c"])
    out["total_value_c"] = int(cum_s[-1])
    return out.astype({c: "int64" for c in out.columns})


def q_event_type_user_overlap(sf_dir: str):
    """Audience co-engagement matrix (corpus.item_group_overlap — the
    generic bitmask core source_vocab_overlap now delegates to): exact
    pairwise |users(a) ∩ users(b)| / |∪| between event types via ONE
    user-bucket exchange and an n²-bounded per-bucket matmul collapse —
    merge volume never depends on user cardinality."""
    from timberjack_ray.functions.corpus import item_group_overlap

    ds = _rp(sf_dir, "events", columns=["event_type", "user_id"])
    out = item_group_overlap(ds, "event_type", "user_id")
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_ship_latency_quantiles(sf_dir: str):
    """Join→grouped-quantile chain: per-priority P50/P90 of the
    order-to-ship latency in days — the fulfillment-SLA report.  ONE
    GRACE exchange joins lineitem to orders (neither side broadcast, the
    latency needs columns from both), the day-diff is computed in-bucket,
    and grouped_quantiles folds only the (priority, days) histogram —
    quantile traffic is value-histogram-sized, never row-sized."""
    from timberjack_ray.functions.relational import (bucket_hash_join,
                                                     grouped_quantiles)

    def l_prep(t: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "ship_us": pc.cast(t["l_shipdate"], pa.int64())})

    def o_prep(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "ord_us": pc.cast(t["o_orderdate"], pa.int64()),
                         "prio": t["o_orderpriority"]})

    def lat(t: pa.Table) -> pa.Table:
        d = pc.divide(pc.subtract(t["ship_us"], t["ord_us"]),
                      pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({"prio": t["prio"], "lat_days": d})

    j = bucket_hash_join(
        _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
        .map_batches(l_prep, batch_format="pyarrow"),
        _rp(sf_dir, "orders",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
        .map_batches(o_prep, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey", ["ship_us"], ["ord_us", "prio"],
        n_buckets=32, bucket_fn=lat)
    out = grouped_quantiles(j, "prio", "lat_days", [0.5, 0.9], scale=1)
    return out.rename(columns={"value_scaled": "lat_days"}) \
        .sort_values(["prio", "q"]).reset_index(drop=True) \
        .astype({"lat_days": "int64"})


def q_flag_weighted_median_price(sf_dir: str):
    """GROUPED exact weighted median: quantity-weighted price median per
    return flag — the grouped form of weighted_median_price.  One pass
    folds the (flag, value-cents, weight-sum) histogram (groups ×
    distinct values bounded); the driver walks each group's cumulative
    weights with the same 2·cum ≥ tot integer rule, replayed per group
    by a partitioned running-sum window."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.util import scale_to_int

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"flag": t["l_returnflag"],
                      "v": scale_to_int(t["l_extendedprice"], 100),
                      "w": scale_to_int(t["l_quantity"], 1)}) \
            .group_by(["flag", "v"]).aggregate([("w", "sum")])
        return g.rename_columns(["flag", "v", "w"])

    ds = _rp(sf_dir, "lineitem",
             columns=["l_returnflag", "l_extendedprice", "l_quantity"])
    h = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                       ["flag", "v"], "w").to_pandas() \
        .sort_values(["flag", "v"])
    rows = []
    for flag, g in h.groupby("flag"):
        v = g["v"].to_numpy(np.int64)
        w = g["w"].to_numpy(np.int64)
        cum = np.cumsum(w)
        tot = int(cum[-1])
        med = int(v[np.searchsorted(2 * cum, tot, side="left")])
        rows.append((flag, med, tot))
    return pd.DataFrame(rows, columns=["flag", "wmedian_scaled",
                                       "total_weight"]) \
        .sort_values("flag").reset_index(drop=True) \
        .astype({"wmedian_scaled": "int64", "total_weight": "int64"})


def q_rfm_segments(sf_dir: str):
    """RFM segmentation — the classic customer-analytics composition:
    per-customer (Recency = days since last order vs the corpus max,
    Frequency = order count, Monetary = cents total) from ONE streaming
    pass of per-batch per-customer partials (max/count/sum — all
    mergeable); each dimension cuts at its exact type-1 MEDIAN over the
    customer-bounded table (GUARDED fold; distributed degrade
    documented), yielding the 2×2×2 segment census.  Integer rules
    (r ≤ med, f > med, m > med) replay exactly in SQL."""
    from timberjack_ray.aggregates import merge_partials_or_ds
    from timberjack_ray.functions.util import scale_to_int

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "c": t["o_custkey"],
            "d": pc.cast(t["o_orderdate"], pa.int64()),
            "m": scale_to_int(t["o_totalprice"], 100),
        }).group_by("c").aggregate(
            [("d", "max"), ([], "count_all"), ("m", "sum")])
        return g.rename_columns(["c", "last_us", "f", "m"])

    ds = _rp(sf_dir, "orders",
             columns=["o_custkey", "o_orderdate", "o_totalprice"])
    folded, mode = merge_partials_or_ds(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["c"], ["last_us", "f", "m"], ops=["max", "sum", "sum"])
    if mode != "driver":  # pragma: no cover - past the customer guard
        raise ValueError("rfm_segments: customer cardinality exceeds the "
                         "fold guard — stream the per-customer Dataset and "
                         "cut on sampled quantiles instead")
    last = folded["last_us"].to_numpy(zero_copy_only=False)
    f = folded["f"].to_numpy(zero_copy_only=False)
    m = folded["m"].to_numpy(zero_copy_only=False)
    r = (int(last.max()) - last) // 86_400_000_000

    def med(v: np.ndarray) -> int:  # type-1 / quantile_disc(0.5)
        s = np.sort(v)
        return int(s[int(np.ceil(0.5 * len(s))) - 1])

    rc, fc, mc = med(r), med(f), med(m)
    seg = pd.DataFrame({
        "r_recent": (r <= rc).astype(np.int64),
        "f_hi": (f > fc).astype(np.int64),
        "m_hi": (m > mc).astype(np.int64),
    })
    out = seg.groupby(["r_recent", "f_hi", "m_hi"]).size() \
        .reset_index(name="n")
    return out.sort_values(["r_recent", "f_hi", "m_hi"]) \
        .reset_index(drop=True).astype({"n": "int64"})


def q_weighted_median_price(sf_dir: str):
    """Exact WEIGHTED median: the quantity-weighted median of lineitem
    unit prices (each row counts with weight = its quantity) — the
    inventory-/volume-weighted statistic a plain median misstates.  One
    streaming pass folds the (value-cents, weight-sum) histogram
    (distinct-value-bounded, same shape as exact_quantiles); the driver
    walk picks the first value whose doubled cumulative weight reaches
    the total (lower weighted median — integer rule, no interpolation),
    replayed in SQL by a running-sum window."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.util import scale_to_int

    def partial(t: pa.Table) -> pa.Table:
        v = scale_to_int(t["l_extendedprice"], 100)
        w = scale_to_int(t["l_quantity"], 1)
        g = pa.table({"v": v, "w": w}).group_by("v") \
            .aggregate([("w", "sum")])
        return g.rename_columns(["v", "w"])

    ds = _rp(sf_dir, "lineitem", columns=["l_extendedprice", "l_quantity"])
    h = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                       ["v"], "w").to_pandas().sort_values("v")
    v = h["v"].to_numpy(np.int64)
    w = h["w"].to_numpy(np.int64)
    cum = np.cumsum(w)
    tot = int(cum[-1])
    med = int(v[np.searchsorted(2 * cum, tot, side="left")])
    return pd.DataFrame({"wmedian_scaled": [med],
                         "total_weight": [tot]})


def q_auto_join_revenue(sf_dir: str):
    """Cost-based join planning (relational.auto_join): revenue by
    priority where the ENGINE picks the physical join — at sf0.001 the
    orders side is under the broadcast limit and never shuffles; at
    sf0.01+ the same query takes the GRACE exchange; a skewed probe side
    would route hot keys around it.  The result is plan-invariant, so
    ONE oracle hash-checks every path the scale selects."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.relational import auto_join
    from timberjack_ray.functions.util import scale_to_int

    def l_prep(t: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "cents": scale_to_int(t["l_extendedprice"], 100)})

    def agg(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderpriority").aggregate(
            [("cents", "sum"), ([], "count_all")])
        return g.rename_columns(["o_orderpriority", "rev_c", "n"])

    j, plan = auto_join(
        _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])
        .map_batches(l_prep, batch_format="pyarrow"),
        _rp(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]),
        "l_orderkey", "o_orderkey", ["cents"], ["o_orderpriority"],
        broadcast_limit=10_000, n_buckets=32, bucket_fn=agg)
    out = merge_partials(j, ["o_orderpriority"], ["rev_c", "n"]).to_pandas()
    out = out.sort_values("o_orderpriority").reset_index(drop=True) \
        .astype({"rev_c": "int64", "n": "int64"})
    out.attrs["plan"] = plan
    return out


def q_user_funnel_1h(sf_dir: str):
    """Conversion-WINDOW funnel (funnel_counts window_s): the
    view→click→purchase funnel where each later step must land within
    ONE HOUR of the previous step's first qualifying time — the
    "converted within the hour" product-analytics refinement; same
    single bucketed exchange and steps-sized merge as user_funnel."""
    from timberjack_ray.functions.sessions import funnel_counts

    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return funnel_counts(ds, "user_id", "ts", "event_type",
                         ["view", "click", "purchase"], window_s=3600)


def q_orders_rollup(sf_dir: str):
    """GROUP BY ROLLUP(priority, status) revenue sums
    (functions/relational.rollup_sums): the rollup expansion happens inside
    map_batches so all levels come out of ONE pass; merge volume is
    distinct-combo-sized.  Cent-scaled int sums replay exactly in SQL."""
    from timberjack_ray.functions.relational import rollup_sums

    ds = _rp(sf_dir, "orders",
             columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])
    return rollup_sums(ds, ["o_orderpriority", "o_orderstatus"],
                       "o_totalprice", scale=100)


def q_orders_cube(sf_dir: str):
    """GROUP BY CUBE(priority, status) revenue sums
    (functions/relational.cube_sums → grouping_sets_sums): all 2^k
    grouping sets expanded inside map_batches, so the whole cube comes
    out of ONE input pass; merge volume is distinct-combo-sized.
    Cent-scaled int sums replay exactly in SQL."""
    from timberjack_ray.functions.relational import cube_sums

    ds = _rp(sf_dir, "orders",
             columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])
    return cube_sums(ds, ["o_orderpriority", "o_orderstatus"],
                     "o_totalprice", scale=100)


def q_bloom_decontaminate_docs(sf_dir: str):
    """Bloom-filter decontamination (functions/dedup.bloom_decontaminate):
    constant-size broadcast bitmap instead of the exact gram array; may
    over-drop (bounded FP) but never keeps a contaminated doc.  Round 4:
    runs the ``hasher="poly"`` Horner gram family so the ENTIRE bitmap —
    Kirsch–Mitzenmacher coords off a mod-2^64 multiply, power-of-two
    modulus — replays in SQL (positions are mod 2^22, and 2^22 | 2^64
    makes the wrap-then-mod exactly HUGEINT mod); hash-checked.  The FNV
    family superset/FP properties stay pinned in tests/test_functions.py."""
    from timberjack_ray.functions.dedup import bloom_decontaminate

    docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_slice(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 17 == 0))

    bench = _rp(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(bench_slice, batch_format="pyarrow")
    kept = bloom_decontaminate(docs, bench, hasher="poly") \
        .select_columns(["doc_id"])
    out = kept.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return out.astype({"doc_id": "int64"})


def q_value_mad_by_type(sf_dir: str):
    """Per-type median absolute deviation on the cent domain
    (functions/relational.grouped_mad): two histogram-sized streaming
    passes (median, then median of |x−median|) — robust spread, exact
    ints, SQL replays via nested quantile_disc."""
    from timberjack_ray.functions.relational import grouped_mad

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    out = grouped_mad(ds, "event_type", "value", scale=100)
    return out.astype({"event_type": "str", "median_scaled": "int64",
                       "mad_scaled": "int64"})


def q_value_outlier_counts(sf_dir: str):
    """Robust per-type anomaly counts (functions/relational.
    grouped_outlier_counts): |cents − median| > 3·MAD as an exact
    integer inequality — two histogram-sized passes + one broadcast
    counter pass; merge volume = #types."""
    from timberjack_ray.functions.relational import grouped_outlier_counts

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    return grouped_outlier_counts(ds, "event_type", "value", k=3, scale=100)


def q_retention_cohorts(sf_dir: str):
    """Weekly cohort retention matrix (functions/sessions.retention_cohorts):
    cohort = week of first signup; n_users = distinct cohort members active
    k weeks later.  Broadcast signup map + one distinct-triple scan."""
    from timberjack_ray.functions.sessions import retention_cohorts

    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return retention_cohorts(ds, "user_id", "ts", "event_type")


def q_doc_entropy(sf_dir: str):
    """Per-doc byte-entropy quality signal (functions/text.add_char_entropy):
    one flat-buffer count grid per batch.  ORACLE-CHECKED since round 5
    (was rows-only): emits ``entropy_cb = entropy_u // 100`` (units of
    10 µbits, 4–5 significant digits).  The micro-bit value itself
    differs between numpy's pairwise summation and SQL's SUM by at most
    ±1 ULP-driven unit near a rounding boundary (~1e-7/doc); the //100
    coarsening masks that unless the boundary also sits at a multiple of
    100 (~1e-9/doc — negligible), while log2 per distinct (doc, char)
    term stays IEEE-comparable.  The SQL replay is character-level;
    exact equality to the BYTE-level kernel relies on the driver's
    documents being pure ASCII (verified for all sf dirs).  Full
    micro-bit numbers remain pinned vs numpy in test_functions.py."""
    from timberjack_ray.functions.text import add_char_entropy

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = ds.map_batches(add_char_entropy, batch_format="pyarrow") \
        .select_columns(["doc_id", "entropy_u"]).to_pandas()
    out["entropy_cb"] = out["entropy_u"] // 100
    return out[["doc_id", "entropy_cb"]].sort_values("doc_id") \
        .reset_index(drop=True).astype("int64")


def q_embedding_dedup(sf_dir: str):
    """Semantic-dedup COMPOSITION: union the embeddings with a
    deterministically perturbed copy (ids + 10⁶, planted near-dups at
    cosine ≈ 1), find candidate pairs with the OR-amplified hyperplane
    LSH (functions/similarity.embedding_near_dup), cluster them with
    graph.connected_components, keep the min-id survivor per cluster —
    the end-to-end embedding-dedup pipeline over real operators.
    Rows-only: LSH recall is probabilistic by design (recall ≥ 0.9 is
    asserted in test_functions.py on planted truth)."""
    from timberjack_ray.functions.graph import connected_components
    from timberjack_ray.functions.similarity import embedding_near_dup

    # one cheap id-only projection up front: it provides the final
    # survivor universe AND a collision-free copy-id offset (a fixed
    # offset would alias real ids once vec_id grows past it)
    ids_pd = _rp(sf_dir, "embeddings", columns=["vec_id"]).to_pandas()
    base_ids = ids_pd["vec_id"].astype("int64").tolist()
    max_id = max(base_ids) if base_ids else 0
    if max_id >= 2 ** 30:
        # embedding_near_dup packs pairs as (a << 31) | b
        raise ValueError("embedding_dedup: vec_id domain too large for the "
                         "pair-key packing contract (ids must be < 2^30)")
    offset = max_id + 1

    emb = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def with_perturbed_copy(t: pa.Table) -> pa.Table:
        """Emit each row twice: as-is, and perturbed under id + offset —
        an in-batch expansion (no union operator, no second read)."""
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        arr = t["embedding"].combine_chunks() \
            if isinstance(t["embedding"], pa.ChunkedArray) else t["embedding"]
        flat = np.asarray(arr.flatten(), dtype=np.float32)
        # deterministic tiny perturbation: sign flip pattern by element idx
        eps = np.where(np.arange(len(flat)) % 2 == 0, 1e-4, -1e-4) \
            .astype(np.float32)
        offs = arr.offsets
        copy = pa.table({"vec_id": pa.array(ids + offset),
                         "embedding": pa.ListArray.from_arrays(
                             offs, pa.array(flat + eps))})
        return pa.concat_tables(
            [pa.table({"vec_id": pa.array(ids),
                       "embedding": arr}), copy])

    both = emb.map_batches(with_perturbed_copy, batch_format="pyarrow")
    pairs = embedding_near_dup(both, threshold=0.999)
    comp = connected_components(pairs, "a", "b")
    if not isinstance(comp, pd.DataFrame):
        comp = comp.to_pandas()
    drop = set(comp.loc[comp["node"] != comp["component"], "node"])
    all_ids = sorted(set(base_ids) | {i + offset for i in base_ids})
    kept = [i for i in all_ids if i not in drop]
    return pd.DataFrame({"vec_id": pd.array(kept, dtype="int64")})


def q_event_transitions(sf_dir: str):
    """Per-user next-event transition matrix counts
    (functions/sessions.transition_counts) — Markov-chain sufficient
    statistics via one bucketed exchange + a segmented vectorized shift;
    |alphabet|² partials per bucket."""
    from timberjack_ray.functions.sessions import transition_counts

    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_type", "event_id"])
    return transition_counts(ds, "user_id", "ts", "event_type", "event_id")


def q_supplier_part_pagerank(sf_dir: str):
    """Top-20 integer-fixed-point PageRank (functions/graph.pagerank_int)
    over the supplier→part edge graph: every operation is an int64 sum or
    floor-division, so the iterative algorithm is bit-reproducible across
    the driver and distributed paths AND replayable by a SQL oracle with
    unrolled iterations — an oracle-checked iterative-graph workload."""
    from timberjack_ray.functions.graph import pagerank_int

    li = _rp(sf_dir, "lineitem", columns=["l_suppkey", "l_partkey"])

    def edges(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_suppkey", "l_partkey"]).aggregate([])
        return pa.table({
            "u": pc.cast(g["l_suppkey"], pa.int64()),
            "v": pc.add(pc.cast(g["l_partkey"], pa.int64()), 10_000_000)})

    # per-batch dedup, then a GUARDED global distinct (merge_partials_or_ds):
    # past the cardinality guard the distinct edge list stays a Dataset and
    # pagerank_int's distributed path takes over — the edge list never has
    # to fit the driver
    e = li.map_batches(edges, batch_format="pyarrow")
    from timberjack_ray.aggregates import merge_partials_or_ds

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column("one", pa.array(np.ones(t.num_rows, np.int64)))

    merged, mode = merge_partials_or_ds(
        e.map_batches(tag, batch_format="pyarrow"), ["u", "v"], ["one"])
    import ray.data as rd

    if mode == "driver":
        edge_ds = rd.from_arrow(merged.select(["u", "v"]))
    else:
        edge_ds = merged.map_batches(
            lambda t: t.select(["u", "v"]), batch_format="pyarrow")
    ranks = pagerank_int(edge_ds, n_iter=3)
    out = ranks if isinstance(ranks, pd.DataFrame) else ranks.to_pandas()
    out = out.sort_values(["rank_fp", "node"], ascending=[False, True]) \
        .head(20).reset_index(drop=True)
    out = out.assign(pos=np.arange(1, len(out) + 1))
    return out.astype({"node": "int64", "rank_fp": "int64", "pos": "int64"})


def q_event_value_ranks(sf_dir: str):
    """Per-type ordinal value ranks (functions/relational.grouped_rank_ds)
    — the rank / percent-rank feature-normalization window: one bucket
    exchange, one lexsort + segmented arange per bucket, full-row output
    streams (collected here only because the driver compare needs a
    frame)."""
    from timberjack_ray.functions.relational import grouped_rank_ds

    ds = _rp(sf_dir, "events", columns=["event_type", "value", "event_id"])
    out = grouped_rank_ds(ds, "event_type", "value", "event_id", scale=100) \
        .to_pandas()
    return out.sort_values("event_id").reset_index(drop=True).astype(
        {"event_id": "int64", "rank": "int64", "n_group": "int64"})


def q_char_budget_sample(sf_dir: str):
    """Per-source char-budget subsampling (functions/corpus.budget_sample):
    fill each source's 20 000-char quota in deterministic scrambled-hash
    order — quota-based domain mixing; the cut replays exactly as a SQL
    running-sum window."""
    from timberjack_ray.functions.corpus import budget_sample

    ds = _rp(sf_dir, "documents", columns=["source", "doc_id", "n_chars"])
    out = budget_sample(ds, "source", "n_chars", "doc_id", budget=20_000) \
        .to_pandas()
    return out.sort_values(["source", "doc_id"]).reset_index(drop=True) \
        .astype({"doc_id": "int64", "n_chars": "int64"})


def q_tpch_q3(sf_dir: str):
    """TPC-H Q3 shape (top-10 open orders by revenue for one segment):
    a THREE-table composition — broadcast semi-join (BUILDING customers,
    small side) filters orders at the scan, date predicates prune both
    fact sides, then orders ⋈ lineitem goes through the GRACE bucket join
    (large×large, one exchange each).  Revenue = Σ price_cents ×
    (100−disc_pct) on the int domain so the sum is order-independent and
    the oracle replays it exactly."""
    import pyarrow.parquet as pq

    from timberjack_ray.functions.relational import (broadcast_join,
                                                     bucket_hash_join)

    cutoff = np.datetime64("1998-06-01")
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    cust = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING")) \
        .select(["c_custkey"])

    orders = _rp(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def open_orders(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array(d < cutoff))

    orders = broadcast_join(orders.map_batches(open_orders,
                                               batch_format="pyarrow"),
                            cust, keys="o_custkey", right_keys="c_custkey")

    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_extendedprice", "l_discount",
                      "l_shipdate"])

    def shipped_late(t: pa.Table) -> pa.Table:
        from timberjack_ray.functions.util import scale_to_int

        d = t["l_shipdate"].combine_chunks().to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(d > cutoff))
        price = scale_to_int(t["l_extendedprice"], 100).to_numpy()
        disc = scale_to_int(t["l_discount"], 100).to_numpy()
        rev = price * (100 - disc)  # exact ints, 4 implied decimals
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev": pa.array(rev)})

    def bucket_top(t: pa.Table) -> pa.Table:
        # every row of an orderkey is co-located in this bucket, so the
        # grouped sum is COMPLETE here and the per-bucket top-10 is a sound
        # partial — the driver merge sees <= 10 x n_buckets rows, bounded
        # regardless of order cardinality (never the full per-order table)
        g = t.group_by(["o_orderkey", "o_orderdate"]).aggregate(
            [("rev", "sum")])
        g = g.rename_columns(["o_orderkey", "o_orderdate", "revenue_scaled"])
        return g.sort_by([("revenue_scaled", "descending"),
                          ("o_orderkey", "ascending")]).slice(0, 10)

    tops = bucket_hash_join(
        orders, li.map_batches(shipped_late, batch_format="pyarrow"),
        "o_orderkey", "l_orderkey",
        left_cols=["o_orderdate"], right_cols=["rev"], n_buckets=32,
        bucket_fn=bucket_top).to_pandas()
    out = tops.sort_values(["revenue_scaled", "o_orderkey"],
                           ascending=[False, True]).head(10)
    out = out.assign(rank=np.arange(1, len(out) + 1))
    return out[["o_orderkey", "revenue_scaled", "o_orderdate", "rank"]] \
        .reset_index(drop=True).astype(
            {"o_orderkey": "int64", "revenue_scaled": "int64",
             "rank": "int64"})


def q_tpch_q10(sf_dir: str):
    """TPC-H Q10 shape (top-20 customers by returned-item revenue in a
    quarter): lineitem(R-flag) ⋈ orders(date window) via the GRACE bucket
    join with complete per-order sums computed in-bucket; the order→
    customer rollup then rides a BROADCAST customer⋈nation dimension —
    four tables, one large×large exchange, cent-exact revenue."""
    import pyarrow.parquet as pq

    from timberjack_ray.functions.relational import bucket_hash_join

    lo = np.datetime64("1997-01-01")
    hi = np.datetime64("1997-07-01")

    orders = _rp(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def in_window(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array((d >= lo) & (d < hi))) \
            .select(["o_orderkey", "o_custkey"])

    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_extendedprice", "l_discount",
                      "l_returnflag"])

    def returned_rev(t: pa.Table) -> pa.Table:
        from timberjack_ray.functions.util import scale_to_int

        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        price = scale_to_int(t["l_extendedprice"], 100).to_numpy()
        disc = scale_to_int(t["l_discount"], 100).to_numpy()
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev": pa.array(price * (100 - disc))})

    def bucket_sums(t: pa.Table) -> pa.Table:
        # complete per-order customer revenue inside the co-located bucket
        g = t.group_by("o_custkey").aggregate([("rev", "sum")])
        return g.rename_columns(["o_custkey", "rev"])

    per_cust = bucket_hash_join(
        orders.map_batches(in_window, batch_format="pyarrow"),
        li.map_batches(returned_rev, batch_format="pyarrow"),
        "o_orderkey", "l_orderkey",
        left_cols=["o_custkey"], right_cols=["rev"], n_buckets=32,
        bucket_fn=bucket_sums)
    # per-bucket partials may repeat a customer (orders hash by ORDER key):
    # a SECOND bucket exchange keyed by customer completes the sums and
    # top-20s in-bucket, so the driver merge sees ≤ 20 × n_buckets rows at
    # any customer cardinality (never a per-customer fold)
    from timberjack_ray.functions.corpus import add_key_bucket

    def cust_bucket_top(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([("rev", "sum")])
        g = g.rename_columns(["o_custkey", "rev"])
        return g.sort_by([("rev", "descending"),
                          ("o_custkey", "ascending")]).slice(0, 20)

    tops = add_key_bucket(per_cust, "o_custkey", 32).groupby("__kb") \
        .map_groups(lambda t: cust_bucket_top(t.drop_columns(["__kb"])),
                    batch_format="pyarrow").to_pandas()
    top = tops.sort_values(["rev", "o_custkey"],
                           ascending=[False, True]).head(20)

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name", "c_nationkey"])
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    dim = cust.join(nation, keys="c_nationkey",
                    right_keys="n_nationkey").to_pandas()
    out = top.merge(dim, left_on="o_custkey", right_on="c_custkey")
    out = out.sort_values(["rev", "o_custkey"], ascending=[False, True])
    out = out.assign(rank=np.arange(1, len(out) + 1))
    return out[["o_custkey", "c_name", "n_name", "rev", "rank"]] \
        .rename(columns={"rev": "revenue_scaled"}) \
        .reset_index(drop=True).astype(
            {"o_custkey": "int64", "revenue_scaled": "int64",
             "rank": "int64"})


def q_tpch_q5(sf_dir: str):
    """TPC-H Q5 shape (regional supplier volume): SIX tables — nation ⋈
    region pick the ASIA nation keys; customer and supplier broadcast as
    key→nationkey maps (at 10^12-row scale the customer projection
    becomes a GRACE join — documented); date-windowed orders ⋈ lineitem
    runs through the GRACE bucket join with the c_nat = s_nat local-
    supplier filter and the per-nation sums applied IN-BUCKET, so the
    merge is ≤ 5 rows per bucket.  Cent-exact revenue."""
    import pyarrow.parquet as pq

    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.relational import (broadcast_join,
                                                     bucket_hash_join)

    lo = np.datetime64("1997-01-01")
    hi = np.datetime64("1998-01-01")

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    nr = nation.join(region, keys="n_regionkey", right_keys="r_regionkey")
    asia = nr.filter(pc.equal(nr["r_name"], "ASIA")) \
        .select(["n_nationkey", "n_name"])
    asia_keys = set(asia["n_nationkey"].to_pylist())
    name_of = dict(zip(asia["n_nationkey"].to_pylist(),
                       asia["n_name"].to_pylist()))

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    cust = cust.filter(pc.is_in(cust["c_nationkey"],
                                pa.array(list(asia_keys), pa.int32())))
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey"])
    supp = supp.filter(pc.is_in(supp["s_nationkey"],
                                pa.array(list(asia_keys), pa.int32())))

    orders = _rp(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def in_window(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array((d >= lo) & (d < hi))) \
            .select(["o_orderkey", "o_custkey"])

    o_asia = broadcast_join(
        orders.map_batches(in_window, batch_format="pyarrow"), cust,
        keys="o_custkey", right_keys="c_custkey") \
        .map_batches(lambda t: pa.table(
            {"o_orderkey": t["o_orderkey"],
             "c_nat": t["c_nationkey"].cast(pa.int64())}),
            batch_format="pyarrow")

    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount"])

    def li_rev(t: pa.Table) -> pa.Table:
        from timberjack_ray.functions.util import scale_to_int

        price = scale_to_int(t["l_extendedprice"], 100).to_numpy()
        disc = scale_to_int(t["l_discount"], 100).to_numpy()
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "rev": pa.array(price * (100 - disc))})

    l_asia = broadcast_join(
        li.map_batches(li_rev, batch_format="pyarrow"), supp,
        keys="l_suppkey", right_keys="s_suppkey") \
        .map_batches(lambda t: pa.table(
            {"l_orderkey": t["l_orderkey"],
             "s_nat": t["s_nationkey"].cast(pa.int64()),
             "rev": t["rev"]}), batch_format="pyarrow")

    def bucket_sums(t: pa.Table) -> pa.Table:
        # local-supplier constraint + per-nation sum while co-located
        t = t.filter(pc.equal(t["c_nat"], t["s_nat"]))
        g = t.group_by("c_nat").aggregate([("rev", "sum")])
        return g.rename_columns(["c_nat", "rev"])

    per_nat = bucket_hash_join(
        o_asia, l_asia, "o_orderkey", "l_orderkey",
        left_cols=["c_nat"], right_cols=["s_nat", "rev"], n_buckets=32,
        bucket_fn=bucket_sums)
    merged = merge_partials(per_nat, ["c_nat"], "rev").to_pandas()
    merged["n_name"] = merged["c_nat"].map(name_of)
    out = merged.sort_values(["rev", "n_name"], ascending=[False, True])
    return out[["n_name", "rev"]].rename(columns={"rev": "revenue_scaled"}) \
        .reset_index(drop=True).astype({"revenue_scaled": "int64"})


def q_lineitem_corr_stats(sf_dir: str):
    """Per-returnflag co-moment sums for quantity × price
    (functions/relational.grouped_comoment_sums): (n, Σx, Σy, Σxy) on the
    scaled-int domain — the sufficient statistics for covariance/Pearson,
    exact and order-independent, merge volume = #groups rows."""
    from timberjack_ray.functions.relational import grouped_comoment_sums

    ds = _rp(sf_dir, "lineitem",
             columns=["l_returnflag", "l_quantity", "l_extendedprice"])
    out = grouped_comoment_sums(ds, "l_returnflag", "l_quantity",
                                "l_extendedprice", x_scale=1, y_scale=100)
    return out.astype({"n": "int64", "sum_x": "int64", "sum_y": "int64",
                       "sum_xy": "int64"})


def q_ann_topk_q8(sf_dir: str):
    """int8-quantized brute-force top-10 vs the vec_id=0 embedding
    (functions/similarity.brute_force_topk_q8): quantize once (4× smaller
    shuffle/storage), integer dot products (exact, order-independent), so
    the whole ranking replays bit-for-bit in SQL."""
    import pyarrow.parquet as pq

    from timberjack_ray.functions.similarity import brute_force_topk_q8

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    q0 = np.asarray(
        emb.filter(pc.equal(emb["vec_id"], 0))["embedding"][0].as_py(),
        dtype=np.float64)
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = brute_force_topk_q8(ds, q0[None, :], k=10)
    return out[["vec_id", "score_q", "rank"]].astype(
        {"vec_id": "int64", "score_q": "int64", "rank": "int64"})


def q_ann_topk_filtered(sf_dir: str):
    """Metadata-FILTERED vector search (the vector-DB "filtered top-k"
    pattern): top-10 by quantized dot product among label=3 vectors only.
    Pure composition — a vectorized per-batch predicate prunes BEFORE
    quantization/scoring, so the filter rides the same single streaming
    pass (pre-filtering beats post-filtering top-k, which can starve the
    result set when the label is rare)."""
    import pyarrow.parquet as pq

    from timberjack_ray.functions.similarity import brute_force_topk_q8

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    q0 = np.asarray(
        emb.filter(pc.equal(emb["vec_id"], 0))["embedding"][0].as_py(),
        dtype=np.float64)
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"]) \
        .map_batches(lambda t: t.filter(pc.equal(t["label"], 3))
                     .select(["vec_id", "embedding"]),
                     batch_format="pyarrow")
    out = brute_force_topk_q8(ds, q0[None, :], k=10)
    return out[["vec_id", "score_q", "rank"]].astype(
        {"vec_id": "int64", "score_q": "int64", "rank": "int64"})


def q_embedding_knn_join(sf_dir: str):
    """Approximate k-NN self-join (similarity.knn_join): every vector's
    top-3 in-cell neighbors, IVF cluster exchange + exact int-quantized
    dot ranking inside each cell (bit-stable tie rule: score desc, id
    asc).  Rows-only: cross-cell misses are by design; planted-copy
    rank-1 recovery and in-cell exactness are pinned in tests."""
    from timberjack_ray.functions.similarity import knn_join

    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = knn_join(ds, k=3, n_centroids=8)
    res = _collect_result(out).to_pandas()  # k rows per vector (bounded)
    return res.sort_values(["vec_id", "rank"]).reset_index(drop=True) \
        .astype({c: "int64" for c in res.columns})


def q_logreg_label3(sf_dir: str):
    """Distributed iterative ML (functions/ml.logreg_train): one-vs-rest
    logistic classifier for label 3 over the embedding column —
    parameter-server-pattern batch GD where each round is ONE streaming
    pass emitting (dim+1)-int gradient partials per batch (per-ROW
    quantization makes the fold bit-identical under any partitioning).
    Rows-only: the sigmoid is float, not SQL-replayable; determinism and
    reference parity are pinned in tests/test_ml.py."""
    from timberjack_ray.functions.ml import logreg_train

    ds = _rp(sf_dir, "embeddings", columns=["embedding", "label"])
    return logreg_train(ds, "embedding", "label", pos_label=3, rounds=8)


def q_urgent_revenue_bloom(sf_dir: str):
    """Selective GRACE join with Bloom semi-join pushdown
    (bucket_hash_join bloom_prefilter): lineitem ⋈ URGENT-priority
    orders (~20% of orders — too large to broadcast at scale, selective
    enough that most lineitem rows can't match).  A fixed 512 KB Bloom
    over the right keys broadcasts first and prunes non-matching
    lineitem rows BEFORE the exchange (false positives only waste
    exchange rows; the per-bucket C join removes them), cutting shuffle
    volume ~5×.  Revenue cents by order year."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.relational import bucket_hash_join
    from timberjack_ray.functions.util import scale_to_int

    def o_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
        y = t["o_orderdate"].combine_chunks() \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_year": pa.array(y)})

    def l_prep(t: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "cents": scale_to_int(t["l_extendedprice"], 100)})

    def agg(t: pa.Table) -> pa.Table:
        g = t.group_by("o_year").aggregate(
            [("cents", "sum"), ([], "count_all")])
        return g.rename_columns(["o_year", "rev_c", "n"])

    j = bucket_hash_join(
        _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])
        .map_batches(l_prep, batch_format="pyarrow"),
        _rp(sf_dir, "orders",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
        .map_batches(o_prep, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey", ["cents"], ["o_year"],
        n_buckets=32, bloom_prefilter=True, bucket_fn=agg)
    out = merge_partials(j, ["o_year"], ["rev_c", "n"]).to_pandas()
    return out.sort_values("o_year").reset_index(drop=True) \
        .astype({"o_year": "int64", "rev_c": "int64", "n": "int64"})


def q_customer_monthly_streaks(sf_dir: str):
    """Gaps-and-islands at MONTH granularity — longest run of
    consecutive 30-day periods with ≥1 order per customer
    (longest_streak_histogram reused with a coarser unit): the
    engagement-consistency metric behind subscription-style retention."""
    from timberjack_ray.functions.sessions import longest_streak_histogram

    ds = _rp(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    out = longest_streak_histogram(ds, "o_custkey", "o_orderdate",
                                   day_us=30 * 86_400_000_000)
    return out.rename(columns={"streak_days": "streak_months",
                               "n_keys": "n_customers"})


def q_basket_size_histogram(sf_dir: str):
    """Basket-size distribution: distinct parts per order → size
    histogram (bounded by the largest basket) — the order-composition
    diagnostic feeding the co-purchase miner."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.corpus import add_key_bucket

    def pre(t: pa.Table) -> pa.Table:
        return (t.select(["l_orderkey", "l_partkey"])
                .group_by(["l_orderkey", "l_partkey"]).aggregate([]))

    def per_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n_parts": pa.array([], pa.int64()),
                             "n_orders": pa.array([], pa.int64())})
        o = t["l_orderkey"].to_numpy(zero_copy_only=False)
        p = t["l_partkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((p, o))
        os_, ps = o[order], p[order]
        keep = np.r_[True, (os_[1:] != os_[:-1]) | (ps[1:] != ps[:-1])]
        os_ = os_[keep]
        _, sizes = np.unique(os_, return_counts=True)
        v, n = np.unique(sizes, return_counts=True)
        return pa.table({"n_parts": pa.array(v.astype(np.int64)),
                         "n_orders": pa.array(n.astype(np.int64))})

    ds = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"]) \
        .map_batches(pre, batch_format="pyarrow")
    bucketed = add_key_bucket(ds, "l_orderkey", 64)
    p = bucketed.groupby("__kb").map_groups(
        lambda t: per_bucket(t.drop_columns(["__kb"])),
        batch_format="pyarrow")
    out = merge_partials(p, ["n_parts"], "n_orders").to_pandas()
    return out.sort_values("n_parts").reset_index(drop=True) \
        .astype({"n_parts": "int64", "n_orders": "int64"})


def q_user_event_runs(sf_dir: str):
    """Run-length-encoding census (round 4): per event type, the number
    of maximal same-type RUNS within a user's (ts, event_id)-ordered
    stream plus total events — gaps-and-islands compression stats,
    SQL-replayable via LAG run starts (functions/sessions
    .run_length_stats: one key-bucket exchange, |alphabet| partials)."""
    from timberjack_ray.functions.sessions import run_length_stats

    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_type", "event_id"])
    return run_length_stats(ds, "user_id", "ts", "event_type", "event_id")


def q_value_bucket_transitions(sf_dir: str):
    """Value-quartile Markov transitions (round 4): bucket each event's
    cents into global exact quartiles (type-1), then count per-user
    next-event transitions between buckets — the discretized-state
    Markov sufficient statistics.  Two passes: exact_quantiles (tiny
    count-per-value merge) then the sessionize exchange via
    transition_counts on the derived bucket column."""
    from timberjack_ray.functions.sessions import (exact_quantiles,
                                                   transition_counts)

    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "value"])
    qs = exact_quantiles(ds, "value", [0.25, 0.5, 0.75], scale=100)
    b1, b2, b3 = (int(v) for v in qs["value_scaled"])

    def add_bucket(t: pa.Table) -> pa.Table:
        c = _scale100(t["value"].to_numpy(zero_copy_only=False))
        vb = np.where(c <= b1, 0, np.where(c <= b2, 1,
                      np.where(c <= b3, 2, 3))).astype(np.int64)
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "event_id": t["event_id"],
                         "vb": pa.array(vb.astype(str))})

    out = transition_counts(ds.map_batches(add_bucket,
                                           batch_format="pyarrow"),
                            "user_id", "ts", "vb", "event_id")
    out = out.rename(columns={"cur_type": "cur_vb", "next_type": "next_vb"})
    return out.astype({"cur_vb": "int64", "next_vb": "int64", "n": "int64"})


def q_source_charclass_counts(sf_dir: str):
    """Per-source exact character-class census (round 4): alpha / digit /
    space / other char counts over the corpus — the byte-level quality
    profile at exact-integer fidelity.  One pass, Arrow regex count
    kernels per batch, 4-int partials per source."""
    from timberjack_ray.aggregates import merge_partials

    ds = _rp(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        total = pc.utf8_length(t["text"]).cast(pa.int64())
        alpha = pc.count_substring_regex(t["text"], "[A-Za-z]") \
            .cast(pa.int64())
        digit = pc.count_substring_regex(t["text"], "[0-9]").cast(pa.int64())
        space = pc.count_substring(t["text"], " ").cast(pa.int64())
        other = pc.subtract(pc.subtract(pc.subtract(total, alpha), digit),
                            space)
        g = pa.table({"source": t["source"], "n_alpha": alpha,
                      "n_digit": digit, "n_space": space,
                      "n_other": other}) \
            .group_by("source").aggregate(
                [("n_alpha", "sum"), ("n_digit", "sum"),
                 ("n_space", "sum"), ("n_other", "sum")])
        return g.rename_columns(["source", "n_alpha", "n_digit",
                                 "n_space", "n_other"])

    out = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                         ["source"],
                         ["n_alpha", "n_digit", "n_space", "n_other"]) \
        .to_pandas()
    return out.sort_values("source").reset_index(drop=True) \
        .astype({c: "int64" for c in ["n_alpha", "n_digit", "n_space",
                                      "n_other"]})


def q_mode_value_per_type(sf_dir: str):
    """Exact grouped MODE with deterministic tie-break (round 4): per
    event type, the most frequent value-cent (ties → smallest cent) and
    its count.  Guarded (type, cent) count fold; past the guard the
    merged Dataset resolves per-type argmax distributedly via
    grouped_topk — same answer either way."""
    from timberjack_ray.aggregates import merge_partials_or_ds

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        c = _scale100(t["value"].to_numpy(zero_copy_only=False))
        g = pa.table({"event_type": t["event_type"], "c": pa.array(c)}) \
            .group_by(["event_type", "c"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "c", "n"])

    merged, mode = merge_partials_or_ds(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "c"], ["n"])
    if mode != "driver":  # pragma: no cover - past the cent-domain guard
        from timberjack_ray.functions.relational import grouped_topk
        out = grouped_topk(merged, "event_type", "n", 1, tie_col="c")
    else:
        df = merged.to_pandas()
        df = df.sort_values(["event_type", "n", "c"],
                            ascending=[True, False, True])
        out = df.groupby("event_type", as_index=False).head(1)
    out = out.rename(columns={"c": "mode_cents"}) \
        .sort_values("event_type").reset_index(drop=True)
    return out[["event_type", "mode_cents", "n"]] \
        .astype({"mode_cents": "int64", "n": "int64"})


def q_returnflag_priority_contingency(sf_dir: str):
    """Return-flag × order-priority contingency table (round 4): the χ²
    sufficient statistics as exact integer counts.  GRACE bucketed join
    (lineitem ⋈ orders on orderkey — both large), per-batch crosstab
    partials, |flags × priorities| merge."""
    from timberjack_ray.aggregates import counts_by
    from timberjack_ray.functions.relational import bucket_hash_join

    li = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])
    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    joined = bucket_hash_join(li, orders, "l_orderkey", "o_orderkey",
                              left_cols=["l_returnflag"],
                              right_cols=["o_orderpriority"], n_buckets=32)
    out = counts_by(joined, ["l_returnflag", "o_orderpriority"])
    return out.sort_values(["l_returnflag", "o_orderpriority"]) \
        .reset_index(drop=True).astype({"n": "int64"})


def q_event_heatmap(sf_dir: str):
    """Calendar heatmap counts — the (day-of-week × hour-of-day) crosstab
    every ops dashboard draws: 168-cell bounded partials from one pass
    (dow from the epoch-day mod 7, hour from epoch-us — pure int
    calendar math both engines share)."""
    from timberjack_ray.aggregates import merge_partials

    def bucket(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        dow = (day + 4) % 7  # epoch day 0 = Thursday = 4
        hod = (us // 3_600_000_000) % 24
        g = pa.table({"dow": pa.array(dow), "hour": pa.array(hod)}) \
            .group_by(["dow", "hour"]).aggregate([([], "count_all")])
        return g.rename_columns(["dow", "hour", "n"])

    ds = _rp(sf_dir, "events", columns=["ts"])
    out = merge_partials(ds.map_batches(bucket, batch_format="pyarrow"),
                         ["dow", "hour"], "n").to_pandas()
    return out.sort_values(["dow", "hour"]).reset_index(drop=True) \
        .astype({"dow": "int64", "hour": "int64", "n": "int64"})


def q_value_log2_histogram(sf_dir: str):
    """Exponential (log2-binned) value histogram — the latency-histogram
    convention for long-tailed domains: bin = floor(log2(cents)), exact
    via the float64 frexp exponent (ints < 2^53 are represented exactly,
    so the exponent is never off-by-one); the oracle replays it with
    printf('%b') length — bit math, no float log on either side."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.util import scale_to_int

    def bucket(t: pa.Table) -> pa.Table:
        v = scale_to_int(t["value"], 100).to_numpy()
        v = v[v > 0]
        b = np.frexp(v.astype(np.float64))[1] - 1
        g = pa.table({"bin": pa.array(b.astype(np.int64))}) \
            .group_by("bin").aggregate([([], "count_all")])
        return g.rename_columns(["bin", "n"])

    ds = _rp(sf_dir, "events", columns=["value"])
    out = merge_partials(ds.map_batches(bucket, batch_format="pyarrow"),
                         ["bin"], "n").to_pandas()
    return out.sort_values("bin").reset_index(drop=True) \
        .astype({"bin": "int64", "n": "int64"})


def q_source_compress_ratio(sf_dir: str):
    """Per-source compressibility (text.compress_ratio_by_group): exact
    (n_docs, raw_bytes, zlib_bytes) — the boilerplate/redundancy quality
    proxy; compression is PER DOCUMENT so the sums are partition- and
    batch-boundary-independent.  Rows-only (no SQL zlib); exact numbers
    pinned by an independent recompute in tests/test_functions.py."""
    from timberjack_ray.functions.text import compress_ratio_by_group

    ds = _rp(sf_dir, "documents", columns=["source", "text"])
    return compress_ratio_by_group(ds)


def q_logreg_calibration(sf_dir: str):
    """Model calibration table (functions/ml.score_calibration): the
    trained label-3 classifier's reliability-diagram input — equi-depth
    score deciles over the quantized-logit histogram × exact (n, n_pos).
    A boundary bin stays whole in its earlier decile (binned equi-depth
    can't split a bin; deterministic rule).  Rows-only (the model isn't
    SQL-expressible); invariants pinned in tests/test_ml.py."""
    from timberjack_ray.functions.ml import logreg_train, score_calibration

    ds = _rp(sf_dir, "embeddings", columns=["embedding", "label"])
    trained = logreg_train(ds, "embedding", "label", pos_label=3, rounds=8)
    w = trained[trained["component"] >= 0].sort_values("component")["w_q"] \
        .to_numpy(np.int64).astype(np.float64) / 1e6
    return score_calibration(ds, "embedding", "label", 3, w)


def q_zorder_layout(sf_dir: str):
    """Z-order clustering layout (relational.zorder_layout_stats) over
    events (user_id × activity day): per-curve-range bounding boxes in
    BOTH dimensions — the multi-dim data-skipping plan a single-column
    sort can't give.  Three streaming passes (minima, morton histogram →
    equi-depth boundaries, per-range stats), no sort; the oracle replays
    the 16-bit interleave as a generated SQL bit expression."""
    from timberjack_ray.functions.relational import zorder_layout_stats

    ds = _rp(sf_dir, "events", columns=["user_id", "ts"])

    def proj(t: pa.Table) -> pa.Table:
        d = pc.divide(pc.cast(t["ts"], pa.int64()),
                      pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({"x": pc.cast(t["user_id"], pa.int64()), "y": d})

    return zorder_layout_stats(ds.map_batches(proj, batch_format="pyarrow"),
                               "x", "y", n_ranges=16)


_ZORDER_TERMS = " + ".join(
    f"(((x - x0) >> {i}) & 1) * {1 << (2 * i)} + "
    f"(((y - y0) >> {i}) & 1) * {1 << (2 * i + 1)}"
    for i in range(16))


def q_logreg_auc(sf_dir: str):
    """Model-evaluation pass (functions/ml.score_auc_exact): exact
    ROC-AUC of the trained label-3 classifier as integer Mann-Whitney
    rank statistics over a quantized-logit histogram — histogram volume
    bounded by the logit range, independent of corpus size.  Rows-only
    (the model isn't SQL-expressible); the statistic is pinned against a
    pairwise-comparison reference in tests/test_ml.py."""
    from timberjack_ray.functions.ml import logreg_train, score_auc_exact

    ds = _rp(sf_dir, "embeddings", columns=["embedding", "label"])
    trained = logreg_train(ds, "embedding", "label", pos_label=3, rounds=8)
    w = trained[trained["component"] >= 0].sort_values("component")["w_q"] \
        .to_numpy(np.int64).astype(np.float64) / 1e6
    return score_auc_exact(ds, "embedding", "label", 3, w)


def q_embedding_dim_stats(sf_dir: str):
    """Per-dimension embedding stats (similarity.embedding_dim_stats):
    exact scaled-int (min, max, sum, n) per coordinate — the
    normalization/clipping planning pass before quantization or
    whitening.  Each batch collapses to dim rows; merge volume is
    dim-bounded, independent of corpus size."""
    from timberjack_ray.functions.similarity import embedding_dim_stats

    ds = _rp(sf_dir, "embeddings", columns=["embedding"])
    return embedding_dim_stats(ds, "embedding", scale=1000)


def q_stream_windowed_counts(sf_dir: str):
    """Watermark-based event-time tumbling windows over an OUT-OF-ORDER
    stream, DISTRIBUTED (functions/window.windowed_counts_sharded):
    hourly windows, 30-min allowed lateness, 8 hash shards.

    Standard per-shard watermark model: events are sharded by
    ``event_id % 8``; within a shard, arrival order is a deterministic
    hash jitter of +/-45 min around event time, one EventTimeWindower
    instance runs per shard inside a ``groupby(shard).map_groups`` worker
    task (per-shard prefix-max watermark; an event whose window that
    shard's watermark has finalized is dropped), and only (window, n)
    partials leave the workers.  The full table never touches the driver
    (VERDICT r4 #1 replaced the single-instance ``pa.concat_tables``
    driver feed with this exchange).  The per-shard accept/drop rule
    replays exactly in SQL — ``MAX(ts) OVER (PARTITION BY event_id % 8
    ORDER BY ak, event_id)`` — so this stays oracle-checked, not
    rows-only.  Reference stdin tail: src/main.rs stream loop; the
    single-process form remains as stream.analyze_stream."""
    from timberjack_ray.functions.window import windowed_counts_sharded

    ds = _rp(sf_dir, "events", columns=["event_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ts = t["ts"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype("int64")
        # modular arithmetic BEFORE the multiply: (id*K) mod 5400 ==
        # ((id mod 5400)*(K mod 5400)) mod 5400 with no uint64 wrap, so
        # this matches the oracle's HUGEINT product for any event_id (a
        # straight ids*K would wrap mod 2^64 past id ~ 7e9 and, since
        # 5400 does not divide 2^64, diverge from SQL)
        jitter = (((ids % np.uint64(5400))
                   * (np.uint64(2654435761) % np.uint64(5400)))
                  % np.uint64(5400)).astype(np.int64)
        ak = ts + jitter * 1_000_000 - 2_700_000_000
        return pa.table({
            "shard": (ids % np.uint64(8)).astype(np.int64),
            "ak": ak,
            "event_id": ids.astype(np.int64),
            "ts_us": ts,
        })

    slim = ds.map_batches(prep, batch_format="pyarrow")
    return windowed_counts_sharded(
        slim, shard_col="shard", arrival_col="ak", id_col="event_id",
        ts_us_col="ts_us", width_s=3600, lateness_s=1800)


def q_tpch_q14(sf_dir: str):
    """TPC-H Q14 shape (promo revenue): lineitem date window × part-type
    membership.  The promo-partkey set is the only broadcast side (tiny by
    definition — one type's parts); revenue sums stay on the exact cents-int
    domain and only two int64 partials per batch reach the driver.  The
    percentage is derivable from the two exact integers — emitting it as a
    float would put an unorderable 2^53-overflowable division on the hash
    path, so it is left to the consumer."""
    import pyarrow.parquet as pq

    from timberjack_ray.functions.util import scale_to_int

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_type"])
    promo = part.filter(pc.equal(part["p_type"], "PROMO"))["p_partkey"]
    promo = promo.combine_chunks()
    lo = np.datetime64("1997-01-01")
    hi = np.datetime64("1997-04-01")

    def partial(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].combine_chunks().to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((d >= lo) & (d < hi)))
        if t.num_rows == 0:
            return pa.table({"promo_rev_scaled": pa.array([], pa.int64()),
                             "total_rev_scaled": pa.array([], pa.int64())})
        price = scale_to_int(t["l_extendedprice"], 100).to_numpy()
        disc = scale_to_int(t["l_discount"], 100).to_numpy()
        rev = price * (100 - disc)
        is_promo = pc.is_in(t["l_partkey"], value_set=promo) \
            .to_numpy(zero_copy_only=False)
        return pa.table({"promo_rev_scaled": pa.array([int(rev[is_promo].sum())]),
                         "total_rev_scaled": pa.array([int(rev.sum())])})

    li = _rp(sf_dir, "lineitem",
             columns=["l_partkey", "l_extendedprice", "l_discount",
                      "l_shipdate"])
    p = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"promo_rev_scaled": [int(p["promo_rev_scaled"].sum())],
                         "total_rev_scaled": [int(p["total_rev_scaled"].sum())]})


def q_tpch_q18(sf_dir: str):
    """TPC-H Q18 shape (large-volume customers): HAVING SUM(qty) > T over
    the high-cardinality orderkey runs as a distributed Ray groupby (per-
    batch partial group_by shrinks first; one hash exchange of (orderkey,
    qty) partials — NEVER a driver fold at order cardinality); the
    survivor set is tiny by construction (the extreme tail) so it
    broadcast-filters orders, and customer names join driver-side on the
    ≤100-row result.  Sort keys are exact ints (cents, orderkey)."""
    import pyarrow.parquet as pq

    def partial(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].cast(pa.int64())
        g = pa.table({"l_orderkey": t["l_orderkey"], "qty": q}) \
            .group_by("l_orderkey").aggregate([("qty", "sum")])
        return g.rename_columns(["l_orderkey", "qty"])

    from timberjack_ray.aggregates import merge_partials_or_ds

    li = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    folded, mode = merge_partials_or_ds(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_orderkey"], ["qty"])
    if mode == "distributed":  # pragma: no cover - past the fold guard
        hot_t = pa.Table.from_pandas(folded.map_batches(
            lambda t: t.filter(pc.greater(t["qty"], 250)),
            batch_format="pyarrow").to_pandas())
    else:
        hot_t = folded.filter(pc.greater(folded["qty"], 250))
    hot_t = hot_t.rename_columns(["l_orderkey", "sum_qty"])
    keys = hot_t["l_orderkey"].combine_chunks()
    qty_of = dict(zip(hot_t["l_orderkey"].to_pylist(),
                      hot_t["sum_qty"].to_pylist()))

    orders = _rp(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderdate",
                          "o_totalprice"])
    picked = orders.map_batches(
        lambda t: t.filter(pc.is_in(t["o_orderkey"], value_set=keys)),
        batch_format="pyarrow").to_pandas()

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name"]).to_pandas()
    out = picked.merge(cust, left_on="o_custkey", right_on="c_custkey")
    out["o_date"] = out["o_orderdate"].dt.strftime("%Y-%m-%d")
    out["total_scaled"] = _scale100(out["o_totalprice"].to_numpy())
    out["sum_qty"] = out["o_orderkey"].map(qty_of).astype(np.int64)
    out = out.sort_values(["total_scaled", "o_orderkey"],
                          ascending=[False, True]).head(100)
    return out[["c_name", "o_custkey", "o_orderkey", "o_date",
                "total_scaled", "sum_qty"]].reset_index(drop=True)


def q_tpch_q19(sf_dir: str):
    """TPC-H Q19 shape (disjunctive brand/size/quantity predicates):
    broadcast hash join lineitem ⋈ part (dimension side), then ONE
    vectorized three-arm OR mask per batch — the predicate never leaves
    the map side, only (rev_sum, n) int partials reach the driver."""
    import pyarrow.parquet as pq

    from timberjack_ray.functions.relational import broadcast_join
    from timberjack_ray.functions.util import scale_to_int

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_brand", "p_size"])
    li = _rp(sf_dir, "lineitem",
             columns=["l_partkey", "l_quantity", "l_extendedprice",
                      "l_discount"])
    joined = broadcast_join(li, part, keys="l_partkey",
                            right_keys="p_partkey")

    arms = (("Brand#12", 1, 15, 1, 11),
            ("Brand#23", 1, 20, 10, 20),
            ("Brand#3", 1, 25, 20, 30))

    def partial(t: pa.Table) -> pa.Table:
        brand = t["p_brand"].to_numpy(zero_copy_only=False)
        size = t["p_size"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        mask = np.zeros(t.num_rows, dtype=bool)
        for b, s_lo, s_hi, q_lo, q_hi in arms:
            mask |= ((brand == b) & (size >= s_lo) & (size <= s_hi)
                     & (qty >= q_lo) & (qty <= q_hi))
        t = t.filter(pa.array(mask))
        if t.num_rows == 0:
            return pa.table({"rev_scaled": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        price = scale_to_int(t["l_extendedprice"], 100).to_numpy()
        disc = scale_to_int(t["l_discount"], 100).to_numpy()
        return pa.table({"rev_scaled": pa.array([int((price * (100 - disc)).sum())]),
                         "n": pa.array([t.num_rows])})

    p = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"rev_scaled": [int(p["rev_scaled"].sum())],
                         "n": [int(p["n"].sum())]})


def q_value_quantiles_cont(sf_dir: str):
    """Linear-interpolated (quantile_cont) quartiles on the cents domain —
    bit-exact vs SQL for dyadic q (see exact_quantiles_cont)."""
    from timberjack_ray.functions.sessions import exact_quantiles_cont

    ds = _rp(sf_dir, "events", columns=["value"])
    return exact_quantiles_cont(ds, "value", [0.25, 0.5, 0.75], scale=100)


def q_chunk_dedup_docs(sf_dir: str):
    """C4-style corpus-wide chunk dedup keep-first over 10-word chunks:
    only (hash, packed-id) pairs shuffle; survivors come back as
    (doc_id, chunk_idx)."""
    from timberjack_ray.functions.corpus import chunk_dedup, unpack_chunk_ids

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    surv = chunk_dedup(ds, chunk_words=10)
    out = surv.map_batches(unpack_chunk_ids, batch_format="pyarrow") \
        .to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True) \
        .astype({"doc_id": "int64", "chunk_idx": "int64"})


def q_perplexity_scores(sf_dir: str):
    """CCNet-style perplexity filter scoring: train an in-corpus add-one
    bigram LM (guarded folds), broadcast it once, score every doc's mean
    bits-per-bigram in one streaming actor-pool pass.  ORACLE-CHECKED
    since round 5 (was rows-only): emits ``bits_centi = floor(bits·100)``
    — every term is log2(c(a)+V) − log2(c(ab)+1) with both counts exact
    ints in BOTH engines, so the only divergence is per-term log2 ULPs
    and SUM order (~1e-14 absolute on a ~10-bit mean), which the centi
    grid absorbs (~1e-12/doc residual).  Full float numbers stay pinned
    vs an independent reference in tests/test_text_lm.py."""
    from timberjack_ray.functions.text import bigram_lm_scores

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = bigram_lm_scores(ds).to_pandas()
    out["bits_centi"] = np.floor(
        out["bits"].to_numpy() * 100.0).astype(np.int64)
    return out[["doc_id", "n_bigrams", "bits_centi"]] \
        .sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "n_bigrams": "int64"})


def q_contamination_stats(sf_dir: str):
    """Per-doc contamination fraction stats vs the held-out benchmark
    slice (doc_id % 97 == 0): (doc_id, n_grams, n_hit) over distinct
    word-3-grams — the graded decontamination variant (threshold
    n_hit/n_grams downstream).  Bench gram set broadcast once; one
    streaming pass, no shuffle; both outputs ints so the gate hash is
    exact."""
    from timberjack_ray.functions.dedup import contamination_stats

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def side(keep_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            m = (t["doc_id"].to_numpy(zero_copy_only=False) % 97) == 0
            return t.filter(pa.array(m if keep_bench else ~m))
        return ds.map_batches(f, batch_format="pyarrow")

    out = contamination_stats(side(False), side(True), col="text",
                              id_col="doc_id", k=3).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "n_grams": "int64", "n_hit": "int64"})


def q_tpch_q6(sf_dir: str):
    """TPC-H Q6 shape (forecast revenue): pure filter + scalar sum, all
    predicates vectorized at the scan — revenue = Σ price·discount on the
    exact cents×cents integer domain, two int partials per batch."""
    from timberjack_ray.functions.util import scale_to_int

    lo = np.datetime64("1997-01-01")
    hi = np.datetime64("1998-01-01")

    def partial(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].combine_chunks().to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        disc = scale_to_int(t["l_discount"], 100).to_numpy()
        m = ((d >= lo) & (d < hi) & (disc >= 5) & (disc <= 7) & (qty < 24))
        price = scale_to_int(t["l_extendedprice"], 100).to_numpy()[m]
        return pa.table({"rev_scaled": pa.array([int((price * disc[m]).sum())]),
                         "n": pa.array([int(m.sum())])})

    li = _rp(sf_dir, "lineitem",
             columns=["l_shipdate", "l_quantity", "l_extendedprice",
                      "l_discount"])
    p = li.map_batches(partial, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"rev_scaled": [int(p["rev_scaled"].sum())],
                         "n": [int(p["n"].sum())]})


def q_tpch_q13(sf_dir: str):
    """TPC-H Q13 shape (customer order-count distribution): per-customer
    order counts via the GUARDED driver fold (distributed groupby past
    the customer-cardinality guard); the count HISTOGRAM (bounded by max
    orders/customer) is all that survives, plus the zero-order bucket
    derived from the customer total."""
    import pyarrow.parquet as pq

    from timberjack_ray.aggregates import (distinct_values_guarded,
                                           merge_partials)

    orders = _rp(sf_dir, "orders", columns=["o_custkey"])
    per_cust, mode = distinct_values_guarded(orders, "o_custkey")

    def hist(t: pa.Table) -> pa.Table:
        g = t.group_by("n").aggregate([([], "count_all")])
        return g.rename_columns(["c_count", "custdist"])

    if mode == "distributed":  # pragma: no cover - past the fold guard
        h = merge_partials(
            per_cust.map_batches(hist, batch_format="pyarrow"),
            ["c_count"], "custdist").to_pandas()
    else:
        h = hist(per_cust).to_pandas()
    total = pq.ParquetFile(
        os.path.join(sf_dir, "customer.parquet")).metadata.num_rows
    zero = total - int(h["custdist"].sum())
    if zero > 0:
        h = pd.concat([h, pd.DataFrame({"c_count": [0],
                                        "custdist": [zero]})])
    return h.sort_values(["custdist", "c_count"], ascending=[False, False]) \
        .reset_index(drop=True).astype({"c_count": "int64",
                                        "custdist": "int64"})


def q_tpch_q17(sf_dir: str):
    """TPC-H Q17 shape (small-quantity-order revenue): the correlated
    per-part AVG subquery becomes pass 1 per-part (count, sum_qty)
    partials (part-cardinality merge, broadcast once); pass 2 filters with
    the INTEGER inequality 5·qty·cnt < sum_qty (exactly qty < 0.2·avg —
    no float threshold on the gate path) and sums price cents."""
    import ray

    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.util import scale_to_int

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]

    def stats_partial(t: pa.Table) -> pa.Table:
        q = t["l_quantity"].cast(pa.int64())
        g = pa.table({"p": t["l_partkey"], "q": q}).group_by("p") \
            .aggregate([("q", "sum"), ("q", "count")])
        return g.rename_columns(["p", "sum_qty", "cnt"])

    li = _rp(sf_dir, "lineitem", columns=li_cols)
    stats = merge_partials_2(li.map_batches(stats_partial,
                                            batch_format="pyarrow"))
    pk = stats["p"].to_numpy()
    order = np.argsort(pk)
    pk = pk[order]
    sq = stats["sum_qty"].to_numpy()[order]
    ct = stats["cnt"].to_numpy()[order]
    ref = ray.put((pk, sq, ct))

    def pass2(t: pa.Table) -> pa.Table:
        kk, ss, cc = _fetch_ref(ref)
        p = t["l_partkey"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(kk, p)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = 5 * qty * cc[idx] < ss[idx]
        price = scale_to_int(t["l_extendedprice"], 100).to_numpy()[m]
        return pa.table({"rev_scaled": pa.array([int(price.sum())]),
                         "n": pa.array([int(m.sum())])})

    p = _rp(sf_dir, "lineitem", columns=li_cols) \
        .map_batches(pass2, batch_format="pyarrow").to_pandas()
    return pd.DataFrame({"rev_scaled": [int(p["rev_scaled"].sum())],
                         "n": [int(p["n"].sum())]})


def merge_partials_2(pds) -> pd.DataFrame:
    """Driver merge of (p, sum_qty, cnt) partial tables (part-cardinality
    volume; at open key domains use groupby().aggregate instead)."""
    t = _collect_result(pds)  # part-cardinality partials (bounded)
    g = t.group_by("p").aggregate([("sum_qty", "sum"), ("cnt", "sum")])
    return g.rename_columns(["p", "sum_qty", "cnt"]).to_pandas()


# canonical per-worker broadcast cache (r03 review: was a second copy here)
from timberjack_ray.functions.util import fetch_broadcast as _fetch_ref  # noqa: E402


def q_tpch_q7(sf_dir: str):
    """TPC-H Q7 shape (volume shipping between two nations): supplier and
    customer nation maps broadcast (filtered to the two nations — tiny);
    date-windowed lineitem carries (supp_nation, rev, year), orders carry
    cust_nation; the GRACE bucket join applies the cross-nation filter and
    the per-(supp, cust, year) sums IN-BUCKET, so ≤ 2·years rows leave
    each bucket.  Cents-exact revenue."""
    import pyarrow.parquet as pq

    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.relational import bucket_hash_join
    from timberjack_ray.functions.util import scale_to_int

    nat_a, nat_b = "NATION_3", "NATION_7"
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    nk = dict(zip(nation["n_name"].to_pylist(),
                  nation["n_nationkey"].to_pylist()))
    keys2 = pa.array([nk[nat_a], nk[nat_b]], pa.int32())
    name_of = {nk[nat_a]: nat_a, nk[nat_b]: nat_b}

    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey"])
    supp = supp.filter(pc.is_in(supp["s_nationkey"], value_set=keys2))
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    cust = cust.filter(pc.is_in(cust["c_nationkey"], value_set=keys2))

    lo = np.datetime64("1997-01-01")
    hi = np.datetime64("1999-01-01")

    from timberjack_ray.functions.relational import broadcast_join

    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount", "l_shipdate"])

    def li_prep(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].combine_chunks().to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((d >= lo) & (d < hi)))
        d = t["l_shipdate"].combine_chunks().to_numpy(zero_copy_only=False)
        year = d.astype("datetime64[Y]").astype(np.int64) + 1970
        price = scale_to_int(t["l_extendedprice"], 100).to_numpy()
        disc = scale_to_int(t["l_discount"], 100).to_numpy()
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "l_year": pa.array(year),
                         "rev": pa.array(price * (100 - disc))})

    l_side = broadcast_join(
        li.map_batches(li_prep, batch_format="pyarrow"), supp,
        keys="l_suppkey", right_keys="s_suppkey") \
        .map_batches(lambda t: pa.table(
            {"l_orderkey": t["l_orderkey"],
             "s_nat": t["s_nationkey"].cast(pa.int64()),
             "l_year": t["l_year"], "rev": t["rev"]}),
            batch_format="pyarrow")

    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    o_side = broadcast_join(orders, cust, keys="o_custkey",
                            right_keys="c_custkey") \
        .map_batches(lambda t: pa.table(
            {"o_orderkey": t["o_orderkey"],
             "c_nat": t["c_nationkey"].cast(pa.int64())}),
            batch_format="pyarrow")

    def bucket_sums(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["c_nat"], t["s_nat"]))
        g = t.group_by(["s_nat", "c_nat", "l_year"]) \
            .aggregate([("rev", "sum")])
        return g.rename_columns(["s_nat", "c_nat", "l_year", "rev"])

    per = bucket_hash_join(o_side, l_side, "o_orderkey", "l_orderkey",
                           left_cols=["c_nat"],
                           right_cols=["s_nat", "l_year", "rev"],
                           n_buckets=32, bucket_fn=bucket_sums)
    m = merge_partials(per, ["s_nat", "c_nat", "l_year"], "rev").to_pandas()
    m["supp_nation"] = m["s_nat"].map(name_of)
    m["cust_nation"] = m["c_nat"].map(name_of)
    out = m.sort_values(["supp_nation", "cust_nation", "l_year"])
    return out[["supp_nation", "cust_nation", "l_year", "rev"]] \
        .rename(columns={"rev": "revenue_scaled"}) \
        .reset_index(drop=True).astype({"l_year": "int64",
                                        "revenue_scaled": "int64"})


def q_tpch_q8(sf_dir: str):
    """TPC-H Q8 shape (national market share): ASIA-customer orders of
    STANDARD-type parts; per order year the revenue supplied by NATION_3
    vs total.  All three dimension filters broadcast (ASIA customer map,
    STANDARD partkey set, supplier→is-nation flag); the GRACE join carries
    (rev, is_nat) against (year) and sums per (year, is_nat) IN-BUCKET.
    Share = nat/total left to the consumer — two exact ints per year are
    the hashable artifact."""
    import pyarrow.parquet as pq

    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.relational import (broadcast_join,
                                                     bucket_hash_join)
    from timberjack_ray.functions.util import scale_to_int

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    nr = nation.join(region, keys="n_regionkey", right_keys="r_regionkey")
    asia = nr.filter(pc.equal(nr["r_name"], "ASIA"))["n_nationkey"]
    asia = asia.combine_chunks()
    nat_key = nation.filter(pc.equal(nation["n_name"], "NATION_3")) \
        ["n_nationkey"][0].as_py()

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    cust = cust.filter(pc.is_in(cust["c_nationkey"], value_set=asia)) \
        .select(["c_custkey"])
    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_type"])
    std_parts = part.filter(pc.equal(part["p_type"], "STANDARD")) \
        ["p_partkey"].combine_chunks()
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey"])

    lo = np.datetime64("1997-01-01")
    hi = np.datetime64("1999-01-01")

    orders = _rp(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_prep(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].combine_chunks().to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((d >= lo) & (d < hi)))
        d = t["o_orderdate"].combine_chunks().to_numpy(zero_copy_only=False)
        year = d.astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "o_year": pa.array(year)})

    o_side = broadcast_join(
        orders.map_batches(o_prep, batch_format="pyarrow"), cust,
        keys="o_custkey", right_keys="c_custkey") \
        .map_batches(lambda t: t.select(["o_orderkey", "o_year"]),
                     batch_format="pyarrow")

    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_partkey", "l_suppkey",
                      "l_extendedprice", "l_discount"])

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["l_partkey"], value_set=std_parts))
        price = scale_to_int(t["l_extendedprice"], 100).to_numpy()
        disc = scale_to_int(t["l_discount"], 100).to_numpy()
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "rev": pa.array(price * (100 - disc))})

    l_side = broadcast_join(
        li.map_batches(li_prep, batch_format="pyarrow"), supp,
        keys="l_suppkey", right_keys="s_suppkey") \
        .map_batches(lambda t: pa.table(
            {"l_orderkey": t["l_orderkey"], "rev": t["rev"],
             "is_nat": pc.cast(pc.equal(t["s_nationkey"],
                                        pa.scalar(nat_key,
                                                  t["s_nationkey"].type)),
                               pa.int64())}),
            batch_format="pyarrow")

    def bucket_sums(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_year", "is_nat"]).aggregate([("rev", "sum")])
        return g.rename_columns(["o_year", "is_nat", "rev"])

    per = bucket_hash_join(o_side, l_side, "o_orderkey", "l_orderkey",
                           left_cols=["o_year"],
                           right_cols=["rev", "is_nat"],
                           n_buckets=32, bucket_fn=bucket_sums)
    m = merge_partials(per, ["o_year", "is_nat"], "rev").to_pandas()
    g = m.pivot_table(index="o_year", columns="is_nat", values="rev",
                      aggfunc="sum", fill_value=0)
    nat = (g[1] if 1 in g.columns else pd.Series(0, index=g.index)) \
        .to_numpy()
    oth = (g[0] if 0 in g.columns else pd.Series(0, index=g.index)) \
        .to_numpy()
    out = pd.DataFrame({
        "o_year": g.index.to_numpy().astype("int64"),
        "nat_rev_scaled": nat.astype("int64"),
        "total_rev_scaled": (nat + oth).astype("int64"),
    }).sort_values("o_year").reset_index(drop=True)
    return out


def q_tpch_q15(sf_dir: str):
    """TPC-H Q15 shape (top supplier): per-supplier revenue in a 3-month
    ship window (partials merge at supplier — dimension — cardinality;
    open supplier domains would use groupby().aggregate, documented),
    then the MAX-revenue supplier(s) decorate with the name driver-side.
    Cents-exact, so the max has no float ties."""
    import pyarrow.parquet as pq

    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.util import scale_to_int

    lo = np.datetime64("1997-01-01")
    hi = np.datetime64("1997-04-01")

    def partial(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].combine_chunks().to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((d >= lo) & (d < hi)))
        price = scale_to_int(t["l_extendedprice"], 100).to_numpy()
        disc = scale_to_int(t["l_discount"], 100).to_numpy()
        g = pa.table({"s": t["l_suppkey"],
                      "rev": pa.array(price * (100 - disc))}) \
            .group_by("s").aggregate([("rev", "sum")])
        return g.rename_columns(["s", "rev"])

    li = _rp(sf_dir, "lineitem",
             columns=["l_suppkey", "l_extendedprice", "l_discount",
                      "l_shipdate"])
    m = merge_partials(li.map_batches(partial, batch_format="pyarrow"),
                       ["s"], "rev").to_pandas()
    top = m[m["rev"] == m["rev"].max()]
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_name"]).to_pandas()
    out = top.merge(supp, left_on="s", right_on="s_suppkey")
    out = out[["s_suppkey", "s_name", "rev"]] \
        .rename(columns={"rev": "total_rev_scaled"})
    return out.sort_values("s_suppkey").reset_index(drop=True) \
        .astype({"s_suppkey": "int64", "total_rev_scaled": "int64"})


def q_tpch_q22(sf_dir: str):
    """TPC-H Q22 shape (sales opportunity, nation-adapted — the synth
    schema has no phone column, so the country-code prefix group becomes
    the nation): per nation, count + total balance of customers whose
    balance beats the global positive-balance average AND who have no
    orders.  The float AVG threshold is replaced by the exact INTEGER
    inequality bal·n_pos > sum_pos (⇔ bal > avg); the no-orders test is a
    broadcast anti-join (ordering-customer keys)."""
    import pyarrow.parquet as pq

    from timberjack_ray.aggregates import merge_partials

    # pass 1: global positive-balance (sum, count) over customers
    cust_ds = _rp(sf_dir, "customer",
                  columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partial(t: pa.Table) -> pa.Table:
        cents = _scale100(t["c_acctbal"].to_numpy(zero_copy_only=False))
        pos = cents[cents > 0]
        return pa.table({"s": pa.array([int(pos.sum())]),
                         "c": pa.array([len(pos)])})

    p = cust_ds.map_batches(bal_partial, batch_format="pyarrow").to_pandas()
    sum_pos, n_pos = int(p["s"].sum()), int(p["c"].sum())

    # ordering customers: distinct o_custkey (customer-bounded merge)
    orders = _rp(sf_dir, "orders", columns=["o_custkey"])

    def ck_partial(t: pa.Table) -> pa.Table:
        return pa.table({"k": pc.unique(t["o_custkey"]),
                         "n": pa.array(np.ones(
                             len(pc.unique(t["o_custkey"])), np.int64))})

    have = merge_partials(orders.map_batches(ck_partial,
                                             batch_format="pyarrow"),
                          ["k"], "n").to_pandas()
    have_keys = pa.array(np.sort(have["k"].to_numpy()))

    def pick(t: pa.Table) -> pa.Table:
        cents = _scale100(t["c_acctbal"].to_numpy(zero_copy_only=False))
        rich = cents * n_pos > sum_pos
        no_ord = pc.invert(pc.is_in(t["c_custkey"],
                                    value_set=have_keys)) \
            .to_numpy(zero_copy_only=False)
        t = t.append_column("bal_scaled", pa.array(cents)) \
            .filter(pa.array(rich & no_ord))
        g = t.group_by("c_nationkey").aggregate(
            [("bal_scaled", "sum"), ([], "count_all")])
        return g.rename_columns(["c_nationkey", "bal", "n_cust"])

    # two value columns → manual nation-bounded fold
    folded = _collect_result(cust_ds.map_batches(pick,
                                                 batch_format="pyarrow"))
    if folded.num_rows:
        t = folded.group_by("c_nationkey") \
            .aggregate([("bal", "sum"), ("n_cust", "sum")])
        df = t.rename_columns(["c_nationkey", "bal_scaled", "n_cust"]) \
            .to_pandas()
    else:
        df = pd.DataFrame({"c_nationkey": [], "bal_scaled": [],
                           "n_cust": []})
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"]).to_pandas()
    out = df.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    return out[["n_name", "n_cust", "bal_scaled"]].sort_values("n_name") \
        .reset_index(drop=True).astype({"n_cust": "int64",
                                        "bal_scaled": "int64"})


def q_sliding_window_distinct_users(sf_dir: str):
    """Sliding-window COUNT(DISTINCT user): the window membership fan-out
    (width/slide bounded, int64 arrays only) feeds the GUARDED grouped
    distinct-count fold — concurrency/active-user monitoring."""
    from timberjack_ray.functions.relational import distinct_count_by

    width_s, slide_s = 3600, 1800
    fanout = width_s // slide_s

    def fan(t: pa.Table) -> pa.Table:
        secs = t["ts"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype("datetime64[s]").astype(np.int64)
        base = secs // slide_s
        ks = np.repeat(base, fanout) - np.tile(
            np.arange(fanout, dtype=np.int64), len(base))
        users = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({"window_start": pa.array(ks * slide_s),
                         "user_id": pa.array(np.repeat(users, fanout))})

    ds = _rp(sf_dir, "events", columns=["ts", "user_id"])
    fanned = ds.map_batches(fan, batch_format="pyarrow")
    out = distinct_count_by(fanned, "window_start", "user_id",
                            name="n_users")
    return out.sort_values("window_start").reset_index(drop=True) \
        .astype({"window_start": "int64", "n_users": "int64"})


def q_vocab_coverage(sf_dir: str):
    """Vocabulary coverage curve — the tokenizer-budget question: how many
    distinct words (taken most-frequent-first, word-asc tie-break) cover
    ≥ 50/90/99 % of all token occurrences.  One guarded word-count pass;
    the curve walk runs on the vocabulary-sized merged table."""
    from timberjack_ray.aggregates import merge_counts_guarded

    def partial(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(t["text"], " "))
        g = pa.table({"word": words}).group_by("word") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["word", "n"])

    ds = _rp(sf_dir, "documents", columns=["text"])
    folded = merge_counts_guarded(
        ds.map_batches(partial, batch_format="pyarrow"), "word", "n")
    df = folded.to_pandas().sort_values(["n", "word"],
                                        ascending=[False, True])
    cum = df["n"].cumsum().to_numpy()
    total = int(df["n"].sum())
    rows = []
    for pct in (50, 90, 99):
        # smallest prefix whose count sum reaches pct% of tokens:
        # cum*100 >= pct*total on exact ints
        k = int(np.searchsorted(cum * 100, pct * total) + 1)
        rows.append({"coverage_pct": pct, "n_words": k})
    return pd.DataFrame(rows).astype({"coverage_pct": "int64",
                                      "n_words": "int64"})


def q_event_path_trigrams(sf_dir: str):
    """Top-10 per-user event-type trigram paths (functions/sessions
    .path_trigram_counts — one bucket exchange, two masked shifts,
    alphabet³-bounded merge)."""
    from timberjack_ray.functions.sessions import path_trigram_counts

    ds = _rp(sf_dir, "events",
             columns=["event_id", "ts", "user_id", "event_type"])
    return path_trigram_counts(ds, "user_id", "ts", "event_type",
                               "event_id", k=10)


def q_range_partition_stats(sf_dir: str):
    """Range-partitioning plan for a global sorted export: exact octile
    boundaries from the value histogram, per-range (n, min, max) proving
    the ranges tile the domain in order (functions/relational
    .range_partition_stats — two streaming passes, no sort)."""
    from timberjack_ray.functions.relational import range_partition_stats

    ds = _rp(sf_dir, "events", columns=["value"])
    return range_partition_stats(ds, "value", n_ranges=8, scale=100)


def q_typo_pairs(sf_dir: str):
    """Entity near-duplicate names: customer-name pairs at Levenshtein
    distance exactly 1 (functions/text.typo_pairs — SymSpell deletion-
    neighborhood join: one vocabulary-sized exchange + exact verify,
    never the O(V²) cross join the oracle runs)."""
    from timberjack_ray.functions.text import typo_pairs

    ds = _rp(sf_dir, "customer", columns=["c_name"])
    return typo_pairs(ds, "c_name")


def q_curation_pipeline_v2(sf_dir: str):
    """Second-generation curation chain composing the round-3 ops:
    perplexity gate (drop the worst-20% bits under the in-corpus bigram
    LM — the CCNet step) → benchmark decontamination (held-out slice) →
    chunk-level corpus dedup → per-source summary of surviving chunks.
    ORACLE-CHECKED since round 5 (was rows-only): the gate thresholds on
    the INTEGER centi-bit grid with the type-1 quantile rule (smallest
    value whose rank ≥ ⌈0.8·n⌉, ties kept) — same replayable form as
    perplexity_scores — and every downstream stage reuses an existing
    replay (3-gram decontamination, 10-word chunk keep-first dedup)."""
    from timberjack_ray.functions.corpus import chunk_dedup, unpack_chunk_ids
    from timberjack_ray.functions.dedup import decontaminate
    from timberjack_ray.functions.text import bigram_lm_scores

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "source"])

    # LM gate on the exact centi-bit ints (round 5): keep the best ~80%
    scores = bigram_lm_scores(ds).to_pandas()
    bc = np.floor(scores["bits"].to_numpy() * 100.0).astype(np.int64)
    srt = np.sort(bc)
    thr = int(srt[max(int(np.ceil(0.8 * len(srt))) - 1, 0)]) if len(srt) \
        else 0
    good = scores.loc[bc <= thr, "doc_id"].to_numpy()
    good.sort()
    import ray

    gref = ray.put(good)

    def keep_good(t: pa.Table) -> pa.Table:
        g = _fetch_ref(gref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(g, ids)
        inb = idx < len(g)
        ok = np.zeros(len(ids), dtype=bool)
        ok[inb] = g[idx[inb]] == ids[inb]
        return t.filter(pa.array(ok))

    kept = ds.map_batches(keep_good, batch_format="pyarrow")

    def side(bench: bool):
        def f(t: pa.Table) -> pa.Table:
            m = (t["doc_id"].to_numpy(zero_copy_only=False) % 97) == 0
            return t.filter(pa.array(m if bench else ~m))
        return kept.map_batches(f, batch_format="pyarrow")

    clean = decontaminate(side(False), side(True), k=3)
    surv_chunks = chunk_dedup(clean, chunk_words=10) \
        .map_batches(unpack_chunk_ids, batch_format="pyarrow").to_pandas()
    # doc→source decorate: driver-side at gate scale; at 10^12 docs the
    # source column rides the chunk rows instead (pack it into the chunk
    # partial next to doc_id) so no id→source join exists at all
    src = ds.map_batches(
        lambda t: t.select(["doc_id", "source"]),
        batch_format="pyarrow").to_pandas()
    m = surv_chunks.merge(src, on="doc_id")
    out = m.groupby("source").agg(n_docs=("doc_id", "nunique"),
                                  n_chunks=("chunk_idx", "count")) \
        .reset_index().sort_values("source").reset_index(drop=True)
    return out.astype({"n_docs": "int64", "n_chunks": "int64"})


def q_event_value_ntiles(sf_dir: str):
    """NTILE(4) by value within each event type → counts per (type,
    quartile).  Built on grouped_rank_ds (one bucket exchange); the SQL
    NTILE remainder rule (first n mod 4 buckets take the extra row) is
    replayed exactly from (rank, n_group) — integers end to end."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.relational import grouped_rank_ds

    ds = _rp(sf_dir, "events", columns=["event_id", "event_type", "value"])
    ranked = grouped_rank_ds(ds, "event_type", "value", "event_id",
                             scale=100)

    def ntile(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy(zero_copy_only=False)
        n = t["n_group"].to_numpy(zero_copy_only=False)
        size = n // 4
        rem = n % 4
        cut = rem * (size + 1)  # rows covered by the big buckets
        big = r <= cut
        nt = np.where(big, (r - 1) // np.maximum(size + 1, 1) + 1,
                      rem + (r - 1 - cut) // np.maximum(size, 1) + 1)
        g = pa.table({"event_type": t["event_type"],
                      "ntile": pa.array(nt.astype(np.int64))}) \
            .group_by(["event_type", "ntile"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "ntile", "n"])

    out = merge_partials(ranked.map_batches(ntile, batch_format="pyarrow"),
                         ["event_type", "ntile"], "n").to_pandas()
    return out.sort_values(["event_type", "ntile"]).reset_index(drop=True) \
        .astype({"ntile": "int64", "n": "int64"})


def q_dup_span_positions(sf_dir: str):
    """Substring-level dedup detection (Lee et al. 2022): every (doc, pos)
    where a stride-1 8-word span occurs ≥ 2 times corpus-wide
    (functions/dedup.dup_span_positions — one distributed hash-count
    exchange, dup-vocabulary broadcast, second streaming pass)."""
    from timberjack_ray.functions.dedup import dup_span_positions

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = dup_span_positions(ds, span_words=8).to_pandas()
    return out.sort_values(["doc_id", "pos"]).reset_index(drop=True) \
        .astype({"doc_id": "int64", "pos": "int64"})


def q_span_dedup_savings(sf_dir: str):
    """Span-dedup accounting (functions/dedup.remove_dup_spans with
    stats=True + source passthrough): per source the split-slot words
    before/after deleting every non-first duplicated 8-word span — the
    "how much did substring dedup save" report, exact ints, aggregated
    from per-batch partials."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.dedup import remove_dup_spans

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "source"])
    cleaned = remove_dup_spans(ds, span_words=8, keep_cols=["source"],
                               stats=True)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate(
            [([], "count_all"), ("n_before", "sum"), ("n_kept", "sum")])
        return g.rename_columns(
            ["source", "n_docs", "words_before", "words_after"])

    out = merge_partials(cleaned.map_batches(partial,
                                             batch_format="pyarrow"),
                         ["source"],
                         ["n_docs", "words_before", "words_after"]) \
        .to_pandas()
    return out.sort_values("source").reset_index(drop=True) \
        .astype({"n_docs": "int64", "words_before": "int64",
                 "words_after": "int64"})


def q_user_value_cumsum(sf_dir: str):
    """Per-user running totals (functions/sessions.grouped_cumsum): SQL
    SUM() OVER (PARTITION BY user ORDER BY ts, id) on the exact cent
    domain — bucket exchange + one segmented vectorized cumsum per bucket;
    output streams row-volume."""
    from timberjack_ray.functions.sessions import grouped_cumsum

    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])
    out = grouped_cumsum(ds, "user_id", "ts", "event_id", "value").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True) \
        .astype({"event_id": "int64", "cum_scaled": "int64"})


def q_max_concurrent_values(sf_dir: str):
    """Peak concurrency per hour (functions/window.max_concurrent):
    sweep-line over [ts, ts+value·1s) intervals as a distributed two-phase
    scan — per-window local resolve, #windows-sized driver carry chain."""
    from timberjack_ray.functions.window import max_concurrent

    ds = _rp(sf_dir, "events", columns=["ts", "value"])
    return max_concurrent(ds, "ts", "value", width_s=3600, dur_scale=1.0)


def q_source_vocab_overlap(sf_dir: str):
    """Pairwise source-vocabulary overlap (functions/corpus.
    source_vocab_overlap): exact (inter, uni) integers per source pair via
    one word-bucket exchange + per-bucket segmented bitmask OR — merge
    volume is distinct source COMBINATIONS, not words.  Jaccard is the
    consumer's division; the mixing/cross-dedup planning statistic."""
    from timberjack_ray.functions.corpus import source_vocab_overlap

    ds = _rp(sf_dir, "documents", columns=["source", "text"])
    out = source_vocab_overlap(ds)
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def q_bpe_merges(sf_dir: str):
    """BPE tokenizer training (functions/text.bpe_train): 20 merges learned
    from one guarded distributed word-histogram pass + the driver-side
    vectorized merge loop (HF-tokenizers shape).  Iterative — no SQL
    oracle; the merge rule is pinned by the hand-computed Sennrich-corpus
    test (tests/test_text_lm.py)."""
    from timberjack_ray.functions.text import bpe_train

    ds = _rp(sf_dir, "documents", columns=["text"])
    return bpe_train(ds, n_merges=20)


def q_bpe_fertility(sf_dir: str):
    """BPE train→apply round trip (functions/text.bpe_token_counts):
    per-source word and BPE-token totals after 20 learned merges — the
    tokenizer-fertility statistic.  Iterative training → no SQL oracle;
    the merge rule and encoder are pinned by the Sennrich-corpus tests."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.text import bpe_token_counts

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source", "text"])
    per_doc = bpe_token_counts(ds, n_merges=20, col="text",
                               keep_cols=["source"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate(
            [([], "count_all"), ("n_words", "sum"), ("n_bpe", "sum")])
        return g.rename_columns(
            ["source", "n_docs", "total_words", "total_bpe"])

    out = merge_partials(per_doc.map_batches(partial,
                                             batch_format="pyarrow"),
                         ["source"],
                         ["n_docs", "total_words", "total_bpe"]).to_pandas()
    return out.sort_values("source").reset_index(drop=True) \
        .astype({"n_docs": "int64", "total_words": "int64",
                 "total_bpe": "int64"})


def q_value_percentile_ranks(sf_dir: str):
    """Empirical-CDF rank normalization (functions/sessions.
    percentile_ranks): per event the exact-integer (n_less, n_eq) of its
    cent-scaled value — histogram pass + broadcast cumulative table + one
    streaming searchsorted assignment; PERCENT_RANK is the consumer's
    division."""
    from timberjack_ray.functions.sessions import percentile_ranks

    ds = _rp(sf_dir, "events", columns=["event_id", "value"])
    out = percentile_ranks(ds, "value", "event_id").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True) \
        .astype({"event_id": "int64", "n_less": "int64", "n_eq": "int64"})


def q_corpus_diff_counts(sf_dir: str):
    """Incremental-snapshot audit (functions/corpus.corpus_diff_counts):
    distinct contents added / removed / common between the even-doc_id and
    odd-doc_id halves of the documents table — one Min/Max(hash-tag)
    exchange, classify step is partial-sum sized."""
    from timberjack_ray.functions.corpus import corpus_diff_counts

    def side(parity: int):
        return _rp(sf_dir, "documents", columns=["doc_id", "text"]) \
            .map_batches(lambda t, p=parity: t.filter(
                pc.equal(pc.bit_wise_and(t["doc_id"], 1), p)),
                batch_format="pyarrow")

    return corpus_diff_counts(side(0), side(1))


def q_embedding_dispersion(sf_dir: str):
    """Per-label embedding dispersion moments (functions/similarity.
    embedding_dispersion): exact scaled-int Σ‖q(e)‖² per label — with the
    centroid sums this yields the per-group variance bit-exactly."""
    from timberjack_ray.functions.similarity import embedding_dispersion

    ds = _rp(sf_dir, "embeddings", columns=["label", "embedding"])
    out = embedding_dispersion(ds, "label", scale=1000)
    return out.astype({"label": "int64", "n": "int64",
                       "sumsq_scaled": "int64"})


def q_top_event_per_hour(sf_dir: str):
    """Windowed argmax (functions/window.top_key_per_window): the dominant
    event type per hour with a defined tie-break (count desc, key asc) —
    partials are (window, key) counts, the rank prune is window-bounded."""
    from timberjack_ray.functions.window import top_key_per_window

    ds = _rp(sf_dir, "events", columns=["ts", "event_type"])
    return top_key_per_window(ds, "ts", "event_type", 3600, k=1)


def q_exact_sample_per_source(sf_dir: str):
    """Fixed-quota deterministic sampling (functions/corpus.
    grouped_exact_sample): exactly 20 docs per source ranked by the Knuth
    32-bit scramble of doc_id — grouped_topk pruning, k×groups exchange."""
    from timberjack_ray.functions.corpus import grouped_exact_sample

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source"])
    out = grouped_exact_sample(ds, "source", "doc_id", 20)
    return out.sort_values(["source", "doc_id"]).reset_index(drop=True) \
        .astype({"doc_id": "int64"})


def q_remove_dup_spans(sf_dir: str):
    """Substring-level dedup APPLICATION (Lee et al. 2022): delete every
    non-first occurrence of a duplicated 8-word span, keeping the globally
    first (min (doc_id, pos)); overlapping deletions union
    (functions/dedup.remove_dup_spans — one Sum/Min hash exchange,
    dup-vocabulary broadcast, one streaming rewrite pass with
    pc.binary_join reconstruction)."""
    from timberjack_ray.functions.dedup import remove_dup_spans

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = remove_dup_spans(ds, span_words=8).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64"})


def q_first_touch_counts(sf_dir: str):
    """First-touch attribution: each user's FIRST event type under
    (ts, event_id) order (functions/sessions.first_event_per_key — one
    bucket exchange, argmin streams), counted by type."""
    from timberjack_ray.aggregates import counts_by
    from timberjack_ray.functions.sessions import first_event_per_key

    ds = _rp(sf_dir, "events", columns=["event_id", "ts", "user_id",
                                        "event_type"])
    firsts = first_event_per_key(ds, "user_id", "ts", "event_id")
    out = counts_by(firsts, "event_type")
    return out.sort_values("event_type").reset_index(drop=True) \
        .astype({"n": "int64"})


def q_session_type_pairs(sf_dir: str):
    """Within-session event-type co-occurrence (market-basket pairs over
    3600 s sessions): one sessionize bucket exchange; session assignment,
    (session, type) dedup and pair expansion all happen inside the same
    per-bucket pass — only alphabet²-bounded counts leave it."""
    from timberjack_ray.functions.sessions import session_type_pairs

    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return session_type_pairs(ds, "user_id", "ts", "event_type", 3600)


def q_new_users_per_day(sf_dir: str):
    """Cohort-arrival curve: per-day NEW user counts + cumulative total.
    Per-batch per-user min-day partials → GUARDED min-fold (distributed
    groupby(Min) past the user-cardinality guard) → day histogram →
    date-bounded merge → driver cumulative walk."""
    from timberjack_ray.aggregates import merge_partials, \
        merge_partials_or_ds

    def partial(t: pa.Table) -> pa.Table:
        d = t["ts"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        g = pa.table({"user_id": t["user_id"], "d": pa.array(d)}) \
            .group_by("user_id").aggregate([("d", "min")])
        return g.rename_columns(["user_id", "d"])

    ev = _rp(sf_dir, "events", columns=["ts", "user_id"])
    firsts, mode = merge_partials_or_ds(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["user_id"], ["d"], ops=["min"])

    def hist(t: pa.Table) -> pa.Table:
        g = t.group_by("d").aggregate([([], "count_all")])
        return g.rename_columns(["d", "n_new"])

    if mode == "distributed":  # pragma: no cover - past the fold guard
        h = merge_partials(
            firsts.map_batches(hist, batch_format="pyarrow"),
            ["d"], "n_new").to_pandas().sort_values("d")
    else:
        h = hist(firsts).to_pandas().sort_values("d")
    h["day"] = pd.to_datetime(h["d"], unit="D").dt.strftime("%Y-%m-%d")
    h["cum_users"] = h["n_new"].cumsum()
    return h[["day", "n_new", "cum_users"]].reset_index(drop=True) \
        .astype({"n_new": "int64", "cum_users": "int64"})


def q_corpus_drift_words(sf_dir: str):
    """Vocabulary-drift monitor between the two source halves: top-20
    words by |count_a − count_b| as exact int rows (functions/text
    .corpus_drift_words — one guarded counting pass per side)."""
    from timberjack_ray.functions.text import corpus_drift_words

    ds = _rp(sf_dir, "documents", columns=["text", "source"])

    def half(second: bool):
        def f(t: pa.Table) -> pa.Table:
            si = pc.utf8_slice_codeunits(t["source"], 3, 99)
            m = pc.greater_equal(pc.cast(si, pa.int64()), 10)
            return t.filter(m if second else pc.invert(m))
        return ds.map_batches(f, batch_format="pyarrow")

    return corpus_drift_words(half(False), half(True), k=20)


def q_cross_dedup_docs(sf_dir: str):
    """Cross-corpus exact dedup: the src0-9 half plays the existing corpus
    (base), src10-19 the new crawl; new docs whose text already exists in
    base are dropped (functions/dedup.cross_dedup — broadcast base-hash
    set under the limit, intersection-broadcast distributed anti-join past
    it).  Synth halves share no text, so the survivors are the whole new
    half here — the planted-truth test (tests/test_text_lm.py) carries the
    drop behavior; this gate row pins the anti-join equivalence."""
    from timberjack_ray.functions.dedup import cross_dedup

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def half(new_side: bool):
        def f(t: pa.Table) -> pa.Table:
            si = pc.utf8_slice_codeunits(t["source"], 3, 99)
            m = pc.greater_equal(pc.cast(si, pa.int64()), 10)
            return t.filter(m if new_side else pc.invert(m))
        return ds.map_batches(f, batch_format="pyarrow")

    out = cross_dedup(half(True), half(False)).to_pandas()
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64"})


def q_inverted_index(sf_dir: str):
    """Inverted-index build: (word, df, postings) rows with postings
    capped to the first 8 sorted doc ids (bounded output rows — production
    indexes page long lists the same way).  One exchange of distinct
    (word, doc) pairs; posting assembly is output-bounded."""
    from timberjack_ray.functions.corpus import inverted_index

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = inverted_index(ds, cap_postings=8).to_pandas()
    return out.sort_values("word").reset_index(drop=True) \
        .astype({"df": "int64"})


def q_event_debounce(sf_dir: str):
    """Windowed event dedup: drop an event if the previous event of the
    same (user, type) stream is ≤ 600 s older (functions/sessions.debounce
    — LAG gap test on integer microseconds, one bucket exchange)."""
    from timberjack_ray.functions.sessions import debounce

    ds = _rp(sf_dir, "events",
             columns=["event_id", "ts", "user_id", "event_type"])
    out = debounce(ds, "user_id", "event_type", "ts", "event_id", 600)
    kept = out.map_batches(lambda t: t.select(["event_id"]),
                           batch_format="pyarrow").to_pandas()
    return kept.sort_values("event_id").reset_index(drop=True) \
        .astype({"event_id": "int64"})


def q_nation_order_counts(sf_dir: str):
    """LEFT OUTER shape: orders per nation INCLUDING nations with zero
    orders.  Fact side aggregates map-side against a broadcast
    customer→nation dim; the outer fill happens on the tiny nation table
    driver-side (25 rows) — the standard dim-preserving rollup."""
    import pyarrow.parquet as pq

    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.relational import broadcast_join

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    orders = _rp(sf_dir, "orders", columns=["o_custkey"])
    joined = broadcast_join(orders, cust, keys="o_custkey",
                            right_keys="c_custkey")

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"nk": t["c_nationkey"].cast(pa.int64())}) \
            .group_by("nk").aggregate([([], "count_all")])
        return g.rename_columns(["nk", "n"])

    counts = merge_partials(joined.map_batches(partial,
                                               batch_format="pyarrow"),
                            ["nk"], "n").to_pandas()
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"]).to_pandas()
    out = nation.merge(counts, left_on="n_nationkey", right_on="nk",
                       how="left")
    out["n_orders"] = out["n"].fillna(0).astype(np.int64)
    return out[["n_name", "n_orders"]].sort_values("n_name") \
        .reset_index(drop=True)


def q_bpe_pair_counts(sf_dir: str):
    """First-BPE-merge candidate table: top-20 adjacent character pairs
    within words (functions/text.bpe_pair_counts) — merge volume bounded
    by charset², never corpus size."""
    from timberjack_ray.functions.text import bpe_pair_counts

    ds = _rp(sf_dir, "documents", columns=["text"])
    return bpe_pair_counts(ds, k=20)


def q_tpch_q4(sf_dir: str):
    """TPC-H Q4 shape (order-priority checking; the synth schema has no
    l_commitdate/l_receiptdate, so "late" is l_shipdate > o_orderdate +
    60 days): count Q3-1997 orders per priority with at least one late
    line.  Both the window-order slice and lineitem are unbounded at
    100 TB, so the EXISTS runs as the GRACE bucket join with the
    semi-join resolved IN-BUCKET — every line of an order co-locates, so
    the distinct-orderkey-per-priority count inside bucket_fn is
    complete and ≤ 5 rows leave each bucket."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.relational import bucket_hash_join

    lo, hi = np.datetime64("1997-07-01"), np.datetime64("1997-10-01")

    def o_prep(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].combine_chunks().to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((d >= lo) & (d < hi)))
        day = t["o_orderdate"].combine_chunks() \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_day": pa.array(day),
                         "prio": t["o_orderpriority"]})

    def l_prep(t: pa.Table) -> pa.Table:
        day = t["l_shipdate"].combine_chunks() \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "ship_day": pa.array(day)})

    def per_bucket(t: pa.Table) -> pa.Table:
        late = t.filter(pc.greater(pc.subtract(t["ship_day"], t["o_day"]),
                                   60))
        dis = late.select(["prio", "l_orderkey"]) \
            .group_by(["prio", "l_orderkey"]).aggregate([([], "count_all")])
        g = dis.group_by("prio").aggregate([([], "count_all")])
        return g.rename_columns(["prio", "n"])

    joined = bucket_hash_join(
        _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
        .map_batches(l_prep, batch_format="pyarrow"),
        _rp(sf_dir, "orders",
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
        .map_batches(o_prep, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey", ["ship_day"], ["o_day", "prio"],
        bucket_fn=per_bucket)
    out = merge_partials(joined, ["prio"], "n").to_pandas()
    out = out.rename(columns={"prio": "o_orderpriority", "n": "n_orders"})
    return out.sort_values("o_orderpriority").reset_index(drop=True) \
        .astype({"n_orders": "int64"})


def q_tpch_q12(sf_dir: str):
    """TPC-H Q12 shape (shipping-priority mix; the synth schema has no
    l_shipmode, so the group is l_returnflag): per flag, how many 1998
    lineitems belong to high-priority (1-URGENT/2-HIGH) vs low-priority
    orders.  orders × lineitem is large×large → GRACE bucket join; the
    conditional counts collapse to ≤ 3 rows per bucket in bucket_fn."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.relational import bucket_hash_join

    lo, hi = np.datetime64("1998-01-01"), np.datetime64("1999-01-01")

    def l_prep(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].combine_chunks().to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((d >= lo) & (d < hi)))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "flag": t["l_returnflag"]})

    def o_prep(t: pa.Table) -> pa.Table:
        hi_p = pc.is_in(t["o_orderpriority"],
                        value_set=pa.array(["1-URGENT", "2-HIGH"]))
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "is_high": hi_p.cast(pa.int64())})

    def per_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by("flag").aggregate([("is_high", "sum"),
                                          ([], "count_all")])
        g = g.rename_columns(["flag", "high", "total"])
        low = pc.subtract(g["total"], g["high"])
        return pa.table({"flag": g["flag"], "high": g["high"],
                         "low": low})

    joined = bucket_hash_join(
        _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate",
                                         "l_returnflag"])
        .map_batches(l_prep, batch_format="pyarrow"),
        _rp(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
        .map_batches(o_prep, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey", ["flag"], ["is_high"],
        bucket_fn=per_bucket)
    out = merge_partials(joined, ["flag"], ["high", "low"]).to_pandas()
    out = out.rename(columns={"flag": "l_returnflag",
                              "high": "high_line_count",
                              "low": "low_line_count"})
    return out.sort_values("l_returnflag").reset_index(drop=True) \
        .astype({"high_line_count": "int64", "low_line_count": "int64"})


def q_tpch_q21(sf_dir: str):
    """TPC-H Q21 shape (suppliers who kept orders waiting; "late" is
    l_shipdate > o_orderdate + 30 days): for finished ('F') orders with
    ≥ 2 distinct suppliers where EXACTLY ONE supplier shipped late, count
    blame per supplier; top 20 by (count desc, name).  Plan: GRACE bucket
    join on l_orderkey co-locates every line of an order, so the
    EXISTS/NOT-EXISTS pair resolves per bucket with two np.unique passes
    ((order, supp) pairs, then late pairs) — ≤ |suppliers| rows leave
    each bucket, the supplier-bounded merge joins names broadcast."""
    import pyarrow.parquet as pq

    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.relational import bucket_hash_join

    def l_prep(t: pa.Table) -> pa.Table:
        day = t["l_shipdate"].combine_chunks() \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "supp": t["l_suppkey"].cast(pa.int64()),
                         "ship_day": pa.array(day)})

    def o_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], "F"))
        day = t["o_orderdate"].combine_chunks() \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[D]").astype(np.int64)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_day": pa.array(day)})

    def per_bucket(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        sp = t["supp"].to_numpy(zero_copy_only=False)
        late = (t["ship_day"].to_numpy(zero_copy_only=False)
                - t["o_day"].to_numpy(zero_copy_only=False)) > 30
        pairs = np.unique(np.stack([ok, sp]), axis=1)
        po, _ = pairs
        uo, n_supp = np.unique(po, return_counts=True)
        lp = np.unique(np.stack([ok[late], sp[late]]), axis=1)
        lo_, ls = lp
        ulo, n_late = np.unique(lo_, return_counts=True)
        # orders with exactly one late supplier: their lone supplier is
        # the pair row itself (n_late == 1 ⇒ one row in lp per order)
        one = ulo[n_late == 1]
        # map each order to its distinct-supplier count
        idx = np.searchsorted(uo, lo_)
        keep = np.isin(lo_, one) & (n_supp[idx] >= 2)
        blamed = ls[keep]
        u, n = np.unique(blamed, return_counts=True)
        return pa.table({"supp": pa.array(u.astype(np.int64)),
                         "n": pa.array(n.astype(np.int64))})

    joined = bucket_hash_join(
        _rp(sf_dir, "lineitem",
            columns=["l_orderkey", "l_suppkey", "l_shipdate"])
        .map_batches(l_prep, batch_format="pyarrow"),
        _rp(sf_dir, "orders",
            columns=["o_orderkey", "o_orderstatus", "o_orderdate"])
        .map_batches(o_prep, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey", ["supp", "ship_day"], ["o_day"],
        bucket_fn=per_bucket)
    counts = merge_partials(joined, ["supp"], "n").to_pandas()
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_name"]).to_pandas()
    out = counts.merge(supp, left_on="supp", right_on="s_suppkey")
    out = out.rename(columns={"n": "numwait"}) \
        .sort_values(["numwait", "s_name"], ascending=[False, True]) \
        .head(20)
    return out[["s_name", "numwait"]].reset_index(drop=True) \
        .astype({"numwait": "int64"})


def q_tpch_q9(sf_dir: str):
    """TPC-H Q9 shape (product-type profit by nation and year; the synth
    schema has no partsupp, so profit is revenue cents × (100−disc) with
    no supplycost term): lineitems of 'widget' parts, supplier nation,
    order year.  Plan: the part filter and supplier→nation map are
    broadcast sorted-array lookups (dimension tables); orders is
    large → GRACE bucket join for the year column; per-bucket group
    (nation, year) sums leave ≤ 25·|years| rows each."""
    import pyarrow.parquet as pq
    import ray

    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.relational import bucket_hash_join
    from timberjack_ray.functions.util import fetch_broadcast

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_name"])
    widg = part.filter(pc.match_substring(part["p_name"], "widget"))
    pk = np.sort(widg["p_partkey"].to_numpy())
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey"])
    sk = supp["s_suppkey"].to_numpy()
    order_ = np.argsort(sk)
    ref = ray.put((pk, sk[order_],
                   supp["s_nationkey"].to_numpy()[order_]
                   .astype(np.int64)))

    def l_prep(t: pa.Table) -> pa.Table:
        from timberjack_ray.functions.util import (sorted_lookup,
                                                   sorted_member_mask)

        pkeys, skeys, snat = fetch_broadcast(ref)
        p = t["l_partkey"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(sorted_member_mask(pkeys, p)))
        price = _scale100(t["l_extendedprice"]
                          .to_numpy(zero_copy_only=False))
        disc = _scale100(t["l_discount"].to_numpy(zero_copy_only=False))
        s = t["l_suppkey"].to_numpy(zero_copy_only=False)
        # synth FK integrity: every l_suppkey exists in supplier; the
        # hit-mask guard keeps a dangling key from crashing or silently
        # misattributing (it is dropped instead)
        s_hit, s_idx = sorted_lookup(skeys, s)
        out = pa.table({"l_orderkey": t["l_orderkey"],
                        "nat": pa.array(snat[s_idx]),
                        "rev": pa.array(price * (100 - disc))})
        return out if s_hit.all() else out.filter(pa.array(s_hit))

    def o_prep(t: pa.Table) -> pa.Table:
        y = t["o_orderdate"].combine_chunks() \
            .to_numpy(zero_copy_only=False) \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "o_year": pa.array(y)})

    def per_bucket(t: pa.Table) -> pa.Table:
        g = t.group_by(["nat", "o_year"]).aggregate([("rev", "sum")])
        return g.rename_columns(["nat", "o_year", "profit"])

    joined = bucket_hash_join(
        _rp(sf_dir, "lineitem",
            columns=["l_orderkey", "l_partkey", "l_suppkey",
                     "l_extendedprice", "l_discount"])
        .map_batches(l_prep, batch_format="pyarrow"),
        _rp(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
        .map_batches(o_prep, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey", ["nat", "rev"], ["o_year"],
        bucket_fn=per_bucket)
    out = merge_partials(joined, ["nat", "o_year"], "profit").to_pandas()
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"]).to_pandas()
    out = out.merge(nation, left_on="nat", right_on="n_nationkey")
    out = out.rename(columns={"profit": "profit_scaled"})
    return out[["n_name", "o_year", "profit_scaled"]] \
        .sort_values(["n_name", "o_year"]).reset_index(drop=True) \
        .astype({"o_year": "int64", "profit_scaled": "int64"})


def q_tpch_q20(sf_dir: str):
    """TPC-H Q20 shape (excess-stock supplier promotion; the synth schema
    has no partsupp, so "excess" is re-based on shipped volume): NATION_5
    suppliers having some 'gear' part whose 1995-shipped quantity exceeds
    the per-supplier AVERAGE for that part — the correlated-AVG threshold
    resolved as the exact integer cross-multiplication qc·c_p > tot_p
    (q17's trick).  Plan: gear-part keys broadcast (dimension-bounded);
    ONE streaming pass folds (part, supp) qty-cent partials — merge
    volume ≤ |gear parts| × |suppliers| (dimension product, never rows;
    open domains ⇒ swap the fold for a distributed groupby, documented);
    the driver resolves thresholds on that dimension-sized table and
    decorates with the supplier dim."""
    import pyarrow.parquet as pq
    import ray

    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.util import fetch_broadcast

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_name"])
    gear = part.filter(pc.match_substring(part["p_name"], "gear"))
    ref = ray.put(np.sort(gear["p_partkey"].to_numpy()))
    lo = np.datetime64("1995-01-01")
    hi = np.datetime64("1996-01-01")

    def partial(t: pa.Table) -> pa.Table:
        from timberjack_ray.functions.util import sorted_member_mask

        pk = fetch_broadcast(ref)
        d = t["l_shipdate"].combine_chunks().to_numpy(zero_copy_only=False)
        p = t["l_partkey"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((d >= lo) & (d < hi) & sorted_member_mask(pk, p)))
        qc = pa.array(_scale100(t["l_quantity"].to_numpy(zero_copy_only=False)))
        g = pa.table({"p": t["l_partkey"], "s": t["l_suppkey"], "qc": qc}) \
            .group_by(["p", "s"]).aggregate([("qc", "sum")])
        return g.rename_columns(["p", "s", "qc"])

    li = _rp(sf_dir, "lineitem",
             columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
    pairs = merge_partials(li.map_batches(partial, batch_format="pyarrow"),
                           ["p", "s"], "qc").to_pandas()
    tot = pairs.groupby("p").agg(tot=("qc", "sum"), c=("qc", "size"))
    j = pairs.merge(tot, on="p")
    excess_supp = set(j.loc[j["qc"] * j["c"] > j["tot"], "s"].tolist())

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    nk = nation.filter(pc.equal(nation["n_name"], "NATION_5")) \
        ["n_nationkey"][0].as_py()
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_name", "s_nationkey"]) \
        .to_pandas()
    out = supp[(supp["s_nationkey"] == nk)
               & supp["s_suppkey"].isin(excess_supp)][["s_name"]]
    return out.sort_values("s_name").reset_index(drop=True)


def q_tpch_q16(sf_dir: str):
    """TPC-H Q16 shape (supplier-relationship count; the synth schema has
    no partsupp, so the part–supplier relation is the distinct
    (l_partkey, l_suppkey) pairs of lineitem, and the complaint-supplier
    exclusion is s_acctbal < 0): distinct suppliers per qualifying
    (brand, type, size).  Plan: the qualifying-part map collapses to a
    part→combo-id broadcast lookup; per-batch distinct pairs feed the
    GUARDED distinct-count fold (relational.distinct_count_by) keyed on
    the combo id — (pair) volume crosses once, groups are bounded."""
    import pyarrow.parquet as pq
    import ray

    from timberjack_ray.functions.relational import distinct_count_by
    from timberjack_ray.functions.util import fetch_broadcast

    part = pq.read_table(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"])
    sizes = pa.array([1, 4, 9, 14, 19, 24, 29, 34],
                     part["p_size"].type)
    keep = pc.and_(
        pc.and_(pc.invert(pc.equal(part["p_brand"], "Brand#45")),
                pc.invert(pc.starts_with(part["p_type"], "MEDIUM"))),
        pc.is_in(part["p_size"], value_set=sizes))
    part = part.filter(keep)
    combos = part.group_by(["p_brand", "p_type", "p_size"]) \
        .aggregate([([], "count_all")]).to_pandas() \
        .sort_values(["p_brand", "p_type", "p_size"]).reset_index(drop=True)
    key = (part["p_brand"].to_pylist(), part["p_type"].to_pylist(),
           part["p_size"].to_pylist())
    cid = {}
    for i, row in combos.iterrows():
        cid[(row["p_brand"], row["p_type"], row["p_size"])] = i
    gid = np.array([cid[(b, t, s)] for b, t, s in zip(*key)], np.int64)
    pk = part["p_partkey"].to_numpy()
    order_ = np.argsort(pk)
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_acctbal"])
    bad = np.sort(supp.filter(pc.less(supp["s_acctbal"], 0))
                  ["s_suppkey"].to_numpy())
    ref = ray.put((pk[order_], gid[order_], bad))

    def prep(t: pa.Table) -> pa.Table:
        from timberjack_ray.functions.util import (sorted_lookup,
                                                   sorted_member_mask)

        pkeys, gids, badk = fetch_broadcast(ref)
        p = t["l_partkey"].to_numpy(zero_copy_only=False)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False)
        hit, idx = sorted_lookup(pkeys, p)
        m = hit & ~sorted_member_mask(badk, s)
        return pa.table({"gid": pa.array(gids[idx[m]]),
                         "supp": pa.array(s[m].astype(np.int64))})

    pairs = _rp(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"]) \
        .map_batches(prep, batch_format="pyarrow")
    counts = distinct_count_by(pairs, "gid", "supp", name="supplier_cnt")
    out = combos.reset_index().rename(columns={"index": "gid"}) \
        .merge(counts, on="gid")
    return out[["p_brand", "p_type", "p_size", "supplier_cnt"]] \
        .sort_values(["p_brand", "p_type", "p_size"]) \
        .reset_index(drop=True) \
        .astype({"p_size": "int64", "supplier_cnt": "int64"})


def q_tpch_q2(sf_dir: str):
    """TPC-H Q2 shape (minimum-cost supplier per part; the synth schema
    has no partsupp, so "cost" is the lineitem price actually charged):
    for size-25 parts supplied from EUROPE, the cheapest (price, then
    lowest suppkey) supplier per part.  Plan: both dimension filters are
    broadcast sorted-key lookups; per-batch per-part (min price, argmin
    supp) partials via one lexsort, then a part-bounded driver fold
    resolves the global lexicographic min — the correlated-MIN-subquery
    shape with the min computed as a mergeable partial, no shuffle."""
    import pyarrow.parquet as pq
    import ray

    from timberjack_ray.functions.util import fetch_broadcast

    part = pq.read_table(os.path.join(sf_dir, "part.parquet"),
                         columns=["p_partkey", "p_size"])
    pk = np.sort(part.filter(pc.equal(part["p_size"], 25))
                 ["p_partkey"].to_numpy())
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    eur = region.filter(pc.equal(region["r_name"], "EUROPE"))
    nk = nation.filter(pc.is_in(nation["n_regionkey"],
                                value_set=eur["r_regionkey"]))
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey", "s_name"])
    esupp = supp.filter(pc.is_in(supp["s_nationkey"],
                                 value_set=nk["n_nationkey"]))
    sk = np.sort(esupp["s_suppkey"].to_numpy())
    ref = ray.put((pk, sk))

    def argmin_fold(tables: list) -> pa.Table:
        """Lexicographic-min-per-part reduce of (p, pr, s) partials."""
        t = pa.concat_tables(tables)
        if not t.num_rows:
            return pa.table({"p": pa.array([], pa.int64()),
                             "pr": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        p = t["p"].to_numpy()
        pr = t["pr"].to_numpy()
        s = t["s"].to_numpy()
        order = np.lexsort((s, pr, p))
        ps, prs, ss = p[order], pr[order], s[order]
        starts = np.flatnonzero(np.r_[True, ps[1:] != ps[:-1]])
        return pa.table({"p": pa.array(ps[starts].astype(np.int64)),
                         "pr": pa.array(prs[starts].astype(np.int64)),
                         "s": pa.array(ss[starts].astype(np.int64))})

    def partial(t: pa.Table) -> pa.Table:
        from timberjack_ray.functions.util import sorted_member_mask

        pkeys, skeys = fetch_broadcast(ref)
        p = t["l_partkey"].to_numpy(zero_copy_only=False)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False)
        m = sorted_member_mask(pkeys, p) & sorted_member_mask(skeys, s)
        pr = _scale100(t["l_extendedprice"]
                       .to_numpy(zero_copy_only=False))
        return argmin_fold([pa.table({"p": pa.array(p[m]),
                                      "pr": pa.array(pr[m]),
                                      "s": pa.array(s[m])})])

    # driver fold with re-compaction every 64 partials so memory stays
    # O(|size-25 parts|), not O(batches × parts) (r03 session review)
    pending: list[pa.Table] = []
    for b in _rp(sf_dir, "lineitem",
                 columns=["l_partkey", "l_suppkey", "l_extendedprice"]) \
            .map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows:
            pending.append(b)
        if len(pending) >= 64:
            pending = [argmin_fold(pending)]
    if not pending:
        return pd.DataFrame({"p_partkey": pd.Series([], dtype="int64"),
                             "price_scaled": pd.Series([], dtype="int64"),
                             "s_suppkey": pd.Series([], dtype="int64"),
                             "s_name": pd.Series([], dtype="object")})
    t = argmin_fold(pending)
    out = pd.DataFrame({"p_partkey": t["p"].to_numpy(),
                        "price_scaled": t["pr"].to_numpy(),
                        "s_suppkey": t["s"].to_numpy()})
    names = esupp.select(["s_suppkey", "s_name"]).to_pandas()
    out = out.merge(names, on="s_suppkey")
    return out.sort_values("p_partkey").reset_index(drop=True) \
        .astype({"p_partkey": "int64", "price_scaled": "int64",
                 "s_suppkey": "int64"})


def q_tpch_q11(sf_dir: str):
    """TPC-H Q11 shape (important stock; the synth schema has no
    partsupp, so part value is the summed lineitem price cents supplied
    from one region): ASIA-supplied parts worth more than 2× the mean
    part value.  Plan: broadcast region-supplier key set → per-batch
    per-part partial sums → part-bounded merge; the HAVING-vs-global
    threshold is the exact int inequality val·n_parts > 2·total (no
    float mean) applied on the folded table."""
    import pyarrow.parquet as pq
    import ray

    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.util import fetch_broadcast

    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    region = pq.read_table(os.path.join(sf_dir, "region.parquet"))
    asia = region.filter(pc.equal(region["r_name"], "ASIA"))
    nk = nation.filter(pc.is_in(nation["n_regionkey"],
                                value_set=asia["r_regionkey"]))
    supp = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                         columns=["s_suppkey", "s_nationkey"])
    sk = np.sort(supp.filter(pc.is_in(supp["s_nationkey"],
                                      value_set=nk["n_nationkey"]))
                 ["s_suppkey"].to_numpy())
    ref = ray.put(sk)

    def partial(t: pa.Table) -> pa.Table:
        skeys = fetch_broadcast(ref)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False)
        m = np.isin(s, skeys)
        t = t.filter(pa.array(m))
        val = _scale100(t["l_extendedprice"]
                        .to_numpy(zero_copy_only=False))
        g = pa.table({"p": t["l_partkey"], "val": pa.array(val)}) \
            .group_by("p").aggregate([("val", "sum")])
        return g.rename_columns(["p", "val"])

    vals = merge_partials(
        _rp(sf_dir, "lineitem",
            columns=["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow"),
        ["p"], "val").to_pandas()
    v = vals["val"].to_numpy().astype(np.int64)
    # arbitrary-precision objects: v·n and 2·total both overflow int64 at
    # the 100 TB cent scale (r03 session review) — the part count is
    # driver-bounded here, so the object-dtype compare stays cheap
    keep = v.astype(object) * len(v) > 2 * int(v.sum())
    keep = keep.astype(bool)
    out = vals[keep].rename(columns={"p": "p_partkey",
                                     "val": "value_scaled"})
    return out.sort_values(["value_scaled", "p_partkey"],
                           ascending=[False, True]) \
        .reset_index(drop=True) \
        .astype({"p_partkey": "int64", "value_scaled": "int64"})


def q_pps_sample_docs(sf_dir: str):
    """Systematic PPS document sampling (functions/corpus.pps_sample):
    per source, keep docs whose char-weight interval crosses a 7 000-char
    step boundary in deterministic scrambled-hash order — weighted
    importance sampling with P(keep) ≈ n_chars/step, exact ints, SQL
    window replay."""
    from timberjack_ray.functions.corpus import pps_sample

    ds = _rp(sf_dir, "documents", columns=["source", "doc_id", "n_chars"])
    out = pps_sample(ds, "source", "n_chars", "doc_id", step=7_000) \
        .to_pandas()
    return out.sort_values(["source", "doc_id"]).reset_index(drop=True) \
        .astype({"doc_id": "int64", "n_chars": "int64"})


def q_balanced_shards(sf_dir: str):
    """Balanced shard planning (functions/corpus.balanced_shards): global
    (n_chars DESC, doc_id) rank mod 16 stripes documents into 16
    near-equal-byte output shards without a global sort; the query
    returns the per-shard (n_docs, total_chars) plan the writer would
    consume — 16-row merge."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.corpus import balanced_shards

    ds = _rp(sf_dir, "documents", columns=["doc_id", "n_chars"])
    asg = balanced_shards(ds, "n_chars", "doc_id", k=16)

    def agg(t: pa.Table) -> pa.Table:
        g = t.group_by("shard").aggregate([("n_chars", "sum"),
                                           ([], "count_all")])
        return g.rename_columns(["shard", "total_chars", "n_docs"])

    out = merge_partials(asg.map_batches(agg, batch_format="pyarrow"),
                         ["shard"], ["total_chars", "n_docs"]).to_pandas()
    return out[["shard", "n_docs", "total_chars"]].sort_values("shard") \
        .reset_index(drop=True) \
        .astype({"shard": "int64", "n_docs": "int64",
                 "total_chars": "int64"})


def q_embedding_top_pc(sf_dir: str):
    """Top principal component of the embedding corpus (functions/
    similarity.top_principal_component): distributed Gram partials +
    driver power iteration — the mode-collapse / drift diagnostic.
    Rows-only (float reduction; pinned vs numpy.linalg.eigh in
    tests/test_functions.py)."""
    from timberjack_ray.functions.similarity import top_principal_component

    ds = _rp(sf_dir, "embeddings", columns=["embedding"])
    lam, v, n = top_principal_component(ds)
    return pd.DataFrame({"component": np.arange(len(v), dtype=np.int64),
                         "loading": v,
                         "eigenvalue": np.full(len(v), lam),
                         "n_rows": np.full(len(v), n, dtype=np.int64)})


def q_ngram_novelty(sf_dir: str):
    """Per-doc n-gram novelty (functions/dedup.ngram_novelty): exact
    (n_grams, n_novel) counts of distinct word-3-grams first seen in this
    doc — the original-content curation signal."""
    from timberjack_ray.functions.dedup import ngram_novelty

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = ngram_novelty(ds, k=3).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "n_grams": "int64",
                 "n_novel": "int64"})


def q_curation_pipeline_v3(sf_dir: str):
    """End-to-end curation over the SESSION-4 operator family, every
    stage exact and SQL-replayable: train split → keep-BEST normalized
    dedup (max n_chars, min id) → benchmark decontamination → per-source
    systematic PPS sampling (step 2000) → balanced shard plan (k=8).
    Survivor ids rejoin their payload through the GRACE bucket join (no
    corpus-sized broadcast); the result is the 8-row shard plan."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.corpus import balanced_shards, pps_sample
    from timberjack_ray.functions.dedup import (decontaminate,
                                                exact_dedup_keep_best)
    from timberjack_ray.functions.relational import bucket_hash_join

    ds = _rp(sf_dir, "documents",
             columns=["doc_id", "source", "text", "n_chars"])

    def side(keep_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            m = (t["doc_id"].to_numpy(zero_copy_only=False) % 97) == 0
            return t.filter(pa.array(m if keep_bench else ~m))
        return ds.map_batches(f, batch_format="pyarrow")

    def norm_key(t: pa.Table) -> pa.Array:
        x = pc.utf8_lower(t["text"])
        x = pc.replace_substring_regex(x, "[^a-z0-9 ]+", " ")
        x = pc.replace_substring_regex(x, " +", " ")
        return pc.utf8_trim_whitespace(x)

    best = exact_dedup_keep_best(side(False), norm_key, "n_chars") \
        .map_batches(lambda t: t.select(["doc_id"]),
                     batch_format="pyarrow")
    survivors = bucket_hash_join(
        side(False), best.map_batches(
            lambda t: t.rename_columns(["surv_id"]),
            batch_format="pyarrow"),
        "doc_id", "surv_id", ["source", "text", "n_chars"], [])
    clean = decontaminate(survivors, side(True), col="text",
                          id_col="doc_id", k=3)
    sampled = pps_sample(
        clean.map_batches(lambda t: t.select(
            ["source", "doc_id", "n_chars"]), batch_format="pyarrow"),
        "source", "n_chars", "doc_id", step=2_000)
    shards = balanced_shards(sampled, "n_chars", "doc_id", k=8)

    def agg(t: pa.Table) -> pa.Table:
        g = t.group_by("shard").aggregate([("n_chars", "sum"),
                                           ([], "count_all")])
        return g.rename_columns(["shard", "total_chars", "n_docs"])

    out = merge_partials(shards.map_batches(agg, batch_format="pyarrow"),
                         ["shard"], ["total_chars", "n_docs"]).to_pandas()
    return out[["shard", "n_docs", "total_chars"]].sort_values("shard") \
        .reset_index(drop=True) \
        .astype({"shard": "int64", "n_docs": "int64",
                 "total_chars": "int64"})


def q_stream_dedup_docs(sf_dir: str):
    """STREAMING exact dedup (state/dedup_index.StreamingDeduper): docs
    arrive in doc_id order as micro-batches and each batch is filtered
    against the sharded first-seen actor index before flowing on — the
    ingest-time dedup a batch groupby cannot express.  Deterministic
    arrival order ⇒ first-seen = min doc_id, which the SQL oracle
    replays."""
    from timberjack_ray.state.dedup_index import StreamingDeduper

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"]) \
        .sort("doc_id")
    kept = []
    with StreamingDeduper(n_shards=8) as d:
        for b in ds.iter_batches(batch_size=256, batch_format="pyarrow"):
            fresh = d.filter_batch(b, col="text")
            if fresh.num_rows:
                kept.append(fresh.select(["doc_id"]))
    if not kept:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64")})
    out = pa.concat_tables(kept).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64"})


def q_stream_near_dup_pairs(sf_dir: str):
    """STREAMING near-dup detection (state/lsh_index.StreamingNearDup):
    docs arrive in doc_id order; each batch is probed against the
    sharded LSH band index and verified pairs (new vs anything seen
    earlier) stream out.  Docs with doc_id % 101 == 0 get a planted
    near-copy at id+10¹² (safely above any real id) injected into the
    NEXT batch, so the cross-batch probe-and-fetch path has ground truth
    at any sf — rows-only (no SQL; planted-pair pytest evidence in
    `tests/test_state.py`)."""
    from timberjack_ray.state.lsh_index import StreamingNearDup

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"]) \
        .sort("doc_id")

    def make_plants(t: pa.Table) -> pa.Table | None:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        m = ids % 101 == 0
        if not m.any():
            return None
        plant = t.filter(pa.array(m))
        s = plant["text"].to_pandas()
        txt = s.str.rsplit(" ", n=1).str[0] + " planted"
        return pa.table({"doc_id": pa.array(
            plant["doc_id"].to_numpy(zero_copy_only=False)
            + 1_000_000_000_000),
            "text": pa.array(txt)})

    pairs = []
    carry = None  # plants from batch i arrive with batch i+1: CROSS-batch
    with StreamingNearDup(n_shards=8, num_perm=64, bands=16,
                          min_eq=32) as idx:
        for b in ds.iter_batches(batch_size=256, batch_format="pyarrow"):
            feed = pa.concat_tables([carry, b]) if carry is not None                 else b
            p = idx.process_batch(feed)
            if len(p):
                pairs.append(p)
            carry = make_plants(b)
        if carry is not None:
            p = idx.process_batch(carry)
            if len(p):
                pairs.append(p)
    if not pairs:
        return pd.DataFrame({"new_id": pd.Series([], dtype="int64"),
                             "seen_id": pd.Series([], dtype="int64"),
                             "n_eq": pd.Series([], dtype="int64")})
    return pd.concat(pairs).sort_values(["new_id", "seen_id"]) \
        .reset_index(drop=True)


def q_stream_quota_admit(sf_dir: str):
    """Streaming per-source quota admission (state/quota.QuotaAdmitter):
    docs arrive in doc_id order; each source admits docs until its
    2 000-char budget is spent (inclusive, docs never split).  Arrival
    order is deterministic, so the cut replays as a SQL inclusive
    running-sum window."""
    from timberjack_ray.state.quota import QuotaAdmitter

    ds = _rp(sf_dir, "documents",
             columns=["doc_id", "source", "n_chars"]).sort("doc_id")
    kept = []
    with QuotaAdmitter(budget=2_000, n_shards=4) as q:
        for b in ds.iter_batches(batch_size=256, batch_format="pyarrow"):
            fresh = q.filter_batch(b, "source", "n_chars")
            if fresh.num_rows:
                kept.append(fresh)
    if not kept:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "source": pd.Series([], dtype="object"),
                             "n_chars": pd.Series([], dtype="int64")})
    out = pa.concat_tables(kept).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "n_chars": "int64"})


def q_stream_rate_limit(sf_dir: str):
    """Streaming windowed rate limiter (state/rate_limit.RateLimiter):
    events arrive in (ts, id) order; each (user, DAY) admits its first
    2 events and drops the flood (~30% of this corpus) — per-key state
    resets every window so shard memory is one live counter per key at
    any stream length.  Deterministic arrival order makes the admission
    SQL-replayable (ROW_NUMBER per (user, day) ≤ 2); admitted counts
    per type."""
    from timberjack_ray.state.rate_limit import RateLimiter

    ds = _rp(sf_dir, "events",
             columns=["event_id", "user_id", "ts", "event_type"]) \
        .sort(["ts", "event_id"])
    counts: dict[str, int] = {}
    with RateLimiter(k=2, window_s=86_400, n_shards=4) as rl:
        for b in ds.iter_batches(batch_size=512, batch_format="pyarrow"):
            kept = rl.filter_batch(b, "user_id", "ts")
            if kept.num_rows:
                g = kept.group_by("event_type").aggregate([([], "count_all")])
                for ty, n in zip(g["event_type"].to_pylist(),
                                 g["count_all"].to_pylist()):
                    counts[ty] = counts.get(ty, 0) + int(n)
    return pd.DataFrame(sorted(counts.items()),
                        columns=["event_type", "n"]).astype({"n": "int64"})


def q_dedup_keep_best_docs(sf_dir: str):
    """Normalization-level dedup keeping the BEST copy (functions/dedup
    .exact_dedup_keep_best): groups = C4-normalized text, survivor = max
    n_chars then min doc_id — the RefinedWeb "retain the richest
    duplicate" policy, resolved by a single packed-integer Max groupby."""
    from timberjack_ray.functions.dedup import exact_dedup_keep_best

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def norm_key(t: pa.Table) -> pa.Array:
        x = pc.utf8_lower(t["text"])
        x = pc.replace_substring_regex(x, "[^a-z0-9 ]+", " ")
        x = pc.replace_substring_regex(x, " +", " ")
        return pc.utf8_trim_whitespace(x)

    out = exact_dedup_keep_best(ds, norm_key, "n_chars").to_pandas()
    return out[["doc_id"]].sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64"})


def q_curation_kill_reasons(sf_dir: str):
    """Curation-stage audit (functions/dedup.curation_kill_reasons):
    per-reason kill counts with first-match-wins priority short →
    exact_dup → contaminated → kept, over the same train/bench split as
    ``decontaminate_docs``."""
    from timberjack_ray.functions.dedup import curation_kill_reasons

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def side(keep_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            m = (t["doc_id"].to_numpy(zero_copy_only=False) % 97) == 0
            return t.filter(pa.array(m if keep_bench else ~m))
        return ds.map_batches(f, batch_format="pyarrow")

    return curation_kill_reasons(side(False), side(True), min_words=5,
                                 k=3)


def q_continuation_topk(sf_dir: str):
    """Kneser-Ney continuation counts (functions/corpus
    .continuation_topk): top-15 words by distinct-left-context count —
    the LM-smoothing statistic that separates versatile words from
    collocation-bound ones."""
    from timberjack_ray.functions.corpus import continuation_topk

    ds = _rp(sf_dir, "documents", columns=["text"])
    return continuation_topk(ds, k=15)


def q_mixture_schedule(sf_dir: str):
    """Stride-scheduled mixture interleave (functions/corpus
    .mixture_schedule): source weight = (source index mod 4) + 1, so the
    schedule key pos·(12/w) interleaves heavier sources proportionally
    more often — the deterministic training-stream ordering step."""
    from timberjack_ray.functions.corpus import mixture_schedule

    ds = _rp(sf_dir, "documents", columns=["source", "doc_id"])
    srcs = sorted(set(
        ds.select_columns(["source"]).unique("source")))
    weights = {s: (int(s[3:]) % 4) + 1 for s in srcs}
    # base=12 = lcm of the weight DOMAIN {1,2,3,4}, pinned so the oracle's
    # hard-coded 12//w stride stays exact even when a fixture's sources
    # don't exercise every residue (r03 session review)
    out = mixture_schedule(ds, "source", "doc_id", weights,
                           base=12).to_pandas()
    return out.sort_values(["sched_key", "source", "doc_id"]) \
        .reset_index(drop=True) \
        .astype({"doc_id": "int64", "sched_key": "int64"})


def q_selfjoin_size_by_type(sf_dir: str):
    """Exact per-type self-join size F2 = Σ_user count(type,user)² — the
    quantity a join planner needs to cost a self-join / skew-detect a key.
    Plan: per-batch (type, user) count partials → guarded driver fold
    (volume = distinct pairs; degrades to distributed groupby past the
    limit) → per-type Σ c².  The unbounded-cardinality scale path is the
    mergeable AMS sketch (`selfjoin_size_ams`)."""
    from timberjack_ray.aggregates import merge_partials_or_ds

    ds = _rp(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "user_id"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["event_type", "user_id", "n"])

    folded, mode = merge_partials_or_ds(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "user_id"], ["n"])
    if mode == "distributed":  # pragma: no cover - small data stays driver
        from timberjack_ray.aggregates import merge_partials

        def sq(t: pa.Table) -> pa.Table:
            # post-groupby: each (type, user) appears once globally, so a
            # per-batch Σn² partial per type merges exactly
            t = t.append_column("n2", pc.multiply(t["n"], t["n"]))
            return t.group_by("event_type").aggregate([("n2", "sum")]) \
                .rename_columns(["event_type", "selfjoin_size"])

        out = merge_partials(folded.map_batches(sq, batch_format="pyarrow"),
                             ["event_type"], "selfjoin_size").to_pandas()
    else:
        df = folded.to_pandas()
        df["n2"] = df["n"].astype("int64") ** 2
        out = df.groupby("event_type", as_index=False)["n2"].sum() \
            .rename(columns={"n2": "selfjoin_size"})
    return out.sort_values("event_type").reset_index(drop=True) \
        .astype({"selfjoin_size": "int64"})


def q_selfjoin_size_ams(sf_dir: str):
    """AMS tug-of-war F2 estimate per type — the fixed-size mergeable
    companion to `selfjoin_size_by_type`: per-batch traffic is
    groups×per_group ints per type regardless of user cardinality.
    ORACLE-CHECKED since round 5 (was rows-only): runs the splitmix64
    sign chain its twin `ams_f2_checked` pins bit-for-bit, and emits the
    median-of-means ESTIMATE as an exact integer — with 9 groups the
    median of the per-group means Σs²/24 is the MIDDLE group's sum
    divided by the shared 24, so ``f2_est24 = 24·F2_est`` is the 5th
    smallest s2_sum, pure ints end to end (SQL: quantile_disc 0.5).
    Approximate vs the TRUE F2 by design (tolerance in
    tests/test_functions.py)."""
    per = q_ams_f2_checked(sf_dir)
    med = per.sort_values(["event_type", "s2_sum"]) \
        .groupby("event_type")["s2_sum"] \
        .apply(lambda s: int(s.iloc[(len(s) - 1) // 2])) \
        .reset_index(name="f2_est24")
    return med.sort_values("event_type").reset_index(drop=True) \
        .astype({"f2_est24": "int64"})


def q_source_skew_stats(sf_dir: str):
    """Partition-skew diagnostics over the route key (source): integer
    Gini components of the per-source row distribution — the signal the
    flagship's salted-partition pre-pass acts on.  All-integer output
    (n_sources, total_rows, max_rows, weighted_rank_sum with ranks
    ascending by count; Gini = (2·wrs − (n+1)·total) / (n·total)) so the
    oracle hash is exact — ties in count are rank-order-invariant since
    tied values contribute equally under any permutation."""
    from timberjack_ray.aggregates import merge_partials

    ds = _rp(sf_dir, "documents", columns=["source"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("source").aggregate([([], "count_all")])
        return g.rename_columns(["source", "n"])

    t = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                       ["source"], "n")
    n = np.sort(t["n"].to_numpy(zero_copy_only=False).astype(np.int64))
    wrs = int((np.arange(1, len(n) + 1, dtype=np.int64) * n).sum())
    return pd.DataFrame({"n_sources": [len(n)],
                         "total_rows": [int(n.sum())],
                         "max_rows": [int(n[-1]) if len(n) else 0],
                         "weighted_rank_sum": [wrs]}).astype("int64")


def q_stream_chunk_novelty(sf_dir: str):
    """STREAMING chunk-level novelty accounting (state/cdc_index.
    StreamingChunkDeduper): docs arrive in doc_id order; each batch is
    CDC-chunked and probed against the sharded first-seen chunk index,
    reporting per-source chars genuinely new vs already-stored — the
    incremental-crawl storage planner exact doc-hash dedup cannot give
    (edited re-crawls share most chunks).  The probes run INSIDE
    map_batches tasks holding the shard actor handles (ChunkNoveltyStage
    — VERDICT r3 #2): text never crosses the driver, only per-source
    partials fold.  Rows-only: gear-hash chunking is not SQL-replayable;
    planted exact/edited re-crawl truth is pinned in tests/test_state.py."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.state.cdc_index import (ChunkNoveltyStage,
                                                StreamingChunkDeduper)

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "source"]) \
        .sort("doc_id")
    with StreamingChunkDeduper(n_shards=8) as d:
        parts = ds.map_batches(
            ChunkNoveltyStage,
            fn_constructor_kwargs=dict(shards=d.shards,
                                       cdc_params=d.cdc_params),
            # autoscaling pool (min 1): the 8 shard actors hold 2.0 CPUs,
            # so a FIXED pool of 4 can never schedule at num_cpus=4 and
            # Ray Data waits forever (found as a pytest-session deadlock)
            batch_format="pyarrow", batch_size=256, concurrency=(1, 4))
        out = merge_partials(parts, ["source"],
                             ["n_chunks", "new_chars", "dup_chars"]) \
            .to_pandas()
    return out.sort_values("source").reset_index(drop=True) \
        .astype({"n_chunks": "int64", "new_chars": "int64",
                 "dup_chars": "int64"})


def q_approx_actor_overlap(sf_dir: str):
    """HLL set algebra: |users|, |customers|, |union| from register-max
    merges and |intersect| by inclusion–exclusion — the cross-corpus
    overlap planner at any cardinality (state = 3 × 2^p bytes).
    ORACLE-CHECKED since round 5 (was rows-only): both sides sketch over
    splitmix64 of the INTEGER ids (the chain hll_register_hist already
    replays), the union is the per-index register max — exact sketch
    algebra SQL reproduces with a UNION ALL + MAX — and all three
    estimates use the IEEE-deterministic milli-floor estimator
    (sketch.hll_estimate_milli); the intersection is then pure integer
    arithmetic on the three milli values.  Approximate vs the TRUE
    cardinalities by design (tolerance in tests/test_sketch.py; exact
    companions actor_ids_union / actor_ids_intersect)."""
    from timberjack_ray.functions.sketch import (HyperLogLog,
                                                 hll_estimate_milli,
                                                 hll_over)

    P = 14
    ha = hll_over(_rp(sf_dir, "events", columns=["user_id"]),
                  "user_id", p=P, hasher=_splitmix_col)
    hb = hll_over(_rp(sf_dir, "orders", columns=["o_custkey"]),
                  "o_custkey", p=P, hasher=_splitmix_col)
    union = HyperLogLog(P)
    union.merge_registers(ha.registers)
    union.merge_registers(hb.registers)
    a_m = hll_estimate_milli(ha.registers)
    b_m = hll_estimate_milli(hb.registers)
    u_m = hll_estimate_milli(union.registers)
    return pd.DataFrame({
        "card_a_milli": np.array([a_m], np.int64),
        "card_b_milli": np.array([b_m], np.int64),
        "card_union_milli": np.array([u_m], np.int64),
        "card_intersect_milli": np.array([max(0, a_m + b_m - u_m)],
                                         np.int64)})


def q_value_trend_components(sf_dir: str):
    """Per-type OLS trend of value over time as EXACT integer moment
    components (n, Σx, Σy, Σxy, Σx²) with x = hours since 2024-01-01 and
    y = cents — the distributed least-squares slope
    (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) with the float division left to the
    consumer so the gate hash stays integer-exact.  Plan: per-batch moment
    partials → type-count-sized merge; nothing shuffles.  Domain bound:
    int64-exact while n·max(x)²·max(y) < 2⁶³ — at larger spans re-center x
    per shard and combine with the parallel-axis rule."""
    from timberjack_ray.aggregates import merge_partials

    ds = _rp(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        sec = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False) \
            // 1_000_000
        x = (sec - 1704067200) // 3600
        y = _scale100(t["value"].to_numpy(zero_copy_only=False))
        g = pa.table({"event_type": t["event_type"],
                      "n": pa.array(np.ones(len(x), np.int64)),
                      "sum_x": pa.array(x), "sum_y": pa.array(y),
                      "sum_xy": pa.array(x * y),
                      "sum_xx": pa.array(x * x)}) \
            .group_by("event_type").aggregate(
                [("n", "sum"), ("sum_x", "sum"), ("sum_y", "sum"),
                 ("sum_xy", "sum"), ("sum_xx", "sum")])
        return g.rename_columns(["event_type", "n", "sum_x", "sum_y",
                                 "sum_xy", "sum_xx"])

    out = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                         ["event_type"],
                         ["n", "sum_x", "sum_y", "sum_xy", "sum_xx"]) \
        .to_pandas()
    return out.sort_values("event_type").reset_index(drop=True) \
        .astype({c: "int64" for c in ["n", "sum_x", "sum_y", "sum_xy",
                                      "sum_xx"]})


def q_multiline_stitch(sf_dir: str):
    """Multiline log stitching (functions/window.multiline_stitch_stats):
    lines failing the start rule (here the deterministic marker
    event_id % 7 >= 4) glue to the nearest earlier start line — the
    stack-trace / wrapped-payload repair every log engine needs.  Scan
    decomposition: per-batch interior partials + one boundary row,
    O(#blocks) driver chain; relies on read order = event_id order
    (documented in the function)."""
    from timberjack_ray.functions.window import multiline_stitch_stats

    ds = _rp(sf_dir, "events", columns=["event_id", "event_type"])

    def mark(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        return t.append_column("is_start", pa.array(eid % 7 < 4))

    return multiline_stitch_stats(ds.map_batches(mark,
                                                 batch_format="pyarrow"),
                                  "event_id", "event_type", "is_start")


def q_cdc_dedup_stats(sf_dir: str):
    """Content-defined-chunking dedup potential (functions/corpus.
    cdc_chunk_batch → cdc_dedup_stats): windowed-Gear boundaries, greedy
    min/max clamps, per-chunk polynomial hashes, guarded (hash, len)
    fold.  Rows-only (a rolling-hash chunker isn't SQL-replayable);
    boundary-resync, partition and batch-invariance properties are pinned
    in tests/test_functions.py."""
    from timberjack_ray.functions.corpus import cdc_dedup_stats

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return cdc_dedup_stats(ds).astype("int64")


def q_orders_skyline(sf_dir: str):
    """2-D Pareto skyline (functions/relational.pareto_skyline): orders
    no other order beats on BOTH price (maximize, cents) and order date
    (minimize, epoch µs) — the maximal-vector operator.  Skyline
    distributes over union, so each batch reduces to its local skyline
    and the driver re-scans the concatenation (guarded)."""
    from timberjack_ray.functions.relational import pareto_skyline

    ds = _rp(sf_dir, "orders", columns=["o_totalprice", "o_orderdate"])
    return pareto_skyline(ds, "o_totalprice", "o_orderdate", scale_max=100)


def q_value_quantiles_bisect(sf_dir: str):
    """Exact quantiles by DISTRIBUTED SELECTION (functions/sessions.
    exact_quantile_bisect): iterative pivot-bracket narrowing — each pass
    one streaming searchsorted-bincount against ≤255 pivots, bracket
    closes ×254 per pass, so exactness holds at ANY value cardinality
    with O(pivots) driver state (the unbounded-domain tier the histogram
    fold can't serve)."""
    from timberjack_ray.functions.sessions import exact_quantile_bisect

    ds = _rp(sf_dir, "events", columns=["value"])
    out = exact_quantile_bisect(ds, "value", [0.25, 0.5, 0.9], scale=100)
    return out.astype({"value_scaled": "int64"})


def q_semantic_dedup_stats(sf_dir: str):
    """SemDeDup over the embeddings table (functions/similarity.
    semantic_dedup): spherical k-means clusters + exact in-cluster
    cosine dup groups, min-id survivors.  Returns per-cluster
    (n_rows, n_kept) counts.  Rows-only: cluster assignment depends on
    float k-means; the dedup CONTRACT (planted copies dropped,
    transitive chains collapse) is pinned in tests/test_functions.py."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.similarity import semantic_dedup

    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = semantic_dedup(ds, threshold=0.95, n_centroids=16)

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        g = t.group_by(["cluster"]).aggregate(
            [([], "count_all"), ("keep", "sum")])
        g = g.rename_columns(["cluster", "n_rows", "n_kept"])
        return g.set_column(2, "n_kept", pc2.cast(g["n_kept"], pa.int64()))

    folded = merge_partials(out.map_batches(partial, batch_format="pyarrow"),
                            ["cluster"], ["n_rows", "n_kept"])
    return folded.to_pandas().sort_values("cluster") \
        .reset_index(drop=True) \
        .astype({"cluster": "int64", "n_rows": "int64", "n_kept": "int64"})


def q_bm25_docs(sf_dir: str):
    """Okapi BM25 top-10 retrieval (functions/text.bm25_topk) for a fixed
    query over the documents table: two passes both bounded by |query
    terms| (per-term df fold, then broadcast-(idf, avgdl) scoring with
    per-batch top-k prune).  ORACLE-CHECKED since round 5 (was
    rows-only): idf uses libm log (bit-identical to DuckDB ln), the
    scorer sums term contributions in sorted-term order and the SQL
    replay adds the three pivoted term columns in the same fixed order,
    so the doubles match bit-for-bit and the milli-scaled floor is
    hash-stable.  Emits (doc_id, score_milli, rank)."""
    from timberjack_ray.functions.text import bm25_topk

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    out = bm25_topk(ds, "hash join filter", k=10)
    out = out.reset_index(drop=True)
    out["score_milli"] = np.floor(
        out["score"].to_numpy() * 1000.0).astype(np.int64)
    out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
    return out[["doc_id", "score_milli", "rank"]].astype({"doc_id": "int64"})


def q_order_gap_quantiles(sf_dir: str):
    """Inter-order gap distribution (round 4): exact type-1 quantiles of
    per-customer consecutive-order gaps in whole days — the re-purchase
    cadence statistic.  ONE custkey-bucket exchange; per bucket a
    lexsort + segment-masked diff emits a (gap_days, n) HISTOGRAM
    partial, the merge is gap-domain-bounded, and the driver does the
    cumulative type-1 walk (the exact_quantiles rule)."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.corpus import add_key_bucket

    DAY = 86_400_000_000

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"c": t["o_custkey"],
                         "d": pc.cast(t["o_orderdate"], pa.int64()),
                         "k": t["o_orderkey"]})

    def per_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({"gap_days": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows < 2:
            return empty
        c = t["c"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        k = t["k"].to_numpy(zero_copy_only=False)
        order = np.lexsort((k, d, c))
        cs, ds_ = c[order], d[order]
        same = cs[1:] == cs[:-1]
        gaps = ((ds_[1:] - ds_[:-1]) // DAY)[same]
        if not len(gaps):
            return empty
        v, n = np.unique(gaps, return_counts=True)
        return pa.table({"gap_days": pa.array(v.astype(np.int64)),
                         "n": pa.array(n.astype(np.int64))})

    ds = _rp(sf_dir, "orders",
             columns=["o_custkey", "o_orderdate", "o_orderkey"]) \
        .map_batches(prep, batch_format="pyarrow")
    bucketed = add_key_bucket(ds, "c", 64)
    p = bucketed.groupby("__kb").map_groups(
        lambda t: per_bucket(t.drop_columns(["__kb"])),
        batch_format="pyarrow")
    hist = merge_partials(p, ["gap_days"], "n").to_pandas() \
        .sort_values("gap_days").reset_index(drop=True)
    if not len(hist):  # no customer has two orders at this scale
        return pd.DataFrame({"q": pd.Series([], dtype="float64"),
                             "gap_days": pd.Series([], dtype="int64")})
    total = int(hist["n"].sum())
    cum = hist["n"].cumsum().to_numpy()
    qs = [0.25, 0.5, 0.75, 0.9]
    vals = [int(hist["gap_days"].iloc[
        int(np.searchsorted(cum, max(1, int(np.ceil(q * total)))))])
        for q in qs]
    return pd.DataFrame({"q": qs, "gap_days": vals}) \
        .astype({"gap_days": "int64"})


def q_events_csv_roundtrip(sf_dir: str):
    """CSV source-format leg (round 4): the events table exported once
    per sf to sharded CSV (scaffolding, cached in /dev/shm), read back
    through ``ray.data.read_csv``, then per-type exact (count, cent-sum)
    partials — hash-checked against the parquet oracle, proving the CSV
    reader path (typed float parse included: CSV writes shortest-
    round-trip doubles, so cents survive exactly) end to end."""
    import glob as _glob
    import hashlib

    import pyarrow.csv as pcsv
    import pyarrow.parquet as pq
    import ray.data as rd

    from timberjack_ray.aggregates import merge_partials

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out = f"/dev/shm/tj_csv_{tag}"
    if not os.path.exists(f"{out}/_done"):
        os.makedirs(out, exist_ok=True)
        t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                          columns=["event_type", "value"])
        n, k = t.num_rows, 4
        for i in range(k):
            lo = i * n // k
            pcsv.write_csv(t.slice(lo, (i + 1) * n // k - lo),
                           f"{out}/part-{i}.csv")
        with open(f"{out}/_done", "w") as f:
            f.write("ok")
    ds = rd.read_csv(sorted(_glob.glob(f"{out}/part-*.csv")))

    def partial(t: pa.Table) -> pa.Table:
        from timberjack_ray.functions.util import scale_to_int

        g = pa.table({"event_type": t["event_type"],
                      "cents": scale_to_int(t["value"], 100)}) \
            .group_by("event_type").aggregate(
                [([], "count_all"), ("cents", "sum")])
        return g.rename_columns(["event_type", "n", "cents"])

    outdf = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                           ["event_type"], ["n", "cents"]).to_pandas()
    return outdf.sort_values("event_type").reset_index(drop=True) \
        .astype({"n": "int64", "cents": "int64"})


def q_user_decayed_value(sf_dir: str):
    """Per-user exponentially-decayed activity score (functions/sessions.
    grouped_decayed_sum): 16-term truncated EWMA over cents, exact int64
    — the decayed-feature transform, bit-identical to a 16-LAG SQL
    window.  One key-bucket exchange; W−1 segment-masked shifted adds
    per bucket; row-volume output streams."""
    from timberjack_ray.functions.sessions import grouped_decayed_sum

    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])
    out = grouped_decayed_sum(ds, "user_id", "ts", "event_id", "value") \
        .to_pandas()
    return out.sort_values("event_id").reset_index(drop=True) \
        .astype({"event_id": "int64", "decayed": "int64"})


def q_stream_heavy_hitters(sf_dir: str):
    """STREAMING running top-K words (state/topk_index.StreamingTopK):
    document batches arrive in doc_id order, each batch's words fold to
    exact distinct counts and merge into sharded Misra-Gries summaries —
    the "what's exploding right now" monitor over an open stream, with
    ≤ k·shards slots of state at ANY vocabulary.  Rows-only: MG lower
    bounds depend on batch boundaries; the guarantee band (true−err ≤
    n_lo ≤ true, heavy keys always present) is pinned in
    tests/test_state.py and re-checked here against the exact corpus
    counts."""
    import pyarrow.compute as pc2

    from timberjack_ray.state.topk_index import StreamingTopK

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"]).sort("doc_id")
    with StreamingTopK(n_shards=8, k_per_shard=64) as hh:
        for b in ds.iter_batches(batch_size=256, batch_format="pyarrow"):
            hh.add_keys(pc2.list_flatten(pc2.split_pattern(b["text"], " ")))
        top = hh.topk(10)
    return top


def q_dsir_scores(sf_dir: str):
    """DSIR importance-resampling weights (functions/text.dsir_weights):
    hashed-unigram target (lang='en') vs raw log-ratio models, one count
    pass + one broadcast-gather scoring pass; returns the 20 most
    target-like docs (logw desc, doc_id asc).  ORACLE-CHECKED since
    round 5 (was rows-only): the feature hash is now the codepoint-
    Horner fold mod 2^16 (the SQL-replayable family shared with the
    MinHash oracles), so the bucket counts and log-ratio weights replay
    in DuckDB; per-doc sums differ only by float addition order (≤ a few
    ULPs), which the milli-scaled floor absorbs.  Emits (doc_id,
    n_words, logw_milli)."""
    from timberjack_ray.functions.relational import sorted_topk

    from timberjack_ray.functions.text import dsir_weights

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    scored = dsir_weights(ds, "lang", "en")
    out = sorted_topk(scored, ["logw", "doc_id"], 20,
                      descending=[True, False]).reset_index(drop=True)
    out["logw_milli"] = np.floor(
        out["logw"].to_numpy() * 1000.0).astype(np.int64)
    return out[["doc_id", "n_words", "logw_milli"]] \
        .astype({"doc_id": "int64", "n_words": "int64"})


def q_part_triangles(sf_dir: str):
    """Exact triangle census of the part CO-PURCHASE graph (parts are
    vertices, adjacent iff one order contains both): n_nodes / n_edges /
    n_wedges / n_triangles as exact ints — the global clustering
    coefficient is the consumer's 3·tri/wedges.  Plan
    (functions/graph.cooccurrence_triangles): per-batch distinct
    (order, part) → ONE order-bucket exchange → segmented d-offset pair
    expansion (fan-out bounded by order size) → guarded distinct-edge
    fold → degree-ORIENTED wedge probe (O(E^1.5) vectorized on the
    driver under the limit; distributed wedge-vs-edge GRACE join past
    it, equality-tested in tests/test_graph.py)."""
    from timberjack_ray.functions.graph import cooccurrence_triangles

    ds = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    return cooccurrence_triangles(ds, "l_orderkey", "l_partkey")


def q_rolling_7d_active_users(sf_dir: str):
    """Sliding-window DISTINCT (round 4): for every active day, how many
    users had >=1 event in the trailing 7 days.  Exact, ONE user-bucket
    exchange: each batch ships only locally-deduped (user, day) int
    pairs; bucketing by user co-locates all of a user's days, so the
    7-day coverage expansion and the (user, covered_day) dedup both run
    inside the bucket task, and only (day, n, real) partials — bounded
    by the calendar domain — merge on the driver.  Days with zero events
    are not emitted (the SQL active-day join semantics)."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.corpus import add_key_bucket

    DAY = 86_400_000_000
    WIN = 7
    empty = pa.table({"day": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64()),
                      "real": pa.array([], pa.int64())})

    def pairs_batch(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        d = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False) \
            // DAY
        pr = np.unique(np.stack([u, d], axis=1), axis=0)
        return pa.table({"u": pa.array(pr[:, 0].astype(np.int64)),
                         "d": pa.array(pr[:, 1].astype(np.int64))})

    def per_bucket(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return empty
        u = t["u"].to_numpy(zero_copy_only=False)
        d = t["d"].to_numpy(zero_copy_only=False)
        pr = np.unique(np.stack([u, d], axis=1), axis=0)  # cross-batch dedup
        uu, dd = pr[:, 0], pr[:, 1]
        cov_u = np.repeat(uu, WIN)
        cov_d = (dd[:, None] + np.arange(WIN, dtype=np.int64)[None, :]) \
            .ravel()
        cov = np.unique(np.stack([cov_u, cov_d], axis=1), axis=0)
        days, n = np.unique(cov[:, 1], return_counts=True)
        real = np.unique(dd)
        return pa.table({
            "day": pa.array(np.concatenate([days, real]).astype(np.int64)),
            "n": pa.array(np.concatenate(
                [n.astype(np.int64), np.zeros(len(real), np.int64)])),
            "real": pa.array(np.concatenate(
                [np.zeros(len(days), np.int64), np.ones(len(real),
                                                        np.int64)]))})

    ds = _rp(sf_dir, "events", columns=["user_id", "ts"]) \
        .map_batches(pairs_batch, batch_format="pyarrow")
    bucketed = add_key_bucket(ds, "u", 64)
    p = bucketed.groupby("__kb").map_groups(
        lambda t: per_bucket(t.drop_columns(["__kb"])),
        batch_format="pyarrow")
    m = merge_partials(p, ["day"], ["n", "real"]).to_pandas()
    m = m[m["real"] > 0].sort_values("day")[["day", "n"]] \
        .reset_index(drop=True)
    return m.astype({"day": "int64", "n": "int64"})


def q_price_cume_dist(sf_dir: str):
    """Per-ROW percentile rank via a broadcast CDF (round 4) — a plan
    shape no other query uses: pass 1 folds (flag, cents) COUNT-PER-VALUE
    partials (the merge is value-DOMAIN-bounded, the exact_quantiles
    rule, never row-volume); the driver turns them into per-flag sorted
    (values, cumcounts) arrays and broadcasts them once via ``ray.put``;
    pass 2 is a stateless row transform assigning each lineitem its
    tie-inclusive rank ``rank_le`` (rows in its flag with cents ≤ its
    cents) and group size by searchsorted against the shared CDF — the
    exact integer numerator/denominator of SQL's CUME_DIST.  Row-volume
    output streams; no row ever crosses an exchange."""
    import ray

    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.util import scale_to_int

    def hist_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"f": t["l_returnflag"],
                      "cents": scale_to_int(t["l_extendedprice"], 100)}) \
            .group_by(["f", "cents"]).aggregate([([], "count_all")])
        return g.rename_columns(["f", "cents", "n"])

    ds = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_linenumber", "l_returnflag",
                      "l_extendedprice"])
    hist = merge_partials(
        ds.map_batches(hist_partial, batch_format="pyarrow"),
        ["f", "cents"], "n").to_pandas().sort_values(["f", "cents"])
    cdf = {}
    for f, grp in hist.groupby("f"):
        vals = grp["cents"].to_numpy(np.int64)
        cum = grp["n"].to_numpy(np.int64).cumsum()
        cdf[f] = (vals, cum, int(cum[-1]))
    cdf_ref = ray.put(cdf)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cdf_ref)
        flags = t["l_returnflag"].to_numpy(zero_copy_only=False)
        cents = scale_to_int(t["l_extendedprice"], 100).to_numpy()
        rank = np.empty(len(cents), np.int64)
        gn = np.empty(len(cents), np.int64)
        for f, (vals, cum, total) in c.items():
            m = flags == f
            if not m.any():
                continue
            idx = np.searchsorted(vals, cents[m], side="right") - 1
            rank[m] = cum[idx]
            gn[m] = total
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_linenumber": pc.cast(t["l_linenumber"],
                                                 pa.int64()),
                         "l_returnflag": t["l_returnflag"],
                         "cents": pa.array(cents),
                         "rank_le": pa.array(rank),
                         "group_n": pa.array(gn)})

    out = ds.map_batches(assign, batch_format="pyarrow").to_pandas()
    return out.sort_values(["l_orderkey", "l_linenumber"]) \
        .reset_index(drop=True).astype(
            {"l_orderkey": "int64", "l_linenumber": "int64",
             "cents": "int64", "rank_le": "int64", "group_n": "int64"})


def q_tpch_q10_top20(sf_dir: str):
    """TPC-H Q10 shape (round 4): top-20 customers by returned-item
    revenue in one quarter.  lineitem(R) ⋈ orders(window) goes through
    the GRACE bucket join with a per-bucket (custkey, Σrev) partial —
    the join output never materializes row-per-lineitem; the slim
    custkey partials take ONE more bucket exchange where each custkey is
    complete, so per-bucket top-20s are sound partials and the driver
    merge sees ≤ 20 × n_buckets rows.  The 20 winners pick up
    name/nation driver-side from the small dimension tables (broadcast
    semantics, no shuffle)."""
    import pyarrow.parquet as pq

    from timberjack_ray.functions.corpus import add_key_bucket
    from timberjack_ray.functions.relational import bucket_hash_join
    from timberjack_ray.functions.util import scale_to_int

    lo, hi = np.datetime64("1996-01-01"), np.datetime64("1996-04-01")

    def window_orders(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array((d >= lo) & (d < hi))) \
            .select(["o_orderkey", "o_custkey"])

    def returned(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        price = scale_to_int(t["l_extendedprice"], 100).to_numpy()
        disc = scale_to_int(t["l_discount"], 100).to_numpy()
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev": pa.array(price * (100 - disc))})

    def bucket_partial(t: pa.Table) -> pa.Table:
        # orderkeys are co-located here; the custkey sum is NOT complete
        # per bucket (a customer spans orderkey buckets) so this emits a
        # partial, not a top-k
        g = t.group_by("o_custkey").aggregate([("rev", "sum")])
        return g.rename_columns(["o_custkey", "rev"])

    orders = _rp(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(window_orders, batch_format="pyarrow")
    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                      "l_discount"]) \
        .map_batches(returned, batch_format="pyarrow")
    partials = bucket_hash_join(orders, li, "o_orderkey", "l_orderkey",
                                left_cols=["o_custkey"],
                                right_cols=["rev"], n_buckets=32,
                                bucket_fn=bucket_partial)

    def cust_top(t: pa.Table) -> pa.Table:
        # bucketing by custkey makes each customer's sum COMPLETE here
        g = t.group_by("o_custkey").aggregate([("rev", "sum")])
        g = g.rename_columns(["c_custkey", "revenue_scaled"])
        return g.sort_by([("revenue_scaled", "descending"),
                          ("c_custkey", "ascending")]).slice(0, 20)

    tops = add_key_bucket(partials, "o_custkey", 32).groupby("__kb") \
        .map_groups(lambda t: cust_top(t.drop_columns(["__kb"])),
                    batch_format="pyarrow").to_pandas()
    top20 = tops.sort_values(["revenue_scaled", "c_custkey"],
                             ascending=[False, True]).head(20) \
        .reset_index(drop=True)

    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_name", "c_nationkey"]) \
        .to_pandas()
    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"]).to_pandas()
    out = top20.merge(cust, on="c_custkey").merge(
        nat, left_on="c_nationkey", right_on="n_nationkey")
    out = out.sort_values(["revenue_scaled", "c_custkey"],
                          ascending=[False, True]).reset_index(drop=True)
    out["rank"] = np.arange(1, len(out) + 1)
    return out[["c_custkey", "c_name", "n_name", "revenue_scaled",
                "rank"]].astype({"c_custkey": "int64",
                                 "revenue_scaled": "int64",
                                 "rank": "int64"})


def q_events_jsonl_roundtrip(sf_dir: str):
    """JSONL source-format leg (round 4): the events table exported once
    per sf to sharded JSONL (scaffolding, cached in /dev/shm), read back
    through ``ray.data.read_json`` (pyarrow.json block reader), then the
    same per-type exact (count, cent-sum) partials as the CSV leg —
    hash-checked against the parquet oracle, closing the
    parquet/CSV/JSONL source matrix."""
    import glob as _glob
    import hashlib

    import pyarrow.parquet as pq
    import ray.data as rd

    from timberjack_ray.aggregates import merge_partials

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out = f"/dev/shm/tj_jsonl_{tag}"
    if not os.path.exists(f"{out}/_done"):
        os.makedirs(out, exist_ok=True)
        t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                          columns=["event_type", "value"])
        df = t.to_pandas()
        n, k = len(df), 4
        for i in range(k):
            df.iloc[i * n // k:(i + 1) * n // k].to_json(
                f"{out}/part-{i}.jsonl", orient="records", lines=True,
                double_precision=15)
        with open(f"{out}/_done", "w") as f:
            f.write("ok")
    ds = rd.read_json(sorted(_glob.glob(f"{out}/part-*.jsonl")))

    def partial(t: pa.Table) -> pa.Table:
        from timberjack_ray.functions.util import scale_to_int

        g = pa.table({"event_type": t["event_type"],
                      "cents": scale_to_int(t["value"], 100)}) \
            .group_by("event_type").aggregate(
                [([], "count_all"), ("cents", "sum")])
        return g.rename_columns(["event_type", "n", "cents"])

    outdf = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                           ["event_type"], ["n", "cents"]).to_pandas()
    return outdf.sort_values("event_type").reset_index(drop=True) \
        .astype({"n": "int64", "cents": "int64"})


def q_minhash_lsh_pairs(sf_dir: str):
    """Oracle-checked LSH PAIRING tier (round 4): completes the MinHash
    chain on the SQL-replayable Horner family — 8-perm signatures
    (minhash_signatures math) banded 4×2, docs sharing an exact
    (band, m0, m1) bucket become candidates through the segmented
    in-bucket d-offset pair kernel, and a candidate survives at
    n_eq ≥ 4 equal perms (estimated Jaccard ≥ 0.5).  ONE bucket
    exchange over slim (band, m0, m1, doc) int rows; the result is
    pair-volume by definition, so the cross-band dedup and the
    signature-lookup verify run on the collected result (candidates ≪
    corpus; the production near-dup path with capped buckets and a
    distributed verify is minhash_dedup — this query makes the BANDING
    math itself driver-checkable)."""
    import ray

    from timberjack_ray.functions.dedup import minhash_horner_signature

    N_PERM, R, MIN_EQ = 8, 2, 4
    bempty = pa.table({"band": pa.array([], pa.int64()),
                       "m0": pa.array([], pa.int64()),
                       "m1": pa.array([], pa.int64()),
                       "doc": pa.array([], pa.int64()),
                       "__kb": pa.array([], pa.int64())})

    def to_bands(t: pa.Table) -> pa.Table:
        s = minhash_horner_signature(t)
        if not s.num_rows:
            return bempty
        ids = s["doc_id"].to_numpy(zero_copy_only=False)
        perm = s["perm"].to_numpy(zero_copy_only=False)
        mh = s["minhash"].to_numpy(zero_copy_only=False)
        order = np.lexsort((perm, ids))
        sig = mh[order].reshape(-1, N_PERM)
        docs = ids[order][::N_PERM]
        parts = []
        for b in range(N_PERM // R):
            m0, m1 = sig[:, R * b], sig[:, R * b + 1]
            with np.errstate(over="ignore"):  # intentional mod-2^64 mix
                h = (np.uint64(b) * np.uint64(0x9E3779B97F4A7C15)
                     + m0.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
                     + m1.astype(np.uint64) * np.uint64(0x165667B19E3779F9))
            parts.append(pa.table({
                "band": pa.array(np.full(len(docs), b, np.int64)),
                "m0": pa.array(m0), "m1": pa.array(m1),
                "doc": pa.array(docs.astype(np.int64)),
                "__kb": pa.array((h % np.uint64(64)).astype(np.int64))}))
        return pa.concat_tables(parts)

    from timberjack_ray.functions.dedup import bucket_pair_expand

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    bands = ds.map_batches(to_bands, batch_format="pyarrow")
    pairs = bands.groupby("__kb").map_groups(
        lambda t: bucket_pair_expand(t.drop_columns(["__kb"]),
                                     ["band", "m0", "m1"]),
        batch_format="pyarrow").to_pandas()
    if not len(pairs):
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "n_eq": pd.Series([], dtype="int64")})
    pr = np.unique(np.stack([pairs["a"].to_numpy(np.int64),
                             pairs["b"].to_numpy(np.int64)], 1), axis=0)

    cand = np.unique(pr)
    cand_ref = ray.put(cand)  # sorted by construction

    def sig_of_cands(t: pa.Table) -> pa.Table:
        s = minhash_horner_signature(t)
        c = ray.get(cand_ref)
        ids = s["doc_id"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(c, ids)
        idx[idx >= len(c)] = 0
        return s.filter(pa.array(c[idx] == ids))

    sig = ds.map_batches(sig_of_cands, batch_format="pyarrow").to_pandas()
    sig = sig.sort_values(["doc_id", "perm"])
    S = sig["minhash"].to_numpy(np.int64).reshape(-1, N_PERM)
    sdocs = sig["doc_id"].to_numpy(np.int64)[::N_PERM]
    ia = np.searchsorted(sdocs, pr[:, 0])
    ib = np.searchsorted(sdocs, pr[:, 1])
    n_eq = (S[ia] == S[ib]).sum(axis=1).astype(np.int64)
    keep = n_eq >= MIN_EQ
    out = pd.DataFrame({"a": pr[keep, 0], "b": pr[keep, 1],
                        "n_eq": n_eq[keep]})
    return out.sort_values(["a", "b"]).reset_index(drop=True) \
        .astype({"a": "int64", "b": "int64", "n_eq": "int64"})


def q_simhash_lsh_pairs(sf_dir: str):
    """Oracle-checked SimHash PAIRING tier (round 4): the Hamming-space
    twin of minhash_lsh_pairs — full-width 64-bit majority-vote
    signatures (simhash16_horner with n_bits=64), banded 4×16 bits; docs
    sharing an exact band word become candidates through the same
    segmented in-bucket pair kernel, and a candidate survives at
    popcount(xor) ≤ 3.  ONE bucket exchange over slim
    (band, bkey, doc) int rows; pair-volume result dedup + the
    signature-lookup Hamming verify run on the collected result (SQL
    replays banding with HUGEINT shifts and the verify with
    bit_count(xor)).  The production near-dup path with capped buckets
    is simhash_candidates; this query makes the banding + Hamming math
    driver-checkable."""
    import ray

    from timberjack_ray.functions.dedup import simhash16_horner

    N_BANDS, BITS, MAX_HAM = 4, 16, 3
    bempty = pa.table({"band": pa.array([], pa.int64()),
                       "bkey": pa.array([], pa.int64()),
                       "doc": pa.array([], pa.int64()),
                       "__kb": pa.array([], pa.int64())})

    def to_bands(t: pa.Table) -> pa.Table:
        s = simhash16_horner(t, n_bits=64)
        if not s.num_rows:
            return bempty
        docs = s["doc_id"].to_numpy(zero_copy_only=False)
        sig = s["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        parts = []
        for b in range(N_BANDS):
            bkey = (sig >> np.uint64(BITS * b)) & np.uint64(0xFFFF)
            with np.errstate(over="ignore"):  # intentional mod-2^64 mix
                h = (np.uint64(b) * np.uint64(0x9E3779B97F4A7C15)
                     + bkey * np.uint64(0xC2B2AE3D27D4EB4F))
            parts.append(pa.table({
                "band": pa.array(np.full(len(docs), b, np.int64)),
                "bkey": pa.array(bkey.astype(np.int64)),
                "doc": pa.array(docs.astype(np.int64)),
                "__kb": pa.array((h % np.uint64(64)).astype(np.int64))}))
        return pa.concat_tables(parts)

    from timberjack_ray.functions.dedup import bucket_pair_expand

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    bands = ds.map_batches(to_bands, batch_format="pyarrow")
    pairs = bands.groupby("__kb").map_groups(
        lambda t: bucket_pair_expand(t.drop_columns(["__kb"]),
                                     ["band", "bkey"]),
        batch_format="pyarrow").to_pandas()
    out_empty = pd.DataFrame({"a": pd.Series([], dtype="int64"),
                              "b": pd.Series([], dtype="int64"),
                              "hamming": pd.Series([], dtype="int64")})
    if not len(pairs):
        return out_empty
    pr = np.unique(np.stack([pairs["a"].to_numpy(np.int64),
                             pairs["b"].to_numpy(np.int64)], 1), axis=0)

    cand = np.unique(pr)
    cand_ref = ray.put(cand)

    def sig_of_cands(t: pa.Table) -> pa.Table:
        s = simhash16_horner(t, n_bits=64)
        c = ray.get(cand_ref)
        ids = s["doc_id"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(c, ids)
        idx[idx >= len(c)] = 0
        return s.filter(pa.array(c[idx] == ids))

    sig = ds.map_batches(sig_of_cands, batch_format="pyarrow").to_pandas()
    sig = sig.sort_values("doc_id")
    svals = sig["simhash"].to_numpy(np.int64).view(np.uint64)
    sdocs = sig["doc_id"].to_numpy(np.int64)
    xa = svals[np.searchsorted(sdocs, pr[:, 0])]
    xb = svals[np.searchsorted(sdocs, pr[:, 1])]
    x = xa ^ xb
    ham = np.zeros(len(x), np.int64)
    for _ in range(64):          # Kernighan-free vectorized popcount
        ham += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    keep = ham <= MAX_HAM
    out = pd.DataFrame({"a": pr[keep, 0], "b": pr[keep, 1],
                        "hamming": ham[keep]})
    return out.sort_values(["a", "b"]).reset_index(drop=True) \
        .astype({"a": "int64", "b": "int64", "hamming": "int64"})


def q_event_value_drift(sf_dir: str):
    """Distribution-drift detector (round 4): the EXACT total-variation
    distance between two event types' value distributions, as the
    integer ``tv_num = Σ_v |c1(v)·N2 − c2(v)·N1|`` over the shared cent
    domain (TV = tv_num / (2·N1·N2)) — the corpus-drift / dataset-shift
    statistic a training pipeline runs between snapshots.  One
    (type, cents) count-per-value partial pass; the merge is
    value-DOMAIN-bounded; the cross-product terms fold on the driver in
    PYTHON ints so no scale overflows int64 before the final cast."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.util import scale_to_int

    A, B = "purchase", "click"

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"],
                              value_set=pa.array([A, B])))
        g = pa.table({"event_type": t["event_type"],
                      "cents": scale_to_int(t["value"], 100)}) \
            .group_by(["event_type", "cents"]).aggregate(
                [([], "count_all")])
        return g.rename_columns(["event_type", "cents", "c"])

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    h = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                       ["event_type", "cents"], "c").to_pandas()
    ca = dict(zip(h[h["event_type"] == A]["cents"],
                  h[h["event_type"] == A]["c"]))
    cb = dict(zip(h[h["event_type"] == B]["cents"],
                  h[h["event_type"] == B]["c"]))
    n1 = sum(ca.values())
    n2 = sum(cb.values())
    tv = sum(abs(int(ca.get(v, 0)) * n2 - int(cb.get(v, 0)) * n1)
             for v in set(ca) | set(cb))
    return pd.DataFrame({"n1": [n1], "n2": [n2], "tv_num": [tv]}) \
        .astype({"n1": "int64", "n2": "int64", "tv_num": "int64"})


def q_value_time_regression(sf_dir: str):
    """Per-type OLS trend of event value over time
    (functions/relational.grouped_regression_sums): x = hour index since
    2024-01-01, y = value in cents — the five integer sufficient sums
    merge per type, then slope/intercept are emitted as exact
    floor-of-magnitude ppm rationals (functions/relational._ratio_ppm),
    so the whole regression replays bit-for-bit in SQL with no float
    summation anywhere.  One streaming pass; partial volume = #types."""
    from timberjack_ray.functions.relational import (_ratio_ppm,
                                                     grouped_regression_sums)
    from timberjack_ray.functions.util import scale_to_int

    BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch µs
    HOUR_US = 3_600_000_000

    def prep(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64())
        x = pc.divide(pc.subtract(ts, BASE_US), HOUR_US)
        return pa.table({"event_type": t["event_type"], "x": x,
                         "y": scale_to_int(t["value"], 100)})

    ds = _rp(sf_dir, "events", columns=["event_type", "ts", "value"]) \
        .map_batches(prep, batch_format="pyarrow")
    s = grouped_regression_sums(ds, "event_type", "x", "y")
    rows = []
    for r in s.itertuples(index=False):
        n, sx, sy = int(r.n), int(r.sum_x), int(r.sum_y)
        sxy, sxx = int(r.sum_xy), int(r.sum_xx)
        nu = n * sxy - sx * sy
        de = n * sxx - sx * sx
        if de == 0:  # all events in one hour: flat line at the mean
            slope, icept = 0, _ratio_ppm(sy, n)
        else:
            slope = _ratio_ppm(nu, de)
            icept = _ratio_ppm(sy * de - nu * sx, n * de)
        rows.append((r.event_type, n, slope, icept))
    return pd.DataFrame(rows, columns=["event_type", "n", "slope_ppm",
                                       "intercept_ppm"]) \
        .sort_values("event_type").reset_index(drop=True) \
        .astype({"n": "int64", "slope_ppm": "int64",
                 "intercept_ppm": "int64"})


def q_user_type_hhi(sf_dir: str):
    """Per-user Herfindahl concentration of event types in ppm
    (functions/relational.grouped_hhi_ds) — the behavioral-diversity
    signal (10⁶ = single-type user, 2·10⁵ = uniform over 5 types).
    Integer-exact; one bucket exchange; output streams one row per user."""
    from timberjack_ray.functions.relational import grouped_hhi_ds

    ds = _rp(sf_dir, "events", columns=["user_id", "event_type"])
    out = grouped_hhi_ds(ds, "user_id", "event_type").to_pandas()
    return out.sort_values("user_id").reset_index(drop=True) \
        .astype({"user_id": "int64", "n_rows": "int64", "hhi_ppm": "int64"})


def q_ttr_by_source(sf_dir: str):
    """Per-source type-token ratio statistics (functions/corpus.
    ttr_by_group): exact (n_tokens, n_types) integers — the lexical-
    diversity corpus signal.  Distinct-(source, word) partials collapse
    per batch; the fold is guarded past vocab×sources cardinality."""
    from timberjack_ray.functions.corpus import ttr_by_group

    ds = _rp(sf_dir, "documents", columns=["source", "text"])
    return ttr_by_group(ds, "source")


def q_pmi_top_pairs(sf_dir: str):
    """Top-20 word pairs by document-co-occurrence PMI over the top-16
    vocabulary (functions/corpus.pmi_top_pairs): ranked by the exact
    integer rational c_ab·N·10⁶ // (df_a·df_b) — PMI is monotone in that
    ratio, so the ranking IS the PMI ranking with no log computed.  The
    vocab cap (pass-1 guarded df fold → top-16 broadcast) bounds pair
    partials at C(16,2) rows per batch at any corpus size."""
    from timberjack_ray.functions.corpus import pmi_top_pairs

    ds = _rp(sf_dir, "documents", columns=["text"])
    return pmi_top_pairs(ds, v=16, k=20)


def q_skipgram_counts(sf_dir: str):
    """Top-20 skip-bigrams at distances 2 and 3 (functions/corpus.
    skipgram_topk) — the word2vec-window co-occurrence family beyond
    adjacent bigrams.  Pairs never cross document boundaries (vectorized
    doc-id compare); per-batch partials collapse to the distinct
    (w1, w2, gap) set; the fold guard degrades to a distributed
    groupby + sort past vocab² cardinality."""
    from timberjack_ray.functions.corpus import skipgram_topk

    ds = _rp(sf_dir, "documents", columns=["text"])
    return skipgram_topk(ds, k=20, gaps=(2, 3))


def q_hourly_acf_by_type(sf_dir: str):
    """Per-type hourly time-series health stats, integer-exact: index of
    dispersion (variance/mean of the zero-filled hourly count series) and
    the lag-1 autocorrelation (Box-Jenkins ACF estimator) — burstiness +
    short-memory signals over event streams.  Both are RATIONALS in the
    hour-count integers (D = (HΣx²−S²)/(H·S); r₁ = Σ(Hxₜ−S)(Hxₜ₊₁−S) /
    (H·(HΣx²−S²))), emitted as floor-of-magnitude ppm — no float ever.

    Scale shape: (type, hour) count partials collapse per batch; the
    merge is CALENDAR-bounded (types × hours — a decade is 87 600 hours),
    so the driver fold is bounded by construction; zero-fill + the two
    dot products run on the tiny merged series."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.relational import _ratio_ppm

    BASE_US = 1_704_067_200_000_000
    HOUR_US = 3_600_000_000

    def partial(t: pa.Table) -> pa.Table:
        h = pc.divide(pc.subtract(pc.cast(t["ts"], pa.int64()), BASE_US),
                      HOUR_US)
        g = pa.table({"event_type": t["event_type"], "h": h}) \
            .group_by(["event_type", "h"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "h", "c"])

    ds = _rp(sf_dir, "events", columns=["event_type", "ts"])
    m = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                       ["event_type", "h"], "c").to_pandas()
    rows = []
    for et, sub in m.groupby("event_type"):
        mn, mx = int(sub["h"].min()), int(sub["h"].max())
        series = np.zeros(mx - mn + 1, dtype=np.int64)
        series[sub["h"].to_numpy() - mn] = sub["c"].to_numpy()
        H = len(series)
        S = int(series.sum())
        sxx = int((series.astype(object) ** 2).sum())
        nd = H * sxx - S * S          # ≥ 0 (H·variance·H)
        disp = (nd * 1_000_000) // (H * S)
        if nd == 0 or H < 2:
            acf = 0
        else:
            d = H * series.astype(object) - S
            acf = _ratio_ppm(int((d[:-1] * d[1:]).sum()), H * nd)
        rows.append((et, H, disp, acf))
    return pd.DataFrame(rows, columns=["event_type", "n_hours",
                                       "disp_ppm", "acf1_ppm"]) \
        .sort_values("event_type").reset_index(drop=True) \
        .astype({"n_hours": "int64", "disp_ppm": "int64",
                 "acf1_ppm": "int64"})


def q_k_anonymity_audit(sf_dir: str):
    """K-anonymity privacy audit over the quasi-identifier grid
    (lang, source, n_chars//200): for each k ∈ {2, 5, 10}, how many
    quasi-identifier groups and how many DOCUMENTS sit in groups smaller
    than k — the re-identification-risk census run before releasing a
    corpus (Sweeney 2002).  Exact integers; the per-batch partials
    collapse to the grid, whose size is bounded by
    langs × sources × length-buckets."""
    from timberjack_ray.aggregates import merge_partials

    def partial(t: pa.Table) -> pa.Table:
        cb = pc.divide(t["n_chars"], 200)
        g = pa.table({"lang": t["lang"], "source": t["source"], "cb": cb}) \
            .group_by(["lang", "source", "cb"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "source", "cb", "c"])

    ds = _rp(sf_dir, "documents", columns=["lang", "source", "n_chars"])
    m = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                       ["lang", "source", "cb"], "c").to_pandas()
    c = m["c"].to_numpy()
    rows = [(k, int((c < k).sum()), int(c[c < k].sum()))
            for k in (2, 5, 10)]
    return pd.DataFrame(rows, columns=["k", "groups_below",
                                       "rows_below"]).astype("int64")
def _hourly_cents_by_type(sf_dir: str) -> pd.DataFrame:
    """Shared (event_type, hour-index, total-cents) series: per-batch
    (type, hour) cent-sum partials collapse each batch, then a
    CALENDAR-bounded merge (types × hours) — the input both robust-trend
    operators (Theil–Sen, Kendall) fold over."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.util import scale_to_int

    BASE_US = 1_704_067_200_000_000
    HOUR_US = 3_600_000_000

    def partial(t: pa.Table) -> pa.Table:
        h = pc.divide(pc.subtract(pc.cast(t["ts"], pa.int64()), BASE_US),
                      HOUR_US)
        g = pa.table({"event_type": t["event_type"], "h": h,
                      "y": scale_to_int(t["value"], 100)}) \
            .group_by(["event_type", "h"]).aggregate([("y", "sum")])
        return g.rename_columns(["event_type", "h", "y"])

    ds = _rp(sf_dir, "events", columns=["event_type", "ts", "value"])
    return merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                          ["event_type", "h"], "y").to_pandas()



def q_theilsen_trend_by_type(sf_dir: str):
    """Per-type Theil–Sen robust trend of hourly total value: the LOWER
    MEDIAN of all pairwise integer slopes sign·(|Δcents|·10⁶ // Δhour)
    over the observed (hour, total-cents) points — the outlier-immune
    alternative to the OLS trend (value_time_regression), exact to the
    ppm floor with no float anywhere.

    Scale shape: (type, hour) cent-sum partials → calendar-bounded merge
    (types × hours); the pairwise fold is C(H,2) per type — fine for
    multi-month hourly series (720 h → 259 k pairs); for decade-scale
    series switch to the repeated-median variant or pre-bucket to days."""
    m = _hourly_cents_by_type(sf_dir)
    rows = []
    for et, sub in m.groupby("event_type"):
        sub = sub.sort_values("h")
        h = sub["h"].to_numpy(dtype=np.int64)
        y = sub["y"].to_numpy(dtype=np.int64).astype(object)
        n_h = len(h)
        if n_h < 2:
            rows.append((et, n_h, 0, 0))
            continue
        i, j = np.triu_indices(n_h, k=1)
        dy = y[j] - y[i]
        dh = (h[j] - h[i]).astype(object)
        mag = (np.abs(dy) * 1_000_000) // dh
        s = np.where(dy < 0, -mag, mag)
        s = np.sort(s.astype(np.int64))
        rows.append((et, n_h, len(s), int(s[(len(s) - 1) // 2])))
    return pd.DataFrame(rows, columns=["event_type", "n_hours", "n_pairs",
                                       "slope_ppm"]) \
        .sort_values("event_type").reset_index(drop=True) \
        .astype({"n_hours": "int64", "n_pairs": "int64",
                 "slope_ppm": "int64"})


def q_kendall_hourly_by_type(sf_dir: str):
    """Per-type Kendall concordance census between hour index and hourly
    total value: exact (concordant, discordant, tied) pair counts over
    all hour pairs h₁<h₂ — the integer sufficient statistics of
    Kendall's τ-b (x-ties impossible: hours are distinct), published as
    counts so no float division ever happens.

    Scale shape: same calendar-bounded (type, hour) merge as the
    Theil–Sen fold; the pair census is a vectorized sign count over
    C(H,2) index pairs per type."""
    m = _hourly_cents_by_type(sf_dir)
    rows = []
    for et, sub in m.groupby("event_type"):
        sub = sub.sort_values("h")
        y = sub["y"].to_numpy(dtype=np.int64)
        n_h = len(y)
        i, j = np.triu_indices(n_h, k=1)
        d = y[j] - y[i]
        rows.append((et, n_h, int((d > 0).sum()), int((d < 0).sum()),
                     int((d == 0).sum())))
    return pd.DataFrame(rows, columns=["event_type", "n_hours", "n_conc",
                                       "n_disc", "n_tie"]) \
        .sort_values("event_type").reset_index(drop=True) \
        .astype({c: "int64" for c in ["n_hours", "n_conc", "n_disc",
                                      "n_tie"]})


def q_mann_whitney_pairs(sf_dir: str):
    """Mann–Whitney U between every unordered pair of event types on the
    value distribution (cents): emits 2·U_a as an exact integer (twice
    the statistic so midrank ties stay integral) — the nonparametric
    A/B-shift test run between segments before/after a pipeline change.
    2U_a = Σ_v cA(v)·(2·cumB(<v) + cB(v)); identity 2U_a + 2U_b = 2·n_a·n_b.

    Scale shape: (type, cents) count-per-value partials (the same
    value-domain-bounded exchange the exact-quantile family uses) →
    driver fold bounded by types × distinct values; per pair the
    combine is one searchsorted + cumsum, never a row-level sort."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.util import scale_to_int

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"t": t["event_type"],
                      "v": scale_to_int(t["value"], 100)}) \
            .group_by(["t", "v"]).aggregate([([], "count_all")])
        return g.rename_columns(["t", "v", "c"])

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    m = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                       ["t", "v"], "c").to_pandas()
    per = {}
    for t, sub in m.groupby("t"):
        sub = sub.sort_values("v")
        per[t] = (sub["v"].to_numpy(np.int64),
                  sub["c"].to_numpy(np.int64))
    rows = []
    types = sorted(per)
    for ai in range(len(types)):
        for bi in range(ai + 1, len(types)):
            ta, tb = types[ai], types[bi]
            va, ca = per[ta]
            vb, cb = per[tb]
            cum_b = np.concatenate([[0], np.cumsum(cb.astype(object))])
            lt = cum_b[np.searchsorted(vb, va, side="left")]
            eq_idx = np.searchsorted(vb, va, side="left")
            eq = np.where((eq_idx < len(vb)) & (vb[np.minimum(eq_idx, len(vb) - 1)] == va),
                          cb[np.minimum(eq_idx, len(vb) - 1)], 0)
            # lt = #(b<a), eq = #(b=a) per a-row → Σ ca·(2·lt+eq) = 2·U_a
            u2a = int((ca.astype(object) * (2 * lt + eq)).sum())
            rows.append((ta, tb, int(ca.sum()), int(cb.sum()),
                         u2a, 2 * int(ca.sum()) * int(cb.sum()) - u2a))
    return pd.DataFrame(rows, columns=["type_a", "type_b", "n_a", "n_b",
                                       "u2_a", "u2_b"]) \
        .sort_values(["type_a", "type_b"]).reset_index(drop=True) \
        .astype({c: "int64" for c in ["n_a", "n_b", "u2_a", "u2_b"]})


def q_benford_digit_counts(sf_dir: str):
    """Benford first-significant-digit census of order totals (cents),
    stratified by order priority — the classic numeric-forgery /
    synthetic-data audit (Benford 1938): exact counts per (priority,
    leading digit), no expected-law division so the result is pure
    integers.  First digit is taken on the DECIMAL STRING of the cent
    amount (always ≥ 1 cent), so both engines agree bit-for-bit.
    One streaming pass; partial volume = priorities × 9."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.util import scale_to_int

    def partial(t: pa.Table) -> pa.Table:
        cents = scale_to_int(t["o_totalprice"], 100)
        d = pc.cast(pc.utf8_slice_codeunits(
            pc.cast(cents, pa.string()), 0, 1), pa.int64())
        g = pa.table({"o_orderpriority": t["o_orderpriority"], "digit": d}) \
            .group_by(["o_orderpriority", "digit"]) \
            .aggregate([([], "count_all")])
        return g.rename_columns(["o_orderpriority", "digit", "n"])

    ds = _rp(sf_dir, "orders", columns=["o_orderpriority", "o_totalprice"])
    out = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                         ["o_orderpriority", "digit"], "n").to_pandas()
    return out.sort_values(["o_orderpriority", "digit"]) \
        .reset_index(drop=True).astype({"digit": "int64", "n": "int64"})


def q_rule_agreement_kappa(sf_dir: str):
    """Cohen's κ agreement between two independent quality-filter rules
    (A: ≥ 60 whitespace tokens; B: ≥ 330 chars) — the annotation-QA
    check run when two labeling heuristics gate the same corpus.  The
    2×2 contingency folds as four integers; κ is the exact rational
    (n·(n₁₁+n₀₀) − Σmarginals) / (n² − Σmarginals) emitted as
    floor-of-magnitude ppm (functions/relational._ratio_ppm) — zero
    floats.  One vectorized pass; partial volume = 4 counters."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.relational import _ratio_ppm

    def partial(t: pa.Table) -> pa.Table:
        nw = pc.list_value_length(pc.split_pattern(t["text"], " ")) \
            .cast(pa.int64())
        a = pc.cast(pc.greater_equal(nw, 60), pa.int64())
        b = pc.cast(pc.greater_equal(t["n_chars"], 330), pa.int64())
        g = pa.table({"a": a, "b": b}).group_by(["a", "b"]) \
            .aggregate([([], "count_all")])
        return g.rename_columns(["a", "b", "n"])

    ds = _rp(sf_dir, "documents", columns=["text", "n_chars"])
    m = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                       ["a", "b"], "n").to_pandas()
    cell = {(int(r.a), int(r.b)): int(r.n) for r in m.itertuples(index=False)}
    n11 = cell.get((1, 1), 0)
    n10 = cell.get((1, 0), 0)
    n01 = cell.get((0, 1), 0)
    n00 = cell.get((0, 0), 0)
    n = n11 + n10 + n01 + n00
    pe_num = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    den = n * n - pe_num
    kappa = 0 if den == 0 else _ratio_ppm(n * (n11 + n00) - pe_num, den)
    return pd.DataFrame([(n, n11, n10, n01, n00, kappa)],
                        columns=["n", "n11", "n10", "n01", "n00",
                                 "kappa_ppm"]).astype("int64")


def q_ams_f2_checked(sf_dir: str):
    """AMS tug-of-war F2 sketch, hash-checked (promotes the rows-only
    `selfjoin_size_ams` family): the pre-hash is splitmix64 of the INTEGER
    user_id — no string hashing — so every per-estimator sign, and
    therefore the whole sketch state, replays in SQL via HUGEINT mod-2^64
    arithmetic (same 32-bit-split multiply the MinHash oracle uses).
    Output = the 9 per-group sums of 24 squared estimator states per
    event_type (median-of-means sufficient statistics: the F2 estimate is
    median(s2_sum)/24, left to the consumer so everything stays integer).

    Scale shape: the state is LINEAR in counts, so per-batch partials fold
    exactly under addition; exchange volume = types × 216 ints per batch
    regardless of user cardinality."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.corpus import _splitmix64

    D, PER = 216, 24
    salts = _splitmix64(np.arange(1, D + 1, dtype=np.uint64) * np.uint64(15))
    js = np.arange(D, dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({"t": t["event_type"], "u": t["user_id"]}) \
            .group_by(["t", "u"]).aggregate([([], "count_all")]) \
            .rename_columns(["t", "u", "c"])
        types = g["t"].to_numpy(zero_copy_only=False)
        x = _splitmix64(g["u"].to_numpy(zero_copy_only=False).astype(np.uint64))
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        sign = 1 - 2 * (_splitmix64(x[None, :] ^ salts[:, None])
                        & np.uint64(1)).astype(np.int64)   # (D, n)
        out_t, out_j, out_s = [], [], []
        for et in np.unique(types):
            mask = types == et
            out_t.append(np.full(D, et, dtype=object))
            out_j.append(js)
            out_s.append(sign[:, mask] @ c[mask])
        return pa.table({"event_type": pa.array(np.concatenate(out_t)),
                         "j": pa.array(np.concatenate(out_j)),
                         "s": pa.array(np.concatenate(out_s))})

    ds = _rp(sf_dir, "events", columns=["event_type", "user_id"])
    m = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                       ["event_type", "j"], "s").to_pandas()
    m["grp"] = m["j"] // PER
    m["s2"] = m["s"].astype(object) ** 2
    out = m.groupby(["event_type", "grp"])["s2"].sum().reset_index(name="s2_sum")
    return out.sort_values(["event_type", "grp"]).reset_index(drop=True) \
        .astype({"grp": "int64", "s2_sum": "int64"})


def q_hll_register_hist(sf_dir: str):
    """HyperLogLog register-rank census (p=14) over splitmix64(user_id) —
    promotes the rows-only HLL family to hash-checked: rank =
    clz((h<<14) | 2^13) + 1 per register index h>>50, registers max-merge,
    and the output is the histogram of register values INCLUDING the zero
    bucket.  The float estimate stays in `approx_distinct_users`; this
    pins the exact register state it derives from bit-for-bit (the oracle
    recomputes clz as 65 − bit_length via DuckDB bin()).

    Scale: per-batch partial = one 16 KiB register blob, max-fold on the
    driver — constant regardless of cardinality."""
    from timberjack_ray.functions.sketch import hll_over

    ds = _rp(sf_dir, "events", columns=["user_id"])
    total = hll_over(ds, "user_id", p=14, hasher=_splitmix_col)
    ranks, counts = np.unique(total.registers, return_counts=True)
    return pd.DataFrame({"rank": ranks.astype(np.int64),
                         "n_regs": counts.astype(np.int64)})


_CMS_A = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
          0x165667B19E3779F9, 0x27D4EB2F165667C5)
_CMS_B = (0, 0x85EBCA6B, 0xFD7046C5, 0xCB22A355)


def q_cms_word_hitters(sf_dir: str):
    """Count-Min heavy-hitter words, hash-checked (promotes the rows-only
    `heavy_hitter_words`): words hash with the Horner mod-2^64 fold the
    MinHash oracle already replays, and the 4 multiply-shift rows use
    LITERAL odd constants (col = high-32-bits of a·x+b, mod width 8192),
    so the merged sketch table — and every candidate's min-over-rows
    estimate — is SQL-reproducible.  The oracle estimates over ALL
    distinct words; parity holds because CMS never under-counts: every
    true top-10 word is inside some batch's top-4096 exact candidates,
    and this hash check asserts the margin keeps non-candidates out.

    Scale: per-batch partial = 4×8192 int64 + ≤4096 candidate strings,
    independent of vocabulary size."""
    from timberjack_ray.functions.corpus import horner_hash_strings
    from timberjack_ray.functions.sketch import CountMinSketch

    DEPTH, WIDTH, CAND = 4, 8192, 4096

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(batch["text"], " "))
        vc = pa.table({"w": words}).group_by("w") \
            .aggregate([([], "count_all")]).rename_columns(["w", "c"])
        cms = CountMinSketch(DEPTH, WIDTH)
        cms.a = np.array(_CMS_A, np.uint64)
        cms.b = np.array(_CMS_B, np.uint64)
        c = vc["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        cms.add_hashed(horner_hash_strings(vc["w"]), c)
        df = vc.to_pandas().sort_values(["c", "w"], ascending=[False, True])
        cand = df["w"].head(CAND).astype(str).tolist()
        return pa.table({
            "table": pa.array([cms.table.tobytes()], pa.large_binary()),
            "cands": pa.array([cand], pa.large_list(pa.string())),
        })

    ds = _rp(sf_dir, "documents", columns=["text"])
    total = CountMinSketch(DEPTH, WIDTH)
    total.a = np.array(_CMS_A, np.uint64)
    total.b = np.array(_CMS_B, np.uint64)
    cands: set = set()
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        for tbl, cd in zip(b["table"].to_pylist(), b["cands"].to_pylist()):
            total.merge_table(np.frombuffer(tbl, dtype=np.int64))
            cands.update(cd)
    cand_list = sorted(cands)
    est = total.query_hashed(
        horner_hash_strings(pa.array(cand_list, pa.string())))
    out = pd.DataFrame({"word": cand_list, "est_n": est})
    return out.sort_values(["est_n", "word"], ascending=[False, True]) \
        .head(10).reset_index(drop=True).astype({"est_n": "int64"})


def q_semi_f_customers_by_nation(sf_dir: str):
    """SEMI-join leg: customers with at least one 'F'-status order,
    counted per nation — the EXISTS-subquery shape (reference filter
    semantics over a second table) the anti-join leg already mirrors.
    Plan: filter+project orders to per-batch distinct custkeys, GRACE
    bucket-join against customer (one exchange, each row crosses once),
    then the residual cross-batch duplicates collapse in the exact
    (nation, custkey) distinct-count — no driver materialization."""
    from timberjack_ray.functions.relational import (bucket_hash_join,
                                                     distinct_count_by)

    orders = _rp(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])

    def fkeys(t: pa.Table) -> pa.Table:
        k = pc.filter(t["o_custkey"], pc.equal(t["o_orderstatus"], "F"))
        return pa.table({"o_custkey": pc.unique(pc.cast(k, pa.int64()))})

    keys = orders.map_batches(fkeys, batch_format="pyarrow")
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    joined = bucket_hash_join(keys, cust, "o_custkey", "c_custkey",
                              [], ["c_nationkey"])
    out = distinct_count_by(joined, "c_nationkey", "o_custkey",
                            name="n_customers")
    return out.sort_values("c_nationkey").reset_index(drop=True) \
        .astype({"c_nationkey": "int64", "n_customers": "int64"})


def q_gini_impurity_by_source(sf_dir: str):
    """Per-source Gini impurity of the language mix — the label-purity
    signal a corpus curator reads before deciding whether a source needs
    per-language routing.  Exact rational emitted as floor ppm:
    gini = (n² − Σ c_lang²) / n².  One (source, lang) count exchange,
    bounded by sources × langs."""
    from timberjack_ray.aggregates import merge_partials

    ds = _rp(sf_dir, "documents", columns=["source", "lang"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["source", "lang"]).aggregate([([], "count_all")])
        return g.rename_columns(["source", "lang", "n"])

    m = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                       ["source", "lang"], "n").to_pandas()
    rows = []
    for src, sub in m.groupby("source"):
        c = sub["n"].to_numpy(np.int64).astype(object)
        n = int(c.sum())
        rows.append((src, n, int(((n * n - int((c * c).sum())) * 1_000_000)
                                 // (n * n))))
    return pd.DataFrame(rows, columns=["source", "n", "gini_ppm"]) \
        .sort_values("source").reset_index(drop=True) \
        .astype({"n": "int64", "gini_ppm": "int64"})


def q_chi2_type_hour(sf_dir: str):
    """Chi-square independence census between event_type and hour-of-day:
    per type, the sum over its 24 cells of the floored-ppm contribution
    ((o·N − r·c)² · 10⁶) // (r·c·N) — uniformity-of-daily-profile audit,
    defined as sum-of-floored-cells so both engines agree bit-for-bit
    (zero cells included via the observed-margin grid; margins are
    positive by construction).  One (type, hod) count exchange, ≤ types
    × 24 merge rows.  SQL replay is HUGEINT-bounded (per-cell products
    < 2^127), fine to ~10⁹ rows; past that emit raw cells instead."""
    from timberjack_ray.aggregates import merge_partials

    BASE_US = 1_704_067_200_000_000
    HOUR_US = 3_600_000_000

    def partial(t: pa.Table) -> pa.Table:
        hod = pc.divide(pc.subtract(pc.cast(t["ts"], pa.int64()), BASE_US),
                        HOUR_US)
        hod = pc.subtract(hod, pc.multiply(pc.divide(hod, 24), 24))
        g = pa.table({"t": t["event_type"], "hod": hod}) \
            .group_by(["t", "hod"]).aggregate([([], "count_all")])
        return g.rename_columns(["t", "hod", "o"])

    ds = _rp(sf_dir, "events", columns=["event_type", "ts"])
    m = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                       ["t", "hod"], "o").to_pandas()
    piv = m.pivot_table(index="t", columns="hod", values="o",
                        fill_value=0, aggfunc="sum").astype(object)
    N = int(piv.values.sum())
    r = piv.sum(axis=1)
    c = piv.sum(axis=0)
    rows = []
    for t in piv.index:
        ppm = 0
        for h in piv.columns:
            o, ri, cj = int(piv.loc[t, h]), int(r[t]), int(c[h])
            ppm += ((o * N - ri * cj) ** 2 * 1_000_000) // (ri * cj * N)
        rows.append((t, int(r[t]), ppm))
    return pd.DataFrame(rows, columns=["event_type", "n_type", "chi2_ppm"]) \
        .sort_values("event_type").reset_index(drop=True) \
        .astype({"n_type": "int64", "chi2_ppm": "int64"})


def q_wow_value_change(sf_dir: str):
    """Week-over-week percent change of total event value (cents) per
    type, as exact floor-of-magnitude ppm vs the previous OBSERVED week
    (LAG semantics) — the drift dashboard's headline series.  One
    (type, week) cent-sum exchange; weeks bounded by the calendar."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.relational import _ratio_ppm
    from timberjack_ray.functions.util import scale_to_int

    BASE_US = 1_704_067_200_000_000
    WEEK_US = 604_800_000_000

    def partial(t: pa.Table) -> pa.Table:
        w = pc.divide(pc.subtract(pc.cast(t["ts"], pa.int64()), BASE_US),
                      WEEK_US)
        g = pa.table({"t": t["event_type"], "w": w,
                      "y": scale_to_int(t["value"], 100)}) \
            .group_by(["t", "w"]).aggregate([("y", "sum")])
        return g.rename_columns(["t", "w", "y"])

    ds = _rp(sf_dir, "events", columns=["event_type", "ts", "value"])
    m = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                       ["t", "w"], "y").to_pandas().sort_values(["t", "w"])
    rows = []
    for t, sub in m.groupby("t"):
        y = sub["y"].to_numpy(np.int64)
        w = sub["w"].to_numpy(np.int64)
        for i in range(1, len(y)):
            rows.append((t, int(w[i]),
                         _ratio_ppm(int(y[i]) - int(y[i - 1]),
                                    int(y[i - 1]))))
    return pd.DataFrame(rows, columns=["event_type", "week", "wow_ppm"]) \
        .sort_values(["event_type", "week"]).reset_index(drop=True) \
        .astype({"week": "int64", "wow_ppm": "int64"})


def q_vocab_coverage_top100(sf_dir: str):
    """Vocabulary-concentration audit: what fraction (floor ppm) of all
    token occurrences the top-100 words cover — the go/no-go number for
    a frequency-pruned tokenizer vocab.  Word counts fold under the
    vocab guard; on degrade the totals come from a scalar partial pass
    and the top-100 from the batchwise top-k merge (no driver blowup)."""
    from timberjack_ray.aggregates import merge_partials_or_ds
    from timberjack_ray.functions.relational import sorted_topk

    ds = _rp(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        w = pc.list_flatten(pc.split_pattern(t["text"], " "))
        g = pa.table({"word": w}).group_by("word") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["word", "n"])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    folded, mode = merge_partials_or_ds(parts, ["word"], ["n"])
    if mode == "driver":
        df = folded.to_pandas()
        total, n_distinct = int(df["n"].sum()), len(df)
        top = df.sort_values(["n", "word"], ascending=[False, True]) \
            .head(100)
        top_n = int(top["n"].sum())
    else:
        stats = folded.map_batches(
            lambda t: pa.table({"s": [int(pc.sum(t["n"]).as_py() or 0)],
                                "d": [t.num_rows]}),
            batch_format="pyarrow").to_pandas()
        total, n_distinct = int(stats["s"].sum()), int(stats["d"].sum())
        top = sorted_topk(folded, ["n", "word"], 100,
                          descending=[True, False])
        top_n = int(top["n"].sum())
    return pd.DataFrame([(total, n_distinct, top_n,
                          top_n * 1_000_000 // total)],
                        columns=["n_tokens", "n_distinct", "top100_n",
                                 "coverage_ppm"]).astype("int64")


def _dbl_midranks(y: np.ndarray) -> np.ndarray:
    """Doubled midranks (2·midrank = 2·rank_min + tie_count − 1): integers
    even under ties, matching SQL's 2·RANK() + COUNT() OVER (value) − 1."""
    order = np.argsort(y, kind="stable")
    ys = y[order]
    _, first, counts = np.unique(ys, return_index=True, return_counts=True)
    dbl = 2 * (first + 1) + counts - 1
    out = np.empty(len(y), dtype=np.int64)
    out[order] = np.repeat(dbl, counts)
    return out


def q_spearman_hourly_pairs(sf_dir: str):
    """Spearman rank-concordance sufficient statistics between every pair
    of event types on their hourly total-value series, joined on common
    hours: n_h and Σ d² with d = doubled-midrank difference (so sum_d2x4
    = 4·Σ(rank_a − rank_b)², integer even under ties) — ρ = 1 −
    6·(sum_d2x4/4)/(n(n²−1)) left to the consumer.  Same calendar-bounded
    (type, hour) merge as the Theil–Sen family; ranks are per-pair over
    the common-hour sub-series (the statistically correct alignment)."""
    m = _hourly_cents_by_type(sf_dir)
    per = {t: sub.set_index("h")["y"] for t, sub in m.groupby("event_type")}
    types = sorted(per)
    rows = []
    for ai in range(len(types)):
        for bi in range(ai + 1, len(types)):
            ta, tb = types[ai], types[bi]
            common = per[ta].index.intersection(per[tb].index)
            ya = per[ta].loc[common].to_numpy(np.int64)
            yb = per[tb].loc[common].to_numpy(np.int64)
            d = _dbl_midranks(ya).astype(object) - _dbl_midranks(yb)
            rows.append((ta, tb, len(common), int((d * d).sum())))
    return pd.DataFrame(rows, columns=["type_a", "type_b", "n_h",
                                       "sum_d2x4"]) \
        .sort_values(["type_a", "type_b"]).reset_index(drop=True) \
        .astype({"n_h": "int64", "sum_d2x4": "int64"})


def q_hapax_ratio_by_lang(sf_dir: str):
    """Per-language hapax-legomena census: distinct words, words occurring
    exactly once GLOBALLY, and the floor-ppm hapax share of the
    vocabulary — the OOV-risk signal for per-language tokenizer sizing.
    (lang, word) count partials collapse per batch; the fold is guarded,
    degrading to a distributed groupby whose unique-key blocks partial
    into per-lang (distinct, hapax) counters."""
    from timberjack_ray.aggregates import merge_partials_or_ds

    ds = _rp(sf_dir, "documents", columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        w = pc.split_pattern(t["text"], " ")
        n = pc.list_value_length(w).cast(pa.int64())
        langs = pa.array(np.repeat(t["lang"].to_numpy(zero_copy_only=False),
                                   n.to_numpy(zero_copy_only=False)))
        g = pa.table({"lang": langs, "word": pc.list_flatten(w)}) \
            .group_by(["lang", "word"]).aggregate([([], "count_all")])
        return g.rename_columns(["lang", "word", "n"])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    folded, mode = merge_partials_or_ds(parts, ["lang", "word"], ["n"])
    if mode == "driver":
        df = folded.to_pandas()
        out = df.groupby("lang").agg(
            n_distinct=("n", "size"),
            n_hapax=("n", lambda s: int((s == 1).sum()))).reset_index()
    else:
        def fold(t: pa.Table) -> pa.Table:
            one = pc.cast(pc.equal(t["n"], 1), pa.int64())
            g = pa.table({"lang": t["lang"], "d": np.ones(t.num_rows,
                                                          np.int64),
                          "h": one}) \
                .group_by("lang").aggregate([("d", "sum"), ("h", "sum")])
            return g.rename_columns(["lang", "d", "h"])

        # two-column fold, bounded by langs
        t2, _ = merge_partials_or_ds(
            folded.map_batches(fold, batch_format="pyarrow"),
            ["lang"], ["d", "h"], driver_limit=1 << 20)
        df2 = t2.to_pandas()
        out = df2.rename(columns={"d": "n_distinct", "h": "n_hapax"})
    out["hapax_ppm"] = (out["n_hapax"].astype("int64") * 1_000_000
                        // out["n_distinct"].astype("int64"))
    return out.sort_values("lang").reset_index(drop=True) \
        .astype({"n_distinct": "int64", "n_hapax": "int64",
                 "hapax_ppm": "int64"})


def q_tpch_q5_local_revenue(sf_dir: str):
    """TPC-H Q5 shape: revenue per nation from LOCAL supply chains
    (customer and supplier in the SAME nation) within one region and one
    order year — the deepest join composition in the suite (6 tables).
    Plan: nation/region resolve driver-side (tiny dims); supplier's
    (suppkey → nationkey) int-pair map broadcasts via ray.put (one fetch
    per worker process, ~16 B/supplier); windowed orders GRACE-join
    customer (custkey exchange) to pick up c_nationkey; lineitem maps to
    (orderkey, s_nationkey, rev-cents·(100−disc)) with the broadcast
    lookup + region filter BEFORE the second exchange; the orderkey
    GRACE join's bucket_fn filters c_nationkey == s_nationkey and
    collapses to per-nation revenue partials — the join output never
    materializes row-per-lineitem.  Two exchanges total, each row
    crossing once, both pre-filtered."""
    import pyarrow.parquet as pq
    import ray

    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.relational import bucket_hash_join
    from timberjack_ray.functions.util import fetch_broadcast, scale_to_int

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet")).to_pandas()
    reg = pq.read_table(os.path.join(sf_dir, "region.parquet")).to_pandas()
    asia = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    asia = asia[asia["r_name"] == "ASIA"]
    asia_keys = set(int(k) for k in asia["n_nationkey"])
    sup = pq.read_table(os.path.join(sf_dir, "supplier.parquet"),
                        columns=["s_suppkey", "s_nationkey"]).to_pandas() \
        .sort_values("s_suppkey")
    smap_ref = ray.put((sup["s_suppkey"].to_numpy(np.int64),
                        sup["s_nationkey"].to_numpy(np.int64)))
    asia_arr = np.array(sorted(asia_keys), dtype=np.int64)
    lo, hi = np.datetime64("1996-01-01"), np.datetime64("1997-01-01")

    def window_orders(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].combine_chunks().to_numpy(zero_copy_only=False)
        return t.filter(pa.array((d >= lo) & (d < hi))) \
            .select(["o_orderkey", "o_custkey"])

    def asia_cust(t: pa.Table) -> pa.Table:
        m = np.isin(t["c_nationkey"].to_numpy(zero_copy_only=False),
                    asia_arr)
        return t.filter(pa.array(m)).select(["c_custkey", "c_nationkey"])

    def li_map(t: pa.Table) -> pa.Table:
        keys, nats = fetch_broadcast(smap_ref)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        snat = nats[np.searchsorted(keys, sk)]
        m = np.isin(snat, asia_arr)
        t = t.filter(pa.array(m))
        price = scale_to_int(t["l_extendedprice"], 100).to_numpy()
        disc = scale_to_int(t["l_discount"], 100).to_numpy()
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "snat": pa.array(snat[m]),
                         "rev": pa.array(price * (100 - disc))})

    orders = _rp(sf_dir, "orders",
                 columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(window_orders, batch_format="pyarrow")
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]) \
        .map_batches(asia_cust, batch_format="pyarrow")
    j1 = bucket_hash_join(
        orders, cust, "o_custkey", "c_custkey",
        left_cols=["o_orderkey"], right_cols=["c_nationkey"],
        bucket_fn=lambda t: t.select(["o_orderkey", "c_nationkey"]))
    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                      "l_discount"]) \
        .map_batches(li_map, batch_format="pyarrow")

    def bucket_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["c_nationkey"], t["snat"]))
        g = t.group_by("c_nationkey").aggregate([("rev", "sum")])
        return g.rename_columns(["n_nationkey", "revenue_scaled"])

    partials = bucket_hash_join(j1, li, "o_orderkey", "l_orderkey",
                                left_cols=["c_nationkey"],
                                right_cols=["snat", "rev"], n_buckets=32,
                                bucket_fn=bucket_partial)
    out = merge_partials(partials, ["n_nationkey"], "revenue_scaled") \
        .to_pandas()
    out = out.merge(nat[["n_nationkey", "n_name"]], on="n_nationkey")
    return out.sort_values(["revenue_scaled", "n_name"],
                           ascending=[False, True]).reset_index(drop=True) \
        [["n_name", "revenue_scaled"]].astype({"revenue_scaled": "int64"})


def q_word_burstiness_top20(sf_dir: str):
    """Collection-frequency vs document-frequency census for the top-20
    words by cf: cf/df (floor ppm) is the classic burstiness signal —
    words with cf ≫ df concentrate in few documents (topical), cf ≈ df
    spread evenly (function words).  Per-batch partial = per-word cf plus
    per-word df from the batch's (doc, word) dedup; both fold under the
    vocab guard (degrade = batchwise top-k merge on the grouped Dataset)."""
    from timberjack_ray.aggregates import merge_partials_or_ds
    from timberjack_ray.functions.relational import sorted_topk

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        w = pc.split_pattern(t["text"], " ")
        n = pc.list_value_length(w).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        docs = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), n)
        flat = pa.table({"d": pa.array(docs), "w": pc.list_flatten(w)})
        cf = flat.group_by("w").aggregate([([], "count_all")]) \
            .rename_columns(["w", "cf"])
        dfp = flat.group_by(["d", "w"]).aggregate([]) \
            .group_by("w").aggregate([([], "count_all")]) \
            .rename_columns(["w", "df"])
        j = cf.join(dfp, keys="w", join_type="inner")
        return j.rename_columns(["word", "cf", "df"])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    folded, mode = merge_partials_or_ds(parts, ["word"], ["cf", "df"])
    if mode == "driver":
        df = folded.to_pandas()
        top = df.sort_values(["cf", "word"], ascending=[False, True]) \
            .head(20).reset_index(drop=True)
    else:
        top = sorted_topk(folded, ["cf", "word"], 20,
                          descending=[True, False]).reset_index(drop=True)
    top["cf_per_df_ppm"] = (top["cf"].astype("int64") * 1_000_000
                            // top["df"].astype("int64"))
    return top[["word", "cf", "df", "cf_per_df_ppm"]] \
        .astype({"cf": "int64", "df": "int64", "cf_per_df_ppm": "int64"})


def q_word_len_stats_by_lang(sf_dir: str):
    """Per-language word-length profile: token count, total codepoint
    chars across tokens, and mean length as floor ppm — the
    morphology-complexity signal behind per-language tokenizer budgets.
    Three-int partials per lang, one tiny merge."""
    from timberjack_ray.aggregates import merge_partials_or_ds

    ds = _rp(sf_dir, "documents", columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        w = pc.split_pattern(t["text"], " ")
        n = pc.list_value_length(w).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        langs = pa.array(np.repeat(
            t["lang"].to_numpy(zero_copy_only=False), n))
        lens = pc.utf8_length(pc.list_flatten(w)).cast(pa.int64())
        g = pa.table({"lang": langs, "n": np.ones(int(n.sum()), np.int64),
                      "chars": lens}) \
            .group_by("lang").aggregate([("n", "sum"), ("chars", "sum")])
        return g.rename_columns(["lang", "n", "chars"])

    t2, _ = merge_partials_or_ds(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang"], ["n", "chars"], driver_limit=1 << 20)
    m = t2.to_pandas()
    m["mean_len_ppm"] = (m["chars"].astype("int64") * 1_000_000
                         // m["n"].astype("int64"))
    return m.rename(columns={"n": "n_words", "chars": "total_chars"}) \
        .sort_values("lang").reset_index(drop=True) \
        .astype({"n_words": "int64", "total_chars": "int64",
                 "mean_len_ppm": "int64"})


def q_stopword_density_by_source(sf_dir: str):
    """Per-source stopword density over the union stopword list (the
    same list the quality/langid oracles use): n_tokens, n_stopwords,
    and the floor-ppm share — boilerplate-vs-content signal per crawl
    source.  Two-int partials per source, one tiny merge."""
    from timberjack_ray.aggregates import merge_partials_or_ds
    from timberjack_ray.functions.text import _STOPWORDS

    stop = pa.array(sorted(set().union(*_STOPWORDS.values())), pa.string())
    ds = _rp(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        w = pc.split_pattern(t["text"], " ")
        n = pc.list_value_length(w).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        srcs = pa.array(np.repeat(
            t["source"].to_numpy(zero_copy_only=False), n))
        is_stop = pc.cast(pc.is_in(pc.list_flatten(w), value_set=stop),
                          pa.int64())
        g = pa.table({"source": srcs,
                      "n": np.ones(int(n.sum()), np.int64),
                      "s": is_stop}) \
            .group_by("source").aggregate([("n", "sum"), ("s", "sum")])
        return g.rename_columns(["source", "n", "s"])

    t2, _ = merge_partials_or_ds(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source"], ["n", "s"], driver_limit=1 << 20)
    m = t2.to_pandas()
    m["stop_ppm"] = (m["s"].astype("int64") * 1_000_000
                     // m["n"].astype("int64"))
    return m.rename(columns={"n": "n_tokens", "s": "n_stop"}) \
        .sort_values("source").reset_index(drop=True) \
        .astype({"n_tokens": "int64", "n_stop": "int64",
                 "stop_ppm": "int64"})


def q_dup_bigram_fraction(sf_dir: str):
    """Per-document duplicate-bigram occupancy (the Gopher repetition
    family, occurrence-count form): n_bigrams, repeat occurrences
    (n_bigrams − distinct bigrams), and the floor-ppm duplicate share —
    all integers, so the whole quality gate hashes.  Vectorized: flat
    word array + doc-boundary mask builds the batch's (doc, w1, w2)
    table; per-doc distinct via one Arrow group_by."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        w = pc.split_pattern(t["text"], " ")
        n = pc.list_value_length(w).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        docs = np.repeat(ids, n)
        flat = pc.list_flatten(w)
        same = docs[:-1] == docs[1:] if len(docs) > 1 \
            else np.zeros(0, bool)
        pairs = pa.table({"d": pa.array(docs[:-1][same]),
                          "w1": flat.slice(0, max(len(docs) - 1, 0))
                                    .filter(pa.array(same)),
                          "w2": flat.slice(1).filter(pa.array(same))})
        nd = pairs.group_by(["d", "w1", "w2"]).aggregate([]) \
            .group_by("d").aggregate([([], "count_all")]) \
            .rename_columns(["d", "nd"]).to_pandas().set_index("d")["nd"]
        nb = pd.Series(np.maximum(n - 1, 0), index=ids)
        ndv = nd.reindex(nb.index, fill_value=0).astype("int64")
        dup = (nb - ndv).astype("int64")
        ppm = np.where(nb > 0, dup * 1_000_000 // np.maximum(nb, 1), 0)
        return pa.table({"doc_id": pa.array(nb.index.to_numpy(np.int64)),
                         "n_bigrams": pa.array(nb.to_numpy(np.int64)),
                         "n_dup_occ": pa.array(dup.to_numpy(np.int64)),
                         "dup_ppm": pa.array(ppm.astype(np.int64))})

    out = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_priority_transition_counts(sf_dir: str):
    """Global order-priority transition census: for each customer's
    order sequence (by o_orderdate, o_orderkey tie-break), count every
    consecutive (from → to) priority pair — the Markov-chain input for
    priority-escalation analysis.  ONE custkey-bucket exchange; per
    bucket a lexsort + boundary-masked shift; merge bounded at
    priorities² rows."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.corpus import add_key_bucket

    ds = _rp(sf_dir, "orders",
             columns=["o_custkey", "o_orderkey", "o_orderdate",
                      "o_orderpriority"])

    def bucket_fn(t: pa.Table) -> pa.Table:
        cust = t["o_custkey"].to_numpy(zero_copy_only=False)
        date = t["o_orderdate"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False)
        prio = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        order = np.lexsort((okey, date, cust))
        cs, ps = cust[order], prio[order]
        same = cs[:-1] == cs[1:] if len(cs) > 1 else np.zeros(0, bool)
        g = pa.table({"prio_from": pa.array(ps[:-1][same]),
                      "prio_to": pa.array(ps[1:][same])}) \
            .group_by(["prio_from", "prio_to"]) \
            .aggregate([([], "count_all")])
        return g.rename_columns(["prio_from", "prio_to", "n"])

    parts = add_key_bucket(ds, "o_custkey", 32).groupby("__kb").map_groups(
        lambda t: bucket_fn(t.drop_columns(["__kb"])),
        batch_format="pyarrow")
    out = merge_partials(parts, ["prio_from", "prio_to"], "n").to_pandas()
    return out.sort_values(["prio_from", "prio_to"]) \
        .reset_index(drop=True).astype({"n": "int64"})


def q_user_activity_gini(sf_dir: str):
    """Gini concentration of events across users, computed from the
    COUNT-OF-COUNTS histogram — the scale-correct fold for an UNBOUNDED
    key domain (contrast source_skew_stats, which driver-sorts because
    sources are few): one user-bucket exchange completes per-user counts,
    per-bucket count-of-counts partials merge bounded by the max activity
    level, and the exact weighted rank sum comes from contiguous tie
    blocks: users at level v with m ties occupying ranks (r0, r0+m]
    contribute v·(m·r0 + m(m+1)/2).  gini_ppm = floor ppm of
    (2·WRS − (n+1)·total) / (n·total)."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.corpus import add_key_bucket
    from timberjack_ray.functions.relational import _ratio_ppm

    ds = _rp(sf_dir, "events", columns=["user_id"])

    def bucket_fn(t: pa.Table) -> pa.Table:
        g = t.group_by("user_id").aggregate([([], "count_all")]) \
            .rename_columns(["user_id", "k"])
        h = g.group_by("k").aggregate([([], "count_all")])
        return h.rename_columns(["k", "m"])

    parts = add_key_bucket(ds, "user_id", 32).groupby("__kb").map_groups(
        lambda t: bucket_fn(t.drop_columns(["__kb"])),
        batch_format="pyarrow")
    hist = merge_partials(parts, ["k"], "m").to_pandas().sort_values("k")
    k = hist["k"].to_numpy(np.int64).astype(object)
    m = hist["m"].to_numpy(np.int64).astype(object)
    n_users = int(m.sum())
    total = int((k * m).sum())
    r0 = np.concatenate([[0], np.cumsum(m)[:-1]])
    wrs = int((k * (m * r0 + m * (m + 1) // 2)).sum())
    gini = _ratio_ppm(2 * wrs - (n_users + 1) * total, n_users * total)
    return pd.DataFrame([(n_users, total, wrs, gini)],
                        columns=["n_users", "total_events",
                                 "weighted_rank_sum", "gini_ppm"]) \
        .astype("int64")


def q_orders_per_customer_hist(sf_dir: str):
    """Histogram of per-customer order counts (the engagement-depth
    distribution): one custkey-bucket exchange completes each customer's
    count, per-bucket count-of-counts partials merge bounded by the max
    order count — per-key results never reach the driver."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.corpus import add_key_bucket

    ds = _rp(sf_dir, "orders", columns=["o_custkey"])

    def bucket_fn(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([([], "count_all")]) \
            .rename_columns(["o_custkey", "k"])
        h = g.group_by("k").aggregate([([], "count_all")])
        return h.rename_columns(["n_orders", "n_customers"])

    parts = add_key_bucket(ds, "o_custkey", 32).groupby("__kb").map_groups(
        lambda t: bucket_fn(t.drop_columns(["__kb"])),
        batch_format="pyarrow")
    out = merge_partials(parts, ["n_orders"], "n_customers").to_pandas()
    return out.sort_values("n_orders").reset_index(drop=True) \
        .astype({"n_orders": "int64", "n_customers": "int64"})


def q_fulfillment_latency_hist(sf_dir: str):
    """Ship-vs-order latency histogram in whole days (truncated toward
    zero, so negative synthetic latencies bucket symmetrically and both
    engines agree): lineitem GRACE-joins orders on orderkey with a
    bucket_fn that collapses straight to (days, n) partials — the join
    output never materializes; merge volume = the latency day domain."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.relational import bucket_hash_join

    DAY_US = 86_400_000_000
    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    li = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def prep_o(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        return pa.table({"o_orderkey": t["o_orderkey"], "ots": pa.array(d)})

    def prep_l(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        return pa.table({"l_orderkey": t["l_orderkey"], "sts": pa.array(d)})

    def bucket_fn(t: pa.Table) -> pa.Table:
        diff = (t["sts"].to_numpy(zero_copy_only=False)
                - t["ots"].to_numpy(zero_copy_only=False))
        days = np.sign(diff) * (np.abs(diff) // DAY_US)
        g = pa.table({"days": pa.array(days.astype(np.int64))}) \
            .group_by("days").aggregate([([], "count_all")])
        return g.rename_columns(["days", "n"])

    parts = bucket_hash_join(
        orders.map_batches(prep_o, batch_format="pyarrow"),
        li.map_batches(prep_l, batch_format="pyarrow"),
        "o_orderkey", "l_orderkey", left_cols=["ots"], right_cols=["sts"],
        n_buckets=32, bucket_fn=bucket_fn)
    out = merge_partials(parts, ["days"], "n").to_pandas()
    return out.sort_values("days").reset_index(drop=True) \
        .astype({"days": "int64", "n": "int64"})


def q_session_duration_hist(sf_dir: str):
    """Histogram of 1h-gap session durations in whole minutes — the
    engagement-length distribution downstream of sessionization, kept as
    a histogram so the exchange volume is the duration domain, never the
    session count.  One user-bucket exchange; per bucket a lexsort, a
    vectorized gap/boundary segmentation, and min/max reduceat per
    session."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.corpus import add_key_bucket

    GAP_US, MIN_US = 3_600_000_000, 60_000_000
    ds = _rp(sf_dir, "events", columns=["user_id", "ts"])

    def bucket_fn(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, u))
        us, tss = u[order], ts[order]
        if len(us) == 0:
            return pa.table({"duration_min": pa.array([], pa.int64()),
                             "n_sessions": pa.array([], pa.int64())})
        new = np.ones(len(us), bool)
        new[1:] = (us[1:] != us[:-1]) | (tss[1:] - tss[:-1] > GAP_US)
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(us)]])
        mins = (tss[ends - 1] - tss[starts]) // MIN_US
        g = pa.table({"duration_min": pa.array(mins.astype(np.int64))}) \
            .group_by("duration_min").aggregate([([], "count_all")])
        return g.rename_columns(["duration_min", "n_sessions"])

    parts = add_key_bucket(ds, "user_id", 32).groupby("__kb").map_groups(
        lambda t: bucket_fn(t.drop_columns(["__kb"])),
        batch_format="pyarrow")
    out = merge_partials(parts, ["duration_min"], "n_sessions").to_pandas()
    return out.sort_values("duration_min").reset_index(drop=True) \
        .astype({"duration_min": "int64", "n_sessions": "int64"})


def q_concurrent_session_pairs(sf_dir: str):
    """Interval-OVERLAP self-join (functions/sessions.concurrent_span_pairs):
    count pairs of sessions from different users whose [first,last] spans
    intersect, charged to the day of the later start — bucketed sweep
    (rank − ended searchsorted), no all-pairs, only span ints shuffle."""
    from timberjack_ray.functions.sessions import concurrent_span_pairs

    ds = _rp(sf_dir, "events", columns=["user_id", "ts"])
    return concurrent_span_pairs(ds, "user_id", "ts", gap_s=3600)


def q_type_crosscorr_lags(sf_dir: str):
    """Lagged cross-correlation (raw integer dot products) between the
    hourly 'view' and 'click' count series: one partial-counts pass, then
    the lag products on the driver over the merged series — series length
    is bounded by the time range, never by row count."""
    from timberjack_ray.aggregates import counts_by

    ds = _rp(sf_dir, "events", columns=["event_type", "ts"])

    def hourly(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["event_type"], value_set=pa.array(["view", "click"]))
        t2 = t.filter(m)
        us = t2["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"event_type": t2["event_type"],
                         "h": pa.array(us // 3_600_000_000)})

    counts = counts_by(ds.map_batches(hourly, batch_format="pyarrow"),
                       ["event_type", "h"])
    v = counts[counts["event_type"] == "view"].set_index("h")["n"]
    c = counts[counts["event_type"] == "click"].set_index("h")["n"]
    rows = []
    for lag in range(7):
        tot = sum(int(n) * int(c.get(h + lag, 0)) for h, n in v.items())
        rows.append({"lag": lag, "xcorr": tot})
    return pd.DataFrame(rows).astype({"lag": "int64", "xcorr": "int64"})


def q_source_bottomk_containment(sf_dir: str):
    """Bottom-k sketch containment between source vocabularies: per source
    the 64 smallest DISTINCT Horner word hashes (a mergeable order sketch
    — per-batch bottom-k partials union to the exact global bottom-k),
    then |sketch(A) ∩ sketch(B)| per source pair — the corpus-overlap
    estimator's integer core (n_common/64 ≈ containment of the union).
    Only sources × 64 ints ever reach the driver; pair fan-out is
    O(sources²), the documented small-dimension assumption."""
    from timberjack_ray.functions.corpus import (_word_offsets,
                                                 horner_hash_strings)

    K = 64
    ds = _rp(sf_dir, "documents", columns=["source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        flat, offs = _word_offsets(words)
        wh = horner_hash_strings(flat)
        src = np.repeat(t["source"].to_numpy(zero_copy_only=False),
                        np.diff(offs))
        df = pd.DataFrame({"source": src, "h": wh}).drop_duplicates()
        df = df.sort_values(["source", "h"]).groupby("source").head(K)
        return pa.Table.from_pandas(df, preserve_index=False)

    p = _collect_result(
        ds.map_batches(partial, batch_format="pyarrow")).to_pandas()
    sk = p.drop_duplicates().sort_values(["source", "h"]) \
        .groupby("source").head(K)
    j = sk.merge(sk, on="h", suffixes=("_a", "_b"))
    j = j[j["source_a"] < j["source_b"]]
    out = j.groupby(["source_a", "source_b"], as_index=False) \
        .size().rename(columns={"size": "n_common"})
    return out.sort_values(["source_a", "source_b"]) \
        .reset_index(drop=True).astype({"n_common": "int64"})


def q_hive_partition_prune(sf_dir: str):
    """Hive-partitioned WRITE + partition-PRUNED read: write documents
    partitioned by source (one directory per key — the resumable layout
    the 100-TB contract asks for), then scan ONLY the source=src7
    directory; no byte of the other 19 partitions is listed or read."""
    import shutil
    import tempfile

    import ray.data as rd

    out_dir = tempfile.mkdtemp(prefix="tj_hive_")
    try:
        ds = _rp(sf_dir, "documents", columns=["doc_id", "source"])
        ds.write_parquet(out_dir, partition_cols=["source"])
        pruned = rd.read_parquet(os.path.join(out_dir, "source=src7"))

        def part(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return pa.table({"n_rows": pa.array([len(ids)], pa.int64()),
                             "sum_doc_id": pa.array([int(ids.sum())],
                                                    pa.int64())})

        parts = _collect_result(
            pruned.map_batches(part, batch_format="pyarrow"))
        n = int(pc.sum(parts["n_rows"]).as_py() or 0)
        s = int(pc.sum(parts["sum_doc_id"]).as_py() or 0)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return pd.DataFrame({"n_rows": [n], "sum_doc_id": [s]}).astype(
        {"n_rows": "int64", "sum_doc_id": "int64"})


def q_part_kcore(sf_dir: str):
    """Bounded-round k-core peeling (k=3, 8 rounds) of the part
    co-purchase graph (functions/graph.kcore_peel over
    graph.cooccurrence_edges): the graph-based curation filter that
    keeps only densely co-occurring items — components/pagerank/
    triangles' missing sibling.  Rounds are part of the SEMANTICS so
    the oracle unrolls them as CTE stages (open-ended peeling is not
    expressible in vanilla recursive SQL); the fixpoint early-exit is
    equivalence-preserving."""
    from timberjack_ray.functions.graph import (cooccurrence_edges,
                                                kcore_peel)

    ds = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    # edge_driver_limit=2M aligns with kcore_peel's own driver_limit so
    # the sf0.1 graph (1.2 M edges) takes the driver peel without an
    # extra distributed distinct-merge exchange first.
    edges, _mode = cooccurrence_edges(ds, "l_orderkey", "l_partkey",
                                      edge_driver_limit=2_000_000)
    return kcore_peel(edges, k=3, rounds=8)


def q_embedding_knn_join_q8(sf_dir: str):
    """Exact int8-quantized kNN self-join (functions/similarity.
    knn_join_q8): integer dot products, tie-break (score desc, id asc) —
    the oracle-checked exact twin of the IVF-bucketed embedding_knn_join
    and its recall yardstick."""
    from timberjack_ray.functions.similarity import knn_join_q8

    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return knn_join_q8(ds, k=3)


def q_part_common_neighbors(sf_dir: str):
    """Common-neighbor link prediction on the part co-purchase graph
    (functions/graph.common_neighbors_topk over graph.cooccurrence_edges):
    the top-20 NON-adjacent part pairs sharing the most co-purchase
    context through hub-damped centers (degree <= 48) — the neighborhood
    recommender ("customers who bought these also bought...") that
    completes the graph family: components/pagerank/triangles/kcore
    census EXISTING structure, this ranks MISSING links.  The degree cap
    is part of the semantics (bounds wedge fan-out at cap^2/2 per center
    at any scale) and the SQL oracle replays the identical restriction."""
    from timberjack_ray.functions.graph import (common_neighbors_topk,
                                                cooccurrence_edges)

    ds = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    # edge_driver_limit=2M matches kcore/pair guards: measured crossover
    # at sf0.1 is 4.5 s driver vs 19.6 s distributed (two saved
    # all-to-alls); past 2M edges the distributed plan takes over.
    edges, _mode = cooccurrence_edges(ds, "l_orderkey", "l_partkey",
                                      edge_driver_limit=2_000_000)
    return common_neighbors_topk(edges, k=20, degree_cap=48)


def q_event_value_ks(sf_dir: str):
    """EXACT two-sample Kolmogorov-Smirnov distance between the purchase
    and click value distributions, as the integer
    ``ks_num = max_v |F1(v)·N2 − F2(v)·N1|`` over the shared cent domain
    (KS = ks_num / (N1·N2)) — the rank-based drift detector that
    complements event_value_drift's total-variation statistic (TV sees
    mass moved anywhere; KS sees where the CDFs diverge, robust to
    binning).  One (type, cents) count-per-value partial pass; the merge
    is value-DOMAIN-bounded; the CDF scan folds on the driver in PYTHON
    ints so the cross terms can't overflow before the final cast."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.util import scale_to_int

    A, B = "purchase", "click"

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"],
                              value_set=pa.array([A, B])))
        g = pa.table({"event_type": t["event_type"],
                      "cents": scale_to_int(t["value"], 100)}) \
            .group_by(["event_type", "cents"]).aggregate(
                [([], "count_all")])
        return g.rename_columns(["event_type", "cents", "c"])

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    h = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                       ["event_type", "cents"], "c").to_pandas()
    ca = dict(zip(h[h["event_type"] == A]["cents"],
                  h[h["event_type"] == A]["c"]))
    cb = dict(zip(h[h["event_type"] == B]["cents"],
                  h[h["event_type"] == B]["c"]))
    n1 = int(sum(ca.values()))
    n2 = int(sum(cb.values()))
    f1 = f2 = 0
    ks = 0
    for v in sorted(set(ca) | set(cb)):
        f1 += int(ca.get(v, 0))
        f2 += int(cb.get(v, 0))
        ks = max(ks, abs(f1 * n2 - f2 * n1))
    return pd.DataFrame({"n1": [n1], "n2": [n2], "ks_num": [ks]}) \
        .astype({"n1": "int64", "n2": "int64", "ks_num": "int64"})


def q_events_ipc_roundtrip(sf_dir: str):
    """Arrow IPC (Feather) source-format leg: the events table exported
    once per sf to sharded IPC files (scaffolding, cached in /dev/shm),
    read back DISTRIBUTED through ``read_binary_files`` + a per-file
    ``pa.ipc.open_file`` decode inside ``map_batches`` (the custom-
    binary-source plumbing pattern — CSV/JSONL use built-in readers,
    this leg proves the opaque-bytes decode path multimodal sources
    share), then per-type exact (count, cent-sum) partials hash-checked
    against the parquet oracle.  IPC preserves the Arrow doubles
    bit-exactly, so the cents replay is an identity."""
    import glob as _glob
    import hashlib

    import pyarrow.ipc as pipc
    import pyarrow.parquet as pq
    import ray.data as rd

    from timberjack_ray.aggregates import merge_partials

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out = f"/dev/shm/tj_ipc_{tag}"
    if not os.path.exists(f"{out}/_done"):
        os.makedirs(out, exist_ok=True)
        t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                          columns=["event_type", "value"])
        n, k = t.num_rows, 4
        for i in range(k):
            lo = i * n // k
            with pipc.new_file(f"{out}/part-{i}.arrow",
                               t.schema) as w:
                w.write_table(t.slice(lo, (i + 1) * n // k - lo))
        with open(f"{out}/_done", "w") as f:
            f.write("ok")
    files = rd.read_binary_files(sorted(_glob.glob(f"{out}/part-*.arrow")))

    def decode_and_partial(t: pa.Table) -> pa.Table:
        from timberjack_ray.functions.util import scale_to_int

        # file-level loop (a batch holds whole files, never rows)
        tabs = [pipc.open_file(pa.BufferReader(b.as_py())).read_all()
                for b in t["bytes"]]
        ev = pa.concat_tables(tabs)
        g = pa.table({"event_type": ev["event_type"],
                      "cents": scale_to_int(ev["value"], 100)}) \
            .group_by("event_type").aggregate(
                [([], "count_all"), ("cents", "sum")])
        return g.rename_columns(["event_type", "n", "cents"])

    outdf = merge_partials(
        files.map_batches(decode_and_partial, batch_format="pyarrow"),
        ["event_type"], ["n", "cents"]).to_pandas()
    return outdf.sort_values("event_type").reset_index(drop=True) \
        .astype({"n": "int64", "cents": "int64"})


def q_fk_violation_audit(sf_dir: str):
    """Referential-integrity audit across the star schema
    (functions/validate.fk_orphan_count): for each FK relation, the exact
    count of child rows whose non-null key has no parent row — the
    cross-TABLE data-quality gate (validate() checks per-row contracts;
    this checks cross-table contracts) every warehouse ingest runs.
    Each relation is ONE co-partitioning left-anti exchange over (key, n)
    child partials vs distinct parent keys; neither side ever broadcasts
    or folds on the driver, so the audit holds at any dimension size."""
    import ray

    from timberjack_ray.functions.validate import (fk_orphan_count,
                                                   fk_orphan_probe_multi,
                                                   parent_keys_under)

    parents = {
        "nation": ("n_nationkey",),
        "customer": ("c_custkey",),
        "orders": ("o_orderkey",),
        "part": ("p_partkey",),
        "supplier": ("s_suppkey",),
    }
    refs = {}
    for tbl, (pk,) in parents.items():
        keys = parent_keys_under(_rp(sf_dir, tbl, columns=[pk]), pk)
        refs[tbl] = ray.put(keys) if keys is not None else None

    # fact-table passes: each child table is scanned ONCE however many
    # FKs it carries (lineitem probes 3 dimensions in one pass)
    plan = [
        ("customer", [("c_nationkey", "nation",
                       "customer.c_nationkey->nation")]),
        ("events", [("user_id", "customer", "events.user_id->customer")]),
        ("lineitem", [
            ("l_orderkey", "orders", "lineitem.l_orderkey->orders"),
            ("l_partkey", "part", "lineitem.l_partkey->part"),
            ("l_suppkey", "supplier", "lineitem.l_suppkey->supplier")]),
        ("orders", [("o_custkey", "customer",
                     "orders.o_custkey->customer")]),
    ]
    rows = []
    for child_tbl, fks in plan:
        bcast = [(ck, ptbl, rel) for ck, ptbl, rel in fks
                 if refs[ptbl] is not None]
        anti = [(ck, ptbl, rel) for ck, ptbl, rel in fks
                if refs[ptbl] is None]
        if bcast:
            cds = _rp(sf_dir, child_tbl,
                      columns=[ck for ck, _, _ in bcast])
            res = fk_orphan_probe_multi(
                cds, [(ck, refs[ptbl]) for ck, ptbl, _ in bcast])
            rows += [(rel, nc, no) for (_, _, rel), (nc, no)
                     in zip(bcast, res)]
        for ck, ptbl, rel in anti:  # dimension too large to broadcast
            pk = parents[ptbl][0]
            nc, no = fk_orphan_count(
                _rp(sf_dir, child_tbl, columns=[ck]), ck,
                _rp(sf_dir, ptbl, columns=[pk]), pk)
            rows.append((rel, nc, no))
    rows.sort()
    return pd.DataFrame(rows, columns=["relation", "n_child", "n_orphans"]) \
        .astype({"n_child": "int64", "n_orphans": "int64"})


def q_source_p95_median(sf_dir: str):
    """Quantile-of-quantiles roll-up: each source's EXACT type-1 p95 of
    document length (functions/relational.grouped_quantiles — shuffle
    volume is the value histogram, never rows), then the type-1 median of
    those p95s across sources on the driver (source domain, bounded) —
    the two-level "typical worst case per shard" summary fleet dashboards
    aggregate, exact at both levels."""
    from timberjack_ray.functions.relational import grouped_quantiles

    ds = _rp(sf_dir, "documents", columns=["source", "n_chars"])
    per_src = grouped_quantiles(ds, "source", "n_chars", [0.95], scale=1)
    p95 = np.sort(per_src["value_scaled"].to_numpy())
    n = len(p95)
    med = int(p95[max(int(np.ceil(0.5 * n)), 1) - 1]) if n else 0
    return pd.DataFrame({"n_sources": [n], "median_p95": [med]}) \
        .astype({"n_sources": "int64", "median_p95": "int64"})


def q_events_orc_roundtrip(sf_dir: str):
    """ORC source-format leg: events exported once per sf to sharded ORC
    (scaffolding, cached in /dev/shm), read back DISTRIBUTED through
    ``read_binary_files`` + per-file ``pyarrow.orc`` decode inside
    ``map_batches``, then per-type exact (count, cent-sum) partials
    hash-checked against the parquet oracle — the third columnar-format
    leg (Parquet native, Arrow IPC, ORC) plus CSV/JSONL text legs.  ORC
    stores the doubles bit-exactly, so the cents replay is an identity."""
    import glob as _glob
    import hashlib

    import pyarrow.orc as porc
    import pyarrow.parquet as pq
    import ray.data as rd

    from timberjack_ray.aggregates import merge_partials

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out = f"/dev/shm/tj_orc_{tag}"
    if not os.path.exists(f"{out}/_done"):
        os.makedirs(out, exist_ok=True)
        t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                          columns=["event_type", "value"])
        n, k = t.num_rows, 4
        for i in range(k):
            lo = i * n // k
            porc.write_table(t.slice(lo, (i + 1) * n // k - lo),
                             f"{out}/part-{i}.orc")
        with open(f"{out}/_done", "w") as f:
            f.write("ok")
    files = rd.read_binary_files(sorted(_glob.glob(f"{out}/part-*.orc")))

    def decode_and_partial(t: pa.Table) -> pa.Table:
        import pyarrow.orc as porc2

        from timberjack_ray.functions.util import scale_to_int

        # file-level loop (a batch holds whole files, never rows)
        tabs = [porc2.ORCFile(pa.BufferReader(b.as_py())).read()
                for b in t["bytes"]]
        ev = pa.concat_tables(tabs)
        g = pa.table({"event_type": ev["event_type"],
                      "cents": scale_to_int(ev["value"], 100)}) \
            .group_by("event_type").aggregate(
                [([], "count_all"), ("cents", "sum")])
        return g.rename_columns(["event_type", "n", "cents"])

    outdf = merge_partials(
        files.map_batches(decode_and_partial, batch_format="pyarrow"),
        ["event_type"], ["n", "cents"]).to_pandas()
    return outdf.sort_values("event_type").reset_index(drop=True) \
        .astype({"n": "int64", "cents": "int64"})


def q_embedding_top_pc_q8(sf_dir: str):
    """Dominant principal direction by INTEGER power iteration on the q8
    Gram matrix (functions/similarity.top_pc_q8, 8 rounds) — the
    hash-checked twin of the float embedding_top_pc: only the d² Gram
    partials cross the exchange, the 8 fixed rounds run in python ints
    on the driver, and the SQL oracle unrolls each round with HUGEINT
    arithmetic and the same trunc-safe sign·(|w|·scale // max) rule."""
    from timberjack_ray.functions.similarity import top_pc_q8

    ds = _rp(sf_dir, "embeddings", columns=["embedding"])
    return top_pc_q8(ds, rounds=8)


def q_mmr_diverse_topk_q8(sf_dir: str):
    """MMR diverse top-5 under pure int64 arithmetic (functions/
    similarity.mmr_select_q8, query = corpus vector 0, pool m=64,
    λ=7/10) — the hash-checked twin of the float mmr_diverse_topk: the
    shared q8 clamp quantization removes the one float-normalization
    step SQL could not replay, and the greedy selection unrolls as one
    (max-sel-sim join + argmax LIMIT 1) CTE stage per rank."""
    from timberjack_ray.functions.similarity import mmr_select_q8

    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return mmr_select_q8(ds, query_id=0, k=5, m=64)


def q_user_rolling_median(sf_dir: str):
    """Per-user EXACT rolling median of event value over the last 15
    events (functions/relational.rolling_quantile_per_key_ds) — the
    robust anomaly baseline a rolling MEAN cannot give (one spike drags
    a mean for 15 rows; a median shrugs it off).  One user-bucket
    exchange; per bucket a single lexsort + a (n×15) shifted-column sort
    with segment-sentinel masking; bit-exact vs the SQL
    quantile_disc window."""
    from timberjack_ray.functions.relational import \
        rolling_quantile_per_key_ds

    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "value"])
    out = rolling_quantile_per_key_ds(ds, "user_id", "ts", "event_id",
                                      "value", window=15, q=0.5,
                                      scale=100).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True) \
        .astype({"event_id": "int64", "roll_q": "int64"})


def q_quantile_norm_chars(sf_dir: str):
    """EXACT quantile normalization of document length across sources
    (functions/corpus.quantile_normalize_ds): each doc's within-source
    rank maps onto the GLOBAL length distribution, so every source ends
    up with identical normalized-length distribution — the calibration
    step that makes one corpus-wide threshold meaningful over
    heterogeneous sources.  One histogram fold (value-domain-bounded) +
    one source-bucket exchange; replays in SQL as ROW_NUMBER windows
    joined to global order statistics with the same integer ceil-div."""
    from timberjack_ray.functions.corpus import quantile_normalize_ds

    ds = _rp(sf_dir, "documents", columns=["source", "n_chars", "doc_id"])
    out = quantile_normalize_ds(ds, "source", "n_chars", "doc_id",
                                out_col="norm_chars").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True) \
        .astype({"doc_id": "int64", "norm_chars": "int64"})


def q_part_bfs_hops(sf_dir: str):
    """Bounded-round BFS distances (functions/graph.bfs_hops, 4 rounds)
    from the minimum part over the co-purchase graph — per-node exact
    shortest-hop distance, the graph family's "how far?" member
    (components answer "same cluster?", pagerank "how central?").
    Rounds are SEMANTICS (the oracle unrolls each frontier expansion as
    a CTE stage); the fixpoint early-exit is equivalence-preserving."""
    from timberjack_ray.functions.graph import bfs_hops, cooccurrence_edges

    ds = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges, _mode = cooccurrence_edges(ds, "l_orderkey", "l_partkey",
                                      edge_driver_limit=2_000_000)
    return bfs_hops(edges, rounds=4)


def q_part_neighbor_jaccard(sf_dir: str):
    """Neighborhood-Jaccard link prediction on the part co-purchase
    graph (functions/graph.neighbor_jaccard_topk over
    graph.cooccurrence_edges): the top-20 NON-adjacent part pairs by the
    scaled-integer Jaccard of their neighborhoods
    ``jscore = cn*1e9 // (deg(x)+deg(y)-cn)`` — the NORMALIZED sibling
    of part_common_neighbors (raw cn favors big-degree pairs; Jaccard
    surfaces low-degree twins), completing the link-prediction pair the
    way value_mad_by_type complements plain stddev.  The degree-48 hub
    cap on wedge centers is shared semantics with the cn query and the
    SQL oracle replays both the cap and the integer floor division."""
    from timberjack_ray.functions.graph import (cooccurrence_edges,
                                                neighbor_jaccard_topk)

    ds = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges, _mode = cooccurrence_edges(ds, "l_orderkey", "l_partkey",
                                      edge_driver_limit=2_000_000)
    return neighbor_jaccard_topk(edges, k=20, degree_cap=48)


def q_copurchase_assortativity(sf_dir: str):
    """Degree-assortativity sufficient statistics of the part
    co-purchase graph (functions/graph.degree_assortativity_stats):
    ONE row (m2, sxy, sx, sx2) of exact ints over the symmetrized edge
    list — Pearson assortativity r = (m2*sxy−sx²)/(m2*sx2−sx²) is the
    consumer's float.  Answers "do popular parts co-sell with popular
    parts?" (r>0) vs "hubs bridge long tails" (r<0) — the one-number
    structural profile that tells you whether hot-key salting will see
    hub-hub edges (both sides hot) or hub-leaf (one side).  Degrees fold
    under the node-vocabulary guard and broadcast once; edges stream."""
    from timberjack_ray.functions.graph import (cooccurrence_edges,
                                                degree_assortativity_stats)

    ds = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges, _mode = cooccurrence_edges(ds, "l_orderkey", "l_partkey",
                                      edge_driver_limit=2_000_000)
    return degree_assortativity_stats(edges)


def q_value_zscore_breaches(sf_dir: str):
    """Rolling z-score control-chart census over event values
    (functions/window.rolling_zscore_breach_counts): per user, order by
    (ts, event_id); over each FULL 15-row trailing window flag values
    more than 3 population sigmas from the window mean via the
    denominator-cleared integer rule (15x−S)² > 9(15Q−S²) on cents —
    per-event-type (n_eval, n_breach).  The point-outlier companion of
    error_cusum_alarms (CUSUM detects sustained level SHIFTS; a control
    chart counts isolated spikes against a LOCAL baseline — the
    telemetry-quality op a log pipeline runs on latency columns).  One
    key-bucket exchange, segmented padded cumsums, group-bounded merge."""
    from timberjack_ray.functions.window import rolling_zscore_breach_counts

    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "value", "event_type"])
    return rolling_zscore_breach_counts(
        ds, "user_id", "ts", "event_id", "value", "event_type",
        window=15, k_sigma=3, scale=100)


def q_session_path_top20(sf_dir: str):
    """Clickstream path mining (functions/sessions.session_path_topk):
    sessionize events per user with the 1-hour gap rule (the
    session_counts rule), render each session as its '>'-joined
    event-type sequence in (ts, event_id) order, census identical
    journeys, return the top-20 by (n desc, path) — the whole-journey
    census (event_path_trigrams sees 3-grams; funnels test ONE
    hypothesis; this surfaces the journeys you didn't hypothesize).
    Full paths fold to per-bucket partials immediately and never
    re-shuffle; the merge is path-vocabulary-guarded with a distributed
    sorted_topk degrade."""
    from timberjack_ray.functions.sessions import session_path_topk

    ds = _rp(sf_dir, "events",
             columns=["user_id", "ts", "event_id", "event_type"])
    return session_path_topk(ds, "user_id", "ts", "event_id",
                             "event_type", gap_s=3600, k=20)


def q_doc_rrf_fusion_top20(sf_dir: str):
    """Hybrid-retrieval rank fusion (functions/text.rrf_fusion_topk):
    fuse two deterministic integer relevance rankings over documents —
    by n_chars and by single-space token count (the doc_token_counts
    rule) — with reciprocal-rank fusion under RANK() tie semantics and
    the exact-integer score sum(1e12 // (60 + rank_i)); top-20 by
    (rrf desc, doc_id).  The combiner that merges a BM25 list with an
    ANN list in hybrid search, run here over SQL-replayable signals so
    the whole fusion is hash-checked (bm25_docs/ann stay the rows-only
    float twins).  Two streaming passes, histogram-guarded rank census,
    NO row shuffle — rank ties share a value by construction so no
    global sort is needed."""
    from timberjack_ray.functions.text import rrf_fusion_topk

    def scores(t: pa.Table) -> pa.Table:
        toks = pc.list_value_length(
            pc.split_pattern(t["text"], " ")).cast(pa.int64())
        return pa.table({"doc_id": t["doc_id"],
                         "n_chars": t["n_chars"],
                         "n_tok": toks})

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "n_chars"]) \
        .map_batches(scores, batch_format="pyarrow")
    return rrf_fusion_topk(ds, "doc_id", ["n_chars", "n_tok"], k=20)


def q_value_moment_stats(sf_dir: str):
    """Per-event-type EXACT moment sufficient statistics to order 4
    (functions/relational.grouped_moment_stats): (n, Σc, Σc², Σc³, Σc⁴)
    on cents, the Σc³/Σc⁴ sums carried through int64-safe LIMB
    arithmetic (c²=a·1e5+b decomposition, Python-int recombination on
    the type-bounded fold) and emitted as base-1e18 (hi, lo) pairs that
    the SQL oracle replays from HUGEINT sums with the identical
    non-negative-remainder split.  Skewness/kurtosis — the
    distribution-SHAPE drift signals that move before the mean does —
    are the consumer's floats over these ints.  One streaming pass, no
    shuffle, partials |types| rows per batch."""
    from timberjack_ray.functions.relational import grouped_moment_stats

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    return grouped_moment_stats(ds, "event_type", "value", scale=100)


def q_order_session_overlap(sf_dir: str):
    """Keyed interval-overlap join, counting form
    (functions/sessions.session_window_overlap_counts): user sessions
    (1-hour gap rule) vs the 3-hour window after each PURCHASE event by
    the same user — per purchase day-of-month: total overlapping
    (session, window) pairs (a 3h window can span several sessions —
    the gap rule is 1h), windows with >= 1 overlapping session, and
    window count.  The attribution interval join ("was the user
    mid-session while the offer window was open?") that asof_join
    (nearest point) and range_join (banded points) don't express: BOTH
    sides are intervals.  One tagged-union hash(key) exchange; per-key
    session disjointness turns the count into two composite
    searchsorteds — no pair expansion.  (Orders vs events would be the
    natural pairing but the synth tables put them in disjoint YEARS —
    purchase windows keep the truth non-degenerate.)"""
    from timberjack_ray.functions.sessions import \
        session_window_overlap_counts

    events = _rp(sf_dir, "events", columns=["user_id", "ts"])

    def purchases(t: pa.Table) -> pa.Table:
        m = pc.equal(t["event_type"], "purchase")
        t = t.filter(m)
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "day": pc.strftime(t["ts"], format="%d")})

    right = _rp(sf_dir, "events",
                columns=["user_id", "ts", "event_type"]) \
        .map_batches(purchases, batch_format="pyarrow")
    return session_window_overlap_counts(
        events, "user_id", "ts", 3600, right, "user_id",
        "ts", 10_800_000_000, "day")


def q_fuzzy_name_pairs(sf_dir: str):
    """FastSS deletion-neighborhood entity resolution
    (functions/linkage.ed1_neighbor_census): degree histogram of the
    Levenshtein-distance-1 graph over a deterministic 1-in-5 subset of
    customer names (how many other names are one edit away — the fuzzy
    blocking a catalog/crawl-metadata linkage pipeline needs).  Our side
    never compares string pairs: each name emits O(len) deletion-variant
    blocking keys, one hash(variant) exchange co-locates them, and
    positional certificates decide distance 1 with pure integer logic
    — vs the SQL oracle's all-pairs ``levenshtein`` join, which is the
    quadratic plan this operator exists to avoid (the subset keeps the
    oracle tractable at sf0.1).  Alphabet-bounded variant groups, driver
    sees only the degree histogram."""
    from timberjack_ray.functions.linkage import ed1_neighbor_census

    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def subset(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False)
        keep = pa.array(k % 5 == 0)
        return t.filter(keep)

    return ed1_neighbor_census(
        cust.map_batches(subset, batch_format="pyarrow"),
        "c_name", "c_custkey")


def q_orders_pareto(sf_dir: str):
    """Distributed 2-D skyline (functions/relational.skyline_2d):
    Pareto-optimal orders trading off EARLIEST order date (minimize)
    against HIGHEST price (maximize), strict dominance — the
    multi-criteria shortlist operator (Borzsony et al. 2001) Ray Data
    lacks.  Per-batch (date, max cents) partials -> one distinct-date
    groupby -> driver strict-prefix cummax -> broadcast frontier ->
    streaming filter; rows never sort globally and the driver sees only
    distinct dates.  Output: the frontier rows."""
    from timberjack_ray.functions.relational import skyline_2d
    from timberjack_ray.functions.util import scale_to_int

    orders = _rp(sf_dir, "orders",
                 columns=["o_orderkey", "o_orderdate", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "d": t["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()),
            "p": scale_to_int(t["o_totalprice"], 100),
        })

    out = skyline_2d(orders.map_batches(prep, batch_format="pyarrow"),
                     "d", "p")
    return out.to_pandas().sort_values(["d", "o_orderkey"]) \
        .reset_index(drop=True)


def q_orders_weighted_sample(sf_dir: str):
    """Weighted bottom-k priority sample
    (functions/corpus.priority_sample_bottomk): 200 orders drawn with
    probability proportional to price — priority = (splitmix64(key)>>1)
    // cents, global bottom-k by (priority, key).  The MERGEABLE
    weighted-sampling sketch (bottom-k of a union = bottom-k of merged
    bottom-k's): per-batch partials keep k rows, no exchange, exact under
    any partitioning; the SQL oracle replays the splitmix64 chain in
    HUGEINT and takes the same ORDER BY LIMIT."""
    from timberjack_ray.functions.corpus import priority_sample_bottomk
    from timberjack_ray.functions.util import scale_to_int

    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "cents": scale_to_int(t["o_totalprice"], 100)})

    out = priority_sample_bottomk(
        orders.map_batches(prep, batch_format="pyarrow"),
        "o_orderkey", "cents", 200)
    return out.rename(columns={"id": "o_orderkey", "w": "w_cents"})


def q_purchase_prepost(sf_dir: str):
    """Event-anchored pre/post window census
    (functions/sessions.anchored_prepost_sums): around every PURCHASE
    event, sum the same user's event value cents strictly within the 7
    days before vs the 7 days after, rolled up per anchor month —
    interrupted-time-series sufficient statistics ("did engagement move
    after the purchase?").  A range join + groupby would pair-expand
    every (anchor, event); here one tagged-union hash(user) exchange,
    one lexsort + cumsum per bucket, and four composite searchsorteds
    per anchor resolve the band sums with no pair ever materialized."""
    from timberjack_ray.functions.sessions import anchored_prepost_sums
    from timberjack_ray.functions.util import scale_to_int

    events = _rp(sf_dir, "events", columns=["user_id", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "cents": scale_to_int(t["value"], 100)})

    def anchors(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "grp": pc.strftime(t["ts"], format="%m")})

    a = _rp(sf_dir, "events", columns=["user_id", "ts", "event_type"]) \
        .map_batches(anchors, batch_format="pyarrow")
    out = anchored_prepost_sums(
        events.map_batches(prep, batch_format="pyarrow"),
        "user_id", "ts", "cents", a, "user_id", "ts", "grp",
        7 * 86_400_000_000)
    return out.rename(columns={"pre": "pre_cents", "post": "post_cents"})


def q_ushape_attribution(sf_dir: str):
    """U-shaped (40/20/40) multi-touch attribution
    (functions/sessions.ushape_attribution): credit in exact basis
    points across each user's touches strictly before their first
    purchase — first and last touch 4000 bp each, middles split 2000 by
    integer division (remainder to the last), single touch takes all
    10000 — summed per touch event type.  One hash(user) exchange, one
    lexsort + reduceat per bucket; replayed in SQL by ROW_NUMBER /
    COUNT windows and the same integer CASE."""
    from timberjack_ray.functions.sessions import ushape_attribution

    events = _rp(sf_dir, "events",
                 columns=["user_id", "ts", "event_id", "event_type"])
    return ushape_attribution(events, "user_id", "ts", "event_id",
                              "event_type", "purchase")


def q_orders_rendezvous(sf_dir: str):
    """Rendezvous (highest-random-weight) placement census
    (functions/corpus.rendezvous_census): every order key placed on the
    shard (of 8) maximizing splitmix64(splitmix64(key) XOR salt_s) —
    the consistent-placement primitive for resumable partitioned output
    (dropping a shard moves only its own keys).  Pure per-row
    arithmetic, n_shards-row partials, no exchange; the SQL oracle
    replays both splitmix64 chains in HUGEINT and takes the same
    cross-join argmax."""
    from timberjack_ray.functions.corpus import rendezvous_census

    orders = _rp(sf_dir, "orders", columns=["o_orderkey"])
    return rendezvous_census(orders, "o_orderkey", 8)


def q_priority_share_by_month(sf_dir: str):
    """Ratio-to-report window (functions/relational.share_within_group):
    each order priority's revenue share within its order month, exact
    integer ppm (v * 10^6 // month_total) — the percent-of-total window
    every reporting stack needs, with per-batch (month, priority) sum
    partials and a |months x priorities|-bounded driver merge."""
    from timberjack_ray.functions.relational import share_within_group
    from timberjack_ray.functions.util import scale_to_int

    orders = _rp(sf_dir, "orders",
                 columns=["o_orderdate", "o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "month": pc.strftime(t["o_orderdate"], format="%Y-%m"),
            "prio": t["o_orderpriority"],
            "cents": scale_to_int(t["o_totalprice"], 100)})

    return share_within_group(
        orders.map_batches(prep, batch_format="pyarrow"),
        "month", "prio", "cents")


def q_value_sax_motifs(sf_dir: str):
    """SAX symbolic motif census (functions/sessions.sax_motif_census):
    per-user event-value series -> integer PAA frame sums (4 events per
    frame, full frames only) -> 4-letter alphabet by GLOBAL exact
    quartiles of the frame-sum population -> census of every within-user
    3-gram of consecutive frame symbols.  Two streaming passes (quartile
    selection via exact_quantile_bisect, then a 64-bin bincount per
    bucket); replayed in SQL by ROW_NUMBER frames + quantile_disc +
    a LEAD-concatenated CASE ladder."""
    from timberjack_ray.functions.sessions import sax_motif_census
    from timberjack_ray.functions.util import scale_to_int

    events = _rp(sf_dir, "events",
                 columns=["user_id", "ts", "event_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "event_id": t["event_id"],
                         "cents": scale_to_int(t["value"], 100)})

    return sax_motif_census(
        events.map_batches(prep, batch_format="pyarrow"),
        "user_id", "ts", "event_id", "cents", frame=4, word=3)


def q_events_pivot_by_day(sf_dir: str):
    """PIVOT / crosstab surface op (functions/relational.pivot_counts):
    events reshaped WIDE — one row per day-of-week, one n_<type> column
    per event type (fixed category list).  Per-batch (row, cat) count
    partials; the driver reshape handles |rows x categories| cells,
    never data rows.  SQL replays with FILTER aggregates."""
    from timberjack_ray.functions.relational import pivot_counts

    events = _rp(sf_dir, "events", columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"dow": pc.strftime(t["ts"], format="%w"),
                         "et": t["event_type"]})

    return pivot_counts(events.map_batches(prep, batch_format="pyarrow"),
                        "dow", "et",
                        ["view", "click", "purchase", "signup", "error"])


def q_value_stump_split(sf_dir: str):
    """Exact-integer decision stump (functions/ml.best_stump_split):
    the value-cents threshold best separating event types by the
    multiclass-Gini purity objective, made hash-stable by scoring with
    one shared floor division (python big ints here, HUGEINT in SQL) —
    CART's root-split step on sufficient statistics: the (value, class)
    histogram is the only thing that ever leaves the workers."""
    from timberjack_ray.functions.ml import best_stump_split
    from timberjack_ray.functions.util import scale_to_int

    events = _rp(sf_dir, "events", columns=["value", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"cents": scale_to_int(t["value"], 100),
                         "et": t["event_type"]})

    return best_stump_split(
        events.map_batches(prep, batch_format="pyarrow"), "cents", "et")


def q_snm_blocking_census(sf_dir: str):
    """Sorted-neighborhood blocking census
    (functions/linkage.snm_candidate_census): candidates = customer-name
    pairs within 5 positions of the name sort order (1-in-5 key subset),
    matches = those at exact edit distance 1 — the blocking-quality
    census for the OTHER classic linkage strategy (one range exchange +
    an O(n*w) sweep, vs FastSS's hash exchange).  Cross-block junctions
    resolve from 2(w-1) slim edge rows per block on the driver; the SQL
    oracle replays with a ROW_NUMBER rank-window self-join +
    levenshtein."""
    from timberjack_ray.functions.linkage import snm_candidate_census

    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def subset(t: pa.Table) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(k % 5 == 0))

    return snm_candidate_census(
        cust.map_batches(subset, batch_format="pyarrow"),
        "c_name", "c_custkey", window=5)


def q_type_dow_chi2(sf_dir: str):
    """Exact-integer chi-square independence statistic
    (functions/relational.chi2_scaled): is event type independent of
    day-of-week?  Only the |types x days| contingency counts leave the
    workers; the per-cell rational (N*O - R*C)^2 / (N*R*C) is floored
    once at 10^9 scale identically in python big ints and SQL HUGEINT —
    the drift/independence screen on categorical pairs."""
    from timberjack_ray.functions.relational import chi2_scaled

    events = _rp(sf_dir, "events", columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"et": t["event_type"],
                         "dow": pc.strftime(t["ts"], format="%w")})

    return chi2_scaled(events.map_batches(prep, batch_format="pyarrow"),
                       "et", "dow")


def q_part_communities(sf_dir: str):
    """Bounded-round synchronous label propagation (3 rounds,
    functions/graph.label_propagation_census) over the part co-purchase
    graph: every node adopts its neighbors' majority label, ties to the
    smallest — deterministic LPA, so the round count is SEMANTICS and
    the oracle unrolls each round as one (votes, argmax) CTE pair.
    Community census output; completes the graph family's local-majority
    clustering member beside components/pagerank/kcore/bfs."""
    from timberjack_ray.functions.graph import (cooccurrence_edges,
                                                label_propagation_census)

    ds = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    edges, _mode = cooccurrence_edges(ds, "l_orderkey", "l_partkey",
                                      edge_driver_limit=2_000_000)
    return label_propagation_census(edges, rounds=3)


def q_source_weighted_sample(sf_dir: str):
    """Per-source weighted bottom-k sample
    (functions/corpus.grouped_priority_sample): 20 docs per source drawn
    with probability proportional to character length — the per-domain
    mixture-construction subsample, mergeable (k-per-group pruned
    exchange) and bit-identical under any partitioning; SQL replays the
    splitmix64 priority + ROW_NUMBER window."""
    from timberjack_ray.functions.corpus import grouped_priority_sample

    docs = _rp(sf_dir, "documents", columns=["source", "doc_id", "text"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "source": t["source"], "doc_id": t["doc_id"],
            "w": pc.max_element_wise(
                pc.utf8_length(t["text"]).cast(pa.int64()), 1)})

    return grouped_priority_sample(
        docs.map_batches(prep, batch_format="pyarrow"),
        "source", "doc_id", "w", 20)


def q_user_golden_record(sf_dir: str):
    """MDM survivorship merge (functions/relational.survivorship_merge):
    per-user golden record where each field independently keeps its
    latest NON-NULL value by (ts, event_id) — value cents are planted
    null on error events, so a newer error row must NOT erase the older
    value while the event type still advances.  One hash(user) exchange,
    one lexsort + masked maximum.reduceat gather per column; the SQL
    oracle replays with per-column filtered ROW_NUMBER windows."""
    from timberjack_ray.functions.relational import survivorship_merge
    from timberjack_ray.functions.util import scale_to_int

    events = _rp(sf_dir, "events",
                 columns=["user_id", "ts", "event_id", "event_type",
                          "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = scale_to_int(t["value"], 100)
        isv = pc.invert(pc.equal(t["event_type"], "error"))
        return pa.table({
            "user_id": t["user_id"], "ts": t["ts"],
            "event_id": t["event_id"], "last_type": t["event_type"],
            "last_cents": pc.if_else(isv, cents,
                                     pa.nulls(t.num_rows, pa.int64()))})

    out = survivorship_merge(
        events.map_batches(prep, batch_format="pyarrow"),
        "user_id", "ts", "event_id", ["last_type", "last_cents"]) \
        .to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_copurchase_lift_top20(sf_dir: str):
    """Market-basket LIFT ranking (exact-integer twin of the count-
    ranked q_copurchase_top20): pairs scored by
    10^6 * N * n_ab // (n_a * n_b) — lift > 1e6 means the parts co-occur
    more than independence predicts; min-support n_ab >= 5 keeps tiny
    denominators from dominating.  Same one-exchange pair kernel; the
    part-degree fold is part-domain-bounded and the basket count is one
    scalar.  The rational lift is floored once, identically in python
    ints and SQL HUGEINT."""
    from timberjack_ray.aggregates import merge_partials, \
        merge_partials_or_ds
    from timberjack_ray.functions.corpus import add_key_bucket
    from timberjack_ray.functions.graph import _offset_pairs

    def batch_distinct(t: pa.Table) -> pa.Table:
        return (t.select(["l_orderkey", "l_partkey"])
                .group_by(["l_orderkey", "l_partkey"]).aggregate([]))

    def per_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        g = t["l_orderkey"].to_numpy(zero_copy_only=False)
        i = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((i, g))
        gs, it = g[order], i[order]
        keep = np.r_[True, (gs[1:] != gs[:-1]) | (it[1:] != it[:-1])]
        gs, it = gs[keep], it[keep]
        a, b = _offset_pairs(gs, it)
        if not len(a):
            return empty
        gby = pa.table({"u": pa.array(a), "v": pa.array(b)}) \
            .group_by(["u", "v"]).aggregate([([], "count_all")])
        return gby.rename_columns(["u", "v", "n"])

    gi = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"]) \
        .map_batches(batch_distinct, batch_format="pyarrow")
    bucketed = add_key_bucket(gi, "l_orderkey", 64)
    p = bucketed.groupby("__kb").map_groups(
        lambda t: per_bucket(t.drop_columns(["__kb"])),
        batch_format="pyarrow")
    edges, mode = merge_partials_or_ds(p, ["u", "v"], ["n"])

    def deg_bucket(t: pa.Table) -> pa.Table:
        # bucket holds ALL rows of its orders -> global (g, i) dedup here
        if t.num_rows == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        dd = t.group_by(["l_orderkey", "l_partkey"]).aggregate([])
        g = dd.group_by("l_partkey").aggregate([([], "count_all")])
        return g.rename_columns(["i", "c"])

    def ord_partial(t: pa.Table) -> pa.Table:
        u = pc.unique(t["l_orderkey"].combine_chunks())
        return pa.table({"g": u, "one": pa.array(
            np.ones(len(u), np.int64))})

    deg = merge_partials(
        bucketed.groupby("__kb").map_groups(
            lambda t: deg_bucket(t.drop_columns(["__kb"])),
            batch_format="pyarrow"),
        ["i"], ["c"]).to_pandas()
    nb = merge_partials(gi.map_batches(ord_partial,
                                       batch_format="pyarrow"),
                        ["g"], ["one"]).to_pandas()
    n_baskets = len(nb)
    deg = deg.sort_values("i").reset_index(drop=True)
    di = deg["i"].to_numpy().astype(np.int64)
    dc = deg["c"].to_numpy().astype(np.int64)
    # int64 lift-domain guards: the SQL replay is HUGEINT, so both numpy
    # products must be checked, not assumed (n_ab <= max part degree;
    # the denominator is a degree product)
    if dc.size and (10 ** 6 * n_baskets * int(dc.max()) >= 2 ** 63
                    or int(dc.max()) ** 2 >= 2 ** 63):
        raise ValueError("copurchase_lift_top20: lift terms exceed "
                         "int64 — rescale before the vector kernel")

    def lift_topk(t: pa.Table) -> pa.Table:
        """Vectorized exact-integer lift + per-block top-20 prune (the
        docstring's degrade contract: the driver never holds the edge
        set — only <= 20 rows per block reach the fold)."""
        t = t.filter(pc.greater_equal(t["n"], 5))
        if t.num_rows == 0:
            return pa.table({"u": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "lift_ppm": pa.array([], pa.int64())})
        uu = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        vv = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        nn = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        cu = dc[np.searchsorted(di, uu)]
        cv = dc[np.searchsorted(di, vv)]
        lp = (10 ** 6 * n_baskets * nn) // (cu * cv)
        k = min(20, len(lp))
        pk = np.lexsort((vv, uu, -lp))[:k]
        return pa.table({"u": pa.array(uu[pk]), "v": pa.array(vv[pk]),
                         "n": pa.array(nn[pk]),
                         "lift_ppm": pa.array(lp[pk])})

    if mode != "driver":  # pragma: no cover - past the edge guard
        pruned = edges.map_batches(lift_topk, batch_format="pyarrow")
        ed = _collect_result(pruned).to_pandas()  # <= 20 x blocks rows
    else:
        if isinstance(edges, pd.DataFrame):
            edges = pa.Table.from_pandas(edges, preserve_index=False)
        ed = lift_topk(edges).to_pandas()
    out = ed.sort_values(["lift_ppm", "u", "v"],
                         ascending=[False, True, True]).head(20) \
        .reset_index(drop=True)
    return out[["u", "v", "n", "lift_ppm"]].astype("int64")


def q_decay_attribution(sf_dir: str):
    """Time-decay multi-touch attribution
    (functions/sessions.decay_attribution): each touch before its user's
    first purchase earns base >> (age // one-day-halflife) credit —
    recency weighting as a pure integer function of touch age (halving
    per half-life), bit-identical to the SQL integer-shift replay.  The
    recency-weighted sibling of ushape_attribution, same one-exchange
    lexsort + reduceat plan with no rank pass."""
    from timberjack_ray.functions.sessions import decay_attribution

    events = _rp(sf_dir, "events",
                 columns=["user_id", "ts", "event_type"])
    return decay_attribution(events, "user_id", "ts", "event_type",
                             "purchase", 86_400_000_000)


def q_doc_kfold_census(sf_dir: str):
    """Stratified 5-fold assignment census (functions/corpus.
    kfold_census): fold = splitmix64(doc_id) % 5, per (source, fold)
    counts — reproducible cross-validation folds any worker can route
    without coordination; the HUGEINT splitmix64 chain replays the
    assignment and the census proves per-stratum balance."""
    from timberjack_ray.functions.corpus import kfold_census

    docs = _rp(sf_dir, "documents", columns=["doc_id", "source"])
    return kfold_census(docs, "doc_id", "source", 5)


def q_event_value_cvm(sf_dir: str):
    """EXACT two-sample Cramer-von Mises statistic between the purchase
    and click value distributions — the squared-CDF-gap drift detector
    completing the family (TV sees moved mass, KS the worst gap, CvM
    the INTEGRATED gap, sensitive to many small divergences): per
    pooled distinct value, term = w_v * (F1*N2 - F2*N1)^2 // (N1*N2)
    (w_v = pooled count), summed — one shared floor per value, python
    ints = SQL HUGEINT.  Same count-per-value partial pass and
    value-domain-bounded merge as event_value_ks."""
    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.util import scale_to_int

    A, B = "purchase", "click"

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"],
                              value_set=pa.array([A, B])))
        g = pa.table({"event_type": t["event_type"],
                      "cents": scale_to_int(t["value"], 100)}) \
            .group_by(["event_type", "cents"]).aggregate(
                [([], "count_all")])
        return g.rename_columns(["event_type", "cents", "c"])

    ds = _rp(sf_dir, "events", columns=["event_type", "value"])
    h = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                       ["event_type", "cents"], "c").to_pandas()
    ca = dict(zip(h[h["event_type"] == A]["cents"],
                  h[h["event_type"] == A]["c"]))
    cb = dict(zip(h[h["event_type"] == B]["cents"],
                  h[h["event_type"] == B]["c"]))
    n1 = int(sum(ca.values()))
    n2 = int(sum(cb.values()))
    f1 = f2 = 0
    tot = 0
    for v in sorted(set(ca) | set(cb)):
        a = int(ca.get(v, 0))
        b = int(cb.get(v, 0))
        f1 += a
        f2 += b
        d = f1 * n2 - f2 * n1
        tot += (a + b) * d * d // (n1 * n2)
    return pd.DataFrame({"n1": [n1], "n2": [n2], "cvm_scaled": [tot]}) \
        .astype({"n1": "int64", "n2": "int64", "cvm_scaled": "int64"})


def q_purchase_value_percentiles(sf_dir: str):
    """Cross-population ECDF calibration
    (functions/relational.ecdf_percentile_census): each purchase value
    scored by its percentile (exact integer ppm) within the VIEW-value
    reference distribution, census per purchase month — "where do this
    month's purchases sit against baseline browsing?".  Reference folds
    once (domain-bounded histogram), broadcasts; one streaming
    searchsorted pass over purchases; the SQL oracle replays via an
    ASOF-style max-cumulative join."""
    from timberjack_ray.functions.relational import ecdf_percentile_census
    from timberjack_ray.functions.util import scale_to_int

    ev = _rp(sf_dir, "events", columns=["event_type", "ts", "value"])

    def views(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "view"))
        return pa.table({"cents": scale_to_int(t["value"], 100)})

    def purchases(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "purchase"))
        return pa.table({"cents": scale_to_int(t["value"], 100),
                         "month": pc.strftime(t["ts"], format="%m")})

    return ecdf_percentile_census(
        ev.map_batches(views, batch_format="pyarrow"), "cents",
        ev.map_batches(purchases, batch_format="pyarrow"), "cents",
        "month")


def q_doc_negative_samples(sf_dir: str):
    """Deterministic contrastive negative sampling
    (functions/corpus.negative_sample_census): 4 negatives per document
    drawn by splitmix64(id*5 + j + 1) % N over the dense doc-id space
    (one +1 probe on self-collision) — training-pair construction any
    worker performs without coordination; per-source count + exact
    negative-id checksum, HUGEINT chain + generate_series replay."""
    from timberjack_ray.functions.corpus import negative_sample_census

    docs = _rp(sf_dir, "documents", columns=["doc_id", "source"])
    n_total = docs.count()
    return negative_sample_census(docs, "doc_id", "source", 4, n_total)


def q_doc_padding_waste(sf_dir: str):
    """Length-bucketed batching census: documents bucketed by
    next-power-of-two word count (the standard length-bucketing step
    before padded batch assembly); per bucket: n_docs, sum_words, and
    padding waste = n*bucket_cap - sum_words with waste_ppm =
    waste*10^6 // (n*cap) — the batching-efficiency audit that decides
    bucket boundaries for training throughput.  Pure per-batch
    arithmetic on word counts, |buckets| partials, no exchange."""
    from timberjack_ray.aggregates import merge_partials

    docs = _rp(sf_dir, "documents", columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        w = pc.list_value_length(pc.split_pattern(t["text"], " ")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = np.maximum(w, 1)
        cap = np.int64(1) << np.ceil(np.log2(w)).astype(np.int64)
        cap = np.maximum(cap, 1)
        g = pa.table({"bucket_cap": pa.array(cap),
                      "w": pa.array(w)}) \
            .group_by("bucket_cap").aggregate([([], "count_all"),
                                               ("w", "sum")])
        return g.rename_columns(["bucket_cap", "n_docs", "sum_words"])

    out = merge_partials(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["bucket_cap"], ["n_docs", "sum_words"]).to_pandas()
    out["waste"] = out["n_docs"] * out["bucket_cap"] - out["sum_words"]
    out["waste_ppm"] = out["waste"] * 1_000_000 // \
        (out["n_docs"] * out["bucket_cap"])
    return out.sort_values("bucket_cap").reset_index(drop=True) \
        .astype({c: "int64" for c in
                 ["bucket_cap", "n_docs", "sum_words", "waste",
                  "waste_ppm"]})


def q_part_shortest_costs(sf_dir: str):
    """Bounded-round integer Bellman-Ford (4 rounds,
    functions/graph.bellman_ford_bounded) over the part co-purchase
    graph with edge cost 10^6 // co-purchase-count (strong ties are
    cheap): exact min-cost within 4 edges from the minimum part — the
    WEIGHTED sibling of part_bfs_hops (hops ignore tie strength), with
    rounds as SEMANTICS so the oracle unrolls each relaxation as one
    min-fold CTE."""
    from timberjack_ray.aggregates import merge_partials_or_ds
    from timberjack_ray.functions.corpus import add_key_bucket
    from timberjack_ray.functions.graph import (_offset_pairs,
                                                bellman_ford_bounded)

    def batch_distinct(t: pa.Table) -> pa.Table:
        return (t.select(["l_orderkey", "l_partkey"])
                .group_by(["l_orderkey", "l_partkey"]).aggregate([]))

    def per_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        g = t["l_orderkey"].to_numpy(zero_copy_only=False)
        i = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((i, g))
        gs, it = g[order], i[order]
        keep = np.r_[True, (gs[1:] != gs[:-1]) | (it[1:] != it[:-1])]
        gs, it = gs[keep], it[keep]
        a, b = _offset_pairs(gs, it)
        if not len(a):
            return empty
        gby = pa.table({"u": pa.array(a), "v": pa.array(b)}) \
            .group_by(["u", "v"]).aggregate([([], "count_all")])
        return gby.rename_columns(["u", "v", "n"])

    gi = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"]) \
        .map_batches(batch_distinct, batch_format="pyarrow")
    p = add_key_bucket(gi, "l_orderkey", 64).groupby("__kb").map_groups(
        lambda t: per_bucket(t.drop_columns(["__kb"])),
        batch_format="pyarrow")
    edges, mode = merge_partials_or_ds(p, ["u", "v"], ["n"])
    if mode != "driver":  # pragma: no cover - past the edge guard
        # stream straight into the broadcast-map degrade: cost transform
        # per batch, no whole-edge-set driver concat (round 5)
        def to_w(t: pa.Table) -> pa.Table:
            n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({"u": t["u"], "v": t["v"],
                             "w": pa.array(1_000_000 // n)})

        return bellman_ford_bounded(
            edges.map_batches(to_w, batch_format="pyarrow"),
            rounds=4, driver_limit=0)
    ed = edges.to_pandas()
    ed["w"] = (1_000_000 // ed["n"]).astype("int64")
    return bellman_ford_bounded(ed[["u", "v", "w"]], rounds=4)


def q_frequent_triples(sf_dir: str):
    """Frequent 3-ITEMSET mining (Apriori depth beyond
    copurchase_top20's pairs): part triples co-purchased in >= 2 orders,
    top-20 by (support desc, parts asc) — per bucket the sorted deduped
    (order, part) segments expand triples with a double-offset sweep
    (trips bounded by basket-size^2, baskets are small by domain), the
    guarded multi-key merge degrades to a distributed groupby past the
    driver limit, and only support >= 2 survivors rank."""
    from timberjack_ray.aggregates import merge_partials_or_ds
    from timberjack_ray.functions.corpus import add_key_bucket
    from timberjack_ray.functions.relational import sorted_topk

    def batch_distinct(t: pa.Table) -> pa.Table:
        return (t.select(["l_orderkey", "l_partkey"])
                .group_by(["l_orderkey", "l_partkey"]).aggregate([]))

    def per_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({"x": pa.array([], pa.int64()),
                          "y": pa.array([], pa.int64()),
                          "z": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        g = t["l_orderkey"].to_numpy(zero_copy_only=False)
        i = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((i, g))
        gs, it = g[order], i[order]
        keep = np.r_[True, (gs[1:] != gs[:-1]) | (it[1:] != it[:-1])]
        gs, it = gs[keep], it[keep]
        new = np.r_[True, gs[1:] != gs[:-1]]
        sizes = np.diff(np.r_[np.flatnonzero(new), len(gs)])
        seg_of = np.repeat(np.arange(len(sizes)), sizes)
        mx = int(sizes.max()) if len(sizes) else 0
        xs, ys, zs = [], [], []
        for d2 in range(2, mx):
            left = np.arange(len(it) - d2)
            same = seg_of[left] == seg_of[left + d2]
            lv = left[same]
            for d1 in range(1, d2):
                xs.append(it[lv])
                ys.append(it[lv + d1])
                zs.append(it[lv + d2])
        if not xs:
            return empty
        tbl = pa.table({"x": pa.array(np.concatenate(xs)),
                        "y": pa.array(np.concatenate(ys)),
                        "z": pa.array(np.concatenate(zs))})
        gby = tbl.group_by(["x", "y", "z"]).aggregate([([], "count_all")])
        return gby.rename_columns(["x", "y", "z", "n"])

    gi = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"]) \
        .map_batches(batch_distinct, batch_format="pyarrow")
    p = add_key_bucket(gi, "l_orderkey", 64).groupby("__kb").map_groups(
        lambda t: per_bucket(t.drop_columns(["__kb"])),
        batch_format="pyarrow")
    merged, mode = merge_partials_or_ds(p, ["x", "y", "z"], ["n"])
    if mode == "driver":
        df = merged.to_pandas()
        df = df[df["n"] >= 2].sort_values(
            ["n", "x", "y", "z"], ascending=[False, True, True, True]) \
            .head(20).reset_index(drop=True)
        return df.astype("int64")
    # pragma: no cover - past the triple guard: distributed filter + topk
    flt = merged.filter(lambda r: r["n"] >= 2)
    out = sorted_topk(flt, ["n", "x", "y", "z"], 20,
                      descending=[True, False, False, False])
    return out[["x", "y", "z", "n"]].reset_index(drop=True).astype("int64")


def q_lineitem_pareto_3d(sf_dir: str):
    """3-D skyline (functions/relational.skyline_nd): Pareto-optimal
    lineitems on (max quantity, max price cents, min discount bp) over a
    deterministic 1-in-64 order subset (keeps the quadratic NOT-EXISTS
    oracle tractable at sf0.1) — the general-dimension sibling of
    orders_pareto: local per-batch skylines merge because
    skyline(union) = skyline(union of skylines); equal points all
    survive."""
    from timberjack_ray.functions.relational import skyline_nd
    from timberjack_ray.functions.util import scale_to_int

    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_quantity", "l_extendedprice",
                      "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(k % 64 == 0))
        return pa.table({
            "qty": scale_to_int(t["l_quantity"], 1),
            "price_cents": scale_to_int(t["l_extendedprice"], 100),
            "disc_bp": scale_to_int(t["l_discount"], 10_000)})

    return skyline_nd(li.map_batches(prep, batch_format="pyarrow"),
                      [("qty", "max"), ("price_cents", "max"),
                       ("disc_bp", "min")])


def q_part_widest_ties(sf_dir: str):
    """Bounded-round widest (max-bottleneck) path (4 rounds,
    functions/graph.widest_path_bounded): the (max, min) semiring twin
    of part_shortest_costs — width(v) = strongest chain of co-purchase
    ties from the minimum part, edge weight = co-purchase count, seed
    width = the documented 10^9 source convention.  Same unrolled
    per-round fold oracle, MAX(MIN(width, w))."""
    from timberjack_ray.aggregates import merge_partials_or_ds
    from timberjack_ray.functions.corpus import add_key_bucket
    from timberjack_ray.functions.graph import (_offset_pairs,
                                                widest_path_bounded)

    def batch_distinct(t: pa.Table) -> pa.Table:
        return (t.select(["l_orderkey", "l_partkey"])
                .group_by(["l_orderkey", "l_partkey"]).aggregate([]))

    def per_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({"u": pa.array([], pa.int64()),
                          "v": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        g = t["l_orderkey"].to_numpy(zero_copy_only=False)
        i = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((i, g))
        gs, it = g[order], i[order]
        keep = np.r_[True, (gs[1:] != gs[:-1]) | (it[1:] != it[:-1])]
        gs, it = gs[keep], it[keep]
        a, b = _offset_pairs(gs, it)
        if not len(a):
            return empty
        gby = pa.table({"u": pa.array(a), "v": pa.array(b)}) \
            .group_by(["u", "v"]).aggregate([([], "count_all")])
        return gby.rename_columns(["u", "v", "n"])

    gi = _rp(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"]) \
        .map_batches(batch_distinct, batch_format="pyarrow")
    p = add_key_bucket(gi, "l_orderkey", 64).groupby("__kb").map_groups(
        lambda t: per_bucket(t.drop_columns(["__kb"])),
        batch_format="pyarrow")
    edges, mode = merge_partials_or_ds(p, ["u", "v"], ["n"])
    if mode != "driver":  # pragma: no cover
        # stream into the (max, min)-semiring broadcast-map degrade
        # (round 5) — no whole-edge-set driver concat
        def to_w(t: pa.Table) -> pa.Table:
            return pa.table({"u": t["u"], "v": t["v"], "w": t["n"]})

        return widest_path_bounded(
            edges.map_batches(to_w, batch_format="pyarrow"),
            rounds=4, driver_limit=0)
    ed = edges.to_pandas().rename(columns={"n": "w"})
    return widest_path_bounded(ed, rounds=4)


def q_flag_pareto(sf_dir: str):
    """Group-wise skyline (functions/relational.grouped_skyline_nd):
    per return flag, the Pareto frontier of (max quantity, min discount
    bp) over the 1-in-64 order subset — "best tradeoffs per segment",
    each group's frontier independent; same local-skyline distribution
    law, partials per (batch, group)."""
    from timberjack_ray.functions.relational import grouped_skyline_nd
    from timberjack_ray.functions.util import scale_to_int

    li = _rp(sf_dir, "lineitem",
             columns=["l_orderkey", "l_returnflag", "l_quantity",
                      "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(k % 64 == 0))
        return pa.table({
            "flag": t["l_returnflag"],
            "qty": scale_to_int(t["l_quantity"], 1),
            "disc_bp": scale_to_int(t["l_discount"], 10_000)})

    return grouped_skyline_nd(
        li.map_batches(prep, batch_format="pyarrow"), "flag",
        [("qty", "max"), ("disc_bp", "min")])


def q_view_no_click_1h(sf_dir: str):
    """Negation-window join (functions/sessions.absent_followup_census):
    per month, how many VIEW events got NO click from the same user
    strictly within the following hour — the abandonment/absence
    operator funnels can't express (they count presence; an anti-join
    after a range join would materialize exactly the pairs whose
    absence is the answer).  One tagged-union hash(user) exchange, two
    composite searchsorteds per anchor."""
    from timberjack_ray.functions.sessions import absent_followup_census

    events = _rp(sf_dir, "events",
                 columns=["user_id", "ts", "event_type"])
    return absent_followup_census(events, "user_id", "ts", "event_type",
                                  "view", "click", 3_600_000_000)


def q_sliding_distinct_users(sf_dir: str):
    """DISTINCT-aggregation over sliding windows: distinct users per 1h
    window sliding every 30min — the sliding sibling of
    distinct_users_per_type: in-batch window fan-out (each event joins
    its 2 covering windows) + per-batch (window, user) distinct
    collapse, ONE (window, user) exchange makes distinctness global,
    then per-window count partials merge window-bounded."""
    from timberjack_ray.aggregates import merge_partials

    ds = _rp(sf_dir, "events", columns=["ts", "user_id"])

    def fanout(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        k = us // 1_800_000_000
        u = t["user_id"].to_numpy(zero_copy_only=False)
        ws = np.concatenate([k * 1800, (k - 1) * 1800])
        uu = np.concatenate([u, u])
        g = pa.table({"window_start": pa.array(ws.astype(np.int64)),
                      "u": pa.array(uu)}) \
            .group_by(["window_start", "u"]).aggregate([])
        return g

    pairs = ds.map_batches(fanout, batch_format="pyarrow") \
        .groupby(["window_start", "u"]).count()  # global distinct keys
    pairs = pairs.map_batches(
        lambda t: t.select(["window_start", "u"]).group_by(
            ["window_start"]).aggregate([([], "count_all")])
        .rename_columns(["window_start", "n"]),
        batch_format="pyarrow")
    out = merge_partials(pairs, ["window_start"], ["n"]).to_pandas()
    return out.sort_values("window_start").reset_index(drop=True) \
        .astype({"window_start": "int64", "n": "int64"})


def q_top_event_gaps(sf_dir: str):
    """Outage finder: the 10 largest gaps between CONSECUTIVE events in
    the whole stream, with the gap's start instant — one range exchange
    (sort on ts), per-block internal diffs keep only a local top-10
    plus the block's first/last instants (2 slim rows), and the driver
    stitches junction gaps between adjacent blocks — the
    boundary-chained scan decomposition, so no block ever sees another
    block's rows.  Ordered (gap_us desc, start_us asc)."""
    ds = _rp(sf_dir, "events", columns=["ts"])
    srt = ds.sort("ts")

    def per_block(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        empty = pa.table({"kind": pa.array([], pa.string()),
                          "gap_us": pa.array([], pa.int64()),
                          "start_us": pa.array([], pa.int64())})
        if len(us) == 0:
            return empty
        rows_k, rows_g, rows_s = ["edge", "edge"], [0, 0], \
            [int(us[0]), int(us[-1])]
        d = np.diff(us)
        if len(d):
            top = np.argsort(-d, kind="stable")[:10]
            rows_k += ["gap"] * len(top)
            rows_g += [int(x) for x in d[top]]
            rows_s += [int(x) for x in us[top]]
        return pa.table({"kind": pa.array(rows_k),
                         "gap_us": pa.array(rows_g, pa.int64()),
                         "start_us": pa.array(rows_s, pa.int64())})

    rec = _collect_result(
        srt.map_batches(per_block, batch_format="pyarrow")).to_pandas()
    gaps = rec[rec["kind"] == "gap"][["gap_us", "start_us"]]
    edges = rec[rec["kind"] == "edge"].sort_values("start_us")
    # one junction gap per adjacent (block last, next block first) pair:
    # edge rows per block are (first, last) — sorted globally they
    # interleave as f0 l0 f1 l1 ...; junction gap = f_{i+1} - l_i
    ev = edges["start_us"].to_numpy()
    if len(ev) >= 4:
        lasts = ev[1:-1:2]
        firsts = ev[2::2]
        jg = pd.DataFrame({"gap_us": firsts - lasts, "start_us": lasts})
        gaps = pd.concat([gaps, jg], ignore_index=True)
    out = gaps.sort_values(["gap_us", "start_us"],
                           ascending=[False, True]).head(10) \
        .reset_index(drop=True)
    return out.astype({"gap_us": "int64", "start_us": "int64"})


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # --- first 50: all oracle-checked (driver CORRECTNESS window) ---
        "tpch_q1_qty": q_tpch_q1_qty,
        "event_type_counts": q_event_type_counts,
        "event_trends": q_event_trends,
        "event_top3": q_event_top3,
        "props_field_filter": q_props_field_filter,
        "pattern_filter_docs": q_pattern_filter_docs,
        "regex_extract_docs": q_regex_extract_docs,
        "enrich_customers": q_enrich_customers,
        "route_counts_docs": q_route_counts_docs,
        "dedup_exact_docs": q_dedup_exact_docs,
        "decontaminate_docs": q_decontaminate_docs,
        "chunk_docs": q_chunk_docs,
        "doc_token_counts": q_doc_token_counts,
        "ann_topk": q_ann_topk,
        "orders_price_stats": q_orders_price_stats,
        "distinct_users_per_type": q_distinct_users_per_type,
        "top10_orders": q_top10_orders,
        "orders_by_nation": q_orders_by_nation,
        "doc_repetition_ratio": q_doc_repetition_ratio,
        "value_histogram": q_value_histogram,
        "asof_signup": q_asof_signup,
        "event_pairs_1h": q_event_pairs_1h,
        "orders_top3_per_cust": q_orders_top3_per_cust,
        "doc_word_topk": q_doc_word_topk,
        "revenue_by_priority": q_revenue_by_priority,
        "sliding_window_counts": q_sliding_window_counts,
        "session_counts": q_session_counts,
        "value_quantiles": q_value_quantiles,
        "curation_pipeline": q_curation_pipeline,
        "tpch_q3": q_tpch_q3,
        "order_chain_components": q_order_chain_components,
        "pii_counts": q_pii_counts,
        "split_counts": q_split_counts,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "multimodal_decode_real": q_multimodal_decode_real,
        "event_pairs_1h_grace": q_event_pairs_1h_grace,
        "skewed_user_revenue": q_skewed_user_revenue,
        "quality_scores": q_quality_scores,
        "langid": q_langid,
        "auto_join_revenue": q_auto_join_revenue,
        "supplier_part_pagerank": q_supplier_part_pagerank,
        "weighted_median_price": q_weighted_median_price,
        "user_funnel": q_user_funnel,
        "content_hash_docs": q_content_hash_docs,
        "sampled_docs": q_sampled_docs,
        "user_interarrival": q_user_interarrival,
        "seq_pack_bins": q_seq_pack_bins,
        "bigram_topk": q_bigram_topk,
        "doc_top_term": q_doc_top_term,
        "props_templates": q_props_templates,
        # --- rows-only (no SQL oracle; covered by pytest planted-truth) ---
        "heavy_hitter_words": q_heavy_hitter_words,
        "seq_level_counts": q_seq_level_counts,
        "seq_trends": q_seq_trends,
        "seq_top_errors": q_seq_top_errors,
        "seq_count_pattern": q_seq_count_pattern,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "embedding_near_dup": q_embedding_near_dup,
        "ann_ivf": q_ann_ivf,
        "fingerprints": q_fingerprints,
        "multimodal_decode": q_multimodal_decode,
        "stream_levels": q_stream_levels,
        "approx_distinct_users": q_approx_distinct_users,
        "approx_distinct_users_by_type":
            q_approx_distinct_users_by_type,
        # --- remaining oracle-checked + rows-only, original order ---
        "quality_histogram": q_quality_histogram,
        "best_doc_per_lang": q_best_doc_per_lang,
        "heavy_user_filter": q_heavy_user_filter,
        "grouped_sample_events": q_grouped_sample_events,
        "value_quantiles_by_type": q_value_quantiles_by_type,
        "user_rolling_value": q_user_rolling_value,
        "shuffle_export_counts": q_shuffle_export_counts,
        "source_token_shares": q_source_token_shares,
        "custs_without_orders": q_custs_without_orders,
        "seq_pack_tokens": q_seq_pack_tokens,
        "audio_features": q_audio_features,
        "rare_bigram_counts": q_rare_bigram_counts,
        "session_spans": q_session_spans,
        "normalized_distinct_docs": q_normalized_distinct_docs,
        "hdr_value_quantiles": q_hdr_value_quantiles,
        "hdr_value_quantiles_checked": q_hdr_value_quantiles_checked,
        "actor_ids_union": q_actor_ids_union,
        "actor_ids_intersect": q_actor_ids_intersect,
        "quality_rule_violations": q_quality_rule_violations,
        "dup_cluster_histogram": q_dup_cluster_histogram,
        "error_rate_anomalies": q_error_rate_anomalies,
        "pii_scrub_docs": q_pii_scrub_docs,
        "dup_ngram_doc_frac": q_dup_ngram_doc_frac,
        "event_rule_violations": q_event_rule_violations,
        "events_profile": q_events_profile,
        "winsorized_value_sums": q_winsorized_value_sums,
        "label_centroid_sums": q_label_centroid_sums,
        "stratified_sample_events": q_stratified_sample_events,
        "recent_event_counts": q_recent_event_counts,
        "audio_features_real": q_audio_features_real,
        "domain_rebalance": q_domain_rebalance,
        "orders_rollup": q_orders_rollup,
        "bloom_decontaminate_docs": q_bloom_decontaminate_docs,
        "stream_windowed_counts": q_stream_windowed_counts,
        "ann_topk_q8": q_ann_topk_q8,
        "lineitem_corr_stats": q_lineitem_corr_stats,
        "char_budget_sample": q_char_budget_sample,
        "event_value_ranks": q_event_value_ranks,
        "event_transitions": q_event_transitions,
        "doc_entropy": q_doc_entropy,
        "embedding_dedup": q_embedding_dedup,
        "value_mad_by_type": q_value_mad_by_type,
        "retention_cohorts": q_retention_cohorts,
        "tpch_q10": q_tpch_q10,
        "tpch_q5": q_tpch_q5,
        "tpch_q14": q_tpch_q14,
        "tpch_q18": q_tpch_q18,
        "tpch_q19": q_tpch_q19,
        "value_quantiles_cont": q_value_quantiles_cont,
        "chunk_dedup_docs": q_chunk_dedup_docs,
        "perplexity_scores": q_perplexity_scores,
        "contamination_stats": q_contamination_stats,
        "bpe_pair_counts": q_bpe_pair_counts,
        "event_debounce": q_event_debounce,
        "nation_order_counts": q_nation_order_counts,
        "cross_dedup_docs": q_cross_dedup_docs,
        "inverted_index": q_inverted_index,
        "corpus_drift_words": q_corpus_drift_words,
        "tpch_q6": q_tpch_q6,
        "tpch_q13": q_tpch_q13,
        "tpch_q17": q_tpch_q17,
        "first_touch_counts": q_first_touch_counts,
        "new_users_per_day": q_new_users_per_day,
        "tpch_q7": q_tpch_q7,
        "session_type_pairs": q_session_type_pairs,
        "tpch_q8": q_tpch_q8,
        "tpch_q15": q_tpch_q15,
        "tpch_q22": q_tpch_q22,
        "dup_span_positions": q_dup_span_positions,
        "event_value_ntiles": q_event_value_ntiles,
        "curation_pipeline_v2": q_curation_pipeline_v2,
        "typo_pairs": q_typo_pairs,
        "range_partition_stats": q_range_partition_stats,
        "event_path_trigrams": q_event_path_trigrams,
        "vocab_coverage": q_vocab_coverage,
        "sliding_window_distinct_users": q_sliding_window_distinct_users,
        "top_event_per_hour": q_top_event_per_hour,
        "corpus_diff_counts": q_corpus_diff_counts,
        "value_percentile_ranks": q_value_percentile_ranks,
        "bpe_merges": q_bpe_merges,
        "bpe_fertility": q_bpe_fertility,
        "span_dedup_savings": q_span_dedup_savings,
        "frame_sample_real": q_frame_sample_real,
        "source_vocab_overlap": q_source_vocab_overlap,
        "user_value_cumsum": q_user_value_cumsum,
        "max_concurrent_values": q_max_concurrent_values,
        "embedding_dispersion": q_embedding_dispersion,
        "exact_sample_per_source": q_exact_sample_per_source,
        "remove_dup_spans": q_remove_dup_spans,
        "tpch_q4": q_tpch_q4,
        "tpch_q12": q_tpch_q12,
        "tpch_q21": q_tpch_q21,
        "tpch_q9": q_tpch_q9,
        "tpch_q16": q_tpch_q16,
        "tpch_q2": q_tpch_q2,
        "tpch_q11": q_tpch_q11,
        "pps_sample_docs": q_pps_sample_docs,
        "balanced_shards": q_balanced_shards,
        "mixture_schedule": q_mixture_schedule,
        "continuation_topk": q_continuation_topk,
        "dedup_keep_best_docs": q_dedup_keep_best_docs,
        "curation_kill_reasons": q_curation_kill_reasons,
        "stream_dedup_docs": q_stream_dedup_docs,
        "stream_near_dup_pairs": q_stream_near_dup_pairs,
        "stream_quota_admit": q_stream_quota_admit,
        "curation_pipeline_v3": q_curation_pipeline_v3,
        "ngram_novelty": q_ngram_novelty,
        "embedding_top_pc": q_embedding_top_pc,
        "selfjoin_size_by_type": q_selfjoin_size_by_type,
        "selfjoin_size_ams": q_selfjoin_size_ams,
        "source_skew_stats": q_source_skew_stats,
        "cdc_dedup_stats": q_cdc_dedup_stats,
        "multiline_stitch": q_multiline_stitch,
        "value_trend_components": q_value_trend_components,
        "approx_actor_overlap": q_approx_actor_overlap,
        "stream_chunk_novelty": q_stream_chunk_novelty,
        "part_triangles": q_part_triangles,
        "dsir_scores": q_dsir_scores,
        "stream_heavy_hitters": q_stream_heavy_hitters,
        "user_decayed_value": q_user_decayed_value,
        "value_outlier_counts": q_value_outlier_counts,
        "bm25_docs": q_bm25_docs,
        "semantic_dedup_stats": q_semantic_dedup_stats,
        "value_quantiles_bisect": q_value_quantiles_bisect,
        "orders_skyline": q_orders_skyline,
        "event_last_order_gap": q_event_last_order_gap,
        "actor_ids_except": q_actor_ids_except,
        "user_value_window_1h": q_user_value_window_1h,
        "tpch_q20": q_tpch_q20,
        "ann_topk_filtered": q_ann_topk_filtered,
        "event_next_order_wait": q_event_next_order_wait,
        "orders_cube": q_orders_cube,
        "event_trends_gapfilled": q_event_trends_gapfilled,
        "user_longest_streak": q_user_longest_streak,
        "actor_activity_full": q_actor_activity_full,
        "embedding_dim_stats": q_embedding_dim_stats,
        "split_leakage": q_split_leakage,
        "logreg_label3": q_logreg_label3,
        "embedding_knn_join": q_embedding_knn_join,
        "orders_upsert_latest": q_orders_upsert_latest,
        "join_size_exact": q_join_size_exact,
        "mmr_diverse_topk": q_mmr_diverse_topk,
        "user_active_time": q_user_active_time,
        "logreg_auc": q_logreg_auc,
        "zorder_layout": q_zorder_layout,
        "urgent_revenue_bloom": q_urgent_revenue_bloom,
        "user_funnel_1h": q_user_funnel_1h,
        "stream_rate_limit": q_stream_rate_limit,
        "rfm_segments": q_rfm_segments,
        "weekly_event_growth": q_weekly_event_growth,
        "session_size_histogram": q_session_size_histogram,
        "flag_weighted_median_price": q_flag_weighted_median_price,
        "ship_latency_quantiles": q_ship_latency_quantiles,
        "event_type_user_overlap": q_event_type_user_overlap,
        "order_value_lorenz": q_order_value_lorenz,
        "signup_to_purchase_survival": q_signup_to_purchase_survival,
        "error_cusum_alarms": q_error_cusum_alarms,
        "customer_ltv_curve": q_customer_ltv_curve,
        "ab_experiment_report": q_ab_experiment_report,
        "copurchase_top20": q_copurchase_top20,
        "transition_latency": q_transition_latency,
        "funnel_step_latency": q_funnel_step_latency,
        "logreg_calibration": q_logreg_calibration,
        "source_compress_ratio": q_source_compress_ratio,
        "event_heatmap": q_event_heatmap,
        "value_log2_histogram": q_value_log2_histogram,
        "customer_monthly_streaks": q_customer_monthly_streaks,
        "basket_size_histogram": q_basket_size_histogram,
        "seq_pack_sharded": q_seq_pack_sharded,
        "winnow_fingerprints": q_winnow_fingerprints,
        "ann_ivf_full": q_ann_ivf_full,
        "minhash_signatures": q_minhash_signatures,
        "simhash16": q_simhash16,
        "user_event_runs": q_user_event_runs,
        "value_bucket_transitions": q_value_bucket_transitions,
        "source_charclass_counts": q_source_charclass_counts,
        "mode_value_per_type": q_mode_value_per_type,
        "returnflag_priority_contingency": q_returnflag_priority_contingency,
        "order_gap_quantiles": q_order_gap_quantiles,
        "events_csv_roundtrip": q_events_csv_roundtrip,
        "rolling_7d_active_users": q_rolling_7d_active_users,
        "price_cume_dist": q_price_cume_dist,
        "tpch_q10_top20": q_tpch_q10_top20,
        "events_jsonl_roundtrip": q_events_jsonl_roundtrip,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash_lsh_pairs": q_simhash_lsh_pairs,
        "event_value_drift": q_event_value_drift,
        "value_time_regression": q_value_time_regression,
        "user_type_hhi": q_user_type_hhi,
        "ttr_by_source": q_ttr_by_source,
        "pmi_top_pairs": q_pmi_top_pairs,
        "skipgram_counts": q_skipgram_counts,
        "hourly_acf_by_type": q_hourly_acf_by_type,
        "k_anonymity_audit": q_k_anonymity_audit,
        "theilsen_trend_by_type": q_theilsen_trend_by_type,
        "kendall_hourly_by_type": q_kendall_hourly_by_type,
        "mann_whitney_pairs": q_mann_whitney_pairs,
        "benford_digit_counts": q_benford_digit_counts,
        "rule_agreement_kappa": q_rule_agreement_kappa,
        "ams_f2_checked": q_ams_f2_checked,
        "hll_register_hist": q_hll_register_hist,
        "cms_word_hitters": q_cms_word_hitters,
        "semi_f_customers_by_nation": q_semi_f_customers_by_nation,
        "gini_impurity_by_source": q_gini_impurity_by_source,
        "chi2_type_hour": q_chi2_type_hour,
        "wow_value_change": q_wow_value_change,
        "vocab_coverage_top100": q_vocab_coverage_top100,
        "spearman_hourly_pairs": q_spearman_hourly_pairs,
        "hapax_ratio_by_lang": q_hapax_ratio_by_lang,
        "tpch_q5_local_revenue": q_tpch_q5_local_revenue,
        "word_burstiness_top20": q_word_burstiness_top20,
        "word_len_stats_by_lang": q_word_len_stats_by_lang,
        "stopword_density_by_source": q_stopword_density_by_source,
        "dup_bigram_fraction": q_dup_bigram_fraction,
        "priority_transition_counts": q_priority_transition_counts,
        "user_activity_gini": q_user_activity_gini,
        "orders_per_customer_hist": q_orders_per_customer_hist,
        "fulfillment_latency_hist": q_fulfillment_latency_hist,
        "session_duration_hist": q_session_duration_hist,
        "concurrent_session_pairs": q_concurrent_session_pairs,
        "type_crosscorr_lags": q_type_crosscorr_lags,
        "source_bottomk_containment": q_source_bottomk_containment,
        "hive_partition_prune": q_hive_partition_prune,
        "embedding_knn_join_q8": q_embedding_knn_join_q8,
        "part_kcore": q_part_kcore,
        "part_common_neighbors": q_part_common_neighbors,
        "event_value_ks": q_event_value_ks,
        "events_ipc_roundtrip": q_events_ipc_roundtrip,
        "fk_violation_audit": q_fk_violation_audit,
        "source_p95_median": q_source_p95_median,
        "quantile_norm_chars": q_quantile_norm_chars,
        "part_bfs_hops": q_part_bfs_hops,
        "events_orc_roundtrip": q_events_orc_roundtrip,
        "embedding_top_pc_q8": q_embedding_top_pc_q8,
        "mmr_diverse_topk_q8": q_mmr_diverse_topk_q8,
        "user_rolling_median": q_user_rolling_median,
        "part_neighbor_jaccard": q_part_neighbor_jaccard,
        "copurchase_assortativity": q_copurchase_assortativity,
        "value_zscore_breaches": q_value_zscore_breaches,
        "session_path_top20": q_session_path_top20,
        "doc_rrf_fusion_top20": q_doc_rrf_fusion_top20,
        "value_moment_stats": q_value_moment_stats,
        "order_session_overlap": q_order_session_overlap,
        "fuzzy_name_pairs": q_fuzzy_name_pairs,
        "orders_pareto": q_orders_pareto,
        "orders_weighted_sample": q_orders_weighted_sample,
        "purchase_prepost": q_purchase_prepost,
        "ushape_attribution": q_ushape_attribution,
        "orders_rendezvous": q_orders_rendezvous,
        "priority_share_by_month": q_priority_share_by_month,
        "value_sax_motifs": q_value_sax_motifs,
        "events_pivot_by_day": q_events_pivot_by_day,
        "value_stump_split": q_value_stump_split,
        "snm_blocking_census": q_snm_blocking_census,
        "type_dow_chi2": q_type_dow_chi2,
        "part_communities": q_part_communities,
        "source_weighted_sample": q_source_weighted_sample,
        "user_golden_record": q_user_golden_record,
        "copurchase_lift_top20": q_copurchase_lift_top20,
        "decay_attribution": q_decay_attribution,
        "doc_kfold_census": q_doc_kfold_census,
        "event_value_cvm": q_event_value_cvm,
        "purchase_value_percentiles": q_purchase_value_percentiles,
        "doc_negative_samples": q_doc_negative_samples,
        "doc_padding_waste": q_doc_padding_waste,
        "part_shortest_costs": q_part_shortest_costs,
        "frequent_triples": q_frequent_triples,
        "lineitem_pareto_3d": q_lineitem_pareto_3d,
        "part_widest_ties": q_part_widest_ties,
        "flag_pareto": q_flag_pareto,
        "view_no_click_1h": q_view_no_click_1h,
        "sliding_distinct_users": q_sliding_distinct_users,
        "top_event_gaps": q_top_event_gaps,
    }


def _mmr_unrolled_sql(k: int, m: int, lam_num: int, lam_den: int,
                      query_id: int = 0) -> str:
    """MMR greedy unrolled: q8 pool window + per-rank (max-sel-sim join,
    argmax LIMIT 1) CTE stages — the exact integer selection of
    similarity.mmr_select_q8."""
    mu = lam_den - lam_num
    ctes = ["""qz AS MATERIALIZED (
                 SELECT vec_id, list_transform(embedding,
                   e -> LEAST(GREATEST(CAST(FLOOR(CAST(e AS DOUBLE) * 127
                             + 0.5) AS BIGINT), -127), 127)) AS qe
                 FROM embeddings)""",
            f"qv AS MATERIALIZED (SELECT qe FROM qz "
            f"WHERE vec_id = {query_id})",
            """ps AS MATERIALIZED (
                 SELECT z.vec_id, z.qe,
                        CAST(list_sum(list_transform(list_zip(z.qe, q.qe),
                          p -> p[1] * p[2])) AS BIGINT) AS qsim
                 FROM qz z CROSS JOIN qv q)""",
            f"pool AS MATERIALIZED (SELECT vec_id, qe, qsim FROM "
            f"(SELECT *, ROW_NUMBER() OVER (ORDER BY qsim DESC, vec_id "
            f"ASC) AS rn FROM ps) WHERE rn <= {m})",
            """cs AS MATERIALIZED (
                 SELECT a.vec_id AS ia, b.vec_id AS ib,
                        CAST(list_sum(list_transform(list_zip(a.qe, b.qe),
                          p -> p[1] * p[2])) AS BIGINT) AS s
                 FROM pool a CROSS JOIN pool b)""",
            f"p1 AS MATERIALIZED (SELECT vec_id, {lam_num} * qsim AS "
            f"mmr_num FROM pool ORDER BY mmr_num DESC, vec_id ASC "
            f"LIMIT 1)",
            "sel1 AS MATERIALIZED (SELECT vec_id FROM p1)"]
    for r in range(2, k + 1):
        ctes.append(
            f"ms{r} AS MATERIALIZED (SELECT c.ib AS vec_id, MAX(c.s) AS "
            f"ms FROM cs c JOIN sel{r - 1} s ON c.ia = s.vec_id "
            f"GROUP BY c.ib)")
        ctes.append(
            f"p{r} AS MATERIALIZED (SELECT pool.vec_id, "
            f"{lam_num} * pool.qsim - {mu} * ms{r}.ms AS mmr_num "
            f"FROM pool JOIN ms{r} ON pool.vec_id = ms{r}.vec_id "
            f"WHERE pool.vec_id NOT IN (SELECT vec_id FROM sel{r - 1}) "
            f"ORDER BY mmr_num DESC, pool.vec_id ASC LIMIT 1)")
        ctes.append(
            f"sel{r} AS MATERIALIZED (SELECT vec_id FROM sel{r - 1} "
            f"UNION ALL SELECT vec_id FROM p{r})")
    picks = " UNION ALL ".join(
        f"SELECT vec_id, {r} AS rank, mmr_num FROM p{r}"
        for r in range(1, k + 1))
    return (f"WITH {', '.join(ctes)} "
            f"SELECT vec_id, CAST(rank AS BIGINT) AS rank, "
            f"CAST(mmr_num AS BIGINT) AS mmr_num FROM ({picks}) "
            f"ORDER BY rank")


def _toppc_unrolled_sql(rounds: int, v_scale: int = 1_000_000) -> str:
    """Integer power iteration unrolled: Gram CTE + one (w, m, v) stage
    per round, HUGEINT arithmetic, the same trunc-safe
    sign(w)*((|w|*scale) // max|w|) normalization as top_pc_q8."""
    ctes = ["""qz AS MATERIALIZED (
                 SELECT list_transform(embedding,
                   e -> LEAST(GREATEST(CAST(FLOOR(CAST(e AS DOUBLE) * 127
                             + 0.5) AS BIGINT), -127), 127)) AS qe
                 FROM embeddings)""",
            """dims AS MATERIALIZED (
                 SELECT UNNEST(generate_series(1,
                   (SELECT len(qe) FROM qz LIMIT 1))) AS i)""",
            """gm AS MATERIALIZED (
                 SELECT a.i AS i, b.i AS j,
                        SUM(qe[a.i] * qe[b.i])::HUGEINT AS g
                 FROM qz CROSS JOIN dims a CROSS JOIN dims b
                 GROUP BY a.i, b.i)""",
            f"v0 AS MATERIALIZED (SELECT i, {v_scale}::HUGEINT AS v "
            f"FROM dims)"]
    for r in range(1, rounds + 1):
        ctes.append(
            f"w{r} AS MATERIALIZED (SELECT gm.i AS i, "
            f"SUM(gm.g * v.v)::HUGEINT AS w "
            f"FROM gm JOIN v{r - 1} v ON gm.j = v.i GROUP BY gm.i)")
        ctes.append(
            f"m{r} AS MATERIALIZED (SELECT MAX(ABS(w)) AS m FROM w{r})")
        ctes.append(
            f"v{r} AS MATERIALIZED (SELECT i, CASE WHEN w < 0 "
            f"THEN -((-w * {v_scale}) // mm.m) "
            f"ELSE (w * {v_scale}) // mm.m END AS v FROM w{r}, m{r} mm)")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT CAST(i - 1 AS BIGINT) AS component, "
            f"CAST(v AS BIGINT) AS v_scaled FROM v{rounds} "
            f"ORDER BY component")


def _bfs_unrolled_sql(rounds: int) -> str:
    """Bounded-round BFS as an unrolled CTE chain — each round one
    (new frontier, accumulated distances) stage, exactly the
    graph.bfs_hops semantics (vanilla recursive SQL cannot join the
    recursive term against the accumulated distance table)."""
    ctes = ["""gi AS MATERIALIZED (
                 SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                 FROM lineitem)""",
            """e0 AS MATERIALIZED (
                 SELECT DISTINCT a.i AS u, b.i AS v
                 FROM gi a JOIN gi b ON a.g = b.g AND a.i < b.i)""",
            """se AS MATERIALIZED (
                 SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0)""",
            """d0 AS MATERIALIZED (
                 SELECT MIN(u) AS node, 0 AS hop FROM e0)""",
            "f0 AS MATERIALIZED (SELECT node FROM d0)"]
    for r in range(1, rounds + 1):
        ctes.append(
            f"f{r} AS MATERIALIZED (SELECT DISTINCT s.v AS node "
            f"FROM se s JOIN f{r - 1} p ON s.u = p.node "
            f"WHERE s.v NOT IN (SELECT node FROM d{r - 1}))")
        ctes.append(
            f"d{r} AS MATERIALIZED (SELECT node, hop FROM d{r - 1} "
            f"UNION ALL SELECT node, {r} AS hop FROM f{r})")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT node, CAST(hop AS BIGINT) AS hop FROM d{rounds} "
            f"ORDER BY node")


def _kcore_unrolled_sql(k: int, rounds: int) -> str:
    """Bounded-round k-core peel as an unrolled CTE chain — each round is
    one (degrees, survivors, restricted edges) stage, exactly the
    graph.kcore_peel semantics (vanilla recursive SQL can't aggregate
    over the accumulated working table, so unrolling IS the spec)."""
    # AS MATERIALIZED is load-bearing: each e_{r+1} references e_r three
    # times, so inlined CTEs expand 3^rounds scans of the base table —
    # DuckDB runs out of file handles before it runs out of patience.
    ctes = ["""gi AS MATERIALIZED (
                 SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                 FROM lineitem)""",
            """e0 AS MATERIALIZED (
                 SELECT DISTINCT a.i AS u, b.i AS v
                 FROM gi a JOIN gi b ON a.g = b.g AND a.i < b.i)"""]
    for r in range(rounds):
        ctes.append(
            f"d{r} AS MATERIALIZED (SELECT node, COUNT(*) AS d FROM "
            f"(SELECT u AS node FROM e{r} UNION ALL SELECT v FROM e{r}) "
            f"GROUP BY node)")
        ctes.append(
            f"k{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE d >= {k})")
        ctes.append(
            f"e{r + 1} AS MATERIALIZED (SELECT u, v FROM e{r} "
            f"WHERE u IN (SELECT node FROM k{r}) "
            f"AND v IN (SELECT node FROM k{r}))")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT node, CAST(d AS BIGINT) AS degree FROM "
            f"(SELECT node, COUNT(*) AS d FROM "
            f"(SELECT u AS node FROM e{rounds} "
            f"UNION ALL SELECT v FROM e{rounds}) GROUP BY node) "
            f"ORDER BY node")


def _lpa_unrolled_sql(rounds: int) -> str:
    """Bounded-round synchronous label propagation as an unrolled CTE
    chain — one (votes, argmax) stage per round, exactly the
    graph.label_propagation_census semantics (ties -> smallest label)."""
    ctes = ["""gi AS MATERIALIZED (
                 SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                 FROM lineitem)""",
            """e0 AS MATERIALIZED (
                 SELECT DISTINCT a.i AS u, b.i AS v
                 FROM gi a JOIN gi b ON a.g = b.g AND a.i < b.i)""",
            """dx AS MATERIALIZED (
                 SELECT u AS node, v AS nb FROM e0
                 UNION ALL SELECT v, u FROM e0)""",
            """l0 AS MATERIALIZED (
                 SELECT DISTINCT node, node AS lab FROM dx)"""]
    for r in range(rounds):
        ctes.append(
            f"v{r} AS MATERIALIZED (SELECT dx.node, l.lab, COUNT(*) AS c "
            f"FROM dx JOIN l{r} l ON l.node = dx.nb GROUP BY 1, 2)")
        ctes.append(
            f"l{r + 1} AS MATERIALIZED (SELECT node, lab FROM ("
            f"SELECT node, lab, ROW_NUMBER() OVER (PARTITION BY node "
            f"ORDER BY c DESC, lab ASC) AS rn FROM v{r}) WHERE rn = 1)")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT lab AS community, COUNT(*) AS n_nodes "
            f"FROM l{rounds} GROUP BY 1 ORDER BY 1")


def _bf_unrolled_sql(rounds: int) -> str:
    """Bounded-round Bellman-Ford as an unrolled min-fold CTE chain —
    exactly graph.bellman_ford_bounded's semantics (cost = 10^6 //
    co-purchase count, seed = minimum node)."""
    ctes = ["""gi AS MATERIALIZED (
                 SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                 FROM lineitem)""",
            """ew AS MATERIALIZED (
                 SELECT a.i AS u, b.i AS v,
                        1000000 // COUNT(*) AS w
                 FROM gi a JOIN gi b ON a.g = b.g AND a.i < b.i
                 GROUP BY a.i, b.i)""",
            """dx AS MATERIALIZED (
                 SELECT u AS src, v AS dst, w FROM ew
                 UNION ALL SELECT v, u, w FROM ew)""",
            """d0 AS MATERIALIZED (
                 SELECT (SELECT MIN(src) FROM dx) AS node, 0 AS dist)"""]
    for r in range(rounds):
        ctes.append(
            f"d{r + 1} AS MATERIALIZED (SELECT node, MIN(dist) AS dist "
            f"FROM (SELECT node, dist FROM d{r} UNION ALL "
            f"SELECT dx.dst, d{r}.dist + dx.w FROM d{r} "
            f"JOIN dx ON dx.src = d{r}.node) GROUP BY node)")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT node, CAST(dist AS BIGINT) AS dist "
            f"FROM d{rounds} ORDER BY node")


def _widest_unrolled_sql(rounds: int) -> str:
    """Bounded-round widest path as an unrolled MAX(MIN(.)) CTE chain —
    graph.widest_path_bounded's (max, min) semiring semantics."""
    ctes = ["""gi AS MATERIALIZED (
                 SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                 FROM lineitem)""",
            """ew AS MATERIALIZED (
                 SELECT a.i AS u, b.i AS v, COUNT(*) AS w
                 FROM gi a JOIN gi b ON a.g = b.g AND a.i < b.i
                 GROUP BY a.i, b.i)""",
            """dx AS MATERIALIZED (
                 SELECT u AS src, v AS dst, w FROM ew
                 UNION ALL SELECT v, u, w FROM ew)""",
            """w0 AS MATERIALIZED (
                 SELECT (SELECT MIN(src) FROM dx) AS node,
                        1000000000 AS width)"""]
    for r in range(rounds):
        ctes.append(
            f"w{r + 1} AS MATERIALIZED (SELECT node, MAX(width) AS width "
            f"FROM (SELECT node, width FROM w{r} UNION ALL "
            f"SELECT dx.dst, LEAST(w{r}.width, dx.w) FROM w{r} "
            f"JOIN dx ON dx.src = w{r}.node) GROUP BY node)")
    return (f"WITH {', '.join(ctes)} "
            f"SELECT node, CAST(width AS BIGINT) AS width "
            f"FROM w{rounds} ORDER BY node")


def oracle_sql() -> dict[str, str]:
    from timberjack_ray.functions.text import _STOPWORDS

    stoplist = ", ".join(f"'{w}'" for w in sorted(set().union(*_STOPWORDS.values())))

    def _sw(lang: str) -> str:
        return ", ".join(f"'{w}'" for w in sorted(_STOPWORDS[lang]))

    # Horner MinHash signature CTE chain, shared by the signature and the
    # LSH-pairing oracles (mh: doc_id, perm, h as HUGEINT mod 2^64)
    mh_core = """wh AS (
              SELECT doc_id,
                list_transform(string_split(text, ' '),
                  w -> list_reduce(list_prepend(0::HUGEINT,
                         list_transform(
                           list_filter(string_split_regex(w, ''),
                                       c -> c <> ''),
                           c -> unicode(c)::HUGEINT)),
                       (h, c) -> (h * 1000003 + c)
                                 % 18446744073709551616::HUGEINT)) AS whl,
                list_reduce(list_prepend(0::HUGEINT,
                  list_transform(
                    list_filter(string_split_regex(text, ''), c -> c <> ''),
                    c -> unicode(c)::HUGEINT)),
                  (h, c) -> (h * 1000003 + c)
                            % 18446744073709551616::HUGEINT) AS chash
              FROM documents
            ), g AS (
              SELECT doc_id,
                CASE WHEN len(whl) >= 3 THEN
                  list_transform(generate_series(1, len(whl) - 2),
                    i -> list_reduce(list_prepend(0::HUGEINT, whl[i:i+2]),
                         (h, c) -> (h * 1000003 + c)
                                   % 18446744073709551616::HUGEINT))
                ELSE [chash] END AS ghl
              FROM wh
            ), perms(perm, a, b) AS (VALUES (0, 1000003::HUGEINT, 0::HUGEINT), (1, 1000006000009::HUGEINT, 2654435761::HUGEINT), (2, 1000009000027000027::HUGEINT, 5308871522::HUGEINT), (3, 14003818205314896721::HUGEINT, 7963307283::HUGEINT), (4, 14453212906556403763::HUGEINT, 10617743044::HUGEINT), (5, 10923514805226455897::HUGEINT, 13272178805::HUGEINT), (6, 12924618581234127435::HUGEINT, 15926614566::HUGEINT), (7, 1460077494926286753::HUGEINT, 18581050327::HUGEINT)),
            mh AS (
              SELECT g.doc_id, perms.perm,
                list_min(list_transform(g.ghl,
                  x -> (((x // 4294967296 * perms.a)
                          % 18446744073709551616::HUGEINT) * 4294967296
                        + (x % 4294967296) * perms.a
                        + perms.b) % 18446744073709551616::HUGEINT)) AS h
              FROM g, perms
            )"""

    # splitmix64 replay (functions/corpus._splitmix64) as a 6-stage CTE
    # chain: mod-2^64 adds via HUGEINT, the two 64x64 multiplies via the
    # same 32-bit-split trick as mh_core, xor/shifts native.  `carry` =
    # columns threaded through; input expression must be in [0, 2^64).
    _P64 = "18446744073709551616::HUGEINT"
    _SM_C2 = "13787848793156543929::HUGEINT"  # 0xBF58476D1CE4E5B9
    _SM_C3 = "10723151780598845931::HUGEINT"  # 0x94D049BB133111EB

    def _sm_ctes(tag: str, src: str, xexpr: str, carry: list[str]) -> str:
        cols = ", ".join(carry) + (", " if carry else "")
        return f"""{tag}0 AS (SELECT {cols}(({xexpr}) + 11400714819323198485::HUGEINT) % {_P64} AS z FROM {src}),
            {tag}1 AS (SELECT {cols}xor(z, z // 1073741824) AS y FROM {tag}0),
            {tag}2 AS (SELECT {cols}((y // 4294967296 * {_SM_C2} % {_P64}) * 4294967296 + (y % 4294967296) * {_SM_C2}) % {_P64} AS z FROM {tag}1),
            {tag}3 AS (SELECT {cols}xor(z, z // 134217728) AS y FROM {tag}2),
            {tag}4 AS (SELECT {cols}((y // 4294967296 * {_SM_C3} % {_P64}) * 4294967296 + (y % 4294967296) * {_SM_C3}) % {_P64} AS z FROM {tag}3),
            {tag}x AS (SELECT {cols}xor(z, z // 2147483648) AS h FROM {tag}4)"""

    def _hll_reg_ctes(tag: str, hx: str) -> str:
        """(idx, max rank) register CTE from a splitmix64 hash CTE."""
        return (f"r{tag} AS (SELECT h // 1125899906842624 AS idx, "
                f"65 - length(bin((((h * 16384) % {_P64}) + 8192)::UBIGINT))"
                f" AS rank FROM {hx}), "
                f"reg{tag} AS (SELECT idx, max(rank) AS rank FROM r{tag} "
                f"GROUP BY idx)")

    def _hll_est_ctes(tag: str, reg: str) -> str:
        """IEEE-deterministic milli estimate CTE chain over a register
        CTE — the exact text the approx_distinct_users oracle uses, so
        the double chain matches hll_estimate_milli bit-for-bit."""
        return f"""{tag}agg AS (
              SELECT COALESCE(SUM(1::HUGEINT << (64 - rank)),
                              0::HUGEINT) AS s_nz,
                     COUNT(*) AS n_nz
              FROM {reg}
            ),
            {tag}fin AS (
              SELECT CAST(s_nz + (16384 - n_nz) * (1::HUGEINT << 64)
                          AS DOUBLE) AS sd,
                     16384 - n_nz AS zeros
              FROM {tag}agg
            ),
            {tag}est AS (
              SELECT CAST(FLOOR(CASE
                WHEN ((((0.7213 / (1.0 + 1.079 / 16384.0)) * 16384.0)
                       * 16384.0) * 18446744073709551616.0) / sd
                     <= 2.5 * 16384.0 AND zeros > 0
                THEN 16384.0 * ln(16384.0 / zeros)
                ELSE ((((0.7213 / (1.0 + 1.079 / 16384.0)) * 16384.0)
                       * 16384.0) * 18446744073709551616.0) / sd
              END * 1000.0) AS BIGINT) AS em
              FROM {tag}fin
            )"""

    # PII gate: the aug line replays _plant_pii with SQL concat; the scrub
    # chain is generated FROM functions/text.PII_PATTERNS so pattern parity
    # is structural (both engines run RE2).
    from timberjack_ray.functions.text import PII_PATTERNS

    _PII_AUG = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@' || source"
        " || '.com ip 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'"
        " || CAST(doc_id % 100 AS VARCHAR) || ' tel 555-010-'"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')")
    _pii_scrub_expr = "aug"
    for _pn, _pp, _pr in PII_PATTERNS:
        _pii_scrub_expr = (f"regexp_replace({_pii_scrub_expr}, '{_pp}', "
                           f"'{_pr}', 'g')")
    _pii_counts_sql = (
        f"WITH aug AS (SELECT {_PII_AUG} AS aug FROM documents) "
        + " UNION ALL ".join(
            f"SELECT '{n}' AS pii_type, "
            f"CAST(SUM(len(regexp_extract_all(aug, '{p}'))) AS BIGINT) "
            f"AS n_matches, "
            f"CAST(COUNT(*) FILTER (WHERE regexp_matches(aug, '{p}')) "
            f"AS BIGINT) AS n_docs FROM aug"
            for n, p, _ in PII_PATTERNS))

    # Horner-fold polynomial content hash (mod 2^64) over codepoints —
    # replays functions/corpus.add_content_hash with HUGEINT arithmetic.
    _POLY_HASH = (
        "list_reduce(list_prepend(0::HUGEINT, list_transform("
        "list_filter(string_split_regex({col}, ''), c -> c <> ''), "
        "c -> unicode(c)::HUGEINT)), "
        "(h, c) -> (h * 1000003 + c) % 18446744073709551616::HUGEINT)"
    )

    # QualityScorer feature set as a reusable subquery body ({extra} lets a
    # caller carry additional passthrough columns, e.g. ", lang").
    _QUALITY_SQL = f"""
        WITH f_ AS (
          SELECT doc_id{{extra}},
            length(text) AS n_chars,
            length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
            regexp_extract_all(lower(text), '[a-z]+') AS ws
          FROM documents
        ), g_ AS (
          SELECT doc_id{{extra}}, n_chars, n_alpha,
            len(ws) AS n_words,
            len(list_filter(ws, w -> w IN ({stoplist}))) AS n_stop
          FROM f_
        )
        SELECT doc_id{{extra}},
          0.3 * LEAST(n_chars / 200.0, 1.0)
          + 0.3 * (CAST(n_alpha AS DOUBLE) / GREATEST(n_chars, 1))
          + 0.2 * LEAST(CAST(n_stop AS DOUBLE) / GREATEST(n_words, 1) * 5, 1.0)
          + 0.2 * LEAST((CASE WHEN n_words > 0
                         THEN CAST(n_alpha AS DOUBLE) / GREATEST(n_words, 1)
                         ELSE 0.0 END) / 8.0, 1.0)
          AS quality
        FROM g_
    """
    return {
        # QualityScorer replicated feature-for-feature (float ops are the
        # same IEEE expression tree both sides, so values are bit-exact on
        # the ASCII corpus; verified at sf0.01 and sf0.1)
        "quality_scores": f"""
            WITH f AS (
              SELECT doc_id,
                length(text) AS n_chars,
                length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                regexp_extract_all(lower(text), '[a-z]+') AS ws
              FROM documents
            ), g AS (
              SELECT doc_id, n_chars, n_alpha,
                len(ws) AS n_words,
                len(list_filter(ws, w -> w IN ({stoplist}))) AS n_stop
              FROM f
            )
            SELECT doc_id,
              0.3 * LEAST(n_chars / 200.0, 1.0)
              + 0.3 * (CAST(n_alpha AS DOUBLE) / GREATEST(n_chars, 1))
              + 0.2 * LEAST(CAST(n_stop AS DOUBLE) / GREATEST(n_words, 1) * 5, 1.0)
              + 0.2 * LEAST((CASE WHEN n_words > 0
                             THEN CAST(n_alpha AS DOUBLE) / GREATEST(n_words, 1)
                             ELSE 0.0 END) / 8.0, 1.0)
              AS quality
            FROM g
        """,
        "tpch_q1_qty": """
            SELECT l_returnflag, l_linestatus,
                   CAST(ROUND(SUM(l_quantity)) AS BIGINT) AS sum_qty,
                   COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "event_type_counts": """
            SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
        """,
        "event_trends": """
            SELECT strftime(ts, '%Y-%m-%d %H') AS ts_hour, COUNT(*) AS n
            FROM events GROUP BY 1
        """,
        "event_trends_gapfilled": """
            WITH c AS (
              SELECT epoch_us(ts) // 3600000000 AS h, COUNT(*) AS n
              FROM events GROUP BY 1),
            s AS (
              SELECT UNNEST(generate_series((SELECT MIN(h) FROM c),
                                            (SELECT MAX(h) FROM c))) AS h)
            SELECT strftime(make_timestamp(s.h * 3600000000),
                            '%Y-%m-%d %H') AS ts_hour,
                   COALESCE(c.n, 0) AS n
            FROM s LEFT JOIN c USING (h) ORDER BY ts_hour
        """,
        "event_top3": """
            SELECT event_type, n, rank FROM (
              SELECT event_type, COUNT(*) AS n,
                     CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, event_type ASC) AS BIGINT) AS rank
              FROM events GROUP BY event_type
            ) WHERE rank <= 3
        """,
        "props_field_filter": """
            SELECT event_type, COUNT(*) AS n FROM events
            WHERE json_extract_string(props, '$.k') = '42'
            GROUP BY event_type
        """,
        "pattern_filter_docs": """
            SELECT lang, COUNT(*) AS n FROM documents
            WHERE text LIKE '%merge%' GROUP BY lang
        """,
        "regex_extract_docs": """
            SELECT tok, COUNT(*) AS n FROM (
              SELECT regexp_extract(text, '(spark|hash|join)', 1) AS tok FROM documents
            ) WHERE tok <> '' GROUP BY tok
        """,
        "enrich_customers": """
            SELECT r.r_name AS r_name, COUNT(*) AS n
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "route_counts_docs": """
            SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS sum_chars, COUNT(*) AS n
            FROM documents GROUP BY lang
        """,
        "dedup_exact_docs": """
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "chunk_docs": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws,
                     len(string_split(text, ' ')) AS nw
              FROM documents
            ),
            c AS (
              SELECT doc_id, nw, ws, UNNEST(generate_series(0,
                CASE WHEN nw <= 12 THEN 0
                     ELSE CAST(CEIL(CAST(nw - 12 AS DOUBLE) / 8) AS BIGINT)
                END)) AS chunk_id
              FROM w
            )
            SELECT doc_id, chunk_id,
                   array_to_string(list_slice(ws, chunk_id * 8 + 1,
                     LEAST(chunk_id * 8 + 12, nw)), ' ') AS chunk_text,
                   LEAST(chunk_id * 8 + 12, nw) - chunk_id * 8 AS n_words
            FROM c
        """,
        # round 5 conversion (VERDICT #3): BM25 milli-scores replay
        # bit-for-bit — idf is libm ln both sides, term contributions
        # pivot into fixed columns added in sorted-term order (matching
        # the kernel's sorted-dict accumulation), all remaining ops are
        # single IEEE +*/ with identical association
        "bm25_docs": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws,
                     len(string_split(text, ' ')) AS dl
              FROM documents
            ),
            stats AS (SELECT COUNT(*) AS n, SUM(dl) AS sdl FROM w),
            tf AS (
              SELECT doc_id, dl, t.term,
                     len(list_filter(ws, x -> x = t.term)) AS tf
              FROM w CROSS JOIN
                (SELECT UNNEST(['filter', 'hash', 'join']) AS term) t
            ),
            df AS (
              SELECT term,
                     COUNT(*) FILTER (WHERE tf > 0) AS df
              FROM tf GROUP BY term
            ),
            contrib AS (
              SELECT tf.doc_id, tf.term,
                     ln(1.0 + ((SELECT n FROM stats) - df.df + 0.5)
                              / (df.df + 0.5))
                     * (tf.tf * (1.2 + 1.0))
                     / GREATEST(tf.tf + 1.2 * (1.0 - 0.75
                         + 0.75 * tf.dl / GREATEST(
                             CAST((SELECT sdl FROM stats) AS DOUBLE)
                             / GREATEST((SELECT n FROM stats), 1),
                             1e-12)),
                         1e-12) AS c
              FROM tf JOIN df USING (term)
            ),
            scored AS (
              SELECT doc_id,
                     (MAX(CASE WHEN term = 'filter' THEN c END)
                      + MAX(CASE WHEN term = 'hash' THEN c END))
                      + MAX(CASE WHEN term = 'join' THEN c END) AS score
              FROM contrib GROUP BY doc_id
            )
            SELECT doc_id, score_milli, rank FROM (
              SELECT doc_id,
                     CAST(FLOOR(score * 1000.0) AS BIGINT) AS score_milli,
                     CAST(ROW_NUMBER() OVER (
                       ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
              FROM scored WHERE score > 0.0
            ) WHERE rank <= 10
        """,
        # round 5 conversion (VERDICT #3): DSIR weights on the Horner
        # feature hash; the milli floor absorbs float sum-order ULPs
        "dsir_scores": """
            WITH w AS (
              SELECT doc_id, lang, string_split(text, ' ') AS ws
              FROM documents
            ),
            tok AS (
              SELECT doc_id, lang,
                UNNEST(list_transform(ws, wd ->
                  CAST(list_reduce(list_prepend(0::HUGEINT,
                    list_transform(
                      list_filter(string_split_regex(wd, ''),
                                  c -> c <> ''),
                      c -> unicode(c)::HUGEINT)),
                    (h, c) -> (h * 1000003 + c)
                              % 18446744073709551616::HUGEINT)
                  % 65536 AS BIGINT))) AS b
              FROM w
            ),
            cnts AS (
              SELECT b, COUNT(*) AS cr,
                     COUNT(*) FILTER (WHERE lang = 'en') AS ct
              FROM tok GROUP BY b
            ),
            sums AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM cnts),
            wt AS (
              SELECT b,
                     (ln(ct + 1.0)
                      - ln((SELECT nt FROM sums) + 1.0 * 65536))
                     - (ln(cr + 1.0)
                        - ln((SELECT nr FROM sums) + 1.0 * 65536)) AS lw
              FROM cnts
            ),
            sc AS (
              SELECT tok.doc_id, SUM(wt.lw) AS logw
              FROM tok JOIN wt USING (b) GROUP BY tok.doc_id
            ),
            base AS (
              SELECT w.doc_id, len(w.ws) AS n_words,
                     COALESCE(sc.logw, 0.0) AS logw
              FROM w LEFT JOIN sc USING (doc_id)
            )
            SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
                   CAST(FLOOR(logw * 1000.0) AS BIGINT) AS logw_milli
            FROM (
              SELECT *, ROW_NUMBER() OVER (
                ORDER BY logw DESC, doc_id ASC) AS rk
              FROM base
            ) WHERE rk <= 20
        """,
        # identical replay for the primary key (round 5 conversion): the
        # deterministic sig-3 binning makes the sketch output exact SQL
        "hdr_value_quantiles": """
            WITH v AS (
              SELECT CAST(ROUND(value * 100) AS BIGINT) AS v FROM events
            ),
            b AS (
              SELECT CASE WHEN v <= 0 THEN 0 ELSE
                CAST(FLOOR(LOG10(CAST(v AS DOUBLE))) AS BIGINT) * 10000
                + v // CAST(POWER(10, GREATEST(
                    CAST(FLOOR(LOG10(CAST(v AS DOUBLE))) AS BIGINT) - 2, 0))
                  AS BIGINT)
              END AS bin FROM v
            ),
            c AS (SELECT bin, COUNT(*) AS n FROM b GROUP BY bin),
            cum AS (
              SELECT bin, SUM(n) OVER (ORDER BY bin) AS cn,
                     (SELECT SUM(n) FROM c) AS total
              FROM c
            ),
            qs AS (SELECT UNNEST([0.5, 0.9, 0.99]) AS q),
            sel AS (
              SELECT q, MIN(bin) AS bin
              FROM qs JOIN cum
                ON cn >= GREATEST(CAST(CEIL(q * total) AS BIGINT), 1)
              GROUP BY q
            )
            SELECT q,
                   CAST((bin % 10000) * CAST(POWER(10,
                     GREATEST(bin // 10000 - 2, 0)) AS BIGINT) AS BIGINT)
                     AS value_scaled
            FROM sel
        """,
        "hdr_value_quantiles_checked": """
            WITH v AS (
              SELECT CAST(ROUND(value * 100) AS BIGINT) AS v FROM events
            ),
            b AS (
              SELECT CASE WHEN v <= 0 THEN 0 ELSE
                CAST(FLOOR(LOG10(CAST(v AS DOUBLE))) AS BIGINT) * 10000
                + v // CAST(POWER(10, GREATEST(
                    CAST(FLOOR(LOG10(CAST(v AS DOUBLE))) AS BIGINT) - 2, 0))
                  AS BIGINT)
              END AS bin FROM v
            ),
            c AS (SELECT bin, COUNT(*) AS n FROM b GROUP BY bin),
            cum AS (
              SELECT bin, SUM(n) OVER (ORDER BY bin) AS cn,
                     (SELECT SUM(n) FROM c) AS total
              FROM c
            ),
            qs AS (SELECT UNNEST([0.5, 0.9, 0.99]) AS q),
            sel AS (
              SELECT q, MIN(bin) AS bin
              FROM qs JOIN cum
                ON cn >= GREATEST(CAST(CEIL(q * total) AS BIGINT), 1)
              GROUP BY q
            )
            SELECT q,
                   CAST((bin % 10000) * CAST(POWER(10,
                     GREATEST(bin // 10000 - 2, 0)) AS BIGINT) AS BIGINT)
                     AS value_scaled
            FROM sel
        """,
        "decontaminate_docs": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws,
                     len(string_split(text, ' ')) AS nw, text
              FROM documents
            ),
            grams AS (
              SELECT doc_id, UNNEST(
                CASE WHEN nw <= 3 THEN ['S:' || text]
                     ELSE list_transform(generate_series(1, nw - 2),
                           i -> 'L:' || ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                END) AS gram
              FROM w
            ),
            bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
            dirty AS (
              SELECT DISTINCT g.doc_id FROM grams g
              JOIN bench b ON g.gram = b.gram
              WHERE g.doc_id % 97 <> 0
            )
            SELECT d.doc_id AS doc_id FROM documents d
            WHERE d.doc_id % 97 <> 0
              AND d.doc_id NOT IN (SELECT doc_id FROM dirty)
            ORDER BY doc_id
        """,
        "ngram_jaccard_pairs": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws,
                     len(string_split(text, ' ')) AS nw, text
              FROM documents
            ),
            grams AS (
              SELECT doc_id, UNNEST(
                CASE WHEN nw <= 3 THEN [text]
                     ELSE list_transform(generate_series(1, nw - 2),
                                         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                END) AS gram
              FROM w
            ),
            dg AS (SELECT DISTINCT doc_id, gram FROM grams),
            sz AS (SELECT doc_id, COUNT(*) AS m FROM dg GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS shared
              FROM dg x JOIN dg y ON x.gram = y.gram AND x.doc_id < y.doc_id
              GROUP BY 1, 2
            )
            SELECT a, b,
                   CAST(shared AS DOUBLE) / (sa.m + sb.m - shared) AS jacc
            FROM inter
            JOIN sz sa ON sa.doc_id = a
            JOIN sz sb ON sb.doc_id = b
            WHERE CAST(shared AS DOUBLE) / (sa.m + sb.m - shared) >= 0.6
        """,
        "doc_token_counts": """
            SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_words, COUNT(*) AS n
            FROM documents GROUP BY lang
        """,
        "ann_topk": """
            SELECT vec_id, rank FROM (
              SELECT vec_id,
                     CAST(ROW_NUMBER() OVER (
                       ORDER BY list_cosine_similarity(embedding,
                         (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC,
                       vec_id ASC) AS BIGINT) AS rank
              FROM embeddings
            ) WHERE rank <= 10
        """,
        "orders_price_stats": """
            SELECT o_orderpriority,
                   MIN(o_totalprice) AS min_price,
                   MAX(o_totalprice) AS max_price,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
                   COUNT(*) AS n
            FROM orders GROUP BY o_orderpriority
        """,
        "distinct_users_per_type": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "top10_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
        """,
        "orders_by_nation": """
            SELECT c.c_nationkey AS c_nationkey,
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
                   COUNT(*) AS n
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_nationkey
        """,
        "doc_repetition_ratio": """
            SELECT COUNT(*) AS n_total, COUNT(DISTINCT text) AS n_distinct
            FROM documents
        """,
        "value_histogram": """
            SELECT event_type, CAST(FLOOR(value / 50.0) AS BIGINT) AS bin,
                   COUNT(*) AS n
            FROM events GROUP BY event_type, bin
        """,
        "asof_signup": """
            SELECT l.event_id AS event_id,
                   CAST(epoch_us(r.ts) AS BIGINT) AS signup_us
            FROM (SELECT * FROM events WHERE event_type = 'purchase') l
            ASOF JOIN (SELECT * FROM events WHERE event_type = 'signup') r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
        "doc_word_topk": """
            SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM documents)
            GROUP BY w ORDER BY n DESC, word LIMIT 10
        """,
        "event_pairs_1h": """
            SELECT a.event_id AS a_id, b.event_id AS b_id
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts
             AND a.event_id <> b.event_id
            ORDER BY a_id, b_id
        """,
        "event_pairs_1h_grace": """
            SELECT a.event_id AS a_id, b.event_id AS b_id
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts
             AND a.event_id <> b.event_id
            ORDER BY a_id, b_id
        """,
        "session_size_histogram": """
            WITH s AS (
              SELECT user_id, epoch_us(ts) AS us,
                     CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                            > 3600000000
                          OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS st
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), a AS (
              SELECT user_id, us,
                     SUM(st) OVER (PARTITION BY user_id ORDER BY us
                                   ROWS UNBOUNDED PRECEDING) AS session_id
              FROM s
            ), g AS (
              SELECT user_id, session_id, COUNT(*) AS n_events
              FROM a GROUP BY 1, 2)
            SELECT CAST(n_events AS BIGINT) AS n_events,
                   COUNT(*) AS n_sessions
            FROM g GROUP BY n_events ORDER BY n_events
        """,
        "weekly_event_growth": """
            WITH c AS (
              SELECT event_type,
                     epoch_us(ts) // 604800000000 AS week,
                     COUNT(*) AS n
              FROM events GROUP BY 1, 2)
            SELECT event_type, week, n,
                   CAST(COALESCE(n - LAG(n) OVER (
                     PARTITION BY event_type ORDER BY week), 0) AS BIGINT)
                   AS delta
            FROM c ORDER BY event_type, week
        """,
        "customer_monthly_streaks": """
            WITH ud AS (
              SELECT DISTINCT o_custkey,
                     epoch_us(o_orderdate) // 2592000000000 AS d
              FROM orders),
            r AS (
              SELECT o_custkey, d,
                     d - ROW_NUMBER() OVER (PARTITION BY o_custkey
                                            ORDER BY d) AS isl
              FROM ud),
            runs AS (SELECT o_custkey, COUNT(*) AS len
                     FROM r GROUP BY o_custkey, isl),
            longest AS (SELECT o_custkey, MAX(len) AS streak
                        FROM runs GROUP BY o_custkey)
            SELECT CAST(streak AS BIGINT) AS streak_months,
                   COUNT(*) AS n_customers
            FROM longest GROUP BY streak ORDER BY streak
        """,
        "basket_size_histogram": """
            WITH b AS (
              SELECT l_orderkey, COUNT(DISTINCT l_partkey) AS n_parts
              FROM lineitem GROUP BY l_orderkey)
            SELECT CAST(n_parts AS BIGINT) AS n_parts,
                   COUNT(*) AS n_orders
            FROM b GROUP BY n_parts ORDER BY n_parts
        """,
        "event_heatmap": """
            SELECT (epoch_us(ts) // 86400000000 + 4) % 7 AS dow,
                   (epoch_us(ts) // 3600000000) % 24 AS hour,
                   COUNT(*) AS n
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "value_log2_histogram": """
            SELECT CAST(LENGTH(printf('%b',
                     CAST(ROUND(value * 100) AS BIGINT))) - 1 AS BIGINT)
                     AS bin,
                   COUNT(*) AS n
            FROM events
            WHERE CAST(ROUND(value * 100) AS BIGINT) > 0
            GROUP BY 1 ORDER BY 1
        """,
        "funnel_step_latency": """
            WITH s1 AS (
              SELECT user_id, MIN(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (
              SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
              JOIN s1 USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > s1.t1
              GROUP BY e.user_id),
            s3 AS (
              SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
              JOIN s2 USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > s2.t2
              GROUP BY e.user_id),
            g2 AS (SELECT (epoch_us(t2) - epoch_us(t1)) // 1000000 AS gap
                   FROM s2 JOIN s1 USING (user_id)),
            g3 AS (SELECT (epoch_us(t3) - epoch_us(t2)) // 1000000 AS gap
                   FROM s3 JOIN s2 USING (user_id))
            SELECT CAST(2 AS BIGINT) AS step, 'click' AS step_type,
                   CAST(quantile_disc(gap, 0.5) AS BIGINT) AS p50_gap_s,
                   COUNT(*) AS n_converted
            FROM g2
            UNION ALL
            SELECT 3, 'purchase', CAST(quantile_disc(gap, 0.5) AS BIGINT),
                   COUNT(*)
            FROM g3
            ORDER BY step
        """,
        "transition_latency": """
            WITH s AS (
              SELECT event_type AS cur_type,
                     LEAD(event_type) OVER w AS next_type,
                     LEAD(epoch_us(ts)) OVER w - epoch_us(ts) AS gap
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT cur_type, next_type, COUNT(*) AS n,
                   CAST(SUM(gap) AS BIGINT) AS sum_gap_us
            FROM s WHERE next_type IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "copurchase_top20": """
            WITH p AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS pk
                       FROM lineitem),
            e AS (SELECT x.pk AS u, y.pk AS v, COUNT(*) AS n
                  FROM p x JOIN p y ON x.o = y.o AND x.pk < y.pk
                  GROUP BY 1, 2),
            r AS (SELECT u, v, n,
                         ROW_NUMBER() OVER (ORDER BY n DESC, u, v) AS rank
                  FROM e)
            SELECT CAST(rank AS BIGINT) AS rank, u, v, CAST(n AS BIGINT)
                     AS n
            FROM r WHERE rank <= 20 ORDER BY rank
        """,
        "ab_experiment_report": """
            WITH pu AS (
              SELECT user_id,
                     CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                        THEN 1 ELSE 0 END)
                             > SUM(CASE WHEN event_type = 'view'
                                        THEN 1 ELSE 0 END)
                          THEN 1 ELSE 0 END AS f
              FROM events GROUP BY user_id)
            SELECT CAST((user_id::HUGEINT * 2654435761) % 4294967296 % 2
                        AS BIGINT) AS arm,
                   COUNT(*) AS n_users,
                   CAST(SUM(f) AS BIGINT) AS n_converted
            FROM pu GROUP BY arm ORDER BY arm
        """,
        "customer_ltv_curve": """
            WITH f AS (
              SELECT o_custkey, MIN(epoch_us(o_orderdate)) AS first_us
              FROM orders GROUP BY o_custkey)
            SELECT (epoch_us(o.o_orderdate) - f.first_us)
                     // 2592000000000 AS tenure_month,
                   CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS rev_c,
                   COUNT(*) AS n_orders
            FROM orders o JOIN f USING (o_custkey)
            GROUP BY tenure_month ORDER BY tenure_month
        """,
        "error_cusum_alarms": """
            WITH RECURSIVE aug AS (
              SELECT epoch_us(ts) // 3600000000 AS h FROM events
              WHERE event_type = 'error'
              UNION ALL
              SELECT (SELECT MIN(epoch_us(ts) // 3600000000) FROM events
                       WHERE event_type = 'error') + 100
              FROM events WHERE event_type = 'error' AND event_id % 3 = 0),
            c AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS n
                  FROM aug GROUP BY h),
            b AS (SELECT MIN(h) AS h0, MAX(h) AS h1,
                         CAST(SUM(n) AS BIGINT) AS tot FROM c),
            kk AS (SELECT ((tot + (h1 - h0 + 1) - 1) // (h1 - h0 + 1)) + 1
                     AS k FROM b),
            walk AS (
              SELECT b.h0 AS h,
                     GREATEST(0, COALESCE((SELECT n FROM c
                                            WHERE c.h = b.h0), 0) - kk.k)
                       AS s
              FROM b, kk
              UNION ALL
              SELECT w.h + 1,
                     GREATEST(0, w.s + COALESCE((SELECT n FROM c
                                WHERE c.h = w.h + 1), 0) - (SELECT k FROM kk))
              FROM walk w WHERE w.h < (SELECT h1 FROM b))
            SELECT CAST(h AS BIGINT) AS h, CAST(s AS BIGINT) AS s
            FROM walk WHERE s >= 5 * (SELECT k FROM kk)
            ORDER BY h
        """,
        "signup_to_purchase_survival": """
            WITH tm AS (SELECT MAX(epoch_us(ts)) AS t_max FROM events),
            s AS (SELECT user_id, MIN(epoch_us(ts)) AS s0 FROM events
                  WHERE event_type = 'signup' GROUP BY user_id),
            p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS p0
                  FROM events e JOIN s USING (user_id)
                  WHERE e.event_type = 'purchase'
                    AND epoch_us(e.ts) >= s.s0
                  GROUP BY e.user_id),
            d AS (
              SELECT s.user_id,
                     CASE WHEN p.p0 IS NOT NULL
                          THEN (p.p0 - s.s0) // 86400000000 END AS de,
                     CASE WHEN p.p0 IS NULL
                          THEN ((SELECT t_max FROM tm) - s.s0)
                               // 86400000000 END AS dc
              FROM s LEFT JOIN p USING (user_id))
            SELECT CAST(day AS BIGINT) AS day,
                   CAST(SUM(ne) AS BIGINT) AS n_event,
                   CAST(SUM(nc) AS BIGINT) AS n_censored
            FROM (
              SELECT de AS day, COUNT(*) AS ne, 0 AS nc FROM d
              WHERE de IS NOT NULL GROUP BY 1
              UNION ALL
              SELECT dc, 0, COUNT(*) FROM d
              WHERE dc IS NOT NULL GROUP BY 1)
            GROUP BY day ORDER BY day
        """,
        "order_value_lorenz": """
            WITH o AS (
              SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
              FROM orders),
            r AS (
              SELECT v,
                     ROW_NUMBER() OVER (ORDER BY v) AS rn,
                     SUM(v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                       AS cum,
                     COUNT(*) OVER () AS nn,
                     SUM(v) OVER () AS tot
              FROM o),
            d AS (SELECT UNNEST(range(1, 11)) AS decile)
            SELECT CAST(d.decile AS BIGINT) AS decile,
                   CAST(CEIL(r.nn * d.decile / 10.0) AS BIGINT) AS n_orders,
                   CAST(r.cum AS BIGINT) AS cum_value_c,
                   CAST(r.tot AS BIGINT) AS total_value_c
            FROM d JOIN r ON r.rn = CAST(CEIL(r.nn * d.decile / 10.0)
                                         AS BIGINT)
            ORDER BY decile
        """,
        "event_type_user_overlap": """
            WITH p AS (SELECT DISTINCT event_type AS g, user_id AS i
                       FROM events),
            c AS (SELECT g, COUNT(*) AS n FROM p GROUP BY g),
            j AS (SELECT x.g AS ga, y.g AS gb, COUNT(*) AS inter
                  FROM p x JOIN p y ON x.i = y.i AND x.g < y.g
                  GROUP BY 1, 2)
            SELECT ga AS a, gb AS b,
                   CAST(inter AS BIGINT) AS inter,
                   CAST(ca.n + cb.n - inter AS BIGINT) AS uni
            FROM j JOIN c ca ON ca.g = ga JOIN c cb ON cb.g = gb
            ORDER BY a, b
        """,
        "ship_latency_quantiles": """
            WITH s AS (
              SELECT o.o_orderpriority AS prio,
                     (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate))
                       // 86400000000 AS d
              FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
            SELECT prio, CAST(0.5 AS DOUBLE) AS q,
                   CAST(quantile_disc(d, 0.5) AS BIGINT) AS lat_days
            FROM s GROUP BY prio
            UNION ALL
            SELECT prio, 0.9, CAST(quantile_disc(d, 0.9) AS BIGINT)
            FROM s GROUP BY prio
        """,
        "flag_weighted_median_price": """
            WITH h AS (
              SELECT l_returnflag AS flag,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
                     CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT))
                          AS BIGINT) AS w
              FROM lineitem GROUP BY 1, 2),
            c AS (
              SELECT flag, v,
                     SUM(w) OVER (PARTITION BY flag ORDER BY v
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                     SUM(w) OVER (PARTITION BY flag) AS tot
              FROM h)
            SELECT flag, CAST(MIN(v) AS BIGINT) AS wmedian_scaled,
                   CAST(MIN(tot) AS BIGINT) AS total_weight
            FROM c WHERE 2 * cum >= tot
            GROUP BY flag ORDER BY flag
        """,
        "rfm_segments": """
            WITH pc AS (
              SELECT o_custkey,
                     MAX(epoch_us(o_orderdate)) AS last_us,
                     COUNT(*) AS f,
                     SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS m
              FROM orders GROUP BY o_custkey),
            dims AS (
              SELECT o_custkey,
                     ((SELECT MAX(last_us) FROM pc) - last_us)
                       // 86400000000 AS r,
                     f, m
              FROM pc),
            cuts AS (
              SELECT quantile_disc(r, 0.5) AS rc,
                     quantile_disc(f, 0.5) AS fc,
                     quantile_disc(m, 0.5) AS mc
              FROM dims)
            SELECT CAST(r <= rc AS BIGINT) AS r_recent,
                   CAST(f > fc AS BIGINT) AS f_hi,
                   CAST(m > mc AS BIGINT) AS m_hi,
                   COUNT(*) AS n
            FROM dims, cuts
            GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
        """,
        "stream_rate_limit": """
            WITH r AS (
              SELECT event_type,
                     ROW_NUMBER() OVER (
                       PARTITION BY user_id, epoch_us(ts) // 86400000000
                       ORDER BY ts, event_id) AS rn
              FROM events)
            SELECT event_type, COUNT(*) AS n
            FROM r WHERE rn <= 2
            GROUP BY event_type ORDER BY event_type
        """,
        "weighted_median_price": """
            WITH h AS (
              SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
                     CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT))
                          AS BIGINT) AS w
              FROM lineitem GROUP BY v),
            c AS (
              SELECT v,
                     SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                       AS cum,
                     SUM(w) OVER () AS tot
              FROM h)
            SELECT CAST(MIN(v) AS BIGINT) AS wmedian_scaled,
                   CAST(MIN(tot) AS BIGINT) AS total_weight
            FROM c WHERE 2 * cum >= tot
        """,
        "auto_join_revenue": """
            SELECT o.o_orderpriority,
                   CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) AS rev_c,
                   COUNT(*) AS n
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
        """,
        "user_funnel_1h": """
            WITH s1 AS (
              SELECT user_id, MIN(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY user_id
            ),
            s2 AS (
              SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
              JOIN s1 USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > s1.t1
                AND e.ts <= s1.t1 + INTERVAL 1 HOUR
              GROUP BY e.user_id
            ),
            s3 AS (
              SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
              JOIN s2 USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > s2.t2
                AND e.ts <= s2.t2 + INTERVAL 1 HOUR
              GROUP BY e.user_id
            )
            SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_type,
                   COUNT(*) AS n_users FROM s1
            UNION ALL
            SELECT 2, 'click', COUNT(*) FROM s2
            UNION ALL
            SELECT 3, 'purchase', COUNT(*) FROM s3
        """,
        "urgent_revenue_bloom": """
            SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT)
                     AS o_year,
                   CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) AS rev_c,
                   COUNT(*) AS n
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderpriority = '1-URGENT'
            GROUP BY o_year ORDER BY o_year
        """,
        "zorder_layout": f"""
            WITH base AS (
              SELECT user_id AS x,
                     epoch_us(ts) // 86400000000 AS y
              FROM events),
            mn AS (SELECT MIN(x) AS x0, MIN(y) AS y0 FROM base),
            mo AS (
              SELECT CAST({_ZORDER_TERMS} AS BIGINT) AS m, x, y
              FROM base, mn),
            b AS (SELECT quantile_disc(m, [{", ".join(str(i / 16)
                                            for i in range(1, 16))}]) AS qs
                  FROM mo)
            SELECT CAST(len(list_filter(b.qs, q -> q < mo.m)) AS BIGINT)
                     AS range_id,
                   COUNT(*) AS n,
                   MIN(x) AS min_x, MAX(x) AS max_x,
                   MIN(y) AS min_y, MAX(y) AS max_y
            FROM mo, b GROUP BY 1 ORDER BY 1
        """,
        "user_active_time": """
            WITH iv AS (
              SELECT user_id, epoch_us(ts) AS s,
                     epoch_us(ts) + 300000000 AS e
              FROM events),
            o AS (
              SELECT user_id, s, e,
                     MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS pme
              FROM iv),
            fl AS (
              SELECT user_id, s, e,
                     CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END
                     AS ns
              FROM o),
            isl AS (
              SELECT user_id, s, e,
                     SUM(ns) OVER (PARTITION BY user_id ORDER BY s, e
                       ROWS UNBOUNDED PRECEDING) AS iid
              FROM fl),
            g AS (SELECT user_id, iid, MIN(s) AS s0, MAX(e) AS e1
                  FROM isl GROUP BY 1, 2)
            SELECT user_id,
                   CAST(SUM(e1 - s0) // 1000000 AS BIGINT) AS active_s
            FROM g GROUP BY user_id ORDER BY user_id
        """,
        "join_size_exact": """
            SELECT CAST(SUM(e.n * o.n) AS BIGINT) AS join_rows
            FROM (SELECT user_id AS id, COUNT(*) AS n
                    FROM events GROUP BY 1) e
            JOIN (SELECT CAST(o_custkey AS BIGINT) AS id, COUNT(*) AS n
                    FROM orders GROUP BY 1) o USING (id)
        """,
        "orders_upsert_latest": """
            WITH aug AS (
              SELECT o_orderkey,
                     (epoch_us(o_orderdate) * 2 + 0) * 4 +
                     CASE o_orderstatus WHEN 'F' THEN 0 WHEN 'O' THEN 1
                          WHEN 'P' THEN 2 END AS pk
              FROM orders
              UNION ALL
              SELECT o_orderkey,
                     ((epoch_us(o_orderdate) + 86400000000) * 2 + 1) * 4 + 3
              FROM orders WHERE o_orderkey % 5 = 0),
            w AS (SELECT o_orderkey, MAX(pk) AS pk FROM aug GROUP BY 1)
            SELECT CASE pk % 4 WHEN 0 THEN 'F' WHEN 1 THEN 'O'
                        WHEN 2 THEN 'P' WHEN 3 THEN 'U' END AS status,
                   COUNT(*) AS n
            FROM w GROUP BY status ORDER BY status
        """,
        "skewed_user_revenue": """
            WITH ev AS (
              SELECT event_type, user_id FROM events
              UNION ALL
              SELECT event_type, 7 FROM events WHERE event_id % 6 = 0),
            j AS (
              SELECT e.event_type,
                     CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS p
              FROM ev e JOIN orders o ON o.o_custkey = e.user_id)
            SELECT event_type, CAST(SUM(p) AS BIGINT) AS rev_c,
                   COUNT(*) AS n
            FROM j GROUP BY event_type ORDER BY event_type
        """,
        "orders_top3_per_cust": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM orders
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) <= 3
            ORDER BY o_custkey, o_totalprice DESC, o_orderkey
        """,
        "sliding_window_counts": """
            WITH b AS (
              SELECT CAST(FLOOR(epoch(ts) / 1800) AS BIGINT) AS k FROM events
            )
            SELECT ws AS window_start, COUNT(*) AS n FROM (
              SELECT k * 1800 AS ws FROM b
              UNION ALL
              SELECT (k - 1) * 1800 AS ws FROM b
            ) GROUP BY ws
        """,
        "sliding_distinct_users": """
            WITH b AS (
              SELECT CAST(FLOOR(epoch(ts) / 1800) AS BIGINT) AS k,
                     user_id AS u
              FROM events)
            SELECT ws AS window_start, COUNT(DISTINCT u) AS n FROM (
              SELECT k * 1800 AS ws, u FROM b
              UNION ALL
              SELECT (k - 1) * 1800 AS ws, u FROM b
            ) GROUP BY ws ORDER BY ws
        """,
        "top_event_gaps": """
            WITH o AS (
              SELECT epoch_us(ts) AS t,
                     LEAD(epoch_us(ts)) OVER (ORDER BY ts) AS nt
              FROM events)
            SELECT nt - t AS gap_us, t AS start_us
            FROM o WHERE nt IS NOT NULL
            ORDER BY gap_us DESC, start_us ASC LIMIT 10
        """,
        "session_counts": """
            SELECT user_id, COUNT(*) AS n_sessions FROM (
              SELECT user_id,
                     CASE WHEN prev_ts IS NULL
                               OR epoch_us(ts) - epoch_us(prev_ts) > 3600000000
                          THEN 1 ELSE 0 END AS is_start
              FROM (
                SELECT user_id, ts,
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
                FROM events
              )
            ) WHERE is_start = 1 GROUP BY user_id
        """,
        "event_last_order_gap": """
            WITH m AS (
              SELECT e.event_type,
                     epoch_us(e.ts) AS t,
                     (SELECT MAX(epoch_us(o.o_orderdate)) FROM orders o
                       WHERE o.o_custkey = e.user_id
                         AND o.o_orderdate <= e.ts) AS mt
              FROM events e)
            SELECT event_type,
                   CAST(SUM((t - mt) // 1000000) AS BIGINT) AS sum_gap_s,
                   COUNT(*) AS n_matched
            FROM m WHERE mt IS NOT NULL
            GROUP BY event_type ORDER BY event_type
        """,
        "event_next_order_wait": """
            WITH m AS (
              SELECT e.event_type,
                     epoch_us(e.ts) AS t,
                     (SELECT MIN(epoch_us(p.ts)) FROM events p
                       WHERE p.user_id = e.user_id
                         AND p.event_type = 'purchase'
                         AND p.ts >= e.ts) AS mt
              FROM events e)
            SELECT event_type,
                   CAST(SUM((mt - t) // 1000000) AS BIGINT) AS sum_wait_s,
                   COUNT(*) AS n_matched
            FROM m WHERE mt IS NOT NULL
            GROUP BY event_type ORDER BY event_type
        """,
        "orders_skyline": """
            -- skyline via the running-min window identity (the quadratic
            -- NOT-EXISTS spec is equivalent but O(n^2) in DuckDB): a row
            -- survives iff its date equals its price-group's min date AND
            -- that min is strictly below every strictly-higher price's date
            WITH s AS (
              SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS o_totalprice,
                     CAST(epoch_us(o_orderdate) AS BIGINT) AS o_orderdate
              FROM orders
            ),
            g AS (
              SELECT o_totalprice, MIN(o_orderdate) AS gmin FROM s
              GROUP BY o_totalprice
            ),
            r AS (
              SELECT o_totalprice, gmin,
                     MIN(gmin) OVER (ORDER BY o_totalprice DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_best
              FROM g
            )
            SELECT s.o_totalprice, s.o_orderdate
            FROM s JOIN r USING (o_totalprice)
            WHERE s.o_orderdate = r.gmin
              AND (r.prev_best IS NULL OR s.o_orderdate < r.prev_best)
            ORDER BY o_totalprice, o_orderdate
        """,
        "value_quantiles_bisect": """
            WITH s AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS v FROM events)
            SELECT CAST(0.25 AS DOUBLE) AS q, CAST(quantile_disc(v, 0.25) AS BIGINT) AS value_scaled FROM s
            UNION ALL
            SELECT 0.5, CAST(quantile_disc(v, 0.5) AS BIGINT) FROM s
            UNION ALL
            SELECT 0.9, CAST(quantile_disc(v, 0.9) AS BIGINT) FROM s
        """,
        "value_quantiles": """
            WITH s AS (SELECT CAST(ROUND(value * 100) AS BIGINT) AS v FROM events)
            SELECT CAST(0.25 AS DOUBLE) AS q, CAST(quantile_disc(v, 0.25) AS BIGINT) AS value_scaled FROM s
            UNION ALL
            SELECT 0.5, CAST(quantile_disc(v, 0.5) AS BIGINT) FROM s
            UNION ALL
            SELECT 0.75, CAST(quantile_disc(v, 0.75) AS BIGINT) FROM s
            UNION ALL
            SELECT 0.95, CAST(quantile_disc(v, 0.95) AS BIGINT) FROM s
        """,
        "langid": f"""
            WITH w AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
              FROM documents
            ), v AS (
              SELECT doc_id,
                len(list_filter(ws, x -> x IN ({_sw('en')}))) AS v_en,
                len(list_filter(ws, x -> x IN ({_sw('es')}))) AS v_es,
                len(list_filter(ws, x -> x IN ({_sw('de')}))) AS v_de,
                len(list_filter(ws, x -> x IN ({_sw('fr')}))) AS v_fr
              FROM w
            ), p AS (
              SELECT CASE WHEN GREATEST(v_en, v_es, v_de, v_fr) = 0 THEN 'en'
                WHEN v_fr = GREATEST(v_en, v_es, v_de, v_fr) THEN 'fr'
                WHEN v_es = GREATEST(v_en, v_es, v_de, v_fr) THEN 'es'
                WHEN v_en = GREATEST(v_en, v_es, v_de, v_fr) THEN 'en'
                ELSE 'de' END AS lang_pred
              FROM v
            )
            SELECT lang_pred, COUNT(*) AS n FROM p GROUP BY lang_pred
        """,
        "content_hash_docs": """
            SELECT doc_id,
              CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
                        THEN h - 18446744073709551616::HUGEINT
                        ELSE h END AS BIGINT) AS chash
            FROM (
              SELECT doc_id, list_reduce(
                list_prepend(0::HUGEINT,
                  list_transform(
                    list_filter(string_split_regex(text, ''), c -> c <> ''),
                    c -> unicode(c)::HUGEINT)),
                (h, c) -> (h * 1000003 + c) % 18446744073709551616::HUGEINT) AS h
              FROM documents
            )
        """,
        "sampled_docs": """
            SELECT doc_id FROM documents
            WHERE (doc_id::HUGEINT * 2654435761) % 4294967296 < 858783744
        """,
        "user_interarrival": """
            SELECT user_id, COUNT(*) AS n_gaps,
                   CAST(SUM(g) AS BIGINT) AS sum_gap_us,
                   CAST(MAX(g) AS BIGINT) AS max_gap_us
            FROM (
              SELECT user_id,
                     epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) AS g
              FROM events
            ) WHERE g IS NOT NULL GROUP BY user_id
        """,
        "seq_pack_bins": """
            WITH RECURSIVE d AS (
              SELECT source, doc_id,
                     len(string_split(text, ' ')) AS n_tok,
                     ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
              FROM documents
            ), r AS (
              SELECT source, doc_id, n_tok, rn,
                     0 AS pack_bin, n_tok AS fill FROM d WHERE rn = 1
              UNION ALL
              SELECT d.source, d.doc_id, d.n_tok, d.rn,
                     CASE WHEN r.fill + d.n_tok > 256
                          THEN r.pack_bin + 1 ELSE r.pack_bin END,
                     CASE WHEN r.fill + d.n_tok > 256
                          THEN d.n_tok ELSE r.fill + d.n_tok END
              FROM r JOIN d ON d.source = r.source AND d.rn = r.rn + 1
            )
            SELECT source, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
                   CAST(pack_bin AS BIGINT) AS pack_bin
            FROM r
        """,
        "ann_ivf_full": """
            SELECT vec_id, rank FROM (
              SELECT vec_id,
                     CAST(ROW_NUMBER() OVER (
                       ORDER BY list_cosine_similarity(embedding,
                         (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC,
                       vec_id ASC) AS BIGINT) AS rank
              FROM embeddings
            ) WHERE rank <= 10
        """,
        "user_event_runs": """
            WITH o AS (
              SELECT event_type,
                     LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events
            )
            SELECT event_type, COUNT(*) AS n_events,
                   SUM(CASE WHEN prev IS NULL OR prev <> event_type
                       THEN 1 ELSE 0 END)::BIGINT AS n_runs
            FROM o GROUP BY event_type
        """,
        "value_bucket_transitions": """
            WITH s AS (
              SELECT user_id, ts, event_id,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
              FROM events
            ), b AS (
              SELECT quantile_disc(c, 0.25) AS b1, quantile_disc(c, 0.5) AS b2,
                     quantile_disc(c, 0.75) AS b3 FROM s
            ), e AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN c <= b1 THEN 0 WHEN c <= b2 THEN 1
                          WHEN c <= b3 THEN 2 ELSE 3 END AS vb
              FROM s, b
            ), o AS (
              SELECT vb, LEAD(vb) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS nvb
              FROM e
            )
            SELECT CAST(vb AS BIGINT) AS cur_vb, CAST(nvb AS BIGINT) AS next_vb,
                   COUNT(*) AS n
            FROM o WHERE nvb IS NOT NULL GROUP BY vb, nvb
        """,
        "source_charclass_counts": """
            SELECT source,
              SUM(length(regexp_replace(text, '[^A-Za-z]', '', 'g')))::BIGINT
                AS n_alpha,
              SUM(length(regexp_replace(text, '[^0-9]', '', 'g')))::BIGINT
                AS n_digit,
              SUM(length(text) - length(replace(text, ' ', '')))::BIGINT
                AS n_space,
              SUM(length(text)
                  - length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                  - length(regexp_replace(text, '[^0-9]', '', 'g'))
                  - (length(text) - length(replace(text, ' ', ''))))::BIGINT
                AS n_other
            FROM documents GROUP BY source
        """,
        "mode_value_per_type": """
            SELECT event_type, c AS mode_cents, n FROM (
              SELECT event_type, c, COUNT(*) AS n,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY COUNT(*) DESC, c ASC) AS rn
              FROM (SELECT event_type,
                           CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
                    FROM events)
              GROUP BY event_type, c
            ) WHERE rn = 1
        """,
        "events_csv_roundtrip": """
            SELECT event_type, COUNT(*) AS n,
                   SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
            FROM events GROUP BY event_type
        """,
        "order_gap_quantiles": """
            WITH g AS (
              SELECT (epoch_us(o_orderdate)
                      - epoch_us(LAG(o_orderdate) OVER (
                          PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey)))
                     // 86400000000 AS gap_days
              FROM orders
            ), v AS (SELECT gap_days FROM g WHERE gap_days IS NOT NULL)
            SELECT CAST(0.25 AS DOUBLE) AS q,
                   CAST(quantile_disc(gap_days, 0.25) AS BIGINT) AS gap_days
            FROM v
            UNION ALL SELECT 0.5, CAST(quantile_disc(gap_days, 0.5) AS BIGINT) FROM v
            UNION ALL SELECT 0.75, CAST(quantile_disc(gap_days, 0.75) AS BIGINT) FROM v
            UNION ALL SELECT 0.9, CAST(quantile_disc(gap_days, 0.9) AS BIGINT) FROM v
        """,
        "returnflag_priority_contingency": """
            SELECT l_returnflag, o_orderpriority, COUNT(*) AS n
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY l_returnflag, o_orderpriority
        """,
        "minhash_signatures": f"""
            WITH {mh_core}
            SELECT doc_id, CAST(perm AS BIGINT) AS perm,
              CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
                        THEN h - 18446744073709551616::HUGEINT
                        ELSE h END AS BIGINT) AS minhash
            FROM mh
        """,
        "minhash_lsh_pairs": f"""
            WITH {mh_core},
            band AS (
              SELECT doc_id, perm // 2 AS band,
                     MAX(CASE WHEN perm % 2 = 0 THEN h END) AS m0,
                     MAX(CASE WHEN perm % 2 = 1 THEN h END) AS m1
              FROM mh GROUP BY 1, 2),
            cand AS (
              SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              FROM band x JOIN band y
                ON x.band = y.band AND x.m0 = y.m0 AND x.m1 = y.m1
                AND x.doc_id < y.doc_id)
            SELECT a, b, n_eq FROM (
              SELECT c.a, c.b, CAST(COUNT(*) AS BIGINT) AS n_eq
              FROM cand c
              JOIN mh sa ON sa.doc_id = c.a
              JOIN mh sb ON sb.doc_id = c.b AND sb.perm = sa.perm
                AND sb.h = sa.h
              GROUP BY 1, 2)
            WHERE n_eq >= 4 ORDER BY a, b
        """,
        # Bloom bitmap replay: word hashes from the shared Horner family,
        # gram fold with the odd GOLDEN multiplier (dedup.gram_hashes_poly
        # — NOT mh_core's POLY_BASE fold, which lets digits swap across
        # word boundaries), Kirsch–Mitzenmacher coords h1 + i·h2 with
        # h2 = ((h xor h>>33)·GOLDEN mod 2^64) | 1 via the 32-bit-split
        # multiply; the 2^22 position modulus divides 2^64, so the mod-2^64
        # wrap never has to be emulated before the % 4194304.
        "bloom_decontaminate_docs": """
            WITH wh AS (
              SELECT doc_id,
                list_transform(string_split(text, ' '),
                  w -> list_reduce(list_prepend(0::HUGEINT,
                         list_transform(
                           list_filter(string_split_regex(w, ''),
                                       c -> c <> ''),
                           c -> unicode(c)::HUGEINT)),
                       (h, c) -> (h * 1000003 + c)
                                 % 18446744073709551616::HUGEINT)) AS whl,
                list_reduce(list_prepend(0::HUGEINT,
                  list_transform(
                    list_filter(string_split_regex(text, ''), c -> c <> ''),
                    c -> unicode(c)::HUGEINT)),
                  (h, c) -> (h * 1000003 + c)
                            % 18446744073709551616::HUGEINT) AS chash
              FROM documents
            ), g AS (
              SELECT doc_id,
                CASE WHEN len(whl) >= 3 THEN
                  list_transform(generate_series(1, len(whl) - 2),
                    i -> list_reduce(list_prepend(0::HUGEINT, whl[i:i+2]),
                         (h, c) -> ((h // 4294967296
                                       * 11400714819323198485::HUGEINT
                                       % 18446744073709551616::HUGEINT)
                                      * 4294967296
                                    + (h % 4294967296)
                                      * 11400714819323198485::HUGEINT
                                    + c)
                                   % 18446744073709551616::HUGEINT))
                ELSE [chash] END AS ghl
              FROM wh
            ),
            tg AS (
              SELECT DISTINCT doc_id, h
              FROM (SELECT doc_id, unnest(ghl) AS h FROM g)),
            tpr AS (
              SELECT doc_id, h,
                     ((hx // 4294967296 * 11400714819323198485::HUGEINT
                         % 18446744073709551616::HUGEINT) * 4294967296
                      + (hx % 4294967296) * 11400714819323198485::HUGEINT)
                     % 18446744073709551616::HUGEINT AS pr
              FROM (SELECT doc_id, h, xor(h, h // 8589934592) AS hx
                    FROM tg)),
            bpos AS (
              SELECT DISTINCT (h + i.i * (pr - pr % 2 + 1)) % 4194304 AS pos
              FROM tpr, generate_series(0, 3) AS i(i)
              WHERE doc_id % 17 = 0),
            hits AS (
              SELECT doc_id
              FROM tpr, generate_series(0, 3) AS i(i)
              GROUP BY doc_id, h, pr
              HAVING COUNT(DISTINCT i.i) FILTER (
                WHERE (h + i.i * (pr - pr % 2 + 1)) % 4194304
                      IN (SELECT pos FROM bpos)) = 4)
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT doc_id FROM hits)
            ORDER BY doc_id
        """,
        "simhash_lsh_pairs": """
            WITH wh AS (
              SELECT doc_id,
                list_transform(string_split(text, ' '),
                  w -> list_reduce(list_prepend(0::HUGEINT,
                         list_transform(
                           list_filter(string_split_regex(w, ''),
                                       c -> c <> ''),
                           c -> unicode(c)::HUGEINT)),
                       (h, c) -> (h * 1000003 + c)
                                 % 18446744073709551616::HUGEINT)) AS whl
              FROM documents
            ), s64 AS (
              SELECT doc_id,
                list_sum(list_transform(generate_series(0, 63),
                  b -> CASE WHEN 2 * list_sum(list_transform(whl,
                              h -> CASE WHEN (h // (1::HUGEINT << b)) % 2 = 1
                                   THEN 1 ELSE 0 END)) > len(whl)
                       THEN (1::HUGEINT << b) ELSE 0::HUGEINT END)) AS s
              FROM wh
            ), sig AS (
              SELECT doc_id,
                CAST(CASE WHEN s >= 9223372036854775808::HUGEINT
                          THEN s - 18446744073709551616::HUGEINT
                          ELSE s END AS BIGINT) AS sv, s
              FROM s64
            ), band AS (
              SELECT doc_id, t.b AS band,
                     (s // (1::HUGEINT << (16 * t.b))) % 65536 AS bkey
              FROM sig, generate_series(0, 3) AS t(b)
            ), cand AS (
              SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
              FROM band x JOIN band y
                ON x.band = y.band AND x.bkey = y.bkey
                AND x.doc_id < y.doc_id)
            SELECT c.a, c.b,
                   CAST(bit_count(xor(sa.sv, sb.sv)) AS BIGINT) AS hamming
            FROM cand c
            JOIN sig sa ON sa.doc_id = c.a
            JOIN sig sb ON sb.doc_id = c.b
            WHERE bit_count(xor(sa.sv, sb.sv)) <= 3
            ORDER BY c.a, c.b
        """,
        "event_value_drift": """
            WITH h AS (
              SELECT event_type,
                     CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
                     COUNT(*) AS c
              FROM events WHERE event_type IN ('purchase', 'click')
              GROUP BY 1, 2),
            p AS (SELECT cents, c FROM h WHERE event_type = 'purchase'),
            k AS (SELECT cents, c FROM h WHERE event_type = 'click'),
            n AS (SELECT (SELECT COALESCE(SUM(c), 0) FROM p) AS n1,
                         (SELECT COALESCE(SUM(c), 0) FROM k) AS n2),
            j AS (SELECT COALESCE(p.c, 0) AS c1, COALESCE(k.c, 0) AS c2
                  FROM p FULL JOIN k ON p.cents = k.cents)
            SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
                   CAST(SUM(ABS(c1 * n.n2 - c2 * n.n1)) AS BIGINT) AS tv_num
            FROM j, n GROUP BY n.n1, n.n2
        """,
        "simhash16": """
            WITH wh AS (
              SELECT doc_id,
                list_transform(string_split(text, ' '),
                  w -> list_reduce(list_prepend(0::HUGEINT,
                         list_transform(
                           list_filter(string_split_regex(w, ''),
                                       c -> c <> ''),
                           c -> unicode(c)::HUGEINT)),
                       (h, c) -> (h * 1000003 + c)
                                 % 18446744073709551616::HUGEINT)) AS whl
              FROM documents
            )
            SELECT doc_id,
              CAST(list_sum(list_transform(generate_series(0, 15),
                b -> CASE WHEN 2 * list_sum(list_transform(whl,
                            h -> CASE WHEN (h // (1::HUGEINT << b)) % 2 = 1
                                 THEN 1 ELSE 0 END)) > len(whl)
                     THEN 1::BIGINT << b ELSE 0 END)) AS BIGINT) AS simhash
            FROM wh
        """,
        "winnow_fingerprints": """
            WITH wh AS (
              SELECT doc_id,
                list_transform(string_split(text, ' '),
                  w -> list_reduce(list_prepend(0::HUGEINT,
                         list_transform(
                           list_filter(string_split_regex(w, ''),
                                       c -> c <> ''),
                           c -> unicode(c)::HUGEINT)),
                       (h, c) -> (h * 1000003 + c)
                                 % 18446744073709551616::HUGEINT)) AS whl,
                list_reduce(list_prepend(0::HUGEINT,
                  list_transform(
                    list_filter(string_split_regex(text, ''), c -> c <> ''),
                    c -> unicode(c)::HUGEINT)),
                  (h, c) -> (h * 1000003 + c)
                            % 18446744073709551616::HUGEINT) AS chash
              FROM documents
            ), f AS (
              SELECT doc_id,
                CASE WHEN len(whl) >= 5 THEN
                  list_min(list_transform(
                    generate_series(1, len(whl) - 4),
                    i -> list_reduce(
                           list_prepend(0::HUGEINT, whl[i:i+4]),
                           (h, c) -> (h * 1000003 + c)
                                     % 18446744073709551616::HUGEINT)))
                ELSE chash END AS h
              FROM wh
            )
            SELECT doc_id,
              CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
                        THEN h - 18446744073709551616::HUGEINT
                        ELSE h END AS BIGINT) AS fp
            FROM f
        """,
        "seq_pack_sharded": """
            WITH RECURSIVE d AS (
              SELECT source, doc_id,
                     len(string_split(text, ' ')) AS n_tok,
                     CAST((doc_id::HUGEINT * 2654435761) % 4294967296
                          AS BIGINT) % 4 AS shard,
                     ROW_NUMBER() OVER (
                       PARTITION BY source,
                         CAST((doc_id::HUGEINT * 2654435761) % 4294967296
                              AS BIGINT) % 4
                       ORDER BY doc_id) AS rn
              FROM documents
            ), r AS (
              SELECT source, shard, doc_id, n_tok, rn,
                     0 AS local_bin, n_tok AS fill FROM d WHERE rn = 1
              UNION ALL
              SELECT d.source, d.shard, d.doc_id, d.n_tok, d.rn,
                     CASE WHEN r.fill + d.n_tok > 256
                          THEN r.local_bin + 1 ELSE r.local_bin END,
                     CASE WHEN r.fill + d.n_tok > 256
                          THEN d.n_tok ELSE r.fill + d.n_tok END
              FROM r JOIN d ON d.source = r.source AND d.shard = r.shard
                           AND d.rn = r.rn + 1
            ), nb AS (
              SELECT source, shard, MAX(local_bin) + 1 AS n_bins
              FROM r GROUP BY source, shard
            ), base AS (
              SELECT source, shard,
                     COALESCE(SUM(n_bins) OVER (
                       PARTITION BY source ORDER BY shard
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS b
              FROM nb
            )
            SELECT r.source, r.doc_id, CAST(r.n_tok AS BIGINT) AS n_tok,
                   CAST(r.local_bin + base.b AS BIGINT) AS pack_bin
            FROM r JOIN base ON r.source = base.source
                            AND r.shard = base.shard
        """,
        "bigram_topk": """
            WITH ws AS (SELECT string_split(text, ' ') AS w FROM documents),
            b AS (
              SELECT w[i] || ' ' || w[i + 1] AS bigram
              FROM ws, LATERAL (
                SELECT unnest(generate_series(1, len(w) - 1)) AS i) t
            )
            SELECT bigram, COUNT(*) AS n
            FROM b GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 10
        """,
        "doc_top_term": """
            WITH w AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents
            ), tf AS (
              SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY doc_id, term
            ), df AS (
              SELECT term, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY term
            )
            SELECT doc_id, term FROM (
              SELECT tf.doc_id, tf.term, ROW_NUMBER() OVER (
                PARTITION BY tf.doc_id
                ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rn
              FROM tf JOIN df USING (term)
            ) WHERE rn = 1
        """,
        "props_templates": """
            SELECT regexp_replace(props, '[0-9]+', '#', 'g') AS template,
                   COUNT(*) AS n
            FROM events GROUP BY template
        """,
        "quality_histogram": f"""
            WITH q AS ({_QUALITY_SQL.format(extra="")})
            SELECT CAST(FLOOR(quality * 10) AS BIGINT) AS bucket, COUNT(*) AS n
            FROM q GROUP BY bucket
        """,
        "best_doc_per_lang": f"""
            WITH q AS ({_QUALITY_SQL.format(extra=", lang")})
            SELECT lang, doc_id FROM (
              SELECT lang, doc_id, ROW_NUMBER() OVER (
                PARTITION BY lang ORDER BY quality DESC, doc_id ASC) AS rn
              FROM q
            ) WHERE rn = 1
        """,
        "heavy_user_filter": """
            WITH hv AS (
              SELECT user_id FROM (
                SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
                ORDER BY n DESC, user_id ASC LIMIT 5)
            )
            SELECT event_type, COUNT(*) AS n FROM events
            WHERE user_id NOT IN (SELECT user_id FROM hv)
            GROUP BY event_type
        """,
        "grouped_sample_events": """
            SELECT event_type, event_id FROM (
              SELECT event_type, event_id, ROW_NUMBER() OVER (
                PARTITION BY event_type
                ORDER BY (event_id::HUGEINT * 2654435761) % 4294967296 ASC,
                         event_id ASC) AS rn
              FROM events
            ) WHERE rn <= 3
        """,
        "revenue_by_priority": """
            SELECT o_orderpriority,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_cents,
                   COUNT(*) AS n
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
            GROUP BY o_orderpriority
        """,
        "value_quantiles_by_type": """
            WITH s AS (
              SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v
              FROM events
            )
            SELECT event_type, CAST(0.5 AS DOUBLE) AS q,
                   CAST(quantile_disc(v, 0.5) AS BIGINT) AS value_scaled
            FROM s GROUP BY event_type
            UNION ALL
            SELECT event_type, 0.9, CAST(quantile_disc(v, 0.9) AS BIGINT)
            FROM s GROUP BY event_type
        """,
        "label_centroid_sums": """
            WITH z AS (SELECT label,
                  unnest(list_zip(generate_series(1, len(embedding)),
                         list_transform(embedding,
                           e -> CAST(FLOOR(CAST(e AS DOUBLE) * 1000000.0
                                           + 0.5) AS BIGINT))))
                    AS p
                  FROM embeddings)
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(p[1] AS BIGINT) AS dim,
                   CAST(SUM(p[2]) AS BIGINT) AS sum_scaled,
                   COUNT(*) AS n
            FROM z GROUP BY label, p[1]
        """,
        "winsorized_value_sums": """
            WITH s AS (
              SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v
              FROM events
            ),
            q AS (
              SELECT event_type,
                     quantile_disc(v, 0.05) AS lo,
                     quantile_disc(v, 0.95) AS hi
              FROM s GROUP BY event_type
            )
            SELECT s.event_type, COUNT(*) AS n,
                   CAST(SUM(LEAST(GREATEST(s.v, q.lo), q.hi)) AS BIGINT)
                     AS sum_wins_scaled
            FROM s JOIN q USING (event_type)
            GROUP BY s.event_type
        """,
        "user_rolling_value": """
            SELECT event_id,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS roll_sum
            FROM events
        """,
        "split_leakage": """
            WITH aug AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000001, text FROM documents
              WHERE doc_id % 7 = 0),
            p AS (SELECT DISTINCT text, doc_id % 10 AS s
                  FROM aug),
            g AS (SELECT text, COUNT(*) AS ns FROM p GROUP BY text)
            SELECT CAST(COALESCE(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END),
                                 0) AS BIGINT) AS n_leaked,
                   COUNT(*) AS n_contents
            FROM g
        """,
        "embedding_dim_stats": """
            WITH x AS (
              SELECT UNNEST(embedding) AS e,
                     UNNEST(range(1, len(embedding) + 1)) AS dim
              FROM embeddings)
            SELECT CAST(dim AS BIGINT) AS dim,
                   MIN(CAST(FLOOR(CAST(e AS DOUBLE) * 1000 + 0.5)
                            AS BIGINT)) AS min_q,
                   MAX(CAST(FLOOR(CAST(e AS DOUBLE) * 1000 + 0.5)
                            AS BIGINT)) AS max_q,
                   CAST(SUM(CAST(FLOOR(CAST(e AS DOUBLE) * 1000 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS sum_q,
                   COUNT(*) AS n
            FROM x GROUP BY dim ORDER BY dim
        """,
        "actor_activity_full": """
            SELECT COALESCE(o.id, e.id) AS actor_id,
                   COALESCE(o.n, 0) AS n_orders,
                   COALESCE(e.n, 0) AS n_events
            FROM (SELECT CAST(o_custkey AS BIGINT) AS id, COUNT(*) AS n
                    FROM orders GROUP BY 1) o
            FULL OUTER JOIN
                 (SELECT user_id AS id, COUNT(*) AS n
                    FROM events GROUP BY 1) e
              ON o.id = e.id
            ORDER BY actor_id
        """,
        "user_longest_streak": """
            WITH ud AS (
              SELECT DISTINCT user_id,
                     epoch_us(ts) // 86400000000 AS d
              FROM events),
            r AS (
              SELECT user_id, d,
                     d - ROW_NUMBER() OVER (PARTITION BY user_id
                                            ORDER BY d) AS isl
              FROM ud),
            runs AS (SELECT user_id, COUNT(*) AS len
                     FROM r GROUP BY user_id, isl),
            longest AS (SELECT user_id, MAX(len) AS streak_days
                        FROM runs GROUP BY user_id)
            SELECT CAST(streak_days AS BIGINT) AS streak_days,
                   COUNT(*) AS n_users
            FROM longest GROUP BY streak_days ORDER BY streak_days
        """,
        "user_value_window_1h": """
            SELECT event_id,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS win_sum_c
            FROM events
        """,
        "shuffle_export_counts": """
            SELECT CAST((doc_id::HUGEINT * 2654435761) % 4294967296
                        // 268435456 AS BIGINT) AS bucket, COUNT(*) AS n
            FROM documents GROUP BY bucket
        """,
        "curation_pipeline": f"""
            WITH RECURSIVE q AS ({_QUALITY_SQL.format(extra=", source, text")}),
            s AS (
              SELECT doc_id, source,
                     len(string_split(text, ' ')) AS n_tok,
                     {_POLY_HASH.format(col="text")} AS chash
              FROM q
              WHERE quality >= 0.65
                AND (doc_id::HUGEINT * 2654435761) % 4294967296 < 3436183552
            ),
            d AS (
              SELECT doc_id, source, n_tok FROM (
                SELECT s.*, ROW_NUMBER() OVER (
                  PARTITION BY chash ORDER BY doc_id) AS dr
                FROM s) WHERE dr = 1
            ),
            e AS (
              SELECT source, doc_id, n_tok,
                     CAST((doc_id::HUGEINT * 2654435761) % 4294967296
                          AS BIGINT) % 4 AS shard,
                     ROW_NUMBER() OVER (
                       PARTITION BY source,
                         CAST((doc_id::HUGEINT * 2654435761) % 4294967296
                              AS BIGINT) % 4
                       ORDER BY doc_id) AS rn
              FROM d
            ),
            r AS (
              SELECT source, shard, doc_id, n_tok, rn,
                     0 AS pack_bin, n_tok AS fill
              FROM e WHERE rn = 1
              UNION ALL
              SELECT e.source, e.shard, e.doc_id, e.n_tok, e.rn,
                     CASE WHEN r.fill + e.n_tok > 256
                          THEN r.pack_bin + 1 ELSE r.pack_bin END,
                     CASE WHEN r.fill + e.n_tok > 256
                          THEN e.n_tok ELSE r.fill + e.n_tok END
              FROM r JOIN e ON e.source = r.source AND e.shard = r.shard
                           AND e.rn = r.rn + 1
            ),
            nb AS (
              SELECT source, shard, MAX(pack_bin) + 1 AS bins,
                     COUNT(*) AS n, SUM(n_tok) AS st
              FROM r GROUP BY source, shard
            )
            SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs,
                   CAST(SUM(bins) AS BIGINT) AS n_bins,
                   CAST(SUM(st) AS BIGINT) AS sum_tok
            FROM nb GROUP BY source
        """,
        "recent_event_counts": """
            SELECT event_type, COUNT(*) AS n FROM events
            WHERE ts >= TIMESTAMP '2024-01-15' GROUP BY event_type
        """,
        "stratified_sample_events": """
            SELECT event_type, COUNT(*) AS n FROM events
            WHERE (event_id::HUGEINT * 2654435761) % 4294967296 <
                  (CASE event_type WHEN 'error' THEN 4096
                                   WHEN 'view' THEN 205
                                   ELSE 1024 END)::HUGEINT * 1048576
            GROUP BY event_type
        """,
        "quality_rule_violations": f"""
            WITH tok AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
            ), per AS (
              SELECT doc_id, COUNT(*) AS n_words,
                     SUM(length(w)) AS sum_wl,
                     SUM(CASE WHEN w IN ({stoplist}) THEN 1 ELSE 0 END) AS n_stop
              FROM tok GROUP BY doc_id
            ), mf AS (
              SELECT doc_id, MAX(c) AS max_freq FROM (
                SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w
              ) GROUP BY doc_id
            )
            SELECT 'too_short' AS rule,
                   CAST(COUNT(*) FILTER (WHERE n_words < 20) AS BIGINT) AS n
            FROM per
            UNION ALL
            SELECT 'long_words',
                   COUNT(*) FILTER (WHERE CAST(sum_wl AS DOUBLE)
                                          / GREATEST(n_words, 1) > 10)
            FROM per
            UNION ALL
            SELECT 'one_word_dominates', COUNT(*) FILTER (
                WHERE mf.max_freq > 0.2 * GREATEST(per.n_words, 1))
            FROM per JOIN mf USING (doc_id)
            UNION ALL
            SELECT 'few_stopwords',
                   COUNT(*) FILTER (WHERE n_stop < CEIL(0.05 * n_words))
            FROM per
        """,
        "dup_cluster_histogram": """
            SELECT CAST(sz AS BIGINT) AS cluster_size,
                   COUNT(*) AS n_clusters
            FROM (SELECT COUNT(*) AS sz FROM documents GROUP BY text)
            GROUP BY sz
        """,
        "order_chain_components": """
            WITH g AS (SELECT o_custkey, MIN(o_orderkey) AS component,
                              COUNT(*) AS n
                       FROM orders GROUP BY o_custkey)
            SELECT o.o_orderkey, CAST(g.component AS BIGINT) AS component
            FROM orders o JOIN g USING (o_custkey)
            WHERE g.n >= 2
        """,
        "split_counts": f"""
            WITH b AS (SELECT source,
                              {_POLY_HASH.format(col='text')} % 100 AS bkt
                       FROM documents)
            SELECT CASE WHEN bkt < 98 THEN 'train'
                        WHEN bkt = 98 THEN 'valid'
                        ELSE 'test' END AS split,
                   source, COUNT(*) AS n
            FROM b GROUP BY 1, 2
        """,
        "error_rate_anomalies": """
            WITH h AS (SELECT CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT)
                                AS window_start,
                              COUNT(*) AS n
                       FROM events WHERE event_type = 'error' GROUP BY 1)
            SELECT window_start, n FROM h
            WHERE n > 1.5 * (SELECT AVG(n) FROM h)
        """,
        "pii_scrub_docs": f"""
            WITH aug AS (SELECT doc_id, {_PII_AUG} AS aug FROM documents)
            SELECT doc_id, {_pii_scrub_expr} AS scrubbed FROM aug
        """,
        "pii_counts": _pii_counts_sql,
        "event_rule_violations": """
            SELECT 'fk_user' AS rule, COUNT(*) AS n_checked,
                   COUNT(*) FILTER (WHERE user_id NOT IN
                       (SELECT c_custkey FROM customer)) AS n_violations
            FROM events
            UNION ALL
            SELECT 'props_k_under_50', COUNT(*),
                   COUNT(*) FILTER (WHERE COALESCE(TRY_CAST(
                       regexp_extract(props, '"k":\\s*(\\d+)', 1)
                       AS BIGINT), 50) >= 50)
            FROM events
            UNION ALL
            SELECT 'value_in_range', COUNT(*),
                   COUNT(*) FILTER (WHERE value < 0 OR value >= 100)
            FROM events
        """,
        "events_profile": """
            SELECT 'event_id' AS "column", COUNT(*) AS n,
                   COUNT(*) - COUNT(event_id) AS n_null,
                   CAST(MIN(event_id) AS DOUBLE) AS min_v,
                   CAST(MAX(event_id) AS DOUBLE) AS max_v FROM events
            UNION ALL
            SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
                   CAST(MIN(user_id) AS DOUBLE),
                   CAST(MAX(user_id) AS DOUBLE) FROM events
            UNION ALL
            SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
                   CAST(MIN(value) AS DOUBLE),
                   CAST(MAX(value) AS DOUBLE) FROM events
        """,
        "dup_ngram_doc_frac": """
            WITH ws AS (SELECT doc_id, len(text) AS L,
                               string_split(text, ' ') AS w
                        FROM documents),
            g AS (SELECT doc_id,
                         unnest(list_transform(generate_series(1, len(w)-1),
                                i -> w[i] || ' ' || w[i+1])) AS gram
                  FROM ws),
            c AS (SELECT doc_id, gram,
                         COUNT(*) OVER (PARTITION BY doc_id, gram) AS cnt
                  FROM g),
            dc AS (SELECT doc_id,
                          COALESCE(SUM(len(gram)) FILTER (WHERE cnt >= 2),
                                   0) AS dup_chars
                   FROM c GROUP BY doc_id)
            SELECT ws.doc_id,
                   CASE WHEN ws.L = 0 THEN 0
                        ELSE LEAST(CAST(FLOOR(COALESCE(dc.dup_chars, 0)
                                   * 10000.0 / ws.L + 0.5) AS BIGINT),
                                   10000) END AS dup2_frac_bp
            FROM ws LEFT JOIN dc USING (doc_id)
        """,
        "actor_ids_union": """
            SELECT user_id AS actor_id FROM events
            UNION
            SELECT CAST(o_custkey AS BIGINT) FROM orders
        """,
        "actor_ids_intersect": """
            SELECT user_id AS actor_id FROM events
            INTERSECT
            SELECT CAST(o_custkey AS BIGINT) FROM orders
        """,
        "actor_ids_except": """
            SELECT CAST(o_custkey AS BIGINT) AS actor_id FROM orders
            EXCEPT
            SELECT user_id FROM events
        """,
        "normalized_distinct_docs": """
            SELECT lang, COUNT(DISTINCT trim(regexp_replace(regexp_replace(
                     lower(text), '[^a-z0-9 ]+', ' ', 'g'),
                     ' +', ' ', 'g'))) AS n_distinct
            FROM documents GROUP BY lang
        """,
        "session_spans": """
            WITH s AS (
              SELECT user_id, epoch_us(ts) AS us,
                     CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 3600000000
                          OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS st
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), a AS (
              SELECT user_id, us,
                     SUM(st) OVER (PARTITION BY user_id ORDER BY us
                                   ROWS UNBOUNDED PRECEDING) - 1 AS session_id
              FROM s
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   COUNT(*) AS n_events,
                   CAST(MAX(us) - MIN(us) AS BIGINT) AS span_us
            FROM a GROUP BY user_id, session_id
        """,
        "rare_bigram_counts": """
            WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            b AS (
              SELECT doc_id, w[i] || ' ' || w[i + 1] AS bigram
              FROM ws, LATERAL (
                SELECT unnest(generate_series(1, len(w) - 1)) AS i) t
            ),
            c AS (SELECT bigram, COUNT(*) AS n FROM b GROUP BY bigram),
            r AS (
              SELECT doc_id, COUNT(*) AS n_rare
              FROM b JOIN c USING (bigram) WHERE c.n <= 2 GROUP BY doc_id
            )
            SELECT d.doc_id, CAST(COALESCE(r.n_rare, 0) AS BIGINT) AS n_rare
            FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id
        """,
        "custs_without_orders": """
            SELECT c_nationkey, COUNT(*) AS n
            FROM customer c LEFT JOIN (
              SELECT o_custkey, o_orderkey FROM orders
              WHERE o_orderpriority = '1-URGENT') o
              ON c.c_custkey = o.o_custkey
            WHERE o.o_orderkey IS NULL
            GROUP BY c_nationkey
        """,
        "domain_rebalance": """
            WITH s AS (
              SELECT source,
                     CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tok
              FROM documents GROUP BY source
            ),
            tot AS (SELECT SUM(tok) AS T, COUNT(*) AS k FROM s),
            r AS (
              SELECT source,
                     CAST(LEAST(4096.0, FLOOR(
                       ((CAST(T AS DOUBLE) / k) * 4096.0) / tok))
                     AS BIGINT) AS keep
              FROM s, tot
            )
            SELECT d.source AS source,
                   CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS sum_tok,
                   COUNT(*) AS n_docs
            FROM documents d JOIN r ON d.source = r.source
            WHERE (d.doc_id::HUGEINT * 2654435761) % 4294967296
                  < r.keep::HUGEINT * 1048576
            GROUP BY d.source
            ORDER BY source
        """,
        # planted-truth oracle: solid-colour 8x8 PNGs of value (i*3)%256 —
        # the real decoder must recover exactly that mean with zero std
        "multimodal_decode_real": """
            SELECT printf('png-%04d', i) AS media_id,
                   CAST((i * 3) % 256 AS DOUBLE) AS pixel_mean,
                   CAST(0.0 AS DOUBLE) AS pixel_std
            FROM generate_series(0, 63) t(i)
            ORDER BY media_id
        """,
        "source_token_shares": """
            WITH s AS (
              SELECT source,
                     CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tok
              FROM documents GROUP BY source
            )
            SELECT source, sum_tok,
                   CAST(sum_tok * 1000000 // (SELECT SUM(sum_tok) FROM s)
                        AS BIGINT) AS ppm
            FROM s
        """,
        "user_funnel": """
            WITH s1 AS (
              SELECT user_id, MIN(ts) AS t1 FROM events
              WHERE event_type = 'view' GROUP BY user_id
            ),
            s2 AS (
              SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
              JOIN s1 USING (user_id)
              WHERE e.event_type = 'click' AND e.ts > s1.t1
              GROUP BY e.user_id
            ),
            s3 AS (
              SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
              JOIN s2 USING (user_id)
              WHERE e.event_type = 'purchase' AND e.ts > s2.t2
              GROUP BY e.user_id
            )
            SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_type,
                   COUNT(*) AS n_users FROM s1
            UNION ALL
            SELECT 2, 'click', COUNT(*) FROM s2
            UNION ALL
            SELECT 3, 'purchase', COUNT(*) FROM s3
        """,
        "orders_rollup": """
            SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                   COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_o_totalprice_scaled,
                   COUNT(*) AS n
            FROM orders
            GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        """,
        "orders_cube": """
            SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                   COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS sum_o_totalprice_scaled,
                   COUNT(*) AS n
            FROM orders
            GROUP BY CUBE(o_orderpriority, o_orderstatus)
        """,
        "stream_windowed_counts": """
            WITH a AS (
              SELECT event_id, ts,
                     epoch_us(ts)
                       + ((event_id::HUGEINT * 2654435761) % 5400) * 1000000
                       - 2700000000 AS ak,
                     epoch_us(ts) // 3600000000 * 3600000000 AS w,
                     event_id % 8 AS shard
              FROM events
            ),
            b AS (
              SELECT *, MAX(epoch_us(ts)) OVER (
                       PARTITION BY shard
                       ORDER BY ak, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS pm
              FROM a
            )
            SELECT make_timestamp(w) AS window_start, COUNT(*) AS n
            FROM b
            WHERE pm IS NULL OR pm - 1800000000 < w + 3600000000
            GROUP BY w
        """,
        "ann_topk_q8": """
            WITH qz AS (
              SELECT list_transform(embedding,
                       e -> LEAST(GREATEST(CAST(FLOOR(CAST(e AS DOUBLE) * 127
                                 + 0.5) AS BIGINT), -127), 127)) AS qe
              FROM embeddings WHERE vec_id = 0
            ),
            scored AS (
              SELECT vec_id,
                     CAST(list_sum(list_transform(
                       list_zip(
                         list_transform(embedding,
                           e -> LEAST(GREATEST(CAST(FLOOR(CAST(e AS DOUBLE)
                                     * 127 + 0.5) AS BIGINT), -127), 127)),
                         (SELECT qe FROM qz)),
                       p -> p[1] * p[2])) AS BIGINT) AS score_q
              FROM embeddings
            )
            SELECT vec_id, score_q, rank FROM (
              SELECT vec_id, score_q,
                     CAST(ROW_NUMBER() OVER (
                       ORDER BY score_q DESC, vec_id ASC) AS BIGINT) AS rank
              FROM scored
            ) WHERE rank <= 10
        """,
        "ann_topk_filtered": """
            WITH qz AS (
              SELECT list_transform(embedding,
                       e -> LEAST(GREATEST(CAST(FLOOR(CAST(e AS DOUBLE) * 127
                                 + 0.5) AS BIGINT), -127), 127)) AS qe
              FROM embeddings WHERE vec_id = 0
            ),
            scored AS (
              SELECT vec_id,
                     CAST(list_sum(list_transform(
                       list_zip(
                         list_transform(embedding,
                           e -> LEAST(GREATEST(CAST(FLOOR(CAST(e AS DOUBLE)
                                     * 127 + 0.5) AS BIGINT), -127), 127)),
                         (SELECT qe FROM qz)),
                       p -> p[1] * p[2])) AS BIGINT) AS score_q
              FROM embeddings WHERE label = 3
            )
            SELECT vec_id, score_q, rank FROM (
              SELECT vec_id, score_q,
                     CAST(ROW_NUMBER() OVER (
                       ORDER BY score_q DESC, vec_id ASC) AS BIGINT) AS rank
              FROM scored
            ) WHERE rank <= 10
        """,
        "tpch_q3": """
            SELECT o_orderkey, revenue_scaled, o_orderdate, rank FROM (
              SELECT l.l_orderkey AS o_orderkey,
                     CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                              * (100 - CAST(ROUND(l.l_discount * 100)
                                            AS BIGINT))) AS BIGINT)
                       AS revenue_scaled,
                     o.o_orderdate,
                     CAST(ROW_NUMBER() OVER (
                       ORDER BY SUM(CAST(ROUND(l.l_extendedprice * 100)
                                         AS BIGINT)
                                    * (100 - CAST(ROUND(l.l_discount * 100)
                                                  AS BIGINT))) DESC,
                                l.l_orderkey ASC) AS BIGINT) AS rank
              FROM customer c
              JOIN orders o ON c.c_custkey = o.o_custkey
              JOIN lineitem l ON l.l_orderkey = o.o_orderkey
              WHERE c.c_mktsegment = 'BUILDING'
                AND o.o_orderdate < TIMESTAMP '1998-06-01'
                AND l.l_shipdate > TIMESTAMP '1998-06-01'
              GROUP BY l.l_orderkey, o.o_orderdate
            ) WHERE rank <= 10
        """,
        "lineitem_corr_stats": """
            SELECT l_returnflag,
                   CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT)
                     AS sum_x,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) AS sum_y,
                   CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                            * CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) AS sum_xy,
                   COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag
        """,
        "char_budget_sample": """
            SELECT source, doc_id, n_chars FROM (
              SELECT source, doc_id, n_chars,
                     SUM(n_chars) OVER (
                       PARTITION BY source
                       ORDER BY (doc_id::HUGEINT * 2654435761) % 4294967296,
                                doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
              FROM documents
            ) WHERE cum <= 20000
        """,
        "event_value_ranks": """
            SELECT event_id, event_type,
                   CAST(ROW_NUMBER() OVER (
                     PARTITION BY event_type
                     ORDER BY CAST(ROUND(value * 100) AS BIGINT), event_id)
                     AS BIGINT) AS rank,
                   COUNT(*) OVER (PARTITION BY event_type) AS n_group
            FROM events
        """,
        "supplier_part_pagerank": """
            WITH e AS (
              SELECT DISTINCT l_suppkey AS u,
                     l_partkey + 10000000 AS v
              FROM lineitem
            ),
            nodes AS (SELECT u AS id FROM e UNION SELECT v FROM e),
            p AS (SELECT 1000000000000 // COUNT(*) AS r0 FROM nodes),
            deg AS (SELECT u, COUNT(*) AS d FROM e GROUP BY u),
            r0t AS (SELECT id, (SELECT r0 FROM p) AS r FROM nodes),
            i1 AS (SELECT e.v AS id, SUM(r0t.r // deg.d) AS s FROM e
                   JOIN r0t ON e.u = r0t.id JOIN deg ON e.u = deg.u
                   GROUP BY e.v),
            r1 AS (SELECT n.id,
                     (15 * (SELECT r0 FROM p)) // 100
                       + (85 * COALESCE(i1.s, 0)) // 100 AS r
                   FROM nodes n LEFT JOIN i1 ON n.id = i1.id),
            i2 AS (SELECT e.v AS id, SUM(r1.r // deg.d) AS s FROM e
                   JOIN r1 ON e.u = r1.id JOIN deg ON e.u = deg.u
                   GROUP BY e.v),
            r2 AS (SELECT n.id,
                     (15 * (SELECT r0 FROM p)) // 100
                       + (85 * COALESCE(i2.s, 0)) // 100 AS r
                   FROM nodes n LEFT JOIN i2 ON n.id = i2.id),
            i3 AS (SELECT e.v AS id, SUM(r2.r // deg.d) AS s FROM e
                   JOIN r2 ON e.u = r2.id JOIN deg ON e.u = deg.u
                   GROUP BY e.v),
            r3 AS (SELECT n.id,
                     (15 * (SELECT r0 FROM p)) // 100
                       + (85 * COALESCE(i3.s, 0)) // 100 AS r
                   FROM nodes n LEFT JOIN i3 ON n.id = i3.id)
            SELECT node, rank_fp, pos FROM (
              SELECT id AS node, CAST(r AS BIGINT) AS rank_fp,
                     CAST(ROW_NUMBER() OVER (ORDER BY r DESC, id ASC)
                          AS BIGINT) AS pos
              FROM r3
            ) WHERE pos <= 20
        """,
        "event_transitions": """
            SELECT cur_type, next_type, COUNT(*) AS n FROM (
              SELECT event_type AS cur_type,
                     LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       AS next_type
              FROM events
            ) WHERE next_type IS NOT NULL
            GROUP BY cur_type, next_type
        """,
        "value_outlier_counts": """
            WITH s AS (
              SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v
              FROM events
            ),
            med AS (
              SELECT event_type,
                     CAST(quantile_disc(v, 0.5) AS BIGINT) AS m
              FROM s GROUP BY event_type
            ),
            mad AS (
              SELECT s.event_type, med.m,
                     CAST(quantile_disc(ABS(s.v - med.m), 0.5) AS BIGINT)
                       AS d
              FROM s JOIN med USING (event_type)
              GROUP BY s.event_type, med.m
            )
            SELECT s.event_type, COUNT(*) AS n_total,
                   CAST(SUM(CASE WHEN ABS(s.v - mad.m) > 3 * mad.d
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
            FROM s JOIN mad USING (event_type)
            GROUP BY s.event_type ORDER BY s.event_type
        """,
        "value_mad_by_type": """
            WITH s AS (
              SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v
              FROM events
            ),
            med AS (
              SELECT event_type,
                     CAST(quantile_disc(v, 0.5) AS BIGINT) AS m
              FROM s GROUP BY event_type
            )
            SELECT s.event_type, med.m AS median_scaled,
                   CAST(quantile_disc(ABS(s.v - med.m), 0.5) AS BIGINT)
                     AS mad_scaled
            FROM s JOIN med USING (event_type)
            GROUP BY s.event_type, med.m
        """,
        "retention_cohorts": """
            WITH s AS (
              SELECT user_id,
                     MIN(epoch_us(ts) // 604800000000) AS cw
              FROM events WHERE event_type = 'signup' GROUP BY user_id
            )
            SELECT s.cw AS cohort_week,
                   (epoch_us(e.ts) // 604800000000) - s.cw AS k,
                   COUNT(DISTINCT e.user_id) AS n_users
            FROM events e JOIN s USING (user_id)
            WHERE (epoch_us(e.ts) // 604800000000) >= s.cw
            GROUP BY 1, 2
        """,
        "tpch_q10": """
            SELECT o_custkey, c_name, n_name, revenue_scaled, rank FROM (
              SELECT o.o_custkey,
                     CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                              * (100 - CAST(ROUND(l.l_discount * 100)
                                            AS BIGINT))) AS BIGINT)
                       AS revenue_scaled,
                     CAST(ROW_NUMBER() OVER (
                       ORDER BY SUM(CAST(ROUND(l.l_extendedprice * 100)
                                         AS BIGINT)
                                    * (100 - CAST(ROUND(l.l_discount * 100)
                                                  AS BIGINT))) DESC,
                                o.o_custkey ASC) AS BIGINT) AS rank
              FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
              WHERE l.l_returnflag = 'R'
                AND o.o_orderdate >= TIMESTAMP '1997-01-01'
                AND o.o_orderdate < TIMESTAMP '1997-07-01'
              GROUP BY o.o_custkey
            ) t
            JOIN customer c ON t.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE rank <= 20
        """,
        "tpch_q5": """
            SELECT n.n_name,
                   CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(ROUND(l.l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                     AS revenue_scaled
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE c.c_nationkey = s.s_nationkey
              AND r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1997-01-01'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY n.n_name
        """,
        "tpch_q14": """
            SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN
                     CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                   ELSE 0 END) AS BIGINT) AS promo_rev_scaled,
                   CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                     AS BIGINT) AS total_rev_scaled
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l.l_shipdate < TIMESTAMP '1997-04-01'
        """,
        "tpch_q18": """
            SELECT c.c_name, o.o_custkey, o.o_orderkey,
                   strftime(o.o_orderdate, '%Y-%m-%d') AS o_date,
                   CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS total_scaled,
                   CAST(t.sum_qty AS BIGINT) AS sum_qty
            FROM (SELECT l_orderkey,
                         SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING SUM(CAST(l_quantity AS BIGINT)) > 250) t
            JOIN orders o ON o.o_orderkey = t.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            ORDER BY CAST(ROUND(o.o_totalprice * 100) AS BIGINT) DESC,
                     o.o_orderkey
            LIMIT 100
        """,
        "tpch_q19": """
            SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                     AS BIGINT) AS rev_scaled,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
                   AND l.l_quantity BETWEEN 1 AND 11)
               OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 20
                   AND l.l_quantity BETWEEN 10 AND 20)
               OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 25
                   AND l.l_quantity BETWEEN 20 AND 30)
        """,
        "value_quantiles_cont": """
            SELECT 0.25::DOUBLE AS q, CAST(quantile_cont(
              CAST(ROUND(value*100) AS BIGINT), 0.25) AS DOUBLE) AS value_scaled
            FROM events
            UNION ALL
            SELECT 0.5::DOUBLE, CAST(quantile_cont(
              CAST(ROUND(value*100) AS BIGINT), 0.5) AS DOUBLE) FROM events
            UNION ALL
            SELECT 0.75::DOUBLE, CAST(quantile_cont(
              CAST(ROUND(value*100) AS BIGINT), 0.75) AS DOUBLE) FROM events
        """,
        "chunk_dedup_docs": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS l
                       FROM documents),
            c AS (
              SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
                     array_to_string(l[(u.i*10+1):(u.i*10+10)], ' ') AS chunk
              FROM w, LATERAL (SELECT unnest(range(0,
                       CAST(ceil(len(l)/10.0) AS BIGINT))) AS i) u
            )
            SELECT doc_id, chunk_idx FROM (
              SELECT doc_id, chunk_idx,
                     ROW_NUMBER() OVER (PARTITION BY chunk
                                        ORDER BY doc_id, chunk_idx) AS rn
              FROM c) t
            WHERE rn = 1
        """,
        "contamination_stats": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws,
                     len(string_split(text, ' ')) AS nw, text
              FROM documents
            ),
            grams AS (
              SELECT doc_id, UNNEST(
                CASE WHEN nw <= 3 THEN ['S:' || text]
                     ELSE list_transform(generate_series(1, nw - 2),
                           i -> 'L:' || ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                END) AS gram
              FROM w
            ),
            dg AS (SELECT DISTINCT doc_id, gram FROM grams),
            bench AS (SELECT DISTINCT gram FROM dg WHERE doc_id % 97 = 0)
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_grams,
                   CAST(SUM(CASE WHEN gram IN (SELECT gram FROM bench)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
            FROM dg WHERE doc_id % 97 <> 0
            GROUP BY doc_id
        """,
        "bpe_pair_counts": """
            WITH words AS (
              SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
            ),
            pairs AS (
              SELECT substr(w, CAST(u.i AS INT), 2) AS pair
              FROM words,
                   LATERAL (SELECT UNNEST(range(1, len(w))) AS i) u
              WHERE len(w) >= 2
            )
            SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
            FROM pairs GROUP BY pair
            ORDER BY n DESC, pair ASC LIMIT 20
        """,
        "event_debounce": """
            SELECT event_id FROM (
              SELECT event_id,
                     epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) AS gap
              FROM events) t
            WHERE gap IS NULL OR gap > 600 * 1000000
            ORDER BY event_id
        """,
        "nation_order_counts": """
            SELECT n.n_name,
                   CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
            FROM nation n
            LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
            LEFT JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY n.n_name
            ORDER BY n.n_name
        """,
        "cross_dedup_docs": """
            SELECT d.doc_id FROM documents d
            WHERE CAST(substr(d.source, 4) AS INT) >= 10
              AND d.text NOT IN (
                SELECT text FROM documents
                WHERE CAST(substr(source, 4) AS INT) < 10)
            ORDER BY d.doc_id
        """,
        "inverted_index": """
            WITH dw AS (
              SELECT DISTINCT doc_id, w FROM (
                SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
                FROM documents) t
            ),
            r AS (
              SELECT doc_id, w,
                     ROW_NUMBER() OVER (PARTITION BY w
                                        ORDER BY doc_id) AS rn
              FROM dw
            )
            SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS df,
                   string_agg(CASE WHEN rn <= 8
                                   THEN CAST(doc_id AS VARCHAR) END, ','
                              ORDER BY doc_id) AS postings
            FROM r GROUP BY w
            ORDER BY w
        """,
        "corpus_drift_words": """
            WITH wa AS (
              SELECT w, COUNT(*) AS n FROM (
                SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
                WHERE CAST(substr(source, 4) AS INT) < 10) t GROUP BY w
            ),
            wb AS (
              SELECT w, COUNT(*) AS n FROM (
                SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
                WHERE CAST(substr(source, 4) AS INT) >= 10) t GROUP BY w
            )
            SELECT COALESCE(wa.w, wb.w) AS word,
                   CAST(COALESCE(wa.n, 0) AS BIGINT) AS n_a,
                   CAST(COALESCE(wb.n, 0) AS BIGINT) AS n_b
            FROM wa FULL OUTER JOIN wb ON wa.w = wb.w
            ORDER BY ABS(COALESCE(wa.n, 0) - COALESCE(wb.n, 0)) DESC,
                     COALESCE(wa.w, wb.w) ASC
            LIMIT 20
        """,
        "tpch_q6": """
            SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                        * CAST(ROUND(l_discount * 100) AS BIGINT))
                     AS BIGINT) AS rev_scaled,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
              AND l_quantity < 24
        """,
        "tpch_q13": """
            WITH pc AS (
              SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
              FROM customer c
              LEFT JOIN orders o ON o.o_custkey = c.c_custkey
              GROUP BY c.c_custkey
            )
            SELECT CAST(c_count AS BIGINT) AS c_count,
                   CAST(COUNT(*) AS BIGINT) AS custdist
            FROM pc GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "tpch_q17": """
            WITH s AS (
              SELECT l_partkey,
                     SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
                     COUNT(*) AS cnt
              FROM lineitem GROUP BY l_partkey
            )
            SELECT CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) AS rev_scaled,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM lineitem l JOIN s ON l.l_partkey = s.l_partkey
            WHERE 5 * CAST(l.l_quantity AS BIGINT) * s.cnt < s.sum_qty
        """,
        "first_touch_counts": """
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM (
              SELECT user_id, event_type,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events) t
            WHERE rn = 1 GROUP BY event_type ORDER BY event_type
        """,
        "new_users_per_day": """
            WITH f AS (
              SELECT user_id, MIN(strftime(ts, '%Y-%m-%d')) AS day
              FROM events GROUP BY user_id
            )
            SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new,
                   CAST(SUM(COUNT(*)) OVER (ORDER BY day) AS BIGINT)
                     AS cum_users
            FROM f GROUP BY day ORDER BY day
        """,
        "tpch_q7": """
            SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                   CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
                   CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                     AS BIGINT) AS revenue_scaled
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation sn ON s.s_nationkey = sn.n_nationkey
            JOIN nation cn ON c.c_nationkey = cn.n_nationkey
            WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
                OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
              AND l.l_shipdate >= TIMESTAMP '1997-01-01'
              AND l.l_shipdate < TIMESTAMP '1999-01-01'
            GROUP BY 1, 2, 3
            ORDER BY 1, 2, 3
        """,
        "session_type_pairs": """
            WITH lagged AS (
              SELECT user_id, event_type, ts, event_id,
                     LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_ts
              FROM events
            ),
            s AS (
              SELECT user_id, event_type,
                     SUM(CASE WHEN prev_ts IS NULL
                              OR epoch_us(ts) - epoch_us(prev_ts)
                                 > 3600000000
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess
              FROM lagged
            ),
            dt AS (SELECT DISTINCT user_id, sess, event_type FROM s)
            SELECT x.event_type AS type_a, y.event_type AS type_b,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM dt x JOIN dt y
              ON x.user_id = y.user_id AND x.sess = y.sess
             AND x.event_type < y.event_type
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "tpch_q8": """
            WITH rev AS (
              SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                     CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
                       AS r,
                     CASE WHEN sn.n_name = 'NATION_3' THEN 1 ELSE 0 END
                       AS is_nat
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN part p ON l.l_partkey = p.p_partkey
              JOIN supplier s ON l.l_suppkey = s.s_suppkey
              JOIN nation sn ON s.s_nationkey = sn.n_nationkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation cn ON c.c_nationkey = cn.n_nationkey
              JOIN region r2 ON cn.n_regionkey = r2.r_regionkey
              WHERE r2.r_name = 'ASIA' AND p.p_type = 'STANDARD'
                AND o.o_orderdate >= TIMESTAMP '1997-01-01'
                AND o.o_orderdate < TIMESTAMP '1999-01-01'
            )
            SELECT o_year,
                   CAST(SUM(CASE WHEN is_nat = 1 THEN r ELSE 0 END)
                     AS BIGINT) AS nat_rev_scaled,
                   CAST(SUM(r) AS BIGINT) AS total_rev_scaled
            FROM rev GROUP BY o_year ORDER BY o_year
        """,
        "tpch_q15": """
            WITH r AS (
              SELECT l_suppkey,
                     SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                       AS rev
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1997-04-01'
              GROUP BY l_suppkey
            )
            SELECT s.s_suppkey, s.s_name,
                   CAST(r.rev AS BIGINT) AS total_rev_scaled
            FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
            WHERE r.rev = (SELECT MAX(rev) FROM r)
            ORDER BY s.s_suppkey
        """,
        "tpch_q22": """
            WITH bal AS (
              SELECT c_custkey, c_nationkey,
                     CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
              FROM customer
            ),
            g AS (
              SELECT SUM(cents) AS sum_pos, COUNT(*) AS n_pos
              FROM bal WHERE cents > 0
            )
            SELECT n.n_name,
                   CAST(COUNT(*) AS BIGINT) AS n_cust,
                   CAST(SUM(b.cents) AS BIGINT) AS bal_scaled
            FROM bal b, g
            JOIN nation n ON b.c_nationkey = n.n_nationkey
            WHERE b.cents * g.n_pos > g.sum_pos
              AND b.c_custkey NOT IN (SELECT DISTINCT o_custkey
                                      FROM orders)
            GROUP BY n.n_name ORDER BY n.n_name
        """,
        "dup_span_positions": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS l,
                     len(string_split(text, ' ')) AS nw
              FROM documents
            ),
            wins AS (
              SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
                     array_to_string(l[(u.i+1):(u.i+8)], ' ') AS win
              FROM w, LATERAL (SELECT unnest(range(0,
                       GREATEST(nw - 8 + 1, 0))) AS i) u
              WHERE nw >= 8
            ),
            d AS (SELECT win FROM wins GROUP BY win HAVING COUNT(*) >= 2)
            SELECT doc_id, pos FROM wins
            WHERE win IN (SELECT win FROM d)
            ORDER BY doc_id, pos
        """,
        "event_value_ntiles": """
            SELECT event_type, CAST(nt AS BIGINT) AS ntile,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM (
              SELECT event_type,
                     NTILE(4) OVER (PARTITION BY event_type
                                    ORDER BY CAST(ROUND(value * 100)
                                                  AS BIGINT), event_id)
                       AS nt
              FROM events) t
            GROUP BY event_type, nt
            ORDER BY event_type, nt
        """,
        "typo_pairs": """
            WITH v AS (SELECT DISTINCT c_name FROM customer)
            SELECT x.c_name AS a, y.c_name AS b
            FROM v x JOIN v y
              ON x.c_name < y.c_name
             AND levenshtein(x.c_name, y.c_name) = 1
            ORDER BY a, b
        """,
        "range_partition_stats": """
            WITH s AS (SELECT CAST(ROUND(value*100) AS BIGINT) AS v
                       FROM events),
            b AS (SELECT quantile_disc(v, [0.125, 0.25, 0.375, 0.5,
                                           0.625, 0.75, 0.875]) AS qs
                  FROM s)
            SELECT CAST(len(list_filter(b.qs, q -> q < s.v)) AS BIGINT)
                     AS range_id,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(MIN(s.v) AS BIGINT) AS min_scaled,
                   CAST(MAX(s.v) AS BIGINT) AS max_scaled
            FROM s, b GROUP BY 1 ORDER BY 1
        """,
        "event_path_trigrams": """
            SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n FROM (
              SELECT event_type AS t1,
                     LEAD(event_type, 1) OVER w AS t2,
                     LEAD(event_type, 2) OVER w AS t3
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ) t
            WHERE t2 IS NOT NULL AND t3 IS NOT NULL
            GROUP BY t1, t2, t3
            ORDER BY n DESC, t1, t2, t3
            LIMIT 10
        """,
        "vocab_coverage": """
            WITH wc AS (
              SELECT w, COUNT(*) AS n FROM (
                SELECT UNNEST(string_split(text, ' ')) AS w
                FROM documents) t GROUP BY w
            ),
            r AS (
              SELECT SUM(n) OVER (ORDER BY n DESC, w ASC
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                     ROW_NUMBER() OVER (ORDER BY n DESC, w ASC) AS k,
                     SUM(n) OVER () AS total
              FROM wc
            )
            SELECT CAST(p.pct AS BIGINT) AS coverage_pct,
                   CAST(MIN(r.k) AS BIGINT) AS n_words
            FROM r, (SELECT UNNEST([50, 90, 99]) AS pct) p
            WHERE r.cum * 100 >= p.pct * r.total
            GROUP BY p.pct ORDER BY p.pct
        """,
        "sliding_window_distinct_users": """
            WITH b AS (
              SELECT CAST(FLOOR(epoch(ts) / 1800) AS BIGINT) AS k, user_id
              FROM events
            ),
            p AS (
              SELECT k * 1800 AS ws, user_id FROM b
              UNION ALL
              SELECT (k - 1) * 1800 AS ws, user_id FROM b
            )
            SELECT ws AS window_start,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM p GROUP BY ws ORDER BY ws
        """,
        # 16-term truncated EWMA: decayed_i = Σ_j cents_{i-j}·2^(15-j);
        # the LAG ladder is generated to match grouped_decayed_sum's W=16
        "user_decayed_value": """
            SELECT event_id,
                   CAST((""" + " + ".join(
            f"COALESCE(LAG(cents, {j}) OVER w, 0) * {1 << (15 - j)}"
            for j in range(16)) + """) AS BIGINT) AS decayed
            FROM (SELECT event_id, user_id, ts,
                         CAST(ROUND(value * 100) AS BIGINT) AS cents
                  FROM events)
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ORDER BY event_id
        """,
        "user_value_cumsum": """
            SELECT event_id,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_scaled
            FROM events ORDER BY event_id
        """,
        "max_concurrent_values": """
            WITH pts AS (
              SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS t, 1 AS d
              FROM events
              UNION ALL
              SELECT CAST(FLOOR(epoch(ts)) AS BIGINT)
                       + CAST(ROUND(value) AS BIGINT), -1
              FROM events
            ),
            agg AS (SELECT t, d, CAST(SUM(d) AS BIGINT) AS dsum
                    FROM pts GROUP BY t, d),
            run AS (SELECT t, SUM(dsum) OVER (ORDER BY t, d
                      ROWS UNBOUNDED PRECEDING) AS r FROM agg)
            SELECT CAST(FLOOR(t / 3600) * 3600 AS BIGINT) AS window_start,
                   CAST(MAX(r) AS BIGINT) AS max_concurrent
            FROM run GROUP BY 1 ORDER BY 1
        """,
        "source_vocab_overlap": """
            WITH dw AS (
              SELECT DISTINCT source, UNNEST(string_split(text, ' ')) AS w
              FROM documents
            ),
            tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
                    FROM dw GROUP BY source),
            i AS (
              SELECT x.source AS a, y.source AS b,
                     CAST(COUNT(*) AS BIGINT) AS inter
              FROM dw x JOIN dw y ON x.w = y.w AND x.source < y.source
              GROUP BY 1, 2
            )
            SELECT a, b, inter,
                   ta.n + tb.n - inter AS uni
            FROM i JOIN tot ta ON ta.source = a
                   JOIN tot tb ON tb.source = b
            ORDER BY a, b
        """,
        "span_dedup_savings": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS l,
                     len(string_split(text, ' ')) AS nw
              FROM documents
            ),
            wins AS (
              SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
                     array_to_string(l[(u.i+1):(u.i+8)], ' ') AS win
              FROM w, LATERAL (SELECT unnest(range(0,
                       GREATEST(nw - 8 + 1, 0))) AS i) u
              WHERE nw >= 8
            ),
            d AS (SELECT win FROM wins GROUP BY win HAVING COUNT(*) >= 2),
            occ AS (
              SELECT doc_id, pos,
                     ROW_NUMBER() OVER (PARTITION BY win
                                        ORDER BY doc_id, pos) AS rn
              FROM wins WHERE win IN (SELECT win FROM d)
            ),
            del AS (
              SELECT DISTINCT doc_id, pos + CAST(u.i AS BIGINT) AS wi
              FROM occ, LATERAL (SELECT unnest(range(0, 8)) AS i) u
              WHERE rn > 1
            ),
            nd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_del
                   FROM del GROUP BY doc_id)
            SELECT doc.source, COUNT(*) AS n_docs,
                   CAST(SUM(w.nw) AS BIGINT) AS words_before,
                   CAST(SUM(w.nw - COALESCE(nd.n_del, 0)) AS BIGINT)
                     AS words_after
            FROM documents doc
            JOIN w USING (doc_id) LEFT JOIN nd USING (doc_id)
            GROUP BY doc.source ORDER BY doc.source
        """,
        "value_percentile_ranks": """
            WITH h AS (
              SELECT CAST(ROUND(value * 100) AS BIGINT) AS v,
                     CAST(COUNT(*) AS BIGINT) AS n_eq
              FROM events GROUP BY 1
            ),
            c AS (
              SELECT v, n_eq,
                     CAST(COALESCE(SUM(n_eq) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS n_less
              FROM h
            )
            SELECT e.event_id, c.n_less, c.n_eq
            FROM events e JOIN c
              ON CAST(ROUND(e.value * 100) AS BIGINT) = c.v
            ORDER BY e.event_id
        """,
        "corpus_diff_counts": """
            WITH o AS (SELECT DISTINCT text FROM documents
                       WHERE doc_id % 2 = 0),
                 nw AS (SELECT DISTINCT text FROM documents
                        WHERE doc_id % 2 = 1)
            SELECT status, CAST(COUNT(*) AS BIGINT) AS n_contents FROM (
              SELECT CASE WHEN o.text IS NULL THEN 'added'
                          WHEN nw.text IS NULL THEN 'removed'
                          ELSE 'common' END AS status
              FROM o FULL OUTER JOIN nw ON o.text = nw.text) t
            GROUP BY status ORDER BY status
        """,
        "embedding_dispersion": """
            SELECT CAST(label AS BIGINT) AS label,
                   COUNT(*) AS n,
                   CAST(SUM(list_sum(list_transform(embedding,
                     e -> CAST(FLOOR(CAST(e AS DOUBLE) * 1000.0 + 0.5)
                               AS BIGINT)
                        * CAST(FLOOR(CAST(e AS DOUBLE) * 1000.0 + 0.5)
                               AS BIGINT)))) AS BIGINT) AS sumsq_scaled
            FROM embeddings GROUP BY label ORDER BY label
        """,
        "top_event_per_hour": """
            SELECT window_start, event_type, n,
                   CAST(1 AS BIGINT) AS rank
            FROM (
              SELECT window_start, event_type, n,
                     ROW_NUMBER() OVER (PARTITION BY window_start
                                        ORDER BY n DESC, event_type ASC) AS rn
              FROM (
                SELECT CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT)
                         AS window_start,
                       event_type, CAST(COUNT(*) AS BIGINT) AS n
                FROM events GROUP BY 1, 2) c) t
            WHERE rn = 1 ORDER BY window_start
        """,
        "exact_sample_per_source": """
            SELECT source, doc_id FROM (
              SELECT source, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY (doc_id::HUGEINT * 2654435761) % 4294967296,
                                doc_id) AS rn
              FROM documents) t
            WHERE rn <= 20 ORDER BY source, doc_id
        """,
        "remove_dup_spans": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS l,
                     len(string_split(text, ' ')) AS nw
              FROM documents
            ),
            wins AS (
              SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
                     array_to_string(l[(u.i+1):(u.i+8)], ' ') AS win
              FROM w, LATERAL (SELECT unnest(range(0,
                       GREATEST(nw - 8 + 1, 0))) AS i) u
              WHERE nw >= 8
            ),
            d AS (SELECT win FROM wins GROUP BY win HAVING COUNT(*) >= 2),
            occ AS (
              SELECT doc_id, pos,
                     ROW_NUMBER() OVER (PARTITION BY win
                                        ORDER BY doc_id, pos) AS rn
              FROM wins WHERE win IN (SELECT win FROM d)
            ),
            del AS (
              SELECT DISTINCT doc_id, pos + CAST(u.i AS BIGINT) AS wi
              FROM occ, LATERAL (SELECT unnest(range(0, 8)) AS i) u
              WHERE rn > 1
            ),
            words AS (
              SELECT w.doc_id, CAST(u.i AS BIGINT) AS wi, l[u.i+1] AS word
              FROM w, LATERAL (SELECT unnest(range(0, nw)) AS i) u
            ),
            sel AS (
              SELECT ws.doc_id, ws.wi, ws.word
              FROM words ws LEFT JOIN del
                ON del.doc_id = ws.doc_id AND del.wi = ws.wi
              WHERE del.wi IS NULL
            )
            SELECT doc.doc_id,
                   COALESCE(s.txt, '') AS text
            FROM documents doc LEFT JOIN (
              SELECT doc_id, string_agg(word, ' ' ORDER BY wi) AS txt
              FROM sel GROUP BY doc_id) s USING (doc_id)
            ORDER BY doc.doc_id
        """,
        "tpch_q4": """
            SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders o
            WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
              AND o.o_orderdate < TIMESTAMP '1997-10-01'
              AND EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_shipdate > o.o_orderdate
                                               + INTERVAL 60 DAY)
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "tpch_q12": """
            SELECT l.l_returnflag,
                   CAST(SUM(CASE WHEN o.o_orderpriority IN
                                      ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS high_line_count,
                   CAST(SUM(CASE WHEN o.o_orderpriority NOT IN
                                      ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS low_line_count
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
              AND l.l_shipdate < TIMESTAMP '1999-01-01'
            GROUP BY l.l_returnflag ORDER BY l.l_returnflag
        """,
        "tpch_q21": """
            WITH per_order AS (
              SELECT l.l_orderkey,
                     COUNT(DISTINCT l.l_suppkey) AS n_supp,
                     COUNT(DISTINCT CASE WHEN l.l_shipdate >
                               o.o_orderdate + INTERVAL 30 DAY
                           THEN l.l_suppkey END) AS n_late,
                     MIN(CASE WHEN l.l_shipdate >
                               o.o_orderdate + INTERVAL 30 DAY
                         THEN l.l_suppkey END) AS late_supp
              FROM lineitem l JOIN orders o
                ON l.l_orderkey = o.o_orderkey
              WHERE o.o_orderstatus = 'F'
              GROUP BY l.l_orderkey)
            SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
            FROM per_order p JOIN supplier s
              ON s.s_suppkey = p.late_supp
            WHERE p.n_supp >= 2 AND p.n_late = 1
            GROUP BY s.s_name
            ORDER BY numwait DESC, s.s_name LIMIT 20
        """,
        "tpch_q9": """
            SELECT n.n_name,
                   CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                   CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                            * (100 - CAST(ROUND(l.l_discount * 100)
                                          AS BIGINT))) AS BIGINT)
                     AS profit_scaled
            FROM lineitem l
            JOIN part p ON l.l_partkey = p.p_partkey
                        AND p.p_name LIKE '%widget%'
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY n.n_name, year(o.o_orderdate)
            ORDER BY n.n_name, o_year
        """,
        "tpch_q20": """
            WITH q AS (
              SELECT l_partkey AS p, l_suppkey AS s,
                     SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qc
              FROM lineitem JOIN part ON p_partkey = l_partkey
              WHERE p_name LIKE '%gear%'
                AND l_shipdate >= DATE '1995-01-01'
                AND l_shipdate <  DATE '1996-01-01'
              GROUP BY 1, 2),
            t AS (SELECT p, SUM(qc) AS tot, COUNT(*) AS c FROM q GROUP BY p)
            SELECT DISTINCT s_name FROM supplier
            JOIN (SELECT s FROM q JOIN t USING (p) WHERE q.qc * t.c > t.tot)
              ON s = s_suppkey
            WHERE s_nationkey = (SELECT n_nationkey FROM nation
                                  WHERE n_name = 'NATION_5')
            ORDER BY s_name
        """,
        "tpch_q16": """
            SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
                   CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT)
                     AS supplier_cnt
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_brand <> 'Brand#45'
              AND p.p_type NOT LIKE 'MEDIUM%'
              AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
              AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                      WHERE s_acctbal < 0)
            GROUP BY p.p_brand, p.p_type, p.p_size
            ORDER BY p.p_brand, p.p_type, p_size
        """,
        "tpch_q2": """
            WITH e AS (
              SELECT l.l_partkey, l.l_suppkey,
                     CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS pr
              FROM lineitem l
              JOIN supplier s ON l.l_suppkey = s.s_suppkey
              JOIN nation n ON s.s_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey
                            AND r.r_name = 'EUROPE'
              WHERE l.l_partkey IN (SELECT p_partkey FROM part
                                    WHERE p_size = 25)
            ), m AS (
              SELECT l_partkey, pr, l_suppkey,
                     ROW_NUMBER() OVER (PARTITION BY l_partkey
                                        ORDER BY pr, l_suppkey) AS rn
              FROM e)
            SELECT m.l_partkey AS p_partkey, m.pr AS price_scaled,
                   m.l_suppkey AS s_suppkey, s.s_name
            FROM m JOIN supplier s ON m.l_suppkey = s.s_suppkey
            WHERE m.rn = 1 ORDER BY p_partkey
        """,
        "tpch_q11": """
            WITH v AS (
              SELECT l.l_partkey,
                     SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                       AS val
              FROM lineitem l
              JOIN supplier s ON l.l_suppkey = s.s_suppkey
              JOIN nation n ON s.s_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey
                            AND r.r_name = 'ASIA'
              GROUP BY l.l_partkey)
            SELECT l_partkey AS p_partkey, CAST(val AS BIGINT)
                     AS value_scaled
            FROM v
            WHERE val * (SELECT COUNT(*) FROM v)
                  > 2 * (SELECT SUM(val) FROM v)
            ORDER BY value_scaled DESC, p_partkey
        """,
        "pps_sample_docs": """
            SELECT source, doc_id, n_chars FROM (
              SELECT source, doc_id, n_chars,
                     SUM(n_chars) OVER (
                       PARTITION BY source
                       ORDER BY (doc_id::HUGEINT * 2654435761) % 4294967296,
                                doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
              FROM documents
            ) WHERE cum // 7000 > (cum - n_chars) // 7000
            ORDER BY source, doc_id
        """,
        "balanced_shards": """
            SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars
            FROM (SELECT CAST((ROW_NUMBER() OVER (
                           ORDER BY n_chars DESC, doc_id) - 1) % 16
                         AS BIGINT) AS shard,
                         n_chars
                  FROM documents)
            GROUP BY shard ORDER BY shard
        """,
        "mixture_schedule": """
            WITH r AS (
              SELECT doc_id, source,
                     CAST(ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY (doc_id::HUGEINT * 2654435761) % 4294967296,
                                doc_id) AS BIGINT) AS pos
              FROM documents)
            SELECT doc_id, source,
                   CAST(pos * (12 // (CAST(SUBSTR(source, 4) AS BIGINT)
                                      % 4 + 1)) AS BIGINT) AS sched_key
            FROM r ORDER BY sched_key, source, doc_id
        """,
        "continuation_topk": """
            WITH w AS (SELECT doc_id, string_split(text, ' ') AS l
                       FROM documents),
            pairs AS (
              SELECT l[u.i] AS left_w, l[u.i + 1] AS right_w
              FROM w, LATERAL (SELECT unnest(range(1, len(l))) AS i) u
            )
            SELECT right_w AS word,
                   CAST(COUNT(DISTINCT left_w) AS BIGINT) AS n_contexts
            FROM pairs GROUP BY right_w
            ORDER BY n_contexts DESC, word LIMIT 15
        """,
        "dedup_keep_best_docs": """
            SELECT doc_id FROM (
              SELECT doc_id, ROW_NUMBER() OVER (
                       PARTITION BY trim(regexp_replace(regexp_replace(
                         lower(text), '[^a-z0-9 ]+', ' ', 'g'),
                         ' +', ' ', 'g'))
                       ORDER BY n_chars DESC, doc_id) AS rn
              FROM documents) WHERE rn = 1 ORDER BY doc_id
        """,
        "curation_kill_reasons": """
            WITH w AS (
              SELECT doc_id, text, string_split(text, ' ') AS ws,
                     len(string_split(text, ' ')) AS nw
              FROM documents
            ),
            grams AS (
              SELECT doc_id, UNNEST(
                CASE WHEN nw <= 3 THEN ['S:' || text]
                     ELSE list_transform(generate_series(1, nw - 2),
                           i -> 'L:' || ws[i] || ' ' || ws[i+1] || ' '
                                || ws[i+2])
                END) AS gram
              FROM w
            ),
            bench AS (SELECT DISTINCT gram FROM grams
                      WHERE doc_id % 97 = 0),
            dirty AS (
              SELECT DISTINCT g.doc_id FROM grams g
              JOIN bench b ON g.gram = b.gram
              WHERE g.doc_id % 97 <> 0
            ),
            r AS (
              SELECT doc_id,
                CASE WHEN nw < 5 THEN 'short'
                     WHEN doc_id <> MIN(CASE WHEN nw >= 5 THEN doc_id END)
                          OVER (PARTITION BY text) THEN 'exact_dup'
                     WHEN doc_id IN (SELECT doc_id FROM dirty)
                       THEN 'contaminated'
                     ELSE 'kept' END AS reason
              FROM w WHERE doc_id % 97 <> 0)
            SELECT reason, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM r GROUP BY reason ORDER BY reason
        """,
        "stream_dedup_docs": """
            SELECT MIN(doc_id) AS doc_id FROM documents
            GROUP BY text ORDER BY doc_id
        """,
        # round 5: the full v2 curation chain — perplexity gate on the
        # centi-bit type-1 quantile, then the existing 3-gram decontam
        # and 10-word chunk keep-first replays over the gated set
        "curation_pipeline_v2": """
            WITH w AS (
              SELECT doc_id, source, text,
                     string_split(text, ' ') AS ws,
                     len(string_split(text, ' ')) AS nw
              FROM documents
            ),
            uc AS (
              SELECT word, COUNT(*)::BIGINT AS c
              FROM (SELECT UNNEST(ws) AS word FROM w) GROUP BY word
            ),
            vv AS (SELECT COUNT(*)::BIGINT AS v FROM uc),
            bg AS (
              SELECT doc_id, s['a'] AS a, s['ab'] AS ab FROM (
                SELECT doc_id,
                       UNNEST(list_transform(generate_series(1, nw - 1),
                         i -> struct_pack(a := ws[i],
                                          ab := ws[i] || ' ' || ws[i+1])))
                         AS s
                FROM w WHERE nw >= 2)
            ),
            bc AS (SELECT ab, COUNT(*)::BIGINT AS c FROM bg GROUP BY ab),
            terms AS (
              SELECT bg.doc_id,
                     log2(CAST(uc.c AS DOUBLE)
                          + CAST((SELECT v FROM vv) AS DOUBLE))
                     - log2(CAST(bc.c AS DOUBLE) + 1.0) AS bit
              FROM bg JOIN uc ON uc.word = bg.a
                      JOIN bc ON bc.ab = bg.ab
            ),
            bits AS (
              SELECT w.doc_id,
                     CAST(FLOOR(CASE WHEN per.nb IS NULL OR per.nb = 0
                                     THEN 0.0
                                     ELSE per.s / per.nb END * 100.0)
                          AS BIGINT) AS bcv
              FROM w LEFT JOIN (
                SELECT doc_id, COUNT(*)::BIGINT AS nb, SUM(bit) AS s
                FROM terms GROUP BY doc_id) per USING (doc_id)
            ),
            thr AS (
              SELECT MIN(bcv) AS thr FROM (
                SELECT bcv, ROW_NUMBER() OVER (ORDER BY bcv) AS rn
                FROM bits)
              WHERE rn >= GREATEST(CAST(CEIL(
                      0.8 * (SELECT COUNT(*) FROM bits)) AS BIGINT), 1)
            ),
            kept AS (
              SELECT w.* FROM w JOIN bits USING (doc_id)
              WHERE bits.bcv <= (SELECT thr FROM thr)
            ),
            grams AS (
              SELECT doc_id, UNNEST(
                CASE WHEN nw <= 3 THEN ['S:' || text]
                     ELSE list_transform(generate_series(1, nw - 2),
                           i -> 'L:' || ws[i] || ' ' || ws[i+1] || ' '
                                || ws[i+2])
                END) AS gram
              FROM kept
            ),
            bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
            dirty AS (
              SELECT DISTINCT g.doc_id FROM grams g
              JOIN bench b ON g.gram = b.gram
              WHERE g.doc_id % 97 <> 0
            ),
            clean AS (
              SELECT doc_id, source, ws FROM kept
              WHERE doc_id % 97 <> 0
                AND doc_id NOT IN (SELECT doc_id FROM dirty)
            ),
            chunks AS (
              SELECT doc_id, source, CAST(u.i AS BIGINT) AS chunk_idx,
                     array_to_string(ws[(u.i*10+1):(u.i*10+10)], ' ')
                       AS chunk
              FROM clean, LATERAL (SELECT unnest(range(0,
                       CAST(ceil(len(ws)/10.0) AS BIGINT))) AS i) u
            ),
            surv AS (
              SELECT doc_id, source, chunk_idx FROM (
                SELECT doc_id, source, chunk_idx,
                       ROW_NUMBER() OVER (PARTITION BY chunk
                                          ORDER BY doc_id, chunk_idx) AS rn
                FROM chunks) t
              WHERE rn = 1
            )
            SELECT source,
                   CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                   CAST(COUNT(*) AS BIGINT) AS n_chunks
            FROM surv GROUP BY source ORDER BY source
        """,
        # round 5: bigram-LM perplexity replay — counts are exact ints
        # both sides, terms use the kernel's two-log form, the centi
        # floor absorbs log2-ULP and SUM-order noise
        "perplexity_scores": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws,
                     len(string_split(text, ' ')) AS nw
              FROM documents
            ),
            uc AS (
              SELECT word, COUNT(*)::BIGINT AS c
              FROM (SELECT UNNEST(ws) AS word FROM w) GROUP BY word
            ),
            vv AS (SELECT COUNT(*)::BIGINT AS v FROM uc),
            bg AS (
              SELECT doc_id, s['a'] AS a, s['ab'] AS ab FROM (
                SELECT doc_id,
                       UNNEST(list_transform(generate_series(1, nw - 1),
                         i -> struct_pack(a := ws[i],
                                          ab := ws[i] || ' ' || ws[i+1])))
                         AS s
                FROM w WHERE nw >= 2)
            ),
            bc AS (SELECT ab, COUNT(*)::BIGINT AS c FROM bg GROUP BY ab),
            terms AS (
              SELECT bg.doc_id,
                     log2(CAST(uc.c AS DOUBLE)
                          + CAST((SELECT v FROM vv) AS DOUBLE))
                     - log2(CAST(bc.c AS DOUBLE) + 1.0) AS bit
              FROM bg JOIN uc ON uc.word = bg.a
                      JOIN bc ON bc.ab = bg.ab
            ),
            per AS (
              SELECT doc_id, COUNT(*)::BIGINT AS nb, SUM(bit) AS s
              FROM terms GROUP BY doc_id
            )
            SELECT w.doc_id,
                   GREATEST(w.nw - 1, 0) AS n_bigrams,
                   CAST(FLOOR(CASE WHEN per.nb IS NULL OR per.nb = 0
                                   THEN 0.0
                                   ELSE per.s / per.nb END * 100.0)
                        AS BIGINT) AS bits_centi
            FROM w LEFT JOIN per USING (doc_id)
            ORDER BY w.doc_id
        """,
        # round 5: char-level replay of the byte-entropy kernel (driver
        # docs are pure ASCII, so chars == bytes); //100 masks the
        # SUM-order ULP band around the micro-bit rounding boundary
        "doc_entropy": """
            WITH c AS (
              SELECT doc_id, UNNEST(string_split(text, '')) AS ch
              FROM documents
            ),
            cnt AS (
              SELECT doc_id, ch, COUNT(*)::BIGINT AS k
              FROM c GROUP BY doc_id, ch
            ),
            tot AS (SELECT doc_id, SUM(k) AS L FROM cnt GROUP BY doc_id),
            h AS (
              SELECT cnt.doc_id,
                     -SUM((k / CAST(L AS DOUBLE))
                          * log2(k / CAST(L AS DOUBLE))) AS ent
              FROM cnt JOIN tot USING (doc_id)
              GROUP BY cnt.doc_id
            )
            SELECT d.doc_id,
                   CAST(FLOOR(COALESCE(h.ent, 0.0) * 1000000 + 0.5)
                        AS BIGINT) // 100 AS entropy_cb
            FROM documents d LEFT JOIN h USING (doc_id)
            ORDER BY d.doc_id
        """,
        "ngram_novelty": """
            WITH w AS (
              SELECT doc_id, text,
                     len(string_split(text, ' ')) AS nw,
                     string_split(text, ' ') AS ws
              FROM documents
            ),
            grams AS (
              SELECT DISTINCT doc_id, gram FROM (
                SELECT doc_id, UNNEST(
                  CASE WHEN nw <= 3 THEN ['S:' || text]
                       ELSE list_transform(generate_series(1, nw - 2),
                             i -> 'L:' || ws[i] || ' ' || ws[i+1] || ' '
                                  || ws[i+2])
                  END) AS gram
                FROM w)
            ),
            firsts AS (SELECT gram, MIN(doc_id) AS fd
                       FROM grams GROUP BY gram)
            SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                   CAST(SUM(CASE WHEN f.fd = g.doc_id THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_novel
            FROM grams g JOIN firsts f USING (gram)
            GROUP BY g.doc_id ORDER BY g.doc_id
        """,
        "curation_pipeline_v3": """
            WITH train AS (
              SELECT doc_id, source, text, n_chars,
                     trim(regexp_replace(regexp_replace(
                       lower(text), '[^a-z0-9 ]+', ' ', 'g'),
                       ' +', ' ', 'g')) AS norm,
                     string_split(text, ' ') AS ws,
                     len(string_split(text, ' ')) AS nw
              FROM documents WHERE doc_id % 97 <> 0
            ),
            best AS (
              SELECT doc_id, source, text, n_chars, ws, nw FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY norm
                  ORDER BY n_chars DESC, doc_id) AS rn
                FROM train) WHERE rn = 1
            ),
            allgrams AS (
              SELECT doc_id, UNNEST(
                CASE WHEN len(string_split(text, ' ')) <= 3
                     THEN ['S:' || text]
                     ELSE list_transform(
                       generate_series(1,
                         len(string_split(text, ' ')) - 2),
                       i -> 'L:' || string_split(text, ' ')[i] || ' '
                            || string_split(text, ' ')[i+1] || ' '
                            || string_split(text, ' ')[i+2])
                END) AS gram
              FROM documents
            ),
            bench AS (SELECT DISTINCT gram FROM allgrams
                      WHERE doc_id % 97 = 0),
            dirty AS (
              SELECT DISTINCT g.doc_id FROM allgrams g
              JOIN bench b ON g.gram = b.gram
              WHERE g.doc_id % 97 <> 0
            ),
            clean AS (
              SELECT doc_id, source, n_chars FROM best
              WHERE doc_id NOT IN (SELECT doc_id FROM dirty)
            ),
            pps AS (
              SELECT doc_id, n_chars FROM (
                SELECT doc_id, n_chars,
                       SUM(n_chars) OVER (
                         PARTITION BY source
                         ORDER BY (doc_id::HUGEINT * 2654435761)
                                  % 4294967296, doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum
                FROM clean)
              WHERE cum // 2000 > (cum - n_chars) // 2000
            ),
            sh AS (
              SELECT CAST((ROW_NUMBER() OVER (
                       ORDER BY n_chars DESC, doc_id) - 1) % 8
                     AS BIGINT) AS shard, n_chars
              FROM pps)
            SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars
            FROM sh GROUP BY shard ORDER BY shard
        """,
        "stream_quota_admit": """
            WITH a AS (
              SELECT doc_id, source, n_chars,
                     SUM(n_chars) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS cum
              FROM documents)
            SELECT doc_id, source, n_chars FROM a
            WHERE cum <= 2000 ORDER BY doc_id
        """,
        "part_triangles": """
            WITH gi AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS i
                        FROM lineitem),
            edges AS (SELECT DISTINCT a.i AS u, b.i AS v
                      FROM gi a JOIN gi b ON a.g = b.g AND a.i < b.i),
            deg AS (SELECT node, COUNT(*) AS d
                    FROM (SELECT u AS node FROM edges
                          UNION ALL SELECT v FROM edges)
                    GROUP BY node),
            tri AS (SELECT COUNT(*) AS t
                    FROM edges e1
                    JOIN edges e2 ON e2.u = e1.v
                    JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v)
            SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
                   (SELECT COUNT(*) FROM edges) AS n_edges,
                   CAST(COALESCE((SELECT SUM(d*(d-1)/2) FROM deg), 0)
                        AS BIGINT) AS n_wedges,
                   CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles
        """,
        "selfjoin_size_by_type": """
            SELECT event_type,
                   CAST(SUM(n * n) AS BIGINT) AS selfjoin_size
            FROM (SELECT event_type, user_id, COUNT(*) AS n
                  FROM events GROUP BY event_type, user_id)
            GROUP BY event_type ORDER BY event_type
        """,
        "source_skew_stats": """
            WITH c AS (SELECT source, COUNT(*) AS n
                       FROM documents GROUP BY source),
            r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n) AS i FROM c)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
                   CAST(SUM(n) AS BIGINT) AS total_rows,
                   CAST(MAX(n) AS BIGINT) AS max_rows,
                   CAST(SUM(i * n) AS BIGINT) AS weighted_rank_sum
            FROM r
        """,
        "multiline_stitch": """
            WITH l AS (
              SELECT event_id, event_type,
                     (event_id % 7 < 4) AS is_start
              FROM events),
            g AS (
              SELECT event_type, event_id, is_start,
                     SUM(CASE WHEN is_start THEN 1 ELSE 0 END)
                       OVER (ORDER BY event_id
                             ROWS UNBOUNDED PRECEDING) AS rec
              FROM l),
            r AS (
              SELECT rec,
                     MIN(CASE WHEN is_start THEN event_type END) AS rtype,
                     COUNT(*) AS n_lines
              FROM g GROUP BY rec HAVING rec > 0)
            SELECT rtype AS event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_records,
                   CAST(SUM(n_lines) AS BIGINT) AS total_lines,
                   CAST(MAX(n_lines) AS BIGINT) AS max_lines
            FROM r GROUP BY rtype ORDER BY rtype
        """,
        "value_trend_components": """
            WITH e AS (
              SELECT event_type,
                     (CAST(FLOOR(EPOCH(ts)) AS BIGINT) - 1704067200)
                       // 3600 AS x,
                     CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS y
              FROM events)
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(x) AS BIGINT) AS sum_x,
                   CAST(SUM(y) AS BIGINT) AS sum_y,
                   CAST(SUM(x * y) AS BIGINT) AS sum_xy,
                   CAST(SUM(x * x) AS BIGINT) AS sum_xx
            FROM e GROUP BY event_type ORDER BY event_type
        """,
        "rolling_7d_active_users": """
            WITH ud AS (
              SELECT DISTINCT user_id AS u,
                     epoch_us(ts) // 86400000000 AS d
              FROM events),
            days AS (SELECT DISTINCT d FROM ud)
            SELECT days.d AS day,
                   CAST(COUNT(DISTINCT ud.u) AS BIGINT) AS n
            FROM days JOIN ud ON ud.d BETWEEN days.d - 6 AND days.d
            GROUP BY 1 ORDER BY 1
        """,
        "price_cume_dist": """
            SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
                   l_returnflag,
                   CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                     AS cents,
                   CAST(COUNT(*) OVER (
                     PARTITION BY l_returnflag
                     ORDER BY FLOOR(l_extendedprice * 100 + 0.5))
                     AS BIGINT) AS rank_le,
                   CAST(COUNT(*) OVER (PARTITION BY l_returnflag)
                     AS BIGINT) AS group_n
            FROM lineitem ORDER BY l_orderkey, l_linenumber
        """,
        "tpch_q10_top20": """
            SELECT c_custkey, c_name, n_name, revenue_scaled, rank FROM (
              SELECT c.c_custkey, c.c_name, n.n_name,
                     CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                              * (100 - CAST(ROUND(l.l_discount * 100)
                                            AS BIGINT))) AS BIGINT)
                       AS revenue_scaled,
                     CAST(ROW_NUMBER() OVER (
                       ORDER BY SUM(CAST(ROUND(l.l_extendedprice * 100)
                                         AS BIGINT)
                                    * (100 - CAST(ROUND(l.l_discount * 100)
                                                  AS BIGINT))) DESC,
                                c.c_custkey) AS BIGINT) AS rank
              FROM customer c
              JOIN orders o ON c.c_custkey = o.o_custkey
              JOIN lineitem l ON l.l_orderkey = o.o_orderkey
              JOIN nation n ON n.n_nationkey = c.c_nationkey
              WHERE l.l_returnflag = 'R'
                AND o.o_orderdate >= DATE '1996-01-01'
                AND o.o_orderdate < DATE '1996-04-01'
              GROUP BY 1, 2, 3)
            WHERE rank <= 20 ORDER BY rank
        """,
        "events_jsonl_roundtrip": """
            SELECT event_type, COUNT(*) AS n,
                   SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
            FROM events GROUP BY event_type
        """,
        "value_time_regression": """
            WITH b AS (
              SELECT event_type,
                     (epoch_us(ts) - 1704067200000000) // 3600000000 AS x,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
              FROM events
            ), s AS (
              SELECT event_type, count(*)::HUGEINT AS n,
                     sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
                     sum(x*y)::HUGEINT AS sxy, sum(x*x)::HUGEINT AS sxx
              FROM b GROUP BY event_type
            ), r AS (
              SELECT event_type, n, sx, sy,
                     n*sxy - sx*sy AS nu, n*sxx - sx*sx AS de
              FROM s
            ), f AS (
              SELECT event_type, n, sy, nu, de,
                     sy*de - nu*sx AS inu, n*de AS ide
              FROM r
            )
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   CAST(CASE WHEN de = 0 THEN 0
                             WHEN nu >= 0 THEN (nu*1000000) // de
                             ELSE -(((-nu)*1000000) // de)
                        END AS BIGINT) AS slope_ppm,
                   CAST(CASE WHEN de = 0 THEN
                               CASE WHEN sy >= 0 THEN (sy*1000000) // n
                                    ELSE -(((-sy)*1000000) // n) END
                             WHEN inu >= 0 THEN (inu*1000000) // ide
                             ELSE -(((-inu)*1000000) // ide)
                        END AS BIGINT) AS intercept_ppm
            FROM f ORDER BY event_type
        """,
        "user_type_hhi": """
            WITH c AS (
              SELECT user_id, event_type, count(*)::HUGEINT AS c
              FROM events GROUP BY user_id, event_type
            ), a AS (
              SELECT user_id, sum(c) AS tot, sum(c*c) AS sq
              FROM c GROUP BY user_id
            )
            SELECT user_id, CAST(tot AS BIGINT) AS n_rows,
                   CAST((sq*1000000) // (tot*tot) AS BIGINT) AS hhi_ppm
            FROM a ORDER BY user_id
        """,
        "ttr_by_source": """
            WITH w AS (
              SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents
            )
            SELECT source, count(*) AS n_tokens,
                   count(DISTINCT w) AS n_types
            FROM w GROUP BY source ORDER BY source
        """,
        "pmi_top_pairs": """
            WITH w AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents
            ), dw AS (
              SELECT DISTINCT doc_id, w FROM w
            ), df AS (
              SELECT w, count(*)::HUGEINT AS df FROM dw GROUP BY w
            ), v AS (
              SELECT w, df FROM df ORDER BY df DESC, w LIMIT 16
            ), nd AS (
              SELECT count(*)::HUGEINT AS n FROM documents
            ), p AS (
              SELECT a.w AS wa, b.w AS wb, count(*)::HUGEINT AS c_ab
              FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.w < b.w
              WHERE a.w IN (SELECT w FROM v) AND b.w IN (SELECT w FROM v)
              GROUP BY a.w, b.w
            )
            SELECT wa, wb, CAST(c_ab AS BIGINT) AS c_ab,
                   CAST((c_ab * nd.n * 1000000)
                        // (va.df * vb.df) AS BIGINT) AS score_ppm
            FROM p
            CROSS JOIN nd
            JOIN v va ON va.w = p.wa
            JOIN v vb ON vb.w = p.wb
            ORDER BY score_ppm DESC, wa, wb LIMIT 20
        """,
        "skipgram_counts": """
            WITH t AS (
              SELECT string_split(text, ' ') AS l FROM documents
            ), s AS (
              SELECT l[i] AS w1, l[i+2] AS w2, 2 AS gap
              FROM t, unnest(generate_series(1, len(l)-2)) AS u(i)
              UNION ALL
              SELECT l[i] AS w1, l[i+3] AS w2, 3 AS gap
              FROM t, unnest(generate_series(1, len(l)-3)) AS u(i)
            )
            SELECT w1, w2, gap, count(*) AS n
            FROM s GROUP BY w1, w2, gap
            ORDER BY n DESC, w1, w2, gap LIMIT 20
        """,
        "hourly_acf_by_type": """
            WITH b AS (
              SELECT event_type,
                     (epoch_us(ts) - 1704067200000000) // 3600000000 AS h
              FROM events
            ), rng AS (
              SELECT event_type, min(h) AS mn, max(h) AS mx
              FROM b GROUP BY event_type
            ), grid AS (
              SELECT event_type, unnest(generate_series(mn, mx)) AS h
              FROM rng
            ), cnt AS (
              SELECT event_type, h, count(*)::HUGEINT AS c
              FROM b GROUP BY event_type, h
            ), ser AS (
              SELECT g.event_type, g.h, coalesce(cnt.c, 0::HUGEINT) AS x
              FROM grid g LEFT JOIN cnt
                ON cnt.event_type = g.event_type AND cnt.h = g.h
            ), s AS (
              SELECT event_type, count(*)::HUGEINT AS hh,
                     sum(x) AS sx, sum(x*x) AS sxx
              FROM ser GROUP BY event_type
            ), lagd AS (
              SELECT ser.event_type,
                     (s.hh*ser.x - s.sx) AS d0,
                     (s.hh * lead(ser.x) OVER
                        (PARTITION BY ser.event_type ORDER BY ser.h)
                      - s.sx) AS d1
              FROM ser JOIN s USING (event_type)
            ), a AS (
              SELECT event_type, sum(d0*d1) AS na
              FROM lagd WHERE d1 IS NOT NULL GROUP BY event_type
            )
            SELECT s.event_type, CAST(s.hh AS BIGINT) AS n_hours,
                   CAST(((s.hh*s.sxx - s.sx*s.sx) * 1000000)
                        // (s.hh*s.sx) AS BIGINT) AS disp_ppm,
                   CAST(CASE
                     WHEN s.hh*s.sxx - s.sx*s.sx = 0
                          OR a.na IS NULL THEN 0
                     WHEN a.na >= 0 THEN
                       (a.na*1000000)
                       // (s.hh*(s.hh*s.sxx - s.sx*s.sx))
                     ELSE
                       -(((-a.na)*1000000)
                         // (s.hh*(s.hh*s.sxx - s.sx*s.sx)))
                   END AS BIGINT) AS acf1_ppm
            FROM s LEFT JOIN a USING (event_type)
            ORDER BY s.event_type
        """,
        "k_anonymity_audit": """
            WITH g AS (
              SELECT lang, source, n_chars // 200 AS cb,
                     count(*)::BIGINT AS c
              FROM documents GROUP BY lang, source, cb
            ), ks(k) AS (VALUES (2), (5), (10))
            SELECT CAST(k AS BIGINT) AS k,
                   coalesce(sum(CASE WHEN c < k THEN 1 ELSE 0 END),
                            0)::BIGINT AS groups_below,
                   coalesce(sum(CASE WHEN c < k THEN c ELSE 0 END),
                            0)::BIGINT AS rows_below
            FROM ks CROSS JOIN g GROUP BY k ORDER BY k
        """,
        "theilsen_trend_by_type": """
            WITH b AS (
              SELECT event_type,
                     (epoch_us(ts) - 1704067200000000) // 3600000000 AS h,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
              FROM events
            ), m AS (
              SELECT event_type, h, sum(y)::HUGEINT AS y
              FROM b GROUP BY event_type, h
            ), c AS (
              SELECT event_type, count(*) AS n_h FROM m GROUP BY event_type
            ), p AS (
              SELECT a.event_type,
                     CASE WHEN b2.y >= a.y
                          THEN ((b2.y - a.y) * 1000000) // (b2.h - a.h)
                          ELSE -(((a.y - b2.y) * 1000000) // (b2.h - a.h))
                     END AS s
              FROM m a JOIN m b2
                ON a.event_type = b2.event_type AND a.h < b2.h
            ), r AS (
              SELECT event_type, s,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY s) AS rk,
                     count(*) OVER (PARTITION BY event_type) AS np
              FROM p
            )
            SELECT c.event_type, CAST(c.n_h AS BIGINT) AS n_hours,
                   CAST(COALESCE(max(r.np), 0) AS BIGINT) AS n_pairs,
                   CAST(COALESCE(max(CASE WHEN r.rk = (r.np + 1) // 2
                                          THEN r.s END), 0) AS BIGINT)
                     AS slope_ppm
            FROM c LEFT JOIN r ON c.event_type = r.event_type
            GROUP BY c.event_type, c.n_h
            ORDER BY c.event_type
""",
        "kendall_hourly_by_type": """
            WITH b AS (
              SELECT event_type,
                     (epoch_us(ts) - 1704067200000000) // 3600000000 AS h,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
              FROM events
            ), m AS (
              SELECT event_type, h, sum(y)::HUGEINT AS y
              FROM b GROUP BY event_type, h
            ), c AS (
              SELECT event_type, count(*) AS n_h FROM m GROUP BY event_type
            ), p AS (
              SELECT a.event_type, b2.y - a.y AS d
              FROM m a JOIN m b2
                ON a.event_type = b2.event_type AND a.h < b2.h
            )
            SELECT c.event_type, CAST(c.n_h AS BIGINT) AS n_hours,
                   CAST(COALESCE(sum(CASE WHEN p.d > 0 THEN 1 END), 0)
                        AS BIGINT) AS n_conc,
                   CAST(COALESCE(sum(CASE WHEN p.d < 0 THEN 1 END), 0)
                        AS BIGINT) AS n_disc,
                   CAST(COALESCE(sum(CASE WHEN p.d = 0 THEN 1 END), 0)
                        AS BIGINT) AS n_tie
            FROM c LEFT JOIN p ON c.event_type = p.event_type
            GROUP BY c.event_type, c.n_h
            ORDER BY c.event_type
""",
        "mann_whitney_pairs": """
            WITH cnt AS (
              SELECT event_type AS t,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
                     count(*)::HUGEINT AS c
              FROM events GROUP BY 1, 2
            ), tot AS (
              SELECT t, sum(c)::HUGEINT AS n FROM cnt GROUP BY t
            ), pairs AS (
              SELECT a.t AS ta, b.t AS tb FROM tot a JOIN tot b ON a.t < b.t
            ), merged AS (
              SELECT p.ta, p.tb, c.v,
                     sum(CASE WHEN c.t = p.ta THEN c.c ELSE 0 END) AS c_a,
                     sum(CASE WHEN c.t = p.tb THEN c.c ELSE 0 END) AS c_b
              FROM pairs p JOIN cnt c ON c.t IN (p.ta, p.tb)
              GROUP BY p.ta, p.tb, c.v
            ), w AS (
              SELECT ta, tb, c_a, c_b,
                     COALESCE(sum(c_b) OVER (PARTITION BY ta, tb ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cumb_lt
              FROM merged
            )
            SELECT w.ta AS type_a, w.tb AS type_b,
                   CAST(max(na.n) AS BIGINT) AS n_a,
                   CAST(max(nb.n) AS BIGINT) AS n_b,
                   CAST(sum(w.c_a * (2 * w.cumb_lt + w.c_b)) AS BIGINT)
                     AS u2_a,
                   CAST(2 * max(na.n) * max(nb.n)
                        - sum(w.c_a * (2 * w.cumb_lt + w.c_b)) AS BIGINT)
                     AS u2_b
            FROM w JOIN tot na ON na.t = w.ta JOIN tot nb ON nb.t = w.tb
            GROUP BY w.ta, w.tb
            ORDER BY type_a, type_b
""",
        "benford_digit_counts": """
            SELECT o_orderpriority,
                   CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5)
                                         AS BIGINT) AS VARCHAR), 1, 1)
                        AS BIGINT) AS digit,
                   count(*) AS n
            FROM orders
            GROUP BY 1, 2
            ORDER BY 1, 2
""",
        "rule_agreement_kappa": """
            WITH f AS (
              SELECT CASE WHEN len(string_split(text, ' ')) >= 60
                          THEN 1 ELSE 0 END AS a,
                     CASE WHEN n_chars >= 330 THEN 1 ELSE 0 END AS b
              FROM documents
            ), c AS (
              SELECT
                COALESCE(sum(CASE WHEN a = 1 AND b = 1 THEN 1 END), 0)::HUGEINT AS n11,
                COALESCE(sum(CASE WHEN a = 1 AND b = 0 THEN 1 END), 0)::HUGEINT AS n10,
                COALESCE(sum(CASE WHEN a = 0 AND b = 1 THEN 1 END), 0)::HUGEINT AS n01,
                COALESCE(sum(CASE WHEN a = 0 AND b = 0 THEN 1 END), 0)::HUGEINT AS n00
              FROM f
            ), k AS (
              SELECT n11, n10, n01, n00,
                     n11 + n10 + n01 + n00 AS n,
                     (n11 + n10) * (n11 + n01)
                       + (n01 + n00) * (n10 + n00) AS pe
              FROM c
            )
            SELECT CAST(n AS BIGINT) AS n, CAST(n11 AS BIGINT) AS n11,
                   CAST(n10 AS BIGINT) AS n10, CAST(n01 AS BIGINT) AS n01,
                   CAST(n00 AS BIGINT) AS n00,
                   CAST(CASE WHEN n * n - pe = 0 THEN 0
                             WHEN n * (n11 + n00) - pe >= 0
                             THEN ((n * (n11 + n00) - pe) * 1000000)
                                  // (n * n - pe)
                             ELSE -(((pe - n * (n11 + n00)) * 1000000)
                                    // (n * n - pe))
                        END AS BIGINT) AS kappa_ppm
            FROM k
""",
        # round 5: the estimate view over the same chain — the median of
        # 9 per-group means (shared denominator 24) is the 5th smallest
        # s2_sum, so quantile_disc(0.5) replays it as a pure integer
        "selfjoin_size_ams": f"""
            WITH cu AS (
              SELECT event_type AS t, user_id::HUGEINT AS u,
                     count(*)::HUGEINT AS c
              FROM events GROUP BY 1, 2
            ),
            {{sm_a}},
            jsrc AS (SELECT j FROM generate_series(0, 215) AS g(j)),
            {{sm_b}},
            cross0 AS (
              SELECT ax.t, ax.c, bx.j, xor(ax.h, bx.h) AS xs FROM ax, bx
            ),
            {{sm_p}},
            s AS (
              SELECT t, j, sum((1 - 2 * (h % 2)) * c) AS s
              FROM px GROUP BY t, j
            ),
            g2 AS (
              SELECT t AS event_type, j // 24 AS grp,
                     CAST(sum(s * s) AS BIGINT) AS s2_sum
              FROM s GROUP BY t, j // 24
            )
            SELECT event_type,
                   CAST(quantile_disc(s2_sum, 0.5) AS BIGINT) AS f2_est24
            FROM g2 GROUP BY event_type ORDER BY event_type
""".format(sm_a=_sm_ctes("a", "cu", "u", ["t", "c"]),
           sm_b=_sm_ctes("b", "jsrc", "(j + 1) * 15", ["j"]),
           sm_p=_sm_ctes("p", "cross0", "xs", ["t", "c", "j"])),
        "ams_f2_checked": f"""
            WITH cu AS (
              SELECT event_type AS t, user_id::HUGEINT AS u,
                     count(*)::HUGEINT AS c
              FROM events GROUP BY 1, 2
            ),
            {_sm_ctes("a", "cu", "u", ["t", "c"])},
            jsrc AS (SELECT j FROM generate_series(0, 215) AS g(j)),
            {_sm_ctes("b", "jsrc", "(j + 1) * 15", ["j"])},
            cross0 AS (
              SELECT ax.t, ax.c, bx.j, xor(ax.h, bx.h) AS xs FROM ax, bx
            ),
            {_sm_ctes("p", "cross0", "xs", ["t", "c", "j"])},
            s AS (
              SELECT t, j, sum((1 - 2 * (h % 2)) * c) AS s
              FROM px GROUP BY t, j
            )
            SELECT t AS event_type, CAST(j // 24 AS BIGINT) AS grp,
                   CAST(sum(s * s) AS BIGINT) AS s2_sum
            FROM s GROUP BY t, j // 24
            ORDER BY event_type, grp
""",
        "hll_register_hist": f"""
            WITH users AS (
              SELECT DISTINCT user_id::HUGEINT AS u FROM events
            ),
            {_sm_ctes("h", "users", "u", ["u"])},
            r AS (
              SELECT h // 1125899906842624 AS idx,
                     65 - length(bin((((h * 16384) % {_P64})
                                      + 8192)::UBIGINT)) AS rank
              FROM hx
            ),
            reg AS (SELECT idx, max(rank) AS rank FROM r GROUP BY idx),
            hist AS (
              SELECT rank, count(*) AS n FROM reg GROUP BY rank
              UNION ALL
              SELECT 0 AS rank, 16384 - (SELECT count(*) FROM reg) AS n
            )
            SELECT CAST(rank AS BIGINT) AS rank, CAST(n AS BIGINT) AS n_regs
            FROM hist WHERE n > 0 ORDER BY rank
""",
        "approx_actor_overlap": f"""
            WITH ua AS (
              SELECT DISTINCT user_id::HUGEINT AS u FROM events
            ),
            {_sm_ctes("pa", "ua", "u", ["u"])},
            {_hll_reg_ctes("a", "pax")},
            ub AS (
              SELECT DISTINCT o_custkey::HUGEINT AS u FROM orders
            ),
            {_sm_ctes("pb", "ub", "u", ["u"])},
            {_hll_reg_ctes("b", "pbx")},
            regu AS (
              SELECT idx, max(rank) AS rank FROM (
                SELECT * FROM rega UNION ALL SELECT * FROM regb)
              GROUP BY idx
            ),
            {_hll_est_ctes("ea", "rega")},
            {_hll_est_ctes("eb", "regb")},
            {_hll_est_ctes("eu", "regu")}
            SELECT
              (SELECT em FROM eaest) AS card_a_milli,
              (SELECT em FROM ebest) AS card_b_milli,
              (SELECT em FROM euest) AS card_union_milli,
              GREATEST(0, (SELECT em FROM eaest) + (SELECT em FROM ebest)
                          - (SELECT em FROM euest)) AS card_intersect_milli
""",
        "approx_distinct_users_by_type": f"""
            WITH du AS (
              SELECT DISTINCT event_type AS t, user_id::HUGEINT AS u
              FROM events
            ),
            {_sm_ctes("h", "du", "u", ["t"])},
            r AS (
              SELECT t, h // 1125899906842624 AS idx,
                     65 - length(bin((((h * 16384) % {_P64})
                                      + 8192)::UBIGINT)) AS rank
              FROM hx
            ),
            reg AS (SELECT t, idx, max(rank) AS rank
                    FROM r GROUP BY t, idx),
            agg AS (
              SELECT t,
                     COALESCE(SUM(1::HUGEINT << (64 - rank)),
                              0::HUGEINT) AS s_nz,
                     COUNT(*) AS n_nz
              FROM reg GROUP BY t
            ),
            fin AS (
              SELECT t, CAST(s_nz + (16384 - n_nz) * (1::HUGEINT << 64)
                             AS DOUBLE) AS sd,
                     16384 - n_nz AS zeros
              FROM agg
            )
            SELECT t AS event_type,
                   CAST(FLOOR(CASE
                     WHEN ((((0.7213 / (1.0 + 1.079 / 16384.0)) * 16384.0)
                            * 16384.0) * 18446744073709551616.0) / sd
                          <= 2.5 * 16384.0 AND zeros > 0
                     THEN 16384.0 * ln(16384.0 / zeros)
                     ELSE ((((0.7213 / (1.0 + 1.079 / 16384.0)) * 16384.0)
                            * 16384.0) * 18446744073709551616.0) / sd
                   END * 1000.0) AS BIGINT) AS distinct_users_milli
            FROM fin ORDER BY t
""",
        "approx_distinct_users": f"""
            WITH users AS (
              SELECT DISTINCT user_id::HUGEINT AS u FROM events
            ),
            {_sm_ctes("h", "users", "u", ["u"])},
            r AS (
              SELECT h // 1125899906842624 AS idx,
                     65 - length(bin((((h * 16384) % {_P64})
                                      + 8192)::UBIGINT)) AS rank
              FROM hx
            ),
            reg AS (SELECT idx, max(rank) AS rank FROM r GROUP BY idx),
            agg AS (
              SELECT COALESCE(SUM(1::HUGEINT << (64 - rank)),
                              0::HUGEINT) AS s_nz,
                     COUNT(*) AS n_nz
              FROM reg
            ),
            fin AS (
              SELECT CAST(s_nz + (16384 - n_nz) * (1::HUGEINT << 64)
                          AS DOUBLE) AS sd,
                     16384 - n_nz AS zeros
              FROM agg
            ),
            est AS (
              SELECT CASE
                WHEN ((((0.7213 / (1.0 + 1.079 / 16384.0)) * 16384.0)
                       * 16384.0) * 18446744073709551616.0) / sd
                     <= 2.5 * 16384.0 AND zeros > 0
                THEN 16384.0 * ln(16384.0 / zeros)
                ELSE ((((0.7213 / (1.0 + 1.079 / 16384.0)) * 16384.0)
                       * 16384.0) * 18446744073709551616.0) / sd
              END AS e
              FROM fin
            )
            SELECT CAST(FLOOR(e * 1000.0) AS BIGINT)
                     AS approx_distinct_users_milli
            FROM est
""",
        "cms_word_hitters": f"""
            WITH wc AS (
              SELECT w, count(*)::HUGEINT AS c FROM (
                SELECT unnest(string_split(text, ' ')) AS w FROM documents)
              GROUP BY w
            ), wh2 AS (
              SELECT w, c, list_reduce(list_prepend(0::HUGEINT,
                list_transform(
                  list_filter(string_split_regex(w, ''), ch -> ch <> ''),
                  ch -> unicode(ch)::HUGEINT)),
                (h, ch) -> (h * 1000003 + ch) % {_P64}) AS x
              FROM wc
            ), rows_(d, a, b) AS (VALUES
              (0, 11400714819323198485::HUGEINT, 0::HUGEINT),
              (1, 14029467366897019727::HUGEINT, 2246822507::HUGEINT),
              (2, 1609587929392839161::HUGEINT, 4251740869::HUGEINT),
              (3, 2870177450012600261::HUGEINT, 3407782741::HUGEINT)),
            cols AS (
              SELECT wh2.w, wh2.c, r.d,
                ((((wh2.x // 4294967296 * r.a % {_P64}) * 4294967296
                   + (wh2.x % 4294967296) * r.a) % {_P64} + r.b) % {_P64}
                 // 4294967296) % 8192 AS col
              FROM wh2, rows_ r
            ), bucket AS (
              SELECT d, col, sum(c) AS s FROM cols GROUP BY d, col
            ), est AS (
              SELECT cols.w, min(bucket.s) AS est_n
              FROM cols JOIN bucket USING (d, col) GROUP BY cols.w
            )
            SELECT w AS word, CAST(est_n AS BIGINT) AS est_n
            FROM est ORDER BY est_n DESC, word ASC LIMIT 10
""",
        "semi_f_customers_by_nation": """
            SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers
            FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderstatus = 'F')
            GROUP BY c_nationkey ORDER BY c_nationkey
""",
        "gini_impurity_by_source": """
            WITH m AS (
              SELECT source, lang, count(*)::HUGEINT AS n
              FROM documents GROUP BY 1, 2
            ), s AS (
              SELECT source, sum(n) AS n, sum(n * n) AS ss FROM m GROUP BY 1
            )
            SELECT source, CAST(n AS BIGINT) AS n,
                   CAST((n * n - ss) * 1000000 // (n * n) AS BIGINT)
                     AS gini_ppm
            FROM s ORDER BY source
""",
        "chi2_type_hour": """
            WITH b AS (
              SELECT event_type AS t,
                     (epoch_us(ts) - 1704067200000000) // 3600000000 % 24
                       AS hod
              FROM events
            ), o AS (
              SELECT t, hod, count(*)::HUGEINT AS o FROM b GROUP BY 1, 2
            ), grid AS (
              SELECT tt.t, hh.hod
              FROM (SELECT DISTINCT t FROM o) tt,
                   (SELECT DISTINCT hod FROM o) hh
            ), f AS (
              SELECT grid.t, grid.hod, COALESCE(o.o, 0) AS o
              FROM grid LEFT JOIN o ON grid.t = o.t AND grid.hod = o.hod
            ), m AS (
              SELECT t, o, sum(o) OVER (PARTITION BY t) AS r,
                     sum(o) OVER (PARTITION BY hod) AS c,
                     sum(o) OVER () AS n
              FROM f
            ), cell AS (
              SELECT t, r,
                     ((o * n - r * c) * (o * n - r * c) * 1000000)
                       // (r * c * n) AS ppm
              FROM m
            )
            SELECT t AS event_type, CAST(max(r) AS BIGINT) AS n_type,
                   CAST(sum(ppm) AS BIGINT) AS chi2_ppm
            FROM cell GROUP BY t ORDER BY t
""",
        "wow_value_change": """
            WITH b AS (
              SELECT event_type AS t,
                     (epoch_us(ts) - 1704067200000000) // 604800000000 AS w,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
              FROM events
            ), m AS (
              SELECT t, w, sum(y)::HUGEINT AS y FROM b GROUP BY 1, 2
            ), l AS (
              SELECT t, w, y, lag(y) OVER (PARTITION BY t ORDER BY w) AS p
              FROM m
            )
            SELECT t AS event_type, CAST(w AS BIGINT) AS week,
                   CAST(CASE WHEN y >= p THEN ((y - p) * 1000000) // p
                             ELSE -(((p - y) * 1000000) // p)
                        END AS BIGINT) AS wow_ppm
            FROM l WHERE p IS NOT NULL ORDER BY t, w
""",
        "vocab_coverage_top100": """
            WITH wc AS (
              SELECT w, count(*)::HUGEINT AS c FROM (
                SELECT unnest(string_split(text, ' ')) AS w FROM documents)
              GROUP BY w
            ), r AS (
              SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS rk
              FROM wc
            )
            SELECT CAST((SELECT sum(c) FROM wc) AS BIGINT) AS n_tokens,
                   CAST((SELECT count(*) FROM wc) AS BIGINT) AS n_distinct,
                   CAST(sum(CASE WHEN rk <= 100 THEN c ELSE 0 END)
                        AS BIGINT) AS top100_n,
                   CAST(sum(CASE WHEN rk <= 100 THEN c ELSE 0 END) * 1000000
                        // (SELECT sum(c) FROM wc) AS BIGINT)
                     AS coverage_ppm
            FROM r
""",
        "spearman_hourly_pairs": """
            WITH b AS (
              SELECT event_type,
                     (epoch_us(ts) - 1704067200000000) // 3600000000 AS h,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
              FROM events
            ), m AS (
              SELECT event_type, h, sum(y)::HUGEINT AS y
              FROM b GROUP BY event_type, h
            ), pj AS (
              SELECT a.event_type AS ta, b2.event_type AS tb,
                     a.y AS ya, b2.y AS yb
              FROM m a JOIN m b2
                ON a.h = b2.h AND a.event_type < b2.event_type
            ), rk AS (
              SELECT ta, tb,
                     2 * rank() OVER (PARTITION BY ta, tb ORDER BY ya)
                       + count(*) OVER (PARTITION BY ta, tb, ya) - 1 AS mra,
                     2 * rank() OVER (PARTITION BY ta, tb ORDER BY yb)
                       + count(*) OVER (PARTITION BY ta, tb, yb) - 1 AS mrb
              FROM pj
            )
            SELECT ta AS type_a, tb AS type_b,
                   CAST(count(*) AS BIGINT) AS n_h,
                   CAST(sum((mra - mrb) * (mra - mrb)) AS BIGINT)
                     AS sum_d2x4
            FROM rk GROUP BY ta, tb ORDER BY ta, tb
""",
        "hapax_ratio_by_lang": """
            WITH wc AS (
              SELECT lang, w, count(*)::HUGEINT AS c FROM (
                SELECT lang, unnest(string_split(text, ' ')) AS w
                FROM documents)
              GROUP BY 1, 2
            )
            SELECT lang, CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_hapax,
                   CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
                        // count(*) AS BIGINT) AS hapax_ppm
            FROM wc GROUP BY lang ORDER BY lang
""",
        "tpch_q5_local_revenue": """
            SELECT n_name,
                   CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                                 AS BIGINT)
                            * (100 - CAST(floor(l_discount * 100 + 0.5)
                                          AS BIGINT))) AS BIGINT)
                     AS revenue_scaled
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= DATE '1996-01-01'
              AND o_orderdate < DATE '1997-01-01'
            GROUP BY n_name ORDER BY revenue_scaled DESC, n_name
""",
        "word_burstiness_top20": """
            WITH ex AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents
            ), agg AS (
              SELECT w, count(*)::HUGEINT AS cf,
                     count(DISTINCT doc_id)::HUGEINT AS df
              FROM ex GROUP BY w
            )
            SELECT w AS word, CAST(cf AS BIGINT) AS cf,
                   CAST(df AS BIGINT) AS df,
                   CAST(cf * 1000000 // df AS BIGINT) AS cf_per_df_ppm
            FROM agg ORDER BY cf DESC, word ASC LIMIT 20
""",
        "word_len_stats_by_lang": """
            WITH ex AS (
              SELECT lang, unnest(string_split(text, ' ')) AS w
              FROM documents
            ), agg AS (
              SELECT lang, count(*)::HUGEINT AS n,
                     sum(length(w))::HUGEINT AS chars
              FROM ex GROUP BY lang
            )
            SELECT lang, CAST(n AS BIGINT) AS n_words,
                   CAST(chars AS BIGINT) AS total_chars,
                   CAST(chars * 1000000 // n AS BIGINT) AS mean_len_ppm
            FROM agg ORDER BY lang
""",
        "stopword_density_by_source": f"""
            WITH ex AS (
              SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents
            ), agg AS (
              SELECT source, count(*)::HUGEINT AS n,
                     sum(CASE WHEN w IN ({stoplist}) THEN 1 ELSE 0
                         END)::HUGEINT AS s
              FROM ex GROUP BY source
            )
            SELECT source, CAST(n AS BIGINT) AS n_tokens,
                   CAST(s AS BIGINT) AS n_stop,
                   CAST(s * 1000000 // n AS BIGINT) AS stop_ppm
            FROM agg ORDER BY source
""",
        "dup_bigram_fraction": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ), bg AS (
              SELECT doc_id,
                     greatest(len(ws) - 1, 0) AS nb,
                     CASE WHEN len(ws) >= 2 THEN
                       len(list_distinct(list_transform(
                         generate_series(1, len(ws) - 1),
                         i -> ws[i] || chr(31) || ws[i + 1])))
                     ELSE 0 END AS nd
              FROM w
            )
            SELECT doc_id, CAST(nb AS BIGINT) AS n_bigrams,
                   CAST(nb - nd AS BIGINT) AS n_dup_occ,
                   CAST(CASE WHEN nb > 0
                             THEN (nb - nd) * 1000000 // nb
                             ELSE 0 END AS BIGINT) AS dup_ppm
            FROM bg ORDER BY doc_id
""",
        "priority_transition_counts": """
            WITH s AS (
              SELECT o_orderpriority AS p,
                     lag(o_orderpriority) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS pf
              FROM orders
            )
            SELECT pf AS prio_from, p AS prio_to,
                   CAST(count(*) AS BIGINT) AS n
            FROM s WHERE pf IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2
""",
        "user_activity_gini": """
            WITH cnt AS (
              SELECT count(*)::HUGEINT AS k FROM events GROUP BY user_id
            ), rk AS (
              SELECT k, row_number() OVER (ORDER BY k) AS r FROM cnt
            ), s AS (
              SELECT count(*)::HUGEINT AS n, sum(k)::HUGEINT AS total,
                     sum(k * r)::HUGEINT AS wrs
              FROM rk
            )
            SELECT CAST(n AS BIGINT) AS n_users,
                   CAST(total AS BIGINT) AS total_events,
                   CAST(wrs AS BIGINT) AS weighted_rank_sum,
                   CAST(CASE WHEN 2 * wrs >= (n + 1) * total
                             THEN ((2 * wrs - (n + 1) * total) * 1000000)
                                  // (n * total)
                             ELSE -((((n + 1) * total - 2 * wrs) * 1000000)
                                    // (n * total))
                        END AS BIGINT) AS gini_ppm
            FROM s
""",
        "orders_per_customer_hist": """
            SELECT CAST(k AS BIGINT) AS n_orders,
                   CAST(count(*) AS BIGINT) AS n_customers
            FROM (SELECT count(*) AS k FROM orders GROUP BY o_custkey)
            GROUP BY k ORDER BY k
""",
        "fulfillment_latency_hist": """
            WITH d AS (
              SELECT epoch_us(l_shipdate) - epoch_us(o_orderdate) AS diff
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            )
            SELECT CAST(CASE WHEN diff >= 0 THEN diff // 86400000000
                             ELSE -((-diff) // 86400000000)
                        END AS BIGINT) AS days,
                   CAST(count(*) AS BIGINT) AS n
            FROM d GROUP BY 1 ORDER BY 1
""",
        "session_duration_hist": """
            WITH e AS (
              SELECT user_id, epoch_us(ts) AS t,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                                  > 3600000000
                          THEN 1 ELSE 0 END AS is_start
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), s AS (
              SELECT user_id, t,
                     sum(is_start) OVER (PARTITION BY user_id ORDER BY t
                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM e
            ), d AS (
              SELECT (max(t) - min(t)) // 60000000 AS mins
              FROM s GROUP BY user_id, sid
            )
            SELECT CAST(mins AS BIGINT) AS duration_min,
                   CAST(count(*) AS BIGINT) AS n_sessions
            FROM d GROUP BY mins ORDER BY mins
""",
        # pair charged to the LATER start's day; strict (s, user, sid)
        # order counts each overlapping cross-user pair exactly once
        "concurrent_session_pairs": """
            WITH s AS (
              SELECT user_id, epoch_us(ts) AS us,
                     CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                               > 3600000000
                          OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS st
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), a AS (
              SELECT user_id, us,
                     SUM(st) OVER (PARTITION BY user_id ORDER BY us
                                   ROWS UNBOUNDED PRECEDING) - 1 AS sid
              FROM s
            ), sp AS (
              SELECT user_id, sid, MIN(us) AS s, MAX(us) AS e
              FROM a GROUP BY 1, 2
            )
            SELECT CAST(b.s // 86400000000 AS BIGINT) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM sp a JOIN sp b
              ON a.e >= b.s
             AND (a.s < b.s OR (a.s = b.s AND (a.user_id < b.user_id
                  OR (a.user_id = b.user_id AND a.sid < b.sid))))
            GROUP BY 1 ORDER BY 1
        """,
        "type_crosscorr_lags": """
            WITH v AS (
              SELECT epoch_us(ts) // 3600000000 AS h, COUNT(*) AS n
              FROM events WHERE event_type = 'view' GROUP BY 1
            ), c AS (
              SELECT epoch_us(ts) // 3600000000 AS h, COUNT(*) AS n
              FROM events WHERE event_type = 'click' GROUP BY 1
            ), p AS (
              SELECT c.h - v.h AS lag, SUM(v.n * c.n) AS s
              FROM v, c WHERE c.h - v.h BETWEEN 0 AND 6 GROUP BY 1
            )
            SELECT CAST(g.lag AS BIGINT) AS lag,
                   CAST(COALESCE(p.s, 0) AS BIGINT) AS xcorr
            FROM generate_series(0, 6) g(lag) LEFT JOIN p ON p.lag = g.lag
            ORDER BY 1
        """,
        # bottom-64 DISTINCT Horner word hashes per source (exact order
        # sketch: ROW_NUMBER over ascending unsigned hash), then pairwise
        # sketch intersections
        "source_bottomk_containment": """
            WITH wh AS (
              SELECT source,
                unnest(list_transform(string_split(text, ' '),
                  w -> list_reduce(list_prepend(0::HUGEINT,
                         list_transform(
                           list_filter(string_split_regex(w, ''),
                                       c -> c <> ''),
                           c -> unicode(c)::HUGEINT)),
                       (h, c) -> (h * 1000003 + c)
                                 % 18446744073709551616::HUGEINT))) AS h
              FROM documents
            ), d AS (SELECT DISTINCT source, h FROM wh),
            r AS (
              SELECT source, h,
                     ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk
              FROM d
            ), s AS (SELECT source, h FROM r WHERE rk <= 64)
            SELECT a.source AS source_a, b.source AS source_b,
                   CAST(COUNT(*) AS BIGINT) AS n_common
            FROM s a JOIN s b ON a.h = b.h AND a.source < b.source
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "hive_partition_prune": """
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
            FROM documents WHERE source = 'src7'
        """,
        "part_kcore": _kcore_unrolled_sql(k=3, rounds=8),
        "part_communities": _lpa_unrolled_sql(rounds=3),
        "source_weighted_sample": f"""
            WITH s AS (
              SELECT source, doc_id::HUGEINT AS did,
                     GREATEST(length(text), 1) AS w
              FROM documents),
            {_sm_ctes("gp", "s", "did", ["source", "did", "w"])},
            p AS (
              SELECT source, CAST(did AS BIGINT) AS doc_id,
                     CAST(w AS BIGINT) AS w,
                     CAST((h // 2) // w AS BIGINT) AS priority
              FROM gpx)
            SELECT source, doc_id, w, priority FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                         ORDER BY priority, doc_id) AS rn FROM p)
            WHERE rn <= 20 ORDER BY source, priority, doc_id
        """,
        "user_golden_record": """
            WITH e AS (
              SELECT user_id, ts, event_id, event_type AS last_type,
                     CASE WHEN event_type = 'error' THEN NULL
                          ELSE CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                     END AS last_cents
              FROM events),
            t1 AS (
              SELECT user_id, last_type FROM (
                SELECT user_id, last_type,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC,
                                                   event_id DESC) AS rn
                FROM e WHERE last_type IS NOT NULL) WHERE rn = 1),
            t2 AS (
              SELECT user_id, last_cents FROM (
                SELECT user_id, last_cents,
                       ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY ts DESC,
                                                   event_id DESC) AS rn
                FROM e WHERE last_cents IS NOT NULL) WHERE rn = 1),
            u AS (SELECT DISTINCT user_id FROM e)
            SELECT u.user_id, t1.last_type, t2.last_cents
            FROM u LEFT JOIN t1 ON u.user_id = t1.user_id
                   LEFT JOIN t2 ON u.user_id = t2.user_id
            ORDER BY u.user_id
        """,
        "copurchase_lift_top20": """
            WITH gi AS (
              SELECT DISTINCT l_orderkey AS g, l_partkey AS i
              FROM lineitem),
            e AS (
              SELECT a.i AS u, b.i AS v, COUNT(*) AS n
              FROM gi a JOIN gi b ON a.g = b.g AND a.i < b.i
              GROUP BY 1, 2),
            d AS (SELECT i, COUNT(*) AS c FROM gi GROUP BY i),
            nn AS (SELECT COUNT(DISTINCT g) AS nb FROM gi),
            s AS (
              SELECT u, v, n,
                     1000000::HUGEINT * nn.nb * e.n // (da.c * db.c)
                       AS lift
              FROM e JOIN d da ON e.u = da.i
                     JOIN d db ON e.v = db.i, nn
              WHERE e.n >= 5)
            SELECT u, v, CAST(n AS BIGINT) AS n,
                   CAST(lift AS BIGINT) AS lift_ppm
            FROM s ORDER BY lift DESC, u, v LIMIT 20
        """,
        "decay_attribution": """
            WITH fp AS (
              SELECT user_id, MIN(epoch_us(ts)) AS pt
              FROM events WHERE event_type = 'purchase'
              GROUP BY user_id),
            t AS (
              SELECT e.event_type, fp.pt - epoch_us(e.ts) AS age
              FROM events e JOIN fp ON e.user_id = fp.user_id
              WHERE epoch_us(e.ts) < fp.pt)
            SELECT event_type, COUNT(*) AS n_touches,
                   CAST(SUM(1000000 // (1::BIGINT <<
                        CAST(LEAST(age // 86400000000, 62) AS INTEGER)))
                        AS BIGINT) AS credit
            FROM t GROUP BY 1 ORDER BY 1
        """,
        "doc_kfold_census": f"""
            WITH s AS (
              SELECT source, doc_id::HUGEINT AS did FROM documents),
            {_sm_ctes("kf", "s", "did", ["source"])}
            SELECT source, CAST(h % 5 AS BIGINT) AS fold,
                   COUNT(*) AS n
            FROM kfx GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "event_value_cvm": """
            WITH e AS (
              SELECT event_type AS t,
                     CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
              FROM events WHERE event_type IN ('purchase', 'click')),
            h AS (
              SELECT v,
                     COUNT(*) FILTER (WHERE t = 'purchase') AS a,
                     COUNT(*) FILTER (WHERE t = 'click') AS b
              FROM e GROUP BY v),
            c AS (
              SELECT v, a, b,
                     SUM(a) OVER (ORDER BY v) AS fa,
                     SUM(b) OVER (ORDER BY v) AS fb
              FROM h),
            n AS (SELECT SUM(a) AS n1, SUM(b) AS n2 FROM h)
            SELECT CAST(n.n1 AS BIGINT) AS n1,
                   CAST(n.n2 AS BIGINT) AS n2,
                   CAST(SUM((c.a + c.b)::HUGEINT
                            * (c.fa * n.n2 - c.fb * n.n1)
                            * (c.fa * n.n2 - c.fb * n.n1)
                            // (n.n1 * n.n2)) AS BIGINT) AS cvm_scaled
            FROM c, n GROUP BY n.n1, n.n2
        """,
        "purchase_value_percentiles": """
            WITH ref AS (
              SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
              FROM events WHERE event_type = 'view'),
            n AS (SELECT COUNT(*) AS c FROM ref),
            cum AS (
              SELECT v, MAX(rn) AS cle FROM (
                SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM ref)
              GROUP BY v),
            p AS (
              SELECT strftime(ts, '%m') AS month,
                     CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
              FROM events WHERE event_type = 'purchase'),
            r AS (
              SELECT p.month,
                     COALESCE((SELECT MAX(cum.cle) FROM cum
                               WHERE cum.v <= p.v), 0)
                       * 1000000 // n.c AS ppm
              FROM p, n)
            SELECT month, COUNT(*) AS n,
                   CAST(SUM(ppm) AS BIGINT) AS ppm_sum
            FROM r GROUP BY 1 ORDER BY 1
        """,
        "doc_negative_samples": f"""
            WITH nn AS (SELECT COUNT(*) AS n FROM documents),
            s AS (
              SELECT d.source,
                     (d.doc_id::HUGEINT * 5 + j.j + 1) AS seed,
                     d.doc_id::HUGEINT AS did
              FROM documents d
              CROSS JOIN generate_series(0, 3) AS j(j)),
            {_sm_ctes("ns", "s", "seed", ["source", "did"])},
            c AS (
              SELECT source,
                     CASE WHEN h % nn.n = did
                          THEN (h % nn.n + 1) % nn.n
                          ELSE h % nn.n END AS cand
              FROM nsx, nn)
            SELECT source, COUNT(*) AS n_triples,
                   CAST(SUM(cand) AS BIGINT) AS neg_sum
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "doc_padding_waste": """
            WITH w AS (
              SELECT GREATEST(len(string_split(text, ' ')), 1) AS nw
              FROM documents),
            b AS (
              SELECT GREATEST(CAST(POWER(2, CEIL(LOG2(nw)))
                                   AS BIGINT), 1) AS bucket_cap, nw
              FROM w),
            g AS (
              SELECT bucket_cap, COUNT(*) AS n_docs,
                     CAST(SUM(nw) AS BIGINT) AS sum_words
              FROM b GROUP BY 1)
            SELECT bucket_cap, n_docs, sum_words,
                   n_docs * bucket_cap - sum_words AS waste,
                   (n_docs * bucket_cap - sum_words) * 1000000
                     // (n_docs * bucket_cap) AS waste_ppm
            FROM g ORDER BY bucket_cap
        """,
        "part_bfs_hops": _bfs_unrolled_sql(rounds=4),
        "part_shortest_costs": _bf_unrolled_sql(rounds=4),
        "part_widest_ties": _widest_unrolled_sql(rounds=4),
        "frequent_triples": """
            WITH gi AS (
              SELECT DISTINCT l_orderkey AS g, l_partkey AS i
              FROM lineitem),
            t AS (
              SELECT a.i AS x, b.i AS y, c.i AS z, COUNT(*) AS n
              FROM gi a
              JOIN gi b ON a.g = b.g AND a.i < b.i
              JOIN gi c ON a.g = c.g AND b.i < c.i
              GROUP BY 1, 2, 3)
            SELECT x, y, z, CAST(n AS BIGINT) AS n
            FROM t WHERE n >= 2
            ORDER BY n DESC, x, y, z LIMIT 20
        """,
        "lineitem_pareto_3d": """
            WITH s AS (
              SELECT CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty,
                     CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                       AS price_cents,
                     CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT)
                       AS disc_bp
              FROM lineitem WHERE l_orderkey % 64 = 0)
            SELECT qty, price_cents, disc_bp FROM s a
            WHERE NOT EXISTS (
              SELECT 1 FROM s b
              WHERE b.qty >= a.qty AND b.price_cents >= a.price_cents
                AND b.disc_bp <= a.disc_bp
                AND (b.qty > a.qty OR b.price_cents > a.price_cents
                     OR b.disc_bp < a.disc_bp))
            ORDER BY qty, price_cents, disc_bp
        """,
        "flag_pareto": """
            WITH s AS (
              SELECT l_returnflag AS flag,
                     CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty,
                     CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT)
                       AS disc_bp
              FROM lineitem WHERE l_orderkey % 64 = 0)
            SELECT flag, qty, disc_bp FROM s a
            WHERE NOT EXISTS (
              SELECT 1 FROM s b
              WHERE b.flag = a.flag
                AND b.qty >= a.qty AND b.disc_bp <= a.disc_bp
                AND (b.qty > a.qty OR b.disc_bp < a.disc_bp))
            ORDER BY flag, qty, disc_bp
        """,
        "view_no_click_1h": """
            WITH a AS (
              SELECT user_id AS k, epoch_us(ts) AS t,
                     strftime(ts, '%m') AS grp
              FROM events WHERE event_type = 'view'),
            b AS (
              SELECT user_id AS k, epoch_us(ts) AS t
              FROM events WHERE event_type = 'click')
            SELECT grp, COUNT(*) AS n_anchors,
                   CAST(SUM(CASE WHEN NOT EXISTS (
                       SELECT 1 FROM b
                       WHERE b.k = a.k AND b.t > a.t
                         AND b.t <= a.t + 3600000000)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_abandoned
            FROM a GROUP BY 1 ORDER BY 1
        """,
        "events_orc_roundtrip": """
            SELECT event_type, COUNT(*) AS n,
                   SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
            FROM events GROUP BY event_type
        """,
        "embedding_top_pc_q8": _toppc_unrolled_sql(rounds=8),
        "mmr_diverse_topk_q8": _mmr_unrolled_sql(k=5, m=64, lam_num=7,
                                                 lam_den=10),
        "user_rolling_median": """
            SELECT event_id,
                   quantile_disc(CAST(FLOOR(value * 100 + 0.5) AS BIGINT),
                                 0.5) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)
                     AS roll_q
            FROM events ORDER BY event_id
        """,
        "part_neighbor_jaccard": """
            WITH gi AS MATERIALIZED (
              SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
            e AS MATERIALIZED (
              SELECT DISTINCT a.i AS u, b.i AS v
              FROM gi a JOIN gi b ON a.g = b.g AND a.i < b.i),
            deg AS (SELECT node, COUNT(*) AS d FROM
                      (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
                    GROUP BY node),
            csym AS (
              SELECT c, nbr FROM
                (SELECT u AS c, v AS nbr FROM e
                 UNION ALL SELECT v, u FROM e)
              WHERE c IN (SELECT node FROM deg WHERE d <= 48)),
            w AS (SELECT a.nbr AS x, b.nbr AS y, COUNT(*) AS cn
                  FROM csym a JOIN csym b
                    ON a.c = b.c AND a.nbr < b.nbr
                  GROUP BY 1, 2)
            SELECT w.x, w.y, CAST(w.cn AS BIGINT) AS cn,
                   CAST((w.cn * 1000000000)
                        // (dx.d + dy.d - w.cn) AS BIGINT) AS jscore
            FROM w JOIN deg dx ON dx.node = w.x
                   JOIN deg dy ON dy.node = w.y
            WHERE NOT EXISTS (SELECT 1 FROM e
                              WHERE e.u = w.x AND e.v = w.y)
            ORDER BY jscore DESC, w.x, w.y LIMIT 20
        """,
        "order_session_overlap": """
            WITH o AS (
              SELECT user_id, ts,
                     CASE WHEN prev_ts IS NULL
                               OR epoch_us(ts) - epoch_us(prev_ts)
                                  > 3600000000
                          THEN 1 ELSE 0 END AS is_start
              FROM (
                SELECT user_id, ts,
                       LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts) AS prev_ts
                FROM events)),
            sx AS (
              SELECT user_id, ts,
                     SUM(is_start) OVER (PARTITION BY user_id
                                         ORDER BY ts
                                         ROWS UNBOUNDED PRECEDING) AS sid
              FROM o),
            sp AS (
              SELECT user_id, sid,
                     MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
              FROM sx GROUP BY user_id, sid),
            w AS (
              SELECT ROW_NUMBER() OVER () AS wid,
                     strftime(ts, '%d') AS day, user_id,
                     epoch_us(ts) AS a,
                     epoch_us(ts) + 10800000000 AS b
              FROM events WHERE event_type = 'purchase'),
            j AS (
              SELECT w.day, w.wid, COUNT(sp.sid) AS cnt
              FROM w LEFT JOIN sp
                ON sp.user_id = w.user_id
               AND sp.s <= w.b AND w.a <= sp.e
              GROUP BY 1, 2)
            SELECT day,
                   CAST(SUM(cnt) AS BIGINT) AS n_pairs,
                   CAST(SUM(CASE WHEN cnt > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_hit,
                   COUNT(*) AS n_right
            FROM j GROUP BY 1 ORDER BY 1
        """,
        "fuzzy_name_pairs": """
            WITH w AS (
              SELECT c_custkey AS id, c_name AS w FROM customer
              WHERE c_custkey % 5 = 0),
            p AS (
              SELECT a.id, COUNT(b.id) AS n_nb
              FROM w a LEFT JOIN w b
                ON a.id <> b.id AND levenshtein(a.w, b.w) = 1
              GROUP BY a.id)
            SELECT CAST(n_nb AS BIGINT) AS n_nb,
                   COUNT(*) AS n_names
            FROM p GROUP BY 1 ORDER BY 1
        """,
        "orders_pareto": """
            WITH s AS (
              SELECT o_orderkey, epoch_us(o_orderdate) AS d,
                     CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS p
              FROM orders),
            g AS (SELECT d, MAX(p) AS mp FROM s GROUP BY d),
            c AS (
              SELECT d, mp,
                     MAX(mp) OVER (ORDER BY d
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS pmx
              FROM g)
            SELECT s.o_orderkey, s.d, s.p
            FROM s JOIN c ON s.d = c.d
            WHERE s.p = c.mp AND (c.pmx IS NULL OR s.p > c.pmx)
            ORDER BY s.d, s.o_orderkey
        """,
        "orders_weighted_sample": f"""
            WITH s AS (
              SELECT o_orderkey::HUGEINT AS oid,
                     GREATEST(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                   AS BIGINT), 1) AS w
              FROM orders),
            {_sm_ctes("ws", "s", "oid", ["oid", "w"])}
            SELECT CAST(oid AS BIGINT) AS o_orderkey,
                   CAST(w AS BIGINT) AS w_cents,
                   CAST((h // 2) // w AS BIGINT) AS priority
            FROM wsx ORDER BY priority, o_orderkey LIMIT 200
        """,
        "purchase_prepost": """
            WITH e AS (
              SELECT user_id AS k, epoch_us(ts) AS t,
                     CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
              FROM events),
            a AS (
              SELECT user_id AS k, epoch_us(ts) AS t,
                     strftime(ts, '%m') AS grp
              FROM events WHERE event_type = 'purchase'),
            p AS (
              SELECT a.grp,
                     SUM(CASE WHEN e.t >= a.t - 604800000000
                               AND e.t <  a.t THEN e.v ELSE 0 END) AS pre,
                     SUM(CASE WHEN e.t >  a.t
                               AND e.t <= a.t + 604800000000
                              THEN e.v ELSE 0 END) AS post
              FROM a JOIN e ON e.k = a.k
              GROUP BY a.grp),
            n AS (SELECT grp, COUNT(*) AS n_anchors FROM a GROUP BY grp)
            SELECT n.grp, n.n_anchors,
                   CAST(COALESCE(p.pre, 0) AS BIGINT) AS pre_cents,
                   CAST(COALESCE(p.post, 0) AS BIGINT) AS post_cents
            FROM n LEFT JOIN p ON n.grp = p.grp ORDER BY 1
        """,
        "ushape_attribution": """
            WITH fp AS (
              SELECT user_id, MIN(epoch_us(ts)) AS pt
              FROM events WHERE event_type = 'purchase'
              GROUP BY user_id),
            t AS (
              SELECT e.user_id, e.event_type, epoch_us(e.ts) AS t,
                     e.event_id
              FROM events e JOIN fp ON e.user_id = fp.user_id
              WHERE epoch_us(e.ts) < fp.pt),
            r AS (
              SELECT user_id, event_type,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY t, event_id) AS r,
                     COUNT(*) OVER (PARTITION BY user_id) AS n
              FROM t),
            c AS (
              SELECT event_type,
                     CASE WHEN n = 1 THEN 10000
                          WHEN n = 2 THEN 5000
                          WHEN r = 1 THEN 4000
                          WHEN r = n
                            THEN 4000 + 2000 - (n - 2) * (2000 // (n - 2))
                          ELSE 2000 // (n - 2) END AS credit
              FROM r)
            SELECT event_type, COUNT(*) AS n_touches,
                   CAST(SUM(credit) AS BIGINT) AS credit_bp
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "orders_rendezvous": f"""
            WITH ks AS (SELECT o_orderkey::HUGEINT AS key FROM orders),
            {_sm_ctes("hk", "ks", "key", ["key"])},
            keyh AS (SELECT key, h AS kh FROM hkx),
            sa AS (SELECT s, (s + 1)::HUGEINT AS sx
                   FROM generate_series(0, 7) AS t(s)),
            {_sm_ctes("sh", "sa", "sx", ["s"])},
            salth AS (SELECT s, h AS salt FROM shx),
            cx AS (SELECT key, s, xor(kh, salt) AS m FROM keyh, salth),
            {_sm_ctes("w", "cx", "m", ["key", "s"])},
            r AS (SELECT key, s,
                         ROW_NUMBER() OVER (PARTITION BY key
                                            ORDER BY h DESC, s ASC) AS rn
                  FROM wx)
            SELECT CAST(s AS BIGINT) AS shard, COUNT(*) AS n_keys,
                   CAST(SUM(key) AS BIGINT) AS key_sum
            FROM r WHERE rn = 1 GROUP BY 1 ORDER BY 1
        """,
        "priority_share_by_month": """
            WITH s AS (
              SELECT strftime(o_orderdate, '%Y-%m') AS month,
                     o_orderpriority AS prio,
                     CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c
              FROM orders),
            g AS (SELECT month, prio, SUM(c) AS v
                  FROM s GROUP BY month, prio)
            SELECT month, prio, CAST(v AS BIGINT) AS v,
                   CAST(v * 1000000 //
                        SUM(v) OVER (PARTITION BY month) AS BIGINT)
                     AS share_ppm
            FROM g ORDER BY month, prio
        """,
        "value_sax_motifs": """
            WITH e AS (
              SELECT user_id AS k, epoch_us(ts) AS t, event_id AS i,
                     CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v
              FROM events),
            r AS (
              SELECT k, v,
                     ROW_NUMBER() OVER (PARTITION BY k
                                        ORDER BY t, i) - 1 AS rn
              FROM e),
            f AS (
              SELECT k, rn // 4 AS fid, SUM(v) AS fs, COUNT(*) AS c
              FROM r GROUP BY k, rn // 4),
            ff AS (SELECT k, fid, fs FROM f WHERE c = 4),
            b AS (
              SELECT quantile_disc(fs, 0.25) AS b1,
                     quantile_disc(fs, 0.50) AS b2,
                     quantile_disc(fs, 0.75) AS b3
              FROM ff),
            s AS (
              SELECT k, fid,
                     CASE WHEN fs <= b1 THEN 'a'
                          WHEN fs <= b2 THEN 'b'
                          WHEN fs <= b3 THEN 'c'
                          ELSE 'd' END AS sym
              FROM ff, b),
            w AS (
              SELECT k,
                     sym || LEAD(sym, 1) OVER (PARTITION BY k
                                               ORDER BY fid)
                         || LEAD(sym, 2) OVER (PARTITION BY k
                                               ORDER BY fid) AS motif
              FROM s)
            SELECT motif, COUNT(*) AS n
            FROM w WHERE motif IS NOT NULL
            GROUP BY 1 ORDER BY 1
        """,
        "events_pivot_by_day": """
            SELECT strftime(ts, '%w') AS dow,
                   COUNT(*) FILTER (WHERE event_type = 'view')
                     AS n_view,
                   COUNT(*) FILTER (WHERE event_type = 'click')
                     AS n_click,
                   COUNT(*) FILTER (WHERE event_type = 'purchase')
                     AS n_purchase,
                   COUNT(*) FILTER (WHERE event_type = 'signup')
                     AS n_signup,
                   COUNT(*) FILTER (WHERE event_type = 'error')
                     AS n_error
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "value_stump_split": """
            WITH h AS (
              SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
                     event_type AS c, COUNT(*) AS n
              FROM events GROUP BY 1, 2),
            grid AS (
              SELECT d.v, cl.c, COALESCE(h.n, 0) AS n
              FROM (SELECT DISTINCT v FROM h) d
              CROSS JOIN (SELECT DISTINCT c FROM h) cl
              LEFT JOIN h ON h.v = d.v AND h.c = cl.c),
            p AS (
              SELECT v, c,
                     SUM(n) OVER (PARTITION BY c ORDER BY v) AS cum
              FROM grid),
            tc AS (SELECT c, SUM(n) AS nc FROM grid GROUP BY c),
            per AS (
              SELECT p.v,
                     SUM(p.cum)::HUGEINT AS n_l,
                     SUM(p.cum * p.cum)::HUGEINT AS s_l,
                     SUM((tc.nc - p.cum) * (tc.nc - p.cum))::HUGEINT
                       AS s_r,
                     SUM(tc.nc - p.cum)::HUGEINT AS n_r
              FROM p JOIN tc ON p.c = tc.c
              GROUP BY p.v),
            sc AS (
              SELECT v,
                     1000000000000::HUGEINT * (s_l * n_r + s_r * n_l)
                       // (n_l * n_r) AS score,
                     n_l, n_r
              FROM per WHERE n_r > 0 AND n_l > 0)
            SELECT CAST(v AS BIGINT) AS split,
                   CAST(score AS BIGINT) AS score,
                   CAST(n_l AS BIGINT) AS n_l, CAST(n_r AS BIGINT) AS n_r
            FROM sc ORDER BY score DESC, v ASC LIMIT 1
        """,
        "snm_blocking_census": """
            WITH w AS (
              SELECT c_name AS w FROM customer WHERE c_custkey % 5 = 0),
            r AS (SELECT w, ROW_NUMBER() OVER (ORDER BY w) AS rk FROM w),
            p AS (
              SELECT a.w AS x, b.w AS y
              FROM r a JOIN r b
                ON b.rk > a.rk AND b.rk <= a.rk + 4)
            SELECT COUNT(*) AS n_candidates,
                   CAST(SUM(CASE WHEN levenshtein(x, y) = 1
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_matches
            FROM p
        """,
        "type_dow_chi2": """
            WITH h AS (
              SELECT event_type AS a, strftime(ts, '%w') AS b,
                     COUNT(*) AS n
              FROM events GROUP BY 1, 2),
            grid AS (
              SELECT da.a, db.b, COALESCE(h.n, 0) AS o
              FROM (SELECT DISTINCT a FROM h) da
              CROSS JOIN (SELECT DISTINCT b FROM h) db
              LEFT JOIN h ON h.a = da.a AND h.b = db.b),
            rt AS (SELECT a, SUM(o) AS r FROM grid GROUP BY a),
            ct AS (SELECT b, SUM(o) AS c FROM grid GROUP BY b),
            tot AS (SELECT SUM(o) AS n FROM grid),
            cells AS (
              SELECT 1000000000::HUGEINT
                       * (tot.n * g.o - rt.r * ct.c)
                       * (tot.n * g.o - rt.r * ct.c)
                       // (tot.n * rt.r * ct.c) AS v
              FROM grid g
              JOIN rt ON g.a = rt.a
              JOIN ct ON g.b = ct.b, tot)
            SELECT CAST(SUM(v) AS BIGINT) AS chi2_scaled,
                   CAST((SELECT n FROM tot) AS BIGINT) AS n,
                   CAST(((SELECT COUNT(*) FROM rt) - 1)
                        * ((SELECT COUNT(*) FROM ct) - 1) AS BIGINT) AS df
            FROM cells
        """,
        "value_moment_stats": """
            WITH b AS (
              SELECT event_type,
                     CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
              FROM events),
            s AS (
              SELECT event_type, COUNT(*) AS n,
                     SUM(c) AS s1,
                     SUM(CAST(c AS HUGEINT) * c) AS s2,
                     SUM(CAST(c AS HUGEINT) * c * c) AS s3,
                     SUM(CAST(c AS HUGEINT) * c * c * c) AS s4
              FROM b GROUP BY event_type)
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   CAST(s1 AS BIGINT) AS s1, CAST(s2 AS BIGINT) AS s2,
                   CAST((s3 - ((s3 % 1000000000000000000 + 1000000000000000000) % 1000000000000000000)) // 1000000000000000000
                        AS BIGINT) AS s3_hi,
                   CAST(((s3 % 1000000000000000000 + 1000000000000000000) % 1000000000000000000) AS BIGINT) AS s3_lo,
                   CAST((s4 - ((s4 % 1000000000000000000 + 1000000000000000000) % 1000000000000000000)) // 1000000000000000000
                        AS BIGINT) AS s4_hi,
                   CAST(((s4 % 1000000000000000000 + 1000000000000000000) % 1000000000000000000) AS BIGINT) AS s4_lo
            FROM s ORDER BY event_type
        """,
        "doc_rrf_fusion_top20": """
            WITH t AS (
              SELECT doc_id, n_chars,
                     CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
              FROM documents),
            r AS (
              SELECT doc_id,
                     RANK() OVER (ORDER BY n_chars DESC) AS r1,
                     RANK() OVER (ORDER BY n_tok DESC) AS r2
              FROM t)
            SELECT doc_id,
                   CAST(r1 AS BIGINT) AS rank_n_chars,
                   CAST(r2 AS BIGINT) AS rank_n_tok,
                   CAST(1000000000000 // (60 + r1)
                        + 1000000000000 // (60 + r2) AS BIGINT) AS rrf
            FROM r ORDER BY rrf DESC, doc_id LIMIT 20
        """,
        "session_path_top20": """
            WITH o AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN prev_ts IS NULL
                               OR epoch_us(ts) - epoch_us(prev_ts)
                                  > 3600000000
                          THEN 1 ELSE 0 END AS is_start
              FROM (
                SELECT user_id, ts, event_id, event_type,
                       LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_ts
                FROM events)),
            s AS (
              SELECT user_id, ts, event_id, event_type,
                     SUM(is_start) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS sid
              FROM o),
            p AS (
              SELECT user_id, sid,
                     string_agg(event_type, '>'
                                ORDER BY ts, event_id) AS path
              FROM s GROUP BY user_id, sid)
            SELECT path, COUNT(*) AS n FROM p
            GROUP BY path ORDER BY n DESC, path LIMIT 20
        """,
        "value_zscore_breaches": """
            WITH b AS (
              SELECT user_id, ts, event_id, event_type,
                     CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
              FROM events),
            w AS (
              SELECT event_type, c,
                     COUNT(*) OVER win AS n,
                     SUM(c) OVER win AS s,
                     SUM(c * c) OVER win AS q
              FROM b
              WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 14 PRECEDING AND CURRENT ROW))
            SELECT event_type, COUNT(*) AS n_eval,
                   CAST(SUM(CASE WHEN (15*c - s)*(15*c - s)
                                      > 9*(15*q - s*s)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_breach
            FROM w WHERE n = 15
            GROUP BY event_type ORDER BY event_type
        """,
        "copurchase_assortativity": """
            WITH gi AS MATERIALIZED (
              SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
            e AS MATERIALIZED (
              SELECT DISTINCT a.i AS u, b.i AS v
              FROM gi a JOIN gi b ON a.g = b.g AND a.i < b.i),
            deg AS (SELECT node, COUNT(*) AS d FROM
                      (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
                    GROUP BY node),
            s AS (SELECT u AS x, v AS y FROM e
                  UNION ALL SELECT v, u FROM e)
            SELECT COUNT(*) AS m2,
                   CAST(SUM(dx.d * dy.d) AS BIGINT) AS sxy,
                   CAST(SUM(dx.d) AS BIGINT) AS sx,
                   CAST(SUM(dx.d * dx.d) AS BIGINT) AS sx2
            FROM s JOIN deg dx ON dx.node = s.x
                   JOIN deg dy ON dy.node = s.y
        """,
        "part_common_neighbors": """
            WITH gi AS MATERIALIZED (
              SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem),
            e AS MATERIALIZED (
              SELECT DISTINCT a.i AS u, b.i AS v
              FROM gi a JOIN gi b ON a.g = b.g AND a.i < b.i),
            deg AS (SELECT node, COUNT(*) AS d FROM
                      (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
                    GROUP BY node),
            csym AS (
              SELECT c, nbr FROM
                (SELECT u AS c, v AS nbr FROM e
                 UNION ALL SELECT v, u FROM e)
              WHERE c IN (SELECT node FROM deg WHERE d <= 48)),
            w AS (SELECT a.nbr AS x, b.nbr AS y, COUNT(*) AS cn
                  FROM csym a JOIN csym b
                    ON a.c = b.c AND a.nbr < b.nbr
                  GROUP BY 1, 2)
            SELECT x, y, CAST(cn AS BIGINT) AS cn FROM w
            WHERE NOT EXISTS (SELECT 1 FROM e
                              WHERE e.u = w.x AND e.v = w.y)
            ORDER BY cn DESC, x, y LIMIT 20
        """,
        "event_value_ks": """
            WITH h AS (
              SELECT event_type,
                     CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
                     COUNT(*) AS c
              FROM events WHERE event_type IN ('purchase', 'click')
              GROUP BY 1, 2),
            p AS (SELECT cents, c FROM h WHERE event_type = 'purchase'),
            k AS (SELECT cents, c FROM h WHERE event_type = 'click'),
            n AS (SELECT (SELECT COALESCE(SUM(c), 0) FROM p) AS n1,
                         (SELECT COALESCE(SUM(c), 0) FROM k) AS n2),
            j AS (SELECT COALESCE(p.cents, k.cents) AS cents,
                         COALESCE(p.c, 0) AS c1, COALESCE(k.c, 0) AS c2
                  FROM p FULL JOIN k ON p.cents = k.cents),
            cum AS (SELECT SUM(c1) OVER (ORDER BY cents) AS f1,
                           SUM(c2) OVER (ORDER BY cents) AS f2
                    FROM j)
            SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
                   CAST(MAX(ABS(f1 * n.n2 - f2 * n.n1)) AS BIGINT) AS ks_num
            FROM cum, n GROUP BY n.n1, n.n2
        """,
        "events_ipc_roundtrip": """
            SELECT event_type, COUNT(*) AS n,
                   SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
            FROM events GROUP BY event_type
        """,
        "fk_violation_audit": """
            WITH r AS (
              SELECT 'customer.c_nationkey->nation' AS relation,
                     (SELECT COUNT(*) FROM customer) AS n_child,
                     (SELECT COUNT(*) FROM customer c
                      WHERE c.c_nationkey IS NOT NULL AND NOT EXISTS
                        (SELECT 1 FROM nation n
                         WHERE n.n_nationkey = c.c_nationkey)) AS n_orphans
              UNION ALL
              SELECT 'events.user_id->customer',
                     (SELECT COUNT(*) FROM events),
                     (SELECT COUNT(*) FROM events e
                      WHERE e.user_id IS NOT NULL AND NOT EXISTS
                        (SELECT 1 FROM customer c
                         WHERE c.c_custkey = e.user_id))
              UNION ALL
              SELECT 'lineitem.l_orderkey->orders',
                     (SELECT COUNT(*) FROM lineitem),
                     (SELECT COUNT(*) FROM lineitem l
                      WHERE l.l_orderkey IS NOT NULL AND NOT EXISTS
                        (SELECT 1 FROM orders o
                         WHERE o.o_orderkey = l.l_orderkey))
              UNION ALL
              SELECT 'lineitem.l_partkey->part',
                     (SELECT COUNT(*) FROM lineitem),
                     (SELECT COUNT(*) FROM lineitem l
                      WHERE l.l_partkey IS NOT NULL AND NOT EXISTS
                        (SELECT 1 FROM part p
                         WHERE p.p_partkey = l.l_partkey))
              UNION ALL
              SELECT 'lineitem.l_suppkey->supplier',
                     (SELECT COUNT(*) FROM lineitem),
                     (SELECT COUNT(*) FROM lineitem l
                      WHERE l.l_suppkey IS NOT NULL AND NOT EXISTS
                        (SELECT 1 FROM supplier s
                         WHERE s.s_suppkey = l.l_suppkey))
              UNION ALL
              SELECT 'orders.o_custkey->customer',
                     (SELECT COUNT(*) FROM orders),
                     (SELECT COUNT(*) FROM orders o
                      WHERE o.o_custkey IS NOT NULL AND NOT EXISTS
                        (SELECT 1 FROM customer c
                         WHERE c.c_custkey = o.o_custkey)))
            SELECT relation, CAST(n_child AS BIGINT) AS n_child,
                   CAST(n_orphans AS BIGINT) AS n_orphans
            FROM r ORDER BY relation
        """,
        "source_p95_median": """
            WITH q AS (SELECT source,
                              quantile_disc(n_chars, 0.95) AS p95
                       FROM documents GROUP BY source)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
                   CAST(quantile_disc(p95, 0.5) AS BIGINT) AS median_p95
            FROM q
        """,
        "quantile_norm_chars": """
            WITH nn AS (SELECT COUNT(*) AS n FROM documents),
            r AS (SELECT doc_id,
                         ROW_NUMBER() OVER (PARTITION BY source
                                            ORDER BY n_chars, doc_id) AS r,
                         COUNT(*) OVER (PARTITION BY source) AS ns
                  FROM documents),
            g AS (SELECT n_chars AS v,
                         ROW_NUMBER() OVER (ORDER BY n_chars) AS gr
                  FROM documents)
            SELECT r.doc_id, CAST(g.v AS BIGINT) AS norm_chars
            FROM r CROSS JOIN nn
            JOIN g ON g.gr = (r.r * nn.n + r.ns - 1) // r.ns
            ORDER BY doc_id
        """,
        "embedding_knn_join_q8": """
            WITH qz AS (
              SELECT vec_id, list_transform(embedding,
                e -> LEAST(GREATEST(CAST(FLOOR(CAST(e AS DOUBLE) * 127
                          + 0.5) AS BIGINT), -127), 127)) AS qe
              FROM embeddings
            ), sc AS (
              SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
                     CAST(list_sum(list_transform(list_zip(a.qe, b.qe),
                       p -> p[1] * p[2])) AS BIGINT) AS score_q
              FROM qz a JOIN qz b ON a.vec_id <> b.vec_id
            )
            SELECT vec_id, neighbor_id, score_q, rank FROM (
              SELECT vec_id, neighbor_id, score_q,
                     CAST(ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY score_q DESC, neighbor_id ASC) AS BIGINT)
                       AS rank
              FROM sc
            ) WHERE rank <= 3 ORDER BY vec_id, rank
        """,
    }
