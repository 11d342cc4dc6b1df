"""Unit tests for timberjack_ray.functions.corpus (round-2 operator batch)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from timberjack_ray.functions import corpus


def poly_ref(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 1000003 + ord(ch)) % (1 << 64)
    return h - (1 << 64) if h >= (1 << 63) else h


def test_content_hash_matches_reference_fold():
    texts = ["abc", "", "hello world", "a", None, "héllo ünïcode", "日本語テキスト"]
    out = corpus.add_content_hash(pa.table({"text": pa.array(texts, pa.string())}))
    assert out["chash"].to_pylist() == [poly_ref(t or "") for t in texts]


def test_content_hash_sliced_and_chunked_input():
    texts = [f"doc {i} body" for i in range(20)]
    arr = pa.chunked_array([texts[:7], texts[7:]])
    out = corpus.add_content_hash(pa.table({"text": arr}))
    assert out["chash"].to_pylist() == [poly_ref(t) for t in texts]
    sl = pa.table({"text": pa.array(texts).slice(5, 9)})
    assert corpus.add_content_hash(sl)["chash"].to_pylist() == \
        [poly_ref(t) for t in texts[5:14]]


def test_content_hash_empty_batch():
    out = corpus.add_content_hash(pa.table({"text": pa.array([], pa.string())}))
    assert out.num_rows == 0


def test_bigram_partial_never_crosses_doc_boundary():
    t = pa.table({"text": ["a b c", "x", "b c", "", "c a"]})
    b = corpus.bigram_counts_partial(t)
    got = dict(zip(b["bigram"].to_pylist(), b["n"].to_pylist()))
    # "" splits to [""], single word, no bigram; "c|a" pair never forms across docs
    assert got == {"a b": 1, "b c": 2, "c a": 1}


def test_hash_sample_mask_deterministic_and_unbiased():
    ids = np.arange(100_000)
    m1 = corpus.hash_sample_mask(ids, 1024)  # 25%
    m2 = corpus.hash_sample_mask(ids, 1024)
    assert (m1 == m2).all()
    assert abs(m1.mean() - 0.25) < 0.01
    # subset-stability: a partition sees the same decisions
    assert (corpus.hash_sample_mask(ids[40_000:], 1024) == m1[40_000:]).all()


def pack_ref(sizes, budget):
    bins, b, fill = [], 0, 0
    for s in sizes:
        if fill > 0 and fill + s > budget:
            b, fill = b + 1, 0
        bins.append(b)
        fill += s
    return bins


@pytest.mark.parametrize("sizes,budget", [
    ([3, 3, 3, 3], 6),
    ([10, 1, 1], 5),          # oversized head gets its own bin
    ([5], 5),
    ([2, 5, 2, 5, 2], 7),
    ([300, 1, 300], 256),     # every oversized item isolated
])
def test_pack_sequences_greedy_semantics(ray_session, sizes, budget):
    import ray.data as rd

    t = pa.table({
        "source": ["s"] * len(sizes),
        "doc_id": list(range(len(sizes))),
        "n_tok": sizes,
    })
    out = corpus.pack_sequences(rd.from_arrow(t), "source", "doc_id", "n_tok",
                                budget=budget)
    assert out["pack_bin"].tolist() == pack_ref(sizes, budget)
    # budget is respected except for single oversized items
    per_bin = out.groupby("pack_bin")["n_tok"].agg(["sum", "count"])
    over = per_bin[per_bin["sum"] > budget]
    assert (over["count"] == 1).all()


def test_pack_sequences_parallel_groups(ray_session):
    import ray.data as rd

    t = pa.table({
        "source": ["a", "b"] * 10,
        "doc_id": list(range(20)),
        "n_tok": [4] * 20,
    })
    out = corpus.pack_sequences(rd.from_arrow(t), "source", "doc_id", "n_tok",
                                budget=8)
    for src in ("a", "b"):
        g = out[out["source"] == src]
        assert g["pack_bin"].tolist() == pack_ref([4] * 10, 8)


def test_pack_sequences_sharded_matches_reference_rule(ray_session):
    """n_shards>1: bins replay 'greedy per (source, shard) + prefix-sum
    base' exactly — the 100-TB path (VERDICT r3 #1)."""
    import ray.data as rd

    from timberjack_ray.functions.corpus import _POW32, KNUTH32

    rng = np.random.default_rng(11)
    n = 600
    src = np.repeat(["a", "b", "c"], n // 3)
    doc = np.arange(n, dtype=np.int64)
    tok = rng.integers(1, 40, n).astype(np.int64)
    t = pa.table({"source": src, "doc_id": doc, "n_tok": tok})
    S, B = 4, 64
    out = corpus.pack_sequences(rd.from_arrow(t).repartition(5),
                                "source", "doc_id", "n_tok",
                                budget=B, n_shards=S)
    # reference: same rule in plain python
    shard = ((doc.astype(np.uint64) * np.uint64(KNUTH32)) % np.uint64(_POW32)
             % np.uint64(S)).astype(np.int64)
    ref = {}
    for s in ("a", "b", "c"):
        base = 0
        for sh in range(S):
            m = (src == s) & (shard == sh)
            ids = doc[m]           # already doc_id-sorted
            bins = pack_ref(tok[m].tolist(), B)
            for d, b in zip(ids, bins):
                ref[d] = base + b
            base += (max(bins) + 1) if bins else 0
    got = dict(zip(out["doc_id"], out["pack_bin"]))
    assert got == ref
    # bins are dense per source: 0..n_bins-1 with no holes
    for s in ("a", "b", "c"):
        bs = sorted(set(out[out["source"] == s]["pack_bin"]))
        assert bs == list(range(len(bs)))


def test_pack_sequences_max_group_rows_guard(ray_session):
    """One giant group: unsharded packing must trip the per-task row
    guard; sharding the same input under the same guard must pass."""
    import ray.data as rd

    n = 4000
    t = pa.table({"source": ["hot"] * n,
                  "doc_id": np.arange(n, dtype=np.int64),
                  "n_tok": np.full(n, 5, dtype=np.int64)})
    with pytest.raises(Exception, match="max_group_rows"):
        corpus.pack_sequences(rd.from_arrow(t), "source", "doc_id", "n_tok",
                              budget=64, max_group_rows=1500)
    out = corpus.pack_sequences(rd.from_arrow(t), "source", "doc_id",
                                "n_tok", budget=64, n_shards=4,
                                max_group_rows=1500)
    assert len(out) == n
    # still dense bins and budget respected
    per_bin = out.groupby("pack_bin")["n_tok"].sum()
    assert (per_bin <= 64).all()


def test_interarrival_stats_sorted_diffs(ray_session):
    import ray.data as rd

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:10", "2024-01-01 00:00:10",
         "2024-01-01 00:01:00"]).astype("datetime64[us]")
    t = pa.Table.from_pandas(pd.DataFrame({
        "user_id": [1, 1, 1, 1], "ts": ts}), preserve_index=False)
    out = corpus.interarrival_stats(rd.from_arrow(t), "user_id", "ts")
    assert out.iloc[0]["n_gaps"] == 3
    assert out.iloc[0]["sum_gap_us"] == 60_000_000   # telescopes to last-first
    assert out.iloc[0]["max_gap_us"] == 50_000_000
    # singleton users are dropped
    t2 = pa.Table.from_pandas(pd.DataFrame({
        "user_id": [7], "ts": ts[:1]}), preserve_index=False)
    out2 = corpus.interarrival_stats(rd.from_arrow(t2), "user_id", "ts")
    assert len(out2) == 0


def test_template_counts_normalizes_digit_runs(ray_session):
    import ray.data as rd

    t = pa.table({"msg": ['{"k": 42}', '{"k": 7}', 'no digits', '{"j": 1, "k": 22}']})
    out = corpus.template_counts(rd.from_arrow(t), "msg")
    got = dict(zip(out["template"], out["n"]))
    assert got == {'{"k": #}': 2, "no digits": 1, '{"j": #, "k": #}': 1}


def test_rebalance_sources_uniformizes_token_shares(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(9)
    n = 4000
    # source 'big' holds ~8x the tokens of 'small'
    src = np.where(rng.random(n) < 0.8, "big", "small")
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "source": pa.array(src),
        "text": pa.array(["w " * 9 + "w" if s == "big" else "w w"
                          for s in src]),
    })
    kept = corpus.rebalance_sources(rd.from_arrow(t).repartition(4)).to_pandas()
    kept["tok"] = kept["text"].str.count(" ") + 1
    shares = kept.groupby("source")["tok"].sum()
    # under-represented source passes through whole (never up-sampled)…
    assert shares["small"] == (src == "small").sum() * 2
    # …while the over-represented one shrinks to ~the uniform target T/k
    total = ((src == "big").sum() * 10 + (src == "small").sum() * 2)
    target = total / 2
    assert abs(shares["big"] - target) / target < 0.10  # hash-mask noise
    # deterministic: second run keeps the identical rows
    kept2 = corpus.rebalance_sources(rd.from_arrow(t).repartition(7)).to_pandas()
    assert sorted(kept2["doc_id"]) == sorted(kept["doc_id"])


def test_top_discriminative_term_tie_order(ray_session):
    import ray.data as rd

    # doc 0: "x" tf=2 wins on tf; doc 1: "q" and "z" tf=1 but df(q)=1 < df(z)=2
    t = pa.table({"doc_id": [0, 1, 2],
                  "text": ["x x z", "q z", "z q q"]})
    out = corpus.top_discriminative_term(rd.from_arrow(t), "doc_id", "text")
    assert out["term"].tolist() == ["x", "q", "q"]


def test_bucket_hash_join_matches_pandas_merge(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import bucket_hash_join

    rng = np.random.RandomState(7)
    left = pd.DataFrame({"k": rng.randint(0, 50, 200),
                         "a": rng.randint(0, 1000, 200)})
    right = pd.DataFrame({"k2": rng.randint(0, 50, 300),
                          "b": rng.randint(0, 1000, 300)})
    joined = bucket_hash_join(
        rd.from_pandas(left), rd.from_pandas(right), "k", "k2",
        left_cols=["a"], right_cols=["b"], n_buckets=8).to_pandas()
    exp = left.merge(right, left_on="k", right_on="k2")[["k", "a", "b"]]
    got = joined[["k", "a", "b"]]  # key surfaces under its left-side name
    key = lambda d: d.sort_values(["k", "a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        key(got).astype("int64"), key(exp).astype("int64"))


def test_bucket_hash_join_rejects_column_collision(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import bucket_hash_join

    df = pd.DataFrame({"k": [1], "x": [2]})
    with pytest.raises(ValueError):
        bucket_hash_join(rd.from_pandas(df), rd.from_pandas(df), "k", "k",
                         left_cols=["x"], right_cols=["x"])


def test_grouped_quantiles_type1_semantics(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import grouped_quantiles

    df = pd.DataFrame({"g": ["a"] * 4 + ["b"] * 5,
                       "v": [1.0, 2.0, 3.0, 4.0, 10.0, 20.0, 30.0, 40.0, 50.0]})
    out = grouped_quantiles(rd.from_pandas(df), "g", "v", [0.5, 0.9], scale=1)
    got = {(r["g"], r["q"]): r["value_scaled"] for _, r in out.iterrows()}
    # type-1/lower quantile: rank = ceil(q*n)
    assert got == {("a", 0.5): 2, ("a", 0.9): 4, ("b", 0.5): 30, ("b", 0.9): 50}


def test_rolling_sum_per_key_window_and_ties(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import rolling_sum_per_key

    ts = pd.to_datetime(["2024-01-01"] * 2 + ["2024-01-02", "2024-01-03"]) \
        .astype("datetime64[us]")
    df = pd.DataFrame({"u": [1, 1, 1, 1], "ts": ts,
                       "id": [2, 1, 3, 4], "v": [1.0, 2.0, 4.0, 8.0]})
    out = rolling_sum_per_key(rd.from_pandas(df), "u", "ts", "id", "v",
                              window=2, scale=1)
    # tie on ts broken by id asc: order = id1(2), id2(1), id3(4), id4(8)
    got = dict(zip(out["id"], out["roll_sum"]))
    assert got == {1: 2, 2: 3, 3: 5, 4: 12}


def test_bucket_hash_join_left_outer_null_matches(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import bucket_hash_join

    left = pd.DataFrame({"k": [1, 2, 3, 4], "a": [10, 20, 30, 40]})
    right = pd.DataFrame({"k2": [2, 2, 4], "b": [7, 8, 9]})
    out = bucket_hash_join(rd.from_pandas(left), rd.from_pandas(right),
                           "k", "k2", left_cols=["a"], right_cols=["b"],
                           n_buckets=4, join_type="left outer").to_pandas()
    # unmatched left rows survive with null b; matched expand per right row
    assert len(out) == 5  # k=1(null), k=2 x2, k=3(null), k=4 x1
    nulls = out[out["b"].isna()]["k"].sort_values().tolist()
    assert nulls == [1, 3]


def test_interarrival_segmented_matches_pandas_reference(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(11)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.randint(0, 120, n),
        "ts": pd.to_datetime(rng.randint(0, 10**9, n) * 1000, unit="us")
        .astype("datetime64[us]"),
    })
    out = corpus.interarrival_stats(rd.from_pandas(df), "user_id", "ts",
                                    n_buckets=16)
    epoch = df["ts"].astype("int64")
    ref_rows = []
    for u, g in df.assign(e=epoch).groupby("user_id"):
        if len(g) < 2:
            continue
        d = np.diff(np.sort(g["e"].to_numpy()))
        ref_rows.append((u, len(d), int(d.sum()), int(d.max())))
    ref = pd.DataFrame(ref_rows, columns=["user_id", "n_gaps", "sum_gap_us",
                                          "max_gap_us"]).sort_values("user_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(out.astype("int64"), ref.astype("int64"))


def test_rolling_segmented_matches_pandas_reference(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import rolling_sum_per_key

    rng = np.random.RandomState(13)
    n = 2500
    df = pd.DataFrame({
        "u": rng.randint(0, 80, n),
        "ts": pd.to_datetime(rng.randint(0, 10**7, n) * 1000, unit="us")
        .astype("datetime64[us]"),
        "id": np.arange(n),
        "v": rng.rand(n) * 100,
    })
    out = rolling_sum_per_key(rd.from_pandas(df), "u", "ts", "id", "v",
                              window=4, scale=100, n_buckets=8)
    cents = np.round(df["v"].to_numpy() * 100).astype(np.int64)
    ref = df.assign(c=cents).sort_values(["u", "ts", "id"])
    ref["roll_sum"] = ref.groupby("u")["c"].transform(
        lambda s: s.rolling(4, min_periods=1).sum()).astype("int64")
    ref = ref[["id", "roll_sum"]].sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out.astype("int64"), ref.astype("int64"))


def test_content_hash_property_random_unicode():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.lists(st.one_of(st.none(), st.text(max_size=40)), max_size=12))
    def check(texts):
        out = corpus.add_content_hash(
            pa.table({"text": pa.array(texts, pa.string())}))
        assert out["chash"].to_pylist() == [poly_ref(t or "") for t in texts]

    check()


def test_corpus_ops_empty_inputs(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string()),
                  "source": pa.array([], pa.string())})
    ds = rd.from_arrow(t)
    assert len(corpus.bigram_topk(ds)) == 0
    assert len(corpus.doc_frequency(ds)) == 0
    assert len(corpus.template_counts(ds, "text")) == 0
    assert len(corpus.rare_bigram_counts(ds)) == 0
    assert len(corpus.top_discriminative_term(ds)) == 0
    assert len(corpus.hash_sample(ds, "doc_id", 819).to_pandas()) == 0
    slim = pa.table({"source": pa.array([], pa.string()),
                     "doc_id": pa.array([], pa.int64()),
                     "n_tok": pa.array([], pa.int64())})
    assert len(corpus.pack_sequences(rd.from_arrow(slim), "source", "doc_id",
                                     "n_tok", 256)) == 0


def test_flagship_job_entrypoint(ray_session, tmp_path):
    """jobs/flagship_job.py (the `ray job submit` entry) runs against an
    existing Ray session and prints one JSON metrics line."""
    import json

    from timberjack_ray.data import synth

    seq_dir = str(tmp_path / "seqs")
    synth.generate_sequences(2000, seq_dir, json_frac=0.3, rows_per_file=1000)
    sys_path = str(tmp_path / "out")
    import jobs.flagship_job as job
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = job.main(["--input", f"{seq_dir}/part-*.parquet",
                       "--out-dir", sys_path, "--num-partitions", "4"])
    assert rc == 0
    m = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert m["rows"] == 2000 and m["levels"]


def test_chunk_documents_boundaries(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.corpus import chunk_documents

    texts = [
        " ".join(f"w{i}" for i in range(10)),  # nw=10 > window → 3 chunks
        "a b c",                               # nw=3 <= window → 1 chunk
        "",                                    # splits to one empty word → 1 chunk
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(texts)})).repartition(2)
    out = chunk_documents(ds, window=4, stride=3).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    d0 = out[out.doc_id == 0]
    assert d0["chunk_text"].tolist() == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9"]
    assert d0["n_words"].tolist() == [4, 4, 4]
    assert out[out.doc_id == 1]["chunk_text"].tolist() == ["a b c"]
    assert out[out.doc_id == 2]["n_words"].tolist() == [1]  # [""] word

    with pytest.raises(ValueError):
        chunk_documents(ds, window=4, stride=5)


def test_chunk_documents_truncated_tail(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.corpus import chunk_documents

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array([" ".join(f"t{i}" for i in range(9))])}))
    out = chunk_documents(ds, window=4, stride=4).to_pandas() \
        .sort_values("chunk_id")
    # nw=9: chunks at 0,4,8 — last truncates to 1 word
    assert out["n_words"].tolist() == [4, 4, 1]
    assert out["chunk_text"].tolist()[-1] == "t8"


def test_budget_sample_prefix_and_determinism(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.corpus import KNUTH32, _POW32, budget_sample

    n = 90
    t = pa.table({
        "source": pa.array([f"s{i % 3}" for i in range(n)]),
        "doc_id": pa.array(range(n), pa.int64()),
        "w": pa.array([10 + (i % 5) for i in range(n)], pa.int64()),
    })
    out = budget_sample(rd.from_arrow(t).repartition(4), "source", "w",
                        "doc_id", budget=100).to_pandas()
    df = t.to_pandas()
    df["h"] = (df["doc_id"].astype("uint64") * np.uint64(KNUTH32)) % np.uint64(_POW32)
    for s, g in df.groupby("source"):
        g = g.sort_values(["h", "doc_id"])
        exp = g[g["w"].cumsum() <= 100]["doc_id"].tolist()
        got = out[out["source"] == s]["doc_id"].tolist()
        assert sorted(got) == sorted(exp)
        assert sum(out[out["source"] == s]["w"]) <= 100


def test_corpus_diff_counts_planted(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from timberjack_ray.functions.corpus import corpus_diff_counts

    old = rd.from_arrow(pa.table({"text": ["a", "b", "b", "c"]}))
    new = rd.from_arrow(pa.table({"text": ["b", "c", "d", "d", "e"]}))
    out = corpus_diff_counts(old, new)
    got = dict(zip(out["status"], out["n_contents"]))
    # distinct: old {a,b,c}, new {b,c,d,e} -> added {d,e}, removed {a},
    # common {b,c}
    assert got == {"added": 2, "removed": 1, "common": 2}


def test_corpus_diff_counts_disjoint(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from timberjack_ray.functions.corpus import corpus_diff_counts

    old = rd.from_arrow(pa.table({"text": ["x"]}))
    new = rd.from_arrow(pa.table({"text": ["y"]}))
    out = corpus_diff_counts(old, new)
    got = dict(zip(out["status"], out["n_contents"]))
    assert got == {"added": 1, "removed": 1}  # no 'common' row emitted


def test_source_vocab_overlap_planted(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.corpus import source_vocab_overlap

    docs = [("s1", "a b c"), ("s1", "c d"), ("s2", "c d e"),
            ("s3", "zz"), ("s2", "a")]
    ds = rd.from_arrow(pa.table({"source": [d[0] for d in docs],
                                 "text": [d[1] for d in docs]}))
    out = source_vocab_overlap(ds)
    # vocab: s1={a,b,c,d}, s2={a,c,d,e}, s3={zz}; zero-overlap pairs omitted
    assert out.values.tolist() == [["s1", "s2", 3, 5]]


def test_pack_sequences_sharded_rejects_string_order(ray_session):
    import ray.data as rd

    t = pa.table({"source": ["a", "a"], "doc_id": ["x", "y"],
                  "n_tok": [1, 2]})
    with pytest.raises(Exception, match="integer order"):
        corpus.pack_sequences(rd.from_arrow(t), "source", "doc_id",
                              "n_tok", budget=8, n_shards=2)


# --- round-4 batch: skip-grams, PMI pairs, TTR ------------------------------

def _docs_ds(texts, extra=None):
    import ray

    cols = {"text": texts}
    if extra:
        cols.update(extra)
    return ray.data.from_pandas(pd.DataFrame(cols))


def _naive_skipgrams(texts, gaps):
    from collections import Counter
    c = Counter()
    for t in texts:
        w = t.split(" ")
        for g in gaps:
            for i in range(len(w) - g):
                c[(w[i], w[i + g], g)] += 1
    return c


def test_skipgram_topk_matches_naive(ray_session):
    rng = np.random.default_rng(7)
    vocab = list("abcdefgh")
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 12)))
             for _ in range(60)]
    out = corpus.skipgram_topk(_docs_ds(texts), k=1000, gaps=(2, 3))
    naive = _naive_skipgrams(texts, (2, 3))
    got = {(r.w1, r.w2, r.gap): r.n for r in out.itertuples(index=False)}
    assert got == dict(naive)
    # tie-break ordering: n desc, then w1/w2/gap asc
    keys = list(zip(-out["n"], out["w1"], out["w2"], out["gap"]))
    assert keys == sorted(keys)


def test_skipgram_pairs_never_cross_docs(ray_session):
    # two docs of 2 words each: no gap-2/3 pair exists inside either
    out = corpus.skipgram_topk(_docs_ds(["a b", "c d"]), k=10, gaps=(2, 3))
    assert len(out) == 0


def test_pmi_top_pairs_matches_naive(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(9)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 10)))
             for _ in range(80)]
    v, k = 5, 100
    out = corpus.pmi_top_pairs(_docs_ds(texts), v=v, k=k)

    # naive reference: doc frequency, top-v vocab, doc-distinct pairs
    from collections import Counter
    df = Counter()
    for t in texts:
        for w in set(t.split(" ")):
            df[w] += 1
    top = sorted(df.items(), key=lambda x: (-x[1], x[0]))[:v]
    vs = {w for w, _ in top}
    dfs = dict(top)
    c_ab = Counter()
    for t in texts:
        ws = sorted(set(t.split(" ")) & vs)
        for i in range(len(ws)):
            for j in range(i + 1, len(ws)):
                c_ab[(ws[i], ws[j])] += 1
    n = len(texts)
    want = {(a, b): (cnt, cnt * n * 1_000_000 // (dfs[a] * dfs[b]))
            for (a, b), cnt in c_ab.items()}
    got = {(r.wa, r.wb): (r.c_ab, r.score_ppm)
           for r in out.itertuples(index=False)}
    assert got == want


def test_ttr_by_group_matches_naive(ray_session):
    texts = ["a b b c", "a a", "x y", "x x x"]
    srcs = ["s1", "s1", "s2", "s2"]
    out = corpus.ttr_by_group(_docs_ds(texts, {"source": srcs}), "source")
    assert out.to_dict("list") == {
        "source": ["s1", "s2"], "n_tokens": [6, 5], "n_types": [3, 2]}


def test_quantile_normalize_matches_duckdb_window_replay(ray_session):
    """quantile_normalize_ds == the ROW_NUMBER/order-statistics SQL on
    random data with ties, singleton groups, and skewed group sizes."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.corpus import quantile_normalize_ds

    rng = np.random.default_rng(11)
    for trial in range(3):
        n = int(rng.integers(20, 400))
        df = pd.DataFrame({
            "grp": rng.choice(["a", "b", "c", "solo"][: int(rng.integers(2, 5))],
                              size=n, p=None),
            "val": rng.integers(0, 12, size=n).astype(np.int64),
            "rid": np.arange(n, dtype=np.int64)})
        # force one singleton group
        df.loc[n - 1, "grp"] = "zz_single"
        got = quantile_normalize_ds(
            rd.from_pandas(df).repartition(4), "grp", "val", "rid",
            out_col="norm", n_buckets=4).to_pandas() \
            .sort_values("rid").reset_index(drop=True)
        exp = duckdb.connect().execute("""
            WITH nn AS (SELECT COUNT(*) AS n FROM df),
            r AS (SELECT rid, ROW_NUMBER() OVER (PARTITION BY grp
                               ORDER BY val, rid) AS r,
                         COUNT(*) OVER (PARTITION BY grp) AS ns FROM df),
            g AS (SELECT val AS v, ROW_NUMBER() OVER (ORDER BY val) AS gr
                  FROM df)
            SELECT r.rid, g.v AS norm FROM r CROSS JOIN nn
            JOIN g ON g.gr = (r.r * nn.n + r.ns - 1) // r.ns
            ORDER BY rid""").df()
        assert (got["norm"].to_numpy() == exp["norm"].to_numpy()).all(), trial
    # post-condition: every group's normalized multiset is a global
    # quantile sample — identical across equal-size groups
    m = 60
    df = pd.DataFrame({
        "grp": np.repeat(["x", "y", "z"], m),
        "val": rng.integers(0, 1000, size=3 * m).astype(np.int64),
        "rid": np.arange(3 * m, dtype=np.int64)})
    out = quantile_normalize_ds(rd.from_pandas(df), "grp", "val", "rid",
                                out_col="norm").to_pandas()
    j = out.merge(df, on="rid")
    sets = [np.sort(j[j["grp"] == g]["norm"].to_numpy()) for g in "xyz"]
    assert (sets[0] == sets[1]).all() and (sets[1] == sets[2]).all()


def test_priority_sample_bottomk_exact_and_mergeable(ray_session):
    """Bottom-k priority sample: bit-identical to the single-process
    numpy reference under any partitioning, and weight-sensitive (a row
    with overwhelming weight is always drawn)."""
    import ray.data as rd

    from timberjack_ray.functions.corpus import (_splitmix64,
                                                 priority_sample_bottomk)

    rng = np.random.default_rng(3)
    n, k = 5000, 100
    ids = rng.permutation(n).astype(np.int64)
    w = rng.integers(1, 1000, n).astype(np.int64)
    w[ids == 7] = 10_000_000  # overwhelming weight -> certain inclusion
    df = pd.DataFrame({"id": ids, "w": w})

    h = _splitmix64(ids.astype(np.uint64)) >> np.uint64(1)
    p = h.astype(np.int64) // w
    order = np.lexsort((ids, p))[:k]
    ref = pd.DataFrame({"id": ids[order], "w": w[order],
                        "priority": p[order]}).reset_index(drop=True)

    for parts in (1, 9):
        got = priority_sample_bottomk(
            rd.from_pandas(df).repartition(parts), "id", "w", k)
        assert got.equals(ref), parts
    assert 7 in ref["id"].tolist()


def test_rendezvous_census_stability_and_invariance(ray_session):
    """HRW placement: partitioning-invariant census, roughly balanced,
    and MINIMALLY disruptive — going 8 -> 9 shards only moves keys that
    WIN the new shard; every other key keeps its old placement."""
    import ray.data as rd

    from timberjack_ray.functions.corpus import (_splitmix64,
                                                 rendezvous_census)

    keys = np.arange(1, 4001, dtype=np.int64)
    df = pd.DataFrame({"k": keys})
    a = rendezvous_census(rd.from_pandas(df).repartition(1), "k", 8)
    b = rendezvous_census(rd.from_pandas(df).repartition(7), "k", 8)
    assert a.equals(b)
    assert int(a["n_keys"].sum()) == 4000
    assert int(a["key_sum"].sum()) == int(keys.sum())
    assert a["n_keys"].min() > 4000 // 8 * 0.6  # rough balance

    # minimal-disruption law, checked per key against the raw weights
    hk = _splitmix64(keys.astype(np.uint64))
    s8 = _splitmix64(np.arange(1, 9, dtype=np.uint64))
    s9 = _splitmix64(np.arange(1, 10, dtype=np.uint64))
    p8 = np.argmax(_splitmix64(hk[:, None] ^ s8[None, :]), axis=1)
    p9 = np.argmax(_splitmix64(hk[:, None] ^ s9[None, :]), axis=1)
    moved = p8 != p9
    assert (p9[moved] == 8).all()          # movers only go to the new shard
    assert 0 < moved.sum() < len(keys) / 4  # ~1/9 expected


def test_grouped_priority_sample_matches_reference(ray_session):
    """Per-group bottom-k priority sample: bit-identical to the numpy
    reference under any partitioning; groups smaller than k keep all
    rows; heavier rows oversampled within their group."""
    import ray.data as rd

    from timberjack_ray.functions.corpus import (_splitmix64,
                                                 grouped_priority_sample)

    rng = np.random.default_rng(8)
    n, k = 3000, 10
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c", "tiny"],
                        p=[0.4, 0.35, 0.24, 0.01], size=n),
        "id": rng.permutation(n).astype(np.int64),
        "w": rng.integers(1, 500, n).astype(np.int64),
    })
    h = _splitmix64(df["id"].to_numpy().astype(np.uint64)) >> np.uint64(1)
    df["priority"] = h.astype(np.int64) // df["w"].to_numpy()
    ref = df.sort_values(["g", "priority", "id"]).groupby("g").head(k) \
        .reset_index(drop=True)[["g", "id", "w", "priority"]]

    for parts in (1, 7):
        got = grouped_priority_sample(
            rd.from_pandas(df[["g", "id", "w"]]).repartition(parts),
            "g", "id", "w", k)
        assert got.reset_index(drop=True).equals(ref), parts
    tiny_n = (df["g"] == "tiny").sum()
    assert (ref["g"] == "tiny").sum() == min(tiny_n, k)


def test_negative_sample_census_deterministic_no_self(ray_session):
    """Contrastive negatives: partitioning-invariant census, never the
    anchor itself (self-collision probed to +1), all draws in
    [0, n_total), checksum matches the direct numpy replay."""
    import ray.data as rd

    from timberjack_ray.functions.corpus import (_splitmix64,
                                                 negative_sample_census)

    n, k = 1000, 4
    df = pd.DataFrame({"id": np.arange(n, dtype=np.int64),
                       "g": np.where(np.arange(n) % 3 == 0, "a", "b")})
    j = np.arange(k, dtype=np.uint64)
    seed = df["id"].to_numpy()[:, None].astype(np.uint64) \
        * np.uint64(k + 1) + j[None, :] + np.uint64(1)
    cand = (_splitmix64(seed.reshape(-1)) % np.uint64(n)) \
        .astype(np.int64).reshape(-1, k)
    hit = cand == df["id"].to_numpy()[:, None]
    assert hit.any()  # the probe path is actually exercised
    cand = np.where(hit, (cand + 1) % n, cand)
    assert (cand != df["id"].to_numpy()[:, None]).all()
    assert cand.min() >= 0 and cand.max() < n
    want = pd.DataFrame({"g": df["g"], "ns": cand.sum(axis=1)}) \
        .groupby("g").agg(n_triples=("ns", lambda s: len(s) * k),
                          neg_sum=("ns", "sum")).reset_index() \
        .astype({"n_triples": "int64", "neg_sum": "int64"})

    for parts in (1, 6):
        got = negative_sample_census(
            rd.from_pandas(df).repartition(parts), "id", "g", k, n)
        assert got.equals(want), parts
