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


def test_top_discriminative_term_tie_order(ray_session):
    import ray.data as rd

    # doc 0: "x" tf=2 wins on tf; doc 1: "q" and "z" tf=1 but df(q)=1 < df(z)=2
    t = pa.table({"doc_id": [0, 1, 2],
                  "text": ["x x z", "q z", "z q q"]})
    out = corpus.top_discriminative_term(rd.from_arrow(t), "doc_id", "text")
    assert out["term"].tolist() == ["x", "q", "q"]
