"""Round-3 operators: bigram-LM perplexity scoring (rows-only on the
driver, so the oracle lives HERE), chunk-level corpus dedup edge cases, and
interpolated quantiles."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _lm_reference(texts):
    """Independent per-doc implementation: dict counts + python loops."""
    uni, big = {}, {}
    for t in texts:
        ws = t.split(" ")
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    v = len(uni)
    out = []
    for t in texts:
        ws = t.split(" ")
        if len(ws) < 2:
            out.append((0, 0.0))
            continue
        bits = [
            math.log2(uni[a] + v) - math.log2(big[(a, b)] + 1.0)
            for a, b in zip(ws, ws[1:])
        ]
        out.append((len(ws) - 1, float(np.mean(bits))))
    return out


CORPUS = [
    "the cat sat on the mat",
    "the cat sat on the hat",
    "a lone",
    "single",
    "",
    "the the the the",
    "unique words only here now",
]


def test_bigram_lm_scores_match_reference(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.text import bigram_lm_scores

    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(CORPUS))), "text": CORPUS})
    )
    got = (
        bigram_lm_scores(ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = _lm_reference(CORPUS)
    assert got["n_bigrams"].tolist() == [r[0] for r in ref]
    np.testing.assert_allclose(
        got["bits"].to_numpy(), [r[1] for r in ref], rtol=0, atol=1e-12
    )
    # repeated text scores low; unseen-combination text scores high
    assert got.loc[5, "bits"] < got.loc[6, "bits"]


def test_bigram_lm_deterministic_across_runs(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.text import bigram_lm_scores

    ds = rd.from_arrow(
        pa.table({"doc_id": list(range(len(CORPUS))), "text": CORPUS})
    )
    a = bigram_lm_scores(ds).to_pandas().sort_values("doc_id")
    b = bigram_lm_scores(ds).to_pandas().sort_values("doc_id")
    np.testing.assert_array_equal(a["bits"].to_numpy(), b["bits"].to_numpy())


def test_chunk_dedup_planted_duplicates(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.corpus import chunk_dedup, unpack_chunk_ids

    dup = " ".join(f"w{i}" for i in range(10))  # one exact 10-word chunk
    uniq = [" ".join(f"u{d}_{i}" for i in range(10)) for d in range(3)]
    docs = [
        dup + " " + uniq[0],  # doc 0: chunks [dup, uniq0]
        dup + " " + uniq[1],  # doc 1: dup chunk must lose to doc 0
        uniq[2],
        "short doc",  # < 10 words → its own chunk
        "short doc",  # exact duplicate short chunk → loses to doc 3
    ]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(docs))), "text": docs}))
    surv = (
        chunk_dedup(ds, chunk_words=10)
        .map_batches(unpack_chunk_ids, batch_format="pyarrow")
        .to_pandas()
    )
    got = set(map(tuple, surv[["doc_id", "chunk_idx"]].to_numpy()))
    assert got == {(0, 0), (0, 1), (1, 1), (2, 0), (3, 0)}


def test_chunk_dedup_empty_and_boundary(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.corpus import chunk_dedup, unpack_chunk_ids

    docs = ["", "", " ".join(["x"] * 20), " ".join(["x"] * 21)]
    ds = rd.from_arrow(pa.table({"doc_id": [0, 1, 2, 3], "text": docs}))
    surv = (
        chunk_dedup(ds, chunk_words=10)
        .map_batches(unpack_chunk_ids, batch_format="pyarrow")
        .to_pandas()
    )
    got = set(map(tuple, surv[["doc_id", "chunk_idx"]].to_numpy()))
    # "" → one empty chunk, kept once (doc 0).  doc 2 = two identical
    # "x"*10 chunks → only the first survives.  doc 3 adds a trailing
    # 1-word chunk "x" (distinct text from the 10-word chunk).
    assert got == {(0, 0), (2, 0), (3, 2)}


@pytest.mark.parametrize("n", [1, 2, 7, 100])
def test_exact_quantiles_cont_matches_numpy(ray_session, n):
    import ray.data as rd

    from timberjack_ray.functions.sessions import exact_quantiles_cont

    rng = np.random.RandomState(n)
    vals = np.round(rng.uniform(0, 50, size=n), 2)
    ds = rd.from_arrow(pa.table({"value": vals}))
    out = exact_quantiles_cont(ds, "value", [0.25, 0.5, 0.75], scale=100)
    cents = np.floor(vals * 100 + 0.5).astype(np.int64)
    want = [np.percentile(cents, q * 100, method="linear") for q in (0.25, 0.5, 0.75)]
    np.testing.assert_array_equal(out["value_scaled"].to_numpy(), want)


def test_contamination_stats_planted(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.dedup import contamination_stats

    bench = ["alpha beta gamma delta"]  # grams: (a b g), (b g d)
    train = [
        "alpha beta gamma delta epsilon",  # hits both bench grams
        "alpha beta gamma zeta eta",       # hits one (a b g)
        "totally clean words here",        # no hits
        "tiny doc",                        # short-doc whole-text gram, clean
        "alpha beta gamma alpha beta gamma delta",  # repeated gram counted ONCE
    ]
    tds = rd.from_arrow(pa.table({"doc_id": list(range(5)), "text": train}))
    bds = rd.from_arrow(pa.table({"doc_id": [100], "text": bench}))
    out = (
        contamination_stats(tds, bds, k=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 4: 7 words → 5 gram positions but (alpha beta gamma) repeats →
    # 4 DISTINCT grams
    assert out["n_grams"].tolist() == [3, 3, 2, 1, 4]
    assert out["n_hit"].tolist() == [2, 1, 0, 0, 2]


def test_bpe_pair_counts_unicode_and_boundaries(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.text import bpe_pair_counts

    docs = ["ab ab abc", "héé x", ""]
    # pairs: ab×3 (two 'ab' words + prefix of 'abc'), bc×1, hé×1, éé×1;
    # 1-char words ('x') and word boundaries contribute nothing
    ds = rd.from_arrow(pa.table({"text": docs}))
    out = bpe_pair_counts(ds, k=10)
    got = dict(zip(out["pair"], out["n"]))
    assert got == {"ab": 3, "bc": 1, "hé": 1, "éé": 1}
    assert out["pair"].tolist()[0] == "ab"  # top by count


def test_cross_dedup_planted_broadcast_and_distributed(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.dedup import cross_dedup

    base = rd.from_arrow(pa.table({
        "doc_id": [0, 1], "text": ["shared text one", "base only text"]}))
    new = rd.from_arrow(pa.table({
        "doc_id": [10, 11, 12],
        "text": ["shared text one", "fresh crawl text", "another new doc"]}))
    # broadcast path (base under limit)
    surv = cross_dedup(new, base).to_pandas()
    assert sorted(surv["doc_id"]) == [11, 12]
    # distributed path (force the limit to 0 base hashes)
    surv2 = cross_dedup(new, base, base_limit=0).to_pandas()
    assert sorted(surv2["doc_id"]) == [11, 12]


def test_inverted_index_planted(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.corpus import inverted_index

    docs = {
        0: "apple banana apple",   # apple df counts ONCE per doc
        1: "banana cherry",
        2: "banana",
    }
    ds = rd.from_arrow(pa.table({
        "doc_id": list(docs), "text": list(docs.values())}))
    out = inverted_index(ds, cap_postings=2).to_pandas() \
        .sort_values("word").reset_index(drop=True)
    got = {r.word: (r.df, r.postings) for r in out.itertuples()}
    assert got == {"apple": (1, "0"), "banana": (3, "0,1"),
                   "cherry": (1, "1")}
    # df band filter
    banded = inverted_index(ds, min_df=2, max_df=10).to_pandas()
    assert banded["word"].tolist() == ["banana"]


def test_corpus_drift_words_planted(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.text import corpus_drift_words

    a = rd.from_arrow(pa.table({"text": ["x x x common", "common y"]}))
    b = rd.from_arrow(pa.table({"text": ["common z z", "common"]}))
    out = corpus_drift_words(a, b, k=3)
    got = {r.word: (r.n_a, r.n_b) for r in out.itertuples()}
    # diffs: x 3-0, z 0-2, y 1-0 / common 2-2 (diff 0, excluded at k=3)
    assert got == {"x": (3, 0), "z": (0, 2), "y": (1, 0)}
    assert out["word"].tolist() == ["x", "z", "y"]  # |diff| desc, word asc


def test_dup_span_positions_planted(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.dedup import dup_span_positions

    span = " ".join(f"s{i}" for i in range(8))
    docs = [
        span + " tailA tailB tailC",          # dup span at pos 0
        "headX headY " + span,                # same span at pos 2
        " ".join(f"u{i}" for i in range(12)),  # all-unique spans
        "short doc under eight words here",   # < 8 words → no spans
        " ".join(["r"] * 10),                 # self-repeat: pos 0,1,2 identical
    ]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(5)), "text": docs}))
    out = dup_span_positions(ds, span_words=8).to_pandas()
    got = set(map(tuple, out[["doc_id", "pos"]].to_numpy()))
    assert got == {(0, 0), (1, 2), (4, 0), (4, 1), (4, 2)}


def test_dup_span_positions_exact_k_word_doc(ray_session):
    """Boundary (r03 review): a doc of EXACTLY span_words words must share
    the window hash namespace with the same sequence inside a longer doc —
    the oracle windows every doc with nw >= span_words uniformly."""
    import ray.data as rd

    from timberjack_ray.functions.dedup import dup_span_positions

    span = " ".join(f"s{i}" for i in range(8))
    docs = [span, "head " + span]  # 8-word doc + 9-word doc containing it
    ds = rd.from_arrow(pa.table({"doc_id": [0, 1], "text": docs}))
    out = dup_span_positions(ds, span_words=8).to_pandas()
    got = set(map(tuple, out[["doc_id", "pos"]].to_numpy()))
    assert got == {(0, 0), (1, 1)}


def test_typo_pairs_planted(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.text import typo_pairs

    vals = ["cat", "cart", "bat", "cat", "dog", "dig", "abc", "bca",
            "same", "same"]
    # lev==1: cat-cart (insert), cat-bat (sub), dog-dig (sub);
    # abc-bca share deletion key 'bc' but lev=2 → verify must drop it;
    # duplicates ('cat','same') must not self-pair
    ds = rd.from_arrow(pa.table({"name": vals}))
    out = typo_pairs(ds, "name")
    got = set(map(tuple, out[["a", "b"]].to_numpy()))
    assert got == {("cart", "cat"), ("bat", "cat"), ("dig", "dog")}


def test_remove_dup_spans_planted(ray_session):
    """Application pass: global-first occurrence kept, all others excised;
    overlapping deletions union; short docs untouched; a fully-duplicated
    exactly-8-word doc empties out."""
    import ray.data as rd

    from timberjack_ray.functions.dedup import remove_dup_spans

    span = " ".join(f"s{i}" for i in range(8))
    docs = [
        span + " tailA tailB",   # global first -> kept verbatim
        "headX headY " + span,   # span excised
        span,                    # exactly 8 words, duplicate -> ""
        "short doc here",        # < 8 words -> untouched
        " ".join(["r"] * 10),    # self-repeat: ranges [1,9)+[2,10) union
    ]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(5)), "text": docs}))
    out = remove_dup_spans(ds, span_words=8).to_pandas() \
        .sort_values("doc_id")["text"].tolist()
    assert out == [span + " tailA tailB", "headX headY", "",
                   "short doc here", "r"]


def test_bpe_train_sennrich_merges(ray_session):
    """Hand-computed merge table on the classic Sennrich corpus, incl. the
    (e,s)/(s,t) count-9 tie broken pair-asc and the greedy non-overlap rule."""
    import ray.data as rd

    from timberjack_ray.functions.text import bpe_train

    docs = [("low " * 5 + "lower " * 2).strip(),
            ("newest " * 6 + "widest " * 3).strip()]
    ds = rd.from_arrow(pa.table({"text": docs}))
    out = bpe_train(ds, n_merges=4)
    assert out[["left", "right", "n"]].values.tolist() == [
        ["e", "s", 9], ["es", "t", 9], ["l", "o", 7], ["lo", "w", 7]]
    assert out.attrs["mode"] == "exact"
    # greedy left-to-right non-overlap: aaaa -> aa+aa (runs keep even offsets)
    ds2 = rd.from_arrow(pa.table({"text": ["aaaa aaaa"]}))
    out2 = bpe_train(ds2, n_merges=5)
    assert out2[["left", "right", "n"]].values.tolist() == [
        ["a", "a", 6], ["aa", "aa", 2]]  # stops early: no pair >= min_count


def test_bpe_encoder_fertility(ray_session):
    """Train-then-apply round trip on the Sennrich corpus: learned merges
    (es, est, lo, low) give low→1, lower→3, newest→4, widest→4 tokens."""
    import ray.data as rd

    from timberjack_ray.functions.text import BpeEncoder, bpe_train

    docs = [("low " * 5 + "lower " * 2).strip(),
            ("newest " * 6 + "widest " * 3).strip()]
    ds = rd.from_arrow(pa.table({"doc_id": [0, 1], "text": docs}))
    m = bpe_train(ds, n_merges=4)
    enc = BpeEncoder(list(zip(m["left"], m["right"])))
    t = pa.table({"doc_id": [0, 1, 2],
                  "text": ["low lower", "newest widest", ""]})
    out = enc(t).to_pandas()
    assert out["n_words"].tolist() == [2, 2, 1]
    assert out["n_bpe"].tolist() == [1 + 3, 4 + 4, 0]


def test_span_dedup_distributed_degrade(ray_session, monkeypatch):
    """With the fold guard forced to 0, both span passes take the
    distributed-groupby degrade and still produce identical results."""
    import ray.data as rd

    import timberjack_ray.aggregates as agg
    from timberjack_ray.functions.dedup import (dup_span_positions,
                                                remove_dup_spans)

    span = " ".join(f"s{i}" for i in range(8))
    docs = [span + " tailA tailB tailC",
            "headX headY " + span,
            " ".join(f"u{i}" for i in range(12))]
    t = pa.table({"doc_id": list(range(3)), "text": docs})

    want_pos = dup_span_positions(rd.from_arrow(t), span_words=8) \
        .to_pandas().sort_values(["doc_id", "pos"]).reset_index(drop=True)
    want_txt = remove_dup_spans(rd.from_arrow(t), span_words=8) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    monkeypatch.setattr(agg, "FOLD_GUARD_LIMIT", 0)
    got_pos = dup_span_positions(rd.from_arrow(t), span_words=8) \
        .to_pandas().sort_values(["doc_id", "pos"]).reset_index(drop=True)
    got_txt = remove_dup_spans(rd.from_arrow(t), span_words=8) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got_pos.equals(want_pos) and len(want_pos)
    assert got_txt.equals(want_txt)


def test_dsir_weights_match_independent_reference(ray_session):
    """Per-doc DSIR log-weights pinned against a from-scratch reference
    (dict counting + math.log per word) on a tiny mixed corpus."""
    import math

    import ray.data as rd

    from timberjack_ray.functions.text import _feature_buckets, dsir_weights

    docs = ["the cat sat on the mat", "le chat est sur le tapis",
            "the dog ran", "der hund lief schnell", "", "cat cat cat"]
    langs = ["en", "fr", "en", "de", "en", "fr"]
    t = pa.table({"doc_id": list(range(6)), "text": docs, "lang": langs})
    n_feat, lam = 1 << 16, 1.0

    got = dsir_weights(rd.from_arrow(t).repartition(3), "lang", "en",
                       n_feat=n_feat, lam=lam) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)

    # independent reference
    ct, cr = {}, {}
    for d, lg in zip(docs, langs):
        words = d.split(" ")
        b = _feature_buckets(pa.array(words), n_feat)
        for x in b.tolist():
            cr[x] = cr.get(x, 0) + 1
            if lg == "en":
                ct[x] = ct.get(x, 0) + 1
    nt, nr = sum(ct.values()), sum(cr.values())

    def ref_logw(d):
        out = 0.0
        b = _feature_buckets(pa.array(d.split(" ")), n_feat)
        for x in b.tolist():
            out += (math.log(ct.get(x, 0) + lam) - math.log(nt + lam * n_feat)) \
                - (math.log(cr.get(x, 0) + lam) - math.log(nr + lam * n_feat))
        return out

    for i, d in enumerate(docs):
        assert got.loc[i, "n_words"] == len(d.split(" "))
        # NB: "".split(" ") == [""] — the empty doc contributes one
        # empty-string word to both the models and its own score, the
        # same single-space-split convention as word_topk
        want = ref_logw(d)
        assert abs(got.loc[i, "logw"] - want) < 1e-9, (i, got.loc[i, "logw"], want)
    # English docs should outrank the non-English ones
    en = got[got.doc_id.isin([0, 2])]["logw"].min()
    other = got[got.doc_id.isin([1, 3])]["logw"].max()
    assert en > other


def test_bm25_topk_matches_independent_reference(ray_session):
    import math

    import ray.data as rd

    from timberjack_ray.functions.text import bm25_topk

    docs = ["the quick brown fox", "the lazy dog", "quick quick fox jumps",
            "a completely unrelated sentence", "fox", ""]
    t = pa.table({"doc_id": list(range(6)), "text": docs})
    query = "quick fox"
    got = bm25_topk(rd.from_arrow(t).repartition(3), query, k=4)

    k1, b = 1.2, 0.75
    n = len(docs)
    dls = [len(d.split(" ")) for d in docs]
    avgdl = sum(dls) / n
    scores = {}
    for term in sorted(set(query.split(" "))):
        df = sum(1 for d in docs if term in d.split(" "))
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, d in enumerate(docs):
            tf = d.split(" ").count(term)
            if tf:
                norm = k1 * (1 - b + b * dls[i] / avgdl)
                scores[i] = scores.get(i, 0.0) + \
                    idf * tf * (k1 + 1) / (tf + norm)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert got["doc_id"].tolist() == [i for i, _ in want]
    for (_, w), g in zip(want, got["score"].tolist()):
        assert abs(w - g) < 1e-9
