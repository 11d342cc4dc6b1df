"""Correctness tests for the training-data operators (dedup, similarity,
text analysis, multimodal plumbing) against local brute-force oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def docs_table(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})


@pytest.fixture(scope="module")
def near_dup_texts():
    base = "the quick brown fox jumps over the lazy dog again and again in the yard"
    texts = []
    for i in range(40):
        words = base.split()
        words[i % len(words)] = f"w{i}"  # one-word mutation → high Jaccard
        texts.append(" ".join(words))
    # plus some genuinely distinct docs
    rng = np.random.RandomState(3)
    vocab = [f"tok{j}" for j in range(500)]
    for i in range(40):
        texts.append(" ".join(rng.choice(vocab, size=30)))
    return texts


def test_exact_dedup(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.dedup import exact_dedup

    texts = ["aaa", "bbb", "aaa", "ccc", "bbb", "aaa"]
    out = exact_dedup(rd.from_arrow(docs_table(texts))).to_pandas()
    # survivor = min(doc_id) per distinct text
    assert sorted(out["doc_id"]) == [0, 1, 3]


def test_minhash_estimates_jaccard():
    from timberjack_ray.functions.dedup import MinHasher, jaccard

    mh = MinHasher(num_perm=128)
    a = "the quick brown fox jumps over the lazy dog again and again in the yard"
    b = a.replace("fox", "cat")
    sig_a, sig_b = mh.signature(a), mh.signature(b)
    est = (sig_a == sig_b).mean()
    true = jaccard(a, b)
    assert abs(est - true) < 0.2


def test_minhash_dedup_finds_near_dups(ray_session, near_dup_texts):
    import ray.data as rd

    from timberjack_ray.functions.dedup import minhash_dedup

    ds = rd.from_arrow(docs_table(near_dup_texts)).repartition(4)
    groups, pairs = minhash_dedup(ds, threshold=0.5)
    # the 40 mutated docs are mutual near-dups; the 40 random docs are not
    assert len(pairs) > 30
    assert set(groups["doc_id"]).issubset(set(range(40)))
    assert groups["dup_group"].nunique() == 1  # one connected cluster


def test_simhash_candidates(ray_session, near_dup_texts):
    import ray.data as rd

    from timberjack_ray.functions.dedup import simhash_candidates

    ds = rd.from_arrow(docs_table(near_dup_texts)).repartition(4)
    pairs = simhash_candidates(ds).to_pandas().drop_duplicates(["a", "b"])
    assert len(pairs) > 10
    assert (pairs["hamming"] <= 3).all()
    assert pairs["a"].max() < 40 and pairs["b"].max() < 40


def emb_table(n=200, d=16, seed=5):
    rng = np.random.RandomState(seed)
    m = rng.randn(n, d).astype(np.float32)
    flat = pa.array(m.reshape(-1))
    return pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(flat, d).cast(pa.list_(pa.float32())),
    }), m


def test_brute_force_topk_matches_numpy(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.similarity import brute_force_topk

    t, m = emb_table()
    q = m[7]
    out = brute_force_topk(rd.from_arrow(t).repartition(4), q[None, :], k=5)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q)
    exp = np.argsort(-(mn @ qn))[:5]
    assert out["vec_id"].tolist() == exp.tolist()
    assert out["rank"].tolist() == [1, 2, 3, 4, 5]


def test_ivf_topk_recall(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.similarity import brute_force_topk, ivf_topk

    t, m = emb_table(n=400)
    q = m[3]
    ds = rd.from_arrow(t).repartition(4)
    exact = set(brute_force_topk(ds, q[None, :], k=10)["vec_id"])
    approx = set(ivf_topk(ds, q[None, :], k=10, n_centroids=8, n_probe=4)["vec_id"])
    assert len(exact & approx) >= 5  # recall ≥ 0.5 with half the cells probed


def test_ivf_full_probe_equals_brute_force_multiquery(ray_session):
    """n_probe = n_centroids probes every cell, so the vectorized IVF
    kernel (probe-membership matrix + tie-safe top-k, VERDICT r3 #5)
    must reproduce brute force EXACTLY — ids, ranks and scores — for a
    batch of queries at once, including duplicated vectors (tie-break
    by id asc at the k boundary)."""
    import ray.data as rd

    from timberjack_ray.functions.similarity import (brute_force_topk,
                                                     ivf_topk)

    t, m = emb_table(n=300)
    # duplicate some vectors to force score ties at the boundary
    dup = pa.table({"vec_id": pa.array(np.arange(300, 340, dtype=np.int64)),
                    "embedding": t["embedding"].slice(0, 40)})
    full = pa.concat_tables([t, dup])
    qs = m[[3, 17, 101, 250]]
    ds = rd.from_arrow(full).repartition(5)
    exact = brute_force_topk(ds, qs, k=7)
    approx = ivf_topk(ds, qs, k=7, n_centroids=6, n_probe=6)
    cols = ["query_idx", "rank", "vec_id"]
    a = approx.sort_values(["query_idx", "rank"])[cols].reset_index(drop=True)
    b = exact.sort_values(["query_idx", "rank"])[cols].reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_embedding_near_dup(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.similarity import embedding_near_dup

    rng = np.random.RandomState(11)
    base = rng.randn(20, 8).astype(np.float32)
    dup = base + rng.randn(20, 8).astype(np.float32) * 0.01  # near-identical copies
    m = np.vstack([base, dup])
    flat = pa.array(m.reshape(-1))
    t = pa.table({"vec_id": pa.array(range(40), pa.int64()),
                  "embedding": pa.FixedSizeListArray.from_arrays(flat, 8).cast(pa.list_(pa.float32()))})
    pairs = embedding_near_dup(rd.from_arrow(t), threshold=0.99).to_pandas()
    found = set(map(tuple, pairs[["a", "b"]].values))
    expected = {(i, i + 20) for i in range(20)}
    assert len(found & expected) >= 12  # LSH recall is imperfect by design


def test_embedding_near_dup_recall_vs_brute(ray_session):
    """Planted near-dups at cosine ≥ 0.95: multi-table OR-amplified LSH must
    recover ≥ 0.9 of the pairs brute-force cosine finds (the single-band
    design this replaces recovered ≈ 0.28)."""
    import ray.data as rd

    from timberjack_ray.functions.similarity import _normalize, embedding_near_dup

    rng = np.random.RandomState(23)
    d, n_base = 32, 150
    base = rng.randn(n_base, d).astype(np.float32)
    # perturb along a random direction, small enough to stay at cosine ≥ 0.95
    noise = rng.randn(n_base, d).astype(np.float32) * 0.12
    dup = base / np.linalg.norm(base, axis=1, keepdims=True) + noise / np.linalg.norm(noise, axis=1, keepdims=True) * 0.18
    m = np.vstack([base, dup.astype(np.float32)])
    # brute-force ground truth at threshold 0.95
    mn = _normalize(m)
    sim = mn @ mn.T
    iu, ju = np.triu_indices(len(m), k=1)
    truth = {(int(a), int(b)) for a, b in zip(iu[sim[iu, ju] >= 0.95], ju[sim[iu, ju] >= 0.95])}
    assert len(truth) >= 100  # the plant worked
    flat = pa.array(m.reshape(-1))
    t = pa.table({"vec_id": pa.array(range(len(m)), pa.int64()),
                  "embedding": pa.FixedSizeListArray.from_arrays(flat, d).cast(pa.list_(pa.float32()))})
    pairs = embedding_near_dup(rd.from_arrow(t).repartition(4), threshold=0.95).to_pandas()
    found = set(map(tuple, pairs[["a", "b"]].values))
    assert not found - truth  # verification step admits no false positives
    recall = len(found & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall:.2f} < 0.9 ({len(found)} found / {len(truth)} true)"


def test_quality_scorer_and_langid():
    from timberjack_ray.functions.text import LangId, QualityScorer

    t = pa.table({"text": [
        "The quick brown fox jumps over the lazy dog and runs to the barn.",
        "el la de que y en un los del se",
        "!!! ??? ###",
        "你好世界 这是中文",
    ]})
    scored = QualityScorer()(t)
    q = scored["quality"].to_pylist()
    assert q[0] > q[2]  # prose beats punct soup
    lang = LangId()(t)["lang_pred"].to_pylist()
    assert lang[0] == "en"
    assert lang[1] == "es"
    assert lang[3] == "zh-ja"


def test_token_counts_kernel():
    from timberjack_ray.functions.text import add_token_counts

    t = pa.table({"text": ["a b c", "one-token", "x, y; z!"]})
    out = add_token_counts(t)
    assert out["n_words"].to_pylist() == [3, 1, 3]
    assert out["n_bpe"].to_pylist() == [3, 3, 6]  # "one-token"→ one,-,token


def test_fingerprints_stable():
    from timberjack_ray.functions.text import add_fingerprints

    t = pa.table({"text": ["hello world foo bar baz qux", "hello world foo bar baz qux", "other doc"]})
    out = add_fingerprints(t)
    fp = out["fp64"].to_pylist()
    assert fp[0] == fp[1] != fp[2]
    mg = out["fp_min_ngram"].to_pylist()
    assert mg[0] == mg[1]


def test_fingerprints_batch_invariant_and_boundaries():
    """A doc's fingerprint must not depend on its batch neighbours (no gram
    may cross a document boundary), and short docs fall back to fp64."""
    from timberjack_ray.functions.text import add_fingerprints

    d1 = "alpha beta gamma delta epsilon zeta eta"
    d2 = "one two three four five six seven eight"
    short = "tiny doc"
    together = add_fingerprints(pa.table({"text": [d1, d2, short, ""]}))
    alone1 = add_fingerprints(pa.table({"text": [d1]}))
    alone2 = add_fingerprints(pa.table({"text": [d2]}))
    assert together["fp_min_ngram"].to_pylist()[0] == alone1["fp_min_ngram"].to_pylist()[0]
    assert together["fp_min_ngram"].to_pylist()[1] == alone2["fp_min_ngram"].to_pylist()[0]
    # short + empty docs: fallback equals fp64
    assert together["fp_min_ngram"].to_pylist()[2] == together["fp64"].to_pylist()[2]
    assert together["fp_min_ngram"].to_pylist()[3] == together["fp64"].to_pylist()[3]
    # shared 5-gram ⇒ shared min candidate: identical docs agree regardless of position
    swapped = add_fingerprints(pa.table({"text": ["", short, d2, d1]}))
    assert swapped["fp_min_ngram"].to_pylist()[3] == alone1["fp_min_ngram"].to_pylist()[0]


def test_multimodal_decode_plumbing(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.multimodal import (
        FrameSampler,
        ImageDecoder,
        decode_images,
        make_fake_media_table,
        sample_frames,
    )

    t = make_fake_media_table(64)
    out = decode_images(rd.from_arrow(t)).to_pandas()
    assert len(out) == 64
    assert set(out.columns) == {"media_id", "pixel_mean", "pixel_std", "thumbnail"}
    # deterministic: same payload → same decode
    d = ImageDecoder()
    a = d(t.slice(0, 4))
    b = d(t.slice(0, 4))
    assert a["pixel_mean"].to_pylist() == b["pixel_mean"].to_pylist()
    frames = sample_frames(rd.from_arrow(t)).to_pandas()
    assert frames.groupby("media_id").size().max() <= 4
    # backend="real" constructs since round 3 (stdlib PNG decoder behind
    # the Pillow import guard); non-PNG payloads raise ValueError at decode
    with pytest.raises(ValueError):
        ImageDecoder(backend="real")._decode_one(b"not a png", 4, 4)
    # FrameSampler backend="real" extracts MJPEG-AVI frames since r03
    # (tests/test_multimodal_real.py); non-containers fail per-payload
    with pytest.raises(ValueError):
        FrameSampler(backend="real")(
            pa.table({"media_id": [1], "payload": [b"junk"]}))


def test_ngram_jaccard_exact_vs_brute(ray_session):
    """Prefix-filter n-gram Jaccard join is EXACT: identical pair set and
    identical jacc values vs a brute-force all-pairs scan."""
    import itertools

    import ray.data as rd

    from timberjack_ray.functions.dedup import (
        _stable_hash_strings,
        ngram_jaccard_pairs,
        shingles,
    )

    rng = np.random.RandomState(9)
    vocab = [f"w{i}" for i in range(40)]
    docs = [" ".join(vocab[rng.randint(40)] for _ in range(rng.randint(4, 25)))
            for _ in range(50)]
    for i in range(15):  # planted near-dups: one word changed
        ws = docs[i].split()
        ws[rng.randint(len(ws))] = "X"
        docs.append(" ".join(ws))
    ids = list(range(len(docs)))
    t = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(docs)})
    got = ngram_jaccard_pairs(rd.from_arrow(t).repartition(4), threshold=0.5).to_pandas()
    got_pairs = {(r.a, r.b): r.jacc for r in got.itertuples()}

    gs = [set(np.unique(_stable_hash_strings(shingles(d, 3))).tolist()) for d in docs]
    expect = {}
    for i, j in itertools.combinations(ids, 2):
        inter = len(gs[i] & gs[j])
        union = len(gs[i] | gs[j])
        if union and inter / union >= 0.5:
            expect[(i, j)] = inter / union
    assert set(got_pairs) == set(expect)
    for kk, v in expect.items():
        assert abs(got_pairs[kk] - v) < 1e-12


def test_kmeans_refine_matches_single_node_lloyd(ray_session):
    """Distributed Lloyd (broadcast centroids -> per-batch scatter-add
    partials -> driver update) must produce EXACTLY the same update as
    single-node Lloyd from the same init — the algorithm is deterministic
    given the assignment, and fp64 partial sums make the fold order-safe
    within tolerance."""
    import ray.data as rd

    from timberjack_ray.functions.similarity import _normalize, kmeans_refine

    t, m = emb_table(n=300, d=8, seed=11)
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    rng = np.random.RandomState(3)
    init = _normalize(mn[rng.choice(300, 6, replace=False)].copy())

    expect = init.copy()
    for _ in range(3):
        assign = np.argmax(mn @ expect.T, axis=1)
        nxt = expect.copy()
        for c in range(6):
            members = mn[assign == c]
            if len(members):
                nxt[c] = members.mean(axis=0, dtype=np.float64).astype(np.float32)
        expect = _normalize(nxt)

    got = kmeans_refine(rd.from_arrow(t).repartition(5), init, iters=3)
    assert np.allclose(got, expect, atol=1e-5)


def test_ivf_refined_recall_not_worse(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.similarity import brute_force_topk, ivf_topk

    t, m = emb_table(n=400)
    q = m[3]
    ds = rd.from_arrow(t).repartition(4)
    exact = set(brute_force_topk(ds, q[None, :], k=10)["vec_id"])
    refined = set(ivf_topk(ds, q[None, :], k=10, n_centroids=8, n_probe=4,
                           refine_iters=2)["vec_id"])
    raw = set(ivf_topk(ds, q[None, :], k=10, n_centroids=8, n_probe=4,
                       refine_iters=0)["vec_id"])
    assert len(exact & refined) >= len(exact & raw) - 1  # no regression (±1 slack)
    assert len(exact & refined) >= 5


def test_audio_featurizer_plumbing(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.multimodal import (
        AudioFeaturizer,
        audio_features,
        make_fake_media_table,
    )

    t = make_fake_media_table(48, media_type="audio/wav")
    out = audio_features(rd.from_arrow(t)).to_pandas()
    assert len(out) == 48
    assert set(out.columns) == {"media_id", "duration_s", "rms", "zcr", "band_energy"}
    assert (out["duration_s"] > 0).all()
    assert out["band_energy"].map(len).eq(AudioFeaturizer.N_BANDS).all()
    # deterministic: same payload → same features
    f = AudioFeaturizer()
    a = f(t.slice(0, 4))
    b = f(t.slice(0, 4))
    assert a["rms"].to_pylist() == b["rms"].to_pylist()
    # backend="real" constructs since round 3 (stdlib wave decoder behind
    # the soundfile import guard); garbage payloads fail at decode
    with pytest.raises(Exception):
        AudioFeaturizer(backend="real")._decode_one(b"not a wav", 8000)


def test_ngram_jaccard_distributed_path_matches_driver_path(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.dedup import ngram_jaccard_pairs

    rng = np.random.RandomState(17)
    vocab = [f"w{i}" for i in range(30)]
    docs = [" ".join(vocab[rng.randint(30)] for _ in range(rng.randint(4, 20)))
            for _ in range(60)]
    for i in range(20):
        ws = docs[i].split()
        ws[rng.randint(len(ws))] = "Y"
        docs.append(" ".join(ws))
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    ds = rd.from_arrow(t).repartition(4)
    small = ngram_jaccard_pairs(ds, threshold=0.5).to_pandas()
    big = ngram_jaccard_pairs(ds, threshold=0.5, driver_limit=0).to_pandas()
    key = lambda d: d.sort_values(["a", "b"]).reset_index(drop=True)[["a", "b", "jacc"]]
    pd.testing.assert_frame_equal(key(small), key(big))


def test_embedding_near_dup_distributed_matches_driver(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.similarity import embedding_near_dup

    rng = np.random.RandomState(3)
    base = rng.randn(30, 16).astype(np.float32)
    near = base[:10] + rng.randn(10, 16).astype(np.float32) * 0.01
    m = np.vstack([base, near])
    flat = pa.array(m.reshape(-1))
    t = pa.table({
        "vec_id": pa.array(range(len(m)), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(flat, 16)
        .cast(pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(t).repartition(3)
    small = embedding_near_dup(ds, threshold=0.95).to_pandas()
    big = embedding_near_dup(ds, threshold=0.95, driver_limit=0).to_pandas()
    key = lambda d: d.sort_values(["a", "b"]).reset_index(drop=True)[["a", "b"]]
    pd.testing.assert_frame_equal(key(small), key(big))
    assert len(small) >= 10  # every planted near-dup pair found


def test_minhash_candidate_pairs_distributed_matches_driver(ray_session, near_dup_texts):
    import ray.data as rd

    from timberjack_ray.functions.dedup import MinHasher, candidate_pairs, minhash_bands

    ds = rd.from_arrow(docs_table(near_dup_texts)).repartition(4)
    sig = ds.map_batches(MinHasher(), batch_format="pyarrow").materialize()
    bands = minhash_bands(sig)
    small = candidate_pairs(bands).drop_duplicates(["a", "b"])
    big = candidate_pairs(bands, driver_limit=0)
    big = (big if isinstance(big, pd.DataFrame) else big.to_pandas()) \
        .drop_duplicates(["a", "b"])
    key = lambda d: d.sort_values(["a", "b"]).reset_index(drop=True)[["a", "b"]]
    pd.testing.assert_frame_equal(key(small), key(big))


def test_decontaminate_drops_overlapping_docs(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.dedup import decontaminate

    bench = ["the held out eval question about turtles",
             "alpha beta gamma delta epsilon",
             "x y"]  # short bench doc: whole-text gram class
    train = [
        "clean document with completely different tokens here",   # survives
        "prefix words then alpha beta gamma trailing suffix",     # dropped (shared 3-gram)
        "the held out eval question about something else",        # dropped ("the held out" ...)
        "alpha beta gamma",  # 3 words = whole-text gram; does NOT match the
                             # bench LONG doc's internal 3-gram (own class)
        "x y",               # dropped: whole-text gram matches bench short doc
        "another totally unrelated clean sentence of words",      # survives
    ]
    train_ds = rd.from_arrow(docs_table(train)).repartition(3)
    bench_ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(bench)), pa.int64()),
        "text": pa.array(bench)}))
    out = decontaminate(train_ds, bench_ds, k=3).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 3, 5]


def test_decontaminate_empty_bench_keeps_all(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.dedup import decontaminate

    train_ds = rd.from_arrow(docs_table(["a b c d", "e f g h"]))
    bench_ds = rd.from_arrow(docs_table([]))
    out = decontaminate(train_ds, bench_ds).to_pandas()
    assert len(out) == 2


def test_bloom_decontaminate_superset_of_exact(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.dedup import bloom_decontaminate, decontaminate

    rng = np.random.RandomState(11)
    vocab = [f"w{j}" for j in range(300)]
    train = [" ".join(rng.choice(vocab, size=25)) for _ in range(120)]
    bench = train[::9][:10] + [" ".join(rng.choice(vocab, size=25)) for _ in range(10)]
    train_ds = rd.from_arrow(docs_table(train)).repartition(4)
    bench_ds = rd.from_arrow(docs_table(bench))

    exact = set(decontaminate(train_ds, bench_ds, k=3).to_pandas()["doc_id"])
    # well-sized bitmap: identical survivors (FP ~ 0 at this gram count)
    big = set(bloom_decontaminate(train_ds, bench_ds, k=3,
                                  m_bits=1 << 20).to_pandas()["doc_id"])
    assert big == exact
    # deliberately tiny bitmap: survivors must still be a SUBSET of exact
    # (no false negatives — the safe direction), with bounded over-drop
    small = set(bloom_decontaminate(train_ds, bench_ds, k=3, m_bits=1 << 14,
                                    n_hashes=2).to_pandas()["doc_id"])
    assert small <= exact
    # ~5.5% bit fill at this sizing → expected per-doc over-drop ~7%;
    # 0.7 leaves generous slack while still catching a broken probe
    assert len(small) >= len(exact) * 0.7


def test_bloom_poly_family_matches_exact_and_kernel(ray_session):
    """The SQL-replayable Horner gram family: same equivalence classes as
    the FNV family on all-long docs (wc > k on both), so a well-sized
    poly-hashed bitmap reproduces the exact survivor set; and the flat
    kernel output must equal a per-doc naive Horner reference."""
    import ray.data as rd

    from timberjack_ray.functions.corpus import POLY_BASE
    from timberjack_ray.functions.dedup import (bloom_decontaminate,
                                                decontaminate,
                                                gram_hashes_poly)

    rng = np.random.RandomState(23)
    vocab = [f"w{j}" for j in range(300)]
    train = [" ".join(rng.choice(vocab, size=25)) for _ in range(120)]
    bench = train[::9][:10] + [" ".join(rng.choice(vocab, size=25)) for _ in range(10)]
    train_ds = rd.from_arrow(docs_table(train)).repartition(4)
    bench_ds = rd.from_arrow(docs_table(bench))

    exact = set(decontaminate(train_ds, bench_ds, k=3).to_pandas()["doc_id"])
    poly = set(bloom_decontaminate(train_ds, bench_ds, k=3, m_bits=1 << 20,
                                   hasher="poly").to_pandas()["doc_id"])
    assert poly == exact

    def naive_word(w: str) -> int:
        v = 0
        for c in w:
            v = (v * int(POLY_BASE) + ord(c)) % (1 << 64)
        return v

    texts = ["alpha beta gamma delta", "xy", "", "a b c", "t " * 3]
    h, offs = gram_hashes_poly(texts, 3)
    GOLDEN = 0x9E3779B97F4A7C15  # the gram-fold multiplier (_BLOOM_MIX)
    expected = []
    for t in texts:
        ws = t.split(" ")
        if len(ws) >= 3:
            for i in range(len(ws) - 2):
                g = 0
                for w in ws[i:i + 3]:
                    g = (g * GOLDEN + naive_word(w)) % (1 << 64)
                expected.append(g)
        else:
            expected.append(naive_word(t))
    assert [int(x) for x in h] == expected
    assert offs[-1] == len(expected)


def test_funnel_counts_ordering_semantics(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.sessions import funnel_counts

    # u1: full ordered funnel; u2: click BEFORE its only view (step2 must not
    # count it); u3: view+click ordered but purchase precedes click;
    # u4: view only
    rows = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        (2, 10, "click"), (2, 20, "view"),
        (3, 10, "view"), (3, 15, "purchase"), (3, 20, "click"),
        (4, 10, "view"),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
    })
    out = funnel_counts(rd.from_arrow(t).repartition(3), "user_id", "ts",
                        "event_type", ["view", "click", "purchase"],
                        n_buckets=8)
    assert out["step_type"].tolist() == ["view", "click", "purchase"]
    # step1: u1,u2,u3,u4 all have a view; step2: u1,u3 click after first
    # view; step3: only u1 purchases after its qualifying click
    assert out["n_users"].tolist() == [4, 2, 1]


def test_funnel_strict_inequality_on_ties(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.sessions import funnel_counts

    # click at the SAME timestamp as the first view: ts > t1 is strict,
    # so the user does not advance (matches the SQL oracle's e.ts > s1.t1)
    t = pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([10, 10], pa.int64()),
        "event_type": pa.array(["view", "click"]),
    })
    out = funnel_counts(rd.from_arrow(t), "user_id", "ts", "event_type",
                        ["view", "click"], n_buckets=4)
    assert out["n_users"].tolist() == [1, 0]


def test_rollup_sums_levels(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import rollup_sums

    t = pa.table({
        "a": pa.array(["x", "x", "y", "y"]),
        "b": pa.array(["p", "q", "p", "p"]),
        "v": pa.array([1.0, 2.0, 3.0, 4.0]),
    })
    out = rollup_sums(rd.from_arrow(t).repartition(2), ["a", "b"], "v",
                      scale=100)
    got = {(r["a"], r["b"]): (r["sum_v_scaled"], r["n"])
           for r in out.to_dict("records")}
    assert got == {
        ("x", "p"): (100, 1), ("x", "q"): (200, 1), ("y", "p"): (700, 2),
        ("x", "ALL"): (300, 2), ("y", "ALL"): (700, 2),
        ("ALL", "ALL"): (1000, 4),
    }


def test_cube_sums_all_subsets(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import (cube_sums,
                                                     grouping_sets_sums)

    t = pa.table({
        "a": pa.array(["x", "x", "y", "y"]),
        "b": pa.array(["p", "q", "p", "p"]),
        "v": pa.array([1.0, 2.0, 3.0, 4.0]),
    })
    ds = rd.from_arrow(t).repartition(2)
    out = cube_sums(ds, ["a", "b"], "v", scale=100)
    got = {(r["a"], r["b"]): (r["sum_v_scaled"], r["n"])
           for r in out.to_dict("records")}
    assert got == {
        ("x", "p"): (100, 1), ("x", "q"): (200, 1), ("y", "p"): (700, 2),
        ("x", "ALL"): (300, 2), ("y", "ALL"): (700, 2),
        ("ALL", "p"): (800, 3), ("ALL", "q"): (200, 1),
        ("ALL", "ALL"): (1000, 4),
    }
    with pytest.raises(ValueError, match="duplicate"):
        grouping_sets_sums(ds, ["a", "b"], [("a",), ("a",)], "v")


def test_quantized_topk_recall_vs_float(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.similarity import (brute_force_topk,
                                                     brute_force_topk_q8)

    rng = np.random.RandomState(5)
    m = rng.randn(400, 32).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    t = pa.table({"vec_id": pa.array(range(400), pa.int64()),
                  "embedding": pa.array(m.tolist(),
                                        pa.list_(pa.float32()))})
    ds = rd.from_arrow(t).repartition(4)
    queries = m[:3] + rng.randn(3, 32).astype(np.float32) * 0.01
    f = brute_force_topk(ds, queries, k=10)
    q = brute_force_topk_q8(rd.from_arrow(t).repartition(4), queries, k=10)
    for qi in range(3):
        top_f = set(f[f["query_idx"] == qi]["vec_id"])
        top_q = set(q[q["query_idx"] == qi]["vec_id"])
        assert len(top_f & top_q) >= 8  # int8 ranking ~ float cosine ranking
    # integer scores are exact: rank 1 for query i is its base vector
    for qi in range(3):
        assert q[(q["query_idx"] == qi) & (q["rank"] == 1)]["vec_id"].iloc[0] == qi


def test_quantize_embeddings_roundtrip(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.similarity import quantize_embeddings

    vals = [[0.5, -0.5, 0.0039], [1.0, -1.0, 0.0]]
    t = pa.table({"vec_id": pa.array([7, 8], pa.int64()),
                  "embedding": pa.array(vals, pa.list_(pa.float32()))})
    out = quantize_embeddings(rd.from_arrow(t)).to_pandas()
    got = {r["vec_id"]: list(r["qvec"]) for _, r in out.iterrows()}
    # floor(x*127 + 0.5): 0.5→64 (63.5+0.5), -0.5→-63 (-63.5+0.5=-63.0),
    # 0.0039*127=0.49529…→0, ±1→±127
    assert got[7] == [64, -63, 0]
    assert got[8] == [127, -127, 0]


def test_topk_tie_break_across_duplicate_vectors(ray_session):
    """Batch-local partials must keep the id-asc winners among score ties
    (code-review r03 finding: argpartition kept arbitrary tied rows)."""
    import ray.data as rd

    from timberjack_ray.functions.similarity import (brute_force_topk,
                                                     brute_force_topk_q8)

    m = np.tile(np.array([[0.6, 0.8]], dtype=np.float32), (12, 1))
    # scrambled ids in ONE batch so the tie is batch-local
    ids = [7, 3, 11, 0, 9, 5, 1, 8, 2, 10, 4, 6]
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(m.tolist(), pa.list_(pa.float32()))})
    q = np.array([[0.6, 0.8]], dtype=np.float32)
    f = brute_force_topk(rd.from_arrow(t), q, k=3)
    assert f["vec_id"].tolist() == [0, 1, 2]
    g = brute_force_topk_q8(rd.from_arrow(t), q, k=3)
    assert g["vec_id"].tolist() == [0, 1, 2]


def test_char_entropy_matches_reference():
    from collections import Counter

    from timberjack_ray.functions.text import add_char_entropy

    texts = ["aaaa", "abcd", "", "aabb", "the quick brown fox", "zzzzzzzz!?"]
    out = add_char_entropy(pa.table({"text": texts}))["entropy_u"].to_pylist()
    for txt, got in zip(texts, out):
        b = txt.encode()
        if not b:
            exp = 0.0
        else:
            c = Counter(b)
            exp = -sum((v / len(b)) * np.log2(v / len(b)) for v in c.values())
        assert got == int(np.floor(exp * 1_000_000 + 0.5))


def test_embedding_dedup_composition_drops_planted_copies(ray_session):
    import pyarrow.parquet as pq

    import __ray_entry__ as em

    src = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                        columns=["vec_id"])
    offset = max(src["vec_id"].to_pylist()) + 1  # the query's copy-id offset
    out = em.queries()["embedding_dedup"]("/root/testdata/sf0.001")
    ids = set(out["vec_id"])
    originals = {i for i in ids if i < offset}
    copies = {i for i in ids if i >= offset}
    # every original survives (it is the min id of its pair-cluster);
    # the perturbed copies are near-duplicates at cos ~ 1 and the
    # OR-amplified LSH should catch nearly all of them
    assert len(originals) >= 50
    assert len(copies) <= len(originals) * 0.1


def test_embedding_dispersion_matches_numpy(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.similarity import embedding_dispersion

    rng = np.random.RandomState(3)
    m = rng.uniform(-1, 1, size=(40, 8))
    labels = rng.randint(0, 3, size=40)
    ds = rd.from_arrow(pa.table({
        "label": labels.astype("int64"),
        "embedding": [row.tolist() for row in m]}))
    out = embedding_dispersion(ds, "label", scale=1000)
    q = np.floor(m * 1000 + 0.5).astype(np.int64)
    for r in out.itertuples():
        sel = labels == r.label
        assert r.n == int(sel.sum())
        assert r.sumsq_scaled == int((q[sel] ** 2).sum())


def test_top_principal_component_vs_eigh(ray_session):
    """Power-iteration PC pinned against numpy.linalg.eigh on random
    anisotropic data, invariant (to float tolerance) under partitioning."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.similarity import top_principal_component

    rng = np.random.RandomState(107)
    d, n = 12, 400
    direction = rng.randn(d)
    direction /= np.linalg.norm(direction)
    x = rng.randn(n, d) + 4.0 * rng.randn(n, 1) * direction
    t = pa.table({"embedding": pa.FixedSizeListArray.from_arrays(
        pa.array(x.astype(np.float32).reshape(-1)), d).cast(
            pa.list_(pa.float32()))})

    cov = np.cov(x.astype(np.float32).T, bias=True)
    w, vecs = np.linalg.eigh(cov)
    true_v = vecs[:, -1]

    for parts in (1, 7):
        ds = rd.from_arrow(t).repartition(parts)
        lam, v, n_rows = top_principal_component(ds)
        assert n_rows == n
        assert abs(abs(v @ true_v)) > 0.999
        assert abs(lam - w[-1]) / w[-1] < 1e-3


def test_cdc_chunk_properties():
    """CDC chunker: exact doc partition, per-doc chunk indexing, length
    clamps, duplicate docs → identical chunk hash sequences, and
    batch-split invariance."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from timberjack_ray.functions.corpus import cdc_chunk_batch

    rng = np.random.RandomState(42)
    words = [f"w{i}" for i in range(5000)]
    texts = [" ".join(rng.choice(words, n)) for n in (600, 0, 3, 250)]
    texts[1] = ""
    texts.append(texts[0])  # duplicate of doc 0
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": texts})
    out = cdc_chunk_batch(t).to_pandas()
    for d, txt in enumerate(texts):
        sub = out[out.doc_id == d]
        assert sub.chunk_len.sum() == len(txt)
        assert (sub.chunk_idx.values == np.arange(len(sub))).all()
        assert (sub.chunk_len <= 512).all()
        if len(sub) > 1:  # only the final chunk may undershoot min_len
            assert (sub.chunk_len.values[:-1] >= 16).all()
    assert out[out.doc_id == 1].empty  # empty doc → no rows
    assert out[out.doc_id == 0].chunk_hash.tolist() \
        == out[out.doc_id == len(texts) - 1].chunk_hash.tolist()
    # batch-split invariance: chunking each row alone gives the same table
    singles = pd.concat([cdc_chunk_batch(t.slice(i, 1)).to_pandas()
                         for i in range(len(texts))], ignore_index=True)
    assert singles.equals(out.reset_index(drop=True))


def test_cdc_resync_after_edit():
    """The content-defined property: after a prefix insertion, boundaries
    realign and all but O(1) leading chunks are shared — the dedup win a
    fixed-size chunker cannot give."""
    import numpy as np
    import pyarrow as pa

    from timberjack_ray.functions.corpus import cdc_chunk_batch

    rng = np.random.RandomState(7)
    words = [f"tok{i}" for i in range(4000)]
    base = " ".join(rng.choice(words, 800))
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": [base, "INSERTED PREFIX 9 " + base]})
    out = cdc_chunk_batch(t).to_pandas()
    h1 = out[out.doc_id == 1].chunk_hash.tolist()
    h2 = out[out.doc_id == 2].chunk_hash.tolist()
    shared = 0
    while shared < min(len(h1), len(h2)) \
            and h1[-1 - shared] == h2[-1 - shared]:
        shared += 1
    assert shared >= len(h1) - 3, (len(h1), shared)


def test_cdc_dedup_stats_both_paths(ray_session):
    """cdc_dedup_stats agrees with a pandas recount of cdc_chunk_batch on
    both the driver fold and the distributed degrade (driver_limit=0)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.corpus import cdc_chunk_batch, \
        cdc_dedup_stats

    rng = np.random.RandomState(11)
    words = [f"v{i}" for i in range(2000)]
    texts = [" ".join(rng.choice(words, rng.randint(50, 400)))
             for _ in range(40)]
    texts += texts[:10]  # exact dups → guaranteed dup_chars
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": texts})
    chunks = cdc_chunk_batch(t).to_pandas()
    g = chunks.groupby("chunk_hash").agg(n=("chunk_len", "size"),
                                         ln=("chunk_len", "first"))
    want = {"n_chunks": int(g.n.sum()), "n_distinct_chunks": len(g),
            "total_chars": int((g.n * g.ln).sum()),
            "dup_chars": int(((g.n - 1) * g.ln).sum())}
    assert want["dup_chars"] > 0
    ds = rd.from_arrow(t).repartition(5)
    for lim in (2_000_000, 0):
        got = cdc_dedup_stats(ds, driver_limit=lim)
        assert got.iloc[0].to_dict() == want, (lim, got)


def test_ams_f2_tolerance_and_merge(ray_session):
    """AMS F2: per-group estimates within tolerance of the exact self-join
    size on zipf-skewed keys, and state vectors merge by addition."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.sketch import AMSF2, selfjoin_size_ams

    rng = np.random.RandomState(3)
    n = 30000
    grp = rng.choice(["a", "b"], n)
    keys = (rng.zipf(1.5, n) % 400).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": grp, "k": keys})).repartition(6)
    est = selfjoin_size_ams(ds, "g", "k").set_index("g")["f2_est"]
    exact = pd.DataFrame({"g": grp, "k": keys}) \
        .groupby(["g", "k"]).size().pow(2).groupby(level=0).sum()
    for g in ("a", "b"):
        assert abs(est[g] - exact[g]) / exact[g] < 0.35
    # merge = elementwise addition: two half-streams equal one full stream
    h = np.asarray(pd.util.hash_array(keys.astype(object)), dtype=np.uint64)
    full, p1, p2 = AMSF2(seed=5), AMSF2(seed=5), AMSF2(seed=5)
    full.add_hashed(h)
    p1.add_hashed(h[: n // 2]); p2.add_hashed(h[n // 2:])
    p1.merge_state(p2.state)
    assert (p1.state == full.state).all()
    assert abs(p1.estimate() - full.estimate()) < 1e-9


def test_multiline_stitch_boundary_chain(ray_session):
    """Stitch stats exact vs a pandas replay, invariant under block
    splits that cut through records — including blocks with NO start
    line (pure continuation blocks extend the carried record)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.window import multiline_stitch_stats

    rng = np.random.RandomState(5)
    n = 500
    ids = np.arange(n, dtype=np.int64)
    types = rng.choice(["a", "b", "c"], n)
    # sparse starts → long records → many continuation-only blocks when
    # split into 50 blocks of 10 rows; stream starts headless
    is_start = rng.rand(n) < 0.06
    is_start[:5] = False
    is_start[7] = True
    t = pa.table({"event_id": pa.array(ids), "event_type": types,
                  "is_start": pa.array(is_start)})

    df = pd.DataFrame({"id": ids, "ty": types, "st": is_start})
    df["rec"] = df["st"].cumsum()
    df = df[df["rec"] > 0]
    grp = df.groupby("rec").agg(rtype=("ty", "first"), n=("id", "size"))
    want = grp.groupby("rtype").agg(
        n_records=("n", "size"), total_lines=("n", "sum"),
        max_lines=("n", "max")).reset_index() \
        .rename(columns={"rtype": "event_type"}) \
        .sort_values("event_type").reset_index(drop=True)

    for parts in (1, 13, 50):
        ds = rd.from_arrow(t).repartition(parts)
        got = multiline_stitch_stats(ds, "event_id", "event_type",
                                     "is_start")
        pd.testing.assert_frame_equal(
            got, want.astype({"n_records": "int64", "total_lines": "int64",
                              "max_lines": "int64"}), check_dtype=False)


def test_cdc_vs_scalar_reference():
    """CDC boundaries fuzz-checked against an independent per-char scalar
    implementation of the same windowed-Gear + greedy-clamp spec."""
    import numpy as np
    import pyarrow as pa

    from timberjack_ray.functions.corpus import _splitmix64, cdc_chunk_batch

    def scalar_chunks(text, mask_bits=6, window=16, min_len=16, max_len=512):
        cps = [ord(c) for c in text]
        g = [int(_splitmix64(np.array([c], dtype=np.uint64))[0]) for c in cps]
        mask = (1 << mask_bits) - 1
        cand = []
        for t in range(len(cps)):
            if t < window - 1:
                continue
            h = 0
            for k in range(window):
                h = (h + (g[t - k] << k)) % (1 << 64)
            if h & mask == 0:
                cand.append(t)
        chunks, last = [], 0
        for c in cand:
            cut = c + 1
            while cut - last > max_len:
                chunks.append((last, last + max_len))
                last += max_len
            if cut - last >= min_len:
                chunks.append((last, cut))
                last = cut
        while len(cps) - last > max_len:
            chunks.append((last, last + max_len))
            last += max_len
        if len(cps) > last:
            chunks.append((last, len(cps)))
        return [(e - s) for s, e in chunks]

    rng = np.random.RandomState(23)
    alphabet = list("abcdefgh χψω🙂 0123")
    for trial in range(6):
        n = int(rng.randint(0, 700))
        text = "".join(rng.choice(alphabet, n))
        t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": [text]})
        got = cdc_chunk_batch(t).to_pandas()["chunk_len"].tolist()
        assert got == scalar_chunks(text), (trial, n)


def test_semantic_dedup_planted_copies_and_chain(ray_session):
    """SemDeDup path: planted exact copies are dropped (min-id survivor),
    distinct vectors survive, and a transitive chain a~b~c (a·c below
    threshold) collapses to ONE survivor — exercising the in-cluster
    component closure, not just direct pairs."""
    import pyarrow as pa
    import ray.data as rd

    from timberjack_ray.functions.similarity import semantic_dedup

    rng = np.random.RandomState(5)
    d = 16
    base = rng.randn(20, d).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs = [v for v in base] + [v.copy() for v in base[:6]]  # 6 exact copies
    ids = list(range(20)) + [100 + i for i in range(6)]
    # a near-transitive chain: unit vectors at angles 0, 14°, 28° —
    # adjacent cos ≈ 0.970 ≥ 0.95, endpoints cos ≈ 0.882 < 0.95
    for j, ang in enumerate((0.0, 14.0, 28.0)):
        v = np.zeros(d, dtype=np.float32)
        v[0], v[1] = np.cos(np.radians(ang)), np.sin(np.radians(ang))
        vecs.append(v)
        ids.append(200 + j)
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32()))})
    out = semantic_dedup(rd.from_arrow(t).repartition(3),
                         threshold=0.95, n_centroids=4) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    kept = set(out[out["keep"]]["vec_id"].tolist())
    # every planted copy loses to its base (same vector ⇒ same cluster)
    for i in range(6):
        assert 100 + i not in kept and i in kept
    # chain members co-cluster (they are near each other); exactly one
    # survivor among 200..202 IF they landed in one cluster — they must:
    # their pairwise cosine to any centroid orders identically
    chain = out[out["vec_id"] >= 200]
    if chain["cluster"].nunique() == 1:
        assert chain["keep"].sum() == 1
        assert chain[chain["keep"]]["vec_id"].iloc[0] == 200
    # all untouched distinct vectors survive
    assert all(i in kept for i in range(6, 20))


def test_knn_join_planted_and_exact_in_cell(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.similarity import knn_join

    rng = np.random.RandomState(9)
    m = rng.randn(300, 16).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    # plant exact copies: 5..9 duplicate 0..4 (same cell by construction)
    m[5:10] = m[0:5]
    t = pa.table({"vec_id": pa.array(range(300), pa.int64()),
                  "embedding": pa.array(m.tolist(), pa.list_(pa.float32()))})
    out = knn_join(rd.from_arrow(t).repartition(5), k=3, n_centroids=4,
                   seed=7).to_pandas()
    # every planted copy pair finds each other at rank 1 (identical
    # vectors -> max possible int score, min-id tie rule)
    r1 = out[out["rank"] == 1].set_index("vec_id")["nbr_id"]
    for a, b in zip(range(0, 5), range(5, 10)):
        assert r1[a] == b and r1[b] == a
    # determinism: same input partitioned differently -> identical rows
    out2 = knn_join(rd.from_arrow(t).repartition(11), k=3, n_centroids=4,
                    seed=7).to_pandas()
    key = ["vec_id", "rank"]
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True),
        out2.sort_values(key).reset_index(drop=True))


def test_mmr_select_matches_greedy_reference(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.similarity import (_normalize, mmr_select)

    rng = np.random.RandomState(17)
    n, d, k, m_pool = 250, 12, 8, 250   # pool = everything -> exact greedy
    m = rng.randn(n, d).astype(np.float32)
    q = rng.randn(d)
    t = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                  "embedding": pa.array(m.tolist(), pa.list_(pa.float32()))})
    out = mmr_select(rd.from_arrow(t).repartition(5), q, k=k,
                     lam_num=7, lam_den=10, m=m_pool)

    # brute-force greedy reference on the same int-quantized domain
    S = 16384
    mn = _normalize(m).astype(np.float64)
    qm = np.floor(mn * S).astype(np.int64)
    qn = q / np.linalg.norm(q)
    qq = np.floor(qn * S).astype(np.int64)
    qsim = qm @ qq
    ids = np.arange(n)
    sel, max_sel = [], np.full(n, np.iinfo(np.int64).min)
    for _ in range(k):
        score = 7 * qsim - (3 * max_sel if sel else 0)
        score = np.where(np.isin(ids, sel), np.iinfo(np.int64).min, score)
        best = np.flatnonzero(score == score.max())
        j = best[np.argmin(ids[best])]
        sel.append(j)
        max_sel = np.maximum(max_sel, qm @ qm[j])
    assert out["vec_id"].tolist() == [int(x) for x in sel]

    # determinism under a different partitioning
    out2 = mmr_select(rd.from_arrow(t).repartition(9), q, k=k,
                      lam_num=7, lam_den=10, m=m_pool)
    pd.testing.assert_frame_equal(out, out2)


def test_compress_ratio_matches_recompute(ray_session):
    import zlib

    import ray.data as rd

    from timberjack_ray.functions.text import compress_ratio_by_group

    texts = ["aaaa " * 50, "the quick brown fox " * 10,
             "x" * 3, "qwZk81!#", "aaaa " * 50]
    groups = ["a", "a", "b", "b", "c"]
    t = pa.table({"source": pa.array(groups), "text": pa.array(texts)})
    out = compress_ratio_by_group(rd.from_arrow(t).repartition(3))
    got = {r.source: (r.n_docs, r.raw_b, r.comp_b)
           for r in out.itertuples()}
    for g in "abc":
        idx = [i for i, s in enumerate(groups) if s == g]
        raw = sum(len(texts[i].encode()) for i in idx)
        comp = sum(len(zlib.compress(texts[i].encode(), 6)) for i in idx)
        assert got[g] == (len(idx), raw, comp)
    # redundant group compresses far better than the short/random group
    assert got["a"][2] / got["a"][1] < got["b"][2] / got["b"][1]
