"""Round-3 Arrow port of QualityScorer / LangId (VERDICT r02 #6) must stay
BIT-EXACT with the former pandas implementation (replicated here as the
reference), since quality feeds hash-checked oracle queries."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa

from timberjack_ray.functions.text import _STOPWORDS, LangId, QualityScorer


def _old_quality(texts):
    """The pre-round-3 pandas implementation, verbatim."""
    s = pd.Series(texts).astype(str)
    word_re = re.compile(r"[A-Za-z]+")
    all_stop = set().union(*_STOPWORDS.values())
    n_chars = s.str.len().to_numpy()
    n_alpha = s.str.count(r"[A-Za-z]").to_numpy()
    words = s.str.lower().str.findall(word_re).reset_index(drop=True)
    n_words = words.str.len().to_numpy()
    wex = words.explode().dropna()
    stop_hits = wex[wex.isin(all_stop)].groupby(level=0).size()
    n_stop = stop_hits.reindex(range(len(s)), fill_value=0).to_numpy()
    safe_chars = np.maximum(n_chars, 1)
    safe_words = np.maximum(n_words, 1)
    alpha_ratio = n_alpha / safe_chars
    stop_ratio = n_stop / safe_words
    mean_word_len = np.where(n_words > 0, n_alpha / safe_words, 0.0)
    length_ok = np.clip(n_chars / 200.0, 0.0, 1.0)
    return (0.3 * length_ok + 0.3 * alpha_ratio
            + 0.2 * np.clip(stop_ratio * 5, 0, 1)
            + 0.2 * np.clip(mean_word_len / 8.0, 0, 1))


def _old_langid(texts):
    s = pd.Series(texts).astype(str)
    n = len(s)
    word_re = re.compile(r"[a-zA-Zа-яА-Я]+")
    cjk = re.compile(r"[一-鿿぀-ヿ]")
    cyr = re.compile(r"[Ѐ-ӿ]")
    word2langs: dict = {}
    for lang, sw in _STOPWORDS.items():
        for w in sw:
            word2langs.setdefault(w, []).append(lang)
    words = s.str.lower().str.findall(word_re)
    ex = words.reset_index(drop=True).explode().dropna()
    langs = ex.map(word2langs).dropna()
    votes = pd.DataFrame({"row": langs.index, "lang": langs}).explode("lang")
    if len(votes):
        tab = votes.groupby(["row", "lang"]).size().unstack(fill_value=0)
        tab = tab.reindex(sorted(_STOPWORDS, reverse=True), axis=1, fill_value=0)
        tab = tab.reindex(range(n), fill_value=0)
        best = tab.idxmax(axis=1)
        best_votes = tab.max(axis=1)
        totals = tab.sum(axis=1)
    else:
        best = pd.Series(["en"] * n)
        best_votes = pd.Series(np.zeros(n))
        totals = pd.Series(np.zeros(n))
    preds = np.where(best_votes.to_numpy() > 0, best.to_numpy(dtype=object), "en")
    confs = np.where(totals.to_numpy() > 0,
                     best_votes.to_numpy() / np.maximum(totals.to_numpy(), 1), 0.0)
    cjk_mask = s.str.contains(cjk).to_numpy()
    cyr_mask = s.str.contains(cyr).to_numpy()
    preds = np.where(cjk_mask, "zh-ja", np.where(cyr_mask & ~cjk_mask, "ru", preds))
    confs = np.where(cjk_mask | cyr_mask, 1.0, confs)
    return preds.astype(str), confs


EDGE_TEXTS = [
    "",  # empty
    "   ",  # whitespace only
    "The quick brown fox jumps over the lazy dog and runs to the barn today.",
    "el la de que y en un los del se",
    "der die das und ist von mit den im ein",
    "le la de et un les des en du est",
    "!!! ??? ### 123 456",
    "你好世界 mixed with english the and of",
    "ошибка в системе и сбой",
    "word " * 100,
    "a",
    "THE THE THE the the the",
    "de de de",  # multi-lang stopword ties
]


def test_quality_bit_exact_vs_pandas_reference():
    import duckdb

    con = duckdb.connect()
    docs = con.sql(
        "SELECT doc_id, text FROM read_parquet("
        "'/root/testdata/sf0.001/documents.parquet') LIMIT 400").df()
    texts = list(docs["text"]) + EDGE_TEXTS
    got = QualityScorer()(pa.table({"text": pa.array(texts)}))
    exp = _old_quality(texts)
    assert np.array_equal(got["quality"].to_numpy(zero_copy_only=False), exp)


def test_langid_bit_exact_vs_pandas_reference():
    import duckdb

    con = duckdb.connect()
    docs = con.sql(
        "SELECT text FROM read_parquet("
        "'/root/testdata/sf0.001/documents.parquet') LIMIT 400").df()
    texts = list(docs["text"]) + EDGE_TEXTS
    got = LangId()(pa.table({"text": pa.array(texts)}))
    exp_pred, exp_conf = _old_langid(texts)
    assert got["lang_pred"].to_pylist() == exp_pred.tolist()
    assert np.array_equal(got["lang_conf"].to_numpy(zero_copy_only=False),
                          exp_conf)


def test_brute_force_topk_vectorized_same_result(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.similarity import brute_force_topk

    rng = np.random.RandomState(11)
    n, d, nq = 500, 16, 5
    emb = rng.standard_normal((n, d)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1)), d),
    })
    qs = emb[:nq] + rng.standard_normal((nq, d)).astype(np.float32) * 0.01
    out = brute_force_topk(rd.from_arrow(t).repartition(4), qs, k=7)
    # numpy reference: exact cosine top-7 per query, (score desc, id asc)
    def norm(m):
        return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    scores = norm(emb) @ norm(qs).T
    for qi in range(nq):
        exp = np.lexsort((np.arange(n), -scores[:, qi].astype(np.float64)))[:7]
        got = out[out["query_idx"] == qi].sort_values("rank")["vec_id"].tolist()
        assert got == exp.tolist()
