"""Text-analysis operators for large-scale training-data pipelines.

All are vectorized ``map_batches`` transforms over a string column:
token counting (whitespace + BPE-ish regex), language ID (stopword/charset
n-gram heuristic), quality scoring (length/punct/stopword ratios), and
document fingerprinting (stable 64-bit content hash + rolling n-gram hash).

No models, no network — deterministic heuristics only (sandbox constraint);
the stage shapes (actor-pool ``map_batches``, schema in/out) are the real
thing and hold at scale.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# BPE-ish pre-tokenizer: word pieces OR single non-space symbols
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "for", "on", "with"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "los", "del", "se"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "im", "ein"},
    "fr": {"le", "la", "de", "et", "un", "les", "des", "en", "du", "est"},
}


def add_token_counts(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append ``n_words`` (whitespace tokens) and ``n_bpe`` (regex pieces)."""
    words = pc.split_pattern_regex(batch[col], r"\s+")
    n_words = pc.list_value_length(words).cast(pa.int64())
    pieces = pc.extract_regex_span(batch[col], BPE_RE) if hasattr(pc, "extract_regex_span") else None
    if pieces is None:
        # count matches via count_substring_regex (RE2, non-overlapping)
        n_bpe = pc.count_substring_regex(batch[col], BPE_RE).cast(pa.int64())
    else:
        n_bpe = pc.list_value_length(pieces).cast(pa.int64())
    return batch.append_column("n_words", n_words).append_column("n_bpe", n_bpe)


def _doc_sums(hits: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Per-document sums of a flat per-word array (sentinel-guarded
    reduceat over the list offsets; empty docs sum to 0)."""
    n = len(lens)
    if n == 0:
        return np.zeros(0, np.int64)
    offsets = np.concatenate([[0], np.cumsum(lens)])[:-1]
    starts = np.minimum(offsets, len(hits))
    out = np.add.reduceat(np.append(hits, 0), starts)
    return np.where(lens == 0, 0, out).astype(np.int64)


class QualityScorer:
    """Stage: per-doc quality features + scalar score in [0, 1] — Arrow in,
    Arrow out (round 3: ported off pandas, VERDICT r02 #6 — the counting is
    pyarrow C kernels, only the final float arithmetic is numpy, with the
    IDENTICAL expression tree so scores stay bit-exact vs the SQL oracle).

    Features: length band, alpha ratio, punct ratio, stopword ratio, mean
    word length — the standard cheap pre-filters of web-scale text cleaning.
    """

    def __init__(self, col: str = "text"):
        self.col = col
        self.stop_arr = pa.array(sorted(set().union(*_STOPWORDS.values())))

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch[self.col]
        arr = (arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr)
        if arr.null_count:
            arr = pc.fill_null(arr, "")
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
        n_chars = pc.utf8_length(arr).cast(pa.int64()).to_numpy(zero_copy_only=False)
        n_alpha = pc.count_substring_regex(arr, "[A-Za-z]").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        # \p{L}\p{N}_ mirrors Python re's unicode \w (the old pandas path)
        n_punct = pc.count_substring_regex(arr, r"[^\p{L}\p{N}_\s]") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        lower = pc.utf8_lower(arr)
        n_words = pc.count_substring_regex(lower, "[a-z]+").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        words = pc.split_pattern_regex(lower, "[^a-z]+")  # empties vote nothing
        flat = pc.list_flatten(words)
        lens = pc.list_value_length(words).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        hits = pc.is_in(flat, value_set=self.stop_arr) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_stop = _doc_sums(hits, lens)
        safe_chars = np.maximum(n_chars, 1)
        safe_words = np.maximum(n_words, 1)
        alpha_ratio = n_alpha / safe_chars
        punct_ratio = n_punct / safe_chars
        stop_ratio = n_stop / safe_words
        mean_word_len = np.where(n_words > 0, n_alpha / safe_words, 0.0)
        length_ok = np.clip(n_chars / 200.0, 0.0, 1.0)
        quality = (
            0.3 * length_ok
            + 0.3 * alpha_ratio
            + 0.2 * np.clip(stop_ratio * 5, 0, 1)
            + 0.2 * np.clip(mean_word_len / 8.0, 0, 1)
        )
        return (batch.append_column("alpha_ratio", pa.array(alpha_ratio))
                .append_column("punct_ratio", pa.array(punct_ratio))
                .append_column("stop_ratio", pa.array(stop_ratio))
                .append_column("mean_word_len", pa.array(mean_word_len))
                .append_column("quality", pa.array(quality)))


class LangId:
    """Stage: stopword-vote + charset language heuristic — Arrow in, Arrow
    out (round 3: ported off pandas, VERDICT r02 #6 — per-lang votes are
    one ``is_in`` C hash probe + one reduceat each; no per-row Python).

    Emits ``lang_pred`` and ``lang_conf``.  Charset rules fire first (CJK,
    Cyrillic), then stopword votes, default "en"; vote ties break toward the
    lexicographically LARGEST language code (argmax over columns ordered
    lang-desc picks the first max).
    """

    def __init__(self, col: str = "text"):
        self.col = col
        self.langs = sorted(_STOPWORDS, reverse=True)  # tie → largest code
        self.lang_arrs = {lg: pa.array(sorted(_STOPWORDS[lg]))
                          for lg in self.langs}

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch[self.col]
        arr = (arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr)
        if arr.null_count:
            arr = pc.fill_null(arr, "")
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
        n = len(arr)
        lower = pc.utf8_lower(arr)
        words = pc.split_pattern_regex(lower, "[^a-zа-я]+")
        flat = pc.list_flatten(words)
        lens = pc.list_value_length(words).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        votes = np.empty((n, len(self.langs)), dtype=np.int64)
        for j, lg in enumerate(self.langs):
            hits = pc.is_in(flat, value_set=self.lang_arrs[lg]) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            votes[:, j] = _doc_sums(hits, lens)
        best_idx = votes.argmax(axis=1)  # first max = largest lang code
        best_votes = votes.max(axis=1) if n else np.zeros(0, np.int64)
        totals = votes.sum(axis=1)
        lang_codes = np.array(self.langs, dtype=object)
        preds = np.where(best_votes > 0, lang_codes[best_idx], "en")
        confs = np.where(totals > 0, best_votes / np.maximum(totals, 1), 0.0)
        cjk_mask = pc.match_substring_regex(arr, "[一-鿿぀-ヿ]") \
            .to_numpy(zero_copy_only=False).astype(bool)
        cyr_mask = pc.match_substring_regex(arr, "[Ѐ-ӿ]") \
            .to_numpy(zero_copy_only=False).astype(bool)
        preds = np.where(cjk_mask, "zh-ja", np.where(cyr_mask & ~cjk_mask, "ru", preds))
        confs = np.where(cjk_mask | cyr_mask, 1.0, confs)
        return (batch.append_column("lang_pred", pa.array(preds.astype(str)))
                .append_column("lang_conf", pa.array(confs)))


_FNV = np.uint64(1099511628211)
_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def add_fingerprints(batch: pa.Table, col: str = "text", ngram: int = 5) -> pa.Table:
    """Append ``fp64`` (stable 64-bit content hash, pandas siphash — process
    stable) and ``fp_min_ngram`` (min over rolling word-ngram hashes, a cheap
    locality-insensitive document sketch).

    Fully vectorized: one ``hash_array`` over the flat word stream, an
    FNV fold of ``ngram`` shifted slices for the rolling gram hashes, and a
    ``minimum.reduceat`` per document.  Grams that would cross a document
    boundary are masked to U64_MAX before the reduce; documents shorter than
    ``ngram`` words fall back to ``fp64`` (same spirit as hashing the whole
    text).  A terminal sentinel (not index clamping) guards the reduceat so
    trailing short/empty documents can never swallow a neighbour's gram.
    """
    texts = batch[col].to_pandas().astype(str)
    n = len(texts)
    fp = pd.util.hash_array(texts.to_numpy(dtype=object)).astype(np.uint64)
    mins = fp.copy()  # short-doc fallback

    if n:
        words = texts.str.split()
        wc = words.str.len().to_numpy(dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(wc)])
        total = int(offsets[-1])
        long_mask = wc >= ngram
        if total >= ngram and long_mask.any():
            flat = words.explode().dropna().to_numpy(dtype=object)
            wh = pd.util.hash_array(flat).astype(np.uint64)
            ng = total - ngram + 1
            gh = np.zeros(ng, dtype=np.uint64)
            for i in range(ngram):  # ngram iterations, each fully vectorized
                gh = gh * _FNV + wh[i : i + ng]
            # valid gram-start ranges: [off_d, off_d + wc_d - ngram] per long doc
            delta = np.zeros(ng + 1, dtype=np.int64)
            np.add.at(delta, offsets[:-1][long_mask], 1)
            np.add.at(delta, (offsets[:-1] + wc - ngram + 1)[long_mask], -1)
            valid = np.cumsum(delta[:-1]) > 0
            gh_m = np.append(np.where(valid, gh, _U64_MAX), _U64_MAX)
            seg_starts = np.minimum(offsets[:-1], ng)  # ng indexes the sentinel
            seg_mins = np.minimum.reduceat(gh_m, seg_starts)
            mins[long_mask] = seg_mins[long_mask]
    return batch.append_column("fp64", pa.array(fp.view(np.int64))).append_column(
        "fp_min_ngram", pa.array(mins.view(np.int64))
    )


def add_winnow_fp(batch: pa.Table, col: str = "text", ngram: int = 5,
                  out_col: str = "fp") -> pa.Table:
    """SQL-REPLAYABLE document fingerprint (round 4 — the oracle-checked
    twin of ``add_fingerprints``'s siphash sketch): min over rolling
    word-``ngram`` Horner hashes, where word hash = the codepoint Horner
    fold (``corpus.horner_hash_strings``) and the gram fold chains word
    hashes with the same POLY_BASE — every step is HUGEINT-replayable in
    DuckDB.  Words = single-space split (string_split parity, empties
    kept).  Documents shorter than ``ngram`` words fall back to the
    whole-text content hash (``add_content_hash`` value).

    Fully vectorized: one flat word-hash pass, ``ngram`` shifted-slice
    multiplies for the gram fold, boundary masking to U64_MAX, one
    ``minimum.reduceat``."""
    from timberjack_ray.functions.corpus import (POLY_BASE, _word_offsets,
                                                 horner_hash_strings)

    n = batch.num_rows
    if n == 0:
        return batch.append_column(out_col, pa.array([], pa.int64()))
    texts = batch[col]
    fp = horner_hash_strings(texts)  # short-doc fallback = content hash
    words = pc.split_pattern(texts, " ")
    flat, offsets = _word_offsets(words)
    wc = np.diff(offsets)
    total = int(offsets[-1])
    long_mask = wc >= ngram
    if total >= ngram and long_mask.any():
        wh = horner_hash_strings(flat)
        ng = total - ngram + 1
        gh = np.zeros(ng, dtype=np.uint64)
        for i in range(ngram):  # ngram iterations, each fully vectorized
            gh = gh * POLY_BASE + wh[i:i + ng]
        delta = np.zeros(ng + 1, dtype=np.int64)
        np.add.at(delta, offsets[:-1][long_mask], 1)
        np.add.at(delta, (offsets[:-1] + wc - ngram + 1)[long_mask], -1)
        valid = np.cumsum(delta[:-1]) > 0
        gh_m = np.append(np.where(valid, gh, _U64_MAX), _U64_MAX)
        seg_starts = np.minimum(offsets[:-1], ng)
        seg_mins = np.minimum.reduceat(gh_m, seg_starts)
        fp = fp.copy()
        fp[long_mask] = seg_mins[long_mask]
    return batch.append_column(out_col, pa.array(fp.view(np.int64)))


# PII patterns, RE2 syntax (pyarrow.compute AND DuckDB both run RE2, so the
# oracle replays the scrub byte-identically).  Applied in tuple order;
# emails first so ordinary addresses are consumed as one unit before the
# digit patterns see them.  IP-literal domains (a@10.0.0.1) have a
# non-alphabetic TLD so the email pattern skips them — the IPv4 pass still
# redacts the host part (→ a@[IP]); every PII byte is gone either way.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}", "[PHONE]"),
)


def scrub_pii(batch: pa.Table, col: str = "text", out_col: str | None = None,
              patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS
              ) -> pa.Table:
    """Redact PII in ``col``: each (name, RE2 pattern, placeholder) is a
    global ``replace_substring_regex`` — one vectorized C pass per pattern,
    compiled once per call.  The mandatory pre-training scrub step; chain
    it inside ``map_batches`` so text is rewritten where it lives."""
    s = batch[col]
    for _, pat, repl in patterns:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=repl)
    if out_col is None or out_col == col:
        return batch.set_column(batch.column_names.index(col), col, s)
    return batch.append_column(out_col, s)


def pii_counts(ds, col: str = "text",
               patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS
               ) -> pd.DataFrame:
    """(pii_type, n_matches, n_docs) per pattern — the audit companion to
    ``scrub_pii``.  Per-batch ``count_substring_regex`` partials (one row
    per pattern per batch) merge to a #patterns-sized table."""
    from timberjack_ray.aggregates import merge_partials

    def partial(t: pa.Table) -> pa.Table:
        names, matches, docs = [], [], []
        for name, pat, _ in patterns:
            c = pc.count_substring_regex(t[col], pattern=pat)
            arr = c.to_numpy(zero_copy_only=False)
            names.append(name)
            matches.append(int(arr.sum()))
            docs.append(int((arr > 0).sum()))
        return pa.table({"pii_type": pa.array(names, pa.string()),
                         "n_matches": pa.array(matches, pa.int64()),
                         "n_docs": pa.array(docs, pa.int64())})

    p = ds.map_batches(partial, batch_format="pyarrow")
    out = merge_partials(p, ["pii_type"], ["n_matches", "n_docs"]).to_pandas()
    return out.sort_values("pii_type").reset_index(drop=True)


def add_dup_ngram_frac(batch: pa.Table, col: str = "text", n: int = 2,
                       out_col: str = "dup2_frac_bp") -> pa.Table:
    """Gopher-style repetition signal (Rae et al. 2021, "fraction of
    characters in duplicate n-grams"): per doc, the share of characters
    covered by word n-gram OCCURRENCES whose gram appears ≥ 2× in that
    doc, in basis points (``floor(frac·10⁴ + .5)`` — the cent-scaling tie
    rule, exact for any engine), capped at 10⁴: occurrences of a gram
    overlap in strings like ``a a a a``, so the raw occurrence-char sum
    can exceed the text length.  A gram occurrence covers its words plus
    the joining spaces.  Only n=2 is implemented (the headline Gopher
    cut); docs with < n words (or empty) score 0.

    One vectorized pass: Arrow space-split (single-space, matching the
    SQL oracle's ``string_split(text, ' ')``), stable word hashes, a
    (doc, gram-hash) lexsort, run-length duplicate marking, and a
    ``bincount`` fold back to docs.  64-bit gram hashing — a within-doc
    collision could inflate a count, at ~|grams|²/2⁶⁴ odds (the same
    trade the LSH family documents).
    """
    assert n == 2, "only the Gopher headline n=2 cut is implemented"
    nrows = batch.num_rows
    if nrows == 0:
        return batch.append_column(out_col, pa.array([], pa.int64()))
    text = batch[col]
    if text.null_count:
        text = pc.fill_null(text, "")
    split = pc.split_pattern(text, " ")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    flat = split.flatten()
    wl = pc.utf8_length(flat).cast(pa.int64()).to_numpy(zero_copy_only=False)
    n_words = pc.list_value_length(split).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    doc_of_word = np.repeat(np.arange(nrows, dtype=np.int64), n_words)
    total = len(wl)
    dup_chars = np.zeros(nrows, dtype=np.int64)
    if total > 1:
        h = pd.util.hash_array(
            flat.to_numpy(zero_copy_only=False).astype(object)
        ).astype(np.uint64)
        valid = np.empty(total, dtype=bool)
        valid[:-1] = doc_of_word[1:] == doc_of_word[:-1]
        valid[-1] = False
        gj = np.nonzero(valid)[0]
        if len(gj):
            gdoc = doc_of_word[gj]
            ghash = h[gj] * np.uint64(1000003) + h[gj + 1]
            glen = wl[gj] + wl[gj + 1] + 1
            order = np.lexsort((ghash, gdoc))
            gd, gh, gl = gdoc[order], ghash[order], glen[order]
            new_run = np.empty(len(gd), dtype=bool)
            new_run[0] = True
            new_run[1:] = (gd[1:] != gd[:-1]) | (gh[1:] != gh[:-1])
            run_id = np.cumsum(new_run) - 1
            dup_occ = np.bincount(run_id)[run_id] >= 2
            dup_chars = np.bincount(
                gd[dup_occ], weights=gl[dup_occ], minlength=nrows
            ).astype(np.int64)
    L = pc.utf8_length(text).cast(pa.int64()).to_numpy(zero_copy_only=False)
    frac_bp = np.zeros(nrows, dtype=np.int64)
    nz = L > 0
    frac_bp[nz] = np.floor(dup_chars[nz] * 10000.0 / L[nz] + 0.5).astype(np.int64)
    np.minimum(frac_bp, 10000, out=frac_bp)
    return batch.append_column(out_col, pa.array(frac_bp))


def word_topk(ds, k: int = 10, col: str = "text",
              limit: int | None = None) -> pd.DataFrame:
    """Top-K words by count, (n desc, word asc) tie-break — EXACT while the
    vocabulary stays under the cardinality guard.

    Per batch: Arrow split on single spaces → flatten → Arrow group_by
    count (the per-batch partial collapses to distinct words, so the merge
    sees vocabulary-sized partials, never word instances).  The driver fold
    is GUARDED (VERDICT r02 #2): past ``limit`` distinct words (default
    FOLD_GUARD_LIMIT — on web text the vocabulary is unbounded: URLs,
    typos, numbers) it auto-degrades to the mergeable Count-Min sketch +
    candidate fold of ``aggregates.merge_counts_guarded``, bounding driver
    memory; the returned frame records ``.attrs["mode"]`` ("exact"/"cms")."""
    import pyarrow.compute as pc

    from timberjack_ray.aggregates import merge_counts_guarded

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(batch[col], " "))
        g = pa.table({"word": words}).group_by("word").aggregate([([], "count_all")])
        return g.rename_columns(["word", "n"])

    folded = merge_counts_guarded(
        ds.map_batches(partial, batch_format="pyarrow"), "word", "n", limit)
    out = folded.top_k(k).astype({"n": "int64"})
    out.attrs["mode"] = folded.mode
    return out


def add_char_entropy(batch: pa.Table, col: str = "text",
                     out_col: str = "entropy_u") -> pa.Table:
    """Append per-doc byte-level Shannon entropy in MICRO-BITS (int64,
    ``floor(H·10⁶ + ½)``) — the classic gibberish/compressibility quality
    signal (low entropy ⇒ repeated filler, high ⇒ random noise; prose sits
    ~4-4.5 bits/byte).

    Vectorized across the whole batch: one flat uint8 view of the Arrow
    string buffer, one ``np.add.at`` into a (docs × 256) count grid, one
    xlogx reduction — no per-row Python.  Emitted as scaled int so the
    value is hashable in the driver compare; no SQL oracle (float log),
    a numpy reference test covers it instead.  Empty docs get entropy 0.
    """
    arr = batch[col].combine_chunks() if isinstance(batch[col], pa.ChunkedArray) else batch[col]
    n = len(arr)
    if n == 0:
        return batch.append_column(out_col, pa.array([], pa.int64()))
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    raw_offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)
    offs = raw_offs[arr.offset : arr.offset + n + 1].astype(np.int64)
    lens = np.diff(offs)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8,
                         count=int(offs[-1]))[int(offs[0]):]
    offs = offs - offs[0]
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    grid = np.zeros(n * 256, dtype=np.int64)
    np.add.at(grid, doc_idx * 256 + data[:int(offs[-1])], 1)
    grid = grid.reshape(n, 256).astype(np.float64)
    tot = np.maximum(lens, 1).astype(np.float64)
    p = grid / tot[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        xlogx = np.where(p > 0, p * np.log2(p), 0.0)
    ent = -xlogx.sum(axis=1)
    ent[lens == 0] = 0.0
    ent_u = np.floor(ent * 1_000_000 + 0.5).astype(np.int64)
    return batch.append_column(out_col, pa.array(ent_u))


# --- CCNet-style bigram language-model scoring (round 3) --------------------

def train_bigram_lm(ds, col: str = "text", limit: int | None = None):
    """In-corpus add-one-smoothed bigram LM: unigram + bigram counts via the
    GUARDED driver folds (open vocabularies degrade to CMS candidates —
    rare tails then score as unseen, which is the conservative direction
    for a quality filter).  Returns (uni_df, big_df, V, mode).

    At production scale the model side is a TRAINED, bounded artifact
    (CCNet ships a fixed KenLM); training it from the corpus itself here
    keeps the demo self-contained with the same broadcast-scoring shape.
    """
    from timberjack_ray.aggregates import merge_counts_guarded
    from timberjack_ray.functions.corpus import bigram_counts_partial

    def uni_partial(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(t[col], " "))
        g = pa.table({"word": words}).group_by("word").aggregate([([], "count_all")])
        return g.rename_columns(["word", "n"])

    uni = merge_counts_guarded(
        ds.map_batches(uni_partial, batch_format="pyarrow"), "word", "n", limit)
    big = merge_counts_guarded(
        ds.map_batches(lambda t: bigram_counts_partial(t, col),
                       batch_format="pyarrow"), "bigram", "n", limit)
    uni_df, big_df = uni.to_pandas(), big.to_pandas()
    mode = "exact" if (uni.mode == "exact" and big.mode == "exact") else "cms"
    return uni_df, big_df, int(len(uni_df)), mode


class BigramLMScorer:
    """Actor-pool stage: per-doc mean bits-per-bigram under a broadcast
    add-one-smoothed bigram LM — the perplexity-filter scoring pass
    (Wenzek et al., CCNet).  bits(doc) = mean_i −log2 P(w_i | w_{i−1}),
    P(b|a) = (c(a b) + 1) / (c(a) + V).

    Model (two count tables + V) is fetched from the object store ONCE per
    worker in ``__init__``; lookups are vectorized pandas hash-index
    reindexes over the flattened word/bigram arrays — no per-row Python.
    """

    def __init__(self, model_ref, id_col: str = "doc_id", col: str = "text"):
        import ray

        uni_df, big_df, v = ray.get(model_ref)
        self.uni = pd.Series(uni_df["n"].to_numpy(np.float64),
                             index=uni_df["word"])
        self.big = pd.Series(big_df["n"].to_numpy(np.float64),
                             index=big_df["bigram"])
        self.v = float(v)
        self.id_col, self.col = id_col, col

    def __call__(self, t: pa.Table) -> pa.Table:
        from timberjack_ray.functions.corpus import _word_offsets

        ids = t[self.id_col]
        words = pc.split_pattern(t[self.col], " ")
        flat, offsets = _word_offsets(words)
        n = len(flat)
        lens = np.diff(offsets)
        nb = np.maximum(lens - 1, 0)
        if n < 2 or int(nb.sum()) == 0:
            return pa.table({self.id_col: ids,
                             "n_bigrams": pa.array(nb),
                             "bits": pa.array(np.zeros(len(lens)))})
        left = flat.slice(0, n - 1)
        joined = pc.binary_join_element_wise(left, flat.slice(1, n - 1), " ")
        cb = self.big.reindex(joined.to_numpy(zero_copy_only=False)) \
            .fillna(0.0).to_numpy()
        cu = self.uni.reindex(left.to_numpy(zero_copy_only=False)) \
            .fillna(0.0).to_numpy()
        bits = np.log2(cu + self.v) - np.log2(cb + 1.0)
        # zero the slots that would cross a doc boundary, then one reduceat
        # per doc over its [start, next_start) slice of the (n-1) array
        last = offsets[1:] - 1
        bits[last[(last >= 0) & (last < n - 1)]] = 0.0
        starts = np.minimum(offsets[:-1], n - 1)
        sums = np.add.reduceat(np.append(bits, 0.0), starts)[: len(lens)]
        mean = np.where(nb > 0, sums / np.maximum(nb, 1), 0.0)
        return pa.table({self.id_col: ids, "n_bigrams": pa.array(nb),
                         "bits": pa.array(mean)})


def bigram_lm_scores(ds, id_col: str = "doc_id", col: str = "text",
                     limit: int | None = None, concurrency: int = 2):
    """Two-pass perplexity scoring: train (guarded folds) → broadcast the
    model once → one streaming actor-pool scoring pass.  Returns a Dataset
    of (id, n_bigrams, bits); filter on ``bits`` downstream (high bits =
    improbable text under the corpus LM)."""
    import ray

    uni_df, big_df, v, _mode = train_bigram_lm(ds, col, limit)
    ref = ray.put((uni_df, big_df, v))
    return ds.map_batches(
        BigramLMScorer,
        fn_constructor_kwargs={"model_ref": ref, "id_col": id_col, "col": col},
        batch_format="pyarrow", concurrency=concurrency)


def _flat_codepoints(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(uint32 codepoints of the concatenated strings, per-string char
    lens) via one buffer-level utf-8 → utf-32 decode (no per-row Python;
    the add_content_hash decode trick)."""
    n = len(arr)
    lens = pc.utf8_length(arr).cast(pa.int64()).to_numpy(zero_copy_only=False)
    if n == 0 or int(lens.sum()) == 0:
        return np.zeros(0, np.uint32), lens
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    boff = np.frombuffer(arr.buffers()[1], dtype=odt)
    start, stop = int(boff[arr.offset]), int(boff[arr.offset + n])
    raw = arr.buffers()[2].slice(start, stop - start).to_pybytes()
    codes = np.frombuffer(raw.decode("utf-8").encode("utf-32-le"),
                          dtype=np.uint32)
    return codes, lens


def bpe_pair_counts(ds, col: str = "text", k: int = 20) -> pd.DataFrame:
    """Top-K adjacent character pairs within words, corpus-weighted — the
    candidate table for the FIRST merge of BPE tokenizer training
    (Sennrich et al. 2016: repeatedly merge the most frequent adjacent
    symbol pair).  One map-side pass; per batch the flattened word chars
    decode once, pairs pack into uint64 keys ((cp1<<32)|cp2, exact for any
    Unicode scalar), word-boundary slots are masked, and a C group_by
    collapses to the distinct-pair set before the merge — merge volume is
    bounded by charset², independent of corpus size.  (Later BPE rounds
    re-run the same pass over the re-segmented symbol stream; each round
    is this operator.)

    Ties (n desc, pair asc) are broken on the decoded pair STRING to match
    SQL ORDER BY collation.
    """
    from timberjack_ray.aggregates import merge_partials

    def partial(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(t[col], " "))
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        codes, lens = _flat_codepoints(words)
        total = len(codes)
        if total < 2:
            return pa.table({"pair_key": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        key = (codes[:-1].astype(np.uint64) << np.uint64(32)) \
            | codes[1:].astype(np.uint64)
        ends = np.cumsum(lens)
        last = ends - 1  # last char of each word starts no pair
        mask = np.ones(total - 1, dtype=bool)
        mask[last[(last >= 0) & (last < total - 1)]] = False
        g = pa.table({"pair_key": pa.array(key[mask].view(np.int64))}) \
            .group_by("pair_key").aggregate([([], "count_all")])
        return g.rename_columns(["pair_key", "n"])

    merged = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                            ["pair_key"], "n").to_pandas()
    keys = merged["pair_key"].to_numpy().view(np.uint64)
    merged["pair"] = [chr(int(x >> np.uint64(32))) + chr(int(x & np.uint64(0xFFFFFFFF)))
                      for x in keys]  # decode only the merged (charset²) table
    out = merged.sort_values(["n", "pair"], ascending=[False, True]).head(k)
    return out[["pair", "n"]].reset_index(drop=True).astype({"n": "int64"})


def corpus_drift_words(ds_a, ds_b, col: str = "text", k: int = 20,
                       limit: int | None = None) -> pd.DataFrame:
    """Distribution-drift monitor between two corpus slices: the K words
    with the largest absolute count difference, as (word, n_a, n_b) INT
    rows (divergence math is the consumer's choice — emitting counts keeps
    the result exactly hashable and lets any engine replay it).

    The training-data-ops use: compare this week's crawl against last
    week's (or one source against the mix) and alert on vocabulary shift.
    One counting pass per side (per-batch partials collapse to the
    vocabulary before merging, GUARDED fold past ``limit`` distinct
    words); the driver joins two vocabulary-sized frames.
    """
    from timberjack_ray.aggregates import merge_counts_guarded

    def partial(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(t[col], " "))
        g = pa.table({"word": words}).group_by("word") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["word", "n"])

    sides = []
    for ds in (ds_a, ds_b):
        folded = merge_counts_guarded(
            ds.map_batches(partial, batch_format="pyarrow"),
            "word", "n", limit)
        sides.append(folded.to_pandas())
    a, b = sides
    m = a.merge(b, on="word", how="outer", suffixes=("_a", "_b")) \
        .fillna(0)
    m["n_a"] = m["n_a"].astype(np.int64)
    m["n_b"] = m["n_b"].astype(np.int64)
    m["diff"] = (m["n_a"] - m["n_b"]).abs()
    out = m.sort_values(["diff", "word"], ascending=[False, True]).head(k)
    return out[["word", "n_a", "n_b"]].reset_index(drop=True)


def _lev_eq_1(a: str, b: str) -> bool:
    """Exact Levenshtein-distance-== 1 check (verify step; candidate-pair
    scale only)."""
    la, lb = len(a), len(b)
    if a == b or abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = j = 0
    used = False
    while i < la and j < lb:
        if a[i] == b[j]:
            i += 1
            j += 1
        elif used:
            return False
        else:
            used = True
            j += 1
    return True


def typo_pairs(ds, col: str, n_buckets: int = 64, max_bucket: int = 512):
    """Similarity self-join at Levenshtein distance EXACTLY 1 over the
    column's DISTINCT values — SymSpell's deletion-neighborhood join
    (Garbe): two values are within edit distance 1 only if their
    {value} ∪ single-deletion key sets intersect, so candidates come from
    ONE groupby on the deletion key instead of the O(V²) cross join; a
    cheap exact verify drops the false positives (keys can coincide for
    distance-2 pairs, e.g. 'abc'/'bca').

    The entity-resolution / vocab-normalization step.  Scale shape: the
    distinct-value exchange is vocabulary-sized; key explosion and the
    verify loop run at value/candidate cardinality, never row cardinality;
    degenerate keys cap at ``max_bucket`` owners (deterministic, value
    asc).  Returns a pd.DataFrame of (a, b) pairs, a < b.
    """
    from timberjack_ray.functions.corpus import add_key_bucket

    distinct = ds.map_batches(
        lambda t: pa.table({"v": pc.unique(t[col])}),
        batch_format="pyarrow").groupby("v").count() \
        .map_batches(lambda t: t.select(["v"]), batch_format="pyarrow")

    def explode(t: pa.Table) -> pa.Table:
        keys, owners = [], []
        for v in t["v"].to_pylist():  # distinct-value scale, not rows
            keys.append(v)
            owners.append(v)
            for i in range(len(v)):
                keys.append(v[:i] + v[i + 1:])
                owners.append(v)
        return pa.table({"k": pa.array(keys, pa.string()),
                         "v": pa.array(owners, pa.string())})

    exploded = distinct.map_batches(explode, batch_format="pyarrow")
    bucketed = add_key_bucket(exploded, "k", n_buckets)

    def per_bucket(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.string()),
                          "b": pa.array([], pa.string())})
        if t.num_rows < 2:
            return empty
        k = t["k"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, k))
        ks, vs = k[order], v[order]
        # drop duplicate (key, owner) rows, cap degenerate keys
        first = np.r_[True, (ks[1:] != ks[:-1]) | (vs[1:] != vs[:-1])]
        ks, vs = ks[first], vs[first]
        change = np.r_[True, ks[1:] != ks[:-1]]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.r_[starts, len(ks)])
        rank = np.arange(len(ks)) - np.repeat(starts, sizes)
        keep = rank < max_bucket
        ks, vs = ks[keep], vs[keep]
        change = np.r_[True, ks[1:] != ks[:-1]]
        seg = np.cumsum(change)
        out_a, out_b = [], []
        max_size = int(np.diff(np.r_[np.flatnonzero(change),
                                     len(ks)]).max()) if len(ks) else 0
        for d in range(1, max_size):
            left = np.arange(len(ks) - d)
            same = seg[left] == seg[left + d]
            for i in left[same]:  # candidate-pair scale
                a, b = vs[i], vs[i + d]
                if a > b:
                    a, b = b, a
                if _lev_eq_1(a, b):
                    out_a.append(a)
                    out_b.append(b)
        if not out_a:
            return empty
        return pa.table({"a": pa.array(out_a, pa.string()),
                         "b": pa.array(out_b, pa.string())}) \
            .group_by(["a", "b"]).aggregate([])

    pairs = bucketed.groupby("__kb").map_groups(
        lambda t: per_bucket(t.drop_columns(["__kb"])),
        batch_format="pyarrow")
    out = pairs.to_pandas().drop_duplicates() \
        .sort_values(["a", "b"]).reset_index(drop=True)
    return out


def _apply_bpe_merge(sym: np.ndarray, wid: np.ndarray, bl: str, br: str):
    """One vectorized greedy left-to-right BPE merge over a flat symbol
    stream with word-id boundary masking: in each run of consecutive match
    positions keep even offsets from the run start (exact BPE semantics,
    "aaaa" -> aa+aa).  Shared by training (bpe_train) and application
    (BpeEncoder)."""
    valid = wid[:-1] == wid[1:]
    m = np.flatnonzero(valid & (sym[:-1] == bl) & (sym[1:] == br))
    if len(m) == 0:
        return sym, wid
    run_start = m.copy()
    if len(m) > 1:
        new_run = np.r_[True, np.diff(m) != 1]
        run_start = m[np.maximum.accumulate(
            np.where(new_run, np.arange(len(m)), 0))]
    keep = m[((m - run_start) % 2) == 0]
    sym[keep] = bl + br
    mask = np.ones(len(sym), dtype=bool)
    mask[keep + 1] = False
    return sym[mask], wid[mask]


def bpe_train(ds, col: str = "text", n_merges: int = 50,
              min_count: int = 2, limit: int | None = None) -> pd.DataFrame:
    """BPE tokenizer TRAINING (Sennrich et al. 2016) — the full merge loop,
    not just one pair-count round (``bpe_pair_counts``): learn ``n_merges``
    merges with the deterministic (count desc, pair asc) rule, stopping
    early when the best pair's count drops under ``min_count``.

    The 100-TB shape is the standard one (HF tokenizers): ONE distributed
    word-count pass collapses the corpus to its vocabulary histogram
    (GUARDED — past the cardinality limit it degrades to the CMS candidate
    set, recorded in ``.attrs["mode"]``; an approximate histogram trains an
    approximate-but-valid tokenizer), then the merge loop runs driver-side
    over vocabulary-sized arrays: per round one vectorized adjacent-pair
    count (word-boundary masked, weighted by word count) and one vectorized
    non-overlapping left-to-right collapse (runs of consecutive matches
    keep even offsets — exact greedy BPE semantics, e.g. "aaaa" → aa+aa).
    Corpus text is touched exactly once.

    Returns (rank, left, right, n) — the learned merge table."""
    import pyarrow.compute as pc

    from timberjack_ray.aggregates import merge_counts_guarded

    def partial(batch: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(batch[col], " "))
        g = pa.table({"word": words}).group_by("word") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["word", "n"])

    folded = merge_counts_guarded(
        ds.map_batches(partial, batch_format="pyarrow"), "word", "n", limit)
    hist = folded.to_pandas()
    hist = hist[(hist["n"] >= 1) & (hist["word"].astype(str).str.len() > 0)]
    vocab = hist["word"].astype(str).to_numpy(dtype=object)
    wn = hist["n"].to_numpy().astype(np.int64)

    # flat symbol stream: one char per slot, word ids for boundary masking
    sym = np.array([c for w in vocab for c in w], dtype=object)
    wid = np.repeat(np.arange(len(vocab), dtype=np.int64),
                    [len(w) for w in vocab])
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        if len(sym) < 2:
            break
        valid = wid[:-1] == wid[1:]
        if not valid.any():
            break
        l, r = sym[:-1][valid], sym[1:][valid]
        w = wn[wid[:-1][valid]]
        pc_df = pd.DataFrame({"l": l, "r": r, "w": w}) \
            .groupby(["l", "r"], sort=False)["w"].sum().reset_index()
        pc_df = pc_df.sort_values(["w", "l", "r"],
                                  ascending=[False, True, True])
        best = pc_df.iloc[0]
        if int(best["w"]) < min_count:
            break
        bl, br, bn = str(best["l"]), str(best["r"]), int(best["w"])
        merges.append((bl, br, bn))
        sym, wid = _apply_bpe_merge(sym, wid, bl, br)
    out = pd.DataFrame(merges, columns=["left", "right", "n"])
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    out = out.astype({"n": "int64"})
    out.attrs["mode"] = folded.mode
    return out


class BpeEncoder:
    """Actor-pool stage applying a learned BPE merge table: per batch ONE
    flat char stream over all words, then each merge as one vectorized
    ``_apply_bpe_merge`` pass (rank order — exactly the greedy rule the
    trainer used), then per-doc token counts by reduceat.  The merge table
    rides the closure (tiny: n_merges rows); state (the parsed merge list)
    builds once per actor in ``__init__``.  Emits (id, n_words, n_bpe) —
    the fertility statistic (bpe tokens per word) per doc."""

    def __init__(self, merges: list[tuple[str, str]], col: str = "text",
                 id_col: str = "doc_id", keep_cols: list[str] | None = None):
        self.merges = [(str(l), str(r)) for l, r in merges]
        self.col = col
        self.id_col = id_col
        self.keep_cols = keep_cols or []

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            cols = {self.id_col: t[self.id_col],
                    "n_words": pa.array([], pa.int64()),
                    "n_bpe": pa.array([], pa.int64())}
            for c in self.keep_cols:
                cols[c] = t[c]
            return pa.table(cols)
        words = pd.Series(t[self.col].to_pylist(), dtype=object) \
            .astype(str).str.split(" ")
        wc = words.str.len().to_numpy(dtype=np.int64)
        flat_words = words.explode().to_numpy(dtype=object)
        # encode each DISTINCT word once (token count depends only on the
        # word string), then map back through the inverse index — the
        # per-char work shrinks by the corpus word-duplication factor
        uniq, inv = np.unique(flat_words.astype(str), return_inverse=True)
        sym = np.array([c for w in uniq for c in w], dtype=object)
        wid = np.repeat(np.arange(len(uniq), dtype=np.int64),
                        [len(w) for w in uniq])
        for bl, br in self.merges:
            sym, wid = _apply_bpe_merge(sym, wid, bl, br)
        per_uniq = np.bincount(wid, minlength=len(uniq)).astype(np.int64)
        per_word = per_uniq[inv]
        w_offs = np.concatenate([[0], np.cumsum(wc)])[:-1]
        n_bpe = np.add.reduceat(per_word, w_offs) if len(per_word) else \
            np.zeros(n, np.int64)
        n_bpe[wc == 0] = 0
        cols = {self.id_col: t[self.id_col],
                "n_words": pa.array(wc),
                "n_bpe": pa.array(n_bpe.astype(np.int64))}
        for c in self.keep_cols:
            cols[c] = t[c]
        return pa.table(cols)


def bpe_token_counts(ds, n_merges: int = 20, col: str = "text",
                     id_col: str = "doc_id",
                     keep_cols: list[str] | None = None):
    """Train-then-apply BPE round trip: learn ``n_merges`` merges
    (``bpe_train`` — one histogram pass), broadcast the merge table inside
    the encoder stage, and stream per-doc (n_words, n_bpe) fertility rows
    (plus ``keep_cols`` passthrough for downstream grouping).  Returns a
    Dataset."""
    m = bpe_train(ds, col=col, n_merges=n_merges)
    merges = list(zip(m["left"], m["right"]))
    return ds.map_batches(
        BpeEncoder(merges, col=col, id_col=id_col, keep_cols=keep_cols),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# DSIR-style hashed-unigram importance weights (data selection)
# ---------------------------------------------------------------------------

def _feature_buckets(flat_words: pa.Array, n_feat: int) -> np.ndarray:
    """Hashed-feature bucket per word: codepoint-Horner fold mod 2^64
    (corpus.horner_hash_strings — the SQL-replayable family shared with
    the winnowing/MinHash oracles) mod ``n_feat``.  Round 5 switched
    this from pandas siphash so DSIR weights became oracle-checkable
    (the DuckDB replay folds the same list_reduce Horner per word)."""
    from timberjack_ray.functions.corpus import horner_hash_strings

    if not isinstance(flat_words, (pa.Array, pa.ChunkedArray)):
        flat_words = pa.array(flat_words, pa.string())
    h = horner_hash_strings(flat_words)
    return (h % np.uint64(n_feat)).astype(np.int64)


def dsir_weights(ds, target_col: str, target_val: str,
                 id_col: str = "doc_id", col: str = "text",
                 n_feat: int = 1 << 16, lam: float = 1.0):
    """Data Selection via Importance Resampling (Xie et al. 2023, public
    method): per-doc log importance weight under hashed-UNIGRAM bag-of-
    words models of a TARGET slice (rows where ``target_col ==
    target_val``) vs the RAW corpus:

        log w(d) = Σ_f c_f(d) · [log p_t(f) − log p_r(f)],

    p estimated add-λ smoothed over ``n_feat`` hash buckets.  Hashing
    makes BOTH model sides bounded at ``n_feat`` BY CONSTRUCTION — the
    open web vocabulary never reaches the driver, so this needs no
    cardinality guard (that is DSIR's own trick, and why it runs at
    trillion-token scale).

    Plan: ONE streaming pass computing (bucket, n_target, n_raw) count
    partials per batch (merge volume ≤ n_feat rows) → driver builds the
    2·n_feat log-prob ratio vector (n_feat·8 B broadcast) → ONE streaming
    scoring pass (hash, gather, per-doc reduceat — no per-row Python).
    Returns a row-volume Dataset of (id, n_words, logw); selection (top
    fraction / Gumbel resampling) is the consumer's stream op.
    """
    import ray

    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.corpus import _word_offsets
    from timberjack_ray.functions.util import fetch_broadcast

    def count_partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t[col], " ")
        flat, offsets = _word_offsets(words)
        b = _feature_buckets(flat, n_feat)
        is_t = np.repeat(
            pc.equal(t[target_col], target_val).to_numpy(
                zero_copy_only=False).astype(np.int64),
            np.diff(offsets))
        g = pa.table({"bucket": pa.array(b),
                      "n_t": pa.array(is_t),
                      "n_r": pa.array(np.ones(len(b), dtype=np.int64))}) \
            .group_by(["bucket"]).aggregate([("n_t", "sum"), ("n_r", "sum")])
        return g.rename_columns(["bucket", "n_t", "n_r"])

    folded = merge_partials(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        ["bucket"], ["n_t", "n_r"])
    ct = np.zeros(n_feat, dtype=np.float64)
    cr = np.zeros(n_feat, dtype=np.float64)
    bk = folded["bucket"].to_numpy(zero_copy_only=False)
    ct[bk] = folded["n_t"].to_numpy(zero_copy_only=False)
    cr[bk] = folded["n_r"].to_numpy(zero_copy_only=False)
    logw = (np.log(ct + lam) - np.log(ct.sum() + lam * n_feat)) \
        - (np.log(cr + lam) - np.log(cr.sum() + lam * n_feat))
    ref = ray.put(logw)

    def score(t: pa.Table) -> pa.Table:
        w = fetch_broadcast(ref)
        words = pc.split_pattern(t[col], " ")
        flat, offsets = _word_offsets(words)
        lens = np.diff(offsets)
        vals = w[_feature_buckets(flat, n_feat)] if len(flat) else \
            np.array([], dtype=np.float64)
        starts = np.minimum(offsets[:-1], max(len(vals) - 1, 0))
        sums = np.add.reduceat(np.append(vals, 0.0), starts)[: len(lens)] \
            if len(lens) else np.array([], dtype=np.float64)
        sums = np.where(lens > 0, sums, 0.0)
        return pa.table({id_col: t[id_col],
                         "n_words": pa.array(lens),
                         "logw": pa.array(sums)})

    return ds.map_batches(score, batch_format="pyarrow")


def bm25_topk(ds, query: str, id_col: str = "doc_id", col: str = "text",
              k: int = 10, k1: float = 1.2, b: float = 0.75):
    """Okapi BM25 retrieval: top-k docs for one query over the corpus —
    the data-selection / search primitive on top of the inverted-index
    family.  Two streaming passes, BOTH bounded by |query terms|, never
    vocabulary: pass 1 folds (per-term df, N, Σdl) — |terms|+1 partial
    rows per batch; pass 2 scores each doc against the broadcast
    (idf, avgdl) model (one is-in mask + reduceat per term — terms are
    few by definition) and prunes to k per batch, so the driver merge
    sees k × batches rows.  idf = ln(1 + (N−df+0.5)/(df+0.5)) (the
    non-negative "plus" variant, public Robertson/Sparck-Jones form).
    Scores are doubles, but every operation is IEEE-replayable in SQL
    (libm idf, fixed sorted-term summation order in the scorer), so the
    milli-scaled floor is oracle-checked (bm25_docs); raw numbers also
    pinned vs an independent reference in tests/test_text_lm.py."""
    import ray

    from timberjack_ray.aggregates import merge_partials
    from timberjack_ray.functions.corpus import _word_offsets
    from timberjack_ray.functions.relational import sorted_topk
    from timberjack_ray.functions.util import fetch_broadcast

    terms = sorted(set(query.split(" ")))
    tset = pa.array(terms, pa.string())

    def stats_partial(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t[col], " ")
        flat, offsets = _word_offsets(words)
        lens = np.diff(offsets)
        nd = len(lens)
        rows_t, rows_df = ["\x00stats"], [0]
        rows_n, rows_dl = [nd], [int(lens.sum())]
        for term in terms:
            m = pc.equal(flat, term).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            tf = np.add.reduceat(np.append(m, 0), np.minimum(
                offsets[:-1], max(len(m) - 1, 0)))[:nd] if len(m) else \
                np.zeros(nd, np.int64)
            tf = np.where(lens > 0, tf, 0)
            rows_t.append(term)
            rows_df.append(int((tf > 0).sum()))
            rows_n.append(0)
            rows_dl.append(0)
        return pa.table({"term": pa.array(rows_t),
                         "df": pa.array(rows_df, pa.int64()),
                         "n": pa.array(rows_n, pa.int64()),
                         "dl": pa.array(rows_dl, pa.int64())})

    folded = merge_partials(
        ds.map_batches(stats_partial, batch_format="pyarrow"),
        ["term"], ["df", "n", "dl"]).to_pandas().set_index("term")
    n_docs = int(folded.loc["\x00stats", "n"])
    avgdl = float(folded.loc["\x00stats", "dl"]) / max(n_docs, 1)
    # math.log (libm), NOT np.log: DuckDB's ln is libm and numpy's SIMD
    # log deviates by 1 ULP on some inputs — libm here makes the idf
    # doubles BIT-IDENTICAL to the SQL oracle's, which (with the fixed
    # term-order sum) makes the milli-scaled scores exactly replayable
    idf = {t: math.log(1.0 + (n_docs - int(folded.loc[t, "df"]) + 0.5)
                       / (int(folded.loc[t, "df"]) + 0.5))
           for t in terms if t in folded.index}
    ref = ray.put((idf, avgdl))

    def score(t: pa.Table) -> pa.Table:
        model_idf, model_avgdl = fetch_broadcast(ref)
        words = pc.split_pattern(t[col], " ")
        flat, offsets = _word_offsets(words)
        lens = np.diff(offsets).astype(np.float64)
        nd = len(lens)
        s = np.zeros(nd, dtype=np.float64)
        norm = k1 * (1.0 - b + b * lens / max(model_avgdl, 1e-12))
        for term, w in model_idf.items():
            m = pc.equal(flat, term).to_numpy(zero_copy_only=False) \
                .astype(np.float64) if len(flat) else np.zeros(0)
            tf = np.add.reduceat(np.append(m, 0.0), np.minimum(
                offsets[:-1], max(len(m) - 1, 0)))[:nd] if len(m) else \
                np.zeros(nd)
            tf = np.where(lens > 0, tf, 0.0)
            s += w * (tf * (k1 + 1.0)) / np.maximum(tf + norm, 1e-12)
        # retrieval semantics: docs matching no query term don't rank
        return pa.table({id_col: t[id_col],
                         "score": pa.array(s)}).filter(pa.array(s > 0.0))

    scored = ds.map_batches(score, batch_format="pyarrow")
    return sorted_topk(scored, ["score", id_col], k,
                       descending=[True, False])


def compress_ratio_by_group(ds, group_col: str = "source",
                            col: str = "text", level: int = 6):
    """Per-group COMPRESSIBILITY — the redundancy/boilerplate signal
    (highly compressible text ≈ templated or repetitive, a classic
    corpus-quality proxy): exact (n_docs, raw_bytes, zlib_bytes) per
    group, compressed PER DOCUMENT so the sums are independent of batch
    boundaries and partitioning (batch-level compression would leak
    cross-doc redundancy into the measurement AND break determinism).

    zlib at a fixed level is deterministic for a given input, so the
    integer sums are engine-stable; the per-payload C call is the same
    actor-pool-CPU shape as the multimodal codecs (not a vectorizable
    kernel — the payload IS the work unit).  Partial volume = one row
    per group per batch.  Returns (group, n_docs, raw_b, comp_b);
    ratio = the consumer's division."""
    import zlib

    from timberjack_ray.aggregates import merge_partials

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "raw_b": pa.array([], pa.int64()),
                             "comp_b": pa.array([], pa.int64())})
        texts = t[col].to_pylist()
        groups = t[group_col].to_pylist()
        raw = np.fromiter((len(s.encode("utf-8")) for s in texts),
                          np.int64, len(texts))
        comp = np.fromiter(
            (len(zlib.compress(s.encode("utf-8"), level)) for s in texts),
            np.int64, len(texts))
        df = pd.DataFrame({group_col: groups, "raw_b": raw,
                           "comp_b": comp})
        g = df.groupby(group_col, as_index=False).agg(
            n_docs=("raw_b", "size"), raw_b=("raw_b", "sum"),
            comp_b=("comp_b", "sum"))
        return pa.Table.from_pandas(g[[group_col, "n_docs", "raw_b",
                                       "comp_b"]], preserve_index=False)

    out = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                         [group_col], ["n_docs", "raw_b", "comp_b"]) \
        .to_pandas()
    return out.sort_values(group_col).reset_index(drop=True) \
        .astype({"n_docs": "int64", "raw_b": "int64", "comp_b": "int64"})


def rrf_fusion_topk(ds, id_col: str, score_cols: list[str], k: int = 20,
                    k_rrf: int = 60, scale: int = 10**12,
                    hist_limit: int = 2_000_000) -> pd.DataFrame:
    """Reciprocal-rank fusion of N deterministic integer rankings: each
    row ranks within every ``score_cols`` column by RANK() semantics
    (rank = 1 + count of rows with a STRICTLY greater score — ties share
    a rank, which is what makes the rank derivable from a histogram),
    and the fused score is the pure-integer

        rrf = sum_i  scale // (k_rrf + rank_i)

    — Cormack et al.'s reciprocal-rank fusion with the float 1/(k+r)
    scaled to an exact integer so the SQL oracle (RANK() OVER + integer
    floor division) replays it bit-for-bit.  Returns the top-``k`` rows
    by (rrf desc, id asc) with each per-column rank alongside — the
    hybrid-retrieval combiner (BM25 list + ANN list -> one list) run
    here over any integer relevance signals.

    Scale shape: TWO streaming passes and no row-level shuffle — pass 1
    folds per-column (value, count) histogram partials (merge bounded by
    the score DOMAIN, guarded by ``hist_limit``); the driver converts
    each histogram to a strictly-greater prefix table broadcast via
    ``ray.put``; pass 2 maps every row to its ranks + fused score by
    ``searchsorted`` and a distributed ``sorted_topk`` keeps <= k rows
    per block.  Rank ties share a value by construction, so no
    within-tie global ordering (the thing that WOULD need a sort) is
    ever required."""
    import ray

    from timberjack_ray.aggregates import merge_partials_or_ds
    from timberjack_ray.functions.relational import sorted_topk
    from timberjack_ray.functions.util import fetch_broadcast

    cols = list(score_cols)

    def hist_partial(t: pa.Table) -> pa.Table:
        outs = []
        for i, c in enumerate(cols):
            g = pa.table({"col": pa.array(
                np.full(t.num_rows, i, dtype=np.int64)),
                "val": t[c].cast(pa.int64())}) \
                .group_by(["col", "val"]).aggregate([([], "count_all")])
            outs.append(g.rename_columns(["col", "val", "n"]))
        return pa.concat_tables(outs)

    hist, mode = merge_partials_or_ds(
        ds.map_batches(hist_partial, batch_format="pyarrow"),
        ["col", "val"], ["n"], hist_limit)
    if mode != "driver":
        raise ValueError(
            f"rrf_fusion_topk: score-value domain exceeds hist_limit="
            f"{hist_limit}; bucket the scores (the rank census no longer "
            f"broadcasts)")
    hcol = hist["col"].to_numpy(zero_copy_only=False)
    hval = hist["val"].to_numpy(zero_copy_only=False)
    hn = hist["n"].to_numpy(zero_copy_only=False)
    maps = []
    for i in range(len(cols)):
        m = hcol == i
        vals = hval[m]
        ns = hn[m]
        order = np.argsort(vals)
        vals, ns = vals[order], ns[order]
        # strictly-greater counts: suffix sum excluding the value itself
        greater = np.r_[np.cumsum(ns[::-1])[::-1][1:], 0]
        maps.append((vals, greater))
    maps_ref = ray.put(maps)

    def rank_fuse(t: pa.Table) -> pa.Table:
        ms = fetch_broadcast(maps_ref)
        out = {id_col: t[id_col]}
        rrf = np.zeros(t.num_rows, dtype=np.int64)
        for i, c in enumerate(cols):
            vals, greater = ms[i]
            x = t[c].cast(pa.int64()).to_numpy(zero_copy_only=False)
            r = greater[np.searchsorted(vals, x)] + 1
            out[f"rank_{c}"] = pa.array(r.astype(np.int64))
            rrf += scale // (k_rrf + r)
        out["rrf"] = pa.array(rrf)
        return pa.table(out)

    out = sorted_topk(ds.map_batches(rank_fuse, batch_format="pyarrow"),
                      ["rrf", id_col], k, descending=[True, False])
    if out.empty:
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             **{f"rank_{c}": pd.Series([], dtype="int64")
                                for c in cols},
                             "rrf": pd.Series([], dtype="int64")})
    keep = [id_col] + [f"rank_{c}" for c in cols] + ["rrf"]
    return out[keep].reset_index(drop=True).astype("int64")
