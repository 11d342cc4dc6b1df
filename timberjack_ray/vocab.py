"""Deterministic token vocabulary for pre-tokenized log sequences.

The engine's input is a Parquet table of pre-tokenized sequences
(``doc_id:string, tokens:list<int32>, n_tok:int32, source:string`` — see
BASELINE.json ``input_hint``).  ``detokenize(tokens)`` must reproduce one log
line byte-for-byte so the analysis semantics of the reference
(/root/reference/src/analyzer.rs) can be applied to the decoded text.

Token id scheme (fixed forever — ids are stable across versions):

* ``0..255``    — single character ``chr(id)`` (covers ASCII + Latin-1;
                  variable payload like timestamps, request ids, numbers).
* ``256``       — word separator (a single space).
* ``257..``     — whole words from the static ``WORDS`` list below
                  (message-pool words of the reference's benchmark
                  generators: /root/reference/src/bin/create_benchmark_logs.rs:40-83
                  and /root/reference/benchmark/create_json_logs.py:9-25, plus
                  JSON-template fragments and non-ASCII fixture words).

``detokenize`` is fully vectorized: flatten the Arrow list column, gather
piece strings with ``pc.take``, re-wrap with the original offsets and
``pc.binary_join`` with an empty separator.  No Python-per-row work.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SPACE_ID = 256
WORD_BASE = 257

# Static whole-word vocabulary.  Appending is allowed (new ids), reordering or
# removing is NOT (would change the meaning of existing token ids).
_LEVELS = ["ERROR", "WARN", "INFO", "DEBUG", "TRACE", "SEVERE", "WARNING", "FINE"]

_GENERIC_MESSAGE_WORDS = [
    # words of the 20-message pool, create_benchmark_logs.rs:49-70
    "NullPointerException", "in", "WebController.java:42",
    "Connection", "timeout", "NetworkClient.java:86",
    "Database", "query", "took", "2.3s", "DatabaseService.java:128",
    "Application", "started", "successfully",
    "Session", "created", "for", "user_123",
    "OutOfMemoryError", "SearchIndexer.java:212",
    "Failed", "to", "process", "request:", "invalid", "parameters",
    "Cache", "miss", "key:", "user_profile_123",
    "Authentication", "successful",
    "Request", "processed", "150ms",
    "500", "Internal", "Server", "Error:", "POST", "/api/orders",
    "403", "Forbidden:", "Access", "denied", "user_456",
    "Slow", "database", "operation", "detected", "(query", "3.5s)",
    "Memory", "usage", "at", "75%", "of", "allocated", "heap",
    "hit", "ratio:", "65.4%", "(last", "hour)",
    "API", "rate", "limit", "exceeded", "client_789",
    "Garbage", "collection", "cycle", "completed", "250ms",
    "System", "backup", "(estimated", "time:", "15m)",
    "Certificate", "expiring", "30", "days", "(domain.com)",
    "Configuration", "loaded", "from", "/etc/config.json",
]

_JSON_WORDS = [
    # json.dumps(default separators) pieces: '{"key": "value", ...}' split on ' '
    '{"timestamp":', '"service":', '"level":', '"message":', '"request_id":',
    '"status":', '"response_time":', '"request":', '{"method":', '"path":',
    '"headers":', '{"content-type":', '"user-agent":', '"Mozilla/5.0"},',
    '"user":', '{"id":', '"role":', '"error":', '{"type":', '"code":',
    # common value fragments
    '"api",', '"auth",', '"payment",', '"database",', '"frontend",',
    '"cache",', '"search",', '"notification",',
    '"INFO",', '"WARN",', '"ERROR",', '"DEBUG",',
    '"GET",', '"POST",', '"PUT",', '"DELETE",',
    '"application/json",', '"text/html",', '"application/xml",',
    '"admin"},', '"user"},', '"guest"},',
    '"NullPointerException",', '"ConnectionTimeout",',
    '"AuthenticationFailure",', '"DatabaseError",',
    # message values (leading-quote / trailing-quote-comma variants)
    '"Request', 'successfully",', '"Database', 'completed",',
    '"Authentication', 'successful",', '"Failed', 'login', 'attempt",',
    '"Payment', 'processed",', '"Connection', 'timeout",', '"Cache', 'miss",',
    '"User', 'profile', 'updated",', 'WebController",', '"Rate',
    'exceeded",', '"Slow', 'detected",', 'token', 'expired",',
]

_EDGE_WORDS = [
    # non-ASCII fixture words (tests/edge_cases.rs:46-81) that are not
    # encodable char-by-char below 256
    "日本語", "テスト", "状態：エラー", "ошибка", "错误",
    "你好，世界!", "エラーが発生しました",
]

WORDS: list[str] = list(
    dict.fromkeys(_LEVELS + [f"[{lv}]" for lv in _LEVELS] + _GENERIC_MESSAGE_WORDS + _JSON_WORDS + _EDGE_WORDS)
)

_WORD2ID = {w: WORD_BASE + i for i, w in enumerate(WORDS)}

VOCAB_SIZE = WORD_BASE + len(WORDS)

# piece[i] -> string contributed by token i
_PIECES: list[str] = [chr(i) for i in range(256)] + [" "] + WORDS
PIECE_ARRAY: pa.Array = pa.array(_PIECES, type=pa.string())


def encode_word(word: str) -> list[int]:
    """Encode one whitespace-free word to token ids."""
    wid = _WORD2ID.get(word)
    if wid is not None:
        return [wid]
    out = []
    for ch in word:
        cp = ord(ch)
        if cp >= 256:
            raise ValueError(
                f"character {ch!r} (U+{cp:04X}) not encodable: add the word {word!r} to vocab.WORDS"
            )
        out.append(cp)
    return out


def encode(line: str) -> list[int]:
    """Encode one log line (single-space-joined words round-trip exactly;
    runs of spaces are preserved via empty words)."""
    toks: list[int] = []
    for i, word in enumerate(line.split(" ")):
        if i:
            toks.append(SPACE_ID)
        toks.extend(encode_word(word))
    return toks


def decode(tokens) -> str | None:
    """Scalar decode (tests / oracle).  None for undecodable token ids —
    the analog of the reference silently skipping invalid-UTF-8 lines
    (src/analyzer.rs:299-304)."""
    try:
        return "".join(_PIECES[t] for t in tokens)
    except (IndexError, TypeError):
        return None


def _detok_one(arr: pa.ListArray) -> pa.StringArray:
    values = arr.flatten()  # honors slice offset of the list array
    # fast all-valid probe: one min_max pass + null_count beats building the
    # per-token validity mask (which cost more than the take+join combined)
    if len(values) and values.null_count == 0:
        mm = pc.min_max(values)
        if mm["min"].as_py() >= 0 and mm["max"].as_py() < len(_PIECES):
            pieces = pc.take(PIECE_ARRAY, values)
            offsets = pc.subtract(arr.offsets, arr.offsets[0])
            joined = pa.ListArray.from_arrays(offsets.cast(pa.int32()), pieces)
            return pc.binary_join(joined, "")
    valid = pc.and_kleene(
        pc.is_valid(values),
        pc.and_(pc.greater_equal(values, 0), pc.less(values, len(_PIECES))),
    )
    if not bool(pc.min(valid.cast(pa.uint8())).as_py() if len(valid) else 1):
        # rows containing any out-of-vocab id decode to NULL (and are then
        # dropped by the parse stage's empty-line filter) — mirroring the
        # reference's silent skip of undecodable lines
        import numpy as np

        vmask = valid.to_numpy(zero_copy_only=False).astype(bool)
        offs = np.asarray(arr.offsets, dtype=np.int64)
        offs = offs - offs[0]
        row_ok = np.logical_and.reduceat(
            np.concatenate([vmask, [True]]), offs[:-1]
        ) if len(offs) > 1 else np.zeros(0, dtype=bool)
        row_ok[offs[:-1] == offs[1:]] = True  # empty lists are fine
        values = pc.if_else(valid, values, pa.scalar(0, values.type))
        pieces = pc.take(PIECE_ARRAY, values)
        offsets = pc.subtract(arr.offsets, arr.offsets[0])
        joined = pa.ListArray.from_arrays(offsets.cast(pa.int32()), pieces)
        flat = pc.binary_join(joined, "")
        return pc.if_else(pa.array(row_ok), flat, pa.scalar(None, pa.string()))
    pieces = pc.take(PIECE_ARRAY, values)
    offsets = pc.subtract(arr.offsets, arr.offsets[0])
    joined = pa.ListArray.from_arrays(offsets.cast(pa.int32()), pieces)
    return pc.binary_join(joined, "")


def detokenize(list_arr: pa.ListArray | pa.ChunkedArray) -> pa.StringArray | pa.ChunkedArray:
    """Vectorized detokenization of a ``list<int32>`` Arrow array.

    Zero Python-per-row work: gather piece strings for the flattened values
    (``pc.take`` against the static piece table) and join them back per row
    with the original list offsets (``pc.binary_join``).
    """
    if isinstance(list_arr, pa.ChunkedArray):
        return pa.chunked_array(
            [_detok_one(c) for c in list_arr.chunks], type=pa.string()
        )
    return _detok_one(list_arr)


def encode_batch(lines: list[str]) -> pa.ListArray:
    """Encode many lines to a ``list<int32>`` array (generator-side)."""
    offsets = [0]
    values: list[int] = []
    for line in lines:
        values.extend(encode(line))
        offsets.append(len(values))
    return pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(values, type=pa.int32())
    )


def _codepoints_of(arr: pa.StringArray):
    """(codes uint32, per-string char offsets int64) — one utf-8→utf-32
    decode of the whole value buffer (the add_content_hash trick)."""
    lens = pc.utf8_length(arr).cast(pa.int64()).to_numpy(zero_copy_only=False)
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    boff = np.frombuffer(arr.buffers()[1], dtype=odt)
    start = int(boff[arr.offset])
    stop = int(boff[arr.offset + len(arr)])
    raw = arr.buffers()[2].slice(start, stop - start).to_pybytes() \
        if stop > start else b""
    codes = np.frombuffer(raw.decode("utf-8").encode("utf-32-le"),
                          dtype=np.uint32)
    offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    return codes, offs


def encode_batch_arrow(lines: pa.Array, on_error: str = "raise",
                       return_mask: bool = False):
    """Vectorized twin of ``encode_batch`` (same output, bit for bit):
    Arrow split → one hash-map lookup over the flattened word stream →
    ragged scatter of word ids / codepoints / space tokens.  No per-line
    Python — this is the INGEST-side hot path (raw logs → the input_hint
    sequences table at 100 TB), where the generator-grade Python loop of
    ``encode_batch`` would dominate the pipeline.  Caveat measured on this
    sandbox (BASELINE.md §host): its wide-array passes are memory-bandwidth
    bound and the VM sustains <1 GB/s, so HERE the scalar loop is ~3×
    faster at 50 k-line batches — the crossover favors this path on any
    host with normal DRAM bandwidth.

    ``on_error``: ``"raise"`` mirrors ``encode_word``'s ValueError on an
    unencodable codepoint (≥ U+0100 outside the word vocabulary);
    ``"skip"`` drops offending LINES instead — the reference's behavior
    for undecodable input (src/analyzer.rs:299-304).  Skipped lines
    simply do not appear in the output; pass ``return_mask=True`` to get
    ``(tokens, keep)`` where ``keep`` is a bool ndarray over the INPUT
    lines, so callers (ingest) can keep line numbers without a per-line
    Python probe.
    """
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    lines = pc.fill_null(lines, "")
    n = len(lines)

    def _ret(toks, keep):
        return (toks, keep) if return_mask else toks

    if n == 0:
        return _ret(pa.ListArray.from_arrays(pa.array([0], pa.int32()),
                                             pa.array([], pa.int32())),
                    np.zeros(0, dtype=bool))
    words_list = pc.split_pattern(lines, " ")
    words = words_list.flatten()
    w_per_line = pc.list_value_length(words_list).to_numpy(
        zero_copy_only=False).astype(np.int64)
    nw = len(words)
    # vocab lookup: dictionary-encode the flat word stream (C hashing),
    # then one Python dict probe per DISTINCT word — log batches repeat a
    # tiny word set, so this is the step that makes the whole encoder
    # beat the scalar loop (a per-word pandas .map materializes every
    # word as a Python string and is 3× slower than the loop)
    enc = words.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    lut = np.array([_WORD2ID.get(w, -1) for w in uniq] or [-1],
                   dtype=np.int64)
    wid = lut[enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)]
    known = wid >= 0
    wlen = pc.utf8_length(words).cast(pa.int64()).to_numpy(
        zero_copy_only=False)
    # word's line index + whether it gets a leading space (index > 0)
    line_of_word = np.repeat(np.arange(n, dtype=np.int64), w_per_line)
    w_starts = np.concatenate([[0], np.cumsum(w_per_line)])[:-1]
    lead = np.ones(nw, dtype=np.int64)
    lead[w_starts[w_per_line > 0]] = 0
    codes, coffs = _codepoints_of(words)
    if not known.all():
        # unencodable codepoints live only in UNKNOWN words (vocab words
        # may contain ≥ U+0100 — they encode as one id)
        unk = ~known
        bad_char = codes >= 256
        if bad_char.any():
            char_word = np.repeat(np.arange(nw, dtype=np.int64), wlen)
            bad_words = np.unique(char_word[bad_char])
            bad_words = bad_words[unk[bad_words]]
            if len(bad_words):
                if on_error != "skip":
                    raise ValueError(
                        "encode_batch_arrow: unencodable codepoint ≥ U+0100 "
                        "outside the word vocabulary (pass on_error='skip' "
                        "to drop such lines)")
                bad_lines = np.unique(line_of_word[bad_words])
                keep = np.ones(n, dtype=bool)
                keep[bad_lines] = False
                toks = encode_batch_arrow(lines.filter(pa.array(keep)),
                                          on_error="raise")
                return _ret(toks, keep)
    # tokens contributed per word (1 for vocab words, |word| otherwise)
    tw = np.where(known, 1, wlen)
    piece_len = lead + tw
    piece_off = np.concatenate([[0], np.cumsum(piece_len)]).astype(np.int64)
    out = np.empty(int(piece_off[-1]), dtype=np.int32)
    # spaces
    sp = np.flatnonzero(lead)
    out[piece_off[sp]] = SPACE_ID
    # known word ids
    kn = np.flatnonzero(known)
    out[piece_off[kn] + lead[kn]] = wid[kn].astype(np.int32)
    # unknown words: ragged copy of their codepoints
    un = np.flatnonzero(~known)
    if len(un):
        ulen = wlen[un]
        within = np.arange(int(ulen.sum()), dtype=np.int64) \
            - np.repeat(np.concatenate([[0], np.cumsum(ulen)])[:-1], ulen)
        tgt = np.repeat(piece_off[un] + lead[un], ulen) + within
        src = np.repeat(coffs[un], ulen) + within
        out[tgt] = codes[src].astype(np.int32)
    # line offsets = per-line sums of piece lengths; split(" ") yields ≥ 1
    # word for EVERY line (an empty line is one empty word), so w_starts
    # are always valid, strictly increasing reduceat boundaries
    line_tok = np.add.reduceat(np.append(piece_len, 0), w_starts)[:n]
    offsets = np.concatenate([[0], np.cumsum(line_tok)]).astype(np.int32)
    return _ret(pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                         pa.array(out, pa.int32())),
                np.ones(n, dtype=bool))
