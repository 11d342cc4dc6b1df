"""Property-based tests (hypothesis): vectorized kernels must agree with
the line-at-a-time oracle on ARBITRARY inputs, and the token vocabulary
must round-trip any encodable line.  The reference has no property tests
(SURVEY.md §5.6); these guard the vectorized/scalar split that the
reference never had to worry about."""

import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from timberjack_ray import kernels, oracle, vocab
from timberjack_ray.config import AnalyzeConfig
from timberjack_ray.stream import analyze_stream

# lines of printable latin-1 (the vocab encodes codepoints < 256)
line_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=255),
    min_size=0, max_size=120,
)
lines_st = st.lists(line_st, min_size=1, max_size=40)


@settings(max_examples=60, deadline=None)
@given(line_st)
def test_vocab_roundtrip(line):
    assert vocab.decode(vocab.encode(line)) == line


@settings(max_examples=30, deadline=None)
@given(lines_st)
def test_vectorized_level_matches_oracle(lines):
    arr = pa.array(lines, type=pa.string())
    got = kernels.extract_level(pa.chunked_array([arr])).to_pylist()
    for line, lv in zip(lines, got):
        m = kernels.LEVEL_RE.search(line)
        expect = (m.group(1) or m.group(0)).upper() if m else ""
        assert (lv or "") == expect, line


@settings(max_examples=30, deadline=None)
@given(lines_st)
def test_stream_report_matches_oracle(lines):
    o = oracle.analyze_lines(lines, fmt="generic",
                             collect_trends=True, collect_stats=True)
    rep = analyze_stream(iter(lines), AnalyzeConfig(trend=True, stats=True),
                         fmt="generic", chunk_rows=7)
    assert rep["total_count"] == o.count
    trends = {d["timestamp"]: d["count"] for d in (rep["time_trends"] or [])}
    assert trends == o.time_trends
    levels = {d["level"]: d["count"] for d in rep["stats"]["log_levels"]} if rep["stats"] else {}
    assert levels == o.levels_count
    if rep["stats"]:
        assert rep["stats"]["unique_messages_count"] == len(o.unique_messages)


@settings(max_examples=30, deadline=None)
@given(lines_st, st.sampled_from(["ERROR", "info", "Warn"]))
def test_level_filter_matches_oracle(lines, level):
    o = oracle.analyze_lines(lines, fmt="generic", level=level)
    rep = analyze_stream(iter(lines), AnalyzeConfig(level=level), chunk_rows=5,
                         fmt="generic")
    assert rep["total_count"] == o.count


# --- JSON parse + field-filter parity fuzz (guards the round-2 targeted
# filter-key lookup in stages/parse.ParseStage._parse_json, which replaced
# the full dotted flatten for undotted keys) ---

_scalar_st = st.one_of(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                                   blacklist_characters='"\\'),
            max_size=8),
    st.integers(min_value=-1000, max_value=1000),
    st.booleans(),
    st.none(),
)
_key_st = st.sampled_from(
    ["level", "severity", "timestamp", "service", "user_id", "k", "x y", "a.b"])
_value_st = st.one_of(
    _scalar_st,
    st.dictionaries(_key_st, _scalar_st, max_size=3),
    st.lists(_scalar_st, max_size=3),
)
_obj_st = st.dictionaries(_key_st, _value_st, max_size=6)
_json_line_st = st.one_of(
    _obj_st.map(lambda o: __import__("json").dumps(o)),
    st.sampled_from(['{broken', 'not json', '42', '"scalar"', '[]',
                     '{"level": null, "severity": "X"}']),
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_json_line_st, min_size=1, max_size=20),
       st.sampled_from([("service", "api"), ("level", "ERROR"), ("k", "null"),
                        ("a.b", "1"), ("user_id", "12")]))
def test_json_field_filter_matches_oracle(lines, filt):
    from timberjack_ray.stages.parse import ParseStage

    key, val = filt
    cfg = AnalyzeConfig(fields=[f"{key}={val}"], stats=True, trend=True)
    stage = ParseStage(cfg, fmt="json")
    batch = pa.table({"line": pa.array(lines, pa.string())})
    got = stage(batch)
    o = oracle.analyze_lines(lines, fmt="json", field_filters={key: val},
                             collect_trends=True, collect_stats=True)
    assert got.num_rows == o.count
    got_levels = {}
    for lv in got["level"].to_pylist():
        got_levels[lv or ""] = got_levels.get(lv or "", 0) + 1
    assert got_levels == o.levels_count


# --- Columnar JSON fast-path engagement / bail-out (guards the round-2
# pyarrow.json parse in ParseStage._parse_json_columnar: the fuzz above
# checks parity whichever path runs; these pin WHICH path runs) ---

def _mk_stage(fields=("level=ERROR",), **cfg_kwargs):
    from timberjack_ray.stages.parse import ParseStage

    cfg = AnalyzeConfig(fields=list(fields), **cfg_kwargs)
    return ParseStage(cfg, fmt="json")


def test_columnar_json_engages_on_clean_input():
    st_ = _mk_stage()
    lines = pa.chunked_array([pa.array(
        ['{"level": "ERROR", "service": "api"}',
         '{"level": "info"}',
         '{"severity": "WARN", "x": 1}',      # non-needed numeric field ok
         '{}'])])
    got = st_._parse_json_columnar(lines, want_ts=False)
    assert got is not None
    ts, level, mask = got
    assert level.to_pylist() == ["ERROR", "info", "WARN", None]
    # row 0 matches; row 1 value mismatch; rows 2-3 lack the key and the
    # raw line contains neither substring -> substring fallback rejects
    assert mask.to_pylist() == [True, False, False, False]


def test_columnar_json_bails_to_exact_loop():
    st_ = _mk_stage()
    cases = {
        "malformed": ['{"level": "a"}', "{broken"],
        "scalar_row": ["42", '{"level": "a"}'],
        "numeric_needed_key": ['{"level": 5}'],
        "container_needed_key": ['{"level": {"a": 1}}'],
        "duplicate_key": ['{"level": "a", "level": "b"}'],
        # a newline INSIDE one element that splits it into two JSON docs
        # must be caught by the row-count check (a newline as mere JSON
        # whitespace, e.g. '{"level":\n "a"}', parses identically on both
        # paths and is allowed through)
        "embedded_newline_rowcount": ['{"level": "a"}\n{"level": "b"}'],
    }
    for name, lines in cases.items():
        got = st_._parse_json_columnar(pa.chunked_array([pa.array(lines)]),
                                       want_ts=False)
        assert got is None, name
    # dotted filter key needs the 100-field-cap flatten
    dotted = _mk_stage(fields=("a.b=1",))
    assert dotted._parse_json_columnar(
        pa.chunked_array([pa.array(['{"a": {"b": 1}}'])]), want_ts=False) is None


def test_columnar_json_ts_and_full_stage_parity():
    # same batch through the full stage twice: once columnar, once with the
    # columnar path disabled -> identical output tables
    from timberjack_ray.stages.parse import ParseStage

    lines = ['{"timestamp": "2025-03-21T04:05:06", "level": "ERROR", "service": "api"}',
             '{"time": "2025-03-21 05:00:00", "severity": "warn"}',
             '{"level": "ERROR", "msg": "no ts here 2025-03-22 10:11:12"}',
             'ERROR: raw generic line 2025-03-23 01:02:03']
    # last line is malformed JSON -> whole batch takes the per-row loop;
    # drop it for the engaged-columnar comparison
    clean = lines[:3]
    cfg = AnalyzeConfig(fields=["service=api"], stats=True, trend=True)
    stage = ParseStage(cfg, fmt="json")
    batch = pa.table({"line": pa.array(clean, pa.string())})
    assert stage._parse_json_columnar(pa.chunked_array([pa.array(clean)]),
                                      want_ts=True) is not None
    out_fast = stage(batch)
    stage._parse_json_columnar = lambda lines, want_ts: None
    out_slow = stage(batch)
    assert out_fast.equals(out_slow)


# -- round-3 second-session kernels (pure units, no Ray session needed) ------

import numpy as np

ts_seq_st = st.lists(st.integers(min_value=0, max_value=500), min_size=1,
                     max_size=120)


@settings(max_examples=60, deadline=None)
@given(ts_seq_st, st.integers(min_value=1, max_value=30),
       st.integers(min_value=0, max_value=20))
def test_windower_chunking_invariant_and_conserves_events(seq, width, late):
    from timberjack_ray.functions.window import EventTimeWindower

    arr = np.array(seq, dtype=np.int64) * 1_000_000

    def run(chunk):
        w = EventTimeWindower(width_s=width, lateness_s=late)
        for i in range(0, len(arr), chunk):
            w.feed(arr[i : i + chunk])
        return w.result(), w.late_dropped

    r1, d1 = run(1)
    r2, d2 = run(len(arr))
    assert d1 == d2 and r1.equals(r2)
    assert int(r1["n"].sum()) + d1 == len(arr)
    # brute-force replay of the rule: exclusive prefix max watermark
    prior = np.iinfo(np.int64).min
    kept: dict[int, int] = {}
    dropped = 0
    W = width * 1_000_000
    for t in arr.tolist():
        w0 = (t // W) * W
        if prior >= w0 + W + late * 1_000_000:
            dropped += 1
        else:
            kept[w0] = kept.get(w0, 0) + 1
        prior = max(prior, t)
    assert dropped == d1
    got = dict(zip(r1["window_start"].astype("int64"), r1["n"]))
    assert got == kept


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=-3, max_value=3), min_size=1,
                max_size=60),
       st.integers(min_value=1, max_value=8))
def test_tiesafe_topk_matches_lexsort_reference(scores, k):
    from timberjack_ray.functions.similarity import _topk_rows_tiesafe

    s = np.array(scores, dtype=np.int64)[:, None]  # one query, heavy ties
    ids = np.arange(len(s), dtype=np.int64)[::-1].copy()  # descending ids
    rows, qidx = _topk_rows_tiesafe(s, ids, k)
    order = np.lexsort((ids, -s[:, 0]))[: min(k, len(s))]
    assert rows.tolist() == order.tolist()


@settings(max_examples=40, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=255),
               min_size=0, max_size=80))
def test_char_entropy_matches_counter_reference(txt):
    from collections import Counter

    from timberjack_ray.functions.text import add_char_entropy

    got = add_char_entropy(pa.table({"text": [txt]}))["entropy_u"][0].as_py()
    b = txt.encode("utf-8")
    if not b:
        exp = 0.0
    else:
        c = Counter(b)
        exp = -sum((v / len(b)) * np.log2(v / len(b)) for v in c.values())
    assert got == int(np.floor(exp * 1_000_000 + 0.5))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=1, max_size=80),
       st.integers(min_value=1, max_value=4))
def test_pagerank_driver_invariants(edges, n_iter):
    from timberjack_ray.functions.graph import PAGERANK_TOTAL, _pagerank_driver

    u = np.array([e[0] for e in edges], dtype=np.int64)
    v = np.array([e[1] for e in edges], dtype=np.int64)
    out = _pagerank_driver(u, v, n_iter=n_iter)
    r = out["rank_fp"].to_numpy()
    nodes = out["node"].to_numpy()
    n = len(nodes)
    base = (15 * (PAGERANK_TOTAL // n)) // 100
    # mass only leaks (dangling + floor division), never inflates
    assert r.sum() <= PAGERANK_TOTAL
    # every node keeps at least the teleport base term
    assert (r >= base).all()
    # a node with no in-edges sits exactly at base
    sinks = set(nodes) - set(v.tolist())
    for s in sinks:
        assert int(out.loc[out["node"] == s, "rank_fp"].iloc[0]) == base


@settings(max_examples=60, deadline=None)
@given(lines_st)
def test_encode_batch_arrow_matches_scalar(lines):
    from timberjack_ray import vocab

    a = vocab.encode_batch_arrow(pa.array(lines, pa.string()))
    b = vocab.encode_batch(lines)
    assert a.to_pylist() == b.to_pylist()


class _SpanRef:
    """Independent dict-based reference for the span-dedup pair."""

    @staticmethod
    def positions(docs, k):
        wins = {}
        for d, text in enumerate(docs):
            ws = text.split(" ")
            for p in range(len(ws) - k + 1):
                wins.setdefault(tuple(ws[p:p + k]), []).append((d, p))
        out = set()
        for occ in wins.values():
            if len(occ) >= 2:
                out.update(occ)
        return out

    @staticmethod
    def removed(docs, k):
        wins = {}
        for d, text in enumerate(docs):
            ws = text.split(" ")
            for p in range(len(ws) - k + 1):
                wins.setdefault(tuple(ws[p:p + k]), []).append((d, p))
        dele = [set() for _ in docs]
        for occ in wins.values():
            if len(occ) >= 2:
                for d, p in sorted(occ)[1:]:
                    dele[d].update(range(p, p + k))
        return [" ".join(w for i, w in enumerate(t.split(" "))
                         if i not in dele[d])
                for d, t in enumerate(docs)]


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12)
    .map(" ".join),
    min_size=1, max_size=8))
def test_span_dedup_pair_matches_reference(ray_session, docs):
    """Tiny alphabet forces duplicated spans at every alignment, incl. the
    exactly-k-word boundary the r03 review caught."""
    import ray.data as rd

    from timberjack_ray.functions.dedup import (dup_span_positions,
                                                remove_dup_spans)

    k = 3
    ds = rd.from_arrow(pa.table({
        "doc_id": list(range(len(docs))), "text": docs}))
    pos_df = dup_span_positions(ds, span_words=k).to_pandas()
    # an all-empty result Dataset drops its schema in to_pandas (Ray quirk)
    got_pos = set() if pos_df.empty else \
        set(map(tuple, pos_df[["doc_id", "pos"]].to_numpy()))
    assert got_pos == _SpanRef.positions(docs, k)
    got_txt = remove_dup_spans(ds, span_words=k).to_pandas() \
        .sort_values("doc_id")["text"].tolist()
    assert got_txt == _SpanRef.removed(docs, k)


def _bpe_ref(docs, n_merges, min_count=2):
    """Independent dict/list BPE reference: greedy left-to-right merging,
    (count desc, pair asc) rule, corpus as word histogram."""
    from collections import Counter

    hist = Counter(w for d in docs for w in d.split(" ") if w)
    words = {w: list(w) for w in hist}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += hist[w]
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        if n < min_count:
            break
        merges.append((l, r, n))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.lists(st.text(alphabet="abc", min_size=1, max_size=5),
             min_size=1, max_size=10).map(" ".join),
    min_size=1, max_size=6),
    st.integers(min_value=1, max_value=8))
def test_bpe_train_matches_reference(ray_session, docs, n_merges):
    import ray.data as rd

    from timberjack_ray.functions.text import bpe_train

    ds = rd.from_arrow(pa.table({"text": docs}))
    got = bpe_train(ds, n_merges=n_merges)
    want = _bpe_ref(docs, n_merges)
    assert [tuple(r) for r in got[["left", "right", "n"]].values] == want


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),      # band
              st.integers(min_value=0, max_value=5),      # key
              st.integers(min_value=0, max_value=40)),    # doc
    min_size=0, max_size=120))
def test_bucket_pair_expand_matches_bruteforce(rows):
    from itertools import combinations

    from timberjack_ray.functions.dedup import bucket_pair_expand

    t = pa.table({"band": pa.array([r[0] for r in rows], pa.int64()),
                  "key": pa.array([r[1] for r in rows], pa.int64()),
                  "doc": pa.array([r[2] for r in rows], pa.int64())})
    got = bucket_pair_expand(t, ["band", "key"])
    got_set = set(zip(got["a"].to_pylist(), got["b"].to_pylist()))

    want = set()
    for (b, k), grp in __import__("itertools").groupby(
            sorted(rows), key=lambda r: (r[0], r[1])):
        docs = sorted({d for _, _, d in grp})
        for x, y in combinations(docs, 2):
            want.add((x, y))
    # duplicate docs inside one bucket never self-pair
    assert got_set == want
