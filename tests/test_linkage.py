"""FastSS deletion-neighborhood edit-distance-1 linkage vs brute force."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from timberjack_ray.functions.linkage import ed1_neighbor_census, ed1_pairs


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_pairs(words):
    out = set()
    for i in range(len(words)):
        for j in range(i + 1, len(words)):
            if _lev(words[i], words[j]) == 1:
                out.add((i, j))
    return out


def test_ed1_pairs_match_bruteforce_small_alphabet(ray_session):
    """Dense distance structure: 300 distinct strings over {a,b,c} with
    lengths 0..6 (includes the empty string, many same-variant
    collisions, and both substitution and insert/delete pairs)."""
    rng = np.random.default_rng(7)
    seen = set()
    while len(seen) < 300:
        length = int(rng.integers(0, 7))
        seen.add("".join(rng.choice(list("abc"), length)))
    words = sorted(seen)
    df = pd.DataFrame({"w": words,
                       "id": np.arange(len(words), dtype=np.int64)})
    want = _brute_pairs(words)

    got_rows = ed1_pairs(rd.from_pandas(df).repartition(5), "w", "id",
                         n_buckets=16).take_all()
    got = [(r["a"], r["b"]) for r in got_rows]
    assert len(got) == len(set(got)), "pair emitted twice"
    assert set(got) == want

    # degree census agrees with the brute-force degree histogram
    deg = {i: 0 for i in range(len(words))}
    for a, b in want:
        deg[a] += 1
        deg[b] += 1
    from collections import Counter
    hist = Counter(deg.values())
    ref = pd.DataFrame(sorted(hist.items()),
                       columns=["n_nb", "n_names"]).astype("int64")
    got_c = ed1_neighbor_census(rd.from_pandas(df).repartition(5), "w",
                                "id", n_buckets=16)
    assert got_c.reset_index(drop=True).equals(ref)


def test_ed1_pairs_non_ascii_fallback(ray_session):
    """Multibyte codepoints exercise the per-variant fallback path; the
    ASCII twin 'hello' pairs with the accented variants it is one
    substitution away from."""
    words = ["héllo", "hällo", "héllò", "hello", "héllo!", "hé"]
    df = pd.DataFrame({"w": words,
                       "id": np.arange(len(words), dtype=np.int64)})
    want = _brute_pairs(words)
    got = {(r["a"], r["b"]) for r in
           ed1_pairs(rd.from_pandas(df), "w", "id", n_buckets=4).take_all()}
    assert got == want and len(want) >= 4


def test_ed1_same_variant_different_positions_not_paired(ray_session):
    """'ab'/'ba' share deletion variant 'b' (positions 0 and 1) but are
    at distance 2 — the equal-position certificate must refuse them,
    while 'ab'/'cb' (same position 0) and 'ab'/'b' (self-vs-deletion)
    qualify."""
    words = ["ab", "ba", "cb", "b"]
    df = pd.DataFrame({"w": words, "id": np.arange(4, dtype=np.int64)})
    got = {(r["a"], r["b"]) for r in
           ed1_pairs(rd.from_pandas(df), "w", "id", n_buckets=2).take_all()}
    assert got == _brute_pairs(words)
    assert (0, 1) not in got


@pytest.mark.parametrize("seed", [1, 2])
def test_ed1_partitioning_invariance(ray_session, seed):
    """Same pair set regardless of input partitioning and bucket count."""
    rng = np.random.default_rng(seed)
    seen = set()
    while len(seen) < 120:
        length = int(rng.integers(1, 8))
        seen.add("".join(rng.choice(list("ab"), length)))
    words = sorted(seen)
    df = pd.DataFrame({"w": words,
                       "id": np.arange(len(words), dtype=np.int64)})
    a = {(r["a"], r["b"]) for r in
         ed1_pairs(rd.from_pandas(df).repartition(1), "w", "id",
                   n_buckets=1).take_all()}
    b = {(r["a"], r["b"]) for r in
         ed1_pairs(rd.from_pandas(df).repartition(7), "w", "id",
                   n_buckets=32).take_all()}
    assert a == b == _brute_pairs(words)


def test_ed1_verify_vectorized():
    """The pairwise verifier agrees with DP levenshtein == 1 on all
    structural cases: substitution, insert/delete at every position,
    equal strings, distance-2, multibyte codepoints, empty string."""
    cases = [
        ("abc", "abd", True), ("abc", "abc", False), ("abc", "xbc", True),
        ("abc", "ab", True), ("abc", "bc", True), ("abc", "ac", True),
        ("abc", "a", False), ("ab", "ba", False), ("", "a", True),
        ("", "", False), ("héllo", "hällo", True), ("héllo", "héll", True),
        ("aaaa", "aaa", True), ("abcd", "badc", False),
        ("xay", "xby", True), ("xy", "xyz", True),
    ]
    from timberjack_ray.functions.linkage import _ed1_verify
    got = _ed1_verify(np.array([c[0] for c in cases], object),
                      np.array([c[1] for c in cases], object))
    for (x, y, want), g in zip(cases, got):
        assert bool(g) == want, (x, y, want)
        # symmetric
    got_r = _ed1_verify(np.array([c[1] for c in cases], object),
                        np.array([c[0] for c in cases], object))
    assert (got == got_r).all()


def test_snm_candidate_census_matches_bruteforce(ray_session):
    """SNM census vs a single-process sorted-window reference, with
    block sizes far smaller than the window (junctions spanning several
    blocks)."""
    rng = np.random.default_rng(13)
    seen = set()
    while len(seen) < 160:
        length = int(rng.integers(1, 7))
        seen.add("".join(rng.choice(list("abc"), length)))
    words = sorted(seen)
    rng.shuffle(words)
    df = pd.DataFrame({"w": words,
                       "id": np.arange(len(words), dtype=np.int64)})
    w = 5
    sw = sorted(words)
    cand = match = 0
    for i in range(len(sw)):
        for j in range(i + 1, min(i + w, len(sw))):
            cand += 1
            match += 1 if _lev(sw[i], sw[j]) == 1 else 0

    from timberjack_ray.functions.linkage import snm_candidate_census
    got = snm_candidate_census(rd.from_pandas(df).repartition(40),
                               "w", "id", window=w)
    assert got.iloc[0]["n_candidates"] == cand
    assert got.iloc[0]["n_matches"] == match


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(st.sets(st.text(alphabet="abσ", min_size=0, max_size=5),
               min_size=2, max_size=40))
def test_ed1_certificates_agree_with_verifier_fuzz(words):
    """Two INDEPENDENT distance-1 implementations must agree on every
    random dictionary: the FastSS positional-certificate kernel
    (no string comparison) vs the pairwise padded-matrix verifier —
    run driver-side on a single table, no Ray."""
    import pyarrow as pa

    from timberjack_ray.functions.linkage import (_deletion_records,
                                                  _ed1_pairs_segmented,
                                                  _ed1_verify)

    ws = sorted(words)
    t = pa.table({"w": pa.array(ws, pa.string()),
                  "id": pa.array(range(len(ws)), pa.int64())})
    recs = _deletion_records(t, "w", "id")
    got = {(r["a"], r["b"])
           for r in _ed1_pairs_segmented(recs).to_pylist()}

    xs, ys = [], []
    for i in range(len(ws)):
        for j in range(i + 1, len(ws)):
            xs.append(ws[i])
            ys.append(ws[j])
    if xs:
        ver = _ed1_verify(np.array(xs, object), np.array(ys, object))
        want = set()
        k = 0
        for i in range(len(ws)):
            for j in range(i + 1, len(ws)):
                if ver[k]:
                    want.add((i, j))
                k += 1
    else:
        want = set()
    assert got == want
