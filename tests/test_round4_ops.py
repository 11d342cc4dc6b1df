"""Kernel-level properties for the round-4 late additions — Ray-free
(pure numpy/pyarrow), complementing the DuckDB gate in
tests/test_entry_queries.py which covers the end-to-end results."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from __ray_entry__ import _CMS_A, _CMS_B, _dbl_midranks


def naive_dbl_midranks(y):
    """2 × average rank (1-based), brute force."""
    y = list(y)
    out = []
    for v in y:
        less = sum(1 for x in y if x < v)
        eq = sum(1 for x in y if x == v)
        # midrank = less + (eq + 1) / 2  →  doubled = 2·less + eq + 1
        out.append(2 * less + eq + 1)
    return out


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-50, 50), min_size=1, max_size=60))
def test_dbl_midranks_matches_naive(vals):
    got = _dbl_midranks(np.array(vals, dtype=np.int64)).tolist()
    assert got == naive_dbl_midranks(vals)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 2**63 - 1), min_size=1, max_size=200),
       st.integers(1, 4))
def test_ams_state_is_linear_in_batch_splits(hashes, n_splits):
    """Adding the same multiset in any batch partition yields the same
    AMS state — the property that makes per-batch partials fold exactly."""
    from timberjack_ray.functions.sketch import AMSF2

    h = np.array(hashes, dtype=np.uint64)
    whole = AMSF2()
    whole.add_hashed(h)
    parts = AMSF2()
    for chunk in np.array_split(h, n_splits):
        parts.add_hashed(chunk)
    assert (whole.state == parts.state).all()


def test_cms_checked_constants_never_undercount():
    """With the literal multiply-shift rows the query layer pins, every
    estimate is ≥ the true count (CMS one-sided error)."""
    from timberjack_ray.functions.corpus import horner_hash_strings
    from timberjack_ray.functions.sketch import CountMinSketch

    rng = np.random.RandomState(7)
    words = [f"w{int(i)}" for i in rng.zipf(1.5, 5000) % 800]
    arr = pa.array(words, pa.string())
    cms = CountMinSketch(4, 8192)
    cms.a = np.array(_CMS_A, np.uint64)
    cms.b = np.array(_CMS_B, np.uint64)
    h = horner_hash_strings(arr)
    cms.add_hashed(h)
    uniq, true = np.unique(np.array(words, dtype=object),
                           return_counts=True)
    est = cms.query_hashed(horner_hash_strings(
        pa.array(uniq.tolist(), pa.string())))
    assert (est >= true).all()


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 2**64 - 1))
def test_hll_rank_equals_bit_length_form(h):
    """The add_hashed binary clz loop equals 65 − bit_length((h<<p)|2^(p-1))
    — the identity the SQL oracle relies on (p = 14)."""
    from timberjack_ray.functions.sketch import HyperLogLog

    p = 14
    hll = HyperLogLog(p)
    hll.add_hashed(np.array([h], dtype=np.uint64))
    idx = h >> (64 - p)
    rest = ((h << p) | (1 << (p - 1))) & (2**64 - 1)
    assert hll.registers[idx] == 65 - rest.bit_length()
