"""Mergeable sketches for extreme-cardinality aggregates.

The reference keeps every distinct message in a HashSet (exact,
src/analyzer.rs:348-355) — fine at single-node log sizes, impossible at
10^12 sequences where distinct-key families outgrow any single heap.  The
engine's exact paths (hashed-key partial merge, Ray groupby) stay the
default; HyperLogLog is the documented fallback when the distinct count
itself is the product and billions of keys are expected:

    per-batch HLL register arrays (2^p bytes each)  →  elementwise-max
    merge (a commutative monoid, so partial/final works anywhere)  →
    driver-side estimate from ONE register array.

Sketch volume is batches × 2^p bytes regardless of cardinality.
Standard bias-corrected estimator (Flajolet et al. 2007) with the
small-range linear-counting correction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from timberjack_ray.aggregates import merge_partials


class HyperLogLog:
    """Fixed 2^p uint8 registers; add pre-hashed uint64 values."""

    def __init__(self, p: int = 14):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashed(self, hashes: np.ndarray) -> None:
        h = np.asarray(hashes, dtype=np.uint64)
        if len(h) == 0:
            return
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | (np.uint64(1) << np.uint64(self.p - 1))
        # rank = leading zeros of the remaining bits + 1 (bounded by sentinel)
        rank = np.zeros(len(h), dtype=np.uint8)
        remaining = rest.copy()
        # vectorized leading-zero count via float64 exponent trick is unsafe
        # near 2^64; do a 6-step binary count instead (log2 of 64)
        shift = np.uint64(32)
        width = np.zeros(len(h), dtype=np.uint64)
        cur = remaining
        for step in (32, 16, 8, 4, 2, 1):
            s = np.uint64(step)
            high = cur >> (np.uint64(64) - s)
            is_zero = high == 0
            width = np.where(is_zero, width + s, width)
            cur = np.where(is_zero, cur << s, cur)
        rank = (width + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def add_strings(self, values) -> None:
        arr = np.array(["\0" if v is None else str(v) for v in values], dtype=object)
        self.add_hashed(pd.util.hash_array(arr))

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def merge_registers(self, regs: np.ndarray) -> None:
        np.maximum(self.registers, np.asarray(regs, dtype=np.uint8), out=self.registers)

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        inv = np.ldexp(1.0, -self.registers.astype(np.int64))
        raw = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if raw <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return float(raw)


def hll_estimate_milli(registers) -> int:
    """IEEE-deterministic HLL estimate, milli-scaled floor — the round-5
    oracle-checkable estimator: Σ 2^(64−M_j) folds as an EXACT integer
    (python int here, HUGEINT in SQL), the double conversion is
    round-half-even in both engines, alpha·m²·2⁶⁴/S is a fixed
    left-associated chain whose power-of-two factors are rounding-free,
    and the linear-counting branch uses libm log ≡ DuckDB ln.  Requires
    m = len(registers) to be a power of two (exact double multiplies)."""
    import math

    regs = np.asarray(registers, dtype=np.int64)
    m = len(regs)
    assert m & (m - 1) == 0 and m > 0
    counts = np.bincount(regs, minlength=65)
    s_int = sum(int(c) << (64 - r) for r, c in enumerate(counts) if c)
    mf = float(m)
    alpha = 0.7213 / (1.0 + 1.079 / mf)
    raw = alpha * mf * mf * 18446744073709551616.0 / float(s_int)
    zeros = int(counts[0])
    if raw <= 2.5 * mf and zeros:
        est = mf * math.log(mf / zeros)
    else:
        est = raw
    return math.floor(est * 1000.0)


def hll_over(ds, col: str, p: int = 14, hasher=None) -> HyperLogLog:
    """One 2^p-byte sketch per batch, register-max merge streamed to the
    driver; returns the merged HyperLogLog (the shared streaming fold for
    every HLL consumer — entry-module queries pass a splitmix64
    ``hasher`` over integer ids to stay SQL-replayable; the default is
    the process-stable string siphash)."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        if hasher is None:
            hll.add_strings(batch[col].to_pylist())
        else:
            hll.add_hashed(hasher(batch[col]))
        return pa.table({"regs": pa.array([hll.registers.tobytes()], pa.binary())})

    total = HyperLogLog(p)
    for b in ds.map_batches(sketch_batch, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for regs in b["regs"].to_pylist():
            total.merge_registers(np.frombuffer(regs, dtype=np.uint8))
    return total


def approx_distinct(ds, col: str, p: int = 14) -> float:
    """Approximate COUNT(DISTINCT col): ~0.8% relative error at p=14."""
    return hll_over(ds, col, p).estimate()


def approx_distinct_by(ds, group_col: str, col: str, p: int = 10) -> pd.DataFrame:
    """Grouped approximate distinct: per-(batch, group) sketches (2^p bytes
    each — default 1 KiB so many groups stay cheap), max-merged per group."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        df = batch.select([group_col, col]).to_pandas()
        rows_g, rows_r = [], []
        for g, sub in df.groupby(group_col, sort=False):
            hll = HyperLogLog(p)
            hll.add_strings(sub[col].tolist())
            rows_g.append(g)
            rows_r.append(hll.registers.tobytes())
        return pa.table({group_col: pa.array(rows_g), "regs": pa.array(rows_r, pa.binary())})

    merged: dict = {}
    for b in ds.map_batches(sketch_batch, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for g, regs in zip(b[group_col].to_pylist(), b["regs"].to_pylist()):
            if g not in merged:
                merged[g] = HyperLogLog(p)
            merged[g].merge_registers(np.frombuffer(regs, dtype=np.uint8))
    return pd.DataFrame({group_col: list(merged.keys()),
                         "approx_distinct": [h.estimate() for h in merged.values()]})


class CountMinSketch:
    """depth × width int64 counters over pre-hashed uint64 keys.

    Row hashes are (a_i·x + b_i) mod 2^64 mod width (multiply-shift
    family); the table merges by elementwise ADDITION — a commutative
    monoid like the HLL register max, so per-batch partials fold anywhere.
    Estimates only ever OVER-count (min across rows bounds the error by
    ~2·N/width with prob. 1−2^−depth; Cormode & Muthukrishnan 2005).
    """

    def __init__(self, depth: int = 4, width: int = 8192, seed: int = 101):
        self.depth, self.width = depth, width
        rng = np.random.RandomState(seed)
        self.a = (rng.randint(1, 1 << 62, size=depth).astype(np.uint64) << np.uint64(1)) \
            | np.uint64(1)  # odd multipliers
        self.b = rng.randint(0, 1 << 62, size=depth).astype(np.uint64)
        self.table = np.zeros((depth, width), dtype=np.int64)

    def _cols(self, hashes: np.ndarray) -> np.ndarray:
        x = np.asarray(hashes, dtype=np.uint64)
        mixed = self.a[:, None] * x[None, :] + self.b[:, None]  # wraps mod 2^64
        # multiply-shift: take the HIGH 32 bits.  (mixed % width) would use
        # only the low bits, and with odd multipliers every row's column
        # then depends solely on x mod width — fully correlated rows, so
        # keys congruent mod width collide in EVERY row (observed: ~19
        # all-row collisions among 400 keys at width 4096).
        return ((mixed >> np.uint64(32)) % np.uint64(self.width)).astype(np.int64)

    def add_hashed(self, hashes: np.ndarray, counts: np.ndarray | None = None) -> None:
        if len(hashes) == 0:
            return
        idx = self._cols(hashes)
        c = np.ones(len(hashes), np.int64) if counts is None \
            else np.asarray(counts, dtype=np.int64)
        for d in range(self.depth):
            np.add.at(self.table[d], idx[d], c)

    def query_hashed(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=np.int64)
        idx = self._cols(hashes)
        est = self.table[0][idx[0]]
        for d in range(1, self.depth):
            est = np.minimum(est, self.table[d][idx[d]])
        return est

    def merge_table(self, other: np.ndarray) -> None:
        self.table += other.reshape(self.depth, self.width)


def _hash_strings(values) -> np.ndarray:
    arr = np.array(["\0" if v is None else str(v) for v in values], dtype=object)
    return pd.util.hash_array(arr)


def heavy_hitters(ds, col: str, k: int = 10, depth: int = 4, width: int = 8192,
                  candidates_per_batch: int = 256) -> pd.DataFrame:
    """Approximate top-K frequent values in ONE streaming pass.

    Each batch emits (a) its CMS table partial and (b) its own exact top-C
    value strings; the driver SUMS the tables (mergeable monoid), unions
    the candidates, estimates each candidate against the merged sketch and
    keeps the top K (est desc, value asc).  Partial volume per batch is
    depth × width × 8 B + C strings, independent of cardinality.

    Guarantee: any value with true count > 2N/width more than the K-th is
    in some batch's top-C and survives (CMS never under-counts).  On
    near-uniform data the top-K SET itself is ill-defined — pair with an
    exact verify pass over the returned candidates when set identity
    matters (see __ray_entry__ doc_word_topk for the exact variant).
    """
    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_pylist()
        cms = CountMinSketch(depth, width)
        h = _hash_strings(vals)
        cms.add_hashed(h)
        vc = pd.Series(vals, dtype=object).value_counts()
        cand = vc.index[:candidates_per_batch].astype(str).tolist()
        return pa.table({
            "table": pa.array([cms.table.tobytes()], pa.large_binary()),
            "cands": pa.array([cand], pa.large_list(pa.string())),
        })

    total = CountMinSketch(depth, width)
    cands: set = set()
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for tbl, cd in zip(b["table"].to_pylist(), b["cands"].to_pylist()):
            total.merge_table(np.frombuffer(tbl, dtype=np.int64))
            cands.update(cd)
    if not cands:
        return pd.DataFrame({col: pd.Series([], dtype=object),
                             "est_n": pd.Series([], dtype="int64")})
    cand_list = sorted(cands)
    est = total.query_hashed(_hash_strings(cand_list))
    out = pd.DataFrame({col: cand_list, "est_n": est})
    return out.sort_values(["est_n", col], ascending=[False, True]) \
        .head(k).reset_index(drop=True)


# ---------------------------------------------------------------------------
# HDR-style mergeable quantile sketch
# ---------------------------------------------------------------------------

def _hdr_bin(v: np.ndarray, sig: int) -> np.ndarray:
    """Bin id preserving ``sig`` significant decimal digits: for positive v,
    the bin's low edge is v truncated to sig digits; encodes (exponent,
    mantissa) in one int64.  v must be >= 0 integers (scale floats first)."""
    v = v.astype(np.int64)
    out = np.zeros(len(v), dtype=np.int64)
    pos = v > 0
    if pos.any():
        x = v[pos].astype(np.float64)
        exp = np.floor(np.log10(x)).astype(np.int64)
        unit = np.power(10.0, np.maximum(exp - sig + 1, 0)).astype(np.int64)
        mant = (v[pos] // unit)
        out[pos] = exp * np.int64(10 ** sig * 10) + mant
    return out


def _hdr_low_edge(bins: np.ndarray, sig: int) -> np.ndarray:
    base = np.int64(10 ** sig * 10)
    exp = bins // base
    mant = bins % base
    unit = np.power(10.0, np.maximum(exp - sig + 1, 0)).astype(np.int64)
    return mant * unit


def hdr_quantiles(ds, col: str, qs: list[float], scale: int = 1,
                  sig: int = 3) -> pd.DataFrame:
    """Mergeable approximate quantiles with bounded RELATIVE error
    (≤ 10^-(sig-1), e.g. ≤ 1% at sig=3) — the HdrHistogram design: values
    bin by (decimal exponent, sig-digit mantissa), per-batch bin counts are
    a tiny mergeable histogram whatever the value cardinality, and the
    quantile is the low edge of the bin holding the target rank.

    Completes the mergeable-sketch family (HLL = distinct, Count-Min =
    frequency, HDR = quantiles): use when the distinct-value count is too
    large for ``exact_quantiles``'s per-value histogram.  Deterministic —
    no sampling, so results are reproducible across runs and partitionings.
    Values must be ≥ 0 after scaling (shift first for signed data)."""

    def partial(t: pa.Table) -> pa.Table:
        from timberjack_ray.functions.util import scale_to_int

        v = scale_to_int(t[col], scale).to_numpy(zero_copy_only=False)
        if (v < 0).any():
            raise ValueError("hdr_quantiles requires non-negative scaled values")
        b = _hdr_bin(v, sig)
        g = pa.table({"bin": pa.array(b)}).group_by("bin") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["bin", "n"])

    counts = merge_partials(ds.map_batches(partial, batch_format="pyarrow"),
                            ["bin"], "n").to_pandas().sort_values("bin")
    if not len(counts):
        return pd.DataFrame({"q": [], "value_scaled": []})
    cum = counts["n"].cumsum().to_numpy()
    edges = _hdr_low_edge(counts["bin"].to_numpy(), sig)
    total = int(cum[-1])
    out_q, out_v = [], []
    for q in qs:
        rank = max(int(np.ceil(q * total)), 1)
        idx = int(np.searchsorted(cum, rank))
        out_q.append(q)
        out_v.append(int(edges[min(idx, len(edges) - 1)]))
    return pd.DataFrame({"q": out_q, "value_scaled": out_v})


# ---------------------------------------------------------------------------
# AMS tug-of-war sketch: second frequency moment F2 = sum_v count(v)^2
# (= the self-join size on v).  Alon, Matias & Szegedy, STOC'96.


class AMSF2:
    """``groups × per_group`` ±1 counters over pre-hashed uint64 keys.

    Each estimator j keeps ``S_j = sum_v sign_j(v)·count(v)`` where
    ``sign_j`` is a per-estimator splitmix64-derived ±1; ``E[S_j²] = F2``.
    The estimate is the median over ``groups`` of per-group means of
    ``S_j²`` (median-of-means: relative error ~ sqrt(1/per_group) w.h.p.).
    The state merges by elementwise ADDITION — per-batch partials fold
    anywhere, in any order, so the sketch rides the same partial+merge
    plan as every count family here.
    """

    def __init__(self, groups: int = 9, per_group: int = 24,
                 seed: int = 7):
        self.groups, self.per_group = groups, per_group
        d = groups * per_group
        from timberjack_ray.functions.corpus import _splitmix64
        self._mix = _splitmix64
        self.salts = _splitmix64(
            np.arange(1, d + 1, dtype=np.uint64) * np.uint64(seed * 2 + 1))
        self.state = np.zeros(d, dtype=np.int64)

    def add_hashed(self, hashes: np.ndarray,
                   counts: np.ndarray | None = None) -> None:
        if len(hashes) == 0:
            return
        x = np.asarray(hashes, dtype=np.uint64)
        c = np.ones(len(x), np.int64) if counts is None \
            else np.asarray(counts, dtype=np.int64)
        # loop over estimators (d ≈ 200), vectorized over the batch
        for j, salt in enumerate(self.salts):
            sign = 1 - 2 * (self._mix(x ^ salt) & np.uint64(1)).astype(np.int64)
            self.state[j] += int(np.dot(sign, c))

    def merge_state(self, other: np.ndarray) -> None:
        self.state += other.reshape(self.state.shape)

    def estimate(self) -> float:
        sq = (self.state.astype(np.float64) ** 2) \
            .reshape(self.groups, self.per_group)
        return float(np.median(sq.mean(axis=1)))


def selfjoin_size_ams(ds, group_col: str, key_col: str,
                      groups: int = 9, per_group: int = 24,
                      seed: int = 7) -> pd.DataFrame:
    """Per-group self-join-size (F2) ESTIMATE via mergeable AMS sketches.

    The scale path for join planning over unbounded key cardinality: each
    batch contributes one fixed-size ±1-counter vector per group value —
    traffic is ``n_groups × groups × per_group × 8 B`` per batch,
    independent of how many distinct keys exist.  The exact companion
    (``selfjoin_size_by_type`` in the entry module) shuffles one row per
    distinct (group, key) pair instead.
    """
    probe = AMSF2(groups, per_group, seed)
    salts, d = probe.salts, probe.groups * probe.per_group

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by([group_col, key_col]).aggregate([([], "count_all")])
        gv = g[group_col]
        x = pd.util.hash_array(
            np.asarray(g[key_col].to_pylist(), dtype=object)).astype(np.uint64)
        c = g["count_all"].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-(group, estimator) partial: sign-weighted counts
        enc = gv.dictionary_encode().combine_chunks()
        uvals, ci = enc.dictionary, enc.indices.to_numpy(zero_copy_only=False)
        state = np.zeros((len(uvals), d), dtype=np.int64)
        for j, salt in enumerate(salts):
            sign = 1 - 2 * (probe._mix(x ^ salt) & np.uint64(1)).astype(np.int64)
            np.add.at(state[:, j], ci, sign * c)
        return pa.table({
            group_col: uvals,
            "state": pa.array(list(state), pa.list_(pa.int64(), d))})

    folded: dict[object, AMSF2] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow") \
            .iter_batches(batch_size=None, batch_format="pyarrow"):
        if not b.num_rows:
            continue
        st = np.asarray(b["state"].combine_chunks().flatten()
                        .to_numpy(zero_copy_only=False)).reshape(-1, d)
        for i, gval in enumerate(b[group_col].to_pylist()):
            if gval not in folded:
                folded[gval] = AMSF2(groups, per_group, seed)
            folded[gval].merge_state(st[i])
    rows = [(gval, folded[gval].estimate()) for gval in sorted(folded)]
    return pd.DataFrame(rows, columns=[group_col, "f2_est"])


def approx_set_overlap(ds_a, ds_b, col_a: str, col_b: str,
                       p: int = 14) -> pd.DataFrame:
    """HLL set algebra across two datasets: |A|, |B|, |A∪B| from three
    register arrays (union = elementwise register MAX — exact sketch
    algebra, not an approximation of the merge), and |A∩B| by
    inclusion–exclusion.  One streaming pass per side, 2^p bytes of state
    per batch — the planning statistic for cross-corpus dedup at any
    cardinality.  Intersection error grows as the true overlap shrinks
    relative to the union (inclusion–exclusion subtracts two ~1%-error
    terms), so treat small intersections as "below sketch resolution".
    """
    ha, hb = hll_over(ds_a, col_a, p), hll_over(ds_b, col_b, p)
    a_est, b_est = ha.estimate(), hb.estimate()
    union = HyperLogLog(p)
    union.merge_registers(ha.registers)
    union.merge_registers(hb.registers)
    u_est = union.estimate()
    return pd.DataFrame({
        "card_a": [int(round(a_est))],
        "card_b": [int(round(b_est))],
        "card_union": [int(round(u_est))],
        "card_intersect": [max(0, int(round(a_est + b_est - u_est)))]})
