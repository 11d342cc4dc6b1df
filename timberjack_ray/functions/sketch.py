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


def approx_distinct(ds, col: str, p: int = 14) -> float:
    """Approximate COUNT(DISTINCT col): one 2^p-byte sketch per batch, max
    merge streamed to the driver.  ~0.8% relative error at p=14."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        hll.add_strings(batch[col].to_pylist())
        return pa.table({"regs": pa.array([hll.registers.tobytes()], pa.binary())})

    total = HyperLogLog(p)
    for b in ds.map_batches(sketch_batch, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        for regs in b["regs"].to_pylist():
            total.merge_registers(np.frombuffer(regs, dtype=np.uint8))
    return total.estimate()


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
