"""Sessionization and exact-quantile operators vs pandas ground truth."""

import numpy as np
import pandas as pd
import pytest

from timberjack_ray.functions.sessions import exact_quantiles, sessionize, session_stats

rng = np.random.default_rng(21)
N = 6000
DF = pd.DataFrame({
    "u": rng.choice([f"u{i}" for i in range(40)], N),
    "ts": rng.integers(0, 500_000, N),
    "val": (rng.random(N) * 100).round(2),
})


def expected_sessions(df, gap):
    out = {}
    for u, sub in df.groupby("u"):
        ts = np.sort(sub["ts"].to_numpy())
        out[u] = 1 + int((np.diff(ts) > gap).sum())
    return out


@pytest.fixture(scope="module")
def ds(ray_session):
    import ray.data as rd

    return rd.from_pandas(DF).repartition(6)


def test_session_stats(ds):
    out = session_stats(ds, "u", "ts", gap_s=10_000)
    got = dict(zip(out["u"], out["n_sessions"]))
    assert got == expected_sessions(DF, 10_000)


def test_sessionize_ids_are_per_key_monotone(ds):
    out = sessionize(ds, "u", "ts", gap_s=10_000).to_pandas()
    assert len(out) == N
    for u, sub in out.groupby("u"):
        sub = sub.sort_values("ts", kind="stable")
        assert (np.diff(sub["session_id"].to_numpy()) >= 0).all()
        gaps = np.diff(sub["ts"].to_numpy())
        bumps = np.diff(sub["session_id"].to_numpy())
        assert ((gaps > 10_000) == (bumps == 1)).all()


def test_exact_quantiles_match_numpy(ds):
    out = exact_quantiles(ds, "val", [0.25, 0.5, 0.9], scale=100)
    scaled = np.sort(np.round(DF["val"].to_numpy() * 100).astype("int64"))
    for q, v in zip(out["q"], out["value_scaled"]):
        rank = max(int(np.ceil(q * N)), 1)
        assert v == scaled[rank - 1]
