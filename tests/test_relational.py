"""Relational building blocks: broadcast join, partial top-K, grouped
distinct counts (functions/relational.py) — verified against pandas on the
same data."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from timberjack_ray.functions.relational import (
    broadcast_join,
    distinct_count_by,
    sorted_topk,
)

rng = np.random.default_rng(7)
N = 5000
LEFT = pd.DataFrame({
    "k": rng.integers(0, 200, N),
    "v": rng.random(N).round(6),
    "grp": rng.choice(list("abcd"), N),
})
RIGHT = pa.table({"k": np.arange(150), "name": [f"n{i}" for i in range(150)]})


@pytest.fixture(scope="module")
def left_ds(ray_session):
    import ray.data as rd

    return rd.from_pandas(LEFT).repartition(8)


def test_broadcast_join_inner(left_ds):
    out = broadcast_join(left_ds, RIGHT, keys="k").to_pandas()
    expect = LEFT.merge(RIGHT.to_pandas(), on="k", how="inner")
    assert len(out) == len(expect)
    got = out.sort_values(["k", "v"]).reset_index(drop=True)
    want = expect[got.columns].sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_broadcast_join_left_outer(left_ds):
    out = broadcast_join(left_ds, RIGHT, keys="k", join_type="left outer").to_pandas()
    assert len(out) == N
    misses = out[out["k"] >= 150]
    assert misses["name"].isna().all()


def test_sorted_topk_matches_full_sort(left_ds):
    out = sorted_topk(left_ds, ["v", "k"], 25, descending=[True, False])
    expect = LEFT.sort_values(["v", "k"], ascending=[False, True]).head(25)
    assert out["v"].tolist() == expect["v"].tolist()
    assert out["k"].tolist() == expect["k"].tolist()


def test_sorted_topk_k_larger_than_data(ray_session):
    import ray.data as rd

    small = rd.from_pandas(LEFT.head(7))
    out = sorted_topk(small, "v", 100)
    assert len(out) == 7
    assert out["v"].is_monotonic_decreasing


def test_distinct_count_by(left_ds):
    out = distinct_count_by(left_ds, "grp", "k", name="nk")
    expect = LEFT.groupby("grp")["k"].nunique()
    got = dict(zip(out["grp"], out["nk"]))
    assert got == expect.to_dict()
