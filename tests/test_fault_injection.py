"""Fault injection for the exchanges (VERDICT r4 #6): kill a worker
process mid-task with ``os._exit(1)`` exactly once (O_CREAT|O_EXCL
sentinel file — one death even under concurrent attempts) and assert Ray
task retry reproduces the exact no-fault result.

Covers the three exchange shapes the verdict named: the GRACE bucket
join, the skew-hybrid join, and the sharded windower's
``groupby(shard).map_groups`` task (the round-5 distribution of
``stream_windowed_counts``).
"""

import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def make_die_once():
    """A callable that kills the current process the FIRST time any
    worker invokes it (cluster-wide, via an exclusive sentinel file on
    the shared local filesystem) and is a no-op afterwards."""
    path = f"/tmp/tj_fault_{uuid.uuid4().hex}"

    def maybe_die():
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return
        os.close(fd)
        os._exit(1)

    return maybe_die


def _events_slim(n=4000, n_shards=8):
    """Deterministic out-of-order arrival table matching the
    stream_windowed_counts prep schema (shard, ak, event_id, ts_us)."""
    ids = np.arange(n, dtype=np.uint64)
    ts = (ids.astype(np.int64) * 7_919_000_000) % (48 * 3600 * 1_000_000)
    jitter = (((ids % np.uint64(5400)) * (np.uint64(2654435761) % np.uint64(5400)))
              % np.uint64(5400)).astype(np.int64)
    ak = ts + jitter * 1_000_000 - 2_700_000_000
    return pa.table({
        "shard": (ids % np.uint64(n_shards)).astype(np.int64),
        "ak": ak,
        "event_id": ids.astype(np.int64),
        "ts_us": ts,
    })


def test_windower_shard_restart_identical(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.window import windowed_counts_sharded

    t = _events_slim()
    kw = dict(shard_col="shard", arrival_col="ak", id_col="event_id",
              ts_us_col="ts_us", width_s=3600, lateness_s=1800)
    clean = windowed_counts_sharded(rd.from_arrow(t).repartition(4), **kw)
    faulted = windowed_counts_sharded(rd.from_arrow(t).repartition(4),
                                      _fault_hook=make_die_once(), **kw)
    pd.testing.assert_frame_equal(clean, faulted)
    assert clean["n"].sum() > 0


def _join_inputs():
    n = 3000
    left = pa.table({
        "k": pa.array([i % 97 for i in range(n)], pa.int64()),
        "tag": pa.array([f"t{i % 11}" for i in range(n)]),
    })
    right = pa.table({
        "rk": pa.array([i % 97 for i in range(n // 2)], pa.int64()),
        "val": pa.array([i % 13 for i in range(n // 2)], pa.int64()),
    })
    return left, right


def _sorted_pdf(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _with_die_once(ds, die):
    def stage(t: pa.Table) -> pa.Table:
        die()
        return t
    return ds.map_batches(stage, batch_format="pyarrow")


def test_grace_bucket_join_worker_kill_identical(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import bucket_hash_join

    left, right = _join_inputs()
    clean = _sorted_pdf(bucket_hash_join(
        rd.from_arrow(left).repartition(6), rd.from_arrow(right).repartition(4),
        "k", "rk", left_cols=["tag"], right_cols=["val"], n_buckets=8))
    faulted = _sorted_pdf(bucket_hash_join(
        _with_die_once(rd.from_arrow(left).repartition(6), make_die_once()),
        rd.from_arrow(right).repartition(4),
        "k", "rk", left_cols=["tag"], right_cols=["val"], n_buckets=8))
    pd.testing.assert_frame_equal(clean, faulted)
    assert len(clean) > 0


def test_skew_join_worker_kill_identical(ray_session):
    import ray.data as rd

    from timberjack_ray.functions.relational import skew_join

    n = 4000
    # one hot key (0) plus a cold tail — exercises broadcast + GRACE paths
    lk = [0 if i % 3 else i % 53 for i in range(n)]
    left = pa.table({"k": pa.array(lk, pa.int64()),
                     "tag": pa.array([f"t{i % 7}" for i in range(n)])})
    right = pa.table({"rk": pa.array([i % 53 for i in range(400)], pa.int64()),
                      "val": pa.array([i % 17 for i in range(400)], pa.int64())})
    kw = dict(left_cols=["tag"], right_cols=["val"], hot_limit=4, n_buckets=8)
    clean = _sorted_pdf(skew_join(
        rd.from_arrow(left).repartition(6), rd.from_arrow(right).repartition(3),
        "k", "rk", **kw))
    faulted = _sorted_pdf(skew_join(
        _with_die_once(rd.from_arrow(left).repartition(6), make_die_once()),
        rd.from_arrow(right).repartition(3), "k", "rk", **kw))
    pd.testing.assert_frame_equal(clean, faulted)
    assert len(clean) > 0
