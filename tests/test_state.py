"""Sharded first-seen dedup index (state/dedup_index): shard-state fuzz
against a Python-set reference, and the actor-pool front-end on planted
cross-batch duplicates."""
import numpy as np
import pyarrow as pa


def test_shard_state_vs_set_reference():
    """_ShardState.probe_insert must claim exactly the first arrival of
    every hash across any call sequence."""
    from timberjack_ray.state.dedup_index import _ShardState

    rng = np.random.RandomState(83)
    for trial in range(5):
        st = _ShardState()
        seen: set = set()
        for _call in range(rng.randint(1, 8)):
            h = rng.randint(0, 40, size=rng.randint(0, 30)) \
                .astype(np.uint64)
            got = st.probe_insert(h)
            expect = np.zeros(len(h), dtype=bool)
            local = set()
            for i, x in enumerate(h.tolist()):
                if x not in seen and x not in local:
                    expect[i] = True
                    local.add(x)
            seen |= local
            assert got.tolist() == expect.tolist(), (trial, h, got, expect)
        assert st.size() == len(seen)


def test_streaming_deduper_cross_batch(ray_session):
    """Planted dups across micro-batches: first arrival survives, later
    copies are dropped, index size = distinct texts, close() frees."""
    from timberjack_ray.state.dedup_index import StreamingDeduper

    batches = [
        pa.table({"doc_id": [1, 2, 3], "text": ["aa", "bb", "aa"]}),
        pa.table({"doc_id": [4, 5], "text": ["bb", "cc"]}),
        pa.table({"doc_id": [6], "text": ["aa"]}),
        pa.table({"doc_id": [], "text": []}),
    ]
    with StreamingDeduper(n_shards=3) as d:
        out = [d.filter_batch(b, col="text") for b in batches]
        assert out[0]["doc_id"].to_pylist() == [1, 2]   # in-batch dup 3
        assert out[1]["doc_id"].to_pylist() == [5]       # 4 dups batch-0
        assert out[2].num_rows == 0
        assert out[3].num_rows == 0
        assert d.index_size() == 3


def test_streaming_deduper_matches_batch_dedup(ray_session):
    """Feeding sorted arrivals must reproduce batch exact_dedup's min-id
    winners on a random corpus with heavy duplication."""
    from timberjack_ray.state.dedup_index import StreamingDeduper

    rng = np.random.RandomState(89)
    texts = [f"t{rng.randint(0, 12)}" for _ in range(60)]
    ids = list(range(60))
    expect = {}
    for i, t in zip(ids, texts):
        expect.setdefault(t, i)
    want = sorted(expect.values())

    got = []
    with StreamingDeduper(n_shards=4) as d:
        for lo in range(0, 60, 7):
            b = pa.table({"doc_id": ids[lo:lo + 7],
                          "text": texts[lo:lo + 7]})
            got += d.filter_batch(b, col="text")["doc_id"].to_pylist()
    assert sorted(got) == want
