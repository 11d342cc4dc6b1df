"""Broadcast-lookup enrich stage (actor pool).

The north_star mandates a stateful enrich stage joining a broadcast
source→(severity, service) lookup dictionary (SURVEY.md §2.3 ST6, §2.4).
The build side is tiny, so this is a broadcast map-join — never a shuffle:
``ray.put`` the dict ONCE on the driver, pass the ObjectRef to the actor
constructor, ``ray.get`` it once per actor in ``__init__``.

The per-batch lookup is vectorized via dictionary encoding: only the batch's
DISTINCT sources (≤ a few hundred) touch the Python dict; rows are filled by
an Arrow ``take``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

UNKNOWN = ("unknown", "unknown")

# per-worker-process cache of broadcast lookups (keyed by ObjectRef hex):
# a stateless-task stage fetches the dict ONCE per worker, not per batch —
# the broadcast stays broadcast without forcing an actor pool (which would
# cap the fused upstream stages to the pool size).
_LOOKUP_CACHE: dict[str, dict] = {}


def _fetch_lookup(lookup_ref) -> dict:
    import ray

    if isinstance(lookup_ref, dict):
        return lookup_ref
    key = lookup_ref.hex()
    if key not in _LOOKUP_CACHE:
        _LOOKUP_CACHE[key] = ray.get(lookup_ref)
    return _LOOKUP_CACHE[key]


class EnrichStage:
    """Usable two ways: as a pre-built instance → stateless tasks with the
    per-worker cache above (default; elastic, fuses with neighbours); or as
    a class with ``fn_constructor_kwargs`` → actor pool (fetch in __init__),
    for when per-actor state is genuinely expensive."""

    def __init__(self, lookup_ref, source_col: str = "source"):
        self.lookup_ref = lookup_ref
        self.lookup: dict[str, tuple[str, str]] | None = None
        self.source_col = source_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.lookup is None:
            self.lookup = _fetch_lookup(self.lookup_ref)
        col = batch[self.source_col]
        enc = pc.dictionary_encode(col)
        if isinstance(enc, pa.ChunkedArray):
            sev_chunks, svc_chunks = [], []
            for chunk in enc.chunks:
                sev, svc = self._map_chunk(chunk)
                sev_chunks.append(sev)
                svc_chunks.append(svc)
            severity = pa.chunked_array(sev_chunks)
            service = pa.chunked_array(svc_chunks)
        else:
            severity, service = self._map_chunk(enc)
        return batch.append_column("severity", severity).append_column("service", service)

    def _map_chunk(self, chunk: pa.DictionaryArray):
        dictionary = chunk.dictionary.to_pylist()
        sev_d = pa.array([self.lookup.get(s, UNKNOWN)[0] for s in dictionary], type=pa.string())
        svc_d = pa.array([self.lookup.get(s, UNKNOWN)[1] for s in dictionary], type=pa.string())
        idx = chunk.indices
        return pc.take(sev_d, idx), pc.take(svc_d, idx)


def enrich(ds, lookup: dict[str, tuple[str, str]], concurrency=None, batch_size: int | None = None):
    """Attach severity/service columns via the broadcast lookup.

    Default: stateless tasks (instance + per-worker cached ``ray.get``) so
    the stage fuses with the adjacent parse/route stages and scales to every
    core.  Pass ``concurrency=(min, max)`` to run as an actor pool instead
    (the fused chain is then capped at the pool size — only worth it when
    per-actor state is heavy)."""
    import ray

    ref = ray.put(lookup)
    if concurrency is not None:
        return ds.map_batches(
            EnrichStage,
            fn_constructor_kwargs={"lookup_ref": ref},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    return ds.map_batches(
        EnrichStage(lookup_ref=ref),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
