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


class EnrichStage:
    def __init__(self, lookup_ref, source_col: str = "source"):
        import ray

        # one object-store fetch per actor, zero-copy shared on the node
        self.lookup: dict[str, tuple[str, str]] = ray.get(lookup_ref)
        self.source_col = source_col

    def __call__(self, batch: pa.Table) -> pa.Table:
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


def enrich(ds, lookup: dict[str, tuple[str, str]], concurrency=(1, 8), batch_size: int = 32768):
    """Attach severity/service columns via the broadcast lookup actor pool."""
    import ray

    ref = ray.put(lookup)
    return ds.map_batches(
        EnrichStage,
        fn_constructor_kwargs={"lookup_ref": ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
