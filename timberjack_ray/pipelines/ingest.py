"""Ingest: raw text logs → the input_hint sequences table.

The missing first mile: the engine's analysis input is the pre-tokenized
Parquet table (``doc_id:string, tokens:list<int32>, n_tok:int32,
source:string`` — BASELINE.json input_hint), and this converts raw ``.log``
files into exactly that shape, so a reference user's files can enter the
Ray pipelines once and be re-analyzed many times without re-parsing text.

Plan: the FILE is the unit of parallelism (the reference's mmap-per-file
model and our wave/resume unit): ``from_items(paths) → map_batches(one
task per path group)``; inside a task each file encodes through the
VECTORIZED ``vocab.encode_batch_arrow`` (flat word-stream lookup + ragged
scatter — no per-line Python), and rows get deterministic ids
``{file-stem}:{line_no:08d}`` with ``source = file stem``.  Output is one
Parquet file per input file (resume unit = file; a re-run with
``skip_existing`` skips finished ones).  Undecodable lines (codepoints ≥
U+0100 outside the vocabulary) are DROPPED, mirroring the reference's
silent skip of invalid UTF-8 (src/analyzer.rs:299-304).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc


def _encode_file(path: str) -> pa.Table:
    from timberjack_ray import vocab

    with open(path, "rb") as f:
        text = f.read().decode("utf-8", errors="replace")
    lines = text.splitlines()
    stem = os.path.splitext(os.path.basename(path))[0]
    arr = pa.array(lines, type=pa.string())
    toks = vocab.encode_batch_arrow(arr, on_error="raise") \
        if _all_encodable(arr) else _encode_keep_ids(arr)
    n = len(toks)
    # line numbers of surviving rows: _encode_keep_ids returns (toks, keep)
    if isinstance(toks, tuple):
        toks, keep = toks
        n = len(toks)
        nums = [i for i, k in enumerate(keep) if k]
    else:
        nums = range(n)
    return pa.table({
        "doc_id": pa.array([f"{stem}:{i:08d}" for i in nums], pa.string()),
        "tokens": toks,
        "n_tok": pc.list_value_length(toks).cast(pa.int32()),
        "source": pa.array([stem] * n, pa.string()),
    })


def _all_encodable(arr: pa.Array) -> bool:
    """Cheap pre-probe: every codepoint < 256 means no skip logic needed
    (vocab words may exceed that, so this is sufficient, not necessary)."""
    import numpy as np

    from timberjack_ray.vocab import _codepoints_of

    codes, _ = _codepoints_of(arr if not isinstance(arr, pa.ChunkedArray)
                              else arr.combine_chunks())
    return bool((codes < 256).all()) if len(codes) else True


def _encode_keep_ids(arr: pa.Array):
    """Slow path for files with ≥ U+0100 codepoints: per-line encodability
    probe (vocab lookup per word) so surviving line NUMBERS stay known —
    encode_batch_arrow(on_error='skip') drops lines without reporting
    which.  Bounded to the rare non-latin file."""
    from timberjack_ray import vocab

    keep, good_lines = [], []
    for line in arr.to_pylist():
        try:
            vocab.encode(line)
            keep.append(True)
            good_lines.append(line)
        except ValueError:
            keep.append(False)
    return vocab.encode_batch_arrow(pa.array(good_lines, pa.string())), keep


def ingest_text(paths: list[str], out_dir: str,
                skip_existing: bool = True) -> dict:
    """Convert raw log files to the sequences table under ``out_dir``
    (one ``<stem>.parquet`` per input file).  Returns
    ``{"files": n_converted, "skipped": n_skipped, "rows": total_rows}``.

    Runs as a Ray Dataset over the path list so files convert in parallel
    across the cluster; each task writes its own output file (atomic
    tmp→rename), making the FILE the resume unit.
    """
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    todo, skipped = [], 0
    for p in paths:
        stem = os.path.splitext(os.path.basename(p))[0]
        if skip_existing and os.path.exists(
                os.path.join(out_dir, f"{stem}.parquet")):
            skipped += 1
        else:
            todo.append(p)
    if not todo:
        return {"files": 0, "skipped": skipped, "rows": 0}

    def convert(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        counts = []
        for path in batch["path"].to_pylist():
            t = _encode_file(path)
            stem = os.path.splitext(os.path.basename(path))[0]
            dst = os.path.join(out_dir, f"{stem}.parquet")
            tmp = dst + ".tmp"
            pq.write_table(t, tmp)
            os.replace(tmp, dst)
            counts.append(t.num_rows)
        return pa.table({"rows": pa.array(counts, pa.int64())})

    src = rd.from_items([{"path": p} for p in todo])
    total = 0
    for b in src.map_batches(convert, batch_format="pyarrow",
                             batch_size=1).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        total += sum(b["rows"].to_pylist())
    return {"files": len(todo), "skipped": skipped, "rows": total}
