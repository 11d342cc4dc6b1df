"""Ingest: raw text logs → the input_hint sequences table.

The missing first mile: the engine's analysis input is the pre-tokenized
Parquet table (``doc_id:string, tokens:list<int32>, n_tok:int32,
source:string`` — BASELINE.json input_hint), and this converts raw ``.log``
files into exactly that shape, so a reference user's files can enter the
Ray pipelines once and be re-analyzed many times without re-parsing text.

Plan: the FILE is the unit of parallelism (the reference's mmap-per-file
model and our wave/resume unit): ``from_items(paths) → map_batches(one
task per path)``; inside a task the file streams through the VECTORIZED
``vocab.encode_batch_arrow`` in bounded line CHUNKS (memory per task is
~one chunk, never the whole file — a multi-GiB log cannot overflow int32
Arrow offsets or blow a worker heap), writing one row group per chunk.
Rows get deterministic ids ``{stem}-{pathhash}:{line_no:08d}`` with
``source = file stem``; the path hash makes two files with the SAME
basename (a/app.log, b/app.log) distinct outputs instead of a silent
overwrite.  Output is one Parquet file per input file, atomic
tmp→rename, so a re-run with ``skip_existing`` resumes per file.
Undecodable lines (codepoints ≥ U+0100 outside the vocabulary) are
DROPPED via the encoder's keep-mask — line numbers in doc_ids stay those
of the RAW file — mirroring the reference's silent skip of invalid UTF-8
(src/analyzer.rs:299-304).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

CHUNK_LINES = 200_000


def _file_tag(path: str) -> str:
    """Stable per-path disambiguator (stem collisions across directories)."""
    return hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:8]


def _encode_file_chunks(path: str):
    """Yield (table, rows) per bounded line chunk of one raw log file."""
    from timberjack_ray import vocab

    stem = os.path.splitext(os.path.basename(path))[0]
    prefix = f"{stem}-{_file_tag(path)}"
    base_line = 0
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        while True:
            lines = []
            for raw in f:
                lines.append(raw.rstrip("\r\n"))
                if len(lines) >= CHUNK_LINES:
                    break
            if not lines:
                break
            arr = pa.array(lines, type=pa.string())
            toks, keep = vocab.encode_batch_arrow(arr, on_error="skip",
                                                  return_mask=True)
            nums = base_line + np.flatnonzero(keep)
            base_line += len(lines)
            yield pa.table({
                "doc_id": pa.array([f"{prefix}:{i:08d}" for i in nums],
                                   pa.string()),
                "tokens": toks,
                "n_tok": pc.list_value_length(toks).cast(pa.int32()),
                "source": pa.array([stem] * len(toks), pa.string()),
            })


def ingest_text(paths: list[str], out_dir: str,
                skip_existing: bool = True) -> dict:
    """Convert raw log files to the sequences table under ``out_dir``
    (one ``{stem}-{pathhash}.parquet`` per input file).  Returns
    ``{"files": n_converted, "skipped": n_skipped, "rows": total_rows}``.

    Runs as a Ray Dataset over the path list so files convert in parallel
    across the cluster; each task streams its file in bounded chunks and
    writes its own output (atomic tmp→rename), making the FILE the
    resume unit.
    """
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    todo, skipped = [], 0
    for p in dict.fromkeys(paths):  # de-dupe, keep order
        stem = os.path.splitext(os.path.basename(p))[0]
        dst = os.path.join(out_dir, f"{stem}-{_file_tag(p)}.parquet")
        if skip_existing and os.path.exists(dst):
            skipped += 1
        else:
            todo.append((p, dst))
    if not todo:
        return {"files": 0, "skipped": skipped, "rows": 0}

    def convert(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        counts = []
        for path, dst in zip(batch["path"].to_pylist(),
                             batch["dst"].to_pylist()):
            tmp = dst + ".tmp"
            writer = None
            rows = 0
            try:
                for t in _encode_file_chunks(path):
                    if writer is None:
                        writer = pq.ParquetWriter(tmp, t.schema)
                    writer.write_table(t)
                    rows += t.num_rows
                if writer is None:  # empty file: still mark done
                    writer = pq.ParquetWriter(tmp, pa.schema(
                        [("doc_id", pa.string()),
                         ("tokens", pa.list_(pa.int32())),
                         ("n_tok", pa.int32()),
                         ("source", pa.string())]))
            finally:
                if writer is not None:
                    writer.close()
            os.replace(tmp, dst)
            counts.append(rows)
        return pa.table({"rows": pa.array(counts, pa.int64())})

    src = rd.from_items([{"path": p, "dst": d} for p, d in todo])
    total = 0
    for b in src.map_batches(convert, batch_format="pyarrow",
                             batch_size=1).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        total += sum(b["rows"].to_pylist())
    return {"files": len(todo), "skipped": skipped, "rows": total}


def export_jsonl(ds, out_dir: str) -> None:
    """Write a Dataset as JSONL shards (one file per block) — the
    interchange format every downstream training stack reads.  Streaming
    sink: blocks serialize in parallel, nothing materializes on the
    driver.  Resumable at directory granularity (atomic per-file writes
    by Ray's datasink); for per-shard resume, partition the input by key
    first and export each partition dir separately."""
    os.makedirs(out_dir, exist_ok=True)
    ds.write_json(out_dir)


def read_jsonl(paths):
    """Read JSONL shards (optionally .gz) back into a Dataset — one read
    task per file, pyarrow's block JSON parser (columnar, not per-row
    Python)."""
    import ray.data as rd

    paths = [paths] if isinstance(paths, str) else list(paths)
    if any(str(p).endswith(".gz") for p in paths):
        return rd.read_json(paths,
                            arrow_open_stream_args={"compression": "gzip"})
    return rd.read_json(paths)
