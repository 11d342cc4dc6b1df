"""Deterministic synthetic generator for the pre-tokenized sequences table.

Produces the exact input shape of BASELINE.json ``input_hint``:
``doc_id:string, tokens:list<int32>, n_tok:int32, source:string``.

Decoded payloads reproduce the reference's two benchmark formats:

* generic plaintext lines — formula of
  /root/reference/src/bin/create_benchmark_logs.rs:40-83
  (``2025-03-DD HH:MM:SS,mmm [LEVEL] Message``, level = i%5 over the 5-level
  wheel, message = i%20 over the 20-message pool), plus sprinkled edge rows
  (colon-form level, level-less lines) mirroring tests/edge_cases.rs.
* JSON lines — shape of /root/reference/benchmark/create_json_logs.py:67-91
  but driven by a deterministic per-row hash instead of ``random`` so any row
  is reconstructible from its index alone (no RNG state, no seeds to carry).

Row ``i`` fully determines the row ⇒ generation parallelizes embarrassingly
(``ray.data.range(n) → map_batches``) and any shard can be regenerated
independently (resume-friendly).

Skew: source ``app-0`` holds ~30 % of rows (exercises salted repartition).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from timberjack_ray import vocab

GENERIC_LEVELS = ["ERROR", "WARN", "INFO", "DEBUG", "TRACE"]

GENERIC_MESSAGES = [
    "NullPointerException in WebController.java:42",
    "Connection timeout in NetworkClient.java:86",
    "Database query took 2.3s in DatabaseService.java:128",
    "Application started successfully",
    "Session created for user_123",
    "OutOfMemoryError in SearchIndexer.java:212",
    "Failed to process request: invalid parameters",
    "Cache miss for key: user_profile_123",
    "Authentication successful for user_123",
    "Request processed in 150ms",
    "500 Internal Server Error: POST /api/orders",
    "403 Forbidden: Access denied for user_456",
    "Slow database operation detected (query took 3.5s)",
    "Memory usage at 75% of allocated heap",
    "Cache hit ratio: 65.4% (last hour)",
    "API rate limit exceeded for client_789",
    "Garbage collection cycle completed in 250ms",
    "System backup started (estimated time: 15m)",
    "Certificate expiring in 30 days (domain.com)",
    "Configuration loaded from /etc/config.json",
]

JSON_SERVICES = ["api", "auth", "payment", "database", "frontend", "cache", "search", "notification"]
JSON_LEVELS = ["INFO", "WARN", "ERROR", "DEBUG"]
JSON_MESSAGES = [
    "Request processed successfully",
    "Database query completed",
    "Authentication successful",
    "Failed login attempt",
    "Payment processed",
    "Connection timeout",
    "Cache miss",
    "User profile updated",
    "NullPointerException in WebController",
    "Rate limit exceeded",
    "Slow database query detected",
    "Authentication token expired",
]
JSON_STATUS = [200, 201, 204, 400, 401, 403, 404, 500, 503]
JSON_ERROR_TYPES = ["NullPointerException", "ConnectionTimeout", "AuthenticationFailure", "DatabaseError"]

NUM_SOURCES = 21  # app-0 (hot) .. app-20
HOT_SOURCE_PCT = 30


def _mix(i: int, salt: int) -> int:
    """Deterministic 32-bit hash of (row index, salt)."""
    x = (i * 2654435761 + salt * 40503) & 0xFFFFFFFF
    x ^= x >> 16
    x = (x * 2246822519) & 0xFFFFFFFF
    x ^= x >> 13
    return x


def source_for(i: int) -> str:
    h = _mix(i, 7)
    if h % 100 < HOT_SOURCE_PCT:
        return "app-0"
    return f"app-{1 + h % (NUM_SOURCES - 1)}"


def generic_line(i: int) -> str:
    # exact formula of create_benchmark_logs.rs:73-83
    level = GENERIC_LEVELS[i % 5]
    message = GENERIC_MESSAGES[i % 20]
    return "2025-03-%02d %02d:%02d:%02d,%03d [%s] %s" % (
        (i % 31) + 1, (i // 3600) % 24, (i // 60) % 60, i % 60, i % 1000, level, message,
    )


def _json_ts(i: int) -> str:
    # base 2025-03-20T00:00:00 plus i seconds, ISO format (keeps the 'T' that
    # produces the reference's quirky 13-char trend buckets, analyzer.rs:326-336)
    day = 20 + (i // 86400) % 10
    s = i % 86400
    return "2025-03-%02dT%02d:%02d:%02d" % (day, s // 3600, (s // 60) % 60, s % 60)


def json_line(i: int) -> str:
    h = _mix(i, 11)
    service = JSON_SERVICES[h % 8]
    level = "ERROR" if _mix(i, 13) % 100 < 15 else JSON_LEVELS[_mix(i, 17) % 4]
    status = 500 if _mix(i, 19) % 100 < 5 else JSON_STATUS[_mix(i, 23) % 9]
    entry = {
        "timestamp": _json_ts(i),
        "service": service,
        "level": level,
        "message": JSON_MESSAGES[_mix(i, 29) % 12],
        "request_id": f"req-{10000 + _mix(i, 31) % 90000}",
        "status": status,
        "response_time": 10 + _mix(i, 37) % 1991,
    }
    if service == "api":
        entry["request"] = {
            "method": ["GET", "POST", "PUT", "DELETE"][_mix(i, 41) % 4],
            "path": "/api/v1/" + ["users", "orders", "products", "carts"][_mix(i, 43) % 4],
            "headers": {
                "content-type": ["application/json", "text/html", "application/xml"][_mix(i, 47) % 3],
                "user-agent": "Mozilla/5.0",
            },
        }
    if service == "auth":
        entry["user"] = {
            "id": f"user_{1000 + _mix(i, 53) % 9000}",
            "role": ["admin", "user", "guest"][_mix(i, 59) % 3],
        }
    if level == "ERROR":
        entry["error"] = {
            "type": JSON_ERROR_TYPES[_mix(i, 61) % 4],
            "code": 1000 + _mix(i, 67) % 9000,
        }
    return json.dumps(entry)


def line_for(i: int, json_frac: float = 0.0) -> str:
    """Decoded payload of row i.  ``json_frac`` of rows are JSON lines."""
    if json_frac > 0 and _mix(i, 3) % 1000 < int(json_frac * 1000):
        return json_line(i)
    if i % 101 == 100:
        return f"ERROR: colon-form standalone failure {i % 7}"   # edge: colon level
    if i % 103 == 102:
        return f"plain line without any level marker {i % 5}"    # edge: level-less
    return generic_line(i)


def make_batch(start: int, end: int, json_frac: float = 0.0) -> pa.Table:
    """Rows [start, end) of the sequences table — pure function of indices."""
    idx = range(start, end)
    lines = [line_for(i, json_frac) for i in idx]
    # scalar encoder: on THIS sandbox the memory-bandwidth-bound vectorized
    # encode_batch_arrow measures ~3× slower steady-state (0.5 s vs 1.4 s
    # per 50 k lines; the VM sustains <1 GB/s on wide array passes), so the
    # generator keeps the dict-loop path — they are property-tested
    # bit-identical, and ingest uses the vectorized one (the right shape
    # where memory bandwidth is sane)
    tokens = vocab.encode_batch(lines)
    return pa.table(
        {
            "doc_id": pa.array([f"doc-{i:010d}" for i in idx], type=pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(tokens.value_lengths(), type=pa.int32()),
            "source": pa.array([source_for(i) for i in idx], type=pa.string()),
        }
    )


def sequences_table(n: int, json_frac: float = 0.0) -> pa.Table:
    """Small local table (tests / oracle)."""
    return make_batch(0, n, json_frac)


def source_lookup_table() -> pa.Table:
    """Broadcast-side lookup: source → (severity, service)."""
    sources = [f"app-{k}" for k in range(NUM_SOURCES)]
    sev = ["critical", "high", "medium", "low"]
    svc = ["api", "auth", "payment", "database", "frontend", "cache", "search"]
    return pa.table(
        {
            "source": pa.array(sources),
            "severity": pa.array([sev[k % 4] for k in range(NUM_SOURCES)]),
            "service": pa.array([svc[k % 7] for k in range(NUM_SOURCES)]),
        }
    )


def source_lookup_dict() -> dict[str, tuple[str, str]]:
    t = source_lookup_table()
    return {
        s: (sev, svc)
        for s, sev, svc in zip(
            t["source"].to_pylist(), t["severity"].to_pylist(), t["service"].to_pylist()
        )
    }


def generate_sequences(
    n: int,
    out_dir: str,
    json_frac: float = 0.0,
    rows_per_file: int = 100_000,
    overwrite: bool = False,
) -> str:
    """Ray-parallel generation of the sequences table into ``out_dir``.

    Cached: if the directory already holds the expected ``_MANIFEST.json``
    (same n/json_frac), generation is skipped.  Each output file covers a
    deterministic contiguous index range, so a partial/failed generation can
    simply be rerun (files are written atomically via tmp+rename).
    """
    import ray

    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    want = {"n": n, "json_frac": json_frac, "rows_per_file": rows_per_file, "vocab_size": vocab.VOCAB_SIZE}
    if not overwrite and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            if json.load(f) == want:
                return out_dir
    if os.path.isdir(out_dir):
        # stale layout (different n/rows_per_file) would leave orphan part
        # files next to the regenerated ones — duplicate rows on read
        import shutil

        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    shards = [(s, min(s + rows_per_file, n)) for s in range(0, n, rows_per_file)]

    @ray.remote(num_cpus=1)
    def write_shard(shard_id: int, start: int, end: int) -> int:
        import pyarrow.parquet as pq

        path = os.path.join(out_dir, f"part-{shard_id:05d}.parquet")
        tmp = path + ".tmp"
        # small row groups (32k rows) so Ray Data can split one file into
        # several read tasks — one-row-group files cap parse parallelism at
        # the FILE count (16 files starved half a 32-CPU pool)
        pq.write_table(make_batch(start, end, json_frac), tmp, row_group_size=32_768)
        os.replace(tmp, path)
        return end - start

    total = sum(ray.get([write_shard.remote(k, s, e) for k, (s, e) in enumerate(shards)]))
    assert total == n
    with open(manifest_path + ".tmp", "w") as f:
        json.dump(want, f)
    os.replace(manifest_path + ".tmp", manifest_path)
    return out_dir
