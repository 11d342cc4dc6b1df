"""Flagship pipeline: read → parse → enrich → route → aggregate.

The Ray-Data-native equivalent of the reference's whole CLI lifecycle
(src/main.rs:21-213), laid out per SURVEY.md §3.4:

    read_parquet(sequences)                       # streaming blocks
      → map_batches(AssignPartition)              # pid = hash(source)+salt
      → [resume filter: drop completed pids]
      → map_batches(ParseStage)                   # detok + parse + filters (vectorized)
      → map_batches(EnrichStage, actor pool)      # broadcast source lookup
      → groupby(pid).map_groups(PartitionWriter)  # per-level sinks + lineage
      → read_routed → report_counts               # one-pass partial aggregates
      → assemble_report                           # driver-side, tiny

Without ``out_dir`` the routing exchange is skipped and aggregates stream
directly off the parse stage (one pass, no shuffle of full rows).

Never calls ray.init()/shutdown() — session ownership stays with the caller
(driver contract in /root/repo/__ray_entry__.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd

from timberjack_ray import vocab
from timberjack_ray.aggregates import report_counts
from timberjack_ray.config import AnalyzeConfig
from timberjack_ray.report import assemble_report
from timberjack_ray.stages.enrich import enrich
from timberjack_ray.stages.parse import CountStage, ParseStage
from timberjack_ray.stages.route import (
    AssignPartition,
    build_salt_map,
    filter_completed,
    read_routed,
    route_and_write,
    source_shares,
)


@dataclass
class AnalyzeOutput:
    report: dict
    counts: pd.DataFrame            # (kind, key, n) totals
    fmt: str
    route_metrics: pd.DataFrame | None = None
    skipped_partitions: int = 0


def sample_decoded_lines(ds, k: int = 10) -> list[str]:
    """Driver-side head sample for format detection (src/main.rs:52-89
    samples the first ≤10 non-empty lines of the file)."""
    rows = ds.limit(k).take(k)
    out = []
    for r in rows:
        if "line" in r:
            out.append(r["line"])
        elif "text" in r:
            out.append(r["text"])
        elif "tokens" in r:
            out.append(vocab.decode(r["tokens"]))
    return out


def analyze_dataset(
    ds,
    cfg: AnalyzeConfig,
    out_dir: str | None = None,
    lookup: dict | None = None,
    num_partitions: int = 64,
    input_paths=None,
    hot_threshold: float = 0.05,
    batch_size: int | None = None,
) -> AnalyzeOutput:
    """Run the full analysis DAG over a sequences Dataset."""
    fmt = cfg.resolve_format(sample_decoded_lines(ds)) if cfg.fmt == "auto" else cfg.resolve_format([])

    if cfg.count:
        partials = ds.map_batches(
            CountStage(cfg.pattern, cfg.level), batch_format="pyarrow", batch_size=batch_size
        )
        n = int(partials.sum("n") or 0)
        counts = pd.DataFrame({"kind": ["total"], "key": [""], "n": [n]})
        report = {"matched_lines": [], "total_count": n, "time_trends": None,
                  "stats": None, "deduplicated": True}
        return AnalyzeOutput(report=report, counts=counts, fmt=fmt)

    skipped = 0
    if out_dir is not None:
        # partition assignment first: resume filtering then skips parse+shuffle
        salt_map = None
        if input_paths is not None:
            shares = source_shares(input_paths)
            salt_map = build_salt_map(shares, num_partitions, hot_threshold)
        ds = ds.map_batches(
            AssignPartition(num_partitions, salt_map), batch_format="pyarrow", batch_size=batch_size
        )
        ds, skipped = filter_completed(ds, out_dir)

    # a pre-built instance runs as stateless TASKS (elastic); the heavy state
    # (compiled regexes, piece table) is module-level, created once per worker
    # process at import — the actor-pool variant is only needed when per-stage
    # state is expensive to build (see stages/enrich.py)
    parsed = ds.map_batches(
        ParseStage(cfg=cfg, fmt=fmt, keep_tokens=out_dir is not None),
        batch_format="pyarrow",
        batch_size=batch_size,
    )

    extra_cols: list[str] = []
    if lookup is not None:
        parsed = enrich(parsed, lookup)
        extra_cols = ["severity", "service"]
    if "source" in ds.schema().names:
        extra_cols.append("source")

    route_metrics = None
    if out_dir is not None:
        route_metrics = route_and_write(parsed, out_dir).to_pandas()
        agg_cols = ["level", "source"] + (["severity", "service"] if lookup else [])
        if cfg.trend:
            agg_cols.append("ts_hour")
        if cfg.stats:
            agg_cols += ["message_key", "error_type"]
        if cfg.collect_lines:
            agg_cols.append("line")
        agg_src = read_routed(out_dir, columns=agg_cols)
    else:
        agg_src = parsed

    counts = report_counts(
        agg_src,
        want_trend=cfg.trend,
        want_stats=cfg.stats,
        want_lines=cfg.collect_lines,
        extra_cols=extra_cols,
    ).to_pandas()
    if counts.empty or "kind" not in counts.columns:
        # all rows filtered out → Ray yields a schemaless empty frame
        counts = pd.DataFrame({"kind": [], "key": [], "n": []})
    report = assemble_report(counts, cfg)
    return AnalyzeOutput(
        report=report, counts=counts, fmt=fmt,
        route_metrics=route_metrics, skipped_partitions=skipped,
    )


def analyze_parquet(paths, cfg: AnalyzeConfig, **kwargs) -> AnalyzeOutput:
    import ray.data as rd

    ds = rd.read_parquet(paths)
    return analyze_dataset(ds, cfg, input_paths=paths, **kwargs)
