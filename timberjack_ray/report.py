"""Report assembly — the JSON/text shapes of /root/reference/src/formatter.rs.

Assembled driver-side from the tiny (kind, key, n) counts table produced by
``aggregates.report_counts``.  Ordering is DEFINED deterministically (count
desc, key asc) where the reference relies on hashmap iteration order
(formatter.rs:113-137) or first-seen order (matched lines) — distributed
execution cannot reproduce those, SURVEY.md §2.6.
"""

from __future__ import annotations

import pandas as pd

from timberjack_ray import aggregates as agg
from timberjack_ray.config import AnalyzeConfig

MAX_UNIQUE_LINES = 10_000  # src/analyzer.rs:13


def _kind(counts: pd.DataFrame, kind: str) -> pd.DataFrame:
    return counts[counts["kind"] == kind][["key", "n"]]


def assemble_report(counts: pd.DataFrame, cfg: AnalyzeConfig,
                    unique_count: int | None = None,
                    unique_approx: bool = False) -> dict:
    """→ dict with the JsonOutput shape (formatter.rs:7-48).

    ``unique_count``: pre-computed distinct-message count — passed by the
    pipelines, which strip the high-cardinality ``msg#`` hash family from
    ``counts`` in Arrow before it ever reaches pandas.  ``unique_approx``:
    the count came from the HLL guard (aggregates.MSG_GUARD_LIMIT) — recorded
    in the report as ``stats.unique_messages_approx`` so a reader knows which
    path ran."""
    total = int(_kind(counts, agg.KIND_TOTAL)["n"].sum())

    out: dict = {
        "matched_lines": [],
        "total_count": total,
        "time_trends": None,
        "stats": None,
        "deduplicated": True,
    }

    if cfg.collect_lines:
        lines = _kind(counts, agg.KIND_LINE)
        order = _kind(counts, agg.KIND_LINE_ORDER) if cfg.first_seen else None
        if order is not None and len(order):
            # first-seen display (src/analyzer.rs:317-324): distinct lines by
            # MIN global row order — the deterministic distributed equivalent
            # of the reference's sequential first-occurrence push
            lines = lines.merge(order.rename(columns={"n": "first_seen"}),
                                on="key", how="left")
            lines = lines.sort_values(["first_seen", "key"],
                                      na_position="last").head(MAX_UNIQUE_LINES)
        else:
            lines = lines.sort_values(["n", "key"],
                                      ascending=[False, True]).head(MAX_UNIQUE_LINES)
        out["matched_lines"] = [
            {"line": k, "count": int(n)} for k, n in zip(lines["key"], lines["n"])
        ]

    if cfg.trend:
        trends = _kind(counts, agg.KIND_TREND).sort_values("key")  # asc, formatter.rs:89-91
        if len(trends):
            out["time_trends"] = [
                {"timestamp": k, "count": int(n)} for k, n in zip(trends["key"], trends["n"])
            ]

    if cfg.stats:
        levels = _kind(counts, agg.KIND_LEVEL).sort_values(
            ["n", "key"], ascending=[False, True]
        )
        errors = _kind(counts, agg.KIND_ERROR).sort_values(
            ["n", "key"], ascending=[False, True]
        ).head(cfg.top_errors)
        msgs = _kind(counts, agg.KIND_MSG)
        if unique_count is None:
            sketches = _kind(counts, agg.KIND_MSG_SKETCH)
            if len(sketches):
                # a guard-degraded fold reached this path with raw counts:
                # merge the register rows + absorb any exact keys
                import base64

                import numpy as np

                from timberjack_ray.functions.sketch import HyperLogLog

                hll = HyperLogLog(p=14)
                for b in sketches["key"]:
                    hll.merge_registers(np.frombuffer(base64.b64decode(b), dtype=np.uint8))
                hashes = _kind(counts, agg.KIND_MSG_HASH)["key"].tolist()
                if hashes:
                    hll.add_hashed(agg._hex_to_u64(hashes))
                if len(msgs):
                    hll.add_strings(msgs["key"].tolist())
                unique_count = int(round(hll.estimate()))
                unique_approx = True
            else:
                # default pipelines ship 64-bit message-key hashes, not the
                # keys (aggregates._hash_keys); either family yields the count
                unique_count = len(msgs) if len(msgs) else len(_kind(counts, agg.KIND_MSG_HASH))
        ratio = (1.0 - unique_count / total) * 100.0 if total > 0 else 0.0
        out["stats"] = {
            "log_levels": [
                {"level": k, "count": int(n)} for k, n in zip(levels["key"], levels["n"])
            ],
            "error_types": [
                {"error_type": k, "count": int(n), "rank": i + 1}
                for i, (k, n) in enumerate(zip(errors["key"], errors["n"]))
            ],
            "unique_messages_count": unique_count,
            "repetition_ratio": ratio,
            "unique_messages": sorted(msgs["key"]) if cfg.show_unique else None,
        }
        if unique_approx:
            out["stats"]["unique_messages_approx"] = True

    # engine extension beyond formatter.rs: per-source / per-enrichment
    # statistics when the pipeline carried those columns (north_star's
    # per-source histograms; kind "col:<name>" from aggregates.PartialCounts)
    extra = {}
    for kind in counts["kind"].unique() if len(counts) else []:
        if not str(kind).startswith("col:"):
            continue
        fam = _kind(counts, kind).sort_values(["n", "key"], ascending=[False, True])
        extra[str(kind)[4:]] = [
            {"key": k, "count": int(n)} for k, n in zip(fam["key"], fam["n"])
        ]
    if extra:
        out["per_column_counts"] = extra
    return out


def render_text(report: dict) -> str:
    """Text rendering mirroring formatter.rs:167-277 (print_results text
    branch); matched-line order is our deterministic (count desc, line asc)."""
    lines: list[str] = []
    shown = report["matched_lines"]
    for ml in shown:
        if ml["count"] > 1:
            lines.append(f"{ml['line']} [x{ml['count']}]")
        else:
            lines.append(ml["line"])
    total = report["total_count"]
    if total > len(shown) and shown:
        lines.append(f"... and {total - len(shown)} more lines (total: {total})")
    lines.append("")
    lines.append(f"Felled: {total} logs")

    if report.get("time_trends"):
        lines.append("")
        lines.append("Time trends:")
        for t in report["time_trends"]:
            plural = "" if t["count"] == 1 else "s"
            lines.append(f"  {t['timestamp']} - {t['count']} log{plural} occurred during this hour")

    stats = report.get("stats")
    if stats is not None:
        lines.append("")
        lines.append("Stats summary:")
        if stats["log_levels"]:
            lines.append("")
            lines.append("  Log levels:")
            for lc in stats["log_levels"]:
                plural = "" if lc["count"] == 1 else "s"
                lines.append(f"    {lc['level']}: {lc['count']} log{plural}")
        if stats["error_types"]:
            lines.append("")
            lines.append("  Top error types:")
            for et in stats["error_types"]:
                plural = "" if et["count"] == 1 else "s"
                lines.append(f"    {et['rank']}. {et['error_type']}: {et['count']} occurrence{plural}")
        lines.append("")
        lines.append(f"  Unique messages: {stats['unique_messages_count']}")
        lines.append(f"  Repetition ratio: {stats['repetition_ratio']:.1f}%")
        if stats.get("unique_messages"):
            lines.append("")
            lines.append("  Unique messages:")
            for m in stats["unique_messages"]:
                lines.append(f"    - {m}")

    lines.append("")
    lines.append("Timber finished chopping the log! \U0001FAB5")
    return "\n".join(lines)
