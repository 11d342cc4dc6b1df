"""Parse + filter stage — the fused per-batch transform.

One ``map_batches`` callable class reproduces the reference's per-line
``analyze_line`` (src/analyzer.rs:211-289) as a vectorized Arrow transform:
detokenize → (format-specific parse) → field/level/pattern masks → filter →
append analysis columns.  Regexes and config are prepared once per worker in
``__init__`` (reference: lazy_static globals, src/analyzer.rs:16-28), then
each ``__call__`` is pure vectorized compute.

Input batch columns: ``tokens`` (list<int32>, decoded via the static vocab)
or an existing ``line``/``text`` string column.  Output: input columns
(minus ``tokens`` unless ``keep_tokens``) + ``line, level`` and, when
enabled, ``ts_hour, message_key, error_type``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from timberjack_ray import kernels, vocab
from timberjack_ray.config import AnalyzeConfig


def line_column(batch: pa.Table) -> pa.ChunkedArray | pa.Array:
    if "line" in batch.column_names:
        return batch["line"]
    if "tokens" in batch.column_names:
        return vocab.detokenize(batch["tokens"])
    if "text" in batch.column_names:
        return batch["text"]
    raise ValueError(f"no line/tokens/text column in {batch.column_names}")


class ParseStage:
    """Stateless-per-batch, stateful-per-worker parse+filter transform.

    Use with ``ds.map_batches(ParseStage, fn_constructor_kwargs=dict(cfg=cfg,
    fmt=fmt), batch_format="pyarrow", ...)``.  ``fmt`` must already be
    resolved ('generic' or 'json') — format auto-detection samples the
    dataset head driver-side (see pipelines/analyze.py), mirroring the
    reference's file-head sampling (src/main.rs:52-89).
    """

    def __init__(self, cfg: AnalyzeConfig, fmt: str, keep_tokens: bool = True):
        self.custom = None
        if fmt not in ("generic", "json"):
            # user-registered parser (registry.ParserRegistry) — the instance
            # ships to workers inside this stage via cloudpickle
            from timberjack_ray.registry import default_registry

            self.custom = default_registry().get(fmt)
        self.cfg = cfg
        self.fmt = fmt
        self.keep_tokens = keep_tokens
        self.filters = cfg.field_filters()
        self.pattern = cfg.pattern
        self.level_filter = cfg.level
        self.want_stats = cfg.stats
        self.want_trend = cfg.trend

    # -- helpers -----------------------------------------------------------

    def _parse_json(self, lines: list[str]):
        """Per-row JSON parse (the reference's slow path too).  Returns
        (ts, level, keep_mask) numpy arrays; field-filter evaluation is fused
        into this loop so fields dicts never leave the batch."""
        n = len(lines)
        ts = np.empty(n, dtype=object)
        level = np.empty(n, dtype=object)
        keep = np.ones(n, dtype=bool)
        want_fields = bool(self.filters)
        for i, line in enumerate(lines):
            t, lv, fields = kernels.parse_json_line(line, want_fields=want_fields)
            ts[i] = t
            level[i] = lv
            if want_fields and not kernels.field_filter_match(line, fields, self.filters):
                keep[i] = False
        return ts, level, keep

    # -- main --------------------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        lines = line_column(batch)
        if isinstance(lines, pa.Array):
            lines = pa.chunked_array([lines])

        # empty lines are skipped entirely (src/analyzer.rs:299); null lines
        # (undecodable token rows, vocab.detokenize) are skipped the same way
        nonempty = pc.and_kleene(pc.is_valid(lines), pc.not_equal(lines, ""))
        if not (pc.all(nonempty).as_py() or False):
            batch = batch.filter(nonempty)
            lines = lines.filter(nonempty)

        if self.custom is not None:
            parsed = self.custom.parse_batch(pa.table({"line": lines}))
            level = parsed["level"]
            ts = parsed["ts"]
            if self.filters:
                field_mask = kernels.fallback_filter_mask(lines, self.filters)
            else:
                field_mask = None
        elif self.fmt == "json":
            pylines = lines.to_pylist()
            ts_np, parsed_level_np, keep_np = self._parse_json(pylines)
            ts = pa.chunked_array([pa.array(ts_np, type=pa.string())])
            parsed_level = pa.chunked_array([pa.array(parsed_level_np, type=pa.string())])
            # fallback level for rows the JSON parser left level-less
            # (src/analyzer.rs:232-245)
            fallback = kernels.extract_level(lines)
            level = pc.if_else(pc.is_valid(parsed_level), parsed_level, fallback)
            # timestamp fallback: raw-line TIMESTAMP_REGEX when the JSON had
            # no timestamp key (src/analyzer.rs:273-280)
            ts = pc.if_else(pc.is_valid(ts), ts, kernels.extract_timestamp_raw(lines))
            field_mask = pa.chunked_array([pa.array(keep_np)])
        else:
            level = kernels.extract_level(lines)
            ts = kernels.hour_bucket(kernels.extract_timestamp_raw(lines))
            if self.filters:
                field_mask = kernels.fallback_filter_mask(lines, self.filters)
            else:
                field_mask = None

        mask = None
        if field_mask is not None:
            mask = field_mask
        lm = kernels.level_mask(level, self.level_filter)
        if lm is not None:
            mask = lm if mask is None else pc.and_(mask, lm)
        pm = kernels.pattern_mask(lines, self.pattern)
        if pm is not None:
            mask = pm if mask is None else pc.and_(mask, pm)

        if mask is not None:
            batch = batch.filter(mask)
            lines = lines.filter(mask)
            level = level.filter(mask)
            ts = ts.filter(mask)

        cols = {name: batch[name] for name in batch.column_names if name not in ("line", "text")}
        if not self.keep_tokens:
            cols.pop("tokens", None)
            cols.pop("n_tok", None)
        cols["line"] = lines
        cols["level"] = level
        if self.want_trend:
            cols["ts_hour"] = kernels.hour_bucket(ts)
        if self.want_stats:
            cols["message_key"] = kernels.message_key(lines)
            cols["error_type"] = kernels.extract_error_type(lines)
        return pa.table(cols)


class CountStage:
    """--count fast path (src/main.rs:299-366): pattern + level only, NO
    parser and NO field filters — a deliberate reference quirk (JSON parsed
    levels are unavailable, so ``--count --level X`` over JSON yields 0).

    Emits one partial-count row per batch; sum the ``n`` column.
    """

    def __init__(self, pattern: str | None, level: str | None):
        self.pattern = pattern
        self.level = level

    def __call__(self, batch: pa.Table) -> pa.Table:
        lines = line_column(batch)
        mask = pc.and_kleene(pc.is_valid(lines), pc.not_equal(lines, ""))
        if self.level is not None:
            mask = pc.and_(mask, kernels.level_mask(kernels.extract_level(lines), self.level))
        if self.pattern is not None:
            mask = pc.and_(mask, kernels.pattern_mask(lines, self.pattern))
        n = pc.sum(mask).as_py() or 0
        return pa.table({"n": pa.array([n], type=pa.int64())})
