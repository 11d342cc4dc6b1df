"""timberjack_ray — a Ray-Data-native log/telemetry analysis engine.

From-scratch reimplementation of the analysis semantics of
``donaldc24/timberjack`` (reference at /root/reference, a single-process Rust
CLI) as a distributed ``ray.data.Dataset`` pipeline over Parquet tables of
pre-tokenized sequences (doc_id, tokens:list<int32>, n_tok, source):

    parse → enrich → route → aggregate

Public API (mirrors the reference's library re-exports, src/lib.rs:8-12):
"""

from timberjack_ray.config import AnalyzeConfig
from timberjack_ray.pipelines.analyze import AnalyzeOutput, analyze_dataset, analyze_parquet
from timberjack_ray.report import assemble_report, render_text
from timberjack_ray.stream import analyze_stream
from timberjack_ray.vocab import decode, detokenize, encode

__all__ = [
    "AnalyzeConfig",
    "AnalyzeOutput",
    "analyze_dataset",
    "analyze_parquet",
    "analyze_stream",
    "assemble_report",
    "render_text",
    "decode",
    "detokenize",
    "encode",
]

__version__ = "0.1.0"
