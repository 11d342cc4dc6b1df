"""Shared mutable state held in Ray actors — the one place the Dataset
API genuinely can't express the semantics (an index that must observe
ARRIVAL order across an unbounded stream)."""
