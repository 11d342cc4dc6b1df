"""Shared mutable state held in Ray actors — the one place the Dataset
API genuinely can't express the semantics (an index that must observe
ARRIVAL order across an unbounded stream)."""

from __future__ import annotations

import numpy as np


class ShardPool:
    """Base for sharded-actor front-ends: owns the actor list, the
    owner-split scatter helper, and the close/context-manager lifecycle
    (r03 session review: these were copy-pasted across the three state
    modules)."""

    def __init__(self, actors):
        import ray

        self.shards = list(actors)
        self.n_shards = len(self.shards)
        self._ray = ray

    def _split(self, owner: np.ndarray):
        """[(shard, row-index array)] for every non-empty owner class."""
        return [(s, idx) for s in range(self.n_shards)
                if len(idx := np.flatnonzero(owner == s))]

    def close(self) -> None:
        for s in self.shards:
            self._ray.kill(s)
        self.shards = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
