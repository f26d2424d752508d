"""Multi-host / multi-worker corpus sharding.

The reference's only scale-out story is replicating Docker containers with
`.done` files as a poor-man's distributed lock (SURVEY.md 2e).  Here corpus
sharding is first-class: deterministic round-robin assignment of videoids
to workers, with the byte-compatible `.done` sentinels still providing
idempotent resume, so any worker can crash and be restarted (elastic
recovery, SURVEY.md section 5).
"""

from __future__ import annotations

from typing import Sequence


def shard_videoids(videoids: Sequence[str], worker_index: int,
                   n_workers: int) -> list:
    """Deterministic round-robin shard of the corpus for one worker."""
    if n_workers < 1:
        raise ValueError("n_workers must be >= 1")
    if not (0 <= worker_index < n_workers):
        raise ValueError(f"worker_index {worker_index} not in [0, {n_workers})")
    return list(videoids[worker_index::n_workers])
