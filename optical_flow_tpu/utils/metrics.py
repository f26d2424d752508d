"""Observability: stage timers, throughput counters, profiler annotations.

The reference has no tracing/metrics at all (SURVEY.md section 5); here
every pipeline stage is wrapped in a jax.profiler TraceAnnotation (visible
in TensorBoard/XProf captures) and per-video throughput (frame-pairs/sec)
is logged, which is the benchmark's headline metric.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Dict

import jax

from optical_flow_tpu.utils.logging import get_logger

logger = get_logger("optical_flow_tpu.metrics")


@dataclasses.dataclass
class StageStats:
    seconds: float = 0.0
    count: int = 0


class PipelineMetrics:
    """Accumulates per-stage wall time and work counters for one run."""

    def __init__(self, name: str):
        self.name = name
        self.stages: Dict[str, StageStats] = {}
        self.counters: Dict[str, int] = {}
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, stage: str):
        """Times a stage and tags it for the device profiler."""
        st = self.stages.setdefault(stage, StageStats())
        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(f"{self.name}/{stage}"):
            yield
        st.seconds += time.perf_counter() - t0
        st.count += 1

    def add(self, counter: str, n: int = 1) -> None:
        self.counters[counter] = self.counters.get(counter, 0) + n

    def log_summary(self) -> None:
        total = time.perf_counter() - self._t0
        pairs = self.counters.get("frame_pairs", 0)
        parts = [f"{self.name}: {total:.2f}s total"]
        if pairs:
            parts.append(f"{pairs} pairs ({pairs / total:.1f} pairs/s)")
        for k, v in sorted(self.stages.items()):
            parts.append(f"{k}={v.seconds:.2f}s/{v.count}x")
        # exactness-tier observability: content falling off the update
        # kernel's fast path (motion boundaries, dense noise) is visible,
        # not silent.  Counters are device-side (threaded out of the jitted
        # programs — no host callbacks), so they work on every transport;
        # consume_tier_stats folds the pending per-call vectors in.
        try:
            from optical_flow_tpu.pallas.update_gather import (
                consume_tier_stats)
            counts = consume_tier_stats()
            if counts["tier2"] or counts["tier3"]:
                parts.append(
                    f"update-kernel corrections: tier2={counts['tier2']}"
                    f" tier3={counts['tier3']}")
        except ImportError:        # pragma: no cover - pallas unavailable
            pass
        logger.info("; ".join(parts))
