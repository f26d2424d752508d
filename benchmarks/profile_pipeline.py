"""Per-level / per-stage profiling of the flow pipeline with HONEST sync.

Two measurement pitfalls this tool avoids (both bit us in round 2):

* `block_until_ready` can return before execution finishes on tunneled
  TPU transports — every timing here forces completion with a scalar
  host read (checksum).
* Per-dispatch overhead (~8-25 ms on a tunneled device) swamps
  individual-kernel timings — stages are timed over several in-flight
  dispatches with ONE sync (the same amortization the production
  pipelines get), and pipeline-level marginals (levels, iterations) are
  measured by differencing whole-pipeline variants, which is the only
  number that reflects in-program fusion/overlap.

Usage:
    python benchmarks/profile_pipeline.py [--height 1080 --width 1920]
        [--batch 16] [--levels-sweep] [--iters-sweep]

Prints one JSON object.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pairs(f1, f2, batch, n):
    import jax
    rng = np.random.default_rng(0)
    prev = np.broadcast_to(f1, (batch,) + f1.shape).copy()
    nxt = np.broadcast_to(f2, (batch,) + f2.shape).copy()
    return [(jax.device_put(prev + rng.integers(0, 2, prev.shape)
                            .astype(prev.dtype)),
             jax.device_put(nxt + rng.integers(0, 2, prev.shape)
                            .astype(prev.dtype)))
            for _ in range(n)]


def measure(cfg, pairs, trials=3):
    import jax.numpy as jnp
    from optical_flow_tpu.models.farneback import calc_flow_batched

    def sync(x):
        return float(jnp.sum(x[:, ::97, ::97]))

    sync(calc_flow_batched(pairs[0][0], pairs[0][1], cfg))
    for p, n in pairs:
        sync(calc_flow_batched(p, n, cfg))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        outs = [calc_flow_batched(p, n, cfg) for p, n in pairs]
        sync(outs[-1])
        ts.append((time.perf_counter() - t0) / len(pairs))
    return float(sorted(ts)[trials // 2])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--levels-sweep", action="store_true",
                    help="marginal cost of each pyramid level (one extra "
                         "compile per level count)")
    ap.add_argument("--iters-sweep", action="store_true",
                    help="marginal cost per update/blur iteration")
    args = ap.parse_args()

    from optical_flow_tpu.oracle import smooth_texture_pair
    from optical_flow_tpu.utils.config import FarnebackConfig

    f1, f2 = smooth_texture_pair(args.height, args.width, (2, 3))
    pairs = _pairs(f1, f2, args.batch, 5)
    out = {"height": args.height, "width": args.width, "batch": args.batch}

    dt = measure(FarnebackConfig(), pairs)
    out["default_ms_per_batch"] = round(dt * 1000, 1)
    out["default_pairs_per_s"] = round(args.batch / dt, 1)

    if args.levels_sweep:
        lv = {}
        for levels in (1, 2, 3, 4):
            lv[levels] = round(
                measure(FarnebackConfig(levels=levels), pairs) * 1000, 1)
        out["ms_by_levels"] = lv
    if args.iters_sweep:
        it = {}
        for iters in (1, 2, 3):
            it[iters] = round(
                measure(FarnebackConfig(iterations=iters), pairs) * 1000, 1)
        out["ms_by_iterations"] = it

    print(json.dumps(out))


if __name__ == "__main__":
    main()
