"""Whole-pipeline A/B of the polyexp-fused iterate (R never in HBM).

With the M-ring fusion landed, the fused iterate's remaining HBM
traffic is dominated by the R operands: R0 5ch f32 reads + R1 window
reads at 2x overfetch = 15 of its 19 analytic byte-units per iteration,
plus the polyexp stage itself (25.8 ms standalone at 18% of the DMA
ceiling, 1.33 GB of 5ch f32 store).  update_flow_fused_poly deletes
both: raw 1-channel image windows are DMA'd per band and
polyexp.moment_band derives the R0 band / anchored R1 window in VMEM
(bitwise-equal op order), re-deriving R each iteration instead of
reading it.

Measures the FULL 1080p B=16 pipeline (headline config) and the
motion-boundary config with fused_iterate.FUSE_POLYEXP off vs on, in
ONE process with the honest sync, and asserts outputs BITWISE equal.

Usage: python benchmarks/exp_fused_polyexp.py [--skip-boundary]
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

from optical_flow_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def _measure(f1, f2, batch=16, iters=6, pipeline=5):
    import jax
    import jax.numpy as jnp
    from optical_flow_tpu.models.farneback import calc_flow_batched
    from optical_flow_tpu.utils.config import FarnebackConfig

    h, w = f1.shape
    prev = jax.device_put(np.broadcast_to(f1, (batch, h, w)).copy())
    nxt = jax.device_put(np.broadcast_to(f2, (batch, h, w)).copy())
    cfg = FarnebackConfig()

    def sync(x):
        float(jnp.sum(x[:, ::97, ::97]))

    out = calc_flow_batched(prev, nxt, cfg)
    sync(out)
    for _ in range(2):
        sync(calc_flow_batched(prev, nxt, cfg))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [calc_flow_batched(prev, nxt, cfg) for _ in range(pipeline)]
        sync(outs[-1])
        times.append((time.perf_counter() - t0) / pipeline)
    dt = float(np.median(times))
    return batch / dt, np.asarray(out[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-boundary", action="store_true")
    args = ap.parse_args()

    import optical_flow_tpu.models.farneback.flow as flowmod
    import optical_flow_tpu.pallas.fused_iterate as fi
    from optical_flow_tpu.oracle import (motion_boundary_pair,
                                         smooth_texture_pair)
    from optical_flow_tpu.pallas.update_gather import (consume_tier_stats,
                                                       reset_tier_counts)

    f1, f2 = smooth_texture_pair(1080, 1920, (2, 3))
    b1, b2 = motion_boundary_pair(1080, 1920)

    results = {}
    flows = {}
    for mode in ("materialized", "polyfused"):
        fi.FUSE_POLYEXP = (mode == "polyfused")
        flowmod._jitted_batched.cache_clear()
        r = {}
        t0 = time.perf_counter()
        pps, out0 = _measure(f1, f2)
        r["compile_plus_first_s"] = round(time.perf_counter() - t0, 1)
        r["smooth_pairs_per_s"] = round(pps, 1)
        flows[(mode, "smooth")] = out0
        if not args.skip_boundary:
            reset_tier_counts()
            pps_b, out_b = _measure(b1, b2, iters=4)
            r["boundary_pairs_per_s"] = round(pps_b, 1)
            r["boundary_tiers"] = consume_tier_stats()
            flows[(mode, "boundary")] = out_b
        results[mode] = r

    for k in ("smooth", "boundary"):
        a = flows.get(("materialized", k))
        b = flows.get(("polyfused", k))
        if a is not None and b is not None:
            results[f"{k}_bitwise_equal"] = bool(np.array_equal(a, b))
            results[f"{k}_max_abs_diff"] = float(np.abs(a - b).max())
    print(json.dumps(results))


if __name__ == "__main__":
    main()
