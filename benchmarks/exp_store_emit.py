"""Whole-pipeline A/B of store-layout polyexp emission (STORE_EMIT).

update_flow_fused pads R0/R1 into the shared store layout once per level
— two 5-channel constant-pad copies that benchmarks/exp_iterate_pads.py
measured at ~6 ms/batch at 1080p B=16.  poly_exp_pallas_store deletes
them: the polyexp kernel writes R directly in the (B, 5, Hs, Ws) store
layout (one kernel launch per frame half; lane halos zeroed in-kernel,
row halos finite replicate-border values that only ever multiply the
zero border-scale field).

Measures the FULL 1080p B=16 pipeline (headline config) and the
motion-boundary config with polyexp.STORE_EMIT off vs on, in ONE process
with the honest sync, and asserts the outputs BITWISE equal (the store
emission is a pure relayout-copy deletion; the real R region is
bitwise-identical by moment_band's position-independent op order).

Usage: python benchmarks/exp_store_emit.py [--skip-boundary]
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


def _measure_chain(f1, f2, n_frames=17, iters=6, pipeline=5):
    """Chained-pair config (the visualizer's workload shape): ONE
    (N, 5, Hs, Ws) store array is both iterate operands under
    STORE_EMIT (r1_frame_off=1), vs slice+pad without it."""
    import jax
    import jax.numpy as jnp
    from optical_flow_tpu.models.farneback import calc_flow_chain_batched
    from optical_flow_tpu.utils.config import FarnebackConfig

    h, w = f1.shape
    fr = np.stack([f1 if i % 2 == 0 else f2 for i in range(n_frames)])
    frames = jax.device_put(fr)
    cfg = FarnebackConfig()

    def sync(x):
        float(jnp.sum(x[:, ::97, ::97]))

    out = calc_flow_chain_batched(frames, cfg)
    sync(out)
    for _ in range(2):
        sync(calc_flow_chain_batched(frames, cfg))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [calc_flow_chain_batched(frames, cfg)
                for _ in range(pipeline)]
        sync(outs[-1])
        times.append((time.perf_counter() - t0) / pipeline)
    dt = float(np.median(times))
    return (n_frames - 1) / dt, np.asarray(out[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-boundary", action="store_true")
    args = ap.parse_args()

    import optical_flow_tpu.models.farneback.flow as flowmod
    import optical_flow_tpu.pallas.polyexp as pe
    from optical_flow_tpu.oracle import (motion_boundary_pair,
                                         smooth_texture_pair)
    from optical_flow_tpu.pallas.update_gather import (consume_tier_stats,
                                                       reset_tier_counts)

    f1, f2 = smooth_texture_pair(1080, 1920, (2, 3))
    b1, b2 = motion_boundary_pair(1080, 1920)

    results = {}
    flows = {}
    for mode in ("padded", "storeemit"):
        pe.STORE_EMIT = (mode == "storeemit")
        flowmod._jitted_batched.cache_clear()
        flowmod._jitted_chain.cache_clear()
        r = {}
        t0 = time.perf_counter()
        pps, out0 = _measure(f1, f2)
        r["compile_plus_first_s"] = round(time.perf_counter() - t0, 1)
        r["smooth_pairs_per_s"] = round(pps, 1)
        flows[(mode, "smooth")] = out0
        pps_c, out_c = _measure_chain(f1, f2)
        r["chain_pairs_per_s"] = round(pps_c, 1)
        flows[(mode, "chain")] = out_c
        if not args.skip_boundary:
            reset_tier_counts()
            pps_b, out_b = _measure(b1, b2, iters=4)
            r["boundary_pairs_per_s"] = round(pps_b, 1)
            r["boundary_tiers"] = consume_tier_stats()
            flows[(mode, "boundary")] = out_b
        results[mode] = r

    for k in ("smooth", "chain", "boundary"):
        a = flows.get(("padded", k))
        b = flows.get(("storeemit", k))
        if a is not None and b is not None:
            results[f"{k}_bitwise_equal"] = bool(np.array_equal(a, b))
            results[f"{k}_max_abs_diff"] = float(np.abs(a - b).max())
    print(json.dumps(results))


if __name__ == "__main__":
    main()
