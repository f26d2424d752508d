"""Whole-pipeline A/B of bf16 R storage (polyexp.R_BF16).

R is the pipeline's dominant HBM traffic: the store-emitting polyexp
writes it once per level and the fused iterate reads it 3x (R0 bands +
anchored R1 windows; docs/KERNELS.md roofline).  R_BF16 stores it in
bfloat16 — the consumer kernels widen to f32 immediately on load, so the
flow is BITWISE the f32 pipeline run on quantize_r_bf16(R), and the only
numerical change is the one rounding (measured ~0.002 px EPE vs cv2 at
1080p; gate 0.5).

Measures the FULL 1080p B=16 headline, the chained config and the
motion-boundary config with R_BF16 off vs on in ONE process with the
honest sync; reports per-config EPE vs cv2 for both modes and the
off-vs-on flow deviation (expected small but nonzero — this is a
quantization, not a relayout deletion).

Usage: python benchmarks/exp_r_bf16.py [--skip-boundary]
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


def _epe(f1, f2, ours0):
    try:
        import cv2
    except ImportError:
        return None
    ref = cv2.calcOpticalFlowFarneback(f1, f2, None, 0.5, 3, 15, 3, 5,
                                       1.2, 0)
    return float(np.sqrt(((np.asarray(ours0) - ref) ** 2).sum(-1)).mean())


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
    for mode in ("f32", "bf16"):
        pe.R_BF16 = (mode == "bf16")
        flowmod._jitted_batched.cache_clear()
        flowmod._jitted_chain.cache_clear()
        r = {}
        t0 = time.perf_counter()
        pps, out0 = _measure(f1, f2)
        r["compile_plus_first_s"] = round(time.perf_counter() - t0, 1)
        r["smooth_pairs_per_s"] = round(pps, 1)
        r["smooth_epe_vs_cv2"] = _epe(f1, f2, out0)
        flows[(mode, "smooth")] = out0
        pps_c, out_c = _measure_chain(f1, f2)
        r["chain_pairs_per_s"] = round(pps_c, 1)
        flows[(mode, "chain")] = out_c
        if not args.skip_boundary:
            reset_tier_counts()
            pps_b, out_b = _measure(b1, b2, iters=4)
            r["boundary_pairs_per_s"] = round(pps_b, 1)
            r["boundary_tiers"] = consume_tier_stats()
            r["boundary_epe_vs_cv2"] = _epe(b1, b2, out_b)
            flows[(mode, "boundary")] = out_b
        results[mode] = r

    for k in ("smooth", "chain", "boundary"):
        a = flows.get(("f32", k))
        b = flows.get(("bf16", k))
        if a is not None and b is not None:
            results[f"{k}_max_abs_diff"] = float(np.abs(a - b).max())
    print(json.dumps(results))


if __name__ == "__main__":
    main()
