"""Whole-pipeline A/B of n-images-per-grid-step polyexp (PAIR_STEP).

polyexp L0 is DMA issue-latency bound (docs/KERNELS.md roofline: 18% of
the window-DMA ceiling; N_SLOTS depth 3/4 measured a no-op) — each band
pays a fixed window-DMA + store turnaround regardless of bytes.
PAIR_STEP=n processes n batch images' same band rows per grid step: ONE
strided window DMA instead of n, and 1/n the grid steps, amortizing the
per-step latency.  The sub-bands run the identical moment_band body
sequentially, so outputs are bitwise equal by construction (verified in
interpret mode and asserted here on device).

Measures the FULL 1080p B=16 pipeline (headline config) and a standalone
jitted L0 poly_exp_pallas_store at the production geometry for
PAIR_STEP in (1, 2, 4), ONE process, honest sync, bitwise check.

Usage: python benchmarks/exp_pair_step.py [--skip-standalone]
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


def _measure_standalone(batch=16, h=1080, w=1920, iters=5, pipeline=4):
    """Jitted production-geometry L0 poly_exp_pallas_store alone."""
    import jax
    import jax.numpy as jnp
    from optical_flow_tpu.models.farneback.params import (build_plan,
                                                          gaussian_kernel)
    from optical_flow_tpu.pallas import polyexp as pe
    from optical_flow_tpu.pallas.fused_iterate import fused_store_geometry
    from optical_flow_tpu.utils.config import FarnebackConfig

    cfg = FarnebackConfig()
    plan = build_plan(h, w, cfg)
    lv0 = plan.levels[-1]
    assert lv0.k == 0
    taps = tuple(float(t) for t in
                 gaussian_kernel(lv0.smooth_ksize, lv0.smooth_sigma))
    Hs, Ws = fused_store_geometry(h, w, cfg.winsize)
    rng = np.random.default_rng(0)
    img = jax.device_put(rng.integers(0, 256, (batch, h, w),
                                      dtype=np.uint8))
    fn = jax.jit(lambda x: pe.poly_exp_pallas_store(
        x, Hs, Ws, cfg.poly_n, cfg.poly_sigma, pre_taps=taps,
        exact_u8=True))

    def sync(x):
        float(jnp.sum(x[:, :, ::97, ::97]))

    out = fn(img)
    sync(out)
    for _ in range(2):
        sync(fn(img))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [fn(img) for _ in range(pipeline)]
        sync(outs[-1])
        times.append((time.perf_counter() - t0) / pipeline)
    del out, outs
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-standalone", action="store_true")
    args = ap.parse_args()

    import optical_flow_tpu.models.farneback.flow as flowmod
    import optical_flow_tpu.pallas.polyexp as pe
    from optical_flow_tpu.oracle import smooth_texture_pair

    f1, f2 = smooth_texture_pair(1080, 1920, (2, 3))

    results = {}
    flows = {}
    for n in (1, 2, 4):
        pe.PAIR_STEP = n
        pe._build.cache_clear()
        flowmod._jitted_batched.cache_clear()
        flowmod._jitted_chain.cache_clear()
        r = {}
        t0 = time.perf_counter()
        pps, out0 = _measure(f1, f2)
        r["compile_plus_first_s"] = round(time.perf_counter() - t0, 1)
        r["smooth_pairs_per_s"] = round(pps, 1)
        flows[n] = out0
        if not args.skip_standalone:
            r["polyexp_L0_store_ms"] = round(
                _measure_standalone() * 1e3, 2)
        results[f"pair{n}"] = r

    for n in (2, 4):
        results[f"pair{n}_bitwise_equal"] = bool(
            np.array_equal(flows[1], flows[n]))
        results[f"pair{n}_max_abs_diff"] = float(
            np.abs(flows[1] - flows[n]).max())
    print(json.dumps(results))


if __name__ == "__main__":
    main()
