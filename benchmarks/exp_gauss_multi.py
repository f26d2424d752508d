"""Whole-pipeline A/B of the fused multi-level gauss_resize (MULTI).

Round-4 roofline: the three gauss_resize stages each re-read the
full-res frame (pad copy + phase-major restride + window sweep per
level) — ~24 ms of the 95.5 ms 1080p batch (ROOFLINE_r04_storeemit.json,
VERDICT r4 task 1).  gaussian_blur_resize_multi shares ONE pad copy and
ONE window sweep across every level: each grid step DMAs the S=8 phase
windows once and emits a 16-row band of L1+L2+L3 simultaneously.

Measures the FULL pipeline at the headline 1080p B=16 config, the
chained (visualizer) config, and 4K B=4, with gauss_resize.MULTI off vs
on in ONE process with the honest sync, and asserts the flows BITWISE
equal (the multi kernel is bitwise-identical per level — same combined
taps, same accumulation order, shared reflect band).

Usage: python benchmarks/exp_gauss_multi.py [--skip-4k]
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
    ap.add_argument("--skip-4k", action="store_true")
    args = ap.parse_args()

    import optical_flow_tpu.models.farneback.flow as flowmod
    import optical_flow_tpu.pallas.gauss_resize as gr
    from optical_flow_tpu.oracle import smooth_texture_pair

    f1, f2 = smooth_texture_pair(1080, 1920, (2, 3))
    if not args.skip_4k:
        u1, u2 = smooth_texture_pair(2160, 3840, (3, 5))

    results = {}
    flows = {}
    for mode in ("per_level", "multi"):
        gr.MULTI = (mode == "multi")
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
        if not args.skip_4k:
            pps_u, out_u = _measure(u1, u2, batch=4, iters=4)
            r["uhd4k_pairs_per_s"] = round(pps_u, 1)
            flows[(mode, "uhd4k")] = out_u
        results[mode] = r

    for k in ("smooth", "chain", "uhd4k"):
        a = flows.get(("per_level", k))
        b = flows.get(("multi", k))
        if a is not None and b is not None:
            results[f"{k}_bitwise_equal"] = bool(np.array_equal(a, b))
            assert np.isfinite(a).all() and np.isfinite(b).all()
            assert np.abs(a - b).max() < 1e-6, k

    print(json.dumps(results))


if __name__ == "__main__":
    main()
