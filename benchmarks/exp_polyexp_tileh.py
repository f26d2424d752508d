"""Do taller polyexp bands pay at 1080p now the VMEM budget is analytic?

TILE_H=32 was chosen when Mosaic's default 16 MB scoped-VMEM budget
rejected 48-row bands at 1080p (the in-kernel moment temporaries grow
with band_height x padded width).  _build now sets vmem_limit_bytes
from the analytic need including those temporaries, so taller bands
compile — and they halve the grid-step count again and cut the window
halo overfetch (2*pad=16 extra rows per band: 1.5x at 32, 1.33x at 48,
1.25x at 64).  The round-3 split profiler blamed per-band DMA latency
for 9.6 of 17 ms, so fewer/larger bands attack exactly that.

For each TILE_H in {32, 48, 64}: standalone fused-L0 polyexp timing,
bitwise equality vs TILE_H=32, then the whole-pipeline 1080p B=16 A/B
(bench config, honest sync).

Usage: python benchmarks/exp_polyexp_tileh.py
Prints one JSON object.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optical_flow_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

H, W, BATCH = 1080, 1920, 16
TILE_HS = (32, 48, 64)


def _measure_pipeline(f1, f2, batch=BATCH, iters=4, pipeline=3):
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
    return batch / float(np.median(times)), np.asarray(out[0])


def _measure_standalone(img, pre, iters=6):
    import jax.numpy as jnp
    import optical_flow_tpu.pallas.polyexp as pe

    def run():
        return pe.poly_exp_pallas(img, 5, 1.1, pre_taps=pre, exact_u8=True)

    out = run()
    float(jnp.sum(out[:, :, ::97, ::97]))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        o = run()
        float(jnp.sum(o[:, :, ::97, ::97]))
        times.append(time.perf_counter() - t0)
    return float(np.median(times)) * 1e3, np.asarray(out[0])


def main():
    import jax
    import optical_flow_tpu.models.farneback.flow as flowmod
    import optical_flow_tpu.pallas.polyexp as pe
    from optical_flow_tpu.models.farneback.params import gaussian_kernel
    from optical_flow_tpu.oracle import smooth_texture_pair

    f1, f2 = smooth_texture_pair(H, W, (2, 3))
    rng = np.random.default_rng(0)
    img = jax.device_put(
        rng.integers(0, 256, (BATCH, H, W)).astype(np.float32))
    pre = tuple(float(t) for t in gaussian_kernel(3, 0.6))

    results = {"tile_h_orig": pe.TILE_H}
    rs, flows = {}, {}
    for th in TILE_HS:
        pe.TILE_H = th
        pe._build.cache_clear()
        flowmod._jitted_batched.cache_clear()
        key = f"tile{th}"
        try:
            ms, r0 = _measure_standalone(img, pre)
            results[key + "_standalone_ms"] = round(ms, 2)
            rs[key] = r0
            pps, out0 = _measure_pipeline(f1, f2)
            results[key + "_pairs_per_s"] = round(pps, 1)
            flows[key] = out0
        except Exception as e:
            results[key + "_error"] = repr(e)[:400]
    base = f"tile{TILE_HS[0]}"
    for th in TILE_HS[1:]:
        key = f"tile{th}"
        if key in rs:
            hmin = min(rs[base].shape[1], rs[key].shape[1])
            results[key + "_r_bitwise"] = bool(
                np.array_equal(rs[base][:, :hmin], rs[key][:, :hmin]))
        if key in flows:
            results[key + "_flow_bitwise"] = bool(
                np.array_equal(flows[base], flows[key]))
            results[key + "_flow_maxdiff"] = float(
                np.abs(flows[base] - flows[key]).max())
    pe.TILE_H = results["tile_h_orig"]
    pe._build.cache_clear()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
