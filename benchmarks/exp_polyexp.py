"""A/B harness for the polyexp kernel's ig-folded variant on the real
chip: full 1080p B=16 pipeline with polyexp.FUSED_IG off vs on (same
process, honest sync), plus numerical agreement between the modes.

Usage: python benchmarks/exp_polyexp.py   — prints one JSON object.
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
    return batch / float(np.median(times)), np.asarray(out[0])


def main():
    import optical_flow_tpu.models.farneback.flow as flowmod
    import optical_flow_tpu.pallas.polyexp as pe
    from optical_flow_tpu.oracle import smooth_texture_pair

    f1, f2 = smooth_texture_pair(1080, 1920, (2, 3))
    results = {}
    flows = {}
    for mode in ("base", "fused"):
        pe.FUSED_IG = (mode == "fused")
        pe._build.cache_clear()
        flowmod._jitted_batched.cache_clear()
        t0 = time.perf_counter()
        pps, out0 = _measure(f1, f2)
        results[mode] = {
            "compile_plus_first_s": round(time.perf_counter() - t0, 1),
            "smooth_pairs_per_s": round(pps, 1),
        }
        flows[mode] = out0
    d = np.abs(flows["base"] - flows["fused"])
    results["max_abs_flow_diff"] = float(d.max())
    results["bitwise_equal"] = bool((d == 0).all())
    print(json.dumps(results))


if __name__ == "__main__":
    main()
