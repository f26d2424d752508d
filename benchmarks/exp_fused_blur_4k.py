"""Does the fused update+blur M-ring kernel fit and pay at 4K width?

The fused kernel is gated at FUSED_BLUR_WS_LIMIT=2304 (the M ring plus
the update scratch was sized against the 16 MB scoped-VMEM budget at
1080p).  At 4K L0 (Ws=3968, n_slots=1) the analytic scratch sum is
~10.2 MB plus ~5.6 MB of double-buffered in/out blocks — right at the
edge.  This experiment raises the gate to 4096 for one process, builds
the 4K kernel (Mosaic refusing == verdict "doesn't fit"), and if it
compiles runs the whole-pipeline 4K A/B (batch 4, the bench config)
with the honest sync, asserting bitwise equality like exp_fused_blur.

Usage: python benchmarks/exp_fused_blur_4k.py
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

H, W, BATCH = 2160, 3840, 4


def _measure(f1, f2, batch=BATCH, iters=4, pipeline=3):
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
    import optical_flow_tpu.pallas.fused_iterate as fi
    import optical_flow_tpu.pallas.update_gather as ug
    from optical_flow_tpu.oracle import smooth_texture_pair

    f1, f2 = smooth_texture_pair(H, W, (2, 3))
    results = {"ws_limit_orig": ug.FUSED_BLUR_WS_LIMIT}

    # verdict 1: does the 4K kernel even build/run on Mosaic?
    ug.FUSED_BLUR_WS_LIMIT = 4096
    try:
        import jax.numpy as jnp
        from optical_flow_tpu.models.farneback import core
        hl, wl = H, W                      # L0 of the 4K pyramid
        Hs = ((hl + 15) // 16) * 16 + 32
        Ws = ((wl + 2 * ug.COL_OFF + 127) // 128) * 128
        rng = np.random.default_rng(0)
        pad = [(0, 0), (0, 0), (ug.ROW_OFF, Hs - ug.ROW_OFF - hl),
               (ug.COL_OFF, Ws - ug.COL_OFF - wl)]
        R0p = jnp.pad(jnp.asarray(
            rng.standard_normal((1, 5, hl, wl)).astype(np.float32)), pad)
        R1p = jnp.pad(jnp.asarray(
            rng.standard_normal((1, 5, hl, wl)).astype(np.float32)), pad)
        flp = jnp.zeros((1, 2, Hs, Ws), np.float32)
        t0 = time.perf_counter()
        out, nvp = ug.fused_update_blur_store(R0p, R1p, flp, hl, wl, 15)
        _ = float(np.asarray(nvp).sum())
        results["kernel_4k_builds"] = True
        results["kernel_4k_compile_s"] = round(time.perf_counter() - t0, 1)
    except Exception as e:
        results["kernel_4k_builds"] = False
        results["kernel_4k_error"] = repr(e)[:400]
        ug.FUSED_BLUR_WS_LIMIT = results["ws_limit_orig"]
        print(json.dumps(results))
        return

    # verdict 2: whole-pipeline A/B at the bench 4K config
    flows = {}
    for mode, limit in (("gated_2304", results["ws_limit_orig"]),
                        ("fused_4096", 4096)):
        ug.FUSED_BLUR_WS_LIMIT = limit
        flowmod._jitted_batched.cache_clear()
        pps, out0 = _measure(f1, f2)
        results[mode + "_pairs_per_s"] = round(pps, 1)
        flows[mode] = out0
    results["bitwise_equal"] = bool(
        np.array_equal(flows["gated_2304"], flows["fused_4096"]))
    results["max_abs_diff"] = float(
        np.abs(flows["gated_2304"] - flows["fused_4096"]).max())
    ug.FUSED_BLUR_WS_LIMIT = results["ws_limit_orig"]
    print(json.dumps(results))


if __name__ == "__main__":
    main()
