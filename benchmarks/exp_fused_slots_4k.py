"""Does double-buffering the R1 displaced-fetch window pay at 4K?

DBUF_W_LIMIT=2048 single-buffers the (n_slots, 5, WIN_H, w) window
scratch above 2K widths — a gate from the default-16 MB-scoped-VMEM
era.  The update builds now set vmem_limit_bytes analytically, so
n_slots=2 fits at 4K; the question is whether overlapping the next
band's window DMA with compute still pays when each window is 2x wider.

A/B at the bench 4K config (batch 4, honest sync), asserting bitwise
equality.  Usage: python benchmarks/exp_fused_slots_4k.py
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
    import optical_flow_tpu.pallas.update_gather as ug
    from optical_flow_tpu.oracle import smooth_texture_pair

    f1, f2 = smooth_texture_pair(H, W, (2, 3))
    results = {"dbuf_limit_orig": ug.DBUF_W_LIMIT}

    flows = {}
    for mode, limit in (("slots1", results["dbuf_limit_orig"]),
                        ("slots2", 4096)):
        ug.DBUF_W_LIMIT = limit
        ug._build.cache_clear()
        ug._build_fused_blur.cache_clear()
        flowmod._jitted_batched.cache_clear()
        try:
            pps, out0 = _measure(f1, f2)
            results[mode + "_pairs_per_s"] = round(pps, 1)
            flows[mode] = out0
        except Exception as e:
            results[mode + "_error"] = repr(e)[:400]
    if len(flows) == 2:
        results["flow_bitwise_equal"] = bool(
            np.array_equal(flows["slots1"], flows["slots2"]))
        results["flow_max_abs_diff"] = float(
            np.abs(flows["slots1"] - flows["slots2"]).max())
    ug.DBUF_W_LIMIT = results["dbuf_limit_orig"]
    ug._build.cache_clear()
    ug._build_fused_blur.cache_clear()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
