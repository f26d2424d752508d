"""Probe: which CONTENT geometry makes the tier-2 counter fire end-to-end?

VERDICT r4 task 6: the tier2/tier3 counters have never been observed
nonzero outside synthetic unit tests (the motion-boundary bench's ±3 px
opposed motion has tiny per-band source spread, which the in-kernel
pass 2 absorbs).  Tier 2 fires when a band's displaced-fetch source rows
spread past WIN_H=32 AND bimodally (two modes > WIN_H apart), so the
content must carry tens-of-pixels vertical jumps in adjacent strips —
oracle.vertical_jump_pair.

Runs the PRODUCTION jitted pipeline (calc_flow_batched at 1080p B=16)
on candidate geometries and prints the device-side tier counters +
throughput for each.  The winning geometry becomes bench.py's
`tier_spill` extra.

Usage: python benchmarks/exp_tier_fire.py
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


def measure(f1, f2, batch=16, iters=4, pipeline=3):
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
    sync(calc_flow_batched(prev, nxt, cfg))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        outs = [calc_flow_batched(prev, nxt, cfg) for _ in range(pipeline)]
        sync(outs[-1])
        times.append((time.perf_counter() - t0) / pipeline)
    return batch / float(np.median(times)), np.asarray(out[0])


def main():
    from optical_flow_tpu.oracle import vertical_jump_pair
    from optical_flow_tpu.pallas.update_gather import (consume_tier_stats,
                                                       reset_tier_counts)

    H, W = 1080, 1920
    geoms = {
        "bimodal_40_104": dict(jumps=((0.37, 0.445, 40), (0.46, 0.535, 104))),
        "bimodal_48_120": dict(jumps=((0.35, 0.44, 48), (0.46, 0.55, 120))),
        "single_48": dict(jumps=((0.40, 0.50, 48),)),
        "triple": dict(jumps=((0.30, 0.38, 40), (0.40, 0.48, 88),
                              (0.50, 0.58, 136))),
    }
    out = {}
    for name, kw in geoms.items():
        f1, f2 = vertical_jump_pair(H, W, **kw)
        reset_tier_counts()
        pps, flow0 = measure(f1, f2)
        counts = consume_tier_stats()
        # how much of the jump did the pyramid actually recover?
        fy = flow0[..., 1] if flow0.shape[-1] == 2 else flow0[1]
        out[name] = {
            "pairs_per_s": round(pps, 1),
            "tier2": counts["tier2"],
            "tier3": counts["tier3"],
            "max_flow_y": round(float(np.max(fy)), 1),
        }
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
