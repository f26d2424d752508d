"""A/B harness for update-kernel variants on the real chip.

Times the full 1080p B=16 pipeline (the headline bench config) and the
motion-boundary hard config with the update kernel's band-uniform fast
path off vs on, in ONE process (one backend handshake), with the honest
sync methodology (scalar host read; block_until_ready does not block on
tunneled transports).  Also asserts the two modes agree bitwise — the
fast path must be a pure re-scheduling of identical work.

Modes (each a (FAST_UNIFORM, SPLIT_NONUNIFORM, V_MAX) setting):
  base  — fast/split off (round-2 structure)
  fast  — band-uniform fast path, non-uniform bands pay the full
          statically-unrolled V_MAX=4 block (round-3/4 production)
  split — fast path + split non-uniform branch (quick vmax=1 fill +
          per-subtile-gated fori; measured a net loss round 4, OFF)
  v2    — fast path + V_MAX=2 in the non-uniform arm: halves the
          unrolled pass-1 block; spread-3+ subtiles (the seam) go to
          the pass-2 window they already take on boundary content.
          Still bitwise (every tier computes the exact same fetch;
          only which tier covers a pixel changes) — asserted below.

Usage: python benchmarks/exp_update_variants.py [--modes fast,v2]
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
    ap.add_argument("--modes", default="fast,split")
    ap.add_argument("--skip-boundary", action="store_true")
    args = ap.parse_args()

    import optical_flow_tpu.models.farneback.flow as flowmod
    import optical_flow_tpu.pallas.update_gather as ug
    from optical_flow_tpu.oracle import (motion_boundary_pair,
                                         smooth_texture_pair)
    from optical_flow_tpu.pallas.update_gather import (consume_tier_stats,
                                                       reset_tier_counts)

    f1, f2 = smooth_texture_pair(1080, 1920, (2, 3))
    b1, b2 = motion_boundary_pair(1080, 1920)

    results = {}
    flows = {}
    for mode in args.modes.split(","):
        ug.FAST_UNIFORM = mode in ("fast", "split", "v2")
        ug.SPLIT_NONUNIFORM = (mode == "split")
        ug.V_MAX = 2 if mode == "v2" else 4
        # V_MAX is not an lru key of the kernel builders (unlike
        # fast/split) — drop the built kernels so the new value traces
        ug._build.cache_clear()
        ug._build_chunked.cache_clear()
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

    modes = args.modes.split(",")
    if len(modes) == 2:
        for k in ("smooth", "boundary"):
            a, b = flows.get((modes[0], k)), flows.get((modes[1], k))
            if a is not None and b is not None:
                results[f"{k}_bitwise_equal"] = bool(np.array_equal(a, b))
                results[f"{k}_max_abs_diff"] = float(np.abs(a - b).max())
    print(json.dumps(results))


if __name__ == "__main__":
    main()
