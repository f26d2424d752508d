"""Whole-pipeline A/B of the polyexp input builder and band height.

Cross-process timings on the axon transport drift ~1 ms, and stripped
micro-kernels carry a per-program floor, so the only trustworthy
comparison is the FULL 1080p smooth pipeline measured repeatedly in one
process.  Configs (builder, tile_h):

  legacy/16   round-2 production (edge-mode pad, 16-row bands)
  zdus/16     zero-pad + thin-DUS replicate borders
  zdus/32     same + 32-row polyexp bands (half the grid steps)
  legacy/32   isolates the tile effect from the builder effect

Each config gets a FRESH trace (polyexp._build cache cleared, new jit)
so the kernels are actually rebuilt; flow outputs are checked bitwise
against the first config.  Honest-sync methodology.

Usage: python benchmarks/exp_polyexp_prod.py [--batch 16] — one JSON line.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--configs", default="legacy/16,zdus/16,zdus/32,legacy/32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from optical_flow_tpu.models.farneback import flow as flow_mod
    from optical_flow_tpu.models.farneback.params import build_plan
    from optical_flow_tpu.pallas import polyexp as pe
    from optical_flow_tpu.utils.config import FarnebackConfig
    from optical_flow_tpu.oracle import smooth_texture_pair

    H, W, B = args.height, args.width, args.batch
    f1, f2 = smooth_texture_pair(H, W, (2, 3))
    prev = jax.device_put(np.broadcast_to(f1, (B, H, W)).copy())
    nxt = jax.device_put(np.broadcast_to(f2, (B, H, W)).copy())
    cfg = FarnebackConfig()
    plan = build_plan(H, W, cfg)

    def sync(x):
        return float(jnp.sum(x[:, ::97, ::97, :]))

    results = {"height": H, "width": W, "batch": B}
    ref_out = None
    from optical_flow_tpu.pallas import gauss as ga
    from optical_flow_tpu.pallas import gauss_resize as gr

    for conf in args.configs.split(","):
        # builder/tile[/gaussbuilder][/sN][/u8] — e.g. zdus/32/s3/u8
        parts = conf.split("/")
        builder, tile = parts[0], parts[1]
        pe.PAD_BUILDER = builder
        pe.TILE_H = int(tile)
        pe.N_SLOTS = 2
        for p in parts[2:]:
            if p in ("zdus", "legacy"):
                ga.PAD_BUILDER = gr.PAD_BUILDER = p
            elif p.startswith("s") and p[1:].isdigit():
                pe.N_SLOTS = int(p[1:])
        pe._build.cache_clear()
        input_u8 = "u8" in parts

        @jax.jit
        def fn(p, n):
            fl, _t = flow_mod._flow_pyramid(p.astype(jnp.float32),
                                            n.astype(jnp.float32), plan,
                                            use_pallas=True,
                                            input_u8=input_u8)
            return jnp.moveaxis(fl, 1, -1)

        out = fn(prev, nxt)
        sync(out)
        for _ in range(2):
            sync(fn(prev, nxt))
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            outs = [fn(prev, nxt) for _ in range(5)]
            sync(outs[-1])
            times.append((time.perf_counter() - t0) / 5)
        dt = float(np.median(times))
        key = conf.replace("/", "_t")
        results[key] = {"pairs_per_s": round(B / dt, 1),
                        "ms_per_batch": round(dt * 1000, 1)}
        host = np.asarray(out)
        if ref_out is None:
            ref_out = host
        else:
            results[key]["bitwise_eq"] = bool((host == ref_out).all())
            results[key]["max_abs_diff"] = float(
                np.abs(host - ref_out).max())

    print(json.dumps(results))


if __name__ == "__main__":
    main()
