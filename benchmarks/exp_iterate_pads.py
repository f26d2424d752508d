"""Measure the in-program cost of the fused iterate loop's layout pads.

update_flow_fused pads R0/R1/flow into the shared store layout once per
level (~1.6 GB of constant-pad copies at 1080p B=16 L0) and slices the
flow back out at the end.  If XLA copies run at the ~33 GB/s the
standalone pad calibration suggested, those copies cost tens of ms and
dwarf the per-iteration kernels; if they fuse/run near HBM speed they are
noise.  Micro-timings carry a per-program floor on this transport, so
every number here is a whole-program timing in ONE process and only the
DELTAS are meaningful:

  full        pads + scan(iters) + slice   (production path)
  prepad      scan(iters) only, on pre-padded store-layout inputs
  pads_only   just the three pads (+ trivial slice to force them)

full - prepad ~= in-program cost of pads + final slice.

Usage: python benchmarks/exp_iterate_pads.py [--batch 16 --iters 3]
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
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from optical_flow_tpu.models.farneback.core import (
        border_scale_field_traced, poly_exp)
    from optical_flow_tpu.pallas.blur_solve import blur_solve_store
    from optical_flow_tpu.pallas.fused_iterate import update_flow_fused
    from optical_flow_tpu.pallas.update_gather import (
        COL_OFF, ROW_OFF, update_matrices_store)

    B, h, w, iters = args.batch, args.height, args.width, args.iters
    _ceil = lambda a, m: ((a + m - 1) // m) * m  # noqa: E731
    Hs = _ceil(h, 16) + 32
    Ws = _ceil(w + 2 * COL_OFF, 128)

    rng = np.random.default_rng(0)
    img0 = rng.uniform(0, 255, (B, h, w)).astype(np.float32)
    img1 = rng.uniform(0, 255, (B, h, w)).astype(np.float32)

    # realistic R fields (polyexp of noise) and a smooth flow seed
    R0 = jax.jit(lambda x: poly_exp(x, 5, 1.2))(jax.device_put(img0))
    R1 = jax.jit(lambda x: poly_exp(x, 5, 1.2))(jax.device_put(img1))
    yy = np.broadcast_to(np.linspace(0, 2, h, dtype=np.float32)[:, None],
                         (h, w))
    flow = jax.device_put(np.broadcast_to(
        np.stack([yy, np.full_like(yy, 0.5)])[None], (B, 2, h, w)).copy())

    pad = [(0, 0), (0, 0), (ROW_OFF, Hs - ROW_OFF - h),
           (COL_OFF, Ws - COL_OFF - w)]

    def sync(x):
        return float(jnp.sum(x[..., ::97, ::97]))

    def timeit(f, *xs):
        sync(f(*xs)[0] if isinstance(f(*xs), tuple) else f(*xs))
        for _ in range(2):
            o = f(*xs)
            sync(o[0] if isinstance(o, tuple) else o)
        times = []
        for _ in range(8):
            t0 = time.perf_counter()
            outs = [f(*xs) for _ in range(5)]
            o = outs[-1]
            sync(o[0] if isinstance(o, tuple) else o)
            times.append((time.perf_counter() - t0) / 5)
        return round(float(np.median(times)) * 1000, 2)

    results = {"height": h, "width": w, "batch": B, "iters": iters}

    # production: pads + scan + slice
    full = jax.jit(lambda a, b, f: update_flow_fused(a, b, f, 15, iters)[0])
    results["full_ms"] = timeit(full, R0, R1, flow)

    # pre-padded store-layout inputs -> scan only
    R0p = jax.jit(lambda a: jnp.pad(a, pad))(R0)
    R1p = jax.jit(lambda a: jnp.pad(a, pad))(R1)
    flowp = jax.jit(lambda a: jnp.pad(a, pad))(flow)
    scp = jax.jit(lambda: border_scale_field_traced(
        h, w, Hs, Ws, ROW_OFF, COL_OFF))()

    @jax.jit
    def prepad(r0p, r1p, fp, sc):
        def body(fl, _):
            Mst, tiers = update_matrices_store(r0p, r1p, fl, sc, h, w)
            return blur_solve_store(Mst, 15), tiers
        out, _ = jax.lax.scan(body, fp, None, length=iters)
        return out

    results["prepad_ms"] = timeit(prepad, R0p, R1p, flowp, scp)

    @jax.jit
    def pads_only(a, b, f):
        # optimization_barrier forces the pads to materialize like they
        # must before a pallas custom call (slicing alone would let XLA
        # dead-code them)
        pa = jax.lax.optimization_barrier(jnp.pad(a, pad))
        pb = jax.lax.optimization_barrier(jnp.pad(b, pad))
        pf = jax.lax.optimization_barrier(jnp.pad(f, pad))
        return (pa[:, :1, ::97, ::97] + pb[:, :1, ::97, ::97]
                + pf[:, :1, ::97, ::97])

    results["pads_only_ms"] = timeit(pads_only, R0, R1, flow)

    results["pad_slice_cost_ms"] = round(
        results["full_ms"] - results["prepad_ms"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
