"""Measure the spatial-sharding (sp/halo) tax where ONE chip allows.

VERDICT r4 weak #3 / task 3: the sp path (parallel/halo.py) is
correctness-tested on the virtual CPU mesh but has zero performance
data — a v5e-8 deployment would fly blind.  Real multi-chip hardware is
not available here, so this measures the three components a prediction
needs, on the one real chip:

  1. per-shard Pallas kernel wall-clock at SHARD shapes: each L0 stage
     kernel run at the halo-extended local block a v5e-8 sp=8 shard
     processes (e.g. 8K -> 540-row shards + 2r halo rows).  On a real
     pod the 8 shards run concurrently, so the predicted sp stage time
     IS the shard-kernel time (plus exchange);
  2. the same kernels at the FULL frame (the single-chip path) — the
     ratio 8 x shard / full is the compute tax of halo overfetch and
     smaller launches;
  3. halo-exchange byte volume, analytic from the stage geometry
     (2 boundary transfers of r rows x W cols x C channels x 4 B per
     shard per stage), converted to time at v5e's ~45 GB/s one-direction
     ICI per neighbor link (jax-ml.github.io/scaling-book's v5e figure;
     the exchange is nearest-neighbor ppermute so each link carries one
     shard's halo).

Excluded (stated, not hidden): the seam-correction XLA epilogue of the
sp update (a gather/scatter over <= VIOL_MAX pixels + a border-ramp
multiply — bounded and usually branch-skipped on smooth content), and
any multi-host dispatch skew.  The prediction is therefore a lower
bound with a documented gap; docs/ARCHITECTURE.md carries the table.

Stage set: the L0 (full-resolution) pyramid stages, which dominate the
pipeline (the coarser sp levels are ~4x/16x/64x smaller; levels whose
height doesn't divide n_sp fall back to GSPMD global ops —
parallel/halo.py:_plan).

Usage: python benchmarks/exp_sp_tax.py [--config 8k|4k|both]
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

ICI_GBPS = 45.0          # v5e one-direction per-link (scaling-book)
N_SP = 8                 # the BASELINE config-5 target: v5e-8, sp=8


def timed(fn, args, n_inflight=4, trials=3):
    """Median seconds per dispatch, honest scalar-host-read sync (the
    tunneled transport does not block on block_until_ready)."""
    import jax
    import jax.numpy as jnp

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        float(jnp.sum(leaves[0][(slice(None),) * (leaves[0].ndim - 2)
                                + (slice(None, None, 97),) * 2]
                      .astype(jnp.float32)))

    out = fn(*args)
    sync(out)
    out_bytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(out))
    n_inflight = max(2, min(n_inflight, int(2.5e9 // max(out_bytes, 1))))
    del out
    for _ in range(2):
        sync(fn(*args))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n_inflight)]
        sync(outs[-1])
        ts.append((time.perf_counter() - t0) / n_inflight)
        del outs
    return float(sorted(ts)[trials // 2])


def measure_config(H, W):
    import jax
    import jax.numpy as jnp
    from optical_flow_tpu.models.farneback.params import gaussian_kernel
    from optical_flow_tpu.pallas.blur_solve import (
        update_flow_blur_solve_pallas)
    from optical_flow_tpu.pallas.gauss import gaussian_blur_pallas
    from optical_flow_tpu.pallas.polyexp import poly_exp_pallas
    from optical_flow_tpu.pallas.update_gather import (
        WIN_H, supported_shape, update_matrices_pallas_batched_stats)

    rng = np.random.default_rng(0)
    hl = H // N_SP
    cfgrows = {}
    winsize, poly_n = 15, 5
    taps = tuple(gaussian_kernel(3, 0.5))    # L0 pre-smooth ksize (sigma>0
    # only matters for tap values; L0 uses ksize 3 — plan smooth_sigma 0)

    def put(shape, dtype=np.float32, scale=1.0):
        return jax.device_put(
            (rng.standard_normal(shape) * scale).astype(dtype))

    stages = []

    # -- gauss (r = 1): per-shard ext block vs full frame ----------------
    r = 1
    full = put((2, H, W))
    shard = put((2, hl + 2 * r, W))
    t_full = timed(jax.jit(lambda x: gaussian_blur_pallas(x, taps)), (full,))
    t_shard = timed(jax.jit(lambda x: gaussian_blur_pallas(x, taps)),
                    (shard,))
    # a (2, H, W) dispatch already holds BOTH frames of the pair (the
    # pipeline batches both = concat(prev, nxt)), so one call per pair
    stages.append(("gauss_L0", t_full, t_shard, r, 1 * 4, 1))
    del full, shard

    # -- polyexp (r = poly_n): 2 frames per pair -------------------------
    r = poly_n
    full = put((2, H, W))
    shard = put((2, hl + 2 * r, W))
    t_full = timed(jax.jit(lambda x: poly_exp_pallas(x, poly_n, 1.2)),
                   (full,))
    t_shard = timed(jax.jit(lambda x: poly_exp_pallas(x, poly_n, 1.2)),
                    (shard,))
    # (2, H, W) = both frames of the pair in one dispatch, like gauss
    stages.append(("polyexp_L0", t_full, t_shard, r, 1 * 4, 1))
    del full, shard

    # -- displaced-fetch update (r = WIN_H), x3 iterations ---------------
    r = WIN_H
    assert supported_shape(hl + 2 * r, W, chunked=True)
    R0f, R1f = put((1, 5, H, W)), put((1, 5, H, W))
    flf = put((1, 2, H, W), scale=0.5)
    t_full = timed(jax.jit(
        lambda a, b, c: update_matrices_pallas_batched_stats(a, b, c)[0]),
        (R0f, R1f, flf))
    del R0f, R1f, flf
    R0s, R1s = put((1, 5, hl + 2 * r, W)), put((1, 5, hl + 2 * r, W))
    fls = put((1, 2, hl + 2 * r, W), scale=0.5)
    t_shard = timed(jax.jit(
        lambda a, b, c: update_matrices_pallas_batched_stats(a, b, c)[0]),
        (R0s, R1s, fls))
    del R0s, R1s, fls
    # halo channels: R0 (5) + R1 (5) + flow (2), each f32
    stages.append(("update_L0", t_full, t_shard, r, 12 * 4, 3))

    # -- fused window blur + solve (r = winsize//2), x3 iterations -------
    r = winsize // 2
    Mf = put((1, 5, H, W))
    t_full = timed(jax.jit(
        lambda m: update_flow_blur_solve_pallas(m, winsize)), (Mf,))
    del Mf
    Ms = put((1, 5, hl + 2 * r, W))
    t_shard = timed(jax.jit(
        lambda m: update_flow_blur_solve_pallas(m, winsize)), (Ms,))
    del Ms
    stages.append(("blur_solve_L0", t_full, t_shard, r, 5 * 4, 3))

    rows = []
    tot_full = tot_shard = tot_exch = 0.0
    for name, t_full, t_shard, r, ch_bytes, per_pair in stages:
        halo_bytes = 2 * r * W * ch_bytes            # per shard per call
        t_exch = halo_bytes / (ICI_GBPS * 1e9)
        tax = N_SP * t_shard / t_full
        rows.append({
            "stage": name,
            "full_ms": round(t_full * 1e3, 2),
            "shard_ms": round(t_shard * 1e3, 2),
            "calls_per_pair": per_pair,
            "halo_MB_per_shard_call": round(halo_bytes / 1e6, 3),
            "exchange_ms_at_45GBps": round(t_exch * 1e3, 3),
            "sp_compute_tax_8x_shard_over_full": round(tax, 2),
        })
        tot_full += per_pair * t_full
        tot_shard += per_pair * (t_shard + t_exch)
        tot_exch += per_pair * t_exch
    cfgrows["stages"] = rows
    cfgrows["L0_per_pair_single_chip_ms"] = round(tot_full * 1e3, 1)
    cfgrows["L0_per_pair_sp8_predicted_ms"] = round(tot_shard * 1e3, 1)
    cfgrows["L0_exchange_total_ms"] = round(tot_exch * 1e3, 3)
    cfgrows["sp8_L0_speedup_vs_single_chip"] = round(
        tot_full / tot_shard, 2)
    return cfgrows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=["8k", "4k", "both"],
                    default="both")
    args = ap.parse_args()
    shapes = {"8k": (4320, 7680), "4k": (2160, 3840)}
    todo = ["8k", "4k"] if args.config == "both" else [args.config]
    out = {"n_sp": N_SP, "ici_GBps_assumed": ICI_GBPS,
           "excluded": "sp-update seam-correction XLA epilogue; "
                       "multi-host dispatch skew"}
    for k in todo:
        H, W = shapes[k]
        out[k] = measure_config(H, W)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
