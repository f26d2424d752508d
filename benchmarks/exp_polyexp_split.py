"""Locate where the polyexp kernel's time goes on the real chip.

The ig-folding experiment proved polyexp is NOT accumulation-op bound
(~15% fewer vector ops moved the needle +1%), so the cost is data
movement: the window DMA, the 2n+1 unaligned SUBLANE slices of the
vertical pass, the 2n+1 unaligned LANE slices per accumulator of the
horizontal pass, or the 5-channel store.  This harness times stripped
kernel variants IN ISOLATION (not the full pipeline):

  dma_only    window DMA + trivial store (1 copy slice)
  vertical    DMA + vertical moment pass, store the 3 moment rows
  full        the production kernel (vertical + horizontal + store)

The deltas attribute the per-band cost.  Honest-sync methodology
(scalar host read; several in-flight dispatches per sync).

Usage: python benchmarks/exp_polyexp_split.py [--height 1080 --width 1920
       --batch 16]   — prints one JSON object.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optical_flow_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

TILE_H = 16  # overridden by --tile_h (also monkeypatched into production)


def _variant_kernel(ip_hbm, r_ref, win, sem, *, n, pad, wp, out_w,
                    n_bands, g, xg, xxg, stage):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gi = pl.program_id(0)
    n_total = pl.num_programs(0)
    rows = 2 * pad + TILE_H

    def dma(slot, step):
        b = step // n_bands
        i = step % n_bands
        return pltpu.make_async_copy(
            ip_hbm.at[b, pl.ds(i * TILE_H, rows), :], win.at[slot],
            sem.at[slot])

    slot = jax.lax.rem(gi, 2)
    nslot = jax.lax.rem(gi + 1, 2)

    @pl.when(gi == 0)
    def _():
        dma(slot, gi).start()

    @pl.when(gi + 1 < n_total)
    def _():
        dma(nslot, gi + 1).start()

    dma(slot, gi).wait()
    w = win[slot]
    if stage == "dma_bf16":
        # window arrives as bf16; converting once in VMEM isolates the
        # read-byte volume (store volume identical to dma_only)
        t = w[pad:pad + TILE_H, :out_w].astype(jnp.float32)
        for c in range(3):
            r_ref[0, c] = t
        return

    if stage == "dma_only":
        t = w[pad:pad + TILE_H, :out_w]
        for c in range(3):
            r_ref[0, c] = t
        return

    row0 = row1 = row2 = None
    for j in range(2 * n + 1):
        t = w[pad - n + j: pad - n + j + TILE_H, :]
        a0 = t * jnp.float32(g[j])
        a1 = t * jnp.float32(xg[j])
        a2 = t * jnp.float32(xxg[j])
        row0 = a0 if row0 is None else row0 + a0
        row1 = a1 if row1 is None else row1 + a1
        row2 = a2 if row2 is None else row2 + a2

    if stage == "vertical":
        r_ref[0, 0] = row0[:, :out_w]
        r_ref[0, 1] = row1[:, :out_w]
        r_ref[0, 2] = row2[:, :out_w]
        return

    # stage == "horizontal3": the production horizontal structure but with
    # 3 accumulators (so the delta vs `vertical` isolates the lane-slice
    # machinery at same store volume; the production kernel's 5-acc cost
    # is 5/3 of the accumulate portion of this delta)
    XCHUNK = min(out_w, 1024)
    for x0 in range(0, out_w, XCHUNK):
        cw = min(XCHUNK, out_w - x0)
        b1 = b2 = b3 = None
        for k in range(2 * n + 1):
            sl = slice(pad - n + k + x0, pad - n + k + x0 + cw)
            t0 = row0[:, sl]
            t1 = row1[:, sl]
            t2 = row2[:, sl]
            u1 = t0 * jnp.float32(g[k])
            u2 = t0 * jnp.float32(xg[k])
            u3 = t1 * jnp.float32(g[k])
            b1 = u1 if b1 is None else b1 + u1
            b2 = u2 if b2 is None else b2 + u2
            b3 = u3 if b3 is None else b3 + u3
        osl = slice(x0, x0 + cw)
        r_ref[0, 0, :, osl] = b1
        r_ref[0, 1, :, osl] = b2
        r_ref[0, 2, :, osl] = b3


@functools.lru_cache(maxsize=16)
def _build_variant(batch, h, w, poly_n, poly_sigma, stage):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from optical_flow_tpu.models.farneback.params import poly_exp_weights

    g, xg, xxg, *_ = poly_exp_weights(poly_n, poly_sigma)
    pad = ((max(poly_n, 1) + 7) // 8) * 8
    hp = ((h + TILE_H - 1) // TILE_H) * TILE_H
    wp = ((w + 2 * pad + 127) // 128) * 128
    out_w = wp - 2 * pad
    rows = 2 * pad + TILE_H
    n_bands = hp // TILE_H

    def omap(gi):
        return (gi // n_bands, 0, gi % n_bands, 0)

    kernel = pl.pallas_call(
        functools.partial(_variant_kernel, n=poly_n, pad=pad, wp=wp,
                          out_w=out_w, n_bands=n_bands,
                          g=tuple(float(x) for x in g),
                          xg=tuple(float(x) for x in xg),
                          xxg=tuple(float(x) for x in xxg), stage=stage),
        grid=(batch * n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 3, TILE_H, out_w), omap,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, 3, hp, out_w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rows, wp),
                       jnp.bfloat16 if stage == "dma_bf16" else jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return kernel, pad, hp, wp


def main():
    global TILE_H
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--tile_h", type=int, default=16,
                    help="band height for the variants AND the production "
                         "kernel (monkeypatched)")
    ap.add_argument("--stages", default="dma_only,vertical,horizontal3",
                    help="comma list; subset of "
                         "dma_only,vertical,horizontal3,pad_only")
    args = ap.parse_args()
    TILE_H = args.tile_h

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, H, W = args.batch, args.height, args.width
    img = rng.uniform(0, 255, (B, H, W)).astype(np.float32)

    results = {"height": H, "width": W, "batch": B, "tile_h": TILE_H}

    if "zpad_only" in args.stages or "zpad_dus" in args.stages:
        # calibration: a single constant-mode XLA Pad op (the cleanest
        # possible device copy) vs the edge-mode pad, and the zero-pad +
        # thin-DUS builder that reproduces the edge pad bitwise
        pad = ((5 + 7) // 8) * 8
        hp = ((H + TILE_H - 1) // TILE_H) * TILE_H
        wp = ((W + 2 * pad + 127) // 128) * 128

        @jax.jit
        def zpadf(x):
            return jnp.pad(x, [(0, 0), (pad, hp - H + pad),
                               (pad, wp - W - pad)])

        @jax.jit
        def zpad_dusf(x):
            ip = jnp.pad(x, [(0, 0), (pad, hp - H + pad),
                             (pad, wp - W - pad)])
            # replicate 8-wide edge bands via broadcast + in-place DUS
            top = jnp.broadcast_to(ip[:, pad:pad + 1, :], (B, pad, wp))
            bot = jnp.broadcast_to(ip[:, pad + H - 1:pad + H, :],
                                   (B, pad, wp))
            ip = jax.lax.dynamic_update_slice(ip, top, (0, 0, 0))
            ip = jax.lax.dynamic_update_slice(ip, bot, (0, pad + H, 0))
            left = jnp.broadcast_to(ip[:, :, pad:pad + 1],
                                    (B, hp + 2 * pad, pad))
            right = jnp.broadcast_to(ip[:, :, pad + W - 1:pad + W],
                                     (B, hp + 2 * pad, wp - W - pad))
            ip = jax.lax.dynamic_update_slice(ip, left, (0, 0, 0))
            ip = jax.lax.dynamic_update_slice(ip, right, (0, 0, pad + W))
            return ip

        @jax.jit
        def epadf(x):
            ip = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad)], mode="edge")
            return jnp.pad(ip, [(0, 0), (0, hp - H),
                                (0, wp - (W + 2 * pad))])

        x = jax.device_put(img)

        def syncp(o):
            return float(jnp.sum(o[:, ::97, ::97]))

        # NOTE: zpad_dus replicates columns across the FULL padded width
        # (incl. the zero alignment tail) while the edge pad leaves the
        # tail zero; the kernel never reads the tail, but compare only the
        # region it does read
        a = np.asarray(epadf(x))
        bq = np.asarray(zpad_dusf(x))
        eq = bool((a[:, :pad + H + pad, :W + 2 * pad]
                   == bq[:, :pad + H + pad, :W + 2 * pad]).all())
        results["zpad_dus_bitwise_eq"] = eq

        for name, fn in (("zpad_only", zpadf), ("zpad_dus", zpad_dusf)):
            if name not in args.stages:
                continue
            syncp(fn(x))
            for _ in range(2):
                syncp(fn(x))
            times = []
            for _ in range(6):
                t0 = time.perf_counter()
                outs = [fn(x) for _ in range(5)]
                syncp(outs[-1])
                times.append((time.perf_counter() - t0) / 5)
            results[name + "_ms"] = round(float(np.median(times)) * 1000, 2)

    if "pad_only" in args.stages:
        # cost of the XLA replicate+alignment pad copy alone (the wrapper
        # runs this before every kernel call on the pre=None path)
        pad = ((5 + 7) // 8) * 8
        hp = ((H + TILE_H - 1) // TILE_H) * TILE_H
        wp = ((W + 2 * pad + 127) // 128) * 128

        @jax.jit
        def padf(x):
            ip = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad)], mode="edge")
            return jnp.pad(ip, [(0, 0), (0, hp - H),
                                (0, wp - (W + 2 * pad))])

        x = jax.device_put(img)

        def syncp(o):
            return float(jnp.sum(o[:, ::97, ::97]))

        syncp(padf(x))
        for _ in range(2):
            syncp(padf(x))
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            outs = [padf(x) for _ in range(5)]
            syncp(outs[-1])
            times.append((time.perf_counter() - t0) / 5)
        results["pad_only_ms"] = round(float(np.median(times)) * 1000, 2)

    def run_variant(stage):
        kernel, pad, hp, wp = _build_variant(B, H, W, 5, 1.2, stage)

        @jax.jit
        def f(x):
            if stage == "dma_bf16":
                # convert BEFORE the pad so XLA fuses convert+pad into one
                # pass (the pad copy itself also halves)
                x = x.astype(jnp.bfloat16)
            ip = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad)], mode="edge")
            ip = jnp.pad(ip, [(0, 0), (0, hp - H), (0, wp - (W + 2 * pad))])
            return kernel(ip)

        x = jax.device_put(img)

        def sync(o):
            return float(jnp.sum(o[:, :, ::97, ::97]))

        sync(f(x))
        for _ in range(2):
            sync(f(x))
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            outs = [f(x) for _ in range(5)]
            sync(outs[-1])
            times.append((time.perf_counter() - t0) / 5)
        return float(np.median(times))

    prev = None
    for stage in ("dma_only", "dma_bf16", "vertical", "horizontal3"):
        if stage not in args.stages:
            continue
        dt = run_variant(stage)
        results[stage + "_ms"] = round(dt * 1000, 2)
        if prev is not None:
            results[stage + "_delta_ms"] = round((dt - prev) * 1000, 2)
        prev = dt

    # production kernel for the absolute anchor (5 accumulators + fused
    # ig), with TILE_H monkeypatched to --tile_h; both the plain path and
    # the L0 pre-smooth fused path (what the pipeline dispatches at L0)
    from optical_flow_tpu.pallas import polyexp as pe
    from optical_flow_tpu.models.farneback.params import gaussian_kernel

    pe.TILE_H = TILE_H

    x = jax.device_put(img)

    def sync5(o):
        return float(jnp.sum(o[:, :, ::97, ::97]))

    def time_prod(fn, key):
        f = jax.jit(fn)
        sync5(f(x))
        for _ in range(2):
            sync5(f(x))
        times = []
        for _ in range(6):
            t0 = time.perf_counter()
            outs = [f(x) for _ in range(5)]
            sync5(outs[-1])
            times.append((time.perf_counter() - t0) / 5)
        results[key] = round(float(np.median(times)) * 1000, 2)

    time_prod(lambda v: pe.poly_exp_pallas(v, 5, 1.2), "production_ms")

    if "zpad_dus" in args.stages:
        # production kernel fed by the zero-pad + thin-DUS edge builder
        # (bitwise-equal input over the read region -> bitwise-equal R)
        kernel, pad, hp, wp = pe._build(B, H, W, 5, 1.2, fused_ig=True,
                                        pre=None)

        def prod_zdus(v):
            ip = jnp.pad(v, [(0, 0), (pad, hp - H + pad),
                             (pad, wp - W - pad)])
            top = jnp.broadcast_to(ip[:, pad:pad + 1, :], (B, pad, wp))
            bot = jnp.broadcast_to(ip[:, pad + H - 1:pad + H, :],
                                   (B, pad, wp))
            ip = jax.lax.dynamic_update_slice(ip, top, (0, 0, 0))
            ip = jax.lax.dynamic_update_slice(ip, bot, (0, pad + H, 0))
            left = jnp.broadcast_to(ip[:, :, pad:pad + 1],
                                    (B, hp + 2 * pad, pad))
            right = jnp.broadcast_to(ip[:, :, pad + W - 1:pad + W],
                                     (B, hp + 2 * pad, wp - W - pad))
            ip = jax.lax.dynamic_update_slice(ip, left, (0, 0, 0))
            ip = jax.lax.dynamic_update_slice(ip, right, (0, 0, pad + W))
            return kernel(ip)[:, :, :H, :W]

        time_prod(prod_zdus, "production_zdus_ms")
        ref = np.asarray(jax.jit(
            lambda v: pe.poly_exp_pallas(v, 5, 1.2))(x))
        got = np.asarray(jax.jit(prod_zdus)(x))
        results["production_zdus_bitwise_eq"] = bool((ref == got).all())
    # the level-0 fused pre-smooth path (3-tap sigma-0 kernel, what
    # flow.py dispatches at full resolution)
    taps = tuple(float(t) for t in gaussian_kernel(3, 0.0))
    time_prod(lambda v: pe.poly_exp_pallas(v, 5, 1.2, pre_taps=taps),
              "production_pre_ms")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
