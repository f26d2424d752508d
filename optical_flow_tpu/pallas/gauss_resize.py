"""Fused Gaussian smooth + bilinear 2^k downsample Pallas kernel.

cv2's pyramid builds level k by smoothing the FULL-RESOLUTION frame with a
level-dependent Gaussian and bilinearly resizing by scale = pyr_scale^k
(SURVEY.md 2d item 1).  Done separately (pallas/gauss.py + ops/resize.py)
that costs a full-resolution two-pass blur PLUS a resize per level — the
blurred values are only ever read at the sampled positions.

For the production parameterization pyr_scale = 0.5 and dimensions where
level_dim * 2^k == full_dim exactly, the bilinear sample positions are
  in = s*out + s/2 - 1 + fy,   fy = 0.5 exactly (half-pixel convention),
so blur+lerp collapses into ONE even-length separable filter applied at
stride s:
  t[j] = 0.5*(g[j] + g[j-1]),  j = 0..2r+1   (g = Gaussian taps).

Layout trick: the s-strided vertical reads become CONTIGUOUS by
restriding the input to phase-major (B, s, H/s, W) once in XLA (a cheap
HBM copy); the kernel then runs the vertical pass over per-phase plane
windows (one small DMA per phase, double-buffered) and the horizontal
pass densely; the s-strided column select is an XLA slice on the
(s-fold row-reduced) output.  Equivalent to resize_bilinear(gauss(x)) up
to f32 reassociation — differential-tested in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 16

# Input builder: "zdus" = zero-pad + thin flipped-DUS reflect bands
# (bitwise-identical, avoids the slow mode='reflect' lowering);
# "legacy" = jnp.pad(mode='reflect').  Module-global for A/B harnesses.
PAD_BUILDER = "zdus"        # output rows per grid step


def _ceil(a: int, m: int) -> int:
    return ((a + m - 1) // m) * m


def _kernel(ip_hbm, o_ref, win, sem, *, taps, s: int, a0: int,
            win_rows: int, offs, n_bands: int, in_bf16: bool = False):
    """Grid: (batch * n_out_bands,).  ip_hbm is phase-major
    (B, s, Hr, wp); offs[j] = (phase, plane_row_offset - a0) per tap.
    Each step produces TILE_H output rows.  in_bf16: windows arrive as
    bfloat16 (exact for u8-valued frames) and are widened to f32 once
    per plane before the unaligned sublane slicing."""
    gi = pl.program_id(0)
    n_total = pl.num_programs(0)
    nt = len(taps)
    wp = o_ref.shape[2]

    def dma(slot, step, p):
        b = step // n_bands
        i = step % n_bands
        return pltpu.make_async_copy(
            ip_hbm.at[b, p, pl.ds(i * TILE_H + a0, win_rows), :],
            win.at[slot, p], sem.at[slot, p])

    slot = jax.lax.rem(gi, 2)
    nslot = jax.lax.rem(gi + 1, 2)

    @pl.when(gi == 0)
    def _():
        for p in range(s):
            dma(slot, gi, p).start()

    @pl.when(gi + 1 < n_total)
    def _():
        for p in range(s):
            dma(nslot, gi + 1, p).start()

    for p in range(s):
        dma(slot, gi, p).wait()

    # plane slice, widened AFTER the column slice so bf16 windows never
    # materialize full-width f32 temporaries (s full-width widened planes
    # alone are 8 MB at 8K — the round-4 scoped-VMEM OOM)
    def plane_rows(p, off, csl):
        t = win[slot, p, off:off + TILE_H, csl]
        return t.astype(jnp.float32) if in_bf16 else t

    # width-chunked like pallas/gauss.py: bounded unrolled-tap temps
    out_w = wp - nt + 1
    XCHUNK = min(out_w, 1024)
    for x0 in range(0, out_w, XCHUNK):
        cw = min(XCHUNK, out_w - x0)
        csl = slice(x0, x0 + cw + nt - 1)
        # vertical combined filter: tap j reads TILE_H contiguous rows of
        # its phase plane — all slices are (TILE_H, cw + nt - 1)
        v = None
        for j in range(nt):
            p, off = offs[j]
            t = plane_rows(p, off, csl) * jnp.float32(taps[j])
            v = t if v is None else v + t
        # dense horizontal pass; the s-strided column select is an XLA
        # slice on the kernel output
        o = None
        for j in range(nt):
            t = v[:, j:j + cw] * jnp.float32(taps[j])
            o = t if o is None else o + t
        o_ref[0, :, x0:x0 + cw] = o
    o_ref[0, :, out_w:] = jnp.zeros((TILE_H, nt - 1), jnp.float32)


@functools.lru_cache(maxsize=64)
def _build(batch: int, hr: int, wp: int, out_h_p: int,
           taps: tuple, s: int, a0: int, offs: tuple,
           in_bf16: bool = False):
    n_bands = out_h_p // TILE_H
    max_off = max(o for _, o in offs)
    # bf16 VMEM tiles are (16, 128): round the window and keep the DMA
    # row starts (i*16 + a0, a0 forced to a 16-multiple by the wrapper)
    # tile-aligned
    win_rows = _ceil(max_off + TILE_H, 16 if in_bf16 else 8)

    return pl.pallas_call(
        functools.partial(_kernel, taps=taps, s=s, a0=a0,
                          win_rows=win_rows, offs=offs, n_bands=n_bands,
                          in_bf16=in_bf16),
        grid=(batch * n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, TILE_H, wp),
            lambda gi: (gi // n_bands, gi % n_bands, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, out_h_p, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, s, win_rows, wp),
                       jnp.bfloat16 if in_bf16 else jnp.float32),
            pltpu.SemaphoreType.DMA((2, s)),
        ],
    )


# Scoped-VMEM gate for very wide frames.  With the in-kernel compute
# width-chunked (XCHUNK, bounded unrolled-tap temporaries), the scoped
# budget is dominated by the double-buffered window DMA scratch
# (2, s, win_rows, Wp) — width-proportional — plus the output
# double-buffer and ~2.5 MB of chunk temporaries.  The 8K s=8 level fits
# in BOTH staging dtypes (verified compiling + running on v5e, round 4:
# bf16 ~11.5 MB, f32 ~15.5 MB estimated vs the 16 MB limit); beyond-8K
# widths where the estimate overflows fall back to gauss + resize (the
# gauss kernel's window is s-independent, so it keeps fitting).
_VMEM_LIMIT = 15 * 2 ** 20
_CHUNK_TEMPS = int(2.5 * 2 ** 20)


def _vmem_estimate(w: int, s: int, ksize: int, bf16: bool) -> int:
    r = (ksize - 1) // 2
    nt = 2 * r + 2
    pad_edge = r + 1
    wp = _ceil(w + 2 * pad_edge, 128)
    first = s // 2
    a_vals = [(first + j) // s for j in range(nt)]
    a0 = (min(a_vals) // 16) * 16 if bf16 else (min(a_vals) // 8) * 8
    win_rows = _ceil((max(a_vals) - a0) + TILE_H, 16 if bf16 else 8)
    scratch = 2 * s * win_rows * wp * (2 if bf16 else 4)
    out = 2 * TILE_H * wp * 4
    return scratch + out + _CHUNK_TEMPS


def supported(h: int, w: int, out_h: int, out_w: int, s: int,
              ksize: int = 19, bf16: bool = False) -> bool:
    """Fast path applies when the level dims divide the full dims exactly
    by s = 2^k (then the bilinear fractions are exactly 0.5) AND the
    width-proportional window scratch fits the 16 MB scoped-VMEM budget
    (covers up to 8K width at every production level; wider falls back
    to gauss + resize).  ksize/bf16 let the caller pass the actual tap
    count and staging dtype; the defaults are the most conservative
    values the production pyramid uses."""
    return (s >= 2 and h == s * out_h and w == s * out_w
            and min(out_h, out_w) >= 8
            and _vmem_estimate(w, s, ksize, bf16) <= _VMEM_LIMIT)


# Multi-level fusion (round 5): ONE kernel pass reads each full-res band
# window once and emits every downsampled pyramid level, instead of one
# full pad-copy + full window sweep per level.  Toggle for A/B harnesses
# (benchmarks/exp_gauss_multi.py); flow.py consults it.
MULTI = True


def _combined_taps(g: tuple) -> tuple:
    """Blur+half-pixel-lerp collapse: even-length filter of 2r+2 taps."""
    r = (len(g) - 1) // 2
    return tuple(0.5 * (g[j] if j <= 2 * r else 0.0)
                 + 0.5 * (g[j - 1] if j >= 1 else 0.0)
                 for j in range(2 * r + 2))


def _multi_geometry(specs: tuple, bf16: bool):
    """Static geometry shared by multi_supported and the wrapper.

    specs: tuple of (s, gauss_taps_tuple), any order, strides powers of
    two.  Returns (S, P, levels, a0, win_rows) where levels is a tuple of
    (s, r, taps, offs, q_n) and offs[q * nt + t] = (phase, plane_off - a0).
    """
    ss = [s for s, _ in specs]
    S = max(ss)
    rs = [(len(g) - 1) // 2 for _, g in specs]
    P = max(rs) + 1
    align = 16 if bf16 else 8
    levels, all_a = [], []
    for (s, g), r in zip(specs, rs):
        taps = _combined_taps(tuple(float(t) for t in g))
        q_n = S // s
        first = s // 2 - 1 - r + P
        offs = []
        for q in range(q_n):
            for t in range(len(taps)):
                raw = first + s * q + t
                offs.append((raw % S, raw // S))
        all_a += [a for _, a in offs]
        levels.append((s, r, taps, tuple(offs), q_n))
    a0 = (min(all_a) // align) * align
    win_rows = _ceil(max(all_a) - a0 + TILE_H, align)
    levels = tuple((s, r, taps, tuple((p, a - a0) for p, a in offs), q_n)
                   for s, r, taps, offs, q_n in levels)
    return S, P, levels, a0, win_rows


def multi_supported(h: int, w: int, specs: tuple, bf16: bool = False) -> bool:
    """The fused multi-level pass applies when every level divides the
    full dims exactly (all strides divide S = max stride, H % S == 0,
    W % S == 0 — then each level's bilinear fractions are exactly 0.5),
    the coarsest level is non-trivial, and the shared window scratch plus
    the per-level double-buffered output blocks fit scoped VMEM (1080p
    and 4K fit all three production levels; at 8K the caller drops the
    finest level(s) until the estimate passes)."""
    if len(specs) < 2:
        return False
    ss = sorted(s for s, _ in specs)
    S = ss[-1]
    if any(s < 2 or S % s for s in ss) or len(set(ss)) != len(ss):
        return False
    if h % S or w % S or min(h // S, w // S) < 16:
        return False
    S_, P, levels, a0, win_rows = _multi_geometry(specs, bf16)
    if h <= P or w <= P:
        return False
    wp = _ceil(w + 2 * P, 128)
    scratch = 2 * S * win_rows * wp * (2 if bf16 else 4)
    outs = 2 * sum(q_n for *_x, q_n in levels) * TILE_H * wp * 4
    return scratch + outs + _CHUNK_TEMPS <= _VMEM_LIMIT


def _kernel_multi(ip_hbm, *refs, levels, S: int, a0: int, win_rows: int,
                  n_bands: int, in_bf16: bool):
    """Grid: (batch * n_bands,).  ip_hbm is phase-major (B, S, hr, wp);
    each step DMAs S phase windows ONCE and emits one TILE_H-row band of
    EVERY level, row-sub-phase-major: o_refs[j] block (1, q_j, TILE_H,
    wp) where output row (q, z) is level-j row q + q_j * (band * 16 + z).
    The de-interleave (a transpose+reshape) rides the caller's existing
    strided-column-select XLA copy."""
    n_lv = len(levels)
    o_refs = refs[:n_lv]
    win, sem = refs[n_lv], refs[n_lv + 1]
    gi = pl.program_id(0)
    n_total = pl.num_programs(0)
    wp = o_refs[0].shape[3]

    def dma(slot, step, p):
        b = step // n_bands
        i = step % n_bands
        return pltpu.make_async_copy(
            ip_hbm.at[b, p, pl.ds(i * TILE_H + a0, win_rows), :],
            win.at[slot, p], sem.at[slot, p])

    slot = jax.lax.rem(gi, 2)
    nslot = jax.lax.rem(gi + 1, 2)

    @pl.when(gi == 0)
    def _():
        for p in range(S):
            dma(slot, gi, p).start()

    @pl.when(gi + 1 < n_total)
    def _():
        for p in range(S):
            dma(nslot, gi + 1, p).start()

    for p in range(S):
        dma(slot, gi, p).wait()

    def plane_rows(p, off, csl):
        t = win[slot, p, off:off + TILE_H, csl]
        return t.astype(jnp.float32) if in_bf16 else t

    for li, (_s, _r, taps, offs, q_n) in enumerate(levels):
        nt = len(taps)
        out_w = wp - nt + 1
        o_ref = o_refs[li]
        XCHUNK = min(out_w, 1024)
        for q in range(q_n):
            for x0 in range(0, out_w, XCHUNK):
                cw = min(XCHUNK, out_w - x0)
                csl = slice(x0, x0 + cw + nt - 1)
                v = None
                for j in range(nt):
                    p, off = offs[q * nt + j]
                    t = plane_rows(p, off, csl) * jnp.float32(taps[j])
                    v = t if v is None else v + t
                o = None
                for j in range(nt):
                    t = v[:, j:j + cw] * jnp.float32(taps[j])
                    o = t if o is None else o + t
                o_ref[0, q, :, x0:x0 + cw] = o
            o_ref[0, q, :, out_w:] = jnp.zeros((TILE_H, nt - 1), jnp.float32)


@functools.lru_cache(maxsize=64)
def _build_multi(batch: int, hr: int, wp: int, outh_S_p: int, S: int,
                 levels: tuple, a0: int, win_rows: int, in_bf16: bool):
    n_bands = outh_S_p // TILE_H
    out_specs = [
        pl.BlockSpec((1, q_n, TILE_H, wp),
                     lambda gi: (gi // n_bands, 0, gi % n_bands, 0),
                     memory_space=pltpu.VMEM)
        for *_x, q_n in levels]
    out_shapes = [jax.ShapeDtypeStruct((batch, q_n, outh_S_p, wp),
                                       jnp.float32)
                  for *_x, q_n in levels]
    return pl.pallas_call(
        functools.partial(_kernel_multi, levels=levels, S=S, a0=a0,
                          win_rows=win_rows, n_bands=n_bands,
                          in_bf16=in_bf16),
        grid=(batch * n_bands,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((2, S, win_rows, wp),
                       jnp.bfloat16 if in_bf16 else jnp.float32),
            pltpu.SemaphoreType.DMA((2, S)),
        ],
    )


def gaussian_blur_resize_multi(img, specs, exact_u8: bool = False):
    """img (B, H, W) f32; specs a tuple of (s, gauss_taps) per pyramid
    level (any order).  Returns a tuple of (B, H/s, W/s) f32 outputs in
    spec order, each BITWISE identical to
    gaussian_blur_resize_pallas(img, taps, s) — same combined taps, same
    accumulation order, and the shared reflect-101 pad band (width
    P = max r + 1) holds identical values in the region each level reads.

    One full-res pad copy + one phase-major window sweep replaces the
    per-level copies: the full-res input traffic of the whole pyramid
    drops from n_levels passes to one (the round-5 byte cut;
    cf. VERDICT r4 task 1 and ROOFLINE_r04_storeemit.json, where the
    three gauss_resize stages each re-read the full-res frame)."""
    B, H, W = img.shape
    specs = tuple((int(s), tuple(float(t) for t in g)) for s, g in specs)
    use_bf16 = bool(exact_u8)
    S, P, levels, a0, win_rows = _multi_geometry(specs, use_bf16)
    if PAD_BUILDER != "zdus" or not (H > P and W > P):
        # legacy-pad A/B toggle or tiny frames: the multi path only
        # implements the zdus builder (and the VMEM gate assumes its
        # bf16 sizing) — fall back per level, which honors both
        return tuple(gaussian_blur_resize_pallas(img, g, s,
                                                 exact_u8=exact_u8)
                     for s, g in specs)

    outh_S = H // S
    outh_S_p = _ceil(outh_S, TILE_H)
    hr = outh_S_p + a0 + win_rows        # plane rows (generous bound)
    wp = _ceil(W + 2 * P, 128)
    if use_bf16:
        img = img.astype(jnp.bfloat16)
    # zero-pad + thin flipped-DUS reflect-101 bands, width P (identical
    # values to each level's own pad band in the rows/cols it reads)
    ip = jnp.pad(img, [(0, 0), (P, hr * S - H - P), (P, wp - W - P)])
    ip = jax.lax.dynamic_update_slice(
        ip, jnp.flip(ip[:, :, P + 1:2 * P + 1], 2), (0, 0, 0))
    ip = jax.lax.dynamic_update_slice(
        ip, jnp.flip(ip[:, :, P + W - 1 - P:P + W - 1], 2), (0, 0, P + W))
    ip = jax.lax.dynamic_update_slice(
        ip, jnp.flip(ip[:, P + 1:2 * P + 1, :], 1), (0, 0, 0))
    ip = jax.lax.dynamic_update_slice(
        ip, jnp.flip(ip[:, P + H - 1 - P:P + H - 1, :], 1), (0, P + H, 0))
    ip_ph = ip.reshape(B, hr, S, wp).transpose(0, 2, 1, 3)

    outs = _build_multi(B, hr, wp, outh_S_p, S, levels, a0, win_rows,
                        in_bf16=use_bf16)(ip_ph)
    results = []
    for (s, r, taps, offs, q_n), out in zip(levels, outs):
        col0 = s // 2 - 1 - r + P
        outh, outw = H // s, W // s
        if q_n == 1:
            o = out[:, 0]
        else:
            o = out.transpose(0, 2, 1, 3).reshape(B, outh_S_p * q_n, wp)
        results.append(o[:, :outh, col0:col0 + s * outw:s])
    return tuple(results)


def gaussian_blur_resize_pallas(img, kernel_taps, s: int,
                                exact_u8: bool = False):
    """img (B, H, W) f32, Gaussian taps (len 2r+1), integer stride s —
    returns (B, H/s, W/s) f32 == resize_bilinear(gauss_reflect101(img))
    for the exact-division case (up to f32 reassociation).

    exact_u8: caller asserts img holds exact uint8 values; the padded
    phase-major staging array and window DMAs then use bfloat16 (exact
    for integers <= 255; the kernel widens to f32 before any arithmetic,
    so the output is bitwise-identical while the full-res input traffic
    — the dominant cost of the pyramid levels — halves)."""
    B, H, W = img.shape
    out_h, out_w = H // s, W // s
    g = tuple(float(t) for t in kernel_taps)
    r = (len(g) - 1) // 2
    # combined blur+lerp taps (even length 2r+2) — shared with the
    # multi-level kernel: this single definition is the bitwise-identity
    # anchor between the two paths
    taps = _combined_taps(g)
    nt = len(taps)

    # reflect-101 border for the Gaussian reach (like pallas/gauss.py)
    pad_edge = r + 1
    use_bf16 = (bool(exact_u8) and PAD_BUILDER == "zdus"
                and H > pad_edge and W > pad_edge)

    out_h_p = _ceil(out_h, TILE_H)
    # input row of tap j for output row Y: first + s*Y + j, with
    # first = s/2 - 1 - r + pad_edge = s/2 (pad_edge == r + 1)
    first = s // 2
    # phase-major decomposition: first + j = s*a_j + p_j
    offs_raw = [((first + j) % s, (first + j) // s) for j in range(nt)]
    a_min = min(a for _, a in offs_raw)
    a_max = max(a for _, a in offs_raw)
    # DMA row starts are 16*i + a0: bf16 VMEM tiles are (16, 128), so a0
    # must be a 16-multiple there (f32 needs 8)
    a0 = (a_min // 16) * 16 if use_bf16 else (a_min // 8) * 8
    offs = tuple((p, a - a0) for p, a in offs_raw)

    # rows needed in phase-major planes: band i covers plane rows
    # [16*i + a0, 16*i + a0 + win_rows); pad the row count to cover the
    # over-read of the padded band/window grid
    win_rows = _ceil((a_max - a0) + TILE_H, 16 if use_bf16 else 8)
    hr = out_h_p + a0 + win_rows          # plane rows (generous bound)
    wp = _ceil(W + 2 * pad_edge, 128)
    if use_bf16:
        img = img.astype(jnp.bfloat16)
    if PAD_BUILDER == "zdus" and H > pad_edge and W > pad_edge:
        # zero-pad to the final shape + four thin flipped DUS writes for
        # the REFLECT_101 bands (bitwise-identical to the mode='reflect'
        # pad below, which lowers to slow multi-pass copies on this
        # backend; same finding as pallas/polyexp.py).  Columns first,
        # then rows from the column-fixed array.
        p = pad_edge
        ip = jnp.pad(img, [(0, 0), (p, hr * s - H - p), (p, wp - W - p)])
        ip = jax.lax.dynamic_update_slice(
            ip, jnp.flip(ip[:, :, p + 1:2 * p + 1], 2), (0, 0, 0))
        ip = jax.lax.dynamic_update_slice(
            ip, jnp.flip(ip[:, :, p + W - 1 - p:p + W - 1], 2),
            (0, 0, p + W))
        ip = jax.lax.dynamic_update_slice(
            ip, jnp.flip(ip[:, p + 1:2 * p + 1, :], 1), (0, 0, 0))
        ip = jax.lax.dynamic_update_slice(
            ip, jnp.flip(ip[:, p + H - 1 - p:p + H - 1, :], 1),
            (0, p + H, 0))
    else:
        ip = jnp.pad(img, [(0, 0), (pad_edge, pad_edge),
                           (pad_edge, pad_edge)], mode="reflect")
        ip = jnp.pad(ip, [(0, 0), (0, hr * s - ip.shape[1]),
                          (0, wp - ip.shape[2])])
    # phase-major restride: (B, hr*s, wp) -> (B, s, hr, wp); one cheap
    # XLA HBM copy replaces all strided VMEM access in the kernel
    ip_ph = ip.reshape(B, hr, s, wp).transpose(0, 2, 1, 3)

    out = _build(B, hr, wp, out_h_p, taps, s, a0, offs,
                 in_bf16=use_bf16)(ip_ph)
    col0 = s // 2 - 1 - r + pad_edge
    return out[:, :out_h, col0:col0 + s * out_w:s]
