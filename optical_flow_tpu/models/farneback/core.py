"""Pure-JAX building blocks of the Farnebäck dense-flow model.

All functions operate on single images/fields with TPU-friendly layouts
(channels leading, W innermost so rows map onto vector lanes); batch via
jax.vmap.  Stencils are expressed as sums of statically shifted slices,
which XLA fuses into single VPU loops; the box filter uses prefix sums.

These building blocks replicate the OpenCV Farnebäck stages bit-faithfully
in float32 (OpenCV's scalar path accumulates a few stages in float64; its
shipped SIMD path — what actually runs — is float32 like ours).  Stage
semantics were calibrated empirically against cv2; see
tests/test_farneback_parity.py.  Known deviation: cv2 exhibits an
unexplained asymmetry at the bottom/right image border (its output is not
180-degree-rotation-equivariant; ours is) worth <=0.4 px inside a
~winsize-wide trailing band per iteration.  Interior values match to ~1e-6.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from optical_flow_tpu.models.farneback.params import poly_exp_weights

# UpdateMatrices border down-weighting (OpenCV constants): pixels at distance
# d < 5 from any image edge scale by border[d]; factors multiply per edge.
BORDER_WEIGHTS = np.array([0.14, 0.14, 0.4472, 0.4472, 0.4472], dtype=np.float32)
BORDER = 5


def _corr1d(img, taps, axis: int, mode: str = "edge"):
    """Correlation of (..., H, W) with 1-D taps along `axis`, padded border.

    taps: numpy array, length 2n+1, index 0 = offset -n.
    """
    n = (len(taps) - 1) // 2
    if n == 0:
        return img * jnp.float32(taps[0])
    pad = [(0, 0)] * img.ndim
    pad[axis] = (n, n)
    p = jnp.pad(img, pad, mode=mode)
    L = img.shape[axis]
    out = None
    for i, t in enumerate(taps):
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(i, i + L)
        term = jnp.float32(t) * p[tuple(sl)]
        out = term if out is None else out + term
    return out


def gaussian_blur_reflect101(img, kernel: np.ndarray):
    """Separable Gaussian blur with BORDER_REFLECT_101 (cv2 GaussianBlur)."""
    k32 = kernel.astype(np.float32)
    out = _corr1d(img, k32, axis=-2, mode="reflect")
    return _corr1d(out, k32, axis=-1, mode="reflect")


def poly_exp(img, poly_n: int, poly_sigma: float):
    """FarnebackPolyExp: (..., H, W) f32 -> R (..., 5, H, W) f32.

    Channel semantics (calibrated against cv2; 'order B' in the calibration
    notes): 0 = b_y, 1 = b_x, 2 = a_yy, 3 = a_xx, 4 = a_xy.
    Separable weighted-least-squares fit of a quadratic per pixel: two
    correlation passes with (g, x*g, x^2*g) taps, replicate borders, then
    a constant linear combination via the inverse Gram entries.
    """
    g, xg, xxg, ig11, ig03, ig33, ig55 = poly_exp_weights(poly_n, poly_sigma)
    # vertical pass: 3 channels
    row0 = _corr1d(img, g, axis=-2)
    row1 = _corr1d(img, xg, axis=-2)
    row2 = _corr1d(img, xxg, axis=-2)
    # horizontal pass: 6 raw moments
    b1 = _corr1d(row0, g, axis=-1)
    b2 = _corr1d(row0, xg, axis=-1)
    b3 = _corr1d(row1, g, axis=-1)
    b4 = _corr1d(row0, xxg, axis=-1)
    b5 = _corr1d(row2, g, axis=-1)
    b6 = _corr1d(row1, xg, axis=-1)
    return jnp.stack([
        b3 * jnp.float32(ig11),                      # b_y
        b2 * jnp.float32(ig11),                      # b_x
        b1 * jnp.float32(ig03) + b5 * jnp.float32(ig33),   # a_yy
        b1 * jnp.float32(ig03) + b4 * jnp.float32(ig33),   # a_xx
        b6 * jnp.float32(ig55),                      # a_xy
    ], axis=-3)


def border_scale_field(h: int, w: int) -> np.ndarray:
    """Separable per-pixel down-weighting near image borders (f32, host)."""
    wx = np.ones(w, np.float32)
    wy = np.ones(h, np.float32)
    for i in range(min(BORDER, w)):
        wx[i] *= BORDER_WEIGHTS[i]
        wx[w - 1 - i] *= BORDER_WEIGHTS[i]
    for i in range(min(BORDER, h)):
        wy[i] *= BORDER_WEIGHTS[i]
        wy[h - 1 - i] *= BORDER_WEIGHTS[i]
    return wy[:, None] * wx[None, :]


def _border_axis_weights_traced(n: int, out_n: int, off: int):
    """1-D factor of the border field as TRACED ops (iota + a handful of
    scalar-compare selects), replicating border_scale_field's loop
    exactly, including the double-multiply overlap when n < 2*BORDER.
    Positions outside [off, off+n) are 0 (the padded/halo region)."""
    i = jnp.arange(out_n, dtype=jnp.int32) - off
    wvec = jnp.where((i >= 0) & (i < n), 1.0, 0.0).astype(jnp.float32)
    for k in range(min(BORDER, n)):
        bw = jnp.float32(BORDER_WEIGHTS[k])
        wvec = wvec * jnp.where(i == k, bw, 1.0)
        wvec = wvec * jnp.where(i == n - 1 - k, bw, 1.0)
    return wvec


def border_scale_field_traced(h: int, w: int, out_h: int = 0,
                              out_w: int = 0, off_h: int = 0,
                              off_w: int = 0):
    """border_scale_field built INSIDE the trace.

    The host version bakes an (H, W) f32 constant into every jitted
    program that closes over it — 8 MB at 1080p, 132 MB at 8K, which
    bloats executables/the persistent cache and overflows transports
    with bounded program uploads (the axon tunnel 413s on the 8K
    programs).  The separable outer product from two iota-derived
    vectors is O(1) program size and fuses away at runtime.  Optional
    out_*/off_* emit the zero-padded / store-layout-shifted variant
    directly (replaces host-side jnp.pad of the constant)."""
    return (_border_axis_weights_traced(h, out_h or h, off_h)[:, None]
            * _border_axis_weights_traced(w, out_w or w, off_w)[None, :])


def update_matrices(R0, R1, flow):
    """FarnebackUpdateMatrices: R (..., 5, H, W), flow (..., 2, H, W) ->
    M (..., 5, H, W).

    Fetches R1 at flow-displaced, cvRound-ed, clamped integer coordinates;
    out-of-image displacements fall back to R0-only terms; assembles the
    per-pixel normal equations G (2x2, 3 unique) and h (2), down-weighted
    near borders.
    """
    H, W = R0.shape[-2:]
    dx = flow[..., 0, :, :]
    dy = flow[..., 1, :, :]
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    x1 = jnp.round(xs + dx)       # round-half-even == cvRound
    y1 = jnp.round(ys + dy)
    inside = (x1 >= 0) & (x1 <= W - 1) & (y1 >= 0) & (y1 <= H - 1)
    xi = jnp.clip(x1, 0, W - 1).astype(jnp.int32)
    yi = jnp.clip(y1, 0, H - 1).astype(jnp.int32)
    flat = (yi * W + xi).reshape(flow.shape[:-3] + (1, H * W))
    R1r = R1.reshape(R1.shape[:-2] + (H * W,))
    R1d = jnp.take_along_axis(
        R1r, jnp.broadcast_to(flat, R1r.shape[:-1] + (H * W,)), axis=-1
    ).reshape(R1.shape)

    c = lambda a, k: a[..., k, :, :]
    r2 = jnp.where(inside, c(R1d, 0), 0.0)
    r3 = jnp.where(inside, c(R1d, 1), 0.0)
    r4 = jnp.where(inside, (c(R0, 2) + c(R1d, 2)) * 0.5, c(R0, 2))
    r5 = jnp.where(inside, (c(R0, 3) + c(R1d, 3)) * 0.5, c(R0, 3))
    r6 = jnp.where(inside, (c(R0, 4) + c(R1d, 4)) * 0.25, c(R0, 4) * 0.5)

    # residuals (sign convention calibrated against cv2):
    # res = (R0_b - R1_b_displaced)/2 + A*d
    r2 = (c(R0, 0) - r2) * 0.5 + (r4 * dy + r6 * dx)
    r3 = (c(R0, 1) - r3) * 0.5 + (r6 * dy + r5 * dx)

    sc = border_scale_field_traced(H, W)
    r2 = r2 * sc
    r3 = r3 * sc
    r4 = r4 * sc
    r5 = r5 * sc
    r6 = r6 * sc

    return jnp.stack([
        r4 * r4 + r6 * r6,        # G11 (y-y)
        (r4 + r5) * r6,           # G12
        r5 * r5 + r6 * r6,        # G22 (x-x)
        r4 * r2 + r6 * r3,        # h1
        r6 * r2 + r5 * r3,        # h2
    ], axis=-3)


def box_sum_replicate(M, ksize: int):
    """ksize x ksize box *sum* with replicate borders via prefix sums.

    M: (C, H, W).  Equivalent to OpenCV's running-sum blur in
    FarnebackUpdateFlow_Blur (valid for ksize >= 3; ksize == 1 is identity).
    """
    if ksize == 1:
        return M
    m = ksize // 2
    win = 2 * m + 1

    def along(axis, x):
        L = x.shape[axis]
        pad = [(0, 0)] * x.ndim
        pad[axis] = (m, m)
        p = jnp.pad(x, pad, mode="edge")
        cs = jnp.cumsum(p, axis=axis)
        zshape = list(cs.shape)
        zshape[axis] = 1
        cs = jnp.concatenate([jnp.zeros(zshape, cs.dtype), cs], axis=axis)
        hi = jax.lax.slice_in_dim(cs, win, win + L, axis=axis)
        lo = jax.lax.slice_in_dim(cs, 0, L, axis=axis)
        return hi - lo

    return along(-2, along(-1, M))


def gaussian_window_kernel(winsize: int) -> np.ndarray:
    """Separable window for OPTFLOW_FARNEBACK_GAUSSIAN (f32 taps)."""
    m = winsize // 2
    sigma = m * 0.3
    i = np.arange(-m, m + 1, dtype=np.float64)
    k = np.exp(-(i * i) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def solve_flow(Mb, inv_area: float):
    """Per-pixel 2x2 solve: blurred M (..., 5, H, W) -> flow (..., 2, H, W).

    det regularized with +1e-3 exactly like OpenCV.
    """
    s = jnp.float32(inv_area)
    g11 = Mb[..., 0, :, :] * s
    g12 = Mb[..., 1, :, :] * s
    g22 = Mb[..., 2, :, :] * s
    h1 = Mb[..., 3, :, :] * s
    h2 = Mb[..., 4, :, :] * s
    idet = 1.0 / (g11 * g22 - g12 * g12 + jnp.float32(1e-3))
    fx = (g11 * h2 - g12 * h1) * idet
    fy = (g22 * h1 - g12 * h2) * idet
    return jnp.stack([fx, fy], axis=-3)


def update_flow(R0, R1, flow, winsize: int, iterations: int,
                gaussian: bool = False, update_fn=None,
                blur_solve_fn=None, update_fn_stats=None):
    """One pyramid level's iterate loop: M -> blur -> solve (x iterations).

    update_fn overrides the matrix-update implementation (e.g. the Pallas
    displaced-fetch kernel); blur_solve_fn overrides the fused
    blur+solve (e.g. the Pallas kernel).  Defaults are the XLA paths.

    update_fn_stats (mutually exclusive with update_fn) is an update
    implementation returning (M, tiers) — the Pallas kernel's
    observability variant; update_flow then returns (flow, tiers_sum)
    with the per-iteration (2,) int32 tier vectors summed.
    """
    if update_fn is not None and update_fn_stats is not None:
        raise ValueError("pass update_fn or update_fn_stats, not both")
    update_fn = update_fn or update_matrices
    if blur_solve_fn is None:
        if gaussian:
            k = gaussian_window_kernel(winsize)
            blur_solve_fn = lambda M: solve_flow(
                _corr1d(_corr1d(M, k, axis=-1), k, axis=-2), 1.0)
        else:
            blur_solve_fn = lambda M: solve_flow(
                box_sum_replicate(M, winsize), 1.0 / (winsize * winsize))
    # scan, not a Python loop: the body compiles once per level even when
    # an iteration's update/blur step is an expensive-to-compile Pallas
    # kernel (XLA does not CSE identical pallas custom-calls)
    if update_fn_stats is not None:
        def body_s(fl, _):
            M, tiers = update_fn_stats(R0, R1, fl)
            return blur_solve_fn(M), tiers

        flow, tiers = jax.lax.scan(body_s, flow, None, length=iterations)
        return flow, jnp.sum(tiers, axis=0)

    def body(fl, _):
        return blur_solve_fn(update_fn(R0, R1, fl)), None

    flow, _ = jax.lax.scan(body, flow, None, length=iterations)
    return flow
