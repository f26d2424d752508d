"""Pinned-toolchain parity harness (SURVEY.md section 2d item 1).

Every parity claim in docs/PARITY.md was calibrated against the locally
installed cv2 (5.0.0), but the reference pins opencv-python==4.2.0.32 on
python 3.8 (/root/reference/requirements_optical_flow.txt:3,
/root/reference/Dockerfile_optical_flow:2).  This harness closes the gap
in two halves:

  DUMP  — run INSIDE the reference's own environment (the only part that
          needs it; python3.8 + numpy + cv2 only, no JAX):

            docker build -f Dockerfile_optical_flow -t ref .   # reference env
            docker run -v $PWD:/w -w /w --entrypoint python3 ref \
                benchmarks/parity42_harness.py --dump parity42.npz

          Writes deterministic probe inputs' cv2 outputs: gray
          coefficients, u8 resize, HSV2BGR, cartToPolar, NORM_MINMAX,
          JPEG bytes, the Farnebäck pyramid level-clip equality matrix,
          and full flow fields.

  CHECK — run in the build environment:

            python benchmarks/parity42_harness.py --check parity42.npz

          Compares THIS implementation against the dump and prints a
          per-op verdict table (paste into docs/PARITY_42.md).

The sandbox this framework is developed in has no network and no docker,
so the dump cannot be produced here — docs/PARITY_42.md records the
source-level analysis and the one switchable difference (OFT_CV42_GRAY)
until someone runs the dump in the pinned env.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

FB = (0.5, 3, 15, 3, 5, 1.2, 0)   # frozen reference params


def probe_inputs():
    """Deterministic probes (RandomState is bit-stable across numpy
    versions, including the pinned 1.18.5)."""
    r = np.random.RandomState(0)
    probes = {}
    # BGR triples: all values where the 14-bit and 15-bit gray formulas
    # disagree (precomputed cheaply) + a dense random sample
    bgr = r.randint(0, 256, size=(512, 512, 3)).astype(np.uint8)
    probes["bgr"] = bgr
    # boundary sweep: g fixed, b/r full range on a coarse grid
    bb, gg, rr = np.meshgrid(np.arange(256), np.arange(0, 256, 8),
                             np.arange(256), indexing="ij")
    probes["bgr_grid"] = np.stack(
        [bb, gg, rr], axis=-1).reshape(-1, 1, 3).astype(np.uint8)
    probes["resize_src"] = r.randint(0, 256, (719, 1277, 3)).astype(np.uint8)
    hsv = r.randint(0, 256, size=(512, 512, 3)).astype(np.uint8)
    probes["hsv"] = hsv
    probes["xy"] = r.randn(2, 256, 256).astype(np.float32) * 3.0
    probes["mag"] = np.abs(r.randn(128, 128).astype(np.float32)) * 7.0
    # flow pair: smooth translating texture (what the parity suite uses)
    yy, xx = np.mgrid[0:280, 0:504].astype(np.float32)
    def tex(dx, dy):
        v = (np.sin((xx + dx) * 0.11) * np.cos((yy + dy) * 0.07)
             + 0.5 * np.sin((xx + dx) * 0.031 + (yy + dy) * 0.023))
        return ((v - v.min()) / (np.ptp(v) + 1e-9) * 255).astype(np.uint8)
    probes["f1"], probes["f2"] = tex(0, 0), tex(2.0, 3.0)
    return probes


def dump(path):
    import cv2
    p = probe_inputs()
    out = {"cv2_version": np.bytes_(cv2.__version__.encode())}
    out["gray"] = cv2.cvtColor(p["bgr"], cv2.COLOR_BGR2GRAY)
    out["gray_grid"] = cv2.cvtColor(p["bgr_grid"], cv2.COLOR_BGR2GRAY)
    out["resize_129"] = cv2.resize(p["resize_src"], (129, 72))
    out["resize_640"] = cv2.resize(p["resize_src"], (640, 360))
    out["hsv2bgr"] = cv2.cvtColor(p["hsv"], cv2.COLOR_HSV2BGR)
    mag, ang = cv2.cartToPolar(p["xy"][0], p["xy"][1])
    out["polar_mag"], out["polar_ang"] = mag, ang
    out["minmax"] = cv2.normalize(p["mag"], None, 0, 255, cv2.NORM_MINMAX)
    ok, jpg = cv2.imencode(".jpeg", p["resize_src"])
    assert ok
    out["jpeg_default"] = jpg
    ok, jpg95 = cv2.imencode(".jpeg", p["resize_src"],
                             [cv2.IMWRITE_JPEG_QUALITY, 95])
    assert ok
    out["jpeg_q95"] = jpg95
    # level-clip probe: for square sizes around the suspected thresholds,
    # record whether levels=k and levels=k+1 produce bitwise-equal flow
    # (equal <=> level k+1 was clipped) — this pins the effective rule
    sizes = [32, 48, 63, 64, 65, 96, 126, 127, 128, 129, 192, 256]
    eq = np.zeros((len(sizes), 5), dtype=np.uint8)
    for i, s in enumerate(sizes):
        a = cv2.resize(p["f1"], (s, s))
        b = cv2.resize(p["f2"], (s, s))
        flows = [cv2.calcOpticalFlowFarneback(
            a, b, None, FB[0], lv, *FB[2:]) for lv in range(1, 7)]
        for k in range(5):
            eq[i, k] = int(np.array_equal(flows[k], flows[k + 1]))
    out["levelclip_sizes"] = np.array(sizes)
    out["levelclip_eq"] = eq
    out["flow"] = cv2.calcOpticalFlowFarneback(p["f1"], p["f2"], None, *FB)
    # pyr_scale honored? (cv2 5.0 ignores it — PARITY.md)
    out["flow_ps25"] = cv2.calcOpticalFlowFarneback(
        p["f1"], p["f2"], None, 0.25, *FB[1:])
    np.savez_compressed(path, **out)
    print("dumped %d arrays to %s (cv2 %s)" % (len(out), path,
                                               cv2.__version__))


# default dump location: checked-in next to this file when someone with
# docker runs benchmarks/make_parity42_dump.sh (see Dockerfile.parity42)
DEFAULT_DUMP = __file__.rsplit("/", 1)[0] + "/parity42.npz"


def check_rows(path):
    """Compare this implementation against a dump; returns (oracle cv2
    version string, [(op name, ok 0/1), ...]).  tests/test_parity42_dump.py
    asserts these rows whenever a dump file is checked in."""
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))           # repo root, any cwd
    # honor JAX_PLATFORMS=cpu before the first device op (the TPU-tunnel
    # sitecustomize overrides the env var at interpreter startup)
    from optical_flow_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    d = np.load(path)
    p = probe_inputs()
    ver = bytes(d["cv2_version"]).decode()
    is42 = ver.startswith("4.2")
    if is42:
        os.environ["OFT_CV42_GRAY"] = "1"
    rows = []

    from optical_flow_tpu.ops.host import bgr2gray_host, resize_u8_host
    rows.append(("BGR2GRAY random", int(np.array_equal(
        bgr2gray_host(p["bgr"]), d["gray"]))))
    rows.append(("BGR2GRAY grid", int(np.array_equal(
        bgr2gray_host(p["bgr_grid"]), d["gray_grid"]))))
    rows.append(("resize u8 129", int(np.array_equal(
        resize_u8_host(p["resize_src"], 129, 72), d["resize_129"]))))
    rows.append(("resize u8 640", int(np.array_equal(
        resize_u8_host(p["resize_src"], 640, 360), d["resize_640"]))))

    import jax.numpy as jnp
    from optical_flow_tpu.ops.color import hsv2bgr_u8
    ours_hsv = np.asarray(hsv2bgr_u8(jnp.asarray(p["hsv"])))
    hd = np.abs(ours_hsv.astype(int) - d["hsv2bgr"].astype(int))
    # byte-exact up to the documented +-1 truncation-boundary flips where
    # the backend emits no FMA for v*(1-s*h) (ops/color.py _fma; ~3e-5 of
    # pixels on CPU-XLA, zero where an FMA is emitted)
    rows.append(("HSV2BGR (+-1 on <1e-4 px)", int(
        hd.max() <= 1 and (hd > 0).mean() < 1e-4)))

    from optical_flow_tpu.ops.polar import (cart_to_polar,
                                            normalize_minmax_u8_value)
    m, a = cart_to_polar(jnp.asarray(p["xy"][0]), jnp.asarray(p["xy"][1]))
    rows.append(("cartToPolar mag<=1e-5", int(np.allclose(
        np.asarray(m), d["polar_mag"], atol=1e-5))))
    rows.append(("cartToPolar ang<=1e-5", int(np.allclose(
        np.asarray(a), d["polar_ang"], atol=1e-5))))
    nm = np.asarray(normalize_minmax_u8_value(jnp.asarray(p["mag"])))
    rows.append(("NORM_MINMAX<=1e-4", int(np.allclose(
        nm, d["minmax"], atol=1e-4))))

    import tempfile
    from optical_flow_tpu.io.jpeg import write_jpeg_bgr
    rows.append(("JPEG default==q95", int(np.array_equal(
        d["jpeg_default"], d["jpeg_q95"]))))
    with tempfile.NamedTemporaryFile(suffix=".jpeg") as tf:
        write_jpeg_bgr(tf.name, p["resize_src"], 95)
        ours_jpg = open(tf.name, "rb").read()
    rows.append(("JPEG bytes", int(ours_jpg == d["jpeg_q95"].tobytes())))

    from optical_flow_tpu.models.farneback import calc_flow_batched
    from optical_flow_tpu.utils.config import FarnebackConfig
    ours = np.asarray(calc_flow_batched(p["f1"][None], p["f2"][None],
                                        FarnebackConfig())[0])
    epe = float(np.sqrt(((ours - d["flow"]) ** 2).sum(-1)).mean())
    rows.append(("Farneback EPE<=0.5 (%.4f)" % epe, int(epe <= 0.5)))
    rows.append(("pyr_scale honored by oracle", int(
        not np.allclose(d["flow"], d["flow_ps25"], atol=1e-3))))

    # level-clip rule: our build_plan's per-size level count vs the
    # oracle's bitwise-equality matrix (eq[i,k]==1 <=> level k+1 clipped)
    from optical_flow_tpu.models.farneback.params import build_plan
    ok_clip = True
    for i, s in enumerate(d["levelclip_sizes"]):
        for k in range(1, 6):
            ours_n = len(build_plan(int(s), int(s),
                                    FarnebackConfig(levels=k)).levels)
            more = len(build_plan(int(s), int(s),
                                  FarnebackConfig(levels=k + 1)).levels)
            oracle_same = bool(d["levelclip_eq"][i, k - 1])
            if (ours_n == more) != oracle_same:
                ok_clip = False
                print("  level-clip mismatch at size %d levels %d->%d: "
                      "ours %d/%d, oracle same=%s"
                      % (s, k, k + 1, ours_n, more, oracle_same))
    rows.append(("level-clip rule", int(ok_clip)))
    return ver, rows


def check(path):
    import os
    if not os.path.exists(path):
        print("no dump at %s — produce one with\n"
              "  bash benchmarks/make_parity42_dump.sh\n"
              "(needs docker + network; see Dockerfile.parity42)" % path)
        return 2
    ver, rows = check_rows(path)
    print("oracle cv2:", ver,
          "(pinned)" if ver.startswith("4.2") else "(NOT the pinned 4.2!)")
    w = max(len(r[0]) for r in rows)
    for name, ok in rows:
        print("%-*s  %s" % (w, name, "OK" if ok else "MISMATCH"))
    return 0 if all(ok for _, ok in rows) else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--dump")
    g.add_argument("--check", nargs="?", const=DEFAULT_DUMP,
                   help="dump file (default: benchmarks/parity42.npz)")
    args = ap.parse_args()
    if args.dump:
        dump(args.dump)
    else:
        sys.exit(check(args.check))
