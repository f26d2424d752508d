"""Cold-start budget: fresh-machine time-to-first-frame (VERDICT r4 #5).

Three scenarios, each in its OWN subprocess with its own persistent-cache
directory (OFT_COMPILE_CACHE), timing the production 1080p B=16 batched
flow program from process start to the first completed batch:

  cold    — empty cache: full XLA+Mosaic compile (the fresh-cluster
            worst case; round 4 measured ~96 s compile+first inside a
            warm process, this adds import+backend time on top);
  warm    — this machine's existing cache: the once-per-machine steady
            state every later process on the host gets;
  packed  — empty cache + `utils.warmup --unpack` of a pack made from
            the warm cache: what a FRESH host in a homogeneous fleet
            gets when the deployment ships a warmup pack
            (python -m optical_flow_tpu.utils.warmup --pack).

Prints one JSON object; BASELINE.md carries the table.

Usage: python benchmarks/exp_cold_start.py [--skip-cold]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

CHILD = r"""
import os, sys, time
t0 = time.perf_counter()
sys.path.insert(0, %(root)r)
import numpy as np
from optical_flow_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from optical_flow_tpu.models.farneback import calc_flow_batched
from optical_flow_tpu.utils.config import FarnebackConfig
from optical_flow_tpu.oracle import smooth_texture_pair
t_import = time.perf_counter() - t0
f1, f2 = smooth_texture_pair(1080, 1920, (2, 3))
prev = jax.device_put(np.broadcast_to(f1, (16, 1080, 1920)).copy())
nxt = jax.device_put(np.broadcast_to(f2, (16, 1080, 1920)).copy())
t_dev = time.perf_counter() - t0
out = calc_flow_batched(prev, nxt, FarnebackConfig())
float(jnp.sum(out[:, ::97, ::97]))
t_first = time.perf_counter() - t0
print('RESULT %%.2f %%.2f %%.2f' %% (t_import, t_dev, t_first))
""" % {"root": ROOT}


def run_child(cache_dir, label):
    env = dict(os.environ)
    env["OFT_COMPILE_CACHE"] = cache_dir
    t0 = time.perf_counter()
    res = subprocess.run([sys.executable, "-c", CHILD], env=env,
                         capture_output=True, text=True, timeout=1200)
    wall = time.perf_counter() - t0
    line = [ln for ln in res.stdout.splitlines()
            if ln.startswith("RESULT")]
    if res.returncode != 0 or not line:
        return {"error": (res.stderr or res.stdout)[-500:],
                "wall_s": round(wall, 1)}
    imp, dev, first = (float(v) for v in line[0].split()[1:])
    return {"import_s": round(imp, 1),
            "backend_plus_put_s": round(dev, 1),
            "first_batch_s": round(first, 1),
            "wall_s": round(wall, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-cold", action="store_true")
    args = ap.parse_args()

    from optical_flow_tpu.utils.compile_cache import enable_persistent_cache
    warm_dir = enable_persistent_cache()
    if warm_dir is None:
        raise RuntimeError("persistent compile cache disabled "
                           "(OFT_COMPILE_CACHE=0); this benchmark "
                           "measures cache scenarios and needs it")
    out = {}

    # warm: the machine's own populated cache
    out["warm"] = run_child(warm_dir, "warm")

    # packed: fresh dir + unpack of a pack built from the warm cache
    with tempfile.TemporaryDirectory() as td:
        pack = os.path.join(td, "warm.tgz")
        env = dict(os.environ)
        env["OFT_COMPILE_CACHE"] = warm_dir
        subprocess.run([sys.executable, "-m",
                        "optical_flow_tpu.utils.warmup", "--pack", pack],
                       env=env, check=True, capture_output=True,
                       cwd=ROOT, timeout=300)
        fresh = os.path.join(td, "fresh_packed")
        env["OFT_COMPILE_CACHE"] = fresh
        subprocess.run([sys.executable, "-m",
                        "optical_flow_tpu.utils.warmup", "--unpack", pack],
                       env=env, check=True, capture_output=True,
                       cwd=ROOT, timeout=300)
        out["packed"] = run_child(fresh, "packed")
        out["pack_MB"] = round(os.path.getsize(pack) / 1e6, 1)

        # cold: brand-new empty cache dir (full Mosaic compile)
        if not args.skip_cold:
            cold = os.path.join(td, "fresh_cold")
            os.makedirs(cold)
            out["cold"] = run_child(cold, "cold")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
