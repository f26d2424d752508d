"""Headline benchmark: frame-pairs/sec at 1080p Farnebäck on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N}

vs_baseline is measured against single-threaded OpenCV on this host's CPU
(the reference's execution model, SURVEY.md section 6; the reference repo
publishes no numbers).  The cv2 baseline is measured once and cached in
BASELINE_MEASURED.json.  Also records mean EPE vs cv2 on the same pair as
an accuracy guard (north star: <= 0.5 px).
"""

import json
import os
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(HERE, "BASELINE_MEASURED.json")

B = 16             # pairs per dispatch
H, W = 1080, 1920
WARMUP = 2
ITERS = 10


def measure_cv2_baseline(f1, f2):
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            d = json.load(f)
        if d.get("shape") == [H, W]:
            return d
    import cv2
    cv2.setNumThreads(1)
    cv2.calcOpticalFlowFarneback(f1, f2, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    n = 3
    t0 = time.time()
    for _ in range(n):
        ref = cv2.calcOpticalFlowFarneback(f1, f2, None, 0.5, 3, 15, 3, 5,
                                           1.2, 0)
    dt = (time.time() - t0) / n
    cv2.setNumThreads(0)
    d = {"shape": [H, W], "cv2_single_thread_pairs_per_s": 1.0 / dt,
         "cv2_ms_per_pair": dt * 1000.0}
    with open(CACHE, "w") as f:
        json.dump(d, f, indent=1)
    return d


def main():
    from optical_flow_tpu.models.farneback import calc_flow_batched
    from optical_flow_tpu.oracle import smooth_texture_pair
    from optical_flow_tpu.utils.config import FarnebackConfig

    f1, f2 = smooth_texture_pair(H, W, (2, 3))
    base = measure_cv2_baseline(f1, f2)

    import jax
    import jax.numpy as jnp
    prev = np.broadcast_to(f1, (B, H, W)).copy()
    nxt = np.broadcast_to(f2, (B, H, W)).copy()
    prev_d = jax.device_put(prev)
    nxt_d = jax.device_put(nxt)
    cfg = FarnebackConfig()

    # On this TPU transport block_until_ready can return before execution
    # finishes; force completion with a scalar host read (checksum).  The
    # production pipelines keep batches in flight (async dispatch), so
    # throughput is measured over PIPELINE consecutive batches with one
    # sync — the same amortization the extractor gets.
    def sync(x):
        float(jnp.sum(x[:, ::97, ::97]))

    out = calc_flow_batched(prev_d, nxt_d, cfg)
    sync(out)
    for _ in range(WARMUP):
        sync(calc_flow_batched(prev_d, nxt_d, cfg))
    PIPELINE = 5
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        outs = [calc_flow_batched(prev_d, nxt_d, cfg)
                for _ in range(PIPELINE)]
        out = outs[-1]
        sync(out)
        times.append((time.perf_counter() - t0) / PIPELINE)
    dt = float(np.median(times))
    pairs_per_s = B / dt

    # accuracy guard vs cv2 on the same pair
    import cv2
    ref = cv2.calcOpticalFlowFarneback(f1, f2, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    ours = np.asarray(out[0])
    epe = float(np.sqrt(((ours - ref) ** 2).sum(-1)).mean())

    result = {
        "metric": "frame-pairs/sec at 1080p Farneback (batched, 1 chip)",
        "value": round(pairs_per_s, 1),
        "unit": "pairs/s",
        "vs_baseline": round(
            pairs_per_s / base["cv2_single_thread_pairs_per_s"], 1),
        "extra": {
            "batch": B,
            "ms_per_batch": round(dt * 1000.0, 2),
            "mean_epe_vs_cv2": round(epe, 4),
            "cv2_single_thread_pairs_per_s": round(
                base["cv2_single_thread_pairs_per_s"], 3),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
