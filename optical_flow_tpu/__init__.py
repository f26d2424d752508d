"""optical_flow_tpu — a TPU-native optical-flow feature-extraction framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
JacobLoe/optical_flow (reference: /root/reference/optical_flow.py,
/root/reference/visualize_optical_flow.py):

  * a corpus-scale motion-magnitude extractor (video -> per-segment CSV of
    scaled flow magnitudes), reference `optical_flow.py:135-168`, and
  * a shot-window flow visualizer (video + [begin_ms, end_ms] ->
    source_<ms>.jpeg / flow_<ms>.jpeg pairs), reference
    `visualize_optical_flow.py:9-63`.

Architecture (TPU-first, not a port):
  * `models/farneback`  — dense Farnebäck optical flow as pure JAX/Pallas
    (the reference outsources this to OpenCV C++,
    `optical_flow.py:51-59`).  Batched via vmap, sharded via jax.sharding.
  * `ops/`      — deterministic image ops (BGR->gray, bilinear resize,
    cartToPolar, min-max normalize, HSV->BGR) replicating OpenCV's exact
    integer/rounding semantics.
  * `io/`       — native C++ video decode (libavformat/libavcodec) and JPEG
    encode (libjpeg) with CAP_PROP_POS_FRAMES-compatible seek semantics;
    the host-side runtime around the TPU compute path.
  * `pipeline/` — shot windowing, frame-pair batching, double-buffered
    host->device staging, extractor/visualizer pipelines.
  * `parallel/` — device meshes, corpus sharding (shard_map/pjit).
  * `cli/`      — argparse-compatible entry points mirroring the reference.
  * `oracle/`   — cv2 wrappers used ONLY by tests/benchmarks.
"""

__version__ = "0.1.0"

from optical_flow_tpu.utils.config import FarnebackConfig, ExtractorConfig

__all__ = [
    "FarnebackConfig",
    "ExtractorConfig",
    "__version__",
]
