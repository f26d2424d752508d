"""cv2-backed oracle — used ONLY by tests and benchmarks.

Nothing in the production compute path may import from this package; it
exists so parity tests can compare every op against the OpenCV behavior the
reference relies on (`optical_flow.py`, `visualize_optical_flow.py`).
"""

from optical_flow_tpu.oracle.synthetic import (
    smooth_texture_pair,
    motion_boundary_pair,
    quadratic_pair,
    vertical_jump_pair,
    write_synthetic_video,
)

__all__ = [
    "smooth_texture_pair",
    "motion_boundary_pair",
    "quadratic_pair",
    "vertical_jump_pair",
    "write_synthetic_video",
]
