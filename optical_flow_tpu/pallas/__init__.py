from optical_flow_tpu.pallas.update_gather import (
    update_matrices_pallas,
    update_matrices_pallas_batched,
)
from optical_flow_tpu.pallas.blur_solve import update_flow_blur_solve_pallas
from optical_flow_tpu.pallas.polyexp import poly_exp_pallas
from optical_flow_tpu.pallas.gauss import gaussian_blur_pallas

__all__ = [
    "update_matrices_pallas",
    "update_matrices_pallas_batched",
    "update_flow_blur_solve_pallas",
    "poly_exp_pallas",
    "gaussian_blur_pallas",
]
