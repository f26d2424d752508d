from optical_flow_tpu.pallas.update_gather import (
    update_matrices_pallas,
    update_matrices_pallas_batched,
)

__all__ = ["update_matrices_pallas", "update_matrices_pallas_batched"]
