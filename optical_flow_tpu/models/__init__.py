from optical_flow_tpu.models.farneback import (
    calc_flow,
    calc_flow_batched,
    calc_flow_bgr_batched,
    calc_flow_chain_batched,
    calc_flow_bgr_chain_batched,
)

__all__ = [
    "calc_flow",
    "calc_flow_batched",
    "calc_flow_bgr_batched",
    "calc_flow_chain_batched",
    "calc_flow_bgr_chain_batched",
]
