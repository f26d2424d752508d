from optical_flow_tpu.models.farneback.flow import (
    calc_flow,
    calc_flow_batched,
    calc_flow_bgr_batched,
    calc_flow_chain_batched,
    calc_flow_bgr_chain_batched,
)
from optical_flow_tpu.models.farneback.params import (
    FarnebackPlan,
    build_plan,
    effective_levels,
    poly_exp_weights,
)

__all__ = [
    "calc_flow",
    "calc_flow_batched",
    "calc_flow_bgr_batched",
    "calc_flow_chain_batched",
    "calc_flow_bgr_chain_batched",
    "FarnebackPlan",
    "build_plan",
    "effective_levels",
    "poly_exp_weights",
]
