from optical_flow_tpu.models.farneback import calc_flow, calc_flow_batched

__all__ = ["calc_flow", "calc_flow_batched"]
