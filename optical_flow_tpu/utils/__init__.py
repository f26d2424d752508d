from optical_flow_tpu.utils.config import FarnebackConfig, ExtractorConfig
from optical_flow_tpu.utils.logging import get_logger

__all__ = ["FarnebackConfig", "ExtractorConfig", "get_logger"]
