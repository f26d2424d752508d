from optical_flow_tpu.io.video import VideoReader
from optical_flow_tpu.io.jpeg import write_jpeg_bgr
from optical_flow_tpu.io.sidecar import write_mag_to_csv, DoneSentinel

__all__ = ["VideoReader", "write_jpeg_bgr", "write_mag_to_csv", "DoneSentinel"]
