"""Visualizer CLI — arg-compatible with the reference
(`visualize_optical_flow.py:66-77`):

    python -m optical_flow_tpu.cli.visualize_optical_flow \
        <video_path> <images_path> <shot_begin_ms> <shot_end_ms>

(As in the reference, the first positional is named video_dir but is a
video FILE path.)
"""

from __future__ import annotations

import argparse

from optical_flow_tpu.pipeline.visualizer import visualize_shot
from optical_flow_tpu.utils.config import VisualizerConfig


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        epilog="VFR inputs raise a loud error (OFIO_ALLOW_VFR=1 forces "
               "cv2-4.2-style fps indexing).  OFT_DEBUG_NANS=1 enables "
               "jax.debug_nans.")
    parser.add_argument("video_dir",
                        help="the directory where the video-files are stored")
    parser.add_argument("images_path",
                        help="the directory where the images are saved")
    parser.add_argument("shot_begin", type=int,
                        help="the begin of a shot in milliseconds")
    parser.add_argument("shot_end", type=int,
                        help="the end of a shot in milliseconds")
    parser.add_argument("--validate", action="store_true",
                        help="compute one sampled frame pair with cv2 "
                             "(when importable) and log mean EPE vs the "
                             "0.5-px gate")
    return parser


def main(argv=None) -> None:
    from optical_flow_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    from optical_flow_tpu.utils.validate import maybe_enable_debug_nans
    maybe_enable_debug_nans()
    args = build_parser().parse_args(argv)
    visualize_shot(args.video_dir, args.images_path, args.shot_begin,
                   args.shot_end,
                   config=VisualizerConfig(validate=args.validate))


if __name__ == "__main__":
    main()
