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


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("video_dir",
                        help="the directory where the video-files are stored")
    parser.add_argument("images_path",
                        help="the directory where the images are saved")
    parser.add_argument("shot_begin", type=int,
                        help="the begin of a shot in milliseconds")
    parser.add_argument("shot_end", type=int,
                        help="the end of a shot in milliseconds")
    return parser


def main(argv=None) -> None:
    from optical_flow_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    args = build_parser().parse_args(argv)
    visualize_shot(args.video_dir, args.images_path, args.shot_begin,
                   args.shot_end)


if __name__ == "__main__":
    main()
