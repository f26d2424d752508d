"""End-to-end wall-clock comparison against the actual reference scripts.

Generates a synthetic corpus, runs the REFERENCE extractor/visualizer
(subprocess, cv2-based) and this framework's CLIs on copies of the same
data, and prints a JSON report.  This fills in the reference's missing
published numbers (SURVEY.md section 6: "measure the cv2/CPU reference on
the BASELINE configs").

Usage:  python benchmarks/measure_reference.py [--height 720 --width 1280]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--frames", type=int, default=120)
    args = ap.parse_args()

    from optical_flow_tpu.oracle.synthetic import write_synthetic_video

    tmp = tempfile.mkdtemp(prefix="ofbench_")
    ref_root = os.path.join(tmp, "ref")
    our_root = os.path.join(tmp, "ours")
    os.makedirs(os.path.join(ref_root, "vid", "media"))
    video = os.path.join(ref_root, "vid", "media", "vid.mp4")
    write_synthetic_video(video, n_frames=args.frames, h=args.height,
                          w=args.width, fps=25.0)
    shutil.copytree(ref_root, our_root)

    report = {"resolution": [args.height, args.width],
              "frames": args.frames}

    t0 = time.time()
    subprocess.run([sys.executable,
                    os.path.join(REFERENCE_DIR, "optical_flow.py"),
                    ref_root, "vid"], check=True, capture_output=True,
                   cwd=REFERENCE_DIR)
    report["reference_extractor_s"] = round(time.time() - t0, 2)

    from optical_flow_tpu.cli.optical_flow import main as our_main
    t0 = time.time()
    our_main([our_root, "vid"])
    report["ours_extractor_s"] = round(time.time() - t0, 2)
    # second run re-uses compiled executables (the steady-state number)
    t0 = time.time()
    our_main([our_root, "vid", "--force_run", "True"])
    report["ours_extractor_warm_s"] = round(time.time() - t0, 2)

    shot = (200, min(4000, int(args.frames / 25 * 1000) - 200))
    t0 = time.time()
    subprocess.run([sys.executable,
                    os.path.join(REFERENCE_DIR, "visualize_optical_flow.py"),
                    video, os.path.join(tmp, "ref_shots"),
                    str(shot[0]), str(shot[1])],
                   check=True, capture_output=True, cwd=REFERENCE_DIR)
    report["reference_visualizer_s"] = round(time.time() - t0, 2)

    from optical_flow_tpu.cli.visualize_optical_flow import main as vis_main
    t0 = time.time()
    vis_main([video, os.path.join(tmp, "our_shots"),
              str(shot[0]), str(shot[1])])
    report["ours_visualizer_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    vis_main([video, os.path.join(tmp, "our_shots2"),
              str(shot[0]), str(shot[1])])
    report["ours_visualizer_warm_s"] = round(time.time() - t0, 2)

    shutil.rmtree(tmp)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
