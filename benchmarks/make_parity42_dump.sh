#!/usr/bin/env bash
# One-command pinned-4.2 parity closure (VERDICT r4 task 4).
#
# Run anywhere with docker + network access:
#
#     bash benchmarks/make_parity42_dump.sh
#
# 1. builds the reference's pinned environment (python:3.8 +
#    opencv-python==4.2.0.32 + numpy==1.18.5, Dockerfile.parity42),
# 2. runs the DUMP half of parity42_harness.py inside it, writing
#    benchmarks/parity42.npz (deterministic probe outputs of every
#    cv2 op this framework replicates, incl. full Farneback flow and
#    the pyramid level-clip equality matrix),
# 3. immediately verifies the dump with the CHECK half in the host
#    environment (prints the per-op OK/MISMATCH table).
#
# Check the resulting benchmarks/parity42.npz in: the test suite
# (tests/test_parity42_dump.py) auto-discovers it and turns the per-op
# table of docs/PARITY_42.md into hard assertions from then on.
set -euo pipefail
cd "$(dirname "$0")/.."
docker build -f Dockerfile.parity42 -t oft-parity42 .
docker run --rm -v "$PWD/benchmarks:/out" oft-parity42
echo "dump written: benchmarks/parity42.npz"
python benchmarks/parity42_harness.py --check
