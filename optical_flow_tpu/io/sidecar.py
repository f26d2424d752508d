"""CSV output and .done sentinel files (the reference's persistence layer).

Formats are byte-compatible with the reference:
  * CSV: one line, `<start_ms>\\t<end_ms>\\t<m1 m2 m3 ...>`
    (`optical_flow.py:128-132`);
  * .done: newline-joined `VERSION, frame_width, step_size, window_size,
    top_percentile` (`optical_flow.py:152`), written after success
    (`:163-165`), checked before work with string equality and a
    `force_run == 'True'` string override (`:154`).
"""

from __future__ import annotations

import os


def write_mag_to_csv(f_path: str, mag, segment_timestamps) -> None:
    with open(f_path, "w", newline="") as f:
        mags = " ".join(str(m) for m in mag)
        line = (str(segment_timestamps[0]) + "\t" + str(segment_timestamps[1])
                + "\t" + mags)
        f.write(line)


class DoneSentinel:
    """Per-video idempotency marker — the reference's checkpoint/resume
    mechanism (SURVEY.md section 5, Checkpoint/resume)."""

    def __init__(self, features_dir: str, done_version: str):
        self.path = os.path.join(features_dir, ".done")
        self.version = done_version

    def is_done(self) -> bool:
        if not os.path.isfile(self.path):
            return False
        with open(self.path, "r") as f:
            return f.read() == self.version

    def mark_done(self) -> None:
        with open(self.path, "w") as f:
            f.write(self.version)
