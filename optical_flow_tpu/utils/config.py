"""Configuration dataclasses.

The reference hides its configuration in argparse defaults and module
constants (reference `optical_flow.py:171-185`, `visualize_optical_flow.py:6`,
and the frozen Farnebäck parameters at `optical_flow.py:53-59`).  Here the
same knobs live in two frozen dataclasses so that every layer shares one
source of truth while the CLIs stay flag-compatible with the reference.
"""

from __future__ import annotations

import dataclasses

# Flag bits, mirroring cv2's public constants so configs translate 1:1.
OPTFLOW_USE_INITIAL_FLOW = 4
OPTFLOW_FARNEBACK_GAUSSIAN = 256


@dataclasses.dataclass(frozen=True)
class FarnebackConfig:
    """Parameters of the Farnebäck dense-flow algorithm.

    Defaults are the values frozen at both reference call sites
    (`optical_flow.py:53-59`, `visualize_optical_flow.py:40-46`).
    """

    pyr_scale: float = 0.5
    levels: int = 3
    winsize: int = 15
    iterations: int = 3
    poly_n: int = 5
    poly_sigma: float = 1.2
    flags: int = 0

    @property
    def use_initial_flow(self) -> bool:
        return bool(self.flags & OPTFLOW_USE_INITIAL_FLOW)

    @property
    def gaussian_window(self) -> bool:
        return bool(self.flags & OPTFLOW_FARNEBACK_GAUSSIAN)

    def validate(self) -> "FarnebackConfig":
        if not (0.0 < self.pyr_scale < 1.0):
            raise ValueError(f"pyr_scale must be in (0, 1), got {self.pyr_scale}")
        if self.levels < 1:
            raise ValueError(f"levels must be >= 1, got {self.levels}")
        if self.winsize < 1:
            raise ValueError(f"winsize must be >= 1, got {self.winsize}")
        if self.iterations < 1:
            raise ValueError(f"iterations must be >= 1, got {self.iterations}")
        if self.poly_n < 1:
            raise ValueError(f"poly_n must be >= 1, got {self.poly_n}")
        return self


# Version stamp for .done sentinels.  Intentionally identical to the
# reference's (`optical_flow.py:12`) so .done files are mutually accepted —
# a corpus half-processed by the reference resumes under this implementation
# (and vice versa) without rework; format matches `optical_flow.py:152`.
EXTRACTOR = "opticalflow"
VERSION = "20201209"


@dataclasses.dataclass(frozen=True)
class ExtractorConfig:
    """Corpus-extractor parameters (reference `optical_flow.py:171-185`).

    `force_run` is a *string* compared against 'True', reproducing the
    reference's CLI contract (`optical_flow.py:154,182`).
    """

    frame_width: int = 129
    step_size: int = 300          # milliseconds
    window_size: int = 300        # milliseconds
    top_percentile: int = 5
    force_run: str = "False"
    # --validate: per-video sampled EPE-vs-cv2 logging (utils/validate.py);
    # additive, absent from the reference CLI (SURVEY.md section 5)
    validate: bool = False
    # --resume: shot-granular intra-video checkpointing (a killed run
    # redoes only the tail; io/sidecar.py:ShotProgress).  Additive; the
    # reference's .done is all-or-nothing (`optical_flow.py:149-168`).
    resume: bool = False
    farneback: FarnebackConfig = dataclasses.field(default_factory=FarnebackConfig)

    @property
    def done_version(self) -> str:
        """Content of the .done sentinel (`optical_flow.py:152`)."""
        return (
            VERSION
            + "\n" + str(self.frame_width)
            + "\n" + str(self.step_size)
            + "\n" + str(self.window_size)
            + "\n" + str(self.top_percentile)
        )


@dataclasses.dataclass(frozen=True)
class VisualizerConfig:
    """Shot-visualizer parameters (reference `visualize_optical_flow.py:6`)."""

    step_size: int = 300          # milliseconds, module constant STEP_SIZE
    jpeg_quality: int = 95        # cv2.imwrite default (verified empirically)
    validate: bool = False        # sampled EPE-vs-cv2 (utils/validate.py)
    farneback: FarnebackConfig = dataclasses.field(default_factory=FarnebackConfig)
