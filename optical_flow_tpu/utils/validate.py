"""Validation mode — the `--validate` path of both CLIs.

SURVEY.md section 5 names two validation facilities the build owes:
sampled EPE-vs-cv2 in the metrics/observability row, and the
`jax.debug_nans` sanitizer in the race-detection row.  Both live here:

  * `sampled_epe(prev, next, cfg)` — mean endpoint error of our flow vs
    `cv2.calcOpticalFlowFarneback` on one gray frame pair; returns None
    (logged) when cv2 is not importable, so production hosts without
    OpenCV still run.
  * `log_validation(...)` — logs the EPE and WARNs above the 0.5-px
    north-star gate (BASELINE.json accuracy target).
  * `maybe_enable_debug_nans()` — turns on `jax.debug_nans` when
    OFT_DEBUG_NANS=1 (tests set it; `--validate` CLIs call this).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from optical_flow_tpu.utils.config import FarnebackConfig
from optical_flow_tpu.utils.logging import get_logger

logger = get_logger("optical_flow_tpu.validate")

# north-star accuracy gate (BASELINE.json: mean EPE vs cv2 <= 0.5 px)
EPE_GATE = 0.5


def maybe_enable_debug_nans() -> bool:
    """Enable jax.debug_nans when OFT_DEBUG_NANS=1.  Returns the state."""
    if os.environ.get("OFT_DEBUG_NANS") == "1":
        import jax
        jax.config.update("jax_debug_nans", True)
        logger.info("jax_debug_nans enabled (OFT_DEBUG_NANS=1)")
        return True
    return False


def sampled_epe(prev_gray: np.ndarray, next_gray: np.ndarray,
                cfg: Optional[FarnebackConfig] = None) -> Optional[float]:
    """Mean endpoint error of our flow vs cv2 on ONE uint8 gray pair.

    The cv2 oracle is optional at runtime: returns None (with a log line)
    when OpenCV is not importable, keeping `--validate` safe on
    production hosts that ship without it.
    """
    try:
        import cv2
    except ImportError:
        logger.info("validate: cv2 not importable; skipping sampled EPE")
        return None
    cfg = cfg or FarnebackConfig()
    prev = np.asarray(prev_gray, dtype=np.uint8)
    nxt = np.asarray(next_gray, dtype=np.uint8)
    ref = cv2.calcOpticalFlowFarneback(
        prev, nxt, None, cfg.pyr_scale, cfg.levels, cfg.winsize,
        cfg.iterations, cfg.poly_n, cfg.poly_sigma, cfg.flags)
    from optical_flow_tpu.models.farneback import calc_flow_batched
    ours = np.asarray(calc_flow_batched(prev[None], nxt[None], cfg)[0])
    return float(np.sqrt(((ours - ref) ** 2).sum(-1)).mean())


def log_validation(epe: Optional[float], context: str) -> None:
    if epe is None:
        return
    if epe > EPE_GATE:
        logger.warning(
            "validate[%s]: sampled mean EPE vs cv2 = %.4f px EXCEEDS the "
            "%.1f px gate", context, epe, EPE_GATE)
    else:
        logger.info("validate[%s]: sampled mean EPE vs cv2 = %.4f px "
                    "(gate %.1f px)", context, epe, EPE_GATE)
