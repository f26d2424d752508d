"""Logger surface matching the reference's setup (`optical_flow.py:15-22`):
INFO level, '%(asctime)s - %(name)s - %(levelname)s - %(message)s' format on a
StreamHandler, propagate=False so messages don't appear twice.
"""

from __future__ import annotations

import logging

_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger
