"""Dict-of-entries JSON logger (reference utils/logger.py:6-14)."""

from __future__ import annotations

import json
import logging


def setup_logging(level=logging.INFO) -> logging.Logger:
    """Configure the 'segtpu' logger explicitly. ``logging.basicConfig`` is
    NOT enough here: jax/absl attach a root handler at import time, which
    turns basicConfig into a no-op and silently drops INFO logs."""
    logger = logging.getLogger("segtpu")
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s: %(message)s"))
        logger.addHandler(handler)
    logger.setLevel(level)
    logger.propagate = False
    return logger


setup_logging()


class Logger:
    def __init__(self):
        self.entries = {}

    def add_entry(self, entry):
        self.entries[len(self.entries) + 1] = entry

    def __str__(self):
        return json.dumps(self.entries, sort_keys=True, indent=4, default=str)
