"""Run logging (replaces ``src/utils/logger_setup.py`` + per-run basicConfig,
ref ``model_regression.py:240-259``)."""

from __future__ import annotations

import logging
import sys


def setup_logger(name: str = "relaxtpu", log_file: str | None = None, level=logging.INFO):
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        sh = logging.StreamHandler(sys.stderr)
        sh.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(logging.Formatter("%(levelname)s - %(message)s"))
        logger.addHandler(fh)
    return logger
