"""Logging with elapsed-time formatting (utils/logging.py:29-58 analog)."""

from __future__ import annotations

import logging
import time

_START = time.monotonic()


class ElapsedFormatter(logging.Formatter):
    def format(self, record):
        elapsed = time.monotonic() - _START
        record.elapsed = f"{elapsed:8.1f}s"
        return super().format(record)


def get_logger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            ElapsedFormatter("[%(elapsed)s %(name)s %(levelname)s] %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger
