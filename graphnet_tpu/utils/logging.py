"""Logger mixin (mirror of reference ``src/graphnet/utilities/logging.py``):
colorised stream logging, repeat suppression, ``warning_once``."""

from __future__ import annotations

import logging
import sys
from typing import Optional

_LOGGER_NAME = "graphnet_tpu"
_MAX_REPEATS = 20


class RepeatFilter(logging.Filter):
    """Suppress messages repeated more than ``_MAX_REPEATS`` times
    (reference ``logging.py:19-41``)."""

    def __init__(self) -> None:
        super().__init__()
        self._counts: dict = {}

    def filter(self, record: logging.LogRecord) -> bool:
        n = self._counts.get(record.msg, 0) + 1
        self._counts[record.msg] = n
        if n == _MAX_REPEATS:
            logging.getLogger(_LOGGER_NAME).info(
                f"Will not print the below message again "
                f"({_MAX_REPEATS} repeats reached)."
            )
        return n <= _MAX_REPEATS


def get_logger(level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s %(levelname)s %(name)s: %(message)s",
                datefmt="%H:%M:%S",
            )
        )
        logger.addHandler(handler)
        logger.addFilter(RepeatFilter())
        logger.setLevel(level)
        logger.propagate = False
    return logger


class Logger:
    """Mixin giving classes ``info/warning/error/debug`` + ``warning_once``
    (reference ``logging.py:44-254``)."""

    def __init__(self, *args, **kwargs) -> None:
        self._logger = get_logger()
        self._warned: set = set()

    def _ensure(self) -> None:
        if not hasattr(self, "_logger"):
            self._logger = get_logger()
            self._warned = set()

    def info(self, msg: str) -> None:
        self._ensure()
        self._logger.info(f"[{type(self).__name__}] {msg}")

    def warning(self, msg: str) -> None:
        self._ensure()
        self._logger.warning(f"[{type(self).__name__}] {msg}")

    def warning_once(self, msg: str) -> None:
        self._ensure()
        if msg not in self._warned:
            self._warned.add(msg)
            self.warning(msg)

    def error(self, msg: str) -> None:
        self._ensure()
        self._logger.error(f"[{type(self).__name__}] {msg}")

    def debug(self, msg: str) -> None:
        self._ensure()
        self._logger.debug(f"[{type(self).__name__}] {msg}")
