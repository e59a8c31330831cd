"""Structured logging with the reference's surface (loguru-style).

The reference uses loguru with a level-filtered stderr sink plus an optional
100 MB rotating file sink (reference predict.py:386-394, analyze.py:127-136).
loguru is not in this environment, so this is a thin std-logging wrapper with
the same API shape: ``logger.{trace,debug,info,success,warning,error,
critical}`` and ``configure(level, log_path)``.
"""

from __future__ import annotations

import logging
import logging.handlers
import sys
from pathlib import Path

TRACE = 5
SUCCESS = 25
logging.addLevelName(TRACE, "TRACE")
logging.addLevelName(SUCCESS, "SUCCESS")

_LEVELS = {
    "TRACE": TRACE,
    "DEBUG": logging.DEBUG,
    "INFO": logging.INFO,
    "SUCCESS": SUCCESS,
    "WARNING": logging.WARNING,
    "ERROR": logging.ERROR,
    "CRITICAL": logging.CRITICAL,
}

_FORMAT = "%(asctime)s | %(levelname)-8s | %(message)s"


class _Logger:
    def __init__(self) -> None:
        self._logger = logging.getLogger("depth_completion_tpu")
        self._logger.setLevel(TRACE)
        self._configured = False

    def configure(self, level: str = "INFO", log_path: Path | None = None) -> None:
        """(Re)build sinks: stderr + optional rotating file (100 MB)."""
        for h in list(self._logger.handlers):
            self._logger.removeHandler(h)
        lvl = _LEVELS.get(level.upper(), logging.INFO)
        sh = logging.StreamHandler(sys.stderr)
        sh.setLevel(lvl)
        sh.setFormatter(logging.Formatter(_FORMAT))
        self._logger.addHandler(sh)
        if log_path is not None:
            log_path = Path(log_path)
            log_path.parent.mkdir(parents=True, exist_ok=True)
            fh = logging.handlers.RotatingFileHandler(
                log_path, maxBytes=100 * 1024 * 1024, backupCount=10
            )
            fh.setLevel(lvl)
            fh.setFormatter(logging.Formatter(_FORMAT))
            self._logger.addHandler(fh)
        self._configured = True

    def _log(self, level: int, msg: str) -> None:
        if not self._configured:
            self.configure()
        self._logger.log(level, msg)

    def trace(self, msg: str) -> None:
        self._log(TRACE, msg)

    def debug(self, msg: str) -> None:
        self._log(logging.DEBUG, msg)

    def info(self, msg: str) -> None:
        self._log(logging.INFO, msg)

    def success(self, msg: str) -> None:
        self._log(SUCCESS, msg)

    def warning(self, msg: str) -> None:
        self._log(logging.WARNING, msg)

    def error(self, msg: str) -> None:
        self._log(logging.ERROR, msg)

    def critical(self, msg: str) -> None:
        self._log(logging.CRITICAL, msg)


logger = _Logger()
LOG_LEVELS = list(_LEVELS)
