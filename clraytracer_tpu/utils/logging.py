"""Structured logging with severities, timestamps, and file:line capture.

Replaces the reference's Win32 colored-console logger
(Logger.cpp:32-48, AXLOG/AXWARNING/AXERROR macros in Logger.hpp:4-7).
Differences by design: errors raise instead of ``exit(0)`` — the reference's
fail-fast ``AXERROR(...); exit(0)`` pattern (e.g. ResourceManager.cpp:190)
becomes exceptions a host framework can catch.
"""

from __future__ import annotations

import logging
import os
import sys

_FMT = "%(asctime)s %(levelname)-7s [%(filename)s:%(lineno)d] %(message)s"
_DATEFMT = "%H:%M:%S"

_COLORS = {
    "DEBUG": "\x1b[36m",
    "INFO": "\x1b[32m",
    "WARNING": "\x1b[33m",
    "ERROR": "\x1b[31m",
    "CRITICAL": "\x1b[41m",
}
_RESET = "\x1b[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        msg = super().format(record)
        if sys.stderr.isatty():
            color = _COLORS.get(record.levelname, "")
            return f"{color}{msg}{_RESET}"
        return msg


_configured = False


def get_logger(name: str = "clraytracer") -> logging.Logger:
    """Module logger with colored console output and optional file sink.

    Set ``CLRT_LOG_FILE`` to also log to a file (reference Logger's
    ``FileLog``), ``CLRT_LOG_LEVEL`` to change verbosity.
    """
    global _configured
    logger = logging.getLogger(name)
    if not _configured:
        level = os.environ.get("CLRT_LOG_LEVEL", "INFO").upper()
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(_ColorFormatter(_FMT, _DATEFMT))
        root = logging.getLogger("clraytracer")
        root.addHandler(handler)
        root.setLevel(level)
        log_file = os.environ.get("CLRT_LOG_FILE")
        if log_file:
            fh = logging.FileHandler(log_file)
            fh.setFormatter(logging.Formatter(_FMT, _DATEFMT))
            root.addHandler(fh)
        root.propagate = False
        _configured = True
    return logger


def log_info(msg: str, *args: object) -> None:
    get_logger().info(msg, *args, stacklevel=2)


def log_warning(msg: str, *args: object) -> None:
    get_logger().warning(msg, *args, stacklevel=2)


def log_error(msg: str, *args: object) -> None:
    get_logger().error(msg, *args, stacklevel=2)
