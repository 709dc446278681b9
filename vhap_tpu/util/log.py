"""Colored console + optional file logging.

Role parity with vhap/util/log.py:46-90 (colored console formatter, root
logger with a timestamped file handler inside the run output dir).
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path
from typing import Optional

_LEVEL_COLORS = {
    logging.DEBUG: "\x1b[36m",     # cyan
    logging.INFO: "\x1b[32m",      # green
    logging.WARNING: "\x1b[33m",   # yellow
    logging.ERROR: "\x1b[31m",     # red
    logging.CRITICAL: "\x1b[1;31m",
}
_RESET = "\x1b[0m"


class _ColorFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        color = _LEVEL_COLORS.get(record.levelno, "")
        prefix = f"{color}[{record.levelname:.1s}]{_RESET}"
        base = super().format(record)
        return f"{prefix} {base}"


def get_logger(
    name: str,
    root: bool = False,
    log_dir: Optional[Path] = None,
    level: int = logging.INFO,
) -> logging.Logger:
    """Create/fetch a logger. With ``root=True`` attaches handlers that
    all child loggers inherit; ``log_dir`` adds a plain-text file handler
    ``<log_dir>/run.log``."""
    logger = logging.getLogger(None if root else name)
    logger.setLevel(level)

    if root or not logger.handlers:
        target = logger if root else logging.getLogger()
        if not any(isinstance(h, logging.StreamHandler) and getattr(h, "_vhap_tpu", False)
                   for h in target.handlers):
            sh = logging.StreamHandler(sys.stderr)
            sh.setFormatter(_ColorFormatter("%(asctime)s %(name)s: %(message)s", "%H:%M:%S"))
            sh._vhap_tpu = True  # type: ignore[attr-defined]
            target.addHandler(sh)

    if log_dir is not None:
        log_dir = Path(log_dir)
        log_dir.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(log_dir / "run.log")
        fh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s"))
        logging.getLogger().addHandler(fh)

    return logger
