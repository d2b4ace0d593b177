"""Package logger + CLI verbosity plumbing (reference learnhtml/log.py +
click_log.simple_verbosity_option, cli/script.py:28 — re-expressed over
stdlib logging; click/click_log are not dependencies here)."""

from __future__ import annotations

import logging

logger = logging.getLogger("learnhtml_spark")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("%(levelname)s: %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)
    # own handler attached -> stop propagation, or a host app's root
    # handler (logging.basicConfig) would print every message twice
    logger.propagate = False


def set_verbosity(level: str) -> None:
    """Set the package log level by name (DEBUG/INFO/WARNING/ERROR/
    CRITICAL, case-insensitive) — the CLI's --verbosity option."""
    logger.setLevel(getattr(logging, level.upper()))
