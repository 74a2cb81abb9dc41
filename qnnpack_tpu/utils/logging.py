"""Leveled logging (clog analogue, src/qnnpack/log.h:9-29).

The reference compiles its log level in via QNNP_LOG_LEVEL (log.h:13); here
the level comes from the QNNPACK_TPU_LOG_LEVEL environment variable or
`set_log_level`.  The discipline carried over: every rejected parameter
explains itself (validation errors in ops/base.py raise with full context
AND log at error level)."""

from __future__ import annotations

import logging
import os

_LEVELS = {"debug": logging.DEBUG, "info": logging.INFO,
           "warning": logging.WARNING, "error": logging.ERROR,
           "fatal": logging.CRITICAL, "none": logging.CRITICAL + 10}

logger = logging.getLogger("qnnpack_tpu")

if not logger.handlers:
    _handler = logging.StreamHandler()
    _handler.setFormatter(
        logging.Formatter("%(asctime)s [%(name)s %(levelname)s] %(message)s"))
    logger.addHandler(_handler)
    logger.setLevel(_LEVELS.get(
        os.environ.get("QNNPACK_TPU_LOG_LEVEL", "warning").lower(),
        logging.WARNING))


def set_log_level(level: str):
    logger.setLevel(_LEVELS[level.lower()])


log_debug = logger.debug
log_info = logger.info
log_warning = logger.warning
log_error = logger.error
