"""Logging with file:line provenance.

Parity with the reference's printf macros (wave_utils/include/wave/utils/
log.hpp:24-28 LOG_ERROR/LOG_INFO): thin wrappers over :mod:`logging` that
record caller file:line, plus structured metric logging for pipelines.
"""

from __future__ import annotations

import logging
import sys

_logger = logging.getLogger("libwave_tpu")
if not _logger.handlers:
    _handler = logging.StreamHandler(sys.stderr)
    _handler.setFormatter(
        logging.Formatter("[%(levelname)s] [%(filename)s:%(lineno)d] %(message)s")
    )
    _logger.addHandler(_handler)
    _logger.setLevel(logging.INFO)
    _logger.propagate = False


def log_info(msg: str, *args) -> None:
    _logger.info(msg, *args, stacklevel=2)


def log_warn(msg: str, *args) -> None:
    _logger.warning(msg, *args, stacklevel=2)


def log_error(msg: str, *args) -> None:
    _logger.error(msg, *args, stacklevel=2)
