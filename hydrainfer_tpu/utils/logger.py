"""Structured stdout logger.

Behavioral parity with the reference's newline-indenting logger
(reference: hydrainfer/utils/logger.py) without copying its formatter: we
indent continuation lines so multi-line messages stay visually grouped.
"""
import logging
import os
import sys

_FMT = "%(asctime)s %(levelname).1s %(name)s] %(message)s"


class _IndentFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        text = super().format(record)
        if "\n" in text:
            head, _, _ = text.partition(record.getMessage().split("\n", 1)[0])
            pad = " " * 4
            lines = text.split("\n")
            text = lines[0] + "".join("\n" + pad + l for l in lines[1:])
        return text


def getLogger(name: str) -> logging.Logger:
    logger = logging.getLogger(name)
    if not getattr(logger, "_hydrainfer_tpu_configured", False):
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(_IndentFormatter(_FMT, datefmt="%H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("HYDRAINFER_LOG_LEVEL", "INFO"))
        logger.propagate = False
        logger._hydrainfer_tpu_configured = True  # type: ignore[attr-defined]
    return logger
