"""Structured stdout logging.

Parity target: reference nanovllm/utils/logger.py:9-76 (aligned multiline
formatter, forced flush). Single-process per host, so no child re-init
machinery is needed.
"""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(levelname)s %(asctime)s [%(name)s] %(message)s"
_DATEFMT = "%m-%d %H:%M:%S"


class _AlignedFormatter(logging.Formatter):
    """Continuation lines of multiline messages align under the first."""

    def format(self, record):
        msg = super().format(record)
        if "\n" in msg:
            head = msg.split(record.getMessage())[0] if record.getMessage() in msg else ""
            pad = " " * len(head)
            lines = msg.split("\n")
            msg = lines[0] + "".join("\n" + pad + ln for ln in lines[1:])
        return msg


class _FlushingHandler(logging.StreamHandler):
    def emit(self, record):
        super().emit(record)
        self.flush()


_configured = False


def init_logger(name: str) -> logging.Logger:
    """Returns a logger writing aligned, flushed records to stdout."""
    global _configured
    root = logging.getLogger("nanovllm_tpu")
    if not _configured:
        handler = _FlushingHandler(sys.stdout)
        handler.setFormatter(_AlignedFormatter(_FORMAT, _DATEFMT))
        root.addHandler(handler)
        root.setLevel(logging.INFO)
        root.propagate = False
        _configured = True
    if name.startswith("nanovllm_tpu"):
        return logging.getLogger(name)
    return root.getChild(name)
