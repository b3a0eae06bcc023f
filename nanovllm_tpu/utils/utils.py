"""Misc helpers (reference nanovllm/utils/utils.py)."""

import uuid


def random_uuid() -> str:
    return str(uuid.uuid4().hex)
