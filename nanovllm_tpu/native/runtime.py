"""ctypes bindings for the native engine runtime (csrc/block_manager.cpp).

Compiled on first use with g++ into the package directory (no pip install in
this environment); falls back cleanly when no toolchain is available — the
engine then uses the pure-Python BlockManager.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
from typing import Iterable, Optional

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "csrc",
                    "block_manager.cpp")
_SO = os.path.join(_HERE, "_engine_core.so")
_SO_STAMP = _SO + ".src.sha256"

_lib = None
_load_failed = False

# Valid pointer for C calls whose branch never reads the token array.
_DUMMY_TOKS = np.zeros(1, np.int64)


def _src_digest() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build() -> Optional[str]:
    # Reuse a previous build only when it was compiled from EXACTLY this
    # source (content hash, not mtimes — git does not preserve mtimes, and a
    # stale binary must never be dlopen'd in place of the reviewed source).
    digest = _src_digest()
    if os.path.exists(_SO) and os.path.exists(_SO_STAMP):
        try:
            with open(_SO_STAMP) as f:
                if f.read().strip() == digest:
                    return _SO
        except OSError:
            pass
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        with open(_SO_STAMP, "w") as f:
            f.write(digest)
        return _SO
    except Exception as e:
        logger.warning("native runtime build failed (%s); using python path", e)
        return None


def get_lib():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    so = _build()
    if so is None:
        _load_failed = True
        return None
    lib = ctypes.CDLL(so)
    lib.bm_create.restype = ctypes.c_void_p
    lib.bm_create.argtypes = [ctypes.c_int, ctypes.c_int,
                              ctypes.c_void_p, ctypes.c_int]
    lib.bm_destroy.argtypes = [ctypes.c_void_p]
    lib.bm_num_free.argtypes = [ctypes.c_void_p]
    lib.bm_num_free.restype = ctypes.c_int
    lib.bm_ref_count.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.bm_ref_count.restype = ctypes.c_int
    lib.bm_block_hash.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.bm_block_hash.restype = ctypes.c_int64
    lib.bm_can_allocate.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.bm_can_allocate.restype = ctypes.c_int
    lib.bm_allocate.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
                                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    lib.bm_allocate.restype = ctypes.c_int
    lib.bm_deallocate.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    lib.bm_can_append.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.bm_can_append.restype = ctypes.c_int
    lib.bm_append_slot.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
                                   ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    lib.bm_append_slot.restype = ctypes.c_int
    _lib = lib
    return _lib


class NativeBlockManager:
    """Drop-in replacement for engine.block_manager.BlockManager backed by
    the C++ runtime. Same public surface; sequences keep their python-side
    block_table lists."""

    def __init__(self, num_blocks: int, block_size: int,
                 non_cacheable_token_ids: Optional[Iterable[int]] = None,
                 max_blocks_per_seq: Optional[int] = None):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self.num_blocks = num_blocks
        self.block_size = block_size
        nc = np.asarray(sorted(set(non_cacheable_token_ids or [])), np.int64)
        self.non_cacheable = frozenset(int(x) for x in nc)
        self._h = lib.bm_create(num_blocks, block_size,
                                nc.ctypes.data if nc.size else None, nc.size)
        # Table scratch sized for the longest possible sequence; the C ABI
        # takes the capacity and fails (-2) rather than writing past it.
        cap = max_blocks_per_seq if max_blocks_per_seq else num_blocks
        self._table_buf = np.zeros(max(cap + 1, 64), np.int32)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.bm_destroy(self._h)
            self._h = None

    # -- introspection ----------------------------------------------------
    @property
    def num_free_blocks(self) -> int:
        return self._lib.bm_num_free(self._h)

    def ref_count(self, bid: int) -> int:
        return self._lib.bm_ref_count(self._h, bid)

    def block_hash(self, bid: int) -> int:
        return self._lib.bm_block_hash(self._h, bid)

    # -- prefill ----------------------------------------------------------
    def can_allocate(self, seq) -> bool:
        return bool(self._lib.bm_can_allocate(self._h, len(seq)))

    def allocate(self, seq) -> None:
        assert not seq.block_table
        toks = np.asarray(seq.token_ids, np.int64)
        out_len = ctypes.c_int(0)
        cached = self._lib.bm_allocate(
            self._h, toks.ctypes.data, len(toks),
            self._table_buf.ctypes.data, ctypes.byref(out_len),
            self._table_buf.size)
        if cached == -2:
            raise ValueError(
                f"sequence needs more than {self._table_buf.size} blocks")
        if cached < 0:
            raise IndexError("out of KV blocks")
        seq.block_table = self._table_buf[: out_len.value].tolist()
        seq.num_cached_tokens = cached

    def deallocate(self, seq) -> None:
        table = np.asarray(seq.block_table, np.int32)
        if table.size:
            self._lib.bm_deallocate(self._h, table.ctypes.data, table.size)
        seq.block_table.clear()

    # -- decode -----------------------------------------------------------
    # Mirrors BlockManager's TABLE-LENGTH based reservation (grow to
    # ceil(len/bs) pages): idempotent under the async-decode chain's
    # one-step-early reserve, and self-healing when an earlier can_append
    # rejection left the table short (the engine keeps the token appended).
    def can_append_slot(self, seq) -> bool:
        need = -(-len(seq) // self.block_size) - len(seq.block_table)
        return self.num_free_blocks >= max(need, 0)

    def append_slot(self, seq) -> None:
        need = -(-len(seq) // self.block_size)
        while len(seq.block_table) < need:
            # The C reserve branch fires at any virtual length with
            # offset 1 and never dereferences the token array.
            vlen = len(seq.block_table) * self.block_size + 1
            self._call_append(seq, vlen, toks=_DUMMY_TOKS)
        if len(seq) % self.block_size == 0:
            self._call_append(seq, len(seq))

    def _call_append(self, seq, n: int, toks=None) -> None:
        if toks is None:
            toks = np.asarray(seq.token_ids, np.int64)
        table = np.asarray(seq.block_table, np.int32)
        buf = self._table_buf
        buf[: table.size] = table
        new_len = self._lib.bm_append_slot(self._h, toks.ctypes.data,
                                           n, buf.ctypes.data,
                                           table.size, buf.size)
        if new_len == -2:
            raise ValueError(
                f"sequence needs more than {buf.size} blocks")
        if new_len != table.size:
            seq.block_table.append(int(buf[new_len - 1]))

    # -- async-decode chain (mirrors BlockManager.reserve_for_chain etc.) --
    def can_reserve_for_chain(self, seq) -> int:
        need = -(-(len(seq) + 1) // self.block_size) - len(seq.block_table)
        return max(need, 0)

    def reserve_for_chain(self, seq) -> None:
        need = -(-(len(seq) + 1) // self.block_size)
        while len(seq.block_table) < need:
            # Reserve branch only ((len_table*bs)+1 has offset 1); the C
            # side never dereferences the token array there.
            vlen = len(seq.block_table) * self.block_size + 1
            self._call_append(seq, vlen, toks=_DUMMY_TOKS)

    def seal_filled(self, seq) -> None:
        if len(seq) % self.block_size == 0:
            self._call_append(seq, len(seq))


def native_available() -> bool:
    return get_lib() is not None
