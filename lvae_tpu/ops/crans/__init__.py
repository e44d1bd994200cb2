"""ctypes bindings for the native rANS coder (rans.cpp).

The shared library is compiled on first import and cached next to the source.
If no C++ toolchain is available, callers can fall back to the numpy
reference coder in lvae_tpu.ops.rans_numpy (same stream format).
"""
import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

from lvae_tpu.ops.cdf import CdfTable, PRECISION

_HERE = Path(__file__).parent
_SRC = _HERE / 'rans.cpp'
_LIB_PATH = _HERE / 'librans.so'
_lock = threading.Lock()
_lib = None


def _build_library():
    cmd = ['g++', '-O3', '-std=c++17', '-shared', '-fPIC',
           str(_SRC), '-o', str(_LIB_PATH)]
    # -march=native helps but may be unavailable in exotic environments
    try:
        subprocess.run(cmd + ['-march=native'], check=True, capture_output=True)
    except subprocess.CalledProcessError:
        subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not _LIB_PATH.exists()) or (_LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime):
            _build_library()
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.rans_encode_bound.restype = ctypes.c_int64
        lib.rans_encode_bound.argtypes = [ctypes.c_int64]
        lib.rans_encode_with_indexes.restype = ctypes.c_int64
        lib.rans_encode_with_indexes.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.rans_decode_with_indexes.restype = ctypes.c_int64
        lib.rans_decode_with_indexes.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.rans_interleaved_encode.restype = ctypes.c_int64
        lib.rans_interleaved_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p,
        ]
        _lib = lib
    return _lib


def interleaved_encode(values, indexes, block_sizes, table: CdfTable,
                       num_lanes=128, escapes_capacity=None):
    """C++ N-lane interleaved encode (bit-exact with
    ops/rans_interleaved.InterleavedEncoder). Returns
    (states uint32[N], words uint16[W], escapes int64[K,2])."""
    lib = _load()
    v, vp = _as_c(np.ravel(values), np.int32)
    ix, ixp = _as_c(np.ravel(indexes), np.int32)
    bs, bsp = _as_c(np.ravel(block_sizes), np.int64)
    assert v.size == ix.size == int(bs.sum())
    c, cp = _as_c(table.cdfs, np.uint32)
    ln, lnp = _as_c(table.cdf_lengths, np.int32)
    off, offp = _as_c(table.offsets, np.int32)
    states = np.empty(num_lanes, np.uint32)
    words_cap = int(v.size * 3 + 64)
    words = np.empty(words_cap, np.uint16)
    if escapes_capacity is None:
        escapes_capacity = int(v.size) + 16  # worst case: every symbol escapes
    escapes = np.empty((escapes_capacity, 2), np.int64)
    n_esc = np.zeros(1, np.int64)
    n_words = lib.rans_interleaved_encode(
        vp, ixp, bsp, bs.size, cp, lnp, offp,
        table.num_scales, table.max_cdf_length, num_lanes,
        states.ctypes.data_as(ctypes.c_void_p),
        words.ctypes.data_as(ctypes.c_void_p), words_cap,
        escapes.ctypes.data_as(ctypes.c_void_p), escapes_capacity,
        n_esc.ctypes.data_as(ctypes.c_void_p))
    assert n_words >= 0, 'interleaved encode capacity error'
    return states, words[:n_words].copy(), escapes[:int(n_esc[0])].copy()


def is_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def build_slot_lookup(table: CdfTable) -> np.ndarray:
    """Precompute the (S, 2^16) uint16 slot->symbol lookup for O(1) decode."""
    S = table.num_scales
    slots = np.arange(1 << PRECISION, dtype=np.uint32)
    lut = np.empty((S, 1 << PRECISION), dtype=np.uint16)
    for i in range(S):
        n = int(table.cdf_lengths[i])
        row = table.cdfs[i, :n].astype(np.uint32)
        # symbol s for slot means row[s] <= slot < row[s+1]
        lut[i] = (np.searchsorted(row, slots, side='right') - 1).astype(np.uint16)
    return lut


def _as_c(arr, dtype):
    a = np.ascontiguousarray(arr, dtype=dtype)
    return a, a.ctypes.data_as(ctypes.c_void_p)


class RansCodec:
    """Reusable coder bound to one CdfTable.

    Pre-pins C-contiguous table buffers and a scratch output buffer so that
    per-call overhead is just the two ctypes dispatches. Create once per
    discretized distribution at compress_mode() time.
    """

    def __init__(self, table: CdfTable, use_slot_lookup: bool = False):
        self._lib = _load()
        self.table = table
        self._cdfs, self._cdfs_p = _as_c(table.cdfs, np.uint32)
        self._lens, self._lens_p = _as_c(table.cdf_lengths, np.int32)
        self._offs, self._offs_p = _as_c(table.offsets, np.int32)
        if use_slot_lookup:
            self._lut, self._lut_p = _as_c(build_slot_lookup(table), np.uint16)
        else:
            self._lut, self._lut_p = None, None
        self._scratch = np.empty(1 << 20, dtype=np.uint8)

    def _ensure_scratch(self, nbytes):
        if self._scratch.size < nbytes:
            self._scratch = np.empty(int(nbytes * 2), dtype=np.uint8)
        return self._scratch

    def encode_with_indexes(self, values, indexes) -> bytes:
        v, vp = _as_c(np.ravel(values), np.int32)
        ix, ixp = _as_c(np.ravel(indexes), np.int32)
        assert v.size == ix.size
        cap = int(self._lib.rans_encode_bound(v.size))
        out = self._ensure_scratch(cap)
        written = self._lib.rans_encode_with_indexes(
            vp, ixp, v.size, self._cdfs_p, self._lens_p, self._offs_p,
            self.table.num_scales, self.table.max_cdf_length,
            out.ctypes.data_as(ctypes.c_void_p), out.size)
        assert written > 0, f'rans encode failed: {written}'
        return out[:written].tobytes()

    def decode_with_indexes(self, data: bytes, indexes) -> np.ndarray:
        ix, ixp = _as_c(np.ravel(indexes), np.int32)
        buf = np.frombuffer(data, dtype=np.uint8)
        out = np.empty(ix.size, dtype=np.int32)
        n = self._lib.rans_decode_with_indexes(
            buf.ctypes.data_as(ctypes.c_void_p), buf.size,
            ixp, ix.size, self._cdfs_p, self._lens_p, self._offs_p,
            self.table.num_scales, self.table.max_cdf_length,
            self._lut_p, out.ctypes.data_as(ctypes.c_void_p))
        assert n == ix.size
        return out


def encode_with_indexes(values, indexes, table: CdfTable) -> bytes:
    """One-shot convenience wrapper (prefer RansCodec for hot paths)."""
    return RansCodec(table, use_slot_lookup=False).encode_with_indexes(values, indexes)


def decode_with_indexes(data: bytes, indexes, table: CdfTable,
                        slot_lookup: np.ndarray = None) -> np.ndarray:
    """One-shot convenience wrapper (prefer RansCodec for hot paths)."""
    codec = RansCodec(table, use_slot_lookup=False)
    if slot_lookup is not None:
        codec._lut, codec._lut_p = _as_c(slot_lookup, np.uint16)
    return codec.decode_with_indexes(data, indexes)
