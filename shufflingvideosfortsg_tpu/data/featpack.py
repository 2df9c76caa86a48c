"""Packed feature store reader.

Reads the FEATPAK1 blobs written by tools/featpack.py. Two paths:

- native (preferred): ctypes binding onto native/libfeatpack.so — mmap +
  OpenMP parallel batch gather with inline f16->f32 conversion;
- fallback: numpy memmap with fancy-index gather (always available; used
  when the shared library hasn't been built).

``PackedFeatureSource.gather(rows)`` returns a [B, T, D] float32 batch.
"""

from __future__ import annotations

import ctypes
import json
import os
import struct
from typing import Dict, Optional, Sequence

import numpy as np

MAGIC = b'FEATPAK1'
HEADER_FMT = '<8sIIIIQ'
HEADER_SIZE = struct.calcsize(HEADER_FMT)

_LIB_CANDIDATES = (
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), 'native', 'libfeatpack.so'),
    'libfeatpack.so',
)


def _load_native() -> Optional[ctypes.CDLL]:
    for cand in _LIB_CANDIDATES:
        try:
            lib = ctypes.CDLL(cand)
        except OSError:
            continue
        lib.fp_open.argtypes = [ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_void_p)]
        lib.fp_open.restype = ctypes.c_int
        lib.fp_meta.argtypes = [ctypes.c_void_p] + \
            [ctypes.POINTER(ctypes.c_uint32)] * 4
        lib.fp_meta.restype = ctypes.c_int
        lib.fp_gather.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_int64),
                                  ctypes.c_int64,
                                  ctypes.POINTER(ctypes.c_float)]
        lib.fp_gather.restype = ctypes.c_int
        try:
            lib.fp_gather_raw.argtypes = [ctypes.c_void_p,
                                          ctypes.POINTER(ctypes.c_int64),
                                          ctypes.c_int64, ctypes.c_void_p]
            lib.fp_gather_raw.restype = ctypes.c_int
        except AttributeError:
            pass  # older .so without the raw entry point: python fallback
        lib.fp_close.argtypes = [ctypes.c_void_p]
        lib.fp_close.restype = ctypes.c_int
        return lib
    return None


_NATIVE = _load_native()


def is_featpack_dir(path: str) -> bool:
    return os.path.isfile(os.path.join(path, 'pack.bin')) and \
        os.path.isfile(os.path.join(path, 'index.json'))


class PackedFeatureSource:
    def __init__(self, pack_dir: str, use_native: bool = True):
        with open(os.path.join(pack_dir, 'index.json')) as f:
            index = json.load(f)
        self.vid_to_row: Dict[str, int] = index['vids']
        self.nfeats = np.asarray(index['nfeats'], np.int32)
        self.T = int(index['t'])
        self.D = int(index['d'])
        self.dtype = index['dtype']
        self.mode = index.get('mode')
        self.bin_path = os.path.join(pack_dir, 'pack.bin')

        with open(self.bin_path, 'rb') as f:
            head = struct.unpack(HEADER_FMT, f.read(HEADER_SIZE))
        assert head[0] == MAGIC, 'bad featpack magic'
        assert head[2] == self.T and head[3] == self.D, 'index/blob mismatch'
        self.num_videos = head[1]

        self._handle = None
        if use_native and _NATIVE is not None:
            handle = ctypes.c_void_p()
            rc = _NATIVE.fp_open(self.bin_path.encode(), ctypes.byref(handle))
            if rc == 0:
                self._handle = handle
        if self._handle is None:
            np_dtype = np.float16 if self.dtype == 'f16' else np.float32
            self._mm = np.memmap(self.bin_path, dtype=np_dtype, mode='r',
                                 offset=HEADER_SIZE,
                                 shape=(self.num_videos, self.T, self.D))

    @property
    def native(self) -> bool:
        return self._handle is not None

    def rows_for(self, vids: Sequence[str]) -> np.ndarray:
        return np.asarray([self.vid_to_row[v] for v in vids], np.int64)

    def gather(self, rows: np.ndarray,
               out: Optional[np.ndarray] = None) -> np.ndarray:
        rows = np.ascontiguousarray(rows, np.int64)
        B = len(rows)
        if out is None:
            out = np.empty((B, self.T, self.D), np.float32)
        if self._handle is not None:
            _NATIVE.fp_gather(
                self._handle,
                rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.c_int64(B),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        else:
            out[:] = self._mm[rows].astype(np.float32)
        return out

    @property
    def raw_dtype(self) -> np.dtype:
        return np.dtype(np.float16 if self.dtype == 'f16' else np.float32)

    def gather_raw(self, rows: np.ndarray,
                   out: Optional[np.ndarray] = None) -> np.ndarray:
        """[B, T, D] batch in the pack's STORED dtype (no f16->f32 host
        conversion). Shipping the f16 bytes host->device halves H2D traffic;
        the upcast happens on device (the model casts inputs to its compute
        dtype anyway)."""
        rows = np.ascontiguousarray(rows, np.int64)
        B = len(rows)
        if out is None:
            out = np.empty((B, self.T, self.D), self.raw_dtype)
        if self._handle is not None and hasattr(_NATIVE, 'fp_gather_raw'):
            _NATIVE.fp_gather_raw(
                self._handle,
                rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ctypes.c_int64(B), out.ctypes.data_as(ctypes.c_void_p))
        elif self._handle is not None:
            # native lib without the raw symbol: f32 gather then downcast
            out[:] = self.gather(rows).astype(self.raw_dtype)
        else:
            out[:] = self._mm[rows]
        return out

    def nfeats_for(self, rows: np.ndarray) -> np.ndarray:
        return self.nfeats[rows]

    def close(self):
        if self._handle is not None:
            _NATIVE.fp_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
