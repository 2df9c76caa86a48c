"""ctypes wrapper around the native sentence tokenizer (native/tokenizer.cpp).

Gives the serving gateway a raw-text submit path: the per-dataset
preprocessing rules (reference: grounding/dataset/charades.py:120-132,
anet.py:92-112) plus the OOV-dropping vocab lookup run in C++ with the GIL
released, so text queries tokenize at hash-lookup speed without touching
Python string machinery. The vocab (a pickled-dict npy artifact) is parsed
once in Python and fed to the native side as one contiguous blob.

Falls back to the pure-Python tokenizer in :mod:`.vocab` when the shared
library is not built, so every caller works either way — parity between the
two paths is asserted over every bundled annotation sentence in
tests/test_native_tokenizer.py.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from .vocab import preprocess_sentence_anet, preprocess_sentence_charades

_SO_CANDIDATES = (
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), 'native', 'libtokenizer.so'),
    'libtokenizer.so',
)

MODES = {'charades': 0, 'anet': 1}


def _load_native() -> Optional[ctypes.CDLL]:
    for cand in _SO_CANDIDATES:
        try:
            lib = ctypes.CDLL(cand)
        except OSError:
            continue
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.tok_create.argtypes = [ctypes.POINTER(ctypes.c_void_p)]
        lib.tok_create.restype = ctypes.c_int
        lib.tok_load_vocab.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       i64p, i32p, ctypes.c_int64]
        lib.tok_load_vocab.restype = ctypes.c_int
        lib.tok_encode.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_int32, i32p, ctypes.c_int64]
        lib.tok_encode.restype = ctypes.c_int64
        lib.tok_vocab_size.argtypes = [ctypes.c_void_p]
        lib.tok_vocab_size.restype = ctypes.c_int64
        lib.tok_destroy.argtypes = [ctypes.c_void_p]
        lib.tok_destroy.restype = ctypes.c_int
        return lib
    return None


_LIB = _load_native()


def native_available() -> bool:
    return _LIB is not None


class NativeTokenizer:
    """Sentence -> token ids with the reference's per-dataset rules.

    ``encode`` returns ``(ids, n_matched)``: ids holds at most ``max_out``
    in-vocab token ids in sentence order; ``n_matched`` is the total number
    found (> len(ids) means the sentence overflowed and was truncated,
    mirroring data/vocab.py::pad_indices semantics).
    """

    def __init__(self, wordtoix: Dict[str, int], dataset: str = 'charades',
                 max_out: int = 64, use_native: bool = True):
        if dataset not in MODES:
            raise ValueError(f'dataset must be one of {sorted(MODES)}')
        self.dataset = dataset
        self.mode = MODES[dataset]
        self.max_out = int(max_out)
        self._wordtoix = wordtoix
        self._h: Optional[ctypes.c_void_p] = None
        if use_native and _LIB is not None:
            h = ctypes.c_void_p()
            rc = _LIB.tok_create(ctypes.byref(h))
            if rc != 0:
                raise RuntimeError(f'tok_create failed: {rc}')
            self._h = h
            words = list(wordtoix.items())
            blob = b''.join(w.encode('utf-8') for w, _ in words)
            lens = np.asarray([len(w.encode('utf-8')) for w, _ in words],
                              np.int64)
            offsets = np.zeros(len(words) + 1, np.int64)
            np.cumsum(lens, out=offsets[1:])
            ids = np.asarray([i for _, i in words], np.int32)
            rc = _LIB.tok_load_vocab(
                h, blob,
                offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(words))
            if rc != 0:
                raise RuntimeError(f'tok_load_vocab failed: {rc}')

    @property
    def native(self) -> bool:
        return self._h is not None

    def encode(self, text: str) -> Tuple[List[int], int]:
        if self._h is not None:
            out = np.empty(self.max_out, np.int32)
            n = _LIB.tok_encode(
                self._h, text.encode('utf-8'), self.mode,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                self.max_out)
            if n < 0:
                raise RuntimeError(f'tok_encode failed: {n}')
            return out[:min(int(n), self.max_out)].tolist(), int(n)
        # pure-Python fallback: the exact pipeline composition
        # (annotations.py:64-67)
        if self.mode == 0:
            pre = preprocess_sentence_charades(text)
        else:
            pre = preprocess_sentence_anet(text)
        idxs = [self._wordtoix[w] for w in pre.lower().split(' ')
                if w in self._wordtoix]
        return idxs[:self.max_out], len(idxs)

    def close(self) -> None:
        if self._h is not None and _LIB is not None:
            _LIB.tok_destroy(self._h)
            self._h = None

    def __del__(self):
        self.close()
