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
        lib.tok_encode_batch.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                         i64p, ctypes.c_int64,
                                         ctypes.c_int32, i32p,
                                         ctypes.c_int64, i32p]
        lib.tok_encode_batch.restype = ctypes.c_int
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
        # per-instance reusable output buffer + pre-bound symbols: the
        # per-call ctypes cost (ndarray alloc, data_as cast, attribute
        # lookups) would otherwise dominate short-sentence encodes.
        # encode() is therefore NOT reentrant on one instance — the
        # gateway serializes submits per tokenizer, which is the use.
        self._out = np.empty(self.max_out, np.int32)
        self._outp = self._out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        self._encode_fn = _LIB.tok_encode if _LIB is not None else None
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
            n = self._encode_fn(self._h, text.encode('utf-8'), self.mode,
                                self._outp, self.max_out)
            if n < 0:
                raise RuntimeError(f'tok_encode failed: {n}')
            n = int(n)
            return self._out[:min(n, self.max_out)].tolist(), n
        # pure-Python fallback: the exact pipeline composition
        # (annotations.py:64-67)
        if self.mode == 0:
            pre = preprocess_sentence_charades(text)
        else:
            pre = preprocess_sentence_anet(text)
        idxs = [self._wordtoix[w] for w in pre.lower().split(' ')
                if w in self._wordtoix]
        return idxs[:self.max_out], len(idxs)

    def encode_batch(self, texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
        """Encode many sentences in ONE foreign call.

        Returns ``(ids, counts)``: ids is ``[n, max_out]`` int32,
        zero-padded (pad_indices semantics — 0 is the '.' token);
        ``counts[i]`` is the total in-vocab tokens of sentence i
        (``> max_out`` means that row truncated). The single call
        amortizes the FFI overhead that dominates per-sentence encodes,
        so corpus tokenization runs at C++ speed.
        """
        n = len(texts)
        ids = np.zeros((n, self.max_out), np.int32)
        counts = np.zeros(n, np.int32)
        if n == 0:
            return ids, counts
        if self._h is not None:
            bs = [t.encode('utf-8') for t in texts]
            offsets = np.zeros(n + 1, np.int64)
            np.cumsum([len(b) for b in bs], out=offsets[1:])
            blob = b''.join(bs)
            rc = _LIB.tok_encode_batch(
                self._h, blob,
                offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                n, self.mode,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                self.max_out,
                counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            if rc != 0:
                raise RuntimeError(f'tok_encode_batch failed: {rc}')
            return ids, counts
        for i, t in enumerate(texts):
            row, c = self.encode(t)
            ids[i, :len(row)] = row
            counts[i] = c
        return ids, counts

    def close(self) -> None:
        if self._h is not None and _LIB is not None:
            _LIB.tok_destroy(self._h)
            self._h = None

    def __del__(self):
        self.close()
