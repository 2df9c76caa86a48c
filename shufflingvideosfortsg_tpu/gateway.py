"""Online serving gateway: native dynamic micro-batching over the grounder.

The reference has no online serving path at all — its only inference
surface is the offline eval loop (`grounding/test.py`), one fixed batch at
a time. This module is the missing production half: concurrent clients
submit single ``(token-id query, video row)`` requests from any thread;
a native C++ scheduler (`native/gateway.cpp`) forms deadline-batched
micro-batches, and ONE dispatch worker feeds them to the jitted serving
program of a :class:`~shufflingvideosfortsg_tpu.serving.MultiQueryGrounder`.

Why the queue is native: batch formation happens between arbitrary client
threads and the dispatch worker at microsecond granularity. In C++ it is a
mutex + two condvars with zero allocation per request; ctypes foreign
calls release the GIL, so producers and the dispatch worker never serialize
against Python. The Python side only ever touches full batches — pad,
dispatch, fetch, post — which is exactly the granularity the TPU wants.

Batching policy (the standard latency/throughput dial):
  - ``first_wait_us``: how long the worker sleeps waiting for ANY request;
  - ``flush_us``: once the first request of a batch is picked up, how long
    to keep the door open for stragglers before dispatching a partial
    batch (0 = dispatch whatever is queued the moment the worker looks).

Usage::

    g = MultiQueryGrounder(params, model_params, query_batch=256)
    g.set_corpus(pack); g.set_vocab(vocab_matrix)
    gw = ServingGateway(g)                      # starts dispatch worker
    t = gw.submit([4, 17, 9], video_row=123)    # any thread
    start, end, score = gw.result(t)            # blocks for that ticket
    gw.close()
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_SO_CANDIDATES = (
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'native', 'libgateway.so'),
    'libgateway.so',
)


def _load_native() -> Optional[ctypes.CDLL]:
    for cand in _SO_CANDIDATES:
        try:
            lib = ctypes.CDLL(cand)
        except OSError:
            continue
        u64p = ctypes.POINTER(ctypes.c_uint64)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.gw_create.argtypes = [ctypes.c_int64, ctypes.c_int32,
                                  ctypes.POINTER(ctypes.c_void_p)]
        lib.gw_create.restype = ctypes.c_int
        lib.gw_submit.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int32,
                                  ctypes.c_int32]
        lib.gw_submit.restype = ctypes.c_int64
        lib.gw_next_batch.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                      ctypes.c_int64, ctypes.c_int64,
                                      i64p, i32p, i32p]
        lib.gw_next_batch.restype = ctypes.c_int32
        lib.gw_complete.argtypes = [ctypes.c_void_p, i64p, ctypes.c_int32,
                                    f32p, f32p, f32p]
        lib.gw_complete.restype = ctypes.c_int
        lib.gw_wait.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                ctypes.c_int64, f32p, f32p, f32p]
        lib.gw_wait.restype = ctypes.c_int
        lib.gw_stats.argtypes = [ctypes.c_void_p, u64p, u64p, u64p, u64p]
        lib.gw_stats.restype = ctypes.c_int
        lib.gw_shutdown.argtypes = [ctypes.c_void_p]
        lib.gw_shutdown.restype = ctypes.c_int
        lib.gw_destroy.argtypes = [ctypes.c_void_p]
        lib.gw_destroy.restype = ctypes.c_int
        return lib
    return None


_LIB = _load_native()


def native_available() -> bool:
    return _LIB is not None


class QueueFull(RuntimeError):
    pass


class GatewayClosed(RuntimeError):
    pass


class NativeBatchQueue:
    """ctypes handle onto one native gateway queue (see gateway.cpp)."""

    def __init__(self, capacity: int = 4096, max_tokens: int = 32):
        if _LIB is None:
            raise RuntimeError(
                'native/libgateway.so not built — run `make -C native`')
        self.capacity = capacity
        self.max_tokens = max_tokens
        h = ctypes.c_void_p()
        rc = _LIB.gw_create(capacity, max_tokens, ctypes.byref(h))
        if rc != 0:
            raise RuntimeError(f'gw_create failed: {rc}')
        self._h = h

    def submit(self, tokens: Sequence[int], video_row: int = 0) -> int:
        arr = np.asarray(tokens, np.int32)
        if arr.ndim != 1 or arr.shape[0] > self.max_tokens:
            raise ValueError(f'tokens must be [<= {self.max_tokens}] 1-D')
        t = _LIB.gw_submit(
            self._h, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            arr.shape[0], int(video_row))
        if t == -1:
            raise QueueFull('gateway queue full')
        if t == -2:
            raise GatewayClosed('gateway is shut down')
        if t < 0:
            raise RuntimeError(f'gw_submit failed: {t}')
        return int(t)

    def next_batch(self, max_batch: int, first_wait_us: int, flush_us: int
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Blocks for up to first_wait_us; returns (tickets [n], tokens
        [n, max_tokens], vids [n]). n == 0 on timeout; raises
        GatewayClosed once shut down AND drained."""
        tickets = np.empty(max_batch, np.int64)
        tokens = np.empty((max_batch, self.max_tokens), np.int32)
        vids = np.empty(max_batch, np.int32)
        n = _LIB.gw_next_batch(
            self._h, max_batch, first_wait_us, flush_us,
            tickets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            vids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if n == -1:
            raise GatewayClosed('gateway drained')
        return tickets[:n], tokens[:n], vids[:n]

    def complete(self, tickets: np.ndarray, starts: np.ndarray,
                 ends: np.ndarray, scores: np.ndarray) -> None:
        tickets = np.ascontiguousarray(tickets, np.int64)
        starts = np.ascontiguousarray(starts, np.float32)
        ends = np.ascontiguousarray(ends, np.float32)
        scores = np.ascontiguousarray(scores, np.float32)
        f32p = ctypes.POINTER(ctypes.c_float)
        _LIB.gw_complete(
            self._h,
            tickets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            tickets.shape[0], starts.ctypes.data_as(f32p),
            ends.ctypes.data_as(f32p), scores.ctypes.data_as(f32p))

    def wait(self, ticket: int, timeout_us: int
             ) -> Optional[Tuple[float, float, float]]:
        s = ctypes.c_float()
        e = ctypes.c_float()
        sc = ctypes.c_float()
        rc = _LIB.gw_wait(self._h, ticket, timeout_us, ctypes.byref(s),
                          ctypes.byref(e), ctypes.byref(sc))
        if rc == 0:
            return s.value, e.value, sc.value
        if rc == -1:
            return None
        raise KeyError(f'bad/consumed ticket {ticket}')

    def stats(self) -> dict:
        vals = [ctypes.c_uint64() for _ in range(4)]
        _LIB.gw_stats(self._h, *[ctypes.byref(v) for v in vals])
        submitted, completed, batches, batched = (v.value for v in vals)
        return {'submitted': submitted, 'completed': completed,
                'batches': batches,
                'mean_batch': batched / batches if batches else 0.0}

    def shutdown(self) -> None:
        _LIB.gw_shutdown(self._h)

    def __del__(self):
        h = getattr(self, '_h', None)
        if h is not None and _LIB is not None:
            _LIB.gw_shutdown(h)
            _LIB.gw_destroy(h)
            self._h = None


class ServingGateway:
    """Dispatch worker gluing a NativeBatchQueue to a grounder's jitted
    serving program.

    ``mode='bank'`` serves against the resident video bank/corpus
    (``set_videos``/``set_corpus`` + per-request ``video_row``);
    ``mode='video'`` serves every request against the single resident
    video (``set_video``). Both require ``set_vocab`` (token-id traffic —
    the only traffic shape that survives slow host links, see
    docs/KERNELS.md).
    """

    def __init__(self, grounder, mode: str = 'bank',
                 max_batch: Optional[int] = None,
                 first_wait_us: int = 50_000, flush_us: int = 2_000,
                 capacity: int = 4096,
                 max_tokens: Optional[int] = None,
                 pipeline_depth: int = 1,
                 tokenizer=None):
        assert mode in ('bank', 'video')
        if grounder._resident_emb is None:
            raise ValueError('grounder needs set_vocab() (token-id serving)')
        if mode == 'bank' and grounder._resident_bank is None:
            raise ValueError('mode=bank needs set_videos()/set_corpus()')
        if mode == 'video' and grounder._resident_rnn0 is None:
            raise ValueError('mode=video needs set_video()')
        self.grounder = grounder
        self.mode = mode
        self.max_batch = max_batch or grounder.query_batch
        self.first_wait_us = first_wait_us
        self.flush_us = flush_us
        n_tok = max_tokens or int(grounder.params.get('sent_len', 32))
        self.queue = NativeBatchQueue(capacity=capacity, max_tokens=n_tok)
        self.tokenizer = tokenizer  # data.text_native.NativeTokenizer
        self.pipeline_depth = max(1, int(pipeline_depth))
        self._exc: Optional[BaseException] = None
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name='svtsg-gateway-dispatch')
        self._worker.start()

    # -- dispatch worker ---------------------------------------------------
    def _run(self) -> None:
        """Two-stage pipelined dispatch.

        JAX dispatch is asynchronous — the jitted call returns device
        arrays immediately — but the result FETCH blocks (on this image
        ~30 ms through the relay, comparable to the compute itself). A
        single loop would serialize form→dispatch→fetch→post, capping
        throughput at batch/(compute+fetch). With ``pipeline_depth >= 2``
        the dispatch thread launches batch k+1 while a completer thread
        fetches and posts batch k.

        The dispatch slot is acquired BEFORE the batch forms: when the
        window is full, requests keep accumulating in the native queue
        and the batch closes as late (= as full) as possible. With
        ``pipeline_depth=1`` this reduces exactly to the synchronous
        form→dispatch→fetch→post loop — the right default, because
        overlap only pays when the offered concurrency exceeds the
        jitted program's batch (closed-loop clients == query_batch can
        never fill two batches at once; measured on this image: 512
        clients / batch 256 / flush 30 ms gives +8% over synchronous,
        while 256 clients with a 2 ms flush fragment into half-full
        batches and LOSE throughput). Raise the depth together with
        ``flush_us`` sized to the batch-fill time.
        """
        import queue as pyqueue

        import jax
        import jax.numpy as jnp
        from .parallel.mesh import batch_sharding
        g = self.grounder
        qb = g.query_batch
        qsharding = batch_sharding(g.mesh)
        # in-flight window: a semaphore acquired BEFORE batch formation
        # (not a bounded pipe filled after it) — when the window is full
        # there is no point closing a small batch early, so requests keep
        # accumulating in the native queue until a dispatch slot frees and
        # the batch forms at the last moment, as full as the traffic allows
        slots = threading.Semaphore(self.pipeline_depth)
        inflight: 'pyqueue.Queue' = pyqueue.Queue()
        completer_dead = threading.Event()

        def completer() -> None:
            try:
                while True:
                    item = inflight.get()
                    if item is None:
                        return
                    tickets, pred_d, score_d, n = item
                    pred = np.asarray(pred_d)[:n]
                    score = np.asarray(score_d)[:n]
                    self.queue.complete(
                        tickets, pred[:, 0].astype(np.float32),
                        pred[:, 1].astype(np.float32), score)
                    slots.release()
            except BaseException as exc:  # noqa: BLE001
                self._exc = exc
                completer_dead.set()
                self.queue.shutdown()

        comp = threading.Thread(target=completer, daemon=True,
                                name='svtsg-gateway-complete')
        comp.start()
        try:
            while True:
                while not slots.acquire(timeout=0.1):
                    if completer_dead.is_set():
                        return
                try:
                    tickets, tokens, vids = self.queue.next_batch(
                        self.max_batch, self.first_wait_us, self.flush_us)
                except GatewayClosed:
                    return
                n = tickets.shape[0]
                if n == 0:
                    slots.release()
                    continue
                # Pad to the jitted program's fixed query_batch (repeat the
                # last row — same trick as MultiQueryGrounder.ground_tokens).
                if n < qb:
                    tokens = np.concatenate(
                        [tokens, np.repeat(tokens[-1:], qb - n, axis=0)])
                    vids = np.concatenate([vids, np.repeat(vids[-1:], qb - n)])
                chunk = jax.device_put(jnp.asarray(tokens, jnp.int32),
                                       qsharding)
                if self.mode == 'bank':
                    rows = jax.device_put(jnp.asarray(vids, jnp.int32),
                                          qsharding)
                    pred, score = g._serve_multi_tokens(
                        g.model_params, g._resident_bank, g._resident_emb,
                        chunk, rows)
                else:
                    pred, score = g._serve_tokens(
                        g.model_params, g._resident_rnn0, g._resident_emb,
                        chunk)
                inflight.put((tickets, pred, score, n))
        except BaseException as exc:  # noqa: BLE001 — surfaced to clients
            self._exc = exc
            self.queue.shutdown()
        finally:
            inflight.put(None)
            comp.join(timeout=30.0)

    # -- client API --------------------------------------------------------
    def submit(self, tokens: Sequence[int], video_row: int = 0) -> int:
        if self._exc is not None:
            raise RuntimeError('gateway worker died') from self._exc
        return self.queue.submit(tokens, video_row)

    def result(self, ticket: int, timeout_s: float = 30.0
               ) -> Tuple[int, int, float]:
        out = self.queue.wait(ticket, int(timeout_s * 1e6))
        if out is None:
            if self._exc is not None:
                raise RuntimeError('gateway worker died') from self._exc
            raise TimeoutError(f'no result for ticket {ticket}')
        s, e, sc = out
        return int(s), int(e), sc

    def ground(self, tokens: Sequence[int], video_row: int = 0,
               timeout_s: float = 30.0) -> Tuple[int, int, float]:
        return self.result(self.submit(tokens, video_row), timeout_s)

    # -- raw-text API (native tokenizer, see native/tokenizer.cpp) ----------
    def submit_text(self, text: str, video_row: int = 0) -> int:
        """Tokenize a raw sentence natively and enqueue it.

        Requires a ``tokenizer`` (data.text_native.NativeTokenizer) at
        construction. Queries whose in-vocab token count exceeds the queue's
        ``max_tokens`` are truncated (pad_indices semantics); queries with
        NO in-vocab word are rejected — an all-padding query would ground
        an empty sentence, which the offline pipeline never produces.
        """
        if self.tokenizer is None:
            raise ValueError('gateway built without tokenizer= — '
                             'pass data.text_native.NativeTokenizer')
        ids, n = self.tokenizer.encode(text)
        ids = ids[:self.queue.max_tokens]
        if not ids:
            raise ValueError(f'no in-vocab words in query: {text!r}')
        del n  # truncation already applied; count kept for callers who care
        return self.submit(ids, video_row)

    def ground_text(self, text: str, video_row: int = 0,
                    timeout_s: float = 30.0) -> Tuple[int, int, float]:
        return self.result(self.submit_text(text, video_row), timeout_s)

    def stats(self) -> dict:
        return self.queue.stats()

    def close(self) -> None:
        self.queue.shutdown()
        self._worker.join(timeout=30.0)
