"""Multi-query grounding service: N sentences x 1 (long) video per step.

The stretch serving configuration from BASELINE.json configs[4]: a video's
features stay resident on device while query batches stream through. The
first QAVE block's recurrence is computed once per video (query-
independent) and shared across every query; queries shard over the 'data'
mesh axis for multi-chip serving.

Usage:
    grounder = MultiQueryGrounder(params, model_params)
    spans, scores = grounder.ground(video_feats_TxD, sent_feats_QxNx300)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .models import build_model
from .ops.span import span_decode, span_topk_nms
from .parallel.mesh import batch_sharding, create_mesh, replicated_sharding


def _bank_rows(bank, video_ids):
    """Per-query rows of a resident rnn0 bank.

    A plain array bank gathers directly; an int8 bank — the
    ``set_corpus(dtype='int8')`` tier, stored as (int8 values [V, T, 2H],
    f32 scales [V, T]) at half the bf16 residency — gathers both and
    dequantizes only the gathered rows on device."""
    if isinstance(bank, tuple):
        q, s = bank
        rows = jnp.take(q, video_ids, axis=0).astype(jnp.float32)
        return rows * jnp.take(s, video_ids, axis=0)[..., None]
    return jnp.take(bank, video_ids, axis=0)


class MultiQueryGrounder:
    def __init__(self, params: Dict, model_params, mesh=None,
                 query_batch: int = 256):
        self.params = params
        self.model = build_model(params, 'gmd', inference=True)
        self.mesh = mesh if mesh is not None else create_mesh(
            params.get('mesh_shape'))
        self.query_batch = query_batch
        self.model_params = jax.device_put(
            model_params, replicated_sharding(self.mesh))
        # feature-path query shipping dtype (serve_query_dtype config:
        # 'f32' | 'f16'): the feature path ships ~18 KB/query of
        # sentence features over the host link — f16 halves that (the
        # GloVe features' ~±5 range is far inside f16), and the serve
        # fns widen back to f32 on device so the model numerics are
        # untouched beyond the one rounding of the input features
        ship = str(params.get('serve_query_dtype', 'f32')).lower()
        self._ship_np = np.float16 if ship in ('f16', 'float16') \
            else np.float32
        model = self.model

        @jax.jit
        def _precompute(p, video):
            return model.apply({'params': p}, video,
                               method=model.precompute_video)

        @jax.jit
        def _serve(p, rnn0, queries):
            out = model.apply({'params': p}, rnn0,
                              queries.astype(jnp.float32),
                              method=model.serve_cached)
            pred, score = span_decode(out['start_prob'], out['end_prob'])
            return pred, score

        @jax.jit
        def _serve_tokens(p, rnn0, emb, token_ids):
            queries = jnp.take(emb, token_ids.astype(jnp.int32), axis=0)
            out = model.apply({'params': p}, rnn0, queries,
                              method=model.serve_cached)
            pred, score = span_decode(out['start_prob'], out['end_prob'])
            return pred, score

        @jax.jit
        def _serve_multi(p, bank, queries, video_ids):
            out = model.apply({'params': p}, _bank_rows(bank, video_ids),
                              queries.astype(jnp.float32),
                              method=model.serve_gathered)
            pred, score = span_decode(out['start_prob'], out['end_prob'])
            return pred, score

        @jax.jit
        def _serve_multi_tokens(p, bank, emb, token_ids, video_ids):
            queries = jnp.take(emb, token_ids.astype(jnp.int32), axis=0)
            out = model.apply({'params': p}, _bank_rows(bank, video_ids),
                              queries, method=model.serve_gathered)
            pred, score = span_decode(out['start_prob'], out['end_prob'])
            return pred, score

        self._precompute = _precompute
        self._serve = _serve
        self._serve_tokens = _serve_tokens
        self._serve_multi = _serve_multi
        self._serve_multi_tokens = _serve_multi_tokens
        self._serve_topk_cache: Dict[Tuple[int, float], Any] = {}
        self._resident_rnn0: Optional[jnp.ndarray] = None
        self._resident_bank: Optional[jnp.ndarray] = None
        self._resident_emb: Optional[jnp.ndarray] = None

    def _serve_topk_fn(self, k: int, nms_iou: float):
        """Jitted top-k serve, cached per (k, nms_iou) — k is static."""
        key = (int(k), float(nms_iou))
        if key not in self._serve_topk_cache:
            model = self.model

            @jax.jit
            def _serve_topk(p, rnn0, queries):
                out = model.apply({'params': p}, rnn0,
                                  queries.astype(jnp.float32),
                                  method=model.serve_cached)
                return span_topk_nms(out['start_prob'], out['end_prob'],
                                     key[0], iou_threshold=key[1])

            self._serve_topk_cache[key] = _serve_topk
        return self._serve_topk_cache[key]

    def set_vocab(self, embeddings: np.ndarray) -> None:
        """Pin the GloVe matrix [V_words, 300] on device so queries can be
        served as TOKEN IDS (ground_tokens): a 512-query batch then ships
        ~30 KB of int32 instead of ~9 MB of f32 features — the feature
        upload was the corpus-serving bottleneck on slow host links."""
        self._resident_emb = jax.device_put(
            jnp.asarray(embeddings, jnp.float32),
            replicated_sharding(self.mesh))

    def ground_tokens(self, token_ids: np.ndarray, video_ids: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Ground query i (token ids [Q, N], pad id 0) against resident
        bank video ``video_ids[i]``; embedding happens on device against
        the :meth:`set_vocab` matrix."""
        assert self._resident_bank is not None, 'no video bank set'
        assert self._resident_emb is not None, 'no vocab set'
        Q, qb = token_ids.shape[0], self.query_batch
        preds, scores = [], []
        qsharding = batch_sharding(self.mesh)
        for i in range(0, Q, qb):
            chunk, ids = token_ids[i:i + qb], video_ids[i:i + qb]
            n = len(chunk)
            if n < qb:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], qb - n, axis=0)], axis=0)
                ids = np.concatenate([ids, np.repeat(ids[-1:], qb - n)])
            pred, score = self._serve_multi_tokens(
                self.model_params, self._resident_bank, self._resident_emb,
                jax.device_put(jnp.asarray(chunk, jnp.int32), qsharding),
                jax.device_put(jnp.asarray(ids, jnp.int32), qsharding))
            preds.append(np.asarray(pred)[:n])
            scores.append(np.asarray(score)[:n])
        return np.concatenate(preds), np.concatenate(scores)

    def set_video(self, video_feats: np.ndarray) -> None:
        """Pin a [T, D] video on device: runs the query-independent block-0
        recurrence ONCE; every query batch reuses it."""
        video = jax.device_put(jnp.asarray(video_feats, jnp.float32)[None],
                               replicated_sharding(self.mesh))
        self._resident_rnn0 = self._precompute(self.model_params, video)

    def set_video_sharded(self, video_feats: np.ndarray) -> None:
        """Pin a VERY long [T, D] video via the sequence-parallel block-0
        recurrence: the raw features, the [T, 8H] projections and the
        recurrence output stream live T/n per device while the two
        directions pipeline across the mesh (parallel/seq_parallel.py) —
        the video's length is bounded by the MESH's memory, not one
        chip's. T must be a multiple of the mesh size. The resident rnn0
        ([T, 2H] — 4x smaller than the raw I3D features) replicates at
        the end, so every ``ground*`` path afterwards is identical to
        :meth:`set_video` (equality tested)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from .parallel.mesh import DATA_AXIS
        from .parallel.seq_parallel import bilstm_time_sharded

        mesh, model = self.mesh, self.model
        rnn_params = (self.model_params['video_encoder']['block0']['rnn'])
        x = jax.device_put(
            jnp.asarray(video_feats, jnp.float32)[:, None, :],
            NamedSharding(mesh, P(DATA_AXIS)))  # [T, 1, D] time-sharded

        @functools.partial(jax.jit,
                           out_shardings=replicated_sharding(mesh))
        def block0_sp(p, xx):
            out = bilstm_time_sharded(p, xx, mesh, model.video_layers,
                                      dtype=model.dtype)
            return jnp.transpose(out, (1, 0, 2)).astype(jnp.float32)

        self._resident_rnn0 = block0_sp(rnn_params, x)

    def set_videos(self, video_feats: np.ndarray) -> None:
        """Pin a BANK of [V, T, D] videos: one batched block-0 recurrence
        pass (the kernel sublane-pads V<8), amortizing residency across
        mixed query traffic — see :meth:`ground_bank`."""
        videos = jax.device_put(jnp.asarray(video_feats, jnp.float32),
                                replicated_sharding(self.mesh))
        self._resident_bank = self._precompute(self.model_params, videos)

    def set_corpus(self, pack, chunk_videos: int = 64,
                   shard: bool = False, dtype: str = 'raw') -> None:
        """Pin an ENTIRE feature pack's worth of videos for serving.

        Streams the pack through the query-independent block-0 recurrence
        in chunks of ``chunk_videos`` and keeps only the [V, T, 2H]
        recurrence bank resident (for Charades-CD: 1.66 GiB f32 vs the
        1.55 GiB raw f16 pack — the raw features never need to stay).
        After this, ANY (query, video) pair in the corpus grounds with
        zero per-video recurrence work — the serving path is pure
        query-dependent compute plus a bank gather. Video lookup by id
        via :meth:`ground_vids`.

        ``shard=True`` splits the bank's video axis across the mesh's
        devices instead of replicating it — for corpora larger than one
        chip's HBM. The per-query row gather then crosses ICI (XLA
        inserts the collective from the sharding annotations); queries
        stay sharded on the data axis as usual. V is zero-padded up to a
        multiple of the device count.

        ``dtype='int8'`` stores the bank as per-(video, frame) symmetric
        int8 (values + f32 scales over the 2H features): half the bf16
        residency — 2x the corpus capacity per chip — at a quantization
        error of at most amax/254 per element, comparable to bf16's own
        2^-8 relative step (block-0 outputs are tanh-bounded, so the
        frame amax is ~1). The per-query gather dequantizes on device
        (:func:`_bank_rows`).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P
        from .parallel.mesh import DATA_AXIS

        V = pack.num_videos
        sharding = replicated_sharding(self.mesh)
        ndev = self.mesh.devices.size
        V_pad = -(-V // ndev) * ndev if shard else V
        bank_sharding = NamedSharding(self.mesh, P(DATA_AXIS)) if shard \
            else sharding
        first = jax.device_put(
            jnp.asarray(pack.gather(np.arange(min(chunk_videos, V))),
                        jnp.float32), sharding)
        rnn0 = self._precompute(self.model_params, first)
        quantize = str(dtype).lower() == 'int8'
        if quantize:
            bank = (
                jax.jit(lambda: jnp.zeros((V_pad,) + rnn0.shape[1:],
                                          jnp.int8),
                        out_shardings=bank_sharding)(),
                jax.jit(lambda: jnp.zeros((V_pad,) + rnn0.shape[1:-1],
                                          jnp.float32),
                        out_shardings=bank_sharding)())
        else:
            bank = jax.jit(lambda: jnp.zeros((V_pad,) + rnn0.shape[1:],
                                             rnn0.dtype),
                           out_shardings=bank_sharding)()

        @functools.partial(jax.jit, donate_argnums=(0,))
        def write(b, chunk, at):
            if quantize:
                qb, sb = b
                chunk = chunk.astype(jnp.float32)
                amax = jnp.max(jnp.abs(chunk), axis=-1)
                scale = jnp.where(amax > 0, amax, 1.0) / 127.0
                q = jnp.clip(jnp.round(chunk / scale[..., None]),
                             -127, 127).astype(jnp.int8)
                z3 = tuple(jnp.zeros((), jnp.int32)
                           for _ in range(qb.ndim - 1))
                z2 = tuple(jnp.zeros((), jnp.int32)
                           for _ in range(sb.ndim - 1))
                return (jax.lax.dynamic_update_slice(qb, q, (at,) + z3),
                        jax.lax.dynamic_update_slice(sb, scale,
                                                     (at,) + z2))
            zeros = tuple(jnp.zeros((), jnp.int32)
                          for _ in range(b.ndim - 1))
            return jax.lax.dynamic_update_slice(b, chunk, (at,) + zeros)

        bank = write(bank, rnn0, np.int32(0))
        for i in range(chunk_videos, V, chunk_videos):
            rows = np.arange(i, min(i + chunk_videos, V))
            feats = jax.device_put(
                jnp.asarray(pack.gather(rows), jnp.float32), sharding)
            bank = write(bank, self._precompute(self.model_params, feats),
                         np.int32(i))
        self._resident_bank = tuple(bank) if quantize else bank
        self._vid_to_row = dict(pack.vid_to_row)

    def ground_vids(self, sent_feats: np.ndarray, vids) -> Tuple[np.ndarray,
                                                                 np.ndarray]:
        """Ground query i against corpus video ``vids[i]`` (string ids;
        corpus pinned by :meth:`set_corpus`)."""
        rows = np.asarray([self._vid_to_row[v] for v in vids], np.int32)
        return self.ground_bank(sent_feats, rows)

    def ground_bank(self, sent_feats: np.ndarray, video_ids: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Ground mixed traffic: query i against resident video
        ``video_ids[i]`` (bank pinned by :meth:`set_videos`)."""
        assert self._resident_bank is not None, 'no video bank set'
        Q, qb = sent_feats.shape[0], self.query_batch
        outs = []
        qsharding = batch_sharding(self.mesh)
        for i in range(0, Q, qb):
            chunk, ids = sent_feats[i:i + qb], video_ids[i:i + qb]
            n = len(chunk)
            if n < qb:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], qb - n, axis=0)], axis=0)
                ids = np.concatenate([ids, np.repeat(ids[-1:], qb - n)])
            # dispatch-only loop: device_put and the serve call are both
            # async, so chunk i+1's upload overlaps chunk i's compute
            # (double-buffered by the runtime); fetches happen after
            pred, score = self._serve_multi(
                self.model_params,
                self._resident_bank,
                jax.device_put(np.asarray(chunk, self._ship_np), qsharding),
                jax.device_put(jnp.asarray(ids, jnp.int32), qsharding))
            outs.append((n, pred, score))
        preds = [np.asarray(p)[:n] for n, p, _ in outs]
        scores = [np.asarray(s)[:n] for n, _, s in outs]
        return np.concatenate(preds), np.concatenate(scores)

    def ground(self, video_feats: Optional[np.ndarray],
               sent_feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Ground Q queries against the given (or resident) video.

        sent_feats: [Q, N, 300]. Queries are processed in device-sharded
        chunks of ``query_batch`` (padded to a full chunk; outputs
        trimmed)."""
        if video_feats is not None:
            self.set_video(video_feats)
        assert self._resident_rnn0 is not None, 'no video set'
        Q = sent_feats.shape[0]
        qb = self.query_batch
        outs = []
        qsharding = batch_sharding(self.mesh)
        for i in range(0, Q, qb):
            chunk = sent_feats[i:i + qb]
            n = len(chunk)
            if n < qb:
                pad = np.repeat(chunk[-1:], qb - n, axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            # dispatch-only loop (async upload + compute overlap; see
            # ground_bank); fetches deferred to the end
            queries = jax.device_put(np.asarray(chunk, self._ship_np),
                                     qsharding)
            pred, score = self._serve(self.model_params,
                                      self._resident_rnn0, queries)
            outs.append((n, pred, score))
        preds = [np.asarray(p)[:n] for n, p, _ in outs]
        scores = [np.asarray(s)[:n] for n, _, s in outs]
        return np.concatenate(preds), np.concatenate(scores)

    def ground_topk(self, sent_feats: np.ndarray, k: int = 5,
                    nms_iou: float = 0.5) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k NMS span proposals per query against the resident video.

        Beyond-parity multi-proposal serving: returns (spans [Q, k, 2]
        int32, scores [Q, k] f32) ordered by score; suppressed/exhausted
        tail entries repeat the last kept span with score -inf. Proposal 1
        equals :meth:`ground`'s span. The decode is the blockwise
        ``span_topk_nms`` (O(row_block·T) memory), so long resident
        videos never materialize a T×T matrix per query."""
        assert self._resident_rnn0 is not None, 'no video set'
        serve = self._serve_topk_fn(k, nms_iou)
        Q, qb = sent_feats.shape[0], self.query_batch
        outs = []
        qsharding = batch_sharding(self.mesh)
        for i in range(0, Q, qb):
            chunk = sent_feats[i:i + qb]
            n = len(chunk)
            if n < qb:
                pad = np.repeat(chunk[-1:], qb - n, axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            queries = jax.device_put(np.asarray(chunk, self._ship_np),
                                     qsharding)
            pred, score = serve(self.model_params, self._resident_rnn0,
                                queries)
            outs.append((n, pred, score))
        preds = [np.asarray(p)[:n] for n, p, _ in outs]
        scores = [np.asarray(s)[:n] for n, _, s in outs]
        return np.concatenate(preds), np.concatenate(scores)

    def ground_tokens_video(self, token_ids: np.ndarray
                            ) -> Tuple[np.ndarray, np.ndarray]:
        """Ground token-id queries [Q, N] against the resident video
        (:meth:`set_video`), embedding on device against the
        :meth:`set_vocab` matrix. The long-video analog of
        :meth:`ground_tokens`: a 256-query batch ships ~15 KB of int32
        instead of ~4.6 MB of f32 features — through a slow host link
        the feature path is transfer-bound at a third of the compute
        rate (measured: tools/profile_serving.py vs bench serve)."""
        assert self._resident_rnn0 is not None, 'no video set'
        assert self._resident_emb is not None, 'no vocab set'
        Q, qb = token_ids.shape[0], self.query_batch
        preds, scores = [], []
        qsharding = batch_sharding(self.mesh)
        for i in range(0, Q, qb):
            chunk = token_ids[i:i + qb]
            n = len(chunk)
            if n < qb:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], qb - n, axis=0)], axis=0)
            pred, score = self._serve_tokens(
                self.model_params, self._resident_rnn0,
                self._resident_emb,
                jax.device_put(jnp.asarray(chunk, jnp.int32), qsharding))
            preds.append(np.asarray(pred)[:n])
            scores.append(np.asarray(score)[:n])
        return np.concatenate(preds), np.concatenate(scores)
