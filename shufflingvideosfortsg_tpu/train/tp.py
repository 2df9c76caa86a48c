"""Tensor-parallel GMD training: the width-scaling path.

The production GMD (H=256) fits one chip; this module makes WIDENED
variants (``video_rnn_hiddendim`` 512/1024/...) *trainable* over a
``('data', 'model')`` mesh: every video-encoder block's BiLSTM runs the
Megatron-split recurrence (parallel/tensor_parallel.bilstm_hidden_sharded
— gate-aligned column sharding, one hidden all-gather per step) and
jax.grad through the shard_map IS the TP backward — the per-step
all-gather transposes to a reduce-scatter, and each device's weight-shard
cotangents assemble into full (replicated) weight grads.

Scope (stated, also in docs/SCALING.md): the MODEL axis shards the video
recurrences' *compute and activations* — the dominant term of a widened
GMD by far (5 BiLSTM stacks; at H=1024 the video blocks are ~50x the
gate/head matmuls). The sentence encoder, SCDM gates, CSMM, TOD, and
span head stay replicated over 'model' (they parallelize over 'data'
exactly as before), and the train state (params + Adam moments) is
replicated — TP here is a compute/activation scaling axis; combine with
``--fsdp`` is rejected (the placement rules would fight) and state
sharding for >HBM *weights* is FSDP's job.

Like the GPipe path (train/pipelined.py), loss/heads are NOT duplicated:
the step plugs a TP forward into ``make_gmd_train_step``'s ``forward``
seam, reusing the exact 4-term loss assembly, and rejoins the flax model
at GMD.encode_query / GMD.forward_from_frames.

Reference scope: none — the reference is single-GPU DataParallel
(grounding/train.py:343); TPU-native beyond-parity scaling surface.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..parallel.mesh import DATA_AXIS
from ..parallel.tensor_parallel import MODEL_AXIS, bilstm_hidden_sharded


def qave_tensor_parallel(model, p: Dict[str, Any], video_feat: jnp.ndarray,
                         word_feat: jnp.ndarray, mesh: Mesh,
                         axis: str = MODEL_AXIS,
                         data_axis: str = DATA_AXIS,
                         dropout: float = 0.0,
                         dropout_key=None) -> jnp.ndarray:
    """QueryAwareEncoder forward with every block's BiLSTM hidden-sharded
    over ``axis``; the SCDM gate + LayerNorm run through the flax module
    (replicated over 'model'). Matches QueryAwareEncoder.__call__
    block-for-block (components.py:245-250)."""
    enc_p = p['video_encoder']
    residual = video_feat
    for i in range(model.nblocks):
        bp = enc_p[f'block{i}']
        if dropout_key is not None:
            dropout_key, sub = jax.random.split(dropout_key)
        else:
            sub = None
        rnn_t = bilstm_hidden_sharded(
            bp['rnn'], jnp.transpose(residual, (1, 0, 2)), mesh,
            model.video_layers, axis=axis, data_axis=data_axis,
            dtype=model.dtype, dropout=dropout, dropout_key=sub)
        rnn_out = jnp.transpose(rnn_t, (1, 0, 2))  # [B, T, 2H]
        residual = model.apply(
            {'params': p}, rnn_out, word_feat,
            method=lambda m, r, w, i=i:
                m.video_encoder.blocks[i].apply_gate(r, w))
    return model.apply({'params': p}, residual,
                       method=lambda m, r: m.video_encoder.norm(r))


def make_tp_forward(model, mesh: Mesh, axis: str = MODEL_AXIS,
                    data_axis: str = DATA_AXIS,
                    train_dropout: bool = True):
    """A GMD pair-forward with the video encoder tensor-parallel,
    matching ``make_gmd_train_step``'s ``forward`` contract."""
    H = model.video_hidden
    mp = mesh.shape[axis]
    if H % mp:
        raise ValueError(f'video_rnn_hiddendim={H} must divide the '
                         f'{mp}-way {axis!r} mesh axis')

    def forward(p, batch, pseudo, dropout_key):
        k_enc, k_head, k_sent = jax.random.split(dropout_key, 3)
        word_feat, sent_embed = model.apply(
            {'params': p}, batch['sent_feat'], deterministic=False,
            rngs={'dropout': k_sent}, method=model.encode_query)
        both_video = jnp.concatenate(
            [batch['video_feat'], pseudo['video_feat']], axis=0)
        both_words = jnp.concatenate([word_feat, word_feat], axis=0)
        both_frame = qave_tensor_parallel(
            model, p, both_video, both_words, mesh, axis=axis,
            data_axis=data_axis,
            dropout=model.dropout if train_dropout else 0.0,
            dropout_key=k_enc if train_dropout else None)
        return model.apply(
            {'params': p}, word_feat, sent_embed, both_frame,
            batch['video_mask'], pseudo['video_mask'],
            batch['temporal_labels'], batch['fore_masks'],
            batch['back_masks'], pseudo['temporal_labels'],
            pseudo['fore_masks'], pseudo['back_masks'],
            deterministic=False, rngs={'dropout': k_head},
            method=model.forward_from_frames)

    return forward


def make_gmd_tp_train_step(model, params: Dict[str, Any], mesh: Mesh,
                           lg_frame2sec: bool = False, assembler=None,
                           train_dropout: bool = True):
    """The 4-term GMD train step with the video encoder tensor-parallel.
    State stays in the ordinary sequential layout (replicated), so
    checkpoints, validation, and the test drivers are untouched."""
    from .steps import make_gmd_train_step
    forward = make_tp_forward(model, mesh, train_dropout=train_dropout)
    return make_gmd_train_step(model, params, lg_frame2sec=lg_frame2sec,
                               assembler=assembler, forward=forward)
