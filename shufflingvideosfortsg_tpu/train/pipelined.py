"""Pipeline-parallel GMD training: the deepened-QAVE depth-scaling path.

The production GMD is 2 recalibration blocks deep (reference
grounding/model/components/VideoEncoder.py:76-114, nblocks=2) and fits one
chip; this module makes DEEPENED variants (nblocks = pipeline_stages + 1)
*trainable* over a ``('data', 'pipe')`` mesh: the homogeneous QAVE tail
runs the GPipe microbatch schedule (parallel/pipeline.py) inside the
jitted train step, and jax.grad through the tick scan IS the GPipe
backward schedule — the scan reverses, microbatch cotangents ripple
right-to-left through the transposed ppermute, and each stage's weight
gradient accumulates across its microbatches on its own devices.

Layouts: the train state keeps the tail STACKED ([n_stages, ...] leaves,
sharded P('pipe') so each stage's weights and Adam moments live only on
its stage devices); everything else is replicated. Checkpoints convert to
the sequential block1..k layout (:func:`unstack_encoder_tail`) so the
unchanged test/valid drivers — and the reference ``.ckp`` exporter —
consume pipelined runs directly.

Loss/heads are NOT duplicated: the step plugs a pipelined forward into
``make_gmd_train_step``'s ``forward`` seam, reusing the exact 4-term loss
assembly, and rejoins the flax model at GMD.encode_query /
GMD.forward_from_frames.

Reference scope: none — the reference is single-GPU DataParallel
(grounding/train.py:343) and its deepest stack is 2 blocks.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS
from ..parallel.pipeline import (PIPE_AXIS, qave_pipelined,
                                 stack_stage_params)


def stack_encoder_tail(params: Dict[str, Any], nblocks: int,
                       mesh: Optional[Mesh] = None,
                       axis: str = PIPE_AXIS) -> Dict[str, Any]:
    """Sequential GMD param tree -> pipelined layout: video_encoder
    blocks 1..nblocks-1 replaced by one stacked ``tail`` subtree
    ([n_stages, ...] leaves, committed to ``P(axis)`` when a mesh is
    given so stage weights LIVE on their stage devices between steps)."""
    enc = dict(params['video_encoder'])
    blocks = [enc.pop(f'block{i}') for i in range(1, nblocks)]
    enc['tail'] = stack_stage_params(blocks, mesh=mesh, axis=axis)
    return {**params, 'video_encoder': enc}


def unstack_encoder_tail(params: Dict[str, Any]) -> Dict[str, Any]:
    """Pipelined layout -> sequential block1..k layout (for checkpoints,
    validation through the plain flax model, and reference export)."""
    enc = dict(params['video_encoder'])
    tail = enc.pop('tail')
    n = jax.tree.leaves(tail)[0].shape[0]
    for i in range(n):
        enc[f'block{i + 1}'] = jax.tree.map(lambda a, i=i: a[i], tail)
    return {**params, 'video_encoder': enc}


def _map_param_trees(node, fn):
    """Apply ``fn`` to every params-shaped dict inside an arbitrary
    optax/TrainState container (the Adam mu/nu trees mirror the params
    tree, so layout conversions must reach them too)."""
    if isinstance(node, dict):
        if 'video_encoder' in node and isinstance(node['video_encoder'],
                                                  dict):
            return fn(node)
        return {k: _map_param_trees(v, fn) for k, v in node.items()}
    if isinstance(node, tuple):
        vals = [_map_param_trees(v, fn) for v in node]
        return type(node)(*vals) if hasattr(node, '_fields') \
            else tuple(vals)
    if isinstance(node, list):
        return [_map_param_trees(v, fn) for v in node]
    return node


def to_pipelined_state(state, nblocks: int, mesh: Mesh,
                       axis: str = PIPE_AXIS):
    """Sequential-layout TrainState -> pipelined: stack the encoder tail
    in params AND optimizer moments, commit tail leaves to P(axis) and
    everything else replicated."""
    stage = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def stack(tree):
        return stack_encoder_tail(tree, nblocks)

    params = _map_param_trees(state.params, stack)
    opt_state = _map_param_trees(state.opt_state, stack)

    def place(path, leaf):
        on_tail = any(getattr(k, 'key', None) == 'tail' for k in path)
        return jax.device_put(leaf, stage if on_tail else repl)

    return state.replace(
        params=jax.tree_util.tree_map_with_path(place, params),
        opt_state=jax.tree_util.tree_map_with_path(place, opt_state),
        step=jax.device_put(state.step, repl))


def to_sequential_state(state):
    """Pipelined TrainState -> sequential layout (for checkpoints and
    the unchanged valid/test drivers)."""
    def unstack(tree):
        if 'tail' in tree.get('video_encoder', {}):
            return unstack_encoder_tail(tree)
        return tree
    return state.replace(
        params=_map_param_trees(state.params, unstack),
        opt_state=_map_param_trees(state.opt_state, unstack))


def is_pipelined_tree(params) -> bool:
    return isinstance(params, dict) and \
        'tail' in params.get('video_encoder', {})


def pipelined_state_constrainer(mesh: Mesh, axis: str = PIPE_AXIS):
    """Re-pin the pipelined placement after each optimizer update:
    ``video_encoder/tail`` leaves stay P(axis)-sharded (params AND their
    Adam moments), everything else replicated — the GPipe analog of the
    FSDP constrainer."""
    stage = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def pin_tree(tree):
        def pin(path, leaf):
            on_tail = any(getattr(k, 'key', None) == 'tail' for k in path)
            return jax.lax.with_sharding_constraint(
                leaf, stage if on_tail else repl)
        return jax.tree_util.tree_map_with_path(pin, tree)

    def constrain(state):
        return state.replace(params=pin_tree(state.params),
                             opt_state=pin_tree(state.opt_state))

    return constrain


def make_pipelined_forward(model, mesh: Mesh, n_micro: int,
                           data_axis: Optional[str] = DATA_AXIS,
                           axis: str = PIPE_AXIS,
                           train_dropout: bool = True):
    """A GMD pair-forward with the QAVE tail pipelined, matching
    ``make_gmd_train_step``'s ``forward`` contract. ``p`` must be in the
    stacked layout (:func:`stack_encoder_tail`)."""
    nblocks = model.nblocks
    if nblocks - 1 != mesh.shape[axis]:
        raise ValueError(f'nblocks={nblocks} needs a {nblocks - 1}-way '
                         f'{axis!r} mesh axis (got {mesh.shape[axis]})')

    def forward(p, batch, pseudo, dropout_key):
        k_enc, k_head, k_sent = jax.random.split(dropout_key, 3)
        word_feat, sent_embed = model.apply(
            {'params': p}, batch['sent_feat'], deterministic=False,
            rngs={'dropout': k_sent}, method=model.encode_query)
        both_video = jnp.concatenate(
            [batch['video_feat'], pseudo['video_feat']], axis=0)
        both_words = jnp.concatenate([word_feat, word_feat], axis=0)
        both_frame = qave_pipelined(
            p['video_encoder'], p['video_encoder']['tail'],
            both_video, both_words, mesh,
            hidden_dim=model.video_hidden, n_layers=model.video_layers,
            nblocks=nblocks, n_micro=n_micro, axis=axis,
            data_axis=data_axis, dtype=model.dtype,
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


def make_gmd_pipelined_train_step(model, params: Dict[str, Any],
                                  mesh: Mesh, n_micro: int,
                                  lg_frame2sec: bool = False,
                                  assembler=None,
                                  data_axis: Optional[str] = DATA_AXIS,
                                  train_dropout: bool = True):
    """The 4-term GMD train step with the video-encoder tail pipelined.
    State must hold :func:`stack_encoder_tail`-layout params."""
    from .steps import make_gmd_train_step
    forward = make_pipelined_forward(model, mesh, n_micro,
                                     data_axis=data_axis,
                                     train_dropout=train_dropout)
    return make_gmd_train_step(
        model, params, lg_frame2sec=lg_frame2sec, assembler=assembler,
        forward=forward,
        extra_constrain=pipelined_state_constrainer(mesh))
