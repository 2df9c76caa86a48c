"""Pipeline parallelism: GPipe microbatch schedule over QAVE block stacks.

The production GMD configs are 2 recalibration blocks deep
(grounding/model/components/VideoEncoder.py:76-114 — nblocks=2), which
fits one chip; the shipped paths therefore use data parallelism. This
module covers the DEPTH scaling axis for deepened model variants
(nblocks ≫ 2): the homogeneous tail of the QAVE stack (blocks 1..k —
every one maps [B, T, 2H] -> [B, T, 2H] with identically-shaped
parameters; only block 0's input dim differs, Dv=1024) is sharded one
block-group per device over a ``'pipe'`` mesh axis and driven with the
classic GPipe microbatch schedule:

- stage weights live ONLY on their stage's devices (the stacked
  [n_stages, ...] parameter tree is sharded ``P('pipe')`` — per-device
  parameter residency is 1/n of the tail, which is the whole point of
  pipeline parallelism);
- the batch splits into ``n_micro`` microbatches that ripple through
  the stages: at tick t, stage s runs microbatch t-s. Activations (and
  each microbatch's word features, which ride along because every
  stage's SCDM gate needs them) hop one device per tick via
  ``jax.lax.ppermute`` — a neighbor-to-neighbor ICI transfer;
- the schedule costs the standard (n_stages - 1) bubble ticks out of
  (n_micro + n_stages - 1); efficiency = n_micro / that, so callers
  pick n_micro ≥ ~4·n_stages in real deployments;
- batch parallelism composes orthogonally: on a 2D ('data', 'pipe')
  mesh the batch axis shards over 'data' exactly as everywhere else.

Numerics equal running the same blocks sequentially through the flax
modules (tests/test_pipeline_parallel.py: 1×8 pipe mesh and 2×4
data×pipe mesh == the QueryAwareEncoder tail loop).

Reference scope: none — the reference is single-GPU DataParallel
(grounding/train.py:343) and its deepest stack is 2 blocks; this is
TPU-native beyond-parity scaling surface, same category as
seq_parallel.py / tensor_parallel.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS

PIPE_AXIS = 'pipe'


def create_pp_mesh(dp: int, pp: int, devices=None) -> Mesh:
    """2D ``(data=dp, pipe=pp)`` mesh. 'pipe' innermost so the per-tick
    activation hops ride neighbor ICI links."""
    devices = devices if devices is not None else jax.devices()
    n = dp * pp
    if len(devices) < n:
        raise ValueError(f'need {n} devices, have {len(devices)}')
    return Mesh(np.asarray(devices[:n]).reshape(dp, pp),
                (DATA_AXIS, PIPE_AXIS))


def stack_stage_params(block_params: Sequence[Dict[str, Any]],
                       mesh: Optional[Mesh] = None,
                       axis: str = PIPE_AXIS):
    """Stack per-block parameter pytrees along a new leading stage axis.

    All blocks must be shape-homogeneous (true for QAVE blocks 1..k,
    whose input dim equals their output dim 2H). Pass ``mesh`` to also
    commit the stack to its stage devices (``P(axis)`` on the leading
    axis) — do this OUTSIDE the jitted step: stage weights should LIVE
    sharded between steps, and a stack traced inside jit materializes
    as one GSPMD all-to-all per leaf on every call."""
    first = jax.tree.structure(block_params[0])
    for p in block_params[1:]:
        if jax.tree.structure(p) != first:
            raise ValueError('pipeline stages must share a param treedef')
    try:
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *block_params)
    except (TypeError, ValueError) as e:
        raise ValueError(
            f'pipeline stages must be shape-homogeneous: {e}') from e
    if mesh is not None:
        from jax.sharding import NamedSharding
        stacked = jax.device_put(
            stacked, NamedSharding(mesh, P(axis)))
    return stacked


def pipeline_blocks(stacked_params, block_module, x: jnp.ndarray,
                    word_feat: jnp.ndarray, mesh: Mesh, n_micro: int,
                    axis: str = PIPE_AXIS,
                    data_axis: Optional[str] = DATA_AXIS,
                    dropout_key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Run ``n_stages`` homogeneous blocks as a GPipe microbatch pipeline.

    stacked_params: block param pytree stacked [n_stages, ...], sharded
    over ``axis`` (one stage per device group). block_module: a flax
    module whose ``apply({'params': p}, x_mb, word_mb)`` maps
    [Bm, T, C] -> [Bm, T, C] (e.g. RNNRecalibrationLayer). x: [B, T, C]
    batch-sharded over ``data_axis`` (None for a pure 1D pipe mesh).
    word_feat: [B, N, Ds], same batch sharding — it travels through the
    pipeline with its microbatch because every stage's gate consumes it.

    ``dropout_key`` turns training dropout on: every (stage, tick) pair
    folds an independent key, so each microbatch draws its own masks at
    each stage (the sequential stack draws ONE mask per stage for the
    whole batch — distributionally equivalent, not bitwise; certify
    schedule numerics with dropout off).
    """
    n_stages = mesh.shape[axis]
    lead = jax.tree.leaves(stacked_params)[0].shape[0]
    if lead != n_stages:
        raise ValueError(f'stacked params have {lead} stages but the '
                         f'{axis!r} mesh axis is {n_stages}-way')

    bspec = P(data_axis)
    pspec = jax.tree.map(lambda _: P(axis), stacked_params)

    def local(p_loc, x_loc, w_loc):
        # p_loc leaves are [1, ...] (this device's stage); squeeze them
        p = jax.tree.map(lambda a: a[0], p_loc)
        B_loc = x_loc.shape[0]
        if B_loc % n_micro:
            raise ValueError(f'local batch {B_loc} must divide into '
                             f'{n_micro} microbatches')
        Bm = B_loc // n_micro
        mb_x = x_loc.reshape((n_micro, Bm) + x_loc.shape[1:])
        mb_w = w_loc.reshape((n_micro, Bm) + w_loc.shape[1:])
        bubble = n_stages - 1
        pad = lambda a: jnp.concatenate(  # noqa: E731
            [a, jnp.zeros((bubble,) + a.shape[1:], a.dtype)], 0)
        idx = jax.lax.axis_index(axis)
        on_first, on_last = idx == 0, idx == n_stages - 1
        perm_r = [(i, i + 1) for i in range(n_stages - 1)]
        k_stage = dropout_key
        if k_stage is not None:
            # fold EVERY mesh axis: stage identity (pipe) AND the batch
            # shard (data), else data shards of a stage draw identical
            # masks on a 2D data x pipe mesh
            for ax in ((axis,) if data_axis is None else (data_axis, axis)):
                k_stage = jax.random.fold_in(
                    k_stage, jax.lax.axis_index(ax))

        def tick(carry, xs_t):
            buf_x, buf_w = carry
            in_x, in_w, t = xs_t
            # stage 0 ingests the next microbatch; stages 1.. consume
            # what hopped in from the left at the end of the last tick
            bx = jnp.where(on_first, in_x, buf_x)
            bw = jnp.where(on_first, in_w, buf_w)
            if k_stage is None:
                y = block_module.apply({'params': p}, bx, bw)
            else:
                y = block_module.apply(
                    {'params': p}, bx, bw, False,
                    rngs={'dropout': jax.random.fold_in(k_stage, t)})
            # the last stage's result is microbatch t-(n_stages-1);
            # replicate it over the pipe axis so every device's output
            # stream is the finished sequence (bubble ticks emit junk
            # that the caller's slice below drops)
            out_t = jax.lax.psum(jnp.where(on_last, y, 0.0), axis)
            buf_x = jax.lax.ppermute(y, axis, perm_r)
            buf_w = jax.lax.ppermute(bw, axis, perm_r)
            return (buf_x, buf_w), out_t

        zx = jnp.zeros((Bm,) + x_loc.shape[1:], x_loc.dtype)
        zw = jnp.zeros((Bm,) + w_loc.shape[1:], w_loc.dtype)
        ticks = jnp.arange(n_micro + bubble, dtype=jnp.int32)
        _, ys = jax.lax.scan(tick, (zx, zw),
                             (pad(mb_x), pad(mb_w), ticks))
        return ys[bubble:].reshape(x_loc.shape)

    run = jax.shard_map(local, mesh=mesh,
                        in_specs=(pspec, bspec, bspec),
                        out_specs=bspec,
                        # the flax block builds device-constant zeros
                        # (h0/c0) inside its scan; skip the varying-
                        # manual-axes check rather than pcast inside
                        # third-party module code
                        check_vma=False)
    return run(stacked_params, x, word_feat)


def qave_pipelined(enc_params: Dict[str, Any], stacked_params,
                   video_feat: jnp.ndarray, word_feat: jnp.ndarray,
                   mesh: Mesh, *,
                   hidden_dim: int, n_layers: int, nblocks: int,
                   n_micro: int, ca_activ: str = 'sigmoid',
                   axis: str = PIPE_AXIS,
                   data_axis: Optional[str] = DATA_AXIS,
                   dtype: Any = jnp.float32, dropout: float = 0.0,
                   dropout_key: Optional[jax.Array] = None) -> jnp.ndarray:
    """Full QueryAwareEncoder with blocks 1..nblocks-1 pipelined.

    enc_params: a QueryAwareEncoder param dict ('block0'..'block{k}',
    'norm') — block0/norm weights are read from it. stacked_params:
    the tail blocks stacked by :func:`stack_stage_params` (with
    ``mesh``, outside the jitted step, so the stage weights arrive
    already pipe-resident). Block 0 (whose input dim Dv differs from
    the tail) runs batch-parallel over every mesh axis; the homogeneous
    tail pipelines over ``axis``; the final LayerNorm is elementwise.
    Matches QueryAwareEncoder.__call__ numerics with dropout off
    (``dropout_key=None``); pass a key to train with the module's
    inter-layer LSTM dropout active (``dropout`` field), drawn
    independently per device shard / stage / microbatch.
    """
    from ..models.components import LayerNorm, RNNRecalibrationLayer

    n_stages = mesh.shape[axis]
    if nblocks - 1 != n_stages:
        raise ValueError(f'nblocks={nblocks} needs a {nblocks - 1}-way '
                         f'{axis!r} mesh axis (got {n_stages})')
    block = RNNRecalibrationLayer(hidden_dim, n_layers, ca_activ,
                                  dropout=dropout, dtype=dtype)
    # block 0 is embarrassingly batch-parallel: run it under an explicit
    # shard_map with the batch split over EVERY mesh axis (all devices
    # busy) rather than letting GSPMD auto-partition the flax apply —
    # unannotated, the partitioner reshards the recurrence carry every
    # scan step (hundreds of all-to-alls in the compiled module)
    b0_axes = (axis,) if data_axis is None else (data_axis, axis)
    b0_spec = P(b0_axes)

    def b0(p, v, w):
        if dropout_key is None:
            return block.apply({'params': p}, v, w)
        k = dropout_key
        for ax in b0_axes:  # independent masks per batch shard
            k = jax.random.fold_in(k, jax.lax.axis_index(ax))
        return block.apply({'params': p}, v, w, False,
                           rngs={'dropout': k})

    run0 = jax.shard_map(
        b0, mesh=mesh, in_specs=(P(), b0_spec, b0_spec),
        out_specs=b0_spec, check_vma=False)
    residual = run0(enc_params['block0'], video_feat, word_feat)
    tail_key = (None if dropout_key is None
                else jax.random.fold_in(dropout_key, 1))
    residual = pipeline_blocks(stacked_params, block, residual, word_feat,
                               mesh, n_micro, axis=axis,
                               data_axis=data_axis, dropout_key=tail_key)
    norm = LayerNorm(dtype=dtype)
    return norm.apply({'params': enc_params['norm']}, residual)
