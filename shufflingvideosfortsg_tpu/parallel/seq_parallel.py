"""Sequence-parallel (time-sharded) BiLSTM recurrence over a device mesh.

Every model surface in this framework parallelizes over the batch/query
axis — queries, videos, and samples are independent. The one axis that is
NOT embarrassingly parallel is time inside a single video's recurrence:
an LSTM step needs step t-1's carry. This module shards the TIME axis of
one (very long) video across the mesh and runs the recurrence as a
ppermute pipeline:

- the input projection, which is per-timestep, runs fully parallel on
  every device's local time chunk (n-way speedup, inserted by XLA from
  the sharding annotations — no code here);
- the recurrence runs as a wavefront: at stage s, the device holding
  chunk s runs the FORWARD direction over its chunk while the device
  holding chunk n-1-s runs the BACKWARD direction over its own, then
  both carries hop one device over ICI (`jax.lax.ppermute`). After n
  stages both directions have swept the whole sequence; at every stage
  two devices are busy (the two directions), so the recurrence costs the
  same T steps of wall-clock as one device — sequence parallelism buys
  RESIDENCY, not recurrence latency: the raw [T, D] features, the
  [T, B, 8H] projections and the output stream live T/n per device, so a
  video's length is bounded by the MESH's memory, not one chip's.

Reference scope: the reference caps T at 128/240 frames
(grounding/dataset/charades.py:30) and has no analog; this is the
TPU-native answer to "ground against an hour-long video" — the serving
tier set_video_sharded() builds the block-0 resident recurrence this
way, then every downstream query-dependent stage (SCDM gate, block 1+,
CSMM, decode) is per-timestep or batched and stays on the existing
paths.

Numerics match the lax.scan BiLSTM exactly up to f32 reassociation
(tests/test_seq_parallel.py: 8-device pipeline == single-device scans ==
the BiLSTM module).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS


def _dir_step(w_hh_d, H, carry, x):
    """One single-direction LSTM step (gate order i, f, g, o — matches
    ops/rnn.py:_lstm_scan; f32 matmul accumulation, carry dtype kept)."""
    h, c = carry
    gates = x + jnp.dot(h, w_hh_d,
                        preferred_element_type=jnp.float32).astype(h.dtype)
    i = jax.nn.sigmoid(gates[..., :H])
    f = jax.nn.sigmoid(gates[..., H:2 * H])
    g = jnp.tanh(gates[..., 2 * H:3 * H])
    o = jax.nn.sigmoid(gates[..., 3 * H:])
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return (h, c), h


def lstm_flat_time_sharded(xw, w_hh, mesh, axis: str = DATA_AXIS):
    """Two-direction LSTM recurrence over a TIME-sharded projection.

    xw:   [T, B, 8H] flat-layout projections (+bias), BOTH halves in
          natural time order — the same layout ops/rnn.py's flat path
          feeds the Pallas kernel (fwd gates [..., :4H], bwd [..., 4H:]).
          Sharded (or shardable) over T on the mesh's ``axis``.
    w_hh: [2, H, 4H] recurrent weights (replicated).

    Returns (out [T, B, 2H] T-sharded — fwd half [..., :H], bwd
    [..., H:], both in natural time order — and the final carries
    h, c [2, B, H], replicated).
    """
    T, B, G8 = xw.shape
    H = G8 // 8
    n = mesh.shape[axis]
    if T % n:
        raise ValueError(
            f'T={T} must be a multiple of the {n}-way {axis!r} mesh axis '
            f'(pad or trim the video; zero FEATURE rows are not neutral '
            f'here because xw rows carry the bias)')

    step_fn = _dir_step

    if n == 1:
        # single-device: the pipeline degenerates to the two plain scans
        dt = xw.dtype
        zero = jnp.zeros((B, H), dt)
        step_f = functools.partial(step_fn, w_hh[0].astype(dt), H)
        step_b = functools.partial(step_fn, w_hh[1].astype(dt), H)
        (hf, cf), of = jax.lax.scan(step_f, (zero, zero), xw[..., :4 * H])
        (hb, cb), ob = jax.lax.scan(step_b, (zero, zero), xw[..., 4 * H:],
                                    reverse=True)
        return (jnp.concatenate([of, ob], axis=-1),
                jnp.stack([hf, hb]), jnp.stack([cf, cb]))

    def local(xw_loc, w):
        idx = jax.lax.axis_index(axis)
        Tc = xw_loc.shape[0]
        dt = xw_loc.dtype
        # device-constant zeros must be marked device-VARYING before they
        # carry through scans/loops whose bodies mix in per-device values
        # (shard_map's varying-manual-axes typing, jax >= 0.8)
        vary = lambda t: jax.lax.pcast(t, (axis,), to='varying')  # noqa: E731
        zero = vary(jnp.zeros((B, H), dt))
        out0 = vary(jnp.zeros((Tc, B, 2 * H), dt))
        step_f = functools.partial(step_fn, w[0].astype(dt), H)
        step_b = functools.partial(step_fn, w[1].astype(dt), H)

        def body(s, st):
            hf, cf, hb, cb, out, fin = st

            def run_f():
                (h2, c2), o = jax.lax.scan(step_f, (hf, cf),
                                           xw_loc[..., :4 * H])
                return h2, c2, out.at[..., :H].set(o)

            hf2, cf2, out2 = jax.lax.cond(idx == s, run_f,
                                          lambda: (hf, cf, out))

            def run_b():
                (h2, c2), o = jax.lax.scan(step_b, (hb, cb),
                                           xw_loc[..., 4 * H:],
                                           reverse=True)
                return h2, c2, out2.at[..., H:].set(o)

            hb2, cb2, out3 = jax.lax.cond(idx == (n - 1 - s), run_b,
                                          lambda: (hb, cb, out2))

            # whole-sequence final carries are produced by the LAST chunk
            # (fwd, at stage n-1) and the FIRST chunk (bwd, also stage
            # n-1); latch them before the carry hop overwrites the state
            f_hf, f_cf, f_hb, f_cb = fin
            last_f = jnp.logical_and(idx == s, idx == n - 1)
            first_b = jnp.logical_and(idx == n - 1 - s, idx == 0)
            fin2 = (jnp.where(last_f, hf2, f_hf),
                    jnp.where(last_f, cf2, f_cf),
                    jnp.where(first_b, hb2, f_hb),
                    jnp.where(first_b, cb2, f_cb))

            perm_r = [(i, i + 1) for i in range(n - 1)]
            perm_l = [(i + 1, i) for i in range(n - 1)]
            hf3 = jax.lax.ppermute(hf2, axis, perm_r)
            cf3 = jax.lax.ppermute(cf2, axis, perm_r)
            hb3 = jax.lax.ppermute(hb2, axis, perm_l)
            cb3 = jax.lax.ppermute(cb2, axis, perm_l)
            return hf3, cf3, hb3, cb3, out3, fin2

        st0 = (zero, zero, zero, zero, out0, (zero, zero, zero, zero))
        _, _, _, _, out, fin = jax.lax.fori_loop(0, n, body, st0)

        # replicate the final carries: only one device holds each pair
        f_hf, f_cf, f_hb, f_cb = fin
        on_last = (idx == n - 1)
        on_first = (idx == 0)
        hf_g = jax.lax.psum(jnp.where(on_last, f_hf, 0), axis)
        cf_g = jax.lax.psum(jnp.where(on_last, f_cf, 0), axis)
        hb_g = jax.lax.psum(jnp.where(on_first, f_hb, 0), axis)
        cb_g = jax.lax.psum(jnp.where(on_first, f_cb, 0), axis)
        return out, jnp.stack([hf_g, hb_g]), jnp.stack([cf_g, cb_g])

    # check_vma=False: under the vma-typed transpose (jax >= 0.8 default)
    # reverse-mode silently DROPS the replicated w_hh's cotangent
    # contributions that flow through the pipeline carries — d_xw stays
    # exact but d_whh loses the carry-path terms (measured: h/c-loss
    # d_whh ~ 0 at n=2). With the untyped transpose both gradients equal
    # the plain-scan autodiff to f32 rounding
    # (tests/test_seq_parallel.py::test_time_sharded_gradients).
    run = jax.shard_map(local, mesh=mesh,
                        in_specs=(P(axis), P()),
                        out_specs=(P(axis), P(), P()), check_vma=False)
    return run(xw, w_hh)


def bilstm_time_sharded(layer_params: Dict[str, Any], x, mesh,
                        num_layers: int, axis: str = DATA_AXIS,
                        dtype: Any = jnp.float32):
    """Multi-layer inference BiLSTM over a time-sharded [T, B, D] input.

    layer_params: a flax ops.rnn.BiLSTM param dict ('w_ih_l0' [2, D, 4H],
    'w_hh_l0' [2, H, 4H], 'b_ih_l0'/'b_hh_l0' [2, 4H], ...). The input
    projection is per-timestep, so XLA runs it n-way parallel on the
    local chunks straight from the sharding annotations; each layer's
    recurrence runs through :func:`lstm_flat_time_sharded`. No dropout
    (inference path). Returns [T, B, 2H], T-sharded.
    """
    for layer in range(num_layers):
        w_ih = jnp.asarray(layer_params[f'w_ih_l{layer}']).astype(dtype)
        w_hh = jnp.asarray(layer_params[f'w_hh_l{layer}'])
        b = (jnp.asarray(layer_params[f'b_ih_l{layer}'], jnp.float32)
             + jnp.asarray(layer_params[f'b_hh_l{layer}'], jnp.float32))
        # ONE fused [*, D] @ [D, 8H] projection per chunk — the same
        # flat-layout trick as the single-chip path (docs/KERNELS.md)
        w_cat = jnp.concatenate([w_ih[0], w_ih[1]], axis=-1)
        b_cat = jnp.concatenate([b[0], b[1]], axis=-1).astype(dtype)
        xw = jnp.einsum('tbf,fg->tbg', x.astype(dtype), w_cat,
                        preferred_element_type=jnp.float32).astype(dtype)
        xw = xw + b_cat
        x, _, _ = lstm_flat_time_sharded(xw, w_hh, mesh, axis)
    return x
