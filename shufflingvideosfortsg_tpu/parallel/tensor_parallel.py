"""Tensor (model) parallelism: hidden-axis-sharded BiLSTM over a 2D mesh.

The production GMD configs (H=256, D=1024) fit one chip with room to
spare, so the shipped training/serving paths use data parallelism (batch
axis), sequence parallelism (time axis — seq_parallel.py), and sharded
corpus banks (video axis). This module covers the remaining scaling
axis: the MODEL dimension, for scaled-up variants whose recurrence state
or projection weights outgrow one chip. It is the Megatron split adapted
to a gated recurrence:

- Mesh: 2D ``('data', 'model')`` (:func:`create_tp_mesh`). Batch shards
  over 'data' exactly as everywhere else; weights shard over 'model'.
- Column parallelism with GATE-ALIGNED shards: a plain split of the
  ``[D, 4H]`` projection's last axis would slice across cuDNN's
  i|f|g|o gate blocks, so the 4H axis is first permuted to shard-major
  order (:func:`_perm_cols`: shard k holds the k-th H/n slice of EVERY
  gate). Each device then computes its gates, its cell-state shard, and
  its hidden shard with purely local elementwise work.
- The one unavoidable collective: the recurrent matmul contracts over
  the FULL hidden vector, so each step all-gathers ``h`` ([2, B, H/n]
  -> [2, B, H] over 'model', natural order by construction) before the
  local ``[2, B, H] @ [2, H, 4H/n]`` dot. That is the textbook
  sequence-level TP trade (all-gather bytes ~ B*H per step, vs weight
  FLOPs/device cut n-way) and rides ICI on a real slice.
- Layer boundaries all-gather the [T, B, 2H] activations back to
  replicated-over-'model' (cheap next to the T per-step gathers; keeps
  every layer's input layout identical, so depth composes trivially).

Numerics equal ops.rnn.BiLSTM exactly up to f32 reassociation of the
split contractions (tests/test_tensor_parallel.py: 8-way model mesh and
2x4 data-x-model mesh == the lax.scan module).

Reference scope: none — the reference is single-GPU DataParallel
(grounding/train.py:343); this is TPU-native beyond-parity scaling
surface, same category as seq_parallel.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS

MODEL_AXIS = 'model'


def create_tp_mesh(dp: int, mp: int, devices=None) -> Mesh:
    """2D ``(data=dp, model=mp)`` mesh. On a real slice, lay 'model'
    innermost so the per-step all-gathers ride the fastest ICI ring —
    jax.devices() order already walks neighbors first."""
    devices = devices if devices is not None else jax.devices()
    n = dp * mp
    if len(devices) < n:
        raise ValueError(f'need {n} devices, have {len(devices)}')
    return Mesh(np.asarray(devices[:n]).reshape(dp, mp),
                (DATA_AXIS, MODEL_AXIS))


def _perm_cols(w: jnp.ndarray, H: int, n: int, gates: int = 4
               ) -> jnp.ndarray:
    """Permute a ``[..., gates*H]`` gate-blocked axis to SHARD-major order
    so a plain n-way split of the last axis hands shard k the k-th H/n
    slice of every gate: ``new[k*gates*Hs + g*Hs + j] = old[g*H + k*Hs
    + j]``."""
    Hs = H // n
    parts = [w[..., g * H + k * Hs: g * H + (k + 1) * Hs]
             for k in range(n) for g in range(gates)]
    return jnp.concatenate(parts, axis=-1)


def bilstm_hidden_sharded(layer_params: Dict[str, Any], x: jnp.ndarray,
                          mesh: Mesh, num_layers: int,
                          axis: str = MODEL_AXIS,
                          data_axis: Optional[str] = DATA_AXIS,
                          dtype: Any = jnp.float32,
                          dropout: float = 0.0,
                          dropout_key=None) -> jnp.ndarray:
    """Multi-layer BiLSTM with hidden axis sharded over ``axis``.

    layer_params: a flax ops.rnn.BiLSTM param dict ('w_ih_l0' [2, D, 4H],
    'w_hh_l0' [2, H, 4H], 'b_ih_l0'/'b_hh_l0' [2, 4H], ...). x is
    [T, B, D], sharded over B on ``data_axis`` (pass None for a pure
    model-parallel 1D mesh) and replicated over ``axis``. Returns
    [T, B, 2H] with the same layout.

    ``dropout``/``dropout_key``: torch-semantics inter-layer dropout
    (each layer's output except the last, ops/rnn.py:251-253) applied at
    the replicated layer boundary — mask draws use a different key
    stream than the flax module's, so a dropout>0 TP run matches the
    unsharded module in distribution, not bitwise (dropout=0 matches to
    f32 reassociation; tests/test_tensor_parallel.py).
    """
    n = mesh.shape[axis]
    bspec = P(None, data_axis, None)

    for layer in range(num_layers):
        w_ih = jnp.asarray(layer_params[f'w_ih_l{layer}'])
        w_hh = jnp.asarray(layer_params[f'w_hh_l{layer}'])
        b = (jnp.asarray(layer_params[f'b_ih_l{layer}'], jnp.float32)
             + jnp.asarray(layer_params[f'b_hh_l{layer}'], jnp.float32))
        H = w_hh.shape[1]
        if H % n:
            raise ValueError(
                f'hidden size {H} must divide the {n}-way {axis!r} axis')
        Hs = H // n
        w_ih_p = _perm_cols(w_ih, H, n).astype(dtype)
        w_hh_p = _perm_cols(w_hh, H, n).astype(dtype)
        b_p = _perm_cols(b, H, n).astype(dtype)

        def local(x_loc, w_ih_k, w_hh_k, b_k):
            # column-parallel projection: all T steps, both directions,
            # this device's gate shard only ([*, D] @ [D, 4Hs])
            both = jnp.stack([x_loc, x_loc[::-1]], 0)  # [2, T, B, D]
            xw = jnp.einsum('dtbf,dfg->tdbg', both.astype(dtype), w_ih_k,
                            preferred_element_type=jnp.float32
                            ).astype(dtype)
            xw = xw + b_k[:, None, :]
            Bl = x_loc.shape[1]
            # device-constant zeros must be marked device-VARYING before
            # carrying through a scan whose body mixes per-device values
            # (shard_map's varying-manual-axes typing, jax >= 0.8)
            vaxes = (axis,) if data_axis is None else (axis, data_axis)
            zero = jax.lax.pcast(jnp.zeros((2, Bl, Hs), dtype),
                                 vaxes, to='varying')

            def step(carry, xw_t):
                h_k, c_k = carry
                # the ONE collective of the recurrence: the full hidden
                # vector for the [H, 4Hs] local contraction
                h_full = jax.lax.all_gather(h_k, axis, axis=2, tiled=True)
                gates = xw_t + jnp.einsum(
                    'dbh,dhg->dbg', h_full, w_hh_k,
                    preferred_element_type=jnp.float32).astype(dtype)
                i = jax.nn.sigmoid(gates[..., :Hs])
                f = jax.nn.sigmoid(gates[..., Hs:2 * Hs])
                g = jnp.tanh(gates[..., 2 * Hs:3 * Hs])
                o = jax.nn.sigmoid(gates[..., 3 * Hs:])
                c_k = f * c_k + i * g
                h_k = o * jnp.tanh(c_k)
                return (h_k, c_k), h_k

            _, out = jax.lax.scan(step, (zero, zero), xw)  # [T, 2, B, Hs]

            # replicate via scatter+psum (psum output is typed INVARIANT
            # over the axis, which all_gather's is not — required for the
            # replicated out_spec); XLA lowers this to an all-gather
            idx = jax.lax.axis_index(axis)

            def repl(local_slice):
                full = jnp.zeros(local_slice.shape[:-1] + (H,), dtype)
                full = jax.lax.dynamic_update_slice_in_dim(
                    full, local_slice, idx * Hs, axis=-1)
                return jax.lax.psum(full, axis)

            fwd = repl(out[:, 0])
            bwd = repl(out[:, 1][::-1])
            return jnp.concatenate([fwd, bwd], axis=-1)  # [T, B, 2H]

        run = jax.shard_map(
            local, mesh=mesh,
            in_specs=(bspec, P(None, None, axis), P(None, None, axis),
                      P(None, axis)),
            out_specs=bspec)
        x = run(x, w_ih_p, w_hh_p, b_p)
        if dropout > 0.0 and dropout_key is not None \
                and layer + 1 < num_layers:
            dropout_key, sub = jax.random.split(dropout_key)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, x.shape)
            x = jnp.where(keep, x / (1.0 - dropout),
                          jnp.zeros((), x.dtype))
    return x
