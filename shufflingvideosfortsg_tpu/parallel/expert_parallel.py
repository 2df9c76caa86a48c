"""Expert parallelism: a mixture-of-experts FFN sharded over an
'expert' mesh axis with all_to_all dispatch/combine.

No MoE layer exists in the reference model family (the grounding heads
are dense MLPs — grounding/model/components/SpanPredictor.py:60-85), so
this is TPU-native beyond-parity scaling surface like seq/tensor/pipe
parallelism: the capacity axis for scaled-up variants that widen the
per-frame head by conditional computation instead of dense width. The
design is the standard GShard/Mesh-TF recipe, adapted to the per-frame
token stream of this workload ([B, T, C] fused features → B·T tokens):

- top-1 softmax router with a per-(device, expert) CAPACITY; tokens
  over capacity are dropped (contribute zero — callers wrap the layer
  with a residual, as `moe_span_head` does);
- dispatch/combine are the einsum-with-one-hot formulation, so the
  whole layer is differentiable end-to-end (the router gradient flows
  through the gate probability in the combine);
- experts shard E/n per device over the ``'expert'`` mesh axis; tokens
  shard over the same axis (each device routes its own token stripe).
  The only collectives are the two ``jax.lax.all_to_all`` transposes —
  tokens-to-experts, results-back — the canonical EP traffic pattern,
  riding ICI on a real slice;
- batch parallelism composes orthogonally on a 2D ('data', 'expert')
  mesh, with the token stripe = the local batch's frames.

Numerics equal the dense single-device oracle (:func:`moe_ffn_dense`)
exactly — same dispatch mask, same capacity drops — and so does the
gradient (tests/test_expert_parallel.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS

EXPERT_AXIS = 'expert'


def create_ep_mesh(dp: int, ep: int, devices=None) -> Mesh:
    """2D ``(data=dp, expert=ep)`` mesh; 'expert' innermost so the
    all_to_all transposes ride neighbor ICI links."""
    devices = devices if devices is not None else jax.devices()
    n = dp * ep
    if len(devices) < n:
        raise ValueError(f'need {n} devices, have {len(devices)}')
    return Mesh(np.asarray(devices[:n]).reshape(dp, ep),
                (DATA_AXIS, EXPERT_AXIS))


def init_moe_params(key, dim: int, hidden: int, n_experts: int,
                    dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Router + E two-layer tanh expert FFNs (dim -> hidden -> dim),
    matching the reference MLP head's activation family
    (grounding/model/components/SpanPredictor.py:62-68)."""
    ks = jax.random.split(key, 5)
    s1 = 1.0 / np.sqrt(dim)
    s2 = 1.0 / np.sqrt(hidden)
    return {
        'router': jax.random.uniform(ks[0], (dim, n_experts), dtype,
                                     -s1, s1),
        'w1': jax.random.uniform(ks[1], (n_experts, dim, hidden), dtype,
                                 -s1, s1),
        'b1': jnp.zeros((n_experts, hidden), dtype),
        'w2': jax.random.uniform(ks[2], (n_experts, hidden, dim), dtype,
                                 -s2, s2),
        'b2': jnp.zeros((n_experts, dim), dtype),
    }


def _route(params, x, capacity: int):
    """Top-1 routing with per-expert capacity over ONE token stripe.

    x: [S, C]. Returns (combine [S, E, cap] — gate prob at each kept
    token's slot, zero elsewhere — and dispatch = combine != 0)."""
    E = params['router'].shape[1]
    logits = jnp.dot(x, params['router'],
                     preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)                 # [S, E]
    expert = jnp.argmax(probs, axis=-1)                     # [S]
    gate = jnp.max(probs, axis=-1)                          # [S]
    onehot = jax.nn.one_hot(expert, E, dtype=jnp.float32)   # [S, E]
    # slot of each token within its expert (0-based); >= capacity drops
    pos = (jnp.cumsum(onehot, axis=0) - 1.0) * onehot       # [S, E]
    slot = jnp.sum(pos, axis=-1).astype(jnp.int32)          # [S]
    keep = slot < capacity
    slot_oh = jax.nn.one_hot(slot, capacity, dtype=jnp.float32)
    combine = (gate * keep)[:, None, None] \
        * onehot[:, :, None] * slot_oh[:, None, :]          # [S, E, cap]
    return combine


def _expert_ffn(w1, b1, w2, b2, tokens):
    """tokens [..., E_local, cap, C] through per-expert 2-layer tanh
    FFNs ([E_local, C, Hm] / [E_local, Hm, C])."""
    h = jnp.tanh(jnp.einsum('...ecd,edh->...ech', tokens, w1,
                            preferred_element_type=jnp.float32)
                 + b1[:, None, :])
    return jnp.einsum('...ech,ehd->...ecd', h, w2,
                      preferred_element_type=jnp.float32) + b2[:, None, :]


def moe_ffn_dense(params: Dict[str, jnp.ndarray], x: jnp.ndarray,
                  capacity: int) -> jnp.ndarray:
    """Single-device oracle: identical math (same capacity drops), no
    collectives. x: [S, C] -> [S, C]."""
    combine = _route(params, x, capacity)
    dispatch = (combine > 0).astype(x.dtype)
    tokens = jnp.einsum('sec,sd->ecd', dispatch, x)          # [E, cap, C]
    y = _expert_ffn(params['w1'], params['b1'], params['w2'],
                    params['b2'], tokens)
    return jnp.einsum('sec,ecd->sd', combine, y).astype(x.dtype)


def moe_ffn_sharded(params: Dict[str, jnp.ndarray], x: jnp.ndarray,
                    mesh: Mesh, capacity: int,
                    axis: str = EXPERT_AXIS,
                    data_axis: Optional[str] = DATA_AXIS) -> jnp.ndarray:
    """Expert-parallel MoE FFN. x: [S, C] tokens, sharded over ``axis``
    (and optionally a leading batch factor over ``data_axis`` — pass
    x already flattened per data shard; this function only shards S).
    Experts shard E/n over ``axis``; router weights replicate.

    Equivalent to vmapping :func:`moe_ffn_dense` over the S-stripes —
    capacity here is PER (device, expert) pair, the same quantity the
    oracle applies to its single stripe.
    """
    n = mesh.shape[axis]
    E = params['router'].shape[1]
    if E % n:
        raise ValueError(f'{E} experts must divide the {n}-way '
                         f'{axis!r} axis')
    El = E // n
    espec = {'router': P(), 'w1': P(axis), 'b1': P(axis),
             'w2': P(axis), 'b2': P(axis)}
    xspec = P(axis) if data_axis is None else P((data_axis, axis))

    def local(p, x_loc):
        combine = _route({'router': p['router']}, x_loc, capacity)
        dispatch = (combine > 0).astype(x_loc.dtype)
        tokens = jnp.einsum('sec,sd->ecd', dispatch, x_loc)  # [E, cap, C]
        # tokens-to-experts transpose: split the expert axis across
        # devices, concatenate the (implicit) source-device axis
        tokens = tokens.reshape((n, El) + tokens.shape[1:])
        tokens = jax.lax.all_to_all(tokens, axis, split_axis=0,
                                    concat_axis=0, tiled=False)
        # [n_src, El, cap, C] — this device's experts, every source
        y = _expert_ffn(p['w1'], p['b1'], p['w2'], p['b2'], tokens)
        # results-back transpose (exact inverse)
        y = jax.lax.all_to_all(y, axis, split_axis=0, concat_axis=0,
                               tiled=False)
        y = y.reshape((E,) + y.shape[2:])
        return jnp.einsum('sec,ecd->sd', combine, y).astype(x_loc.dtype)

    run = jax.shard_map(local, mesh=mesh, in_specs=(espec, xspec),
                        out_specs=xspec, check_vma=False)
    return run(params, x)


def moe_span_head(params: Dict[str, jnp.ndarray], feat: jnp.ndarray,
                  capacity: int, mesh: Optional[Mesh] = None,
                  axis: str = EXPERT_AXIS,
                  data_axis: Optional[str] = DATA_AXIS) -> jnp.ndarray:
    """Residual MoE block over per-frame fused features [B, T, C]:
    ``feat + MoE(feat)`` — dropped (over-capacity) tokens fall back to
    the identity path. With ``mesh`` the MoE runs expert-parallel;
    without, on the dense oracle."""
    B, T, C = feat.shape
    x = feat.reshape(B * T, C)
    if mesh is None:
        y = moe_ffn_dense(params, x, capacity)
    else:
        y = moe_ffn_sharded(params, x, mesh, capacity, axis=axis,
                            data_axis=data_axis)
    return feat + y.reshape(B, T, C)
