"""Fused SCDM additive attention as a Pallas TPU kernel.

XLA materializes the [B, T, N, Dh] broadcast-tanh tensor (≈1GB in bf16 at
the eval configuration) as the matmul operand, costing ~2.6ms per call in
pure HBM traffic. This kernel keeps the [Bb, T, Dh] activation tile in
VMEM, loops the N word slots statically (N is 15/25), reduces against
``w`` on the VPU, and finishes with the [Bb,T,N] x [Bb,N,Ds] context
matmul on the MXU — the big intermediate never exists.

Semantics identical to ops/attention.py::scdm_attention (softmax over all
N slots, padded words included, f32 softmax).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..attention import scdm_attention


def _scdm_kernel(vp_ref, sp_ref, w_ref, sf_ref, out_ref, *, N: int):
    wa = vp_ref[:]  # [Bb, T, Dh]
    w = w_ref[:].reshape(1, 1, -1)
    cols = []
    for n in range(N):  # static loop over word slots
        act = jnp.tanh(wa + sp_ref[:, n:n + 1, :])
        cols.append(jnp.sum(act * w, axis=-1))  # [Bb, T]
    logits = jnp.stack(cols, axis=-1).astype(jnp.float32)  # [Bb, T, N]
    P = jax.nn.softmax(logits, axis=-1).astype(sf_ref.dtype)
    C = jax.lax.dot_general(
        P, sf_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out_ref[:] = C.astype(out_ref.dtype)


def _largest_divisor_leq(n: int, cap: int) -> int:
    """Largest divisor of n that is <= cap AND sublane-aligned (multiple
    of 8), since the tile's second-to-last dim must divide by 8; falls
    back to n itself (full-T block) when none exists."""
    for d in range(min(n, cap), 0, -1):
        if n % d == 0 and d % 8 == 0:
            return d
    return n


def scdm_attention_fused(video_proj: jnp.ndarray, sent_proj: jnp.ndarray,
                         w: jnp.ndarray, sent_feat: jnp.ndarray,
                         block_b: int = 8, block_t: int = 128,
                         interpret: bool = False) -> jnp.ndarray:
    """Drop-in for scdm_attention when B % block_b == 0 (caller falls back
    to the jnp path otherwise).

    video_proj: [B, T, Dh] (= W_a v + b); sent_proj: [B, N, Dh] (= W_s s);
    w: [Dh]; sent_feat: [B, N, Ds]. Returns C [B, T, Ds].

    The grid tiles both batch and time (the word softmax is per (b, t), so
    time tiling is exact); long serving videos (T in the thousands) stay
    within VMEM.
    """
    B, T, Dh = video_proj.shape
    N = sent_proj.shape[1]
    Ds = sent_feat.shape[-1]
    assert B % block_b == 0
    # keep w >= 2-D: a 1-D operand picks up a leading batch axis under
    # jax.vmap (the multi-seed trainer vmaps this whole kernel over the
    # seed axis) and the resulting [S, Dh] block (Squeezed, Dh) violates
    # the Mosaic (8, 128)-tiling rule; [1, Dh] batches to a valid
    # [S, 1, Dh] block instead
    w = w.reshape(1, -1)
    # the statically-unrolled N-loop keeps several [bb, bt, Dh] activation
    # temporaries live on the kernel stack; halve the time tile for f32 so
    # the scoped-VMEM total stays under the 16MB budget
    if jnp.dtype(video_proj.dtype).itemsize > 2:
        block_t = min(block_t, 64)
    bt = _largest_divisor_leq(T, block_t)
    grid = (B // block_b, T // bt)
    return pl.pallas_call(
        functools.partial(_scdm_kernel, N=N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, bt, Dh), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, N, Dh), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, N, Ds), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, bt, Ds), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, Ds), sent_feat.dtype),
        interpret=interpret,
    )(video_proj, sent_proj, w, sent_feat)


@jax.custom_vjp
def scdm_attention_fused_trainable(video_proj, sent_proj, w, sent_feat):
    """Differentiable variant: Pallas forward, XLA backward.

    The backward re-derives gradients through the jnp formulation (training
    batches are small, so the materialized intermediate is cheap there); the
    expensive forward stays fused."""
    return scdm_attention_fused(video_proj, sent_proj, w, sent_feat)


def _scdm_fwd(video_proj, sent_proj, w, sent_feat):
    out = scdm_attention_fused(video_proj, sent_proj, w, sent_feat)
    return out, (video_proj, sent_proj, w, sent_feat)


def _scdm_bwd(residuals, g):
    _, vjp = jax.vjp(scdm_attention, *residuals)
    return vjp(g)


scdm_attention_fused_trainable.defvjp(_scdm_fwd, _scdm_bwd)
