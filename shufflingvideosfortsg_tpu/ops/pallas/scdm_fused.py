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


def scdm_attention_fused(video_proj: jnp.ndarray, sent_proj: jnp.ndarray,
                         w: jnp.ndarray, sent_feat: jnp.ndarray,
                         block_b: int = 8,
                         interpret: bool = False) -> jnp.ndarray:
    """Drop-in for scdm_attention when B % block_b == 0 (caller falls back
    to the jnp path otherwise).

    video_proj: [B, T, Dh] (= W_a v + b); sent_proj: [B, N, Dh] (= W_s s);
    w: [Dh]; sent_feat: [B, N, Ds]. Returns C [B, T, Ds].
    """
    B, T, Dh = video_proj.shape
    N = sent_proj.shape[1]
    Ds = sent_feat.shape[-1]
    assert B % block_b == 0
    grid = (B // block_b,)
    return pl.pallas_call(
        functools.partial(_scdm_kernel, N=N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, T, Dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, N, Dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, N, Ds), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, T, Ds), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, Ds), sent_feat.dtype),
        interpret=interpret,
    )(video_proj, sent_proj, w, sent_feat)
