"""Fused bidirectional LSTM recurrence as a Pallas TPU kernel.

The XLA lax.scan recurrence pays per-step loop/dispatch overhead (~45us
per step measured at B=512 on v5e against ~3us of MXU work), because h/c
round-trip through HBM-visible buffers and every step is a separate fusion.
This kernel runs the WHOLE T-step recurrence inside one Pallas program:

- ``w_hh`` [2, H, 4H] and the carries h/c [2, B, H] live in VMEM for the
  entire scan;
- the precomputed input projections ``xw`` [T, 2, B, 4H] stream in from HBM
  through a 3-deep async-DMA pipeline, overlapped with the gate math;
- per-step hidden states stream back to HBM from double-buffered staging
  slots (a 4-step chunked variant measured slower: the dynamic-position
  staging writes cost more than the saved DMA issues).

Measured on v5e-1 at T=128, B=512, H=256 (both directions): ~45us/step for
the XLA scan -> ~14us/step here (1.77ms per 128-step layer; ~2.6x on the
recurrence — the per-layer input projection matmul is unchanged and stays
outside in XLA).

Gate order i, f, g, o (cuDNN/torch layout), matching ops/rnn.py exactly; a
parity test pins the two implementations together. Used on the inference
path (BiLSTM(fused=True) is wired through eval/serving builds); training
keeps the lax.scan form (differentiable).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBUF = 3  # xw prefetch depth (VMEM budget: NBUF*2*B*4H*2B <= ~6MB at B=512)


def _lstm_kernel(xw_hbm, w_hh_ref, out_hbm, hc_out_ref,
                 h_ref, c_ref, xw_buf, out_buf,
                 in_sem, out_sem, T: int, CHUNK: int):
    """One program runs the full T-step recurrence for both directions.

    xw_hbm:   [T, 2, B, 4H] (ANY/HBM)  precomputed x@W_ih + b
    w_hh_ref: [2, H, 4H]    (VMEM)
    out_hbm:  [T, 2, B, H]  (ANY/HBM)  per-step hidden states
    hc_out_ref: [2, 2, B, H] (VMEM)    final (h, c)
    scratch: h/c [2, B, H] f32; xw_buf [NBUF, 2, B, 4H];
    out_buf [2, CHUNK, 2, B, H]; DMA semaphore arrays.
    """
    H = h_ref.shape[-1]
    n_chunks = T // CHUNK

    def xw_dma(slot, t):
        return pltpu.make_async_copy(xw_hbm.at[t], xw_buf.at[slot],
                                     in_sem.at[slot])

    def out_dma(cslot, chunk_idx):
        return pltpu.make_async_copy(
            out_buf.at[cslot],
            out_hbm.at[pl.ds(chunk_idx * CHUNK, CHUNK)],
            out_sem.at[cslot])

    h_ref[:] = jnp.zeros_like(h_ref)
    c_ref[:] = jnp.zeros_like(c_ref)
    for k in range(min(NBUF - 1, T)):
        xw_dma(k, k).start()

    def step(t, _):
        slot = jax.lax.rem(t, NBUF)

        @pl.when(t + NBUF - 1 < T)
        def _():
            xw_dma(jax.lax.rem(t + NBUF - 1, NBUF), t + NBUF - 1).start()

        xw_dma(slot, t).wait()

        chunk_idx = t // CHUNK
        pos = jax.lax.rem(t, CHUNK)
        cslot = jax.lax.rem(chunk_idx, 2)

        # before writing the first element of a chunk, the slot's previous
        # DMA (chunk_idx - 2) must have drained
        @pl.when((pos == 0) & (chunk_idx >= 2))
        def _():
            out_dma(cslot, chunk_idx - 2).wait()

        # both directions in one batched MXU contraction
        gates = jax.lax.dot_general(
            h_ref[:].astype(w_hh_ref.dtype), w_hh_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        gates = gates + xw_buf[slot].astype(jnp.float32)
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H:2 * H])
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H:])
        c_new = f * c_ref[:] + i * g
        h_new = o * jnp.tanh(c_new)
        h_ref[:] = h_new
        c_ref[:] = c_new
        out_buf[cslot, pos] = h_new.astype(out_buf.dtype)

        @pl.when(pos == CHUNK - 1)
        def _():
            out_dma(cslot, chunk_idx).start()

        return 0

    jax.lax.fori_loop(0, T, step, 0)
    if n_chunks >= 2:
        out_dma(jax.lax.rem(n_chunks - 2, 2), n_chunks - 2).wait()
    out_dma(jax.lax.rem(n_chunks - 1, 2), n_chunks - 1).wait()
    hc_out_ref[0] = h_ref[:]
    hc_out_ref[1] = c_ref[:]


@functools.partial(jax.jit, static_argnames=('interpret',))
def lstm_scan_pallas(xw: jnp.ndarray, w_hh: jnp.ndarray,
                     interpret: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the fused recurrence.

    xw: [T, 2, B, 4H] (input projections + bias, direction 1 already
    time-reversed; bf16 recommended — it halves the streamed bytes);
    w_hh: [2, H, 4H] (bf16 recommended). Carries accumulate in f32.
    Returns (out [T, 2, B, H] in xw.dtype, h_T [2, B, H] f32,
    c_T [2, B, H] f32).
    """
    T, two, B, H4 = xw.shape
    H = H4 // 4
    assert two == 2
    CHUNK = 1  # per-step out DMA measured faster than chunked staging
    out, hc = pl.pallas_call(
        functools.partial(_lstm_kernel, T=T, CHUNK=CHUNK),
        out_shape=(
            jax.ShapeDtypeStruct((T, 2, B, H), xw.dtype),
            jax.ShapeDtypeStruct((2, 2, B, H), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # xw stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh resident
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),           # h
            pltpu.VMEM((2, B, H), jnp.float32),           # c
            pltpu.VMEM((NBUF, 2, B, H4), xw.dtype),       # xw pipeline
            pltpu.VMEM((2, CHUNK, 2, B, H), xw.dtype),    # out chunks
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100e6)),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * 2 * B * H * 4 * H,
            bytes_accessed=xw.size * xw.dtype.itemsize * 2,
            transcendentals=T * 2 * B * 4 * H,
        ),
        interpret=interpret,
    )(xw, w_hh)
    return out, hc[0], hc[1]
