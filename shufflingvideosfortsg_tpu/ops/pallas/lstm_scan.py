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
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBUF = 3  # xw prefetch depth (VMEM budget: NBUF*2*B*4H*2B <= ~6MB at B=512)


def _seq_vmap(impl, **static_kwargs):
    """Make a manual-DMA pallas_call entry point vmap-safe.

    ``jax.vmap`` over a pallas_call normally batches by adding a grid
    dimension, but Mosaic rejects the resulting non-trivial index maps
    on ANY-memory-space (HBM) operands — exactly what these kernels use
    for their streamed sequences. The multi-seed trainer
    (train/multiseed.py) vmaps the whole train step over a stacked seed
    axis, so without this every LSTM call under multi-seed fails to
    lower on TPU.

    ``sequential_vmap`` replaces that batching rule with a ``lax.map``
    over the un-batched kernel: each seed runs the full fused kernel,
    one after another, inside the one jitted step. AD never reaches
    these wrappers (``lstm_flat_fused``'s custom_vjp intercepts above
    them), so custom_vmap's no-differentiation limitation is moot.

    One wrapper per static-flag combination is built at import (the
    flags select distinct traced programs).
    """
    return custom_batching.sequential_vmap(
        functools.partial(impl, **static_kwargs))


def _lstm_kernel(xw_hbm, w_hh_ref, out_hbm, hc_out_ref,
                 h_ref, c_ref, xw_buf, out_buf,
                 in_sem, out_sem, T: int, CHUNK: int,
                 gates_bf16: bool = False):
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
        if gates_bf16:
            # run the VPU transcendentals at half width; the cell-state
            # accumulation stays f32. Mosaic rejects jax.nn.sigmoid /
            # lax.logistic on bf16 vectors (f32-scalar vector.broadcast
            # verifier bug), so spell sigmoid with dtype-matched constants.
            gates = gates.astype(jnp.bfloat16)
            one = jnp.ones((), gates.dtype)
            _sigmoid = lambda v: one / (one + jnp.exp(-v))  # noqa: E731
        else:
            _sigmoid = jax.nn.sigmoid
        i = _sigmoid(gates[..., :H])
        f = _sigmoid(gates[..., H:2 * H])
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = _sigmoid(gates[..., 3 * H:])
        c_new = (f.astype(jnp.float32) * c_ref[:]
                 + i.astype(jnp.float32) * g.astype(jnp.float32))
        h_new = o.astype(jnp.float32) * jnp.tanh(c_new)
        h_ref[:] = h_new
        c_ref[:] = c_new
        out_buf[cslot, pos] = h_new.astype(out_buf.dtype)

        @pl.when(pos == CHUNK - 1)
        def _():
            out_dma(cslot, chunk_idx).start()

        return 0

    # NOTE: full unroll (Mosaic supports only 1 or T) measured no faster
    # (1.81ms vs 1.77ms at T=128/B=512) — the step cost is matmul+VPU+DMA,
    # not loop overhead — so stay rolled for fast compiles
    jax.lax.fori_loop(0, T, step, 0)
    if n_chunks >= 2:
        out_dma(jax.lax.rem(n_chunks - 2, 2), n_chunks - 2).wait()
    out_dma(jax.lax.rem(n_chunks - 1, 2), n_chunks - 1).wait()
    hc_out_ref[0] = h_ref[:]
    hc_out_ref[1] = c_ref[:]


def _lstm_kernel_flat(xw_hbm, w_hh_ref, out_hbm, hc_out_ref,
                      h_ref, c_ref, xwf_buf, xwb_buf, outf_buf, outb_buf,
                      inf_sem, inb_sem, outf_sem, outb_sem, T: int):
    """Flat-layout variant: consumes the SINGLE fused input-projection
    matmul's output directly, so the XLA side never materializes the
    [T, 2, B, 4H] stacked/reversed tensor (the batched two-direction
    matmul runs at ~117 TF/s on v5e vs ~168 TF/s for one fused N=8H dot;
    the saved relayout is the rest of the win).

    xw_hbm:  [T, B, 8H] (ANY/HBM)  row t = [fwd proj(t) | bwd proj(t)],
             bwd NOT time-reversed — this kernel reads it backwards
    out_hbm: [T, B, 2H] (ANY/HBM)  row t = [h_fwd(t) | h_bwd(t)]
    hc_out_ref: [2, 2, B, H] (VMEM) final (h, c), dirs [fwd, bwd]
    scratch: h/c [2, B, H] f32; xwf/xwb [NBUF, B, 4H]; outf/outb
    [2, B, H] double-buffered staging; DMA semaphore arrays.
    """
    H = h_ref.shape[-1]
    H4 = 4 * H

    def f_dma(slot, t):
        return pltpu.make_async_copy(xw_hbm.at[t, :, :H4],
                                     xwf_buf.at[slot], inf_sem.at[slot])

    def b_dma(slot, k):
        # bwd step k consumes original time T-1-k
        return pltpu.make_async_copy(xw_hbm.at[T - 1 - k, :, H4:],
                                     xwb_buf.at[slot], inb_sem.at[slot])

    def outf_dma(slot, t):
        return pltpu.make_async_copy(outf_buf.at[slot],
                                     out_hbm.at[t, :, :H],
                                     outf_sem.at[slot])

    def outb_dma(slot, k):
        return pltpu.make_async_copy(outb_buf.at[slot],
                                     out_hbm.at[T - 1 - k, :, H:],
                                     outb_sem.at[slot])

    h_ref[:] = jnp.zeros_like(h_ref)
    c_ref[:] = jnp.zeros_like(c_ref)
    for k in range(min(NBUF - 1, T)):
        f_dma(k, k).start()
        b_dma(k, k).start()

    def step(t, _):
        slot = jax.lax.rem(t, NBUF)

        @pl.when(t + NBUF - 1 < T)
        def _():
            nslot = jax.lax.rem(t + NBUF - 1, NBUF)
            f_dma(nslot, t + NBUF - 1).start()
            b_dma(nslot, t + NBUF - 1).start()

        f_dma(slot, t).wait()
        b_dma(slot, t).wait()

        oslot = jax.lax.rem(t, 2)

        @pl.when(t >= 2)
        def _():
            outf_dma(oslot, t - 2).wait()
            outb_dma(oslot, t - 2).wait()

        # both directions in one batched MXU contraction
        gates = jax.lax.dot_general(
            h_ref[:].astype(w_hh_ref.dtype), w_hh_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        xw2 = jnp.concatenate([xwf_buf[slot][None], xwb_buf[slot][None]],
                              axis=0)
        gates = gates + xw2.astype(jnp.float32)
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H:2 * H])
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H:])
        c_new = f * c_ref[:] + i * g
        h_new = o * jnp.tanh(c_new)
        h_ref[:] = h_new
        c_ref[:] = c_new
        outf_buf[oslot] = h_new[0].astype(outf_buf.dtype)
        outb_buf[oslot] = h_new[1].astype(outb_buf.dtype)
        outf_dma(oslot, t).start()
        outb_dma(oslot, t).start()
        return 0

    jax.lax.fori_loop(0, T, step, 0)
    if T >= 2:
        outf_dma(jax.lax.rem(T - 2, 2), T - 2).wait()
        outb_dma(jax.lax.rem(T - 2, 2), T - 2).wait()
    outf_dma(jax.lax.rem(T - 1, 2), T - 1).wait()
    outb_dma(jax.lax.rem(T - 1, 2), T - 1).wait()
    hc_out_ref[0] = h_ref[:]
    hc_out_ref[1] = c_ref[:]


def _lstm_scan_pallas_flat_impl(xw_flat: jnp.ndarray, w_hh: jnp.ndarray,
                                interpret: bool = False
                                ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                           jnp.ndarray]:
    T, B, H8 = xw_flat.shape
    H = H8 // 8
    out, hc = pl.pallas_call(
        functools.partial(_lstm_kernel_flat, T=T),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, 2 * H), xw_flat.dtype),
            jax.ShapeDtypeStruct((2, 2, B, H), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # xw stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh resident
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),            # h
            pltpu.VMEM((2, B, H), jnp.float32),            # c
            pltpu.VMEM((NBUF, B, 4 * H), xw_flat.dtype),   # fwd xw pipeline
            pltpu.VMEM((NBUF, B, 4 * H), xw_flat.dtype),   # bwd xw pipeline
            pltpu.VMEM((2, B, H), xw_flat.dtype),          # fwd out staging
            pltpu.VMEM((2, B, H), xw_flat.dtype),          # bwd out staging
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100e6)),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * 2 * B * H * 4 * H,
            bytes_accessed=(xw_flat.size + T * B * 2 * H) *
            xw_flat.dtype.itemsize,
            transcendentals=T * 2 * B * 4 * H),
        interpret=interpret,
    )(xw_flat, w_hh)
    return out, hc[0], hc[1]


_flat_sv = {i: _seq_vmap(_lstm_scan_pallas_flat_impl, interpret=i)
            for i in (False, True)}


@functools.partial(jax.jit, static_argnames=('interpret',))
def lstm_scan_pallas_flat(xw_flat: jnp.ndarray, w_hh: jnp.ndarray,
                          interpret: bool = False
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the fused recurrence on flat-layout projections.

    xw_flat: [T, B, 8H] — row t holds [fwd proj(t) + b_fwd | bwd proj(t)
    + b_bwd] from ONE [B*T, D] @ [D, 8H] matmul (no stacked/reversed
    operand); w_hh: [2, H, 4H]. Returns (out [T, B, 2H] with row t =
    [h_fwd(t) | h_bwd(t)], h_T [2, B, H] f32, c_T [2, B, H] f32) — the
    bwd halves are in natural time order (no reversal needed outside).
    """
    return _flat_sv[bool(interpret)](xw_flat, w_hh)


def _lstm_kernel_train(xw_hbm, w_hh_ref, out_hbm, c_hbm, hc_out_ref,
                       h_ref, c_ref, xw_buf, out_buf, c_buf,
                       in_sem, out_sem, c_sem, T: int):
    """Forward variant that also streams per-step cell states to HBM (the
    residuals the backward kernel needs)."""
    H = h_ref.shape[-1]

    def xw_dma(slot, t):
        return pltpu.make_async_copy(xw_hbm.at[t], xw_buf.at[slot],
                                     in_sem.at[slot])

    def out_dma(slot, t):
        return pltpu.make_async_copy(out_buf.at[slot], out_hbm.at[t],
                                     out_sem.at[slot])

    def c_dma(slot, t):
        return pltpu.make_async_copy(c_buf.at[slot], c_hbm.at[t],
                                     c_sem.at[slot])

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
        oslot = jax.lax.rem(t, 2)

        @pl.when(t >= 2)
        def _():
            out_dma(oslot, t - 2).wait()
            c_dma(oslot, t - 2).wait()

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
        out_buf[oslot] = h_new.astype(out_buf.dtype)
        c_buf[oslot] = c_new.astype(c_buf.dtype)
        out_dma(oslot, t).start()
        c_dma(oslot, t).start()
        return 0

    jax.lax.fori_loop(0, T, step, 0)
    if T >= 2:
        out_dma(jax.lax.rem(T - 2, 2), T - 2).wait()
        c_dma(jax.lax.rem(T - 2, 2), T - 2).wait()
    out_dma(jax.lax.rem(T - 1, 2), T - 1).wait()
    c_dma(jax.lax.rem(T - 1, 2), T - 1).wait()
    hc_out_ref[0] = h_ref[:]
    hc_out_ref[1] = c_ref[:]


def _lstm_bwd_kernel(xw_hbm, w_hh_ref, h_hbm, c_hbm, dout_hbm, dhc_ref,
                     dxw_hbm, dw_out_ref,
                     dh_ref, dc_ref, dw_acc,
                     xw_buf, h_buf, c_buf, cp_buf, dout_buf, dxw_buf,
                     in_sems, dxw_sem, T: int):
    """Reverse-time backward pass.

    Streams xw[t], h[t-1], c[t], c[t-1], dout[t] in; writes dxw[t]; keeps
    dh/dc carries and the dW_hh accumulator in VMEM. Gates are recomputed
    from xw[t] + h[t-1] @ W (cheaper than storing [T,2,B,4H] residuals).
    """
    H = dh_ref.shape[-1]

    def dma_in(buf, hbm, sem_idx, slot, t):
        return pltpu.make_async_copy(hbm.at[t], buf.at[slot],
                                     in_sems.at[sem_idx, slot])

    def start_loads(slot, t):
        # t indexes the timestep being processed
        dma_in(xw_buf, xw_hbm, 0, slot, t).start()
        dma_in(c_buf, c_hbm, 1, slot, t).start()
        dma_in(dout_buf, dout_hbm, 2, slot, t).start()
        # h[t-1] and c[t-1] don't exist at t == 0 (zeros selected in-step)
        @pl.when(t >= 1)
        def _():
            dma_in(h_buf, h_hbm, 3, slot, t - 1).start()
            dma_in(cp_buf, c_hbm, 4, slot, t - 1).start()

    def wait_loads(slot, t):
        dma_in(xw_buf, xw_hbm, 0, slot, t).wait()
        dma_in(c_buf, c_hbm, 1, slot, t).wait()
        dma_in(dout_buf, dout_hbm, 2, slot, t).wait()
        @pl.when(t >= 1)
        def _():
            dma_in(h_buf, h_hbm, 3, slot, t - 1).wait()
            dma_in(cp_buf, c_hbm, 4, slot, t - 1).wait()

    def dxw_dma(slot, t):
        return pltpu.make_async_copy(dxw_buf.at[slot], dxw_hbm.at[t],
                                     dxw_sem.at[slot])

    dh_ref[:] = dhc_ref[0]
    dc_ref[:] = dhc_ref[1]
    dw_acc[:] = jnp.zeros_like(dw_acc)
    start_loads(jax.lax.rem(T - 1, 2), T - 1)

    def step(k, _):
        t = T - 1 - k
        slot = jax.lax.rem(t, 2)

        @pl.when(t - 1 >= 0)
        def _():
            start_loads(jax.lax.rem(t - 1, 2), t - 1)

        wait_loads(slot, t)

        # at t == 0 the previous state is the zero initial state (the slot
        # holds stale data from step t+2's load)
        is_first = (t == 0)
        h_prev = jnp.where(is_first, 0.0, h_buf[slot].astype(jnp.float32))
        c_prev = jnp.where(is_first, 0.0, cp_buf[slot].astype(jnp.float32))
        c_t = c_buf[slot].astype(jnp.float32)

        # recompute gates
        gates = jax.lax.dot_general(
            h_prev.astype(w_hh_ref.dtype), w_hh_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        gates = gates + xw_buf[slot].astype(jnp.float32)
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H:2 * H])
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H:])

        dh = dh_ref[:] + dout_buf[slot].astype(jnp.float32)
        tc = jnp.tanh(c_t)
        do = dh * tc
        dc = dc_ref[:] + dh * o * (1.0 - tc * tc)
        di = dc * g
        dg = dc * i
        df = dc * c_prev
        dgates = jnp.concatenate([
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do * o * (1.0 - o),
        ], axis=-1)  # [2, B, 4H]

        @pl.when(k >= 2)
        def _():
            dxw_dma(slot, t + 2).wait()

        dxw_buf[slot] = dgates.astype(dxw_buf.dtype)
        dxw_dma(slot, t).start()

        # dh_{t-1} = dgates @ W^T; dW += h_{t-1}^T dgates
        dgates_c = dgates.astype(w_hh_ref.dtype)
        dh_prev = jax.lax.dot_general(
            dgates_c, w_hh_ref[:],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dw_acc[:] = dw_acc[:] + jax.lax.dot_general(
            h_prev.astype(w_hh_ref.dtype), dgates_c,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dh_ref[:] = dh_prev
        dc_ref[:] = dc * f
        return 0

    jax.lax.fori_loop(0, T, step, 0)
    if T >= 2:
        dxw_dma(jax.lax.rem(1, 2), 1).wait()
    dxw_dma(jax.lax.rem(0, 2), 0).wait()
    dw_out_ref[:] = dw_acc[:]


def _lstm_scan_pallas_impl(xw: jnp.ndarray, w_hh: jnp.ndarray,
                           interpret: bool = False, gates_bf16: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    T, two, B, H4 = xw.shape
    H = H4 // 4
    assert two == 2
    CHUNK = 1  # per-step out DMA measured faster than chunked staging
    out, hc = pl.pallas_call(
        functools.partial(_lstm_kernel, T=T, CHUNK=CHUNK,
                          gates_bf16=gates_bf16),
        out_shape=(
            jax.ShapeDtypeStruct((T, 2, B, H), xw.dtype),
            jax.ShapeDtypeStruct((2, 2, B, H), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # xw stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh resident
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
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


_scan_sv = {(i, g): _seq_vmap(_lstm_scan_pallas_impl, interpret=i,
                              gates_bf16=g)
            for i in (False, True) for g in (False, True)}


@functools.partial(jax.jit, static_argnames=('interpret', 'gates_bf16'))
def lstm_scan_pallas(xw: jnp.ndarray, w_hh: jnp.ndarray,
                     interpret: bool = False, gates_bf16: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the fused recurrence.

    xw: [T, 2, B, 4H] (input projections + bias, direction 1 already
    time-reversed; bf16 recommended — it halves the streamed bytes);
    w_hh: [2, H, 4H] (bf16 recommended). Carries accumulate in f32.
    Returns (out [T, 2, B, H] in xw.dtype, h_T [2, B, H] f32,
    c_T [2, B, H] f32).
    """
    return _scan_sv[(bool(interpret), bool(gates_bf16))](xw, w_hh)


def _lstm_scan_pallas_train_impl(xw, w_hh, interpret: bool = False):
    T, two, B, H4 = xw.shape
    H = H4 // 4
    out, c_seq, hc = pl.pallas_call(
        functools.partial(_lstm_kernel_train, T=T),
        out_shape=(
            jax.ShapeDtypeStruct((T, 2, B, H), xw.dtype),
            jax.ShapeDtypeStruct((T, 2, B, H), jnp.float32),
            jax.ShapeDtypeStruct((2, 2, B, H), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),       # h
            pltpu.VMEM((2, B, H), jnp.float32),       # c
            pltpu.VMEM((NBUF, 2, B, H4), xw.dtype),   # xw pipeline
            pltpu.VMEM((2, 2, B, H), xw.dtype),       # out staging
            pltpu.VMEM((2, 2, B, H), jnp.float32),    # c staging
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(100e6)),
        interpret=interpret,
    )(xw, w_hh)
    return out, c_seq, hc[0], hc[1]


_train_sv = {i: _seq_vmap(_lstm_scan_pallas_train_impl, interpret=i)
             for i in (False, True)}


@functools.partial(jax.jit, static_argnames=('interpret',))
def lstm_scan_pallas_train(xw, w_hh, interpret: bool = False):
    """Forward that also returns the per-step cell states (residuals for
    the backward kernel). Returns (out, c_seq, h_T, c_T)."""
    return _train_sv[bool(interpret)](xw, w_hh)


def _lstm_scan_pallas_bwd_impl(xw, w_hh, out_h, c_seq, d_out, dhc,
                               interpret: bool = False):
    T, two, B, H4 = xw.shape
    H = H4 // 4
    dxw, dw = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, T=T),
        out_shape=(
            jax.ShapeDtypeStruct((T, 2, B, H4), jnp.float32),
            jax.ShapeDtypeStruct((2, H, H4), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # xw
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh
            pl.BlockSpec(memory_space=pl.ANY),   # out_h
            pl.BlockSpec(memory_space=pl.ANY),   # c_seq
            pl.BlockSpec(memory_space=pl.ANY),   # d_out
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dhc
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),   # dxw
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dw
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),       # dh carry
            pltpu.VMEM((2, B, H), jnp.float32),       # dc carry
            pltpu.VMEM((2, H, H4), jnp.float32),      # dW accumulator
            pltpu.VMEM((2, 2, B, H4), xw.dtype),      # xw slots
            pltpu.VMEM((2, 2, B, H), out_h.dtype),    # h[t-1] slots
            pltpu.VMEM((2, 2, B, H), jnp.float32),    # c[t] slots
            pltpu.VMEM((2, 2, B, H), jnp.float32),    # c[t-1] slots
            pltpu.VMEM((2, 2, B, H), d_out.dtype),    # dout slots
            pltpu.VMEM((2, 2, B, H4), jnp.float32),   # dxw staging
            pltpu.SemaphoreType.DMA((5, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(110e6)),
        interpret=interpret,
    )(xw, w_hh, out_h, c_seq, d_out, dhc)
    return dxw, dw


_bwd_sv = {i: _seq_vmap(_lstm_scan_pallas_bwd_impl, interpret=i)
           for i in (False, True)}


@functools.partial(jax.jit, static_argnames=('interpret',))
def lstm_scan_pallas_bwd(xw, w_hh, out_h, c_seq, d_out, d_hT, d_cT,
                         interpret: bool = False):
    """Reverse-time backward kernel. Returns (d_xw [T,2,B,4H] f32,
    d_w_hh [2,H,4H] f32)."""
    dhc = jnp.stack([d_hT.astype(jnp.float32), d_cT.astype(jnp.float32)], 0)
    return _bwd_sv[bool(interpret)](xw, w_hh, out_h, c_seq, d_out, dhc)


def _lstm_kernel_train_flat(xw_hbm, w_hh_ref, out_hbm, c_hbm, hc_out_ref,
                            h_ref, c_ref, xwf_buf, xwb_buf,
                            outf_buf, outb_buf, c_stage,
                            inf_sem, inb_sem, outf_sem, outb_sem, c_sem,
                            T: int):
    """Flat-layout train forward: the flat eval kernel plus a per-step
    cell-state residual stream for the backward kernel.

    xw_hbm:  [T, B, 8H]  row t = [fwd proj(t) | bwd proj(t)], bwd NOT
             time-reversed (read backwards here)
    out_hbm: [T, B, 2H]  natural time order
    c_hbm:   [T, 2, B, H] f32, indexed by STEP s (not original time):
             c_hbm[s] = [c_fwd(t=s) | c_bwd(step s, orig time T-1-s)] —
             the traversal order the backward kernel consumes.
    """
    H = h_ref.shape[-1]
    H4 = 4 * H

    def f_dma(slot, t):
        return pltpu.make_async_copy(xw_hbm.at[t, :, :H4],
                                     xwf_buf.at[slot], inf_sem.at[slot])

    def b_dma(slot, k):
        return pltpu.make_async_copy(xw_hbm.at[T - 1 - k, :, H4:],
                                     xwb_buf.at[slot], inb_sem.at[slot])

    def outf_dma(slot, t):
        return pltpu.make_async_copy(outf_buf.at[slot],
                                     out_hbm.at[t, :, :H],
                                     outf_sem.at[slot])

    def outb_dma(slot, k):
        return pltpu.make_async_copy(outb_buf.at[slot],
                                     out_hbm.at[T - 1 - k, :, H:],
                                     outb_sem.at[slot])

    def c_dma(slot, s):
        return pltpu.make_async_copy(c_stage.at[slot], c_hbm.at[s],
                                     c_sem.at[slot])

    h_ref[:] = jnp.zeros_like(h_ref)
    c_ref[:] = jnp.zeros_like(c_ref)
    for k in range(min(NBUF - 1, T)):
        f_dma(k, k).start()
        b_dma(k, k).start()

    def step(t, _):
        slot = jax.lax.rem(t, NBUF)

        @pl.when(t + NBUF - 1 < T)
        def _():
            nslot = jax.lax.rem(t + NBUF - 1, NBUF)
            f_dma(nslot, t + NBUF - 1).start()
            b_dma(nslot, t + NBUF - 1).start()

        f_dma(slot, t).wait()
        b_dma(slot, t).wait()

        oslot = jax.lax.rem(t, 2)

        @pl.when(t >= 2)
        def _():
            outf_dma(oslot, t - 2).wait()
            outb_dma(oslot, t - 2).wait()
            c_dma(oslot, t - 2).wait()

        gates = jax.lax.dot_general(
            h_ref[:].astype(w_hh_ref.dtype), w_hh_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        xw2 = jnp.concatenate([xwf_buf[slot][None], xwb_buf[slot][None]],
                              axis=0)
        gates = gates + xw2.astype(jnp.float32)
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H:2 * H])
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H:])
        c_new = f * c_ref[:] + i * g
        h_new = o * jnp.tanh(c_new)
        h_ref[:] = h_new
        c_ref[:] = c_new
        outf_buf[oslot] = h_new[0].astype(outf_buf.dtype)
        outb_buf[oslot] = h_new[1].astype(outb_buf.dtype)
        c_stage[oslot] = c_new
        outf_dma(oslot, t).start()
        outb_dma(oslot, t).start()
        c_dma(oslot, t).start()
        return 0

    jax.lax.fori_loop(0, T, step, 0)
    if T >= 2:
        s2 = jax.lax.rem(T - 2, 2)
        outf_dma(s2, T - 2).wait()
        outb_dma(s2, T - 2).wait()
        c_dma(s2, T - 2).wait()
    s1 = jax.lax.rem(T - 1, 2)
    outf_dma(s1, T - 1).wait()
    outb_dma(s1, T - 1).wait()
    c_dma(s1, T - 1).wait()
    hc_out_ref[0] = h_ref[:]
    hc_out_ref[1] = c_ref[:]


def _lstm_bwd_kernel_flat(xw_hbm, w_hh_ref, out_hbm, c_hbm, dout_hbm,
                          dhc_ref, dxw_hbm, dw_out_ref,
                          dh_ref, dc_ref, dw_acc,
                          xw_buf, h_buf, c_buf, cp_buf, dout_buf, dxw_buf,
                          in_sems, dxw_sems, T: int):
    """Flat-layout reverse backward. Iterates STEP index s = T-1..0; the
    fwd lane walks original time backwards (t = s) while the bwd lane
    walks it forwards (orig time T-1-s) — both lanes' recursions run in
    their own reverse order inside ONE loop, so the flat halves at
    different HBM rows stream through per-lane half-row DMAs. The gate
    math is identical to the stacked backward (_lstm_bwd_kernel).

    dxw_hbm: [T, B, 8H] f32, same flat layout as the forward input.
    """
    H = dh_ref.shape[-1]
    H4 = 4 * H

    def start_loads(slot, s):
        pltpu.make_async_copy(xw_hbm.at[s, :, :H4], xw_buf.at[slot, 0],
                              in_sems.at[0, slot]).start()
        pltpu.make_async_copy(xw_hbm.at[T - 1 - s, :, H4:],
                              xw_buf.at[slot, 1],
                              in_sems.at[1, slot]).start()
        pltpu.make_async_copy(dout_hbm.at[s, :, :H], dout_buf.at[slot, 0],
                              in_sems.at[2, slot]).start()
        pltpu.make_async_copy(dout_hbm.at[T - 1 - s, :, H:],
                              dout_buf.at[slot, 1],
                              in_sems.at[3, slot]).start()
        pltpu.make_async_copy(c_hbm.at[s], c_buf.at[slot],
                              in_sems.at[4, slot]).start()

        @pl.when(s >= 1)
        def _():
            pltpu.make_async_copy(c_hbm.at[s - 1], cp_buf.at[slot],
                                  in_sems.at[5, slot]).start()
            pltpu.make_async_copy(out_hbm.at[s - 1, :, :H],
                                  h_buf.at[slot, 0],
                                  in_sems.at[6, slot]).start()
            pltpu.make_async_copy(out_hbm.at[T - s, :, H:],
                                  h_buf.at[slot, 1],
                                  in_sems.at[7, slot]).start()

    def wait_loads(slot, s):
        pltpu.make_async_copy(xw_hbm.at[s, :, :H4], xw_buf.at[slot, 0],
                              in_sems.at[0, slot]).wait()
        pltpu.make_async_copy(xw_hbm.at[T - 1 - s, :, H4:],
                              xw_buf.at[slot, 1],
                              in_sems.at[1, slot]).wait()
        pltpu.make_async_copy(dout_hbm.at[s, :, :H], dout_buf.at[slot, 0],
                              in_sems.at[2, slot]).wait()
        pltpu.make_async_copy(dout_hbm.at[T - 1 - s, :, H:],
                              dout_buf.at[slot, 1],
                              in_sems.at[3, slot]).wait()
        pltpu.make_async_copy(c_hbm.at[s], c_buf.at[slot],
                              in_sems.at[4, slot]).wait()

        @pl.when(s >= 1)
        def _():
            pltpu.make_async_copy(c_hbm.at[s - 1], cp_buf.at[slot],
                                  in_sems.at[5, slot]).wait()
            pltpu.make_async_copy(out_hbm.at[s - 1, :, :H],
                                  h_buf.at[slot, 0],
                                  in_sems.at[6, slot]).wait()
            pltpu.make_async_copy(out_hbm.at[T - s, :, H:],
                                  h_buf.at[slot, 1],
                                  in_sems.at[7, slot]).wait()

    def dxwf_dma(slot, s):
        return pltpu.make_async_copy(dxw_buf.at[slot, 0],
                                     dxw_hbm.at[s, :, :H4],
                                     dxw_sems.at[0, slot])

    def dxwb_dma(slot, s):
        return pltpu.make_async_copy(dxw_buf.at[slot, 1],
                                     dxw_hbm.at[T - 1 - s, :, H4:],
                                     dxw_sems.at[1, slot])

    dh_ref[:] = dhc_ref[0]
    dc_ref[:] = dhc_ref[1]
    dw_acc[:] = jnp.zeros_like(dw_acc)
    start_loads(jax.lax.rem(T - 1, 2), T - 1)

    def step(m, _):
        s = T - 1 - m
        slot = jax.lax.rem(s, 2)

        @pl.when(s - 1 >= 0)
        def _():
            start_loads(jax.lax.rem(s - 1, 2), s - 1)

        wait_loads(slot, s)

        is_first = (s == 0)
        h_prev = jnp.where(is_first, 0.0,
                           h_buf[slot].astype(jnp.float32))
        c_prev = jnp.where(is_first, 0.0, cp_buf[slot])
        c_t = c_buf[slot]

        gates = jax.lax.dot_general(
            h_prev.astype(w_hh_ref.dtype), w_hh_ref[:],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        gates = gates + xw_buf[slot].astype(jnp.float32)
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H:2 * H])
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H:])

        dh = dh_ref[:] + dout_buf[slot].astype(jnp.float32)
        tc = jnp.tanh(c_t)
        do = dh * tc
        dc = dc_ref[:] + dh * o * (1.0 - tc * tc)
        di = dc * g
        dg = dc * i
        df = dc * c_prev
        dgates = jnp.concatenate([
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do * o * (1.0 - o),
        ], axis=-1)  # [2, B, 4H]

        @pl.when(m >= 2)
        def _():
            dxwf_dma(slot, s + 2).wait()
            dxwb_dma(slot, s + 2).wait()

        dxw_buf[slot] = dgates
        dxwf_dma(slot, s).start()
        dxwb_dma(slot, s).start()

        dgates_c = dgates.astype(w_hh_ref.dtype)
        dh_prev = jax.lax.dot_general(
            dgates_c, w_hh_ref[:],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dw_acc[:] = dw_acc[:] + jax.lax.dot_general(
            h_prev.astype(w_hh_ref.dtype), dgates_c,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dh_ref[:] = dh_prev
        dc_ref[:] = dc * f
        return 0

    jax.lax.fori_loop(0, T, step, 0)
    if T >= 2:
        dxwf_dma(jax.lax.rem(1, 2), 1).wait()
        dxwb_dma(jax.lax.rem(1, 2), 1).wait()
    dxwf_dma(0, 0).wait()
    dxwb_dma(0, 0).wait()
    dw_out_ref[:] = dw_acc[:]


def _lstm_scan_pallas_train_flat_impl(xw_flat, w_hh,
                                      interpret: bool = False):
    T, B, H8 = xw_flat.shape
    H = H8 // 8
    out, c_seq, hc = pl.pallas_call(
        functools.partial(_lstm_kernel_train_flat, T=T),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, 2 * H), xw_flat.dtype),
            jax.ShapeDtypeStruct((T, 2, B, H), jnp.float32),
            jax.ShapeDtypeStruct((2, 2, B, H), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),            # h
            pltpu.VMEM((2, B, H), jnp.float32),            # c
            pltpu.VMEM((NBUF, B, 4 * H), xw_flat.dtype),   # fwd xw pipeline
            pltpu.VMEM((NBUF, B, 4 * H), xw_flat.dtype),   # bwd xw pipeline
            pltpu.VMEM((2, B, H), xw_flat.dtype),          # fwd out staging
            pltpu.VMEM((2, B, H), xw_flat.dtype),          # bwd out staging
            pltpu.VMEM((2, 2, B, H), jnp.float32),         # c staging
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100e6)),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * 2 * B * H * 4 * H,
            bytes_accessed=(xw_flat.size + 3 * T * B * 2 * H) *
            xw_flat.dtype.itemsize,
            transcendentals=T * 2 * B * 4 * H),
        interpret=interpret,
    )(xw_flat, w_hh)
    return out, c_seq, hc[0], hc[1]


_train_flat_sv = {i: _seq_vmap(_lstm_scan_pallas_train_flat_impl,
                               interpret=i) for i in (False, True)}


@functools.partial(jax.jit, static_argnames=('interpret',))
def lstm_scan_pallas_train_flat(xw_flat, w_hh, interpret: bool = False):
    """Flat-layout train forward. xw_flat: [T, B, 8H] (bwd half NOT
    reversed). Returns (out [T, B, 2H] natural order, c_seq [T, 2, B, H]
    f32 by step index, h_T [2, B, H] f32, c_T [2, B, H] f32)."""
    return _train_flat_sv[bool(interpret)](xw_flat, w_hh)


def _lstm_scan_pallas_bwd_flat_impl(xw_flat, w_hh, out_h, c_seq, d_out,
                                    dhc, interpret: bool = False):
    T, B, H8 = xw_flat.shape
    H = H8 // 8
    H4 = 4 * H
    dxw, dw = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel_flat, T=T),
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H8), jnp.float32),
            jax.ShapeDtypeStruct((2, H, H4), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # xw_flat
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh
            pl.BlockSpec(memory_space=pl.ANY),      # out_h
            pl.BlockSpec(memory_space=pl.ANY),      # c_seq
            pl.BlockSpec(memory_space=pl.ANY),      # d_out
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dhc
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),      # dxw
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dw
        ),
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),        # dh carry
            pltpu.VMEM((2, B, H), jnp.float32),        # dc carry
            pltpu.VMEM((2, H, H4), jnp.float32),       # dW accumulator
            pltpu.VMEM((2, 2, B, H4), xw_flat.dtype),  # xw slots
            pltpu.VMEM((2, 2, B, H), out_h.dtype),     # h[prev] slots
            pltpu.VMEM((2, 2, B, H), jnp.float32),     # c[s] slots
            pltpu.VMEM((2, 2, B, H), jnp.float32),     # c[s-1] slots
            pltpu.VMEM((2, 2, B, H), d_out.dtype),     # dout slots
            pltpu.VMEM((2, 2, B, H4), jnp.float32),    # dxw staging
            pltpu.SemaphoreType.DMA((8, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(110e6)),
        interpret=interpret,
    )(xw_flat, w_hh, out_h, c_seq, d_out, dhc)
    return dxw, dw


_bwd_flat_sv = {i: _seq_vmap(_lstm_scan_pallas_bwd_flat_impl, interpret=i)
                for i in (False, True)}


@functools.partial(jax.jit, static_argnames=('interpret',))
def lstm_scan_pallas_bwd_flat(xw_flat, w_hh, out_h, c_seq, d_out, d_hT,
                              d_cT, interpret: bool = False):
    """Flat-layout backward kernel. Returns (d_xw [T, B, 8H] f32,
    d_w_hh [2, H, 4H] f32)."""
    dhc = jnp.stack([d_hT.astype(jnp.float32), d_cT.astype(jnp.float32)], 0)
    return _bwd_flat_sv[bool(interpret)](xw_flat, w_hh, out_h, c_seq,
                                         d_out, dhc)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def lstm_flat_fused(xw_flat: jnp.ndarray, w_hh: jnp.ndarray):
    """Differentiable flat-layout fused recurrence: same contract as
    lstm_scan_pallas_flat (out [T,B,2H] natural order, h_T, c_T) with a
    flat Pallas backward pass (custom VJP). The training path uses this so
    the input projection stays ONE [B*T, D] @ [D, 8H] matmul end-to-end —
    forward AND backward (d_xw comes back flat, so the projection's VJP is
    one fused matmul too)."""
    out, _, hT, cT = lstm_scan_pallas_train_flat(xw_flat, w_hh)
    return out, hT, cT


def _flat_fused_fwd(xw_flat, w_hh):
    out, c_seq, hT, cT = lstm_scan_pallas_train_flat(xw_flat, w_hh)
    return (out, hT, cT), (xw_flat, w_hh, out, c_seq)


def _flat_fused_bwd(residuals, cotangents):
    xw_flat, w_hh, out, c_seq = residuals
    d_out, d_hT, d_cT = cotangents
    dxw, dw = lstm_scan_pallas_bwd_flat(xw_flat, w_hh, out, c_seq,
                                        d_out.astype(out.dtype), d_hT, d_cT)
    return dxw.astype(xw_flat.dtype), dw.astype(w_hh.dtype)


lstm_flat_fused.defvjp(_flat_fused_fwd, _flat_fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def lstm_scan_fused(xw: jnp.ndarray, w_hh: jnp.ndarray):
    """Differentiable fused recurrence: same contract as lstm_scan_pallas
    (out, h_T, c_T) with a Pallas backward pass (custom VJP)."""
    out, _, hT, cT = lstm_scan_pallas_train(xw, w_hh)
    return out, hT, cT


def _fused_fwd(xw, w_hh):
    out, c_seq, hT, cT = lstm_scan_pallas_train(xw, w_hh)
    return (out, hT, cT), (xw, w_hh, out, c_seq)


def _fused_bwd(residuals, cotangents):
    xw, w_hh, out, c_seq = residuals
    d_out, d_hT, d_cT = cotangents
    dxw, dw = lstm_scan_pallas_bwd(xw, w_hh, out, c_seq,
                                   d_out.astype(out.dtype), d_hT, d_cT)
    return dxw.astype(xw.dtype), dw.astype(w_hh.dtype)


lstm_scan_fused.defvjp(_fused_fwd, _fused_bwd)
