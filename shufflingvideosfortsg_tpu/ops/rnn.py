"""Bidirectional multi-layer LSTM, TPU-idiomatic.

The reference delegates to cuDNN ``nn.LSTM`` (reference: grounding/model/
networks/RNN.py:26-49). Here the recurrence is a single ``lax.scan`` per
layer with both directions fused:

- the input projection for *all* timesteps and both directions is one
  batched matmul ([2, B*T, D] @ [2, D, 4H]) that XLA tiles onto the MXU;
- the scan carries only (h, c) of shape [2, B, H] and performs one
  [2, B, H] @ [2, H, 4H] batched matmul per step;
- the backward direction runs on the time-reversed input inside the same
  scan, so T steps produce both directions.

Weight layout is cuDNN/torch-compatible (gate order i, f, g, o; per-layer
``w_ih [D, 4H]``, ``w_hh [H, 4H]``, and BOTH biases ``b_ih``/``b_hh``
[4H]), which keeps torch checkpoint conversion a pure transpose and —
because torch's redundant bias pair receives identical gradients but two
separate Adam updates — keeps *optimizer dynamics* exactly equal to the
reference's (verified in tests/test_grad_parity.py). The compute path adds
them once, so the recurrence cost is unchanged. Initialization matches
torch ``nn.LSTM`` (all U(-k, k) with k = 1/sqrt(H)).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def lstm_uniform_init(hidden_size: int):
    """torch nn.LSTM init: U(-1/sqrt(H), 1/sqrt(H))."""
    k = 1.0 / (hidden_size ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -k, k)

    return init


# VMEM budgets for kernel eligibility. v5e has 128 MB of VMEM/core; the
# eval kernel is safe well past B=1024 (measured: one B=1024 call is
# 1.37x faster per row than two chunked B=512 calls), so its cap is
# generous. The backward kernel's accumulator layout was tuned at 14 MB
# and keeps that conservative cap.
_EVAL_VMEM_BUDGET = 64 * (1 << 20)
_BWD_VMEM_BUDGET = 14 * (1 << 20)


def _eval_kernel_vmem_bytes(B: int, H: int, itemsize: int) -> int:
    """VMEM footprint of the inference recurrence kernel (NBUF=3 xw
    pipeline + f32 carries + staging); see pallas/lstm_scan.py."""
    return (3 * (2 * B * 4 * H * itemsize)    # xw pipeline
            + 2 * (2 * B * H * 4) * 2         # h, c carries (f32)
            + 2 * (2 * B * H * itemsize)      # out staging
            + (2 * H * 4 * H * itemsize)      # w_hh resident
            + 2 * (2 * B * H * 4))            # hc output


def _bwd_kernel_vmem_bytes(B: int, H: int, itemsize: int) -> int:
    """VMEM footprint estimate of the fused backward kernel (see
    pallas/lstm_scan.py scratch shapes) — used to fall back to lax.scan
    when a shape wouldn't fit the ~16MB budget."""
    return (2 * (2 * B * 4 * H * itemsize)     # xw slots
            + 2 * (2 * B * 4 * H * 4)          # dxw staging (f32)
            + 2 * (2 * B * H * itemsize)       # h[t-1] slots
            + 4 * (2 * B * H * 4)              # c[t], c[t-1] slots
            + 2 * (2 * B * H * itemsize)       # dout slots
            + 2 * (2 * B * H * 4)              # dh/dc carries
            + 2 * (2 * H * 4 * H * 4)          # dW accumulator + output
            + (2 * H * 4 * H * itemsize))      # w_hh resident


def _lstm_scan(xw: jnp.ndarray, w_hh: jnp.ndarray, h0: jnp.ndarray,
               c0: jnp.ndarray, unroll: int = 8
               ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Run the fused two-direction recurrence.

    xw:   [T, 2, B, 4H] precomputed input projections (+bias); direction 1
          is already time-reversed.
    w_hh: [2, H, 4H]
    h0/c0:[2, B, H]
    Returns (outputs [T, 2, B, H], (h_T, c_T)).
    """
    H = h0.shape[-1]

    def step(carry, xw_t):
        h, c = carry
        gates = xw_t + jnp.einsum(
            'dbh,dhg->dbg', h, w_hh,
            preferred_element_type=jnp.float32).astype(h.dtype)
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H:2 * H])
        g = jnp.tanh(gates[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H:])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    (h_f, c_f), out = jax.lax.scan(step, (h0, c0), xw, unroll=unroll)
    return out, (h_f, c_f)


class BiLSTM(nn.Module):
    """Bidirectional num_layers-deep LSTM over [B, T, D] inputs.

    Returns (outputs [B, T, 2H], hn [2*L, B, H], cn [2*L, B, H]) with hn/cn
    in torch layout (layer-major, fwd before bwd), so ``hn[-2], hn[-1]`` are
    the last layer's final fwd/bwd hidden states — the sentence-embedding
    convention of the reference encoders (SentenceEncoder.py:30-31).

    Dropout (like torch) applies to each layer's output except the last,
    only when not deterministic.
    """
    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0
    dtype: Any = jnp.float32
    unroll: int = 8
    # Pallas fused-scan recurrence: False/None = lax.scan; True/'eval' =
    # inference kernel (no grad); 'train' = custom-VJP kernel (falls back
    # to lax.scan when the shape exceeds the kernel's VMEM budget)
    fused: Any = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        B, T, _ = x.shape
        H = self.hidden_size
        hn_list, cn_list = [], []
        inputs = x.astype(self.dtype)
        for layer in range(self.num_layers):
            D = inputs.shape[-1]
            w_ih = self.param(f'w_ih_l{layer}', lstm_uniform_init(H), (2, D, 4 * H))
            w_hh = self.param(f'w_hh_l{layer}', lstm_uniform_init(H), (2, H, 4 * H))
            # torch keeps two redundant biases; carrying both (added once
            # here, so zero compute cost) makes Adam updates — which see two
            # parameters with identical gradients — match the reference's
            # training dynamics exactly
            b_ih = self.param(f'b_ih_l{layer}', lstm_uniform_init(H), (2, 4 * H))
            b_hh = self.param(f'b_hh_l{layer}', lstm_uniform_init(H), (2, 4 * H))
            b = b_ih + b_hh

            mode = self.fused
            itemsize = jnp.dtype(self.dtype).itemsize
            if H % 128 != 0:
                # the kernel's per-gate slices (gates[..., :H] etc.) are
                # lane-dimension slices: Mosaic requires them 128-aligned.
                # Sub-128 hidden sizes (tests, toy configs) use lax.scan.
                mode = False
            # Mosaic needs a sublane-aligned batch: pad xw with zero rows to
            # the next multiple of 8 AFTER the input projection (so the
            # projection matmul runs at the true B) and slice the outputs
            # back. The hardware computes those sublanes regardless, so this
            # is strictly cheaper than the old behaviors (silent lax.scan
            # fallback for B%8!=0; 8x-tiled projection for serving B=1).
            B8 = -(-B // 8) * 8
            train_B = B8
            if mode == 'train':
                # batches beyond the backward kernel's VMEM budget split
                # into per-chunk custom-VJP kernel calls (the VJP of the
                # slice/concat sums each chunk's dW) instead of falling
                # back to the ~2.5x-slower differentiable scan — the
                # round-3 large-B training cliff was exactly that silent
                # fallback (docs/KERNELS.md B-sweep)
                # train_B starts at B8 (a multiple of 8) and steps by 8,
                # so 8-alignment holds by construction
                while train_B > 8 and (
                        _bwd_kernel_vmem_bytes(train_B, H, itemsize)
                        > _BWD_VMEM_BUDGET or B8 % train_B):
                    train_B -= 8
                if _bwd_kernel_vmem_bytes(train_B, H, itemsize) \
                        > _BWD_VMEM_BUDGET:
                    mode = False  # even one 8-row chunk won't fit
            kernel_B = B8
            if mode in (True, 'eval'):
                # batches beyond the kernel's VMEM budget run as several
                # kernel calls over equal batch chunks (still ~2.5x the
                # scan per chunk)
                while kernel_B > 8 and (
                        _eval_kernel_vmem_bytes(kernel_B, H, itemsize)
                        > _EVAL_VMEM_BUDGET or B8 % kernel_B):
                    kernel_B -= 8
                if _eval_kernel_vmem_bytes(kernel_B, H, itemsize) \
                        > _EVAL_VMEM_BUDGET:
                    mode = False  # even one 8-row chunk won't fit

            if mode in (True, 'eval', 'train'):
                # flat-layout path: ONE fused [B*T, D] @ [D, 8H] matmul
                # (no stacked/time-reversed operand — ~1.8x the batched
                # two-direction form incl. relayout; docs/KERNELS.md)
                # feeding the flat kernel, which reads the bwd half
                # backwards itself and emits [T, B, 2H] in natural order.
                # 'train' uses the custom-VJP variant whose backward is a
                # flat Pallas kernel, so d_xw feeds the SAME single-matmul
                # projection in the backward pass too.
                from .pallas.lstm_scan import (lstm_flat_fused,
                                               lstm_scan_pallas_flat)
                w_cat = jnp.concatenate(
                    [w_ih[0], w_ih[1]], axis=-1).astype(self.dtype)
                b_cat = jnp.concatenate([b[0], b[1]], axis=-1)
                xw = jnp.einsum('btf,fg->tbg', inputs, w_cat,
                                preferred_element_type=jnp.float32
                                ).astype(self.dtype)
                xw = xw + b_cat.astype(self.dtype)
                if B8 != B:
                    xw = jnp.pad(xw, ((0, 0), (0, B8 - B), (0, 0)))
                w_c = w_hh.astype(self.dtype)
                def chunked(fn, chunk):
                    if chunk == B8:
                        return fn(xw, w_c)
                    parts = [fn(xw[:, b0:b0 + chunk], w_c)
                             for b0 in range(0, B8, chunk)]
                    return tuple(jnp.concatenate([p[i] for p in parts],
                                                 axis=1) for i in range(3))

                if mode == 'train':
                    out, h_f, c_f = chunked(lstm_flat_fused, train_B)
                else:
                    out, h_f, c_f = chunked(lstm_scan_pallas_flat, kernel_B)
                out = out.astype(self.dtype)
                h_f = h_f.astype(self.dtype)[:, :B]
                c_f = c_f.astype(self.dtype)[:, :B]
                # [T, B, 2H] -> [B, T, 2H]; both halves already in natural
                # time order — no reverse, no per-direction concat
                layer_out = jnp.transpose(out, (1, 0, 2))[:B]
            else:
                # direction 0: natural order; direction 1: reversed input
                both = jnp.stack([inputs, inputs[:, ::-1]], axis=0)
                xw = jnp.einsum('dbtf,dfg->dbtg', both,
                                w_ih.astype(self.dtype),
                                preferred_element_type=jnp.float32
                                ).astype(self.dtype)
                xw = xw + b[:, None, None, :].astype(self.dtype)
                xw = jnp.transpose(xw, (2, 0, 1, 3))  # [T, 2, B, 4H]
                h0 = jnp.zeros((2, B, H), self.dtype)
                c0 = jnp.zeros((2, B, H), self.dtype)
                out, (h_f, c_f) = _lstm_scan(
                    xw, w_hh.astype(self.dtype), h0, c0,
                    unroll=self.unroll)
                # [T, 2, B, H] -> fwd [B, T, H], bwd un-reversed [B, T, H]
                fwd = jnp.transpose(out[:, 0], (1, 0, 2))
                bwd = jnp.transpose(out[:, 1], (1, 0, 2))[:, ::-1]
                layer_out = jnp.concatenate([fwd, bwd], axis=-1)

            hn_list += [h_f[0], h_f[1]]
            cn_list += [c_f[0], c_f[1]]

            if layer + 1 < self.num_layers and self.dropout > 0.0:
                layer_out = nn.Dropout(rate=self.dropout)(
                    layer_out, deterministic=deterministic)
            inputs = layer_out

        hn = jnp.stack(hn_list, axis=0)
        cn = jnp.stack(cn_list, axis=0)
        return inputs, hn, cn


class BiGRU(nn.Module):
    """Bidirectional multi-layer GRU (reference: RNN.py:4-23), same layout
    conventions as :class:`BiLSTM`. Gate order r, z, n (torch-compatible);
    torch keeps b_ih and b_hh separate because the candidate gate needs
    ``r * (h @ W_hn + b_hn)``, so both biases are retained.
    """
    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0
    dtype: Any = jnp.float32
    unroll: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, T, _ = x.shape
        H = self.hidden_size
        hn_list = []
        inputs = x.astype(self.dtype)
        for layer in range(self.num_layers):
            D = inputs.shape[-1]
            w_ih = self.param(f'w_ih_l{layer}', lstm_uniform_init(H), (2, D, 3 * H))
            w_hh = self.param(f'w_hh_l{layer}', lstm_uniform_init(H), (2, H, 3 * H))
            b_ih = self.param(f'b_ih_l{layer}', lstm_uniform_init(H), (2, 3 * H))
            b_hh = self.param(f'b_hh_l{layer}', lstm_uniform_init(H), (2, 3 * H))

            both = jnp.stack([inputs, inputs[:, ::-1]], axis=0)
            xw = jnp.einsum('dbtf,dfg->dbtg', both, w_ih.astype(self.dtype),
                            preferred_element_type=jnp.float32).astype(self.dtype)
            xw = xw + b_ih[:, None, None, :].astype(self.dtype)
            xw = jnp.transpose(xw, (2, 0, 1, 3))

            w_hh_c = w_hh.astype(self.dtype)
            b_hh_c = b_hh.astype(self.dtype)

            def step(h, xw_t):
                hw = jnp.einsum('dbh,dhg->dbg', h, w_hh_c,
                                preferred_element_type=jnp.float32
                                ).astype(h.dtype) + b_hh_c[:, None, :]
                r = jax.nn.sigmoid(xw_t[..., :H] + hw[..., :H])
                z = jax.nn.sigmoid(xw_t[..., H:2 * H] + hw[..., H:2 * H])
                n = jnp.tanh(xw_t[..., 2 * H:] + r * hw[..., 2 * H:])
                h = (1 - z) * n + z * h
                return h, h

            h0 = jnp.zeros((2, B, H), self.dtype)
            h_f, out = jax.lax.scan(step, h0, xw, unroll=self.unroll)
            fwd = jnp.transpose(out[:, 0], (1, 0, 2))
            bwd = jnp.transpose(out[:, 1], (1, 0, 2))[:, ::-1]
            layer_out = jnp.concatenate([fwd, bwd], axis=-1)
            hn_list += [h_f[0], h_f[1]]
            if layer + 1 < self.num_layers and self.dropout > 0.0:
                layer_out = nn.Dropout(rate=self.dropout)(
                    layer_out, deterministic=deterministic)
            inputs = layer_out
        return inputs, jnp.stack(hn_list, axis=0)
