#!/usr/bin/env python3
"""Measure bf16 gate nonlinearities in the fused LSTM kernel on the chip.

docs/KERNELS.md puts ~4µs/step of f32 VPU transcendentals on the fused
recurrence's critical path; this runs the kernel at the eval shape
(T=128, B=512, H=256, bf16 activations) with gates f32 vs bf16 and
reports per-layer time + numeric divergence, so the flag can be
accepted (plumbed into the eval path) or rejected with numbers.

All timings use a host-fetch barrier (block_until_ready returns at
enqueue through the remote relay).
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.ops.pallas.lstm_scan import lstm_scan_pallas


def run(T, B, H, dtype, gates_bf16, iters, warmup):
    rng = np.random.RandomState(0)
    xw = jnp.asarray(rng.randn(T, 2, B, 4 * H) * 0.5, dtype)
    w_hh = jnp.asarray(rng.randn(2, H, 4 * H) / np.sqrt(H), jnp.float32)
    out, _, _ = lstm_scan_pallas(xw, w_hh, gates_bf16=gates_bf16)
    np.asarray(out)
    for _ in range(warmup):
        out, _, _ = lstm_scan_pallas(xw, w_hh, gates_bf16=gates_bf16)
    np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out, _, _ = lstm_scan_pallas(xw, w_hh, gates_bf16=gates_bf16)
    host = np.asarray(out)
    dt = (time.perf_counter() - t0) / iters
    return dt, host


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--t', type=int, default=128)
    ap.add_argument('--b', type=int, default=512)
    ap.add_argument('--h', type=int, default=256)
    ap.add_argument('--iters', type=int, default=30)
    ap.add_argument('--warmup', type=int, default=5)
    ap.add_argument('--dtype', default='bf16', choices=['bf16', 'f32'])
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == 'bf16' else jnp.float32

    dt_f32, out_f32 = run(args.t, args.b, args.h, dtype, False,
                          args.iters, args.warmup)
    dt_bf16, out_bf16 = run(args.t, args.b, args.h, dtype, True,
                            args.iters, args.warmup)
    a = out_f32.astype(np.float32)
    b = out_bf16.astype(np.float32)
    max_abs = float(np.max(np.abs(a - b)))
    denom = np.maximum(np.abs(a), 1e-3)
    max_rel = float(np.max(np.abs(a - b) / denom))
    print(f'shape T={args.t} B={args.b} H={args.h} dtype={args.dtype}')
    print(f'gates f32 : {dt_f32 * 1e3:8.3f} ms/layer')
    print(f'gates bf16: {dt_bf16 * 1e3:8.3f} ms/layer '
          f'({dt_f32 / dt_bf16:.3f}x)')
    print(f'divergence: max_abs={max_abs:.3e} max_rel={max_rel:.3e}')


if __name__ == '__main__':
    main()
