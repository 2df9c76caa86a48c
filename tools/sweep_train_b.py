#!/usr/bin/env python3
"""Batch-size sweep of the full train step, with and without remat.

docs/KERNELS.md's round-3 sweep found a 40% throughput cliff past B=96
(the backward's saved-activation working set spills HBM). ``remat: true``
wraps each QAVE block in jax.checkpoint so the backward recomputes block
activations instead of saving them; this sweep measures whether that
recovers the large-B regime.

  python tools/sweep_train_b.py --dataset anet --batches 64 96 128 192 256

Timing protocol: the state threads through an in-jit lax.scan of
``--chunk`` steps (the driver's chunked dispatch shape), one D2H fetch
per measurement, median of --reps; same-key pseudo draws. Prints one JSON
line per (B, remat) cell.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

if os.environ.get('SVTSG_PLATFORM'):
    jax.config.update('jax_platforms', os.environ['SVTSG_PLATFORM'])

import jax.numpy as jnp  # noqa: E402

from shufflingvideosfortsg_tpu.config import load_config  # noqa: E402
from shufflingvideosfortsg_tpu.models import build_model  # noqa: E402
from shufflingvideosfortsg_tpu.train.state import (  # noqa: E402
    create_train_state, make_optimizer)
from shufflingvideosfortsg_tpu.train.steps import (  # noqa: E402
    make_gmd_train_step)
from shufflingvideosfortsg_tpu.utils.cache import (  # noqa: E402
    enable_compilation_cache)

enable_compilation_cache()


def make_batch(B, T, N, rng):
    s = rng.randint(0, T - 30, B).astype(np.int32)
    e = (s + rng.randint(5, 25, B)).astype(np.int32)
    return {
        'sent_feat': jnp.asarray(rng.randn(B, N, 300), jnp.float32),
        'sent_mask': jnp.ones((B, N), jnp.int32),
        'video_feat': jnp.asarray(rng.randn(B, T, 1024), jnp.float32),
        'video_mask': jnp.ones((B, T), jnp.int32),
        'nfeats': jnp.full((B,), T, jnp.int32),
        'framestps': jnp.asarray(np.stack([s, e], -1)),
        'timestps': jnp.asarray(np.stack([s, e], -1), jnp.float32),
        'duration': jnp.full((B,), float(T), jnp.float32),
        'temporal_labels': jnp.ones((B, T), jnp.int32),
        'fore_masks': jnp.ones((B, T), jnp.int32),
        'back_masks': jnp.ones((B, T), jnp.int32),
    }


def cell(B, remat, T, N, chunk, reps, precision):
    params = load_config(None, overrides=dict(
        video_len=T, sent_len=N, video_feature_dim=1024,
        precision=precision, remat=remat))
    model = build_model(params, 'gmd')
    rng = np.random.RandomState(0)
    batch = make_batch(B, T, N, rng)
    mt = jnp.ones((2, T), jnp.int32)
    mn = jnp.ones((2, N), jnp.int32)
    v2 = jnp.zeros((2, T, 1024))
    s2 = jnp.zeros((2, N, 300))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), s2, mn, v2, mt,
                                    v2, mt, mt, mt, mt, mt, mt, mt)
    tx = make_optimizer(params, steps_per_epoch=100)
    state = create_train_state(variables['params'], tx)
    inner = make_gmd_train_step(model, params).inner

    @jax.jit
    def run_chunk(st, b, k0):
        def body(carry, i):
            st, k = carry
            k, sk = jax.random.split(k)
            st, m = inner(st, b, sk)
            return (st, k), m['loss']
        (st, _), losses = jax.lax.scan(body, (st, k0),
                                       jnp.arange(chunk))
        return st, losses[-1]

    # warm (compile) + measure
    state, _ = run_chunk(state, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(state.params)
    times = []
    for r in range(reps):
        t0 = time.perf_counter()
        state, last = run_chunk(state, batch, jax.random.PRNGKey(2 + r))
        jax.block_until_ready(last)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[len(times) // 2]
    pairs_s = B * chunk / med
    return dict(metric='train_pairs_per_sec_sweep', value=round(pairs_s, 1),
                unit='pairs/s',
                config=dict(B=B, remat=bool(remat), T=T, chunk=chunk,
                            reps=reps, median_chunk_s=round(med, 4),
                            loss=round(float(last), 3)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dataset', default='anet',
                    choices=['anet', 'charades'])
    ap.add_argument('--batches', type=int, nargs='+',
                    default=[64, 96, 128, 192, 256])
    ap.add_argument('--chunk', type=int, default=8)
    ap.add_argument('--reps', type=int, default=5)
    ap.add_argument('--precision', default='bf16')
    args = ap.parse_args()
    T = 240 if args.dataset == 'anet' else 128
    N = 25 if args.dataset == 'anet' else 15
    for remat in (False, True):
        for B in args.batches:
            rec = cell(B, remat, T, N, args.chunk, args.reps,
                       args.precision)
            print(json.dumps(rec), flush=True)


if __name__ == '__main__':
    main()
