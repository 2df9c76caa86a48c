#!/usr/bin/env python3
"""Per-stage breakdown of the GMD train step (the 3k-pairs/s question).

VERDICT r2 item 2 asks for BENCH train >= 3k pairs/s *or* a measured
per-stage note. This times, each chained inside one jit (same
discipline as tools/profile_serving.py):

  fwd_loss    the 4-term loss forward (incl. on-device pseudo-video gen)
  grad        jax.value_and_grad of the same
  full_step   grad + Adam update (the benched step, minus dispatch)

and prints ms/call + pairs/s for each, so the distance between the
forward's rate and the full step's rate is attributable to backward +
optimizer arithmetic rather than guessed at.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shufflingvideosfortsg_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from shufflingvideosfortsg_tpu.config import load_config          # noqa: E402
from shufflingvideosfortsg_tpu.models import build_model          # noqa: E402
from shufflingvideosfortsg_tpu.train.state import (create_train_state,  # noqa: E402
                                                   make_optimizer)
from shufflingvideosfortsg_tpu.train.steps import make_gmd_train_step  # noqa: E402


def timed(fn, args, reps, warmup=True):
    @jax.jit
    def chain(*a):
        def body(carry, _):
            out = fn(*a)
            leaves = [l for l in jax.tree_util.tree_leaves(out)
                      if hasattr(l, 'dtype')
                      and jnp.issubdtype(l.dtype, jnp.floating)]
            s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
            return carry + s * 1e-20, None
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return carry

    if warmup:
        np.asarray(chain(*args))
    t0 = time.perf_counter()
    np.asarray(chain(*args))
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dataset', default='anet',
                    choices=['anet', 'charades'])
    ap.add_argument('--batch', type=int, default=64)
    ap.add_argument('--reps', type=int, default=10)
    ap.add_argument('--precision', default='bf16')
    args = ap.parse_args()

    T = 240 if args.dataset == 'anet' else 128
    N = 25 if args.dataset == 'anet' else 15
    B = args.batch
    params = load_config(None, overrides=dict(
        video_len=T, sent_len=N, video_feature_dim=1024,
        precision=args.precision))
    model = build_model(params, 'gmd')

    rng = np.random.RandomState(0)
    nfeats = np.full((B,), T, np.int32)
    s = rng.randint(0, T - 30, B).astype(np.int32)
    e = (s + rng.randint(5, 25, B)).astype(np.int32)
    batch = {
        'sent_feat': jnp.asarray(rng.randn(B, N, 300), jnp.float32),
        'sent_mask': jnp.ones((B, N), jnp.int32),
        'video_feat': jnp.asarray(rng.randn(B, T, 1024), jnp.float32),
        'video_mask': jnp.ones((B, T), jnp.int32),
        'nfeats': jnp.asarray(nfeats),
        'framestps': jnp.asarray(np.stack([s, e], -1)),
        'timestps': jnp.asarray(np.stack([s, e], -1).astype(np.float32)),
        'duration': jnp.full((B,), float(T), jnp.float32),
        'temporal_labels': jnp.ones((B, T), jnp.int32),
        'fore_masks': jnp.ones((B, T), jnp.int32),
        'back_masks': jnp.ones((B, T), jnp.int32),
    }

    mt = jnp.ones((2, T), jnp.int32)
    mn = jnp.ones((2, N), jnp.int32)
    v2 = jnp.zeros((2, T, 1024))
    s2 = jnp.zeros((2, N, 300))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), s2, mn, v2, mt,
                                    v2, mt, mt, mt, mt, mt, mt, mt)
    tx = make_optimizer(params, steps_per_epoch=100)
    state = create_train_state(variables['params'], tx)
    step = make_gmd_train_step(model, params)
    loss_fn = step.loss_fn
    key = jax.random.PRNGKey(1)

    from shufflingvideosfortsg_tpu.ops.augment_device import (
        gt_translate_batch)
    aug_key, dropout_key = jax.random.split(key)

    def make_pseudo(k, b):
        feat, fstps, masks = gt_translate_batch(k, b['video_feat'],
                                                b['framestps'], b['nfeats'])
        return {'video_feat': feat, 'framestps': fstps,
                'video_mask': masks['video_mask'],
                'temporal_labels': masks['temporal_labels'],
                'fore_masks': masks['fore_masks'],
                'back_masks': masks['back_masks']}

    pseudo = jax.jit(make_pseudo)(aug_key, batch)

    res = {}
    res['full_step'] = timed(
        lambda st, b, k: step.inner(st, b, k)[1], (state, batch, key),
        args.reps)
    res['pseudo_gen'] = timed(
        lambda k, b: make_pseudo(k, b)['video_feat'], (aug_key, batch),
        args.reps)
    res['fwd_loss'] = timed(
        lambda p, b, ps, k: loss_fn(p, b, ps, k)[0],
        (state.params, batch, pseudo, dropout_key), args.reps)
    res['grad'] = timed(
        lambda p, b, ps, k: jax.grad(
            lambda pp: loss_fn(pp, b, ps, k)[0])(p),
        (state.params, batch, pseudo, dropout_key), args.reps)

    print(json.dumps({
        'config': {'dataset': args.dataset, 'T': T, 'B': B,
                   'reps': args.reps, 'precision': args.precision},
        'stages_ms': {k: round(v * 1e3, 2) for k, v in res.items()},
        'pairs_per_s': {k: round(B / v, 1) for k, v in res.items()},
    }, indent=1), flush=True)


if __name__ == '__main__':
    main()
