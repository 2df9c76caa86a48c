#!/usr/bin/env python3
"""Per-stage breakdown of the GMD train step (the 3k-pairs/s question).

VERDICT r2 item 2 asks for BENCH train >= 3k pairs/s *or* a measured
per-stage note. This times, each chained inside one jit with a
carry-dependent input perturbation (same discipline as
tools/profile_serving.py — without it XLA hoists the loop-invariant call
out of the scan and the stage reads absurdly fast):

  full_step    the benched step, state threaded through the scan
  pseudo_gen   on-device gt_translate pseudo-video generation
  fwd_loss     the 4-term loss forward (dropout on, as trained)
  fwd_model    model forward only, dropout on
  fwd_nodrop   model forward only, dropout off (sizes the RNG+mask cost)
  grad         jax.grad of the loss

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


def timed(fn, args, reps, perturb, warmup=True):
    """Time chained calls of ``fn`` inside one jit. ``perturb`` maps
    (list(args), carry) -> args with the carry folded into one input so
    XLA cannot CSE or hoist the repeated call.

    Runs chains of length ``reps`` and ``2*reps`` and returns the SLOPE
    ((t2 - t1) / reps): through this image's relay the single scalar
    fetch that ends a chain costs ~25-35 ms, which would otherwise
    inflate every stage by ~30/reps ms (it made pseudo_gen read 3.25 ms
    when the real cost is ~0.3 ms). The slope cancels the fixed
    fetch+dispatch term exactly."""

    def make_chain(length):
        @jax.jit
        def chain(*a):
            def body(carry, _):
                out = fn(*perturb(list(a), carry))
                leaves = [l for l in jax.tree_util.tree_leaves(out)
                          if hasattr(l, 'dtype')
                          and jnp.issubdtype(l.dtype, jnp.floating)]
                s = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
                return s * 1e-20, None
            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=length)
            return carry
        return chain

    c1, c2 = make_chain(reps), make_chain(2 * reps)
    if warmup:
        np.asarray(c1(*args))
        np.asarray(c2(*args))
    t0 = time.perf_counter()
    np.asarray(c1(*args))
    t1 = time.perf_counter()
    np.asarray(c2(*args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / reps


def perturb_dict(i, key_name='video_feat'):
    def p(a, carry):
        d = dict(a[i])
        d[key_name] = d[key_name] + carry.astype(d[key_name].dtype)
        a[i] = d
        return a
    return p


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

    # full step: thread the state through the scan — the real sequential
    # dependency of a training loop, un-hoistable by construction; same
    # two-length slope as timed()
    def make_step_chain(length):
        @jax.jit
        def chain_step(st0, b, k0):
            def body(carry, _):
                st, k = carry
                k, sk = jax.random.split(k)
                st, aux = step.inner(st, b, sk)
                return (st, k), aux['loss']
            (_, _), losses = jax.lax.scan(body, (st0, k0), None,
                                          length=length)
            return losses[-1]
        return chain_step

    sc1 = make_step_chain(args.reps)
    sc2 = make_step_chain(2 * args.reps)
    np.asarray(sc1(state, batch, key))
    np.asarray(sc2(state, batch, key))
    t0 = time.perf_counter()
    np.asarray(sc1(state, batch, key))
    t1 = time.perf_counter()
    np.asarray(sc2(state, batch, key))
    res['full_step'] = ((time.perf_counter() - t1) - (t1 - t0)) / args.reps

    res['pseudo_gen'] = timed(
        lambda k, b: make_pseudo(k, b)['video_feat'], (aug_key, batch),
        args.reps, perturb_dict(1))
    res['fwd_loss'] = timed(
        lambda p, b, ps, k: loss_fn(p, b, ps, k)[0],
        (state.params, batch, pseudo, dropout_key), args.reps,
        perturb_dict(1))

    def fwd_model(p, b, ps, k, det):
        rngs = None if det else {'dropout': k}
        out = model.apply(
            {'params': p}, b['sent_feat'], b['sent_mask'],
            b['video_feat'], b['video_mask'],
            ps['video_feat'], ps['video_mask'],
            b['temporal_labels'], b['fore_masks'], b['back_masks'],
            ps['temporal_labels'], ps['fore_masks'], ps['back_masks'],
            deterministic=det, rngs=rngs)
        return out['start_prob']

    res['fwd_model'] = timed(
        lambda p, b, ps, k: fwd_model(p, b, ps, k, False),
        (state.params, batch, pseudo, dropout_key), args.reps,
        perturb_dict(1))
    res['fwd_nodrop'] = timed(
        lambda p, b, ps, k: fwd_model(p, b, ps, k, True),
        (state.params, batch, pseudo, dropout_key), args.reps,
        perturb_dict(1))
    res['grad'] = timed(
        lambda p, b, ps, k: jax.grad(
            lambda pp: loss_fn(pp, b, ps, k)[0])(p),
        (state.params, batch, pseudo, dropout_key), args.reps,
        perturb_dict(1))

    print(json.dumps({
        'config': {'dataset': args.dataset, 'T': T, 'B': B,
                   'reps': args.reps, 'precision': args.precision},
        'stages_ms': {k: round(v * 1e3, 2) for k, v in res.items()},
        'pairs_per_s': {k: round(B / v, 1) for k, v in res.items()},
    }, indent=1), flush=True)


if __name__ == '__main__':
    main()
