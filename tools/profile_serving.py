#!/usr/bin/env python3
"""Per-stage breakdown of the T=1024 multi-query serving path.

VERDICT r2 weak #1: `serve_cached` at T=1024/Q=256 measured 1,546 q/s
while a naive 8x-sequence-length scaling of the T=128 eval rate predicts
~4.9k. This tool times every stage of the path with the stage chained K
times inside ONE jit — the same discipline as the KERNELS.md matmul
measurements, so neither per-call dispatch nor remote-relay variance can
leak into the numbers — and prints q/s + ms/call per stage alongside the
full step. The resulting breakdown lives in docs/KERNELS.md ("T=1024
serving").

Reference anchor: BASELINE.json configs[4] (N queries x 1 long video);
the model stages mirror GMD.serve_cached (models/gmd.py).
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
from shufflingvideosfortsg_tpu.models.components import cmi_apply  # noqa: E402
from shufflingvideosfortsg_tpu.ops.span import span_decode        # noqa: E402


def timed_chain(fn, args, reps, perturb=0, warmup=True):
    """Median-free dispatch-clean timing: chain calls of ``fn`` inside
    one jit, making the perturbed argument depend on the previous
    iteration's output so XLA cannot CSE the repeats.

    Times chains of length ``reps`` and ``2*reps`` and returns the SLOPE
    ((t2 - t1) / reps): the single scalar fetch ending a chain costs
    ~25-35 ms through this image's relay, which would otherwise inflate
    every stage by ~30/reps ms; the slope cancels that fixed term."""

    def make_chain(length):
        @jax.jit
        def chain(*a):
            x0 = a[perturb]

            def body(carry, _):
                a2 = list(a)
                a2[perturb] = x0 + carry * jnp.asarray(1e-12, x0.dtype)
                out = fn(*a2)
                leaves = [l for l in jax.tree_util.tree_leaves(out)
                          if jnp.issubdtype(l.dtype, jnp.floating)]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--t', type=int, default=1024)
    ap.add_argument('--q', type=int, default=256)
    ap.add_argument('--n', type=int, default=15)
    ap.add_argument('--reps', type=int, default=20)
    ap.add_argument('--d', type=int, default=1024)
    args = ap.parse_args()
    T, Q, N = args.t, args.q, args.n

    params = load_config(None, overrides=dict(video_feature_dim=args.d))
    model = build_model(params, 'gmd', inference=True)

    rng = np.random.RandomState(0)
    video = jnp.asarray(rng.randn(1, T, args.d), jnp.float32)
    queries = jnp.asarray(rng.randn(Q, N, 300), jnp.float32)

    mt = jnp.ones((2, 8), jnp.int32)
    mn = jnp.ones((2, N), jnp.int32)
    v2 = jnp.zeros((2, 8, args.d))
    s2 = jnp.zeros((2, N, 300))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), s2, mn, v2, mt,
                                    v2, mt, mt, mt, mt, mt, mt, mt)
    p = variables['params']

    def apply(method, *a):
        return model.apply({'params': p}, *a, method=method)

    # real intermediates for stage inputs
    rnn0 = apply(model.precompute_video, video)
    word_feat, sent_embed = apply(
        lambda m, q: m.sentence_encoder(q, True), queries)
    rnn0_b = jnp.broadcast_to(rnn0, (Q,) + rnn0.shape[1:])
    rnn0_b = jax.device_put(np.asarray(rnn0_b))  # materialized [Q, T, 2H]
    frame_feat = apply(
        lambda m, r, w: m.video_encoder.finish_from_rnn0(r, w),
        rnn0_b, word_feat)
    gated = apply(
        lambda m, f, w, s: m.csmm(f, s, None, True)[0][:, :, None]
        * cmi_apply(m.cross_name, f, w, s), frame_feat, word_feat,
        sent_embed)

    stages = {}

    stages['full_serve_cached'] = timed_chain(
        lambda pp, r, q: model.apply({'params': pp}, r, q,
                                     method=model.serve_cached),
        (p, rnn0, queries), args.reps, perturb=2)

    stages['sentence_encoder'] = timed_chain(
        lambda pp, q: model.apply(
            {'params': pp}, q, method=lambda m, qq: m.sentence_encoder(
                qq, True)), (p, queries), args.reps, perturb=1)

    stages['encoder_finish_from_rnn0'] = timed_chain(
        lambda pp, r, w: model.apply(
            {'params': pp}, r, w,
            method=lambda m, rr, ww: m.video_encoder.finish_from_rnn0(
                rr, ww)), (p, rnn0_b, word_feat), args.reps, perturb=1)

    # block-0 gate alone (SCDM + channel gate at [Q, T, 2H])
    stages['block0_gate_scdm'] = timed_chain(
        lambda pp, r, w: model.apply(
            {'params': pp}, r, w,
            method=lambda m, rr, ww: m.video_encoder.blocks[0].apply_gate(
                rr, ww)), (p, rnn0_b, word_feat), args.reps, perturb=1)

    # block-1 full (recurrence at B=Q, T)
    gated0 = apply(lambda m, r, w: m.video_encoder.blocks[0].apply_gate(
        r, w), rnn0_b, word_feat)
    stages['block1_full'] = timed_chain(
        lambda pp, x, w: model.apply(
            {'params': pp}, x, w,
            method=lambda m, xx, ww: m.video_encoder.blocks[1](
                xx, ww, True)), (p, gated0, word_feat), args.reps,
        perturb=1)

    stages['csmm_cmi_gate'] = timed_chain(
        lambda pp, f, w, s: model.apply(
            {'params': pp}, f, w, s,
            method=lambda m, ff, ww, ss: m.csmm(ff, ss, None, True)[0][
                :, :, None] * cmi_apply(m.cross_name, ff, ww, ss)),
        (p, frame_feat, word_feat, sent_embed), args.reps, perturb=1)

    stages['span_predictor'] = timed_chain(
        lambda pp, g: model.apply(
            {'params': pp}, g,
            method=lambda m, gg: m.span_predictor(gg, v_mask=None,
                                                  deterministic=True)),
        (p, gated), args.reps, perturb=1)

    sp, ep = apply(lambda m, gg: m.span_predictor(gg, v_mask=None,
                                                  deterministic=True), gated)
    stages['span_decode'] = timed_chain(
        lambda s, e: span_decode(s, e), (sp, ep), args.reps, perturb=0)

    full = stages['full_serve_cached']
    print(json.dumps({
        'config': {'T': T, 'Q': Q, 'N': N, 'D': args.d, 'reps': args.reps},
        'full_queries_per_sec': round(Q / full, 1),
        'stages_ms': {k: round(v * 1e3, 3) for k, v in stages.items()},
        'stage_share_pct': {
            k: round(100 * v / full, 1) for k, v in stages.items()
            if k != 'full_serve_cached'},
    }, indent=1), flush=True)


if __name__ == '__main__':
    main()
