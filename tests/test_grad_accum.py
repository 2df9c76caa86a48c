"""Gradient accumulation (train/steps._accumulate_grads): K microbatches
per optimizer update inside the jitted step. With dropout off and uniform
masks every loss term reduces identically, so accum=K must reproduce the
accum=1 update to float tolerance; mismatched batch sizes must fail loudly.

Reference scope: none — the reference trains single-GPU at B=32
(grounding/train.py:131-172) and has no accumulation. Beyond-parity
scaling surface for raising the effective batch past one chip's
activation memory.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.config import load_config
from shufflingvideosfortsg_tpu.models import build_model
from shufflingvideosfortsg_tpu.train.state import (create_train_state,
                                                   make_optimizer)
from shufflingvideosfortsg_tpu.train.steps import (make_baseline_train_step,
                                                   make_gmd_train_step)

B, T, N, Dv = 8, 16, 7, 32


def _params(**over):
    return load_config(None, overrides=dict(
        video_len=T, video_feature_dim=Dv, sent_len=N,
        sent_rnn_hiddendim=16, video_rnn_hiddendim=16,
        mlp_hidden_dim=16, span_hidden_dim=16, m_pred_hidden=16,
        dropout=0.0, disc_dropout=0.0, lr=1e-3, **over))


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    s = rng.randint(0, T - 4, B).astype(np.int32)
    e = (s + 2).astype(np.int32)
    return {
        'sent_feat': rng.randn(B, N, 300).astype(np.float32),
        'sent_mask': np.ones((B, N), np.int32),
        'video_feat': rng.randn(B, T, Dv).astype(np.float32),
        'video_mask': np.ones((B, T), np.int32),
        'nfeats': np.full((B,), T, np.int32),
        'framestps': np.stack([s, e], -1),
        'timestps': np.stack([s, e], -1).astype(np.float32),
        'duration': np.full((B,), float(T), np.float32),
        'temporal_labels': np.ones((B, T), np.int32),
        'fore_masks': np.ones((B, T), np.int32),
        'back_masks': np.ones((B, T), np.int32),
    }


def _gmd_setup(accum):
    params = _params(grad_accum_steps=accum)
    model = build_model(params, 'gmd')
    mt = np.ones((2, T), np.int32)
    mn = np.ones((2, N), np.int32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((2, N, 300), np.float32), mn,
        np.zeros((2, T, Dv), np.float32), mt,
        np.zeros((2, T, Dv), np.float32), mt, mt, mt, mt, mt, mt, mt)
    variables = jax.device_get(variables)
    tx = make_optimizer(params, steps_per_epoch=10)
    state = create_train_state(variables['params'], tx)
    return make_gmd_train_step(model, params), state


def _run(step, state, n_steps=1):
    key = jax.random.PRNGKey(7)
    for i in range(n_steps):
        key, sk = jax.random.split(key)
        state, metrics = step(state, _batch(i), sk)
    return state, metrics


def test_gmd_accum_equals_single_update():
    # Compare at step 1: both runs evaluate the SAME initial params, so the
    # loss/miou must agree to float noise (only matmul tiling differs
    # between the [8,...] and [2,...] microbatch shapes). Post-update params
    # get a realistic tolerance — Adam's first step is sign-like
    # (lr*g/(|g|+eps)), so ~1e-6 grad noise moves params by ~lr*noise.
    step1, state1 = _gmd_setup(1)
    step4, state4 = _gmd_setup(4)
    s1, m1 = _run(step1, state1)
    s4, m4 = _run(step4, state4)
    np.testing.assert_allclose(float(m4['loss']), float(m1['loss']),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m4['miou']), float(m1['miou']),
                               rtol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(s1.params)[0],
            jax.tree_util.tree_flatten_with_path(s4.params)[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-5, err_msg=str(pa))


def test_baseline_accum_equals_single_update():
    def setup(accum):
        params = _params(grad_accum_steps=accum)
        model = build_model(params, 'baseline')
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), np.zeros((2, T, Dv), np.float32),
            np.zeros((2, N, 300), np.float32), np.ones((2, T), np.int32),
            np.ones((2, N), np.int32))
        variables = jax.device_get(variables)
        tx = make_optimizer(params, steps_per_epoch=10)
        return (make_baseline_train_step(model, params),
                create_train_state(variables['params'], tx))

    step1, state1 = setup(1)
    step2, state2 = setup(2)
    s1, m1 = _run(step1, state1)
    s2, m2 = _run(step2, state2)
    np.testing.assert_allclose(float(m2['loss']), float(m1['loss']),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-5)


def test_accum_must_divide_batch():
    step3, state3 = _gmd_setup(3)  # B=8 not divisible by 3
    with pytest.raises(ValueError, match='grad_accum_steps'):
        step3(state3, _batch(0), jax.random.PRNGKey(0))


def test_accum_composes_with_data_parallel():
    """SCALING.md claims accumulation composes with DP: the in-jit scan
    sits inside the same pjit, so a data-sharded batch reshaped to
    [accum, B/accum, ...] must produce the same update as the accum=1
    single-placement oracle. B=16, accum=2 keeps each microbatch (8)
    divisible by the 8-device data axis."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from shufflingvideosfortsg_tpu.parallel.mesh import (DATA_AXIS,
                                                         create_mesh)
    mesh = create_mesh([8])
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def big_batch(seed=0):
        b = {k: np.concatenate([v, v], 0)
             for k, v in _batch(seed).items()}
        return b

    step1, state1 = _gmd_setup(1)
    step2, state2 = _gmd_setup(2)
    key = jax.random.PRNGKey(7)
    s1, m1 = step1(state1, big_batch(), key)
    sharded = {k: jax.device_put(v, sharding)
               for k, v in big_batch().items()}
    s2, m2 = step2(state2, sharded, key)
    np.testing.assert_allclose(float(m2['loss']), float(m1['loss']),
                               rtol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(s1.params)[0],
            jax.tree_util.tree_flatten_with_path(s2.params)[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-5, err_msg=str(pa))
