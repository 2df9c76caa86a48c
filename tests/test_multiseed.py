"""Multi-seed vmapped training (train/multiseed.py): S seeds trained in
one jitted step must reproduce S independent single-seed runs given the
same per-seed keys, and the stacked state must slice back losslessly.

Reference scope: none — the reference trains one seed per process
(grounding/train.py); this is the TPU-native ensemble-in-one-program
surface.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.config import load_config
from shufflingvideosfortsg_tpu.models import build_model
from shufflingvideosfortsg_tpu.train.multiseed import (
    init_multiseed_states, make_multiseed_train_step,
    make_multiseed_valid_step, n_seeds_of, stack_states, unstack_state)
from shufflingvideosfortsg_tpu.train.state import (create_train_state,
                                                   make_optimizer)
from shufflingvideosfortsg_tpu.train.steps import (make_gmd_train_step,
                                                   make_gmd_valid_step)

B, T, N, Dv = 4, 16, 7, 32
SEEDS = (3, 11)


def _params():
    return load_config(None, overrides=dict(
        video_len=T, video_feature_dim=Dv, sent_len=N,
        sent_rnn_hiddendim=16, video_rnn_hiddendim=16,
        mlp_hidden_dim=16, span_hidden_dim=16, m_pred_hidden=16,
        dropout=0.5, disc_dropout=0.5, lr=1e-3))


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


@pytest.fixture(scope="module")
def setup():
    params = _params()
    model = build_model(params, 'gmd')
    mt = np.ones((2, T), np.int32)
    mn = np.ones((2, N), np.int32)

    def init_fn(key):
        return jax.jit(model.init)(
            key, np.zeros((2, N, 300), np.float32), mn,
            np.zeros((2, T, Dv), np.float32), mt,
            np.zeros((2, T, Dv), np.float32), mt,
            mt, mt, mt, mt, mt, mt)['params']

    tx = make_optimizer(params, steps_per_epoch=10)
    step = make_gmd_train_step(model, params)
    return params, model, init_fn, tx, step


def test_stack_unstack_roundtrip(setup):
    params, model, init_fn, tx, step = setup
    stacked = init_multiseed_states(init_fn, SEEDS, tx)
    assert n_seeds_of(stacked) == 2
    s0 = create_train_state(jax.device_get(
        init_fn(jax.random.PRNGKey(SEEDS[0]))), tx)
    back = unstack_state(stacked, 0)
    for a, b in zip(jax.tree.leaves(back.params),
                    jax.tree.leaves(s0.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vmapped_equals_sequential(setup):
    """Two steps of the S=2 vmapped GMD train step (dropout + on-device
    augmentation LIVE — per-seed keys drive both) == two independent
    single-seed runs fed the same per-seed key stream."""
    params, model, init_fn, tx, step = setup
    mstep = make_multiseed_train_step(step, len(SEEDS))
    stacked = init_multiseed_states(init_fn, SEEDS, tx)
    key = jax.random.PRNGKey(42)
    k = key
    for i in range(2):
        k, sk = jax.random.split(k)
        stacked, mmetrics = mstep(stacked, _batch(i), sk)
    assert mmetrics['loss'].shape == (2,)

    for si, seed in enumerate(SEEDS):
        state = create_train_state(
            jax.device_get(init_fn(jax.random.PRNGKey(seed))), tx)
        k = key
        for i in range(2):
            k, sk = jax.random.split(k)
            seed_key = jax.random.split(sk, len(SEEDS))[si]
            state, metrics = step(state, _batch(i), seed_key)
        np.testing.assert_allclose(
            float(mmetrics['loss'][si]), float(metrics['loss']), rtol=1e-5)
        got = unstack_state(stacked, si)
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_flatten_with_path(got.params)[0],
                jax.tree_util.tree_flatten_with_path(state.params)[0]):
            assert pa == pb
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=f'seed {seed}: {pa}')


def test_multiseed_fsdp_rejected():
    """--multi_seed + --fsdp is a documented exclusion (docs/SCALING.md
    composition matrix): the stacked seed axis changes every leaf shape
    the ZeRO-3 placement rule keys on. The driver must refuse loudly up
    front, before any checkpoint or data is touched."""
    from shufflingvideosfortsg_tpu.cli import _multiseed_validate
    with pytest.raises(ValueError, match='multi_seed does not compose'):
        _multiseed_validate(dict(multi_seed=4, fsdp=True))
    with pytest.raises(ValueError, match='cannot resume'):
        _multiseed_validate(dict(multi_seed=4, start_from='x.ckp'))
    assert _multiseed_validate(dict(multi_seed=4)) == 4
    assert _multiseed_validate(dict(multi_seed=0, fsdp=True)) == 0


def test_vmapped_fused_scdm(rng):
    """jax.vmap over a leading seed axis of the fused SCDM kernel (what
    the multi-seed trainer does to every pallas_call in the train step)
    must equal the per-seed unbatched kernel. Regression: the 1-D ``w``
    operand used to batch to an [S, Dh] block that violates Mosaic's
    (8, 128) tiling rule on real TPU."""
    from jax.experimental.pallas import tpu as pltpu
    from shufflingvideosfortsg_tpu.ops.attention import scdm_attention
    from shufflingvideosfortsg_tpu.ops.pallas.scdm_fused import (
        scdm_attention_fused)
    S, Bb, Tt, Dh, Nn, Ds = 3, 8, 16, 32, 5, 24
    vp = rng.randn(S, Bb, Tt, Dh).astype(np.float32)
    sp = rng.randn(S, Bb, Nn, Dh).astype(np.float32)
    w = rng.randn(S, Dh).astype(np.float32)
    sf = rng.randn(S, Bb, Nn, Ds).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = jax.vmap(lambda a, b, c, d: scdm_attention_fused(
            a, b, c, d, block_b=8))(vp, sp, w, sf)
    want = jax.vmap(scdm_attention)(vp, sp, w, sf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_multiseed_valid_step(setup):
    params, model, init_fn, tx, step = setup
    vstep = make_gmd_valid_step(model, params)
    mvalid = make_multiseed_valid_step(vstep)
    stacked = init_multiseed_states(init_fn, SEEDS, tx)
    key = jax.random.PRNGKey(5)
    mout = jax.device_get(mvalid(stacked.params, _batch(0), key))
    for si, seed in enumerate(SEEDS):
        p = jax.device_get(init_fn(jax.random.PRNGKey(seed)))
        out = jax.device_get(vstep(p, _batch(0), key))
        np.testing.assert_allclose(float(mout['loss'][si]),
                                   float(out['loss']), rtol=1e-5)
        np.testing.assert_allclose(float(mout['miou'][si]),
                                   float(out['miou']), rtol=1e-5)
        np.testing.assert_allclose(mout['pred_time'][si],
                                   out['pred_time'], rtol=1e-4, atol=1e-5)
