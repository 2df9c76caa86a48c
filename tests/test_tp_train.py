"""Tensor-parallel GMD TRAINING (train/tp.py): the full 4-term train
step with the video recurrences hidden-sharded over a 'model' mesh must
reproduce the unsharded train step — same loss, same parameters after
optimizer updates (i.e. same gradients) — with dropout off; dropout>0
must run and stay finite (mask streams differ by design); the CLI
composition rules must reject invalid combinations.

Reference scope: none — the reference is single-GPU DataParallel
(grounding/train.py:343)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.config import load_config
from shufflingvideosfortsg_tpu.models import build_model
from shufflingvideosfortsg_tpu.parallel.tensor_parallel import create_tp_mesh
from shufflingvideosfortsg_tpu.train.state import (create_train_state,
                                                   make_optimizer)
from shufflingvideosfortsg_tpu.train.steps import make_gmd_train_step
from shufflingvideosfortsg_tpu.train.tp import make_gmd_tp_train_step

B, T, N, Dv, MP = 8, 16, 7, 32, 4


def _params(**over):
    base = dict(
        video_len=T, video_feature_dim=Dv, sent_len=N,
        sent_rnn_hiddendim=16, video_rnn_hiddendim=16,
        mlp_hidden_dim=16, span_hidden_dim=16, m_pred_hidden=16,
        dropout=0.0, disc_dropout=0.0, lr=1e-3, tensor_parallel=MP)
    base.update(over)
    return load_config(None, overrides=base)


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


def _init(params):
    model = build_model(params, 'gmd')
    mt = np.ones((2, T), np.int32)
    mn = np.ones((2, N), np.int32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((2, N, 300), np.float32), mn,
        np.zeros((2, T, Dv), np.float32), mt,
        np.zeros((2, T, Dv), np.float32), mt, mt, mt, mt, mt, mt, mt)
    tx = make_optimizer(params, steps_per_epoch=10)
    return model, jax.device_get(variables['params']), tx


def _run(step, state, n_steps=2):
    batch = {k: jnp.asarray(v) for k, v in _batch().items()}
    metrics = None
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
    return state, {k: float(v) for k, v in metrics.items()}


@pytest.mark.parametrize('dp,mp', [(1, 4), (2, 4)])
def test_tp_step_equals_plain(dp, mp):
    """1x4 pure-model and 2x4 data-x-model: loss metrics match per step
    and the updated parameter trees match after 2 Adam updates (so every
    gradient matched), dropout off on both sides."""
    params = _params()
    model, p0, tx = _init(params)
    mesh = create_tp_mesh(dp, mp)

    plain = make_gmd_train_step(model, params)
    st_plain, m_plain = _run(plain, create_train_state(p0, tx))

    tp = make_gmd_tp_train_step(model, params, mesh, train_dropout=False)
    st_tp, m_tp = _run(tp, create_train_state(p0, tx))

    for k in m_plain:
        assert m_plain[k] == pytest.approx(m_tp[k], rel=2e-4, abs=2e-5), k

    got = jax.device_get(st_tp.params)
    want = jax.device_get(st_plain.params)
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    flat_w = {jax.tree_util.keystr(kp): v
              for kp, v in jax.tree_util.tree_leaves_with_path(want)}
    for kp, g in flat_g:
        w = flat_w[jax.tree_util.keystr(kp)]
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-4, atol=5e-6,
                                   err_msg=jax.tree_util.keystr(kp))


def test_tp_grad_accum_equals_plain():
    """grad_accum_steps>1 composes with the TP step (the SCALING.md
    composition-matrix claim): accumulated TP updates equal the
    accumulated plain updates, dropout off."""
    params = _params(grad_accum_steps=2)
    model, p0, tx = _init(params)
    mesh = create_tp_mesh(2, MP)

    plain = make_gmd_train_step(model, params)
    st_plain, m_plain = _run(plain, create_train_state(p0, tx))

    tp = make_gmd_tp_train_step(model, params, mesh, train_dropout=False)
    st_tp, m_tp = _run(tp, create_train_state(p0, tx))

    for k in m_plain:
        assert m_plain[k] == pytest.approx(m_tp[k], rel=2e-4, abs=2e-5), k
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(jax.device_get(st_tp.params)),
            jax.tree_util.tree_leaves_with_path(
                jax.device_get(st_plain.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-6,
                                   err_msg=jax.tree_util.keystr(kp))


def test_tp_step_with_dropout_runs_finite():
    """dropout>0: the TP mask stream differs from the flax module's by
    design (distribution-equal); the step must run and stay finite."""
    params = _params(dropout=0.5, disc_dropout=0.5)
    model, p0, tx = _init(params)
    mesh = create_tp_mesh(2, MP)
    tp = make_gmd_tp_train_step(model, params, mesh)
    st, m = _run(tp, create_train_state(p0, tx), n_steps=2)
    assert np.isfinite(m['loss'])
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree_util.tree_leaves(st.params))


def test_tp_cli_validation():
    from shufflingvideosfortsg_tpu.cli import _tp_validate
    assert _tp_validate(_params(tensor_parallel=0)) == 0
    assert _tp_validate(_params(tensor_parallel=1)) == 0
    assert _tp_validate(_params(tensor_parallel=2)) == 2
    with pytest.raises(ValueError, match='fsdp'):
        _tp_validate(_params(tensor_parallel=2, fsdp=True))
    with pytest.raises(ValueError, match='multi_seed'):
        _tp_validate(_params(tensor_parallel=2, multi_seed=3))
    with pytest.raises(ValueError, match='video_rnn_hiddendim'):
        _tp_validate(_params(tensor_parallel=2, video_rnn_hiddendim=15))
    from shufflingvideosfortsg_tpu.cli import _pipeline_validate
    with pytest.raises(ValueError, match='tensor_parallel'):
        _pipeline_validate(_params(tensor_parallel=2, pipeline_stages=2))


def test_tp_hidden_indivisible_raises():
    params = _params()
    model, p0, tx = _init(params)
    mesh = create_tp_mesh(1, 3)
    with pytest.raises(ValueError, match='divide'):
        make_gmd_tp_train_step(model, params, mesh)
