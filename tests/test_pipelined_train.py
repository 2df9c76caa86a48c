"""Pipeline-parallel GMD TRAINING (train/pipelined.py): the GPipe
train step over a 'pipe' mesh must reproduce the unsharded train step —
same loss, same parameters after optimizer updates (i.e. same gradients)
— with dropout off; layout converters must round-trip.

Reference scope: none — the reference is single-GPU DataParallel and 2
blocks deep (grounding/train.py:343, :60)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.config import load_config
from shufflingvideosfortsg_tpu.models import build_model
from shufflingvideosfortsg_tpu.parallel.pipeline import create_pp_mesh
from shufflingvideosfortsg_tpu.train.pipelined import (
    make_gmd_pipelined_train_step, stack_encoder_tail, unstack_encoder_tail)
from shufflingvideosfortsg_tpu.train.state import (create_train_state,
                                                   make_optimizer)
from shufflingvideosfortsg_tpu.train.steps import make_gmd_train_step

B, T, N, Dv, STAGES = 8, 16, 7, 32, 4


def _params(**over):
    base = dict(
        video_len=T, video_feature_dim=Dv, sent_len=N,
        sent_rnn_hiddendim=16, video_rnn_hiddendim=16,
        mlp_hidden_dim=16, span_hidden_dim=16, m_pred_hidden=16,
        dropout=0.0, disc_dropout=0.0, lr=1e-3,
        pipeline_stages=STAGES)
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
    assert model.nblocks == STAGES + 1
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


@pytest.mark.parametrize('dp,n_micro', [(1, 4), (2, 2)])
def test_pipelined_step_equals_plain(dp, n_micro):
    """1x4 pure-pipe and 2x4 data-x-pipe: loss metrics match per step and
    the updated parameter trees match after 2 Adam updates (so every
    gradient matched), encoder deterministic on both sides."""
    params = _params()
    model, p0, tx = _init(params)
    mesh = create_pp_mesh(dp, STAGES)

    plain = make_gmd_train_step(model, params)
    st_plain, m_plain = _run(plain, create_train_state(p0, tx))

    piped = make_gmd_pipelined_train_step(
        model, params, mesh, n_micro,
        data_axis='data' if dp > 1 else None, train_dropout=False)
    stacked0 = stack_encoder_tail(p0, model.nblocks, mesh=mesh)
    st_pipe, m_pipe = _run(piped, create_train_state(stacked0, tx))

    for k in m_plain:
        assert m_plain[k] == pytest.approx(m_pipe[k], rel=2e-4, abs=2e-5), k

    got = unstack_encoder_tail(jax.device_get(st_pipe.params))
    want = jax.device_get(st_plain.params)
    flat_g = jax.tree.leaves_with_path(got)
    flat_w = jax.tree.leaves_with_path(want)
    assert jax.tree.structure(got) == jax.tree.structure(want)
    for (path, a), (_, b) in zip(flat_g, flat_w):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-6,
            err_msg=jax.tree_util.keystr(path))


def test_stack_unstack_roundtrip():
    params = _params()
    model, p0, _ = _init(params)
    rt = unstack_encoder_tail(stack_encoder_tail(p0, model.nblocks))
    assert jax.tree.structure(rt) == jax.tree.structure(p0)
    for (path, a), (_, b) in zip(jax.tree.leaves_with_path(rt),
                                 jax.tree.leaves_with_path(p0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(path))


def test_pipelined_grad_accum_equals_plain():
    """grad_accum_steps>1 composes with the GPipe step (the SCALING.md
    composition-matrix claim): accumulated pipelined updates equal the
    accumulated plain updates, dropout off."""
    params = _params(grad_accum_steps=2)
    model, p0, tx = _init(params)
    mesh = create_pp_mesh(1, STAGES)

    plain = make_gmd_train_step(model, params)
    st_plain, m_plain = _run(plain, create_train_state(p0, tx))

    piped = make_gmd_pipelined_train_step(model, params, mesh, 2,
                                          data_axis=None,
                                          train_dropout=False)
    stacked0 = stack_encoder_tail(p0, model.nblocks, mesh=mesh)
    st_pipe, m_pipe = _run(piped, create_train_state(stacked0, tx))

    for k in m_plain:
        assert m_plain[k] == pytest.approx(m_pipe[k], rel=2e-4, abs=2e-5), k
    got = unstack_encoder_tail(jax.device_get(st_pipe.params))
    want = jax.device_get(st_plain.params)
    for (path, a), (_, b) in zip(jax.tree.leaves_with_path(got),
                                 jax.tree.leaves_with_path(want)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-6,
            err_msg=jax.tree_util.keystr(path))


def test_pipelined_dropout_trains():
    """With dropout ON the pipelined step must still run (per stage/tick
    keys) and produce finite loss + changed params."""
    params = _params(dropout=0.5)
    model, p0, tx = _init(params)
    mesh = create_pp_mesh(1, STAGES)
    piped = make_gmd_pipelined_train_step(model, params, mesh, 4,
                                          data_axis=None)
    stacked0 = stack_encoder_tail(p0, model.nblocks, mesh=mesh)
    tail0 = np.array(jax.tree.leaves(stacked0['video_encoder']['tail'])[0])
    st, metrics = _run(piped, create_train_state(stacked0, tx), n_steps=1)
    assert np.isfinite(metrics['loss'])
    tail1 = jax.tree.leaves(
        jax.device_get(st.params)['video_encoder']['tail'])[0]
    assert not np.allclose(np.asarray(tail0), np.asarray(tail1))
