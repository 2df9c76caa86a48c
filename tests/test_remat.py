"""remat config: nn.remat around the QAVE blocks is numerically the
identity — the train step must produce the same loss and the same
updated parameters (to f32 rescheduling tolerance) as the un-rematted
step (the param tree layout is
unchanged: nn.remat preserves module names). Targets the large-B
saved-activation spill (docs/KERNELS.md B-sweep).

Reference scope: none — torch has no activation checkpointing in the
reference; beyond-parity memory scaling."""

import numpy as np

import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.config import load_config
from shufflingvideosfortsg_tpu.models import build_model
from shufflingvideosfortsg_tpu.train.state import (create_train_state,
                                                   make_optimizer)
from shufflingvideosfortsg_tpu.train.steps import make_gmd_train_step

B, T, N, Dv = 8, 16, 7, 32


def _params(**over):
    base = dict(
        video_len=T, video_feature_dim=Dv, sent_len=N,
        sent_rnn_hiddendim=16, video_rnn_hiddendim=16,
        mlp_hidden_dim=16, span_hidden_dim=16, m_pred_hidden=16,
        dropout=0.0, disc_dropout=0.0, lr=1e-3)
    base.update(over)
    return load_config(None, overrides=base)


def _batch():
    rng = np.random.RandomState(0)
    s = rng.randint(0, T - 4, B).astype(np.int32)
    e = (s + 2).astype(np.int32)
    return {
        'sent_feat': jnp.asarray(rng.randn(B, N, 300), jnp.float32),
        'sent_mask': jnp.ones((B, N), jnp.int32),
        'video_feat': jnp.asarray(rng.randn(B, T, Dv), jnp.float32),
        'video_mask': jnp.ones((B, T), jnp.int32),
        'nfeats': jnp.full((B,), T, jnp.int32),
        'framestps': jnp.asarray(np.stack([s, e], -1)),
        'timestps': jnp.asarray(np.stack([s, e], -1), jnp.float32),
        'duration': jnp.full((B,), float(T), jnp.float32),
        'temporal_labels': jnp.ones((B, T), jnp.int32),
        'fore_masks': jnp.ones((B, T), jnp.int32),
        'back_masks': jnp.ones((B, T), jnp.int32),
    }


def _train(remat, dropout=0.0):
    params = _params(remat=remat, dropout=dropout)
    model = build_model(params, 'gmd')
    mt = np.ones((2, T), np.int32)
    mn = np.ones((2, N), np.int32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((2, N, 300), np.float32), mn,
        np.zeros((2, T, Dv), np.float32), mt,
        np.zeros((2, T, Dv), np.float32), mt, mt, mt, mt, mt, mt, mt)
    tx = make_optimizer(params, steps_per_epoch=10)
    state = create_train_state(jax.device_get(variables['params']), tx)
    step = make_gmd_train_step(model, params)
    batch = _batch()
    for i in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(40 + i))
    return jax.device_get(state.params), float(metrics['loss'])


def test_remat_is_identity():
    p_plain, l_plain = _train(remat=False)
    p_remat, l_remat = _train(remat=True)
    assert l_plain == l_remat or abs(l_plain - l_remat) < 1e-6
    assert jax.tree.structure(p_plain) == jax.tree.structure(p_remat)
    for (path, a), (_, b) in zip(jax.tree.leaves_with_path(p_plain),
                                 jax.tree.leaves_with_path(p_remat)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(path))


def test_remat_with_dropout_runs():
    _, loss = _train(remat=True, dropout=0.5)
    assert np.isfinite(loss)
