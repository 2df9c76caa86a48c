"""Pseudo-stream span grounding (beyond reference; LEARNING.md stress
probe): --loss_pseudo_ground_lambda adds a 5th loss term supervising the
pseudo stream's translated labels through the SHARED span predictor.
lambda = 0 must leave the step bit-identical to the reference 4-term
assembly; lambda > 0 must add no parameters, run finite, and actually
change the gradients."""

import numpy as np
import pytest

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


def _batch(seed=0):
    rng = np.random.RandomState(seed)
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


def _init(params):
    model = build_model(params, 'gmd')
    mt = np.ones((2, T), np.int32)
    mn = np.ones((2, N), np.int32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((2, N, 300), np.float32), mn,
        np.zeros((2, T, Dv), np.float32), mt,
        np.zeros((2, T, Dv), np.float32), mt, mt, mt, mt, mt, mt, mt)
    return model, jax.device_get(variables['params'])


def test_lambda_zero_matches_reference_assembly():
    """pseudo_ground off: the model does not even compute the pseudo
    span head and the step equals the default step exactly."""
    p_ref = _params()
    p_off = _params(loss_pseudo_ground_lambda=0.0)
    model_ref, p0 = _init(p_ref)
    model_off = build_model(p_off, 'gmd')
    assert model_off.pseudo_ground is False
    tx = make_optimizer(p_ref, steps_per_epoch=10)
    st_a, m_a = make_gmd_train_step(model_ref, p_ref)(
        create_train_state(p0, tx), _batch(), jax.random.PRNGKey(5))
    st_b, m_b = make_gmd_train_step(model_off, p_off)(
        create_train_state(p0, tx), _batch(), jax.random.PRNGKey(5))
    assert float(m_a['loss']) == float(m_b['loss'])
    for a, b in zip(jax.tree.leaves(st_a.params),
                    jax.tree.leaves(st_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lambda_positive_adds_no_params_and_changes_grads():
    p_on = _params(loss_pseudo_ground_lambda=1.0)
    p_off = _params()
    model_on, p0_on = _init(p_on)
    model_off, p0_off = _init(p_off)
    assert model_on.pseudo_ground is True
    # shared predictor: identical parameter tree either way
    assert jax.tree.structure(p0_on) == jax.tree.structure(p0_off)
    tx = make_optimizer(p_on, steps_per_epoch=10)
    st_on, m_on = make_gmd_train_step(model_on, p_on)(
        create_train_state(p0_on, tx), _batch(), jax.random.PRNGKey(5))
    st_off, m_off = make_gmd_train_step(model_off, p_off)(
        create_train_state(p0_on, tx), _batch(), jax.random.PRNGKey(5))
    assert np.isfinite(float(m_on['loss']))
    # the 5th term is strictly positive NLL, so the losses differ ...
    assert float(m_on['loss']) > float(m_off['loss'])
    # ... and so do the updated span-predictor weights
    leaf_on = jax.tree.leaves(st_on.params['span_predictor'])[0]
    leaf_off = jax.tree.leaves(st_off.params['span_predictor'])[0]
    assert not np.allclose(np.asarray(leaf_on), np.asarray(leaf_off))


def test_pseudo_outputs_shapes():
    p_on = _params(loss_pseudo_ground_lambda=0.5)
    model, p0 = _init(p_on)
    b = _batch()
    mt = b['video_mask']
    out = model.apply({'params': p0}, b['sent_feat'], b['sent_mask'],
                      b['video_feat'], b['video_mask'], b['video_feat'],
                      b['video_mask'], mt, mt, mt, mt, mt, mt)
    assert out['pseudo_start_prob'].shape == (B, T)
    assert out['pseudo_end_prob'].shape == (B, T)
    np.testing.assert_allclose(np.asarray(out['pseudo_start_prob']).sum(-1),
                               1.0, rtol=1e-4)
