"""Coverage of the non-default component variants: every span predictor,
TALL/onlyvideo CMI, LSTM temporal matcher, RNN (non-QAVE) video encoder."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.models import Baseline, GMD
from shufflingvideosfortsg_tpu.models.components import (
    SpanPredictorBoundary, VideoTextSemanticMatch, cmi_apply, cmi_dim)

B, T, N, DV = 3, 12, 5, 16


@pytest.mark.parametrize("name", ["mlp", "tied_lstm", "cat_tied_lstm",
                                  "condi_lstm", "cat_condi_lstm",
                                  "self_attn", "conv"])
def test_span_predictor_variants(rng, name):
    feat = jnp.asarray(rng.randn(B, T, 20).astype(np.float32))
    vmask = jnp.asarray((rng.rand(B, T) > 0.2).astype(np.int32))
    sp = SpanPredictorBoundary(name, mlp_hidden_dim=8, lstm_hidden_dim=8,
                               dropout=0.0, attention_nheads=4)
    variables = sp.init(jax.random.PRNGKey(0), feat, vmask)
    s, e = sp.apply(variables, feat, vmask)
    assert s.shape == (B, T) and e.shape == (B, T)
    np.testing.assert_allclose(np.asarray(s.sum(1)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(e.sum(1)), 1.0, rtol=1e-5)
    if name not in ("self_attn",):  # self_attn ignores the mask (parity)
        # masked positions get ~zero probability
        s_np = np.asarray(s)
        masked = np.asarray(vmask) == 0
        assert s_np[masked].max() < 1e-8


@pytest.mark.parametrize("name,expected_dim", [
    ("a", DV), ("vs", DV + 10), ("tall", 4 * DV)])
def test_cmi_variants(rng, name, expected_dim):
    video = jnp.asarray(rng.randn(B, T, DV).astype(np.float32))
    words = jnp.asarray(rng.randn(B, N, 10).astype(np.float32))
    sent_dim = DV if name == "tall" else 10
    sent = jnp.asarray(rng.randn(B, sent_dim).astype(np.float32))
    dim = cmi_dim(name, DV, sent_dim)
    out = cmi_apply(name, video, words, sent)
    assert out.shape[-1] == dim
    if name == "tall":
        assert dim == 4 * DV
    else:
        assert dim == expected_dim


def test_csmm_lstm_temporal(rng):
    video = jnp.asarray(rng.randn(B, T, DV).astype(np.float32))
    sent = jnp.asarray(rng.randn(B, 10).astype(np.float32))
    m = VideoTextSemanticMatch('lstm', 8, 2, 16, 'relu', 0.0)
    variables = m.init(jax.random.PRNGKey(0), video, sent)
    score, feat = m.apply(variables, video, sent)
    assert score.shape == (B, T)
    assert feat.shape == (B, T, 16)  # BiLSTM(8) output dim


def test_baseline_with_conv_predictor(rng):
    model = Baseline(sent_hidden=8, sent_layers=1,
                     video_encoder_name='qave', video_hidden=8,
                     video_layers=1, nblocks=2, cross_name='vs',
                     predictor_name='conv', mlp_hidden_dim=8,
                     span_hidden_dim=8, dropout=0.0)
    video = jnp.asarray(rng.randn(B, T, DV).astype(np.float32))
    sent = jnp.asarray(rng.randn(B, N, 300).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), video, sent)
    out = model.apply(variables, video, sent)
    s = np.asarray(out['start_prob'])
    assert s.shape == (B, T)
    np.testing.assert_allclose(s.sum(1), 1.0, rtol=1e-5)


def test_rnn_video_encoder_model(rng):
    model = Baseline(sent_hidden=8, sent_layers=1,
                     video_encoder_name='rnn', video_hidden=8,
                     video_layers=1, nblocks=2, cross_name='vs',
                     predictor_name='mlp', mlp_hidden_dim=8,
                     span_hidden_dim=8, dropout=0.0)
    video = jnp.asarray(rng.randn(B, T, DV).astype(np.float32))
    sent = jnp.asarray(rng.randn(B, N, 300).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), video, sent)
    out = model.apply(variables, video, sent)
    assert out['start_prob'].shape == (B, T)


def test_gmd_with_lstm_matcher_and_mask(rng):
    model = GMD(sent_hidden=8, sent_layers=1, video_hidden=8, video_layers=1,
                nblocks=2, cross_name='vs', predictor_name='tied_lstm',
                mlp_hidden_dim=8, span_hidden_dim=8, video_if_mask=True,
                dropout=0.0, m_temp='lstm', m_temp_hidden=8, m_temp_layers=1,
                m_pred_hidden=16, m_pred_activ='tanh')
    video = jnp.asarray(rng.randn(B, T, DV).astype(np.float32))
    sent = jnp.asarray(rng.randn(B, N, 300).astype(np.float32))
    vmask = jnp.asarray(np.stack([(np.arange(T) < k).astype(np.int32)
                                  for k in (7, 12, 9)]))
    mt = jnp.ones((B, T), jnp.int32)
    mn = jnp.ones((B, N), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), sent, mn, video, vmask,
                           video, vmask, mt, mt, mt, mt, mt, mt)
    out = model.apply(variables, sent, mn, video, vmask, video, vmask,
                      mt, mt, mt, mt, mt, mt)
    s = np.asarray(out['start_prob'])
    # with video_if_mask=True, masked positions get ~zero prob
    assert s[0, 7:].max() < 1e-8
    assert s[2, 9:].max() < 1e-8


def test_content_predictor_family(rng):
    from shufflingvideosfortsg_tpu.models.content_predictors import (
        ConditionalLSTMContentPredictor, MLPContentPredictor,
        StartConditionedPredictor, TiedLSTMContentPredictor)
    feat = jnp.asarray(rng.randn(B, T, 20).astype(np.float32))
    for mod in (MLPContentPredictor(8),
                TiedLSTMContentPredictor(8, 8, 0.0),
                ConditionalLSTMContentPredictor(8, 0.0)):
        variables = mod.init(jax.random.PRNGKey(0), feat)
        s, e, c = mod.apply(variables, feat)
        for p in (s, e, c):
            assert p.shape == (B, T)
            np.testing.assert_allclose(np.asarray(p.sum(1)), 1.0, rtol=1e-5)

    sc = StartConditionedPredictor(8, 8, 0.0)
    starts = jnp.asarray(rng.randint(0, T, B))
    variables = sc.init(jax.random.PRNGKey(0), feat, starts)
    s, e = sc.apply(variables, feat, starts)
    assert s.shape == (B, T) and e.shape == (B, T)
    s2, e2 = sc.apply(variables, feat, method=sc.inference)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s2), rtol=1e-6)
