"""End-to-end: overfit smoke, sharding consistency on the virtual mesh,
transformer/graph shape checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shufflingvideosfortsg_tpu.models import Baseline, GMD
from shufflingvideosfortsg_tpu.train.state import (create_train_state,
                                                   make_optimizer)
from shufflingvideosfortsg_tpu.train.steps import (make_baseline_train_step,
                                                   make_gmd_train_step)

T, N, DV = 16, 6, 24


def tiny_params(**over):
    p = dict(optim='adam', lr=1e-3, weight_decay=0.0, lr_schd='ms',
             lr_step=[100], lr_decay_rate=0.1, grad_clip=False,
             loss_m1_lambda=1.0, loss_m2_lambda=1.0, loss_disc_lambda=1.0,
             on_device_aug=True)
    p.update(over)
    return p


def tiny_model_kwargs():
    return dict(sent_hidden=8, sent_layers=1, video_hidden=8, video_layers=1,
                nblocks=2, cross_name='vs', predictor_name='mlp',
                mlp_hidden_dim=8, span_hidden_dim=8, video_if_mask=False,
                dropout=0.0)


def make_batch(B, rng):
    nfeats = np.full((B,), T, np.int32)
    s = rng.randint(0, T - 6, B).astype(np.int32)
    e = (s + rng.randint(2, 5, B)).astype(np.int32)
    ts = np.arange(T)[None]
    return {
        'sent_feat': rng.randn(B, N, 300).astype(np.float32),
        'sent_mask': np.ones((B, N), np.int32),
        'video_feat': rng.randn(B, T, DV).astype(np.float32),
        'video_mask': np.ones((B, T), np.int32),
        'nfeats': nfeats,
        'framestps': np.stack([s, e], -1),
        'timestps': np.stack([s, e], -1).astype(np.float32),
        'duration': np.full((B,), float(T), np.float32),
        'temporal_labels': ((ts >= s[:, None]) & (ts <= e[:, None])).astype(np.int32),
        'fore_masks': (ts <= s[:, None]).astype(np.int32),
        'back_masks': (ts >= e[:, None]).astype(np.int32),
    }


def test_baseline_overfit_16(rng):
    B = 16
    batch = make_batch(B, rng)
    model = Baseline(**tiny_model_kwargs())
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.array(batch['video_feat']),
                           jnp.array(batch['sent_feat']))
    tx = make_optimizer(tiny_params(lr=5e-3), 1000)
    state = create_train_state(variables['params'], tx)
    step = make_baseline_train_step(model, tiny_params())
    jb = {k: jnp.array(v) for k, v in batch.items()}
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(60):
        key, sk = jax.random.split(key)
        state, m = step(state, jb, sk)
        losses.append(float(m['loss']))
    assert losses[-1] < losses[0] * 0.3, (losses[0], losses[-1])
    assert float(m['miou']) > 0.5


def test_gmd_loss_decreases(rng):
    B = 8
    batch = make_batch(B, rng)
    model = GMD(m_temp='none', m_pred_hidden=16, m_pred_activ='relu',
                **tiny_model_kwargs())
    mt = jnp.ones((B, T), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.array(batch['sent_feat']),
                           jnp.array(batch['sent_mask']),
                           jnp.array(batch['video_feat']), mt,
                           jnp.array(batch['video_feat']), mt,
                           mt, mt, mt, mt, mt, mt)
    tx = make_optimizer(tiny_params(lr=3e-3), 1000)
    state = create_train_state(variables['params'], tx)
    step = make_gmd_train_step(model, tiny_params())
    jb = {k: jnp.array(v) for k, v in batch.items()}
    key = jax.random.PRNGKey(2)
    losses = []
    for i in range(40):
        key, sk = jax.random.split(key)
        state, m = step(state, jb, sk)
        losses.append(float(m['loss']))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])
    for k in ('loss_g', 'loss_intra', 'loss_inter', 'loss_d'):
        assert np.isfinite(float(m[k]))


def test_sharded_equals_single_device(rng):
    """The same train step on a 1-device and an 8-device mesh must produce
    identical losses and parameter updates (same PRNG key)."""
    B = 16
    batch = make_batch(B, rng)
    model = GMD(m_temp='none', m_pred_hidden=16, m_pred_activ='relu',
                **tiny_model_kwargs())
    mt = jnp.ones((B, T), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.array(batch['sent_feat']),
                           jnp.array(batch['sent_mask']),
                           jnp.array(batch['video_feat']), mt,
                           jnp.array(batch['video_feat']), mt,
                           mt, mt, mt, mt, mt, mt)
    tx = make_optimizer(tiny_params(), 1000)

    results = []
    for ndev in (1, 8):
        mesh = Mesh(np.asarray(jax.devices()[:ndev]), ('data',))
        # fresh buffers each round: the train step donates its state
        params0 = jax.tree_util.tree_map(jnp.array, variables['params'])
        state = create_train_state(params0, tx)
        state = jax.device_put(state, NamedSharding(mesh, P()))
        jb = {k: jax.device_put(np.asarray(v), NamedSharding(mesh, P('data')))
              for k, v in batch.items()}
        step = make_gmd_train_step(model, tiny_params())
        new_state, m = step(state, jb, jax.random.PRNGKey(3))
        results.append((jax.device_get(m),
                        jax.device_get(new_state.params)))
    (m1, p1), (m8, p8) = results
    assert m1['loss'] == pytest.approx(m8['loss'], rel=1e-5)
    assert m1['miou'] == pytest.approx(m8['miou'], rel=1e-5)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-4)


def test_transformer_blocks(rng):
    from shufflingvideosfortsg_tpu.models.transformer import (
        DecoderLayer, EncoderLayer, FeedForward, MHAttLayer)
    B, L, D = 2, 10, 16
    x = jnp.array(rng.randn(B, L, D).astype(np.float32))
    enc = EncoderLayer(D, 32, 4, 0.1)
    v = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(v, x)
    assert y.shape == (B, L, D)
    dec = DecoderLayer(D, 32, 4, 0.1)
    v = dec.init(jax.random.PRNGKey(0), x, y)
    z = dec.apply(v, x, y)
    assert z.shape == (B, L, D)
    mh = MHAttLayer(D, 32, 4, 0.1)
    v = mh.init(jax.random.PRNGKey(0), x, y)
    w = mh.apply(v, x, y)
    assert w.shape == (B, L, D)
    ff = FeedForward(32)
    v = ff.init(jax.random.PRNGKey(0), x)
    assert ff.apply(v, x).shape == (B, L, D)


def test_graph_modeling(rng):
    from shufflingvideosfortsg_tpu.models.graph import (GraphModelingTriplet,
                                                        word_feat_from_idx)
    B, Nw, D, M = 2, 9, 16, 3
    words = jnp.array(rng.randn(B, Nw, D).astype(np.float32))
    obs = jnp.array(rng.randint(0, Nw, (B, M, 2)).astype(np.int32))
    rls = jnp.array(rng.randint(0, Nw, (B, M, 3)).astype(np.int32))
    feats = word_feat_from_idx(words, obs)
    assert len(feats) == 2 and feats[0].shape == (B, M, D)
    gm = GraphModelingTriplet(hidden_dim=D)
    v = gm.init(jax.random.PRNGKey(0), words, obs, rls)
    out = gm.apply(v, words, obs, rls)
    assert out.shape == (B, 2 * M, D)


def test_lg_frame2sec_in_step(rng):
    """The 'lg' feature path converts frame-index predictions to seconds
    inside the eval step (pos / nfeats * duration)."""
    from shufflingvideosfortsg_tpu.train.steps import make_baseline_eval_step
    model = Baseline(**tiny_model_kwargs())
    batch = make_batch(4, rng)
    batch['nfeats'] = np.full((4,), T // 2, np.int32)
    batch['duration'] = np.full((4,), 100.0, np.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.array(batch['video_feat']),
                           jnp.array(batch['sent_feat']))
    jb = {k: jnp.array(v) for k, v in batch.items()}
    out_id = make_baseline_eval_step(model, lg_frame2sec=False)(
        variables['params'], jb)
    out_lg = make_baseline_eval_step(model, lg_frame2sec=True)(
        variables['params'], jb)
    want = np.asarray(out_id['pred_time']) / (T // 2) * 100.0
    np.testing.assert_allclose(np.asarray(out_lg['pred_time']), want,
                               rtol=1e-5)
