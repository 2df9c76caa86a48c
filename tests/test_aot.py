"""AOT serving artifacts: export a live grounder to a StableHLO bundle,
reload it from the directory alone, and require identical serving results."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.models import GMD
from shufflingvideosfortsg_tpu.serving import MultiQueryGrounder
from shufflingvideosfortsg_tpu.utils.aot import (export_grounder,
                                                 load_grounder_artifact)

T, N, DV = 20, 6, 16

CFG = dict(sent_rnn_hiddendim=8, sent_rnn_layers=1,
           video_encoder='query_aware_encoder', video_rnn_hiddendim=8,
           video_rnn_layers=1, crossmodal='vs', predictor='mlp',
           mlp_hidden_dim=8, span_hidden_dim=8, mask=False, dropout=0.0,
           m_temp='none', m_pred_hidden=16, m_pred_activ='relu',
           precision='f32', mesh_shape=[8], sent_len=N,
           video_feature_dim=DV)


@pytest.fixture(scope='module')
def artifact_env(tmp_path_factory):
    model = GMD(sent_hidden=8, sent_layers=1, video_hidden=8, video_layers=1,
                nblocks=2, cross_name='vs', predictor_name='mlp',
                mlp_hidden_dim=8, span_hidden_dim=8, video_if_mask=False,
                dropout=0.0, m_temp='none', m_pred_hidden=16,
                m_pred_activ='relu')
    mt = jnp.ones((2, T), jnp.int32)
    mn = jnp.ones((2, N), jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, N, 300)), mn,
        jnp.zeros((2, T, DV)), mt, jnp.zeros((2, T, DV)), mt,
        mt, mt, mt, mt, mt, mt)
    rng = np.random.RandomState(3)
    emb = rng.randn(50, 300).astype(np.float32)
    emb[0] = 0.0  # pad id
    video = rng.randn(T, DV).astype(np.float32)

    g = MultiQueryGrounder(CFG, variables['params'], query_batch=8)
    g.set_video(video)
    g.set_vocab(emb)
    out = str(tmp_path_factory.mktemp('aot'))
    manifest = export_grounder(g, out)
    return g, out, manifest, video, emb, rng


def test_manifest_and_files(artifact_env):
    import os
    _, out, manifest, _, _, _ = artifact_env
    assert manifest['format'] == 'svtsg-aot-v1'
    assert sorted(manifest['functions']) == ['precompute', 'serve_features',
                                             'serve_tokens']
    assert manifest['video_len'] == T
    assert manifest['query_batch'] == 8
    for f in ('manifest.json', 'weights.msgpack', 'vocab.npy',
              'precompute.stablehlo', 'serve_features.stablehlo',
              'serve_tokens.stablehlo'):
        assert os.path.isfile(os.path.join(out, f)), f


def test_exported_equals_live_features(artifact_env):
    g, out, _, video, _, rng = artifact_env
    queries = rng.randn(19, N, 300).astype(np.float32)  # 2 full + 1 partial
    want_pred, want_score = g.ground(None, queries)

    e = load_grounder_artifact(out)
    e.set_video(video)
    pred, score = e.ground(queries)
    np.testing.assert_array_equal(pred, want_pred)
    np.testing.assert_allclose(score, want_score, rtol=1e-5, atol=1e-6)


def test_exported_equals_live_tokens(artifact_env):
    g, out, _, video, _, rng = artifact_env
    tokens = rng.randint(0, 50, (11, N)).astype(np.int32)
    want_pred, want_score = g.ground_tokens_video(tokens)

    e = load_grounder_artifact(out)
    e.set_video(video)
    pred, score = e.ground_tokens_video(tokens)
    np.testing.assert_array_equal(pred, want_pred)
    np.testing.assert_allclose(score, want_score, rtol=1e-5, atol=1e-6)


def test_loader_commits_weights_to_device(artifact_env):
    """The loader must device_put the restored weight tree (and vocab):
    numpy leaves passed into jit re-upload on EVERY call — measured
    through the remote relay this collapsed artifact serving ~20x
    below the live grounder."""
    _, out, _, _, _, _ = artifact_env
    e = load_grounder_artifact(out)
    for leaf in jax.tree_util.tree_leaves(e.weights):
        assert isinstance(leaf, jax.Array), type(leaf)
    if e._emb is not None:
        assert isinstance(e._emb, jax.Array)


def test_wrong_video_shape_rejected(artifact_env):
    _, out, _, _, _, _ = artifact_env
    e = load_grounder_artifact(out)
    with pytest.raises(ValueError, match='exported for video shape'):
        e.set_video(np.zeros((T + 1, DV), np.float32))


def test_export_requires_resident_video():
    model = GMD(sent_hidden=8, sent_layers=1, video_hidden=8,
                video_layers=1, nblocks=2, cross_name='vs',
                predictor_name='mlp', mlp_hidden_dim=8, span_hidden_dim=8,
                video_if_mask=False, dropout=0.0, m_temp='none',
                m_pred_hidden=16, m_pred_activ='relu')
    mt = jnp.ones((1, T), jnp.int32)
    mn = jnp.ones((1, N), jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, N, 300)), mn,
        jnp.zeros((1, T, DV)), mt, jnp.zeros((1, T, DV)), mt,
        mt, mt, mt, mt, mt, mt)
    g = MultiQueryGrounder(CFG, variables['params'], query_batch=4)
    with pytest.raises(ValueError, match='set_video'):
        export_grounder(g, '/tmp/should_not_exist_aot')


def test_tpu_native_dual_export(artifact_env, tmp_path):
    """A portable bundle can carry TPU-native Pallas-fused variants
    beside the cross-platform scan ones (``tpu_grounder=``): the
    manifest lists them, the files hold Mosaic custom calls lowered for
    the tpu platform (ahead-of-time, from this TPU-less host), and a
    CPU load transparently falls back to the portable files with
    results identical to the live grounder."""
    import os

    from jax import export as jax_export

    g, _, _, video, emb, rng = artifact_env
    g_tpu = MultiQueryGrounder(dict(CFG, fused_inference=True),
                               g.model_params, query_batch=8)
    out = str(tmp_path / 'dual')
    manifest = export_grounder(g, out, platforms=('cpu', 'tpu'),
                               tpu_grounder=g_tpu)
    assert sorted(manifest['tpu_native']) == sorted(manifest['functions'])
    for name in manifest['tpu_native']:
        path = os.path.join(out, f'{name}.tpu.stablehlo')
        assert os.path.isfile(path), name
        with open(path, 'rb') as f:
            exp = jax_export.deserialize(f.read())
        assert exp.platforms == ('tpu',), (name, exp.platforms)

    e = load_grounder_artifact(out)  # CPU backend here
    assert e.native_loaded == []
    e.set_video(video)
    queries = rng.randn(9, N, 300).astype(np.float32)
    want_pred, want_score = g.ground(None, queries)
    pred, score = e.ground(queries)
    np.testing.assert_array_equal(pred, want_pred)
    np.testing.assert_allclose(score, want_score, rtol=1e-5, atol=1e-6)


def test_export_serving_tool(tmp_path):
    """tools/export_serving.py end-to-end: train a tiny run through the
    real driver, export its checkpoint via the CLI tool (params.json for
    exact dims), reload and serve."""
    import json
    import os
    import subprocess
    import sys

    ANNO = "/root/reference/data/Charades-CD/charades_val.json"
    if not os.path.isfile(ANNO):
        pytest.skip("reference annotations unavailable")
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    feat_dir = str(tmp_path / "feats")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_synth_features.py"),
         "--dataset", "charades", "--out", feat_dir, "--annotations", ANNO,
         "--dim", str(DV)], check=True, capture_output=True)

    from shufflingvideosfortsg_tpu import cli
    from shufflingvideosfortsg_tpu.config import load_config
    runs = str(tmp_path / "runs")
    params = load_config(os.path.join(REPO, "cfgs/charades_cd_i3d.yml"),
                         data_root="/root/reference/data")
    params.update(dict(
        alias="aot_tool", runs=runs, debug=True,
        train_data=ANNO, val_data=ANNO, test_data=ANNO,
        train_featpath=feat_dir, valid_featpath=feat_dir,
        test_featpath=feat_dir, video_feature_dim=DV, video_len=T,
        sent_len=N, sent_rnn_hiddendim=8, video_rnn_hiddendim=8,
        mlp_hidden_dim=8, span_hidden_dim=8, m_pred_hidden=16,
        batch_size=[8, 8, 8], epoch=1, batch_log_interval=-1,
        test_interval=5, start_from=None))
    cli.main_train(params)
    ckpt = os.path.join(runs, "aot_tool", "model", "aot_tool_00000.ckp")
    pjson = os.path.join(runs, "aot_tool", "params.json")
    assert os.path.isfile(ckpt) and os.path.isfile(pjson)

    out = str(tmp_path / "artifact")
    env = dict(os.environ, SVTSG_PLATFORM="cpu", JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/export_serving.py"),
         "--cfg", pjson, "--ckpt", ckpt, "--out", out,
         "--query_batch", "4"], env=env, capture_output=True, text=True)
    assert res.returncode == 0, res.stderr

    from shufflingvideosfortsg_tpu.utils.aot import load_grounder_artifact
    e = load_grounder_artifact(out)
    rng = np.random.RandomState(0)
    e.set_video(rng.randn(T, DV).astype(np.float32))
    pred, score = e.ground(rng.randn(6, N, 300).astype(np.float32))
    assert pred.shape == (6, 2) and np.isfinite(score).all()
    assert (pred[:, 1] >= pred[:, 0]).all()
    meta = json.load(open(os.path.join(out, "manifest.json")))
    assert meta["video_len"] == T


# ---------------------------------------------------------------------------
# Corpus/bank tier: the production serving paths (docs/SERVING.md)
# ---------------------------------------------------------------------------

class _FakePack:
    """Minimal feature-pack surface for set_corpus."""

    def __init__(self, feats):
        self._f = feats
        self.num_videos = feats.shape[0]
        self.vid_to_row = {f'v{i}': i for i in range(self.num_videos)}

    def gather(self, rows):
        return self._f[np.asarray(rows)]


@pytest.fixture(scope='module')
def corpus_artifact_env(tmp_path_factory, artifact_env):
    g, _, _, _, emb, _ = artifact_env
    rng = np.random.RandomState(11)
    V = 6
    videos = rng.randn(V, T, DV).astype(np.float32)
    g.set_videos(videos)  # plain bank tier
    out = str(tmp_path_factory.mktemp('aot_corpus'))
    manifest = export_grounder(g, out)
    return g, out, manifest, videos, emb, rng


def test_corpus_manifest(corpus_artifact_env):
    import os
    _, out, manifest, videos, _, _ = corpus_artifact_env
    assert 'serve_bank' in manifest['functions']
    assert 'serve_bank_tokens' in manifest['functions']
    assert manifest['num_videos'] == videos.shape[0]
    assert os.path.isfile(os.path.join(out, 'bank.npz'))


def test_exported_equals_live_bank(corpus_artifact_env):
    g, out, _, videos, _, rng = corpus_artifact_env
    e = load_grounder_artifact(out)
    q = rng.randn(13, N, 300).astype(np.float32)
    ids = rng.randint(0, videos.shape[0], 13).astype(np.int32)
    pred_l, score_l = g.ground_bank(q, ids)
    pred_e, score_e = e.ground_bank(q, ids)
    np.testing.assert_array_equal(pred_e, pred_l)
    np.testing.assert_allclose(score_e, score_l, rtol=1e-6)


def test_exported_equals_live_bank_tokens(corpus_artifact_env):
    g, out, _, videos, emb, rng = corpus_artifact_env
    e = load_grounder_artifact(out)
    tok = rng.randint(1, emb.shape[0], (13, N)).astype(np.int32)
    ids = rng.randint(0, videos.shape[0], 13).astype(np.int32)
    pred_l, score_l = g.ground_tokens(tok, ids)
    pred_e, score_e = e.ground_tokens(tok, ids)
    np.testing.assert_array_equal(pred_e, pred_l)
    np.testing.assert_allclose(score_e, score_l, rtol=1e-6)


def test_exported_int8_corpus_tier(tmp_path, artifact_env):
    """The int8 corpus (set_corpus dtype='int8') exports as (values,
    scales) in bank.npz and the reloaded artifact reproduces the live
    int8 grounder exactly."""
    g, _, _, _, emb, _ = artifact_env
    rng = np.random.RandomState(17)
    V = 5
    pack = _FakePack(rng.randn(V, T, DV).astype(np.float32))
    g.set_corpus(pack, chunk_videos=2, dtype='int8')
    assert isinstance(g._resident_bank, tuple)
    out = str(tmp_path / 'aot_int8')
    manifest = export_grounder(g, out)
    assert manifest['bank_dtype'] == 'int8'
    e = load_grounder_artifact(out)
    tok = rng.randint(1, emb.shape[0], (9, N)).astype(np.int32)
    ids = rng.randint(0, V, 9).astype(np.int32)
    pred_l, score_l = g.ground_tokens(tok, ids)
    pred_e, score_e = e.ground_tokens(tok, ids)
    np.testing.assert_array_equal(pred_e, pred_l)
    np.testing.assert_allclose(score_e, score_l, rtol=1e-6)


def test_bank_tier_missing_raises(artifact_env):
    _, out, _, _, _, _ = artifact_env
    e = load_grounder_artifact(out)
    with pytest.raises(ValueError, match='corpus bank'):
        e.ground_bank(np.zeros((2, N, 300), np.float32),
                      np.zeros((2,), np.int32))
