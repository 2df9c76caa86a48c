"""Multi-query serving: shared-block0 path must equal the plain eval path,
and the grounder must handle chunking/padding and mesh sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.models import GMD
from shufflingvideosfortsg_tpu.serving import MultiQueryGrounder

T, N, DV = 20, 6, 16


def tiny_gmd():
    return GMD(sent_hidden=8, sent_layers=1, video_hidden=8, video_layers=1,
               nblocks=2, cross_name='vs', predictor_name='mlp',
               mlp_hidden_dim=8, span_hidden_dim=8, video_if_mask=False,
               dropout=0.0, m_temp='none', m_pred_hidden=16,
               m_pred_activ='relu')


@pytest.fixture(scope='module')
def model_and_params():
    model = tiny_gmd()
    mt = jnp.ones((2, T), jnp.int32)
    mn = jnp.ones((2, N), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, N, 300)), mn,
                   jnp.zeros((2, T, DV)), mt, jnp.zeros((2, T, DV)), mt,
                   mt, mt, mt, mt, mt, mt)
    return model, v['params']


def test_shared_video_equals_eval_forward(model_and_params, rng):
    model, params = model_and_params
    Q = 5
    video = rng.randn(1, T, DV).astype(np.float32)
    queries = rng.randn(Q, N, 300).astype(np.float32)

    out_serve = model.apply({'params': params}, jnp.array(video),
                            jnp.array(queries),
                            method=model.serve_multi_query)
    # plain path: tile the video over Q
    tiled = np.repeat(video, Q, axis=0)
    out_eval = model.apply({'params': params}, jnp.array(tiled),
                           jnp.array(queries), None, None,
                           method=model.eval_forward)
    np.testing.assert_allclose(np.asarray(out_serve['start_prob']),
                               np.asarray(out_eval['start_prob']),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_serve['end_prob']),
                               np.asarray(out_eval['end_prob']),
                               atol=1e-5, rtol=1e-4)


def test_grounder_chunking(model_and_params, rng):
    model, params = model_and_params
    cfg = dict(sent_rnn_hiddendim=8, sent_rnn_layers=1,
               video_encoder='query_aware_encoder', video_rnn_hiddendim=8,
               video_rnn_layers=1, crossmodal='vs', predictor='mlp',
               mlp_hidden_dim=8, span_hidden_dim=8, mask=False, dropout=0.0,
               m_temp='none', m_pred_hidden=16, m_pred_activ='relu',
               precision='f32', mesh_shape=[8])
    g = MultiQueryGrounder(cfg, params, query_batch=8)
    video = rng.randn(T, DV).astype(np.float32)
    queries = rng.randn(19, N, 300).astype(np.float32)  # 2 full + 1 partial
    pred, score = g.ground(video, queries)
    assert pred.shape == (19, 2) and score.shape == (19,)
    assert (pred[:, 1] >= pred[:, 0]).all()
    # resident-video reuse: same answer without re-passing the video
    pred2, score2 = g.ground(None, queries)
    np.testing.assert_array_equal(pred, pred2)
    np.testing.assert_allclose(score, score2, rtol=1e-6)


def test_serve_cached_equals_direct(model_and_params, rng):
    model, params = model_and_params
    Q = 8
    video = rng.randn(1, T, DV).astype(np.float32)
    queries = rng.randn(Q, N, 300).astype(np.float32)
    rnn0 = model.apply({'params': params}, jnp.array(video),
                       method=model.precompute_video)
    out_cached = model.apply({'params': params}, rnn0, jnp.array(queries),
                             method=model.serve_cached)
    out_direct = model.apply({'params': params}, jnp.array(video),
                             jnp.array(queries),
                             method=model.serve_multi_query)
    np.testing.assert_allclose(np.asarray(out_cached['start_prob']),
                               np.asarray(out_direct['start_prob']),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_cached['end_prob']),
                               np.asarray(out_direct['end_prob']),
                               atol=1e-5, rtol=1e-4)


def test_video_bank_matches_single_video_serving(model_and_params, rng):
    """Multi-resident-video serving: grounding query i against bank video
    video_ids[i] must equal grounding it against that video alone."""
    model, params = model_and_params
    V, Q = 3, 9
    videos = rng.randn(V, T, DV).astype(np.float32)
    queries = rng.randn(Q, N, 300).astype(np.float32)
    ids = np.asarray([0, 1, 2, 2, 1, 0, 1, 0, 2], np.int32)

    bank = model.apply({'params': params}, jnp.array(videos),
                       method=model.precompute_video)
    out = model.apply({'params': params}, bank, jnp.array(queries),
                      jnp.array(ids), method=model.serve_cached_multi)
    for v in range(V):
        sel = np.where(ids == v)[0]
        single = model.apply({'params': params}, jnp.array(videos[v:v + 1]),
                             jnp.array(queries[sel]),
                             method=model.serve_multi_query)
        np.testing.assert_allclose(np.asarray(out['start_prob'])[sel],
                                   np.asarray(single['start_prob']),
                                   atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(out['end_prob'])[sel],
                                   np.asarray(single['end_prob']),
                                   atol=1e-5, rtol=1e-4)


def test_grounder_bank_api(model_and_params, rng):
    model, params = model_and_params
    cfg = dict(sent_rnn_hiddendim=8, sent_rnn_layers=1,
               video_encoder='query_aware_encoder', video_rnn_hiddendim=8,
               video_rnn_layers=1, crossmodal='vs', predictor='mlp',
               mlp_hidden_dim=8, span_hidden_dim=8, mask=False, dropout=0.0,
               m_temp='none', m_pred_hidden=16, m_pred_activ='relu',
               precision='f32', mesh_shape=[8])
    g = MultiQueryGrounder(cfg, params, query_batch=8)
    videos = rng.randn(3, T, DV).astype(np.float32)
    queries = rng.randn(11, N, 300).astype(np.float32)
    ids = (np.arange(11) % 3).astype(np.int32)
    g.set_videos(videos)
    pred, score = g.ground_bank(queries, ids)
    assert pred.shape == (11, 2) and score.shape == (11,)
    # equals the single-resident path per video
    for v in range(3):
        sel = np.where(ids == v)[0]
        p1, s1 = g.ground(videos[v], queries[sel])
        np.testing.assert_allclose(pred[sel], p1, atol=1e-5)
        np.testing.assert_allclose(score[sel], s1, rtol=1e-4, atol=1e-6)


def test_corpus_bank_from_pack(model_and_params, rng, tmp_path):
    """set_corpus: the whole-pack block-0 bank (built chunk-wise with a
    donated dynamic-slice writer) serves any (query, vid) pair identically
    to pinning that video alone."""
    import json
    import struct

    model, params = model_and_params
    # write a tiny FEATPAK1 pack directly (7 videos so chunk_videos=4
    # exercises the multi-chunk + tail path)
    V = 7
    feats = rng.randn(V, T, DV).astype(np.float16)
    pack_dir = tmp_path / 'pack'
    pack_dir.mkdir()
    with open(pack_dir / 'pack.bin', 'wb') as f:
        f.write(struct.pack('<8sIIIIQ', b'FEATPAK1', V, T, DV, 1, 0))
        f.write(feats.tobytes())
    vids = {f'v{i:03d}': i for i in range(V)}
    json.dump({'vids': vids, 'nfeats': [T] * V, 't': T, 'd': DV,
               'dtype': 'f16', 'mode': 'raw'},
              open(pack_dir / 'index.json', 'w'))

    from shufflingvideosfortsg_tpu.data.featpack import PackedFeatureSource
    pack = PackedFeatureSource(str(pack_dir), use_native=False)

    cfg = dict(sent_rnn_hiddendim=8, sent_rnn_layers=1,
               video_encoder='query_aware_encoder', video_rnn_hiddendim=8,
               video_rnn_layers=1, crossmodal='vs', predictor='mlp',
               mlp_hidden_dim=8, span_hidden_dim=8, mask=False, dropout=0.0,
               m_temp='none', m_pred_hidden=16, m_pred_activ='relu',
               precision='f32', mesh_shape=[8])
    g = MultiQueryGrounder(cfg, params, query_batch=8)
    g.set_corpus(pack, chunk_videos=4)

    queries = rng.randn(10, N, 300).astype(np.float32)
    names = [f'v{i % V:03d}' for i in range(10)]
    pred, score = g.ground_vids(queries, names)
    assert pred.shape == (10, 2) and score.shape == (10,)
    for v in range(V):
        sel = [i for i, n in enumerate(names) if n == f'v{v:03d}']
        if not sel:
            continue
        p1, s1 = g.ground(pack.gather(np.asarray([v]))[0], queries[sel])
        np.testing.assert_allclose(pred[sel], p1, atol=1e-5)
        np.testing.assert_allclose(score[sel], s1, rtol=1e-4, atol=1e-6)


def test_ground_tokens_equals_ground_bank(model_and_params, rng):
    """Token-id serving (resident GloVe matrix, on-device embedding) must
    equal feature serving when the features are that matrix's rows."""
    model, params = model_and_params
    cfg = dict(sent_rnn_hiddendim=8, sent_rnn_layers=1,
               video_encoder='query_aware_encoder', video_rnn_hiddendim=8,
               video_rnn_layers=1, crossmodal='vs', predictor='mlp',
               mlp_hidden_dim=8, span_hidden_dim=8, mask=False, dropout=0.0,
               m_temp='none', m_pred_hidden=16, m_pred_activ='relu',
               precision='f32', mesh_shape=[8])
    g = MultiQueryGrounder(cfg, params, query_batch=8)
    videos = rng.randn(3, T, DV).astype(np.float32)
    g.set_videos(videos)
    emb = rng.randn(50, 300).astype(np.float32)
    g.set_vocab(emb)
    token_ids = rng.randint(0, 50, (11, N)).astype(np.int32)
    ids = (np.arange(11) % 3).astype(np.int32)
    p_tok, s_tok = g.ground_tokens(token_ids, ids)
    p_feat, s_feat = g.ground_bank(emb[token_ids], ids)
    np.testing.assert_allclose(p_tok, p_feat, atol=1e-5)
    np.testing.assert_allclose(s_tok, s_feat, rtol=1e-5, atol=1e-6)


def test_sharded_corpus_bank_equals_replicated(model_and_params, rng,
                                               tmp_path):
    """set_corpus(shard=True): the bank's video axis shards across the
    8-device mesh (zero-padded to a device multiple); grounding results
    equal the replicated-bank corpus path."""
    import json
    import struct

    model, params = model_and_params
    V = 10  # pads to 16 across 8 devices
    feats = rng.randn(V, T, DV).astype(np.float16)
    pack_dir = tmp_path / 'packs'
    pack_dir.mkdir()
    with open(pack_dir / 'pack.bin', 'wb') as f:
        f.write(struct.pack('<8sIIIIQ', b'FEATPAK1', V, T, DV, 1, 0))
        f.write(feats.tobytes())
    json.dump({'vids': {f'v{i}': i for i in range(V)},
               'nfeats': [T] * V, 't': T, 'd': DV, 'dtype': 'f16',
               'mode': 'raw'}, open(pack_dir / 'index.json', 'w'))
    from shufflingvideosfortsg_tpu.data.featpack import PackedFeatureSource
    pack = PackedFeatureSource(str(pack_dir), use_native=False)

    cfg = dict(sent_rnn_hiddendim=8, sent_rnn_layers=1,
               video_encoder='query_aware_encoder', video_rnn_hiddendim=8,
               video_rnn_layers=1, crossmodal='vs', predictor='mlp',
               mlp_hidden_dim=8, span_hidden_dim=8, mask=False, dropout=0.0,
               m_temp='none', m_pred_hidden=16, m_pred_activ='relu',
               precision='f32', mesh_shape=[8])
    queries = rng.randn(16, N, 300).astype(np.float32)
    ids = (np.arange(16) % V).astype(np.int32)

    g_rep = MultiQueryGrounder(cfg, params, query_batch=8)
    g_rep.set_corpus(pack, chunk_videos=4)
    p_rep, s_rep = g_rep.ground_bank(queries, ids)

    g_sh = MultiQueryGrounder(cfg, params, query_batch=8)
    g_sh.set_corpus(pack, chunk_videos=4, shard=True)
    assert g_sh._resident_bank.shape[0] == 16  # padded to device multiple
    p_sh, s_sh = g_sh.ground_bank(queries, ids)

    np.testing.assert_allclose(p_sh, p_rep, atol=1e-5)
    np.testing.assert_allclose(s_sh, s_rep, rtol=1e-4, atol=1e-6)


def test_ground_tokens_video_equals_ground(model_and_params, rng):
    """Single-resident-video token-id serving (the long-video deployment
    path: ~60 B/query over the link instead of ~18 KB) must equal
    feature serving when the features are the vocab matrix's rows."""
    model, params = model_and_params
    cfg = dict(sent_rnn_hiddendim=8, sent_rnn_layers=1,
               video_encoder='query_aware_encoder', video_rnn_hiddendim=8,
               video_rnn_layers=1, crossmodal='vs', predictor='mlp',
               mlp_hidden_dim=8, span_hidden_dim=8, mask=False, dropout=0.0,
               m_temp='none', m_pred_hidden=16, m_pred_activ='relu',
               precision='f32', mesh_shape=[8])
    g = MultiQueryGrounder(cfg, params, query_batch=8)
    g.set_video(rng.randn(T, DV).astype(np.float32))
    emb = rng.randn(50, 300).astype(np.float32)
    g.set_vocab(emb)
    token_ids = rng.randint(0, 50, (11, N)).astype(np.int32)
    p_tok, s_tok = g.ground_tokens_video(token_ids)
    p_feat, s_feat = g.ground(None, emb[token_ids])
    np.testing.assert_allclose(p_tok, p_feat, atol=1e-5)
    np.testing.assert_allclose(s_tok, s_feat, rtol=1e-5, atol=1e-6)


def _write_tiny_pack(rng, tmp_path, V=7):
    import json
    import struct

    feats = rng.randn(V, T, DV).astype(np.float16)
    pack_dir = tmp_path / 'pack_i8'
    pack_dir.mkdir()
    with open(pack_dir / 'pack.bin', 'wb') as f:
        f.write(struct.pack('<8sIIIIQ', b'FEATPAK1', V, T, DV, 1, 0))
        f.write(feats.tobytes())
    vids = {f'v{i:03d}': i for i in range(V)}
    json.dump({'vids': vids, 'nfeats': [T] * V, 't': T, 'd': DV,
               'dtype': 'f16', 'mode': 'raw'},
              open(pack_dir / 'index.json', 'w'))
    from shufflingvideosfortsg_tpu.data.featpack import PackedFeatureSource
    return PackedFeatureSource(str(pack_dir), use_native=False)


def test_int8_corpus_bank_close_to_raw(model_and_params, rng, tmp_path):
    """set_corpus(dtype='int8'): the bank is stored as (int8 rows, f32
    per-frame scales) at half the residency; grounding stays within the
    quantization noise of the raw corpus bank, and the sharded int8 bank
    equals the replicated int8 bank exactly."""
    model, params = model_and_params
    V = 7
    pack = _write_tiny_pack(rng, tmp_path, V)
    cfg = dict(sent_rnn_hiddendim=8, sent_rnn_layers=1,
               video_encoder='query_aware_encoder', video_rnn_hiddendim=8,
               video_rnn_layers=1, crossmodal='vs', predictor='mlp',
               mlp_hidden_dim=8, span_hidden_dim=8, mask=False, dropout=0.0,
               m_temp='none', m_pred_hidden=16, m_pred_activ='relu',
               precision='f32', mesh_shape=[8])
    queries = rng.randn(10, N, 300).astype(np.float32)
    ids = (np.arange(10) % V).astype(np.int32)

    g = MultiQueryGrounder(cfg, params, query_batch=8)
    g.set_corpus(pack, chunk_videos=4)
    p_raw, s_raw = g.ground_bank(queries, ids)

    g8 = MultiQueryGrounder(cfg, params, query_batch=8)
    g8.set_corpus(pack, chunk_videos=4, dtype='int8')
    qb, sb = g8._resident_bank
    assert qb.dtype == jnp.int8
    assert sb.shape == qb.shape[:2]
    p_i8, s_i8 = g8.ground_bank(queries, ids)
    agree = np.mean(np.all(p_raw == p_i8, axis=-1))
    assert agree >= 0.7
    np.testing.assert_allclose(s_raw, s_i8, atol=5e-2)

    g8s = MultiQueryGrounder(cfg, params, query_batch=8)
    g8s.set_corpus(pack, chunk_videos=4, shard=True, dtype='int8')
    assert g8s._resident_bank[0].shape[0] == 8  # padded to device multiple
    p_sh, s_sh = g8s.ground_bank(queries, ids)
    np.testing.assert_array_equal(p_sh, p_i8)
    np.testing.assert_allclose(s_sh, s_i8, rtol=1e-5, atol=1e-6)


def test_ground_topk(model_and_params, rng):
    """ground_topk: rank-1 equals ground's span; proposals respect NMS."""
    model, params = model_and_params
    cfg = dict(sent_rnn_hiddendim=8, sent_rnn_layers=1,
               video_encoder='query_aware_encoder', video_rnn_hiddendim=8,
               video_rnn_layers=1, crossmodal='vs', predictor='mlp',
               mlp_hidden_dim=8, span_hidden_dim=8, mask=False, dropout=0.0,
               m_temp='none', m_pred_hidden=16, m_pred_activ='relu',
               precision='f32', mesh_shape=[8])
    g = MultiQueryGrounder(cfg, params, query_batch=8)
    video = rng.randn(T, DV).astype(np.float32)
    queries = rng.randn(11, N, 300).astype(np.float32)  # 1 full + 1 partial
    pred1, score1 = g.ground(video, queries)
    spans, scores = g.ground_topk(queries, k=4, nms_iou=0.5)
    assert spans.shape == (11, 4, 2) and scores.shape == (11, 4)
    np.testing.assert_array_equal(spans[:, 0], pred1)
    np.testing.assert_allclose(scores[:, 0], score1, rtol=1e-5, atol=1e-6)
    # kept proposals are mutually <= 0.5 IoU
    for q in range(11):
        kept = spans[q][np.isfinite(scores[q])].astype(float)
        for i in range(len(kept)):
            for j in range(i + 1, len(kept)):
                s1, e1 = kept[i]
                s2, e2 = kept[j]
                inter = max(0.0, min(e1, e2) - max(s1, s2))
                union = (e1 - s1) + (e2 - s2) - inter
                assert inter / (union + 1e-4) <= 0.5 + 1e-6


def test_f16_query_ship_decode_neutral(model_and_params, rng):
    """serve_query_dtype='f16': queries ship as f16 and widen to f32 on
    device — spans must match the f32 ship on a seeded stream (the
    GloVe-range features sit far inside f16), scores within the one
    input-rounding step."""
    model, params = model_and_params
    cfg = dict(sent_rnn_hiddendim=8, sent_rnn_layers=1,
               video_encoder='query_aware_encoder', video_rnn_hiddendim=8,
               video_rnn_layers=1, crossmodal='vs', predictor='mlp',
               mlp_hidden_dim=8, span_hidden_dim=8, mask=False, dropout=0.0,
               m_temp='none', m_pred_hidden=16, m_pred_activ='relu',
               precision='f32', mesh_shape=[8])
    g32 = MultiQueryGrounder(cfg, params, query_batch=8)
    g16 = MultiQueryGrounder(dict(cfg, serve_query_dtype='f16'), params,
                             query_batch=8)
    video = rng.randn(T, DV).astype(np.float32)
    queries = (rng.randn(19, N, 300) * 2).astype(np.float32)
    p32, s32 = g32.ground(video, queries)
    p16, s16 = g16.ground(video, queries)
    np.testing.assert_array_equal(p16, p32)
    np.testing.assert_allclose(s16, s32, rtol=5e-3, atol=5e-3)
