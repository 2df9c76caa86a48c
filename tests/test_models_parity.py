"""Model-level numerical parity vs a functional torch oracle.

Strategy: random torch Linear/LSTM/LayerNorm modules provide the weights;
their tensors are registered under reference-format state_dict keys and
converted through ``convert_reference_state_dict`` (the same path a real
reference checkpoint would take). The oracle then computes the published
architecture step-by-step with torch functional ops, and the flax models
must match to float32 tolerance.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.models import Baseline, GMD
from shufflingvideosfortsg_tpu.utils.torch_interop import (
    convert_reference_state_dict)

# small dims for speed
D_WORD, H_SENT, L_SENT = 20, 12, 2
D_VID, H_VID, L_VID, NBLOCKS = 10, 16, 2, 2
TEXT_DIM, VIS_DIM = 2 * H_SENT, 2 * H_VID
MLP_HID = 8
M_PRED_HID = 16
B, T, N = 3, 17, 7

torch.manual_seed(42)


def _register(sd, prefix, module):
    for k, v in module.state_dict().items():
        sd[f"{prefix}.{k}"] = v.detach().numpy()
    return module


def build_reference_weights():
    """Create torch modules for every GMD component and a reference-format
    state_dict view of them."""
    sd = {}
    mods = {}
    mods["word_embed"] = _register(sd, "sentence_encoder.word_embed",
                                   torch.nn.Linear(D_WORD, D_WORD))
    mods["sent_lstm"] = _register(
        sd, "sentence_encoder.rnn_cell.lstm",
        torch.nn.LSTM(D_WORD, H_SENT, L_SENT, batch_first=True, bidirectional=True))
    for i in range(NBLOCKS):
        in_dim = D_VID if i == 0 else VIS_DIM
        mods[f"vid_lstm{i}"] = _register(
            sd, f"video_encoder.blocks.{i}.rnn_cell.lstm",
            torch.nn.LSTM(in_dim, H_VID, L_VID, batch_first=True, bidirectional=True))
        mods[f"W_s{i}"] = _register(sd, f"video_encoder.blocks.{i}.attention.W_s",
                                    torch.nn.Linear(TEXT_DIM, VIS_DIM, bias=False))
        mods[f"W_a{i}"] = _register(sd, f"video_encoder.blocks.{i}.attention.W_a",
                                    torch.nn.Linear(VIS_DIM, VIS_DIM))
        mods[f"w{i}"] = _register(sd, f"video_encoder.blocks.{i}.attention.w",
                                  torch.nn.Linear(VIS_DIM, 1, bias=False))
        mods[f"sent_linear{i}"] = _register(
            sd, f"video_encoder.blocks.{i}.sent_linear",
            torch.nn.Linear(TEXT_DIM, VIS_DIM))
    mods["vid_norm"] = _register(sd, "video_encoder.norm",
                                 torch.nn.LayerNorm(VIS_DIM))
    cross_dim = VIS_DIM + TEXT_DIM
    for head in ("start", "end"):
        mods[f"{head}_mlp_1"] = _register(
            sd, f"span_predictor.predictor.{head}_mlp_1",
            torch.nn.Linear(cross_dim, MLP_HID))
        mods[f"{head}_mlp_2"] = _register(
            sd, f"span_predictor.predictor.{head}_mlp_2",
            torch.nn.Linear(MLP_HID, 1))
    mods["m_pred_1"] = _register(sd, "csmm.predict.predict.0",
                                 torch.nn.Linear(cross_dim, M_PRED_HID))
    mods["m_pred_2"] = _register(sd, "csmm.predict.predict.2",
                                 torch.nn.Linear(M_PRED_HID, 1))
    mods["foreback"] = _register(sd, "tod.foreback_context.0",
                                 torch.nn.Linear(VIS_DIM * 2, VIS_DIM))
    mods["classifier"] = _register(sd, "tod.fc_classifier_domain_video.0",
                                   torch.nn.Linear(VIS_DIM * 3, 2))
    return sd, mods


def scdm_oracle(video, sent, W_s, W_a, w):
    """Batched restatement of SCDM additive attention."""
    Ws = W_s(sent)      # [B, N, H]
    Wa = W_a(video)     # [B, T, H]
    act = torch.tanh(Wa.unsqueeze(2) + Ws.unsqueeze(1))  # [B, T, N, H]
    P = torch.softmax(w(act).squeeze(-1), dim=-1)        # [B, T, N]
    return torch.bmm(P, sent)                            # [B, T, D_s]


def oracle_encoders(mods, sent_x, video_x):
    we = mods["word_embed"](sent_x)
    word_feat, (hn, _) = mods["sent_lstm"](we)
    sent_embed = torch.cat([hn[-2], hn[-1]], -1)
    residual = video_x
    for i in range(NBLOCKS):
        rnn_out, _ = mods[f"vid_lstm{i}"](residual)
        C = scdm_oracle(rnn_out, word_feat, mods[f"W_s{i}"], mods[f"W_a{i}"],
                        mods[f"w{i}"])
        gate = torch.sigmoid(mods[f"sent_linear{i}"](C))
        residual = rnn_out * gate
    frame_feat = mods["vid_norm"](residual)
    return word_feat, sent_embed, frame_feat


def oracle_span(mods, feat):
    s = mods["start_mlp_2"](torch.tanh(mods["start_mlp_1"](feat))).squeeze(-1)
    e = mods["end_mlp_2"](torch.tanh(mods["end_mlp_1"](feat))).squeeze(-1)
    return torch.softmax(s, 1), torch.softmax(e, 1)


def oracle_csmm(mods, frame_feat, sent_embed):
    q = sent_embed.unsqueeze(1).expand(-1, frame_feat.shape[1], -1)
    cross = torch.cat([frame_feat, q], -1)
    return mods["m_pred_2"](torch.relu(mods["m_pred_1"](cross))).squeeze(-1)


def avg_mask(feat, mask):
    m = mask.unsqueeze(-1).float()
    return (feat * m).sum(1) / (mask.float().sum(1, keepdim=True) + 1e-6)


def oracle_tod(mods, feat, target_mask, fore_mask, back_mask):
    target = avg_mask(feat, target_mask)
    fore = avg_mask(feat, fore_mask)
    back = avg_mask(feat, back_mask)
    fore_feat = torch.relu(mods["foreback"](torch.cat([fore, target], -1)))
    back_feat = torch.relu(mods["foreback"](torch.cat([target, back], -1)))
    return mods["classifier"](torch.cat([target, fore_feat, back_feat], -1))


@pytest.fixture(scope="module")
def weights():
    return build_reference_weights()


def model_kwargs():
    return dict(sent_hidden=H_SENT, sent_layers=L_SENT,
                video_hidden=H_VID, video_layers=L_VID, nblocks=NBLOCKS,
                cross_name='vs', predictor_name='mlp',
                mlp_hidden_dim=MLP_HID, span_hidden_dim=4,
                video_if_mask=False, dropout=0.0)


def make_inputs(rng):
    sent = rng.randn(B, N, D_WORD).astype(np.float32)
    video = rng.randn(B, T, D_VID).astype(np.float32)
    return sent, video


def test_baseline_forward_parity(weights, rng):
    sd, mods = weights
    sent, video = make_inputs(rng)
    with torch.no_grad():
        word_feat, sent_embed, frame_feat = oracle_encoders(
            mods, torch.from_numpy(sent), torch.from_numpy(video))
        cross = torch.cat([frame_feat,
                           sent_embed.unsqueeze(1).expand(-1, T, -1)], -1)
        want_s, want_e = oracle_span(mods, cross)

    model = Baseline(**model_kwargs())
    params = convert_reference_state_dict(sd, kind='baseline')
    out = model.apply({'params': params}, jnp.array(video), jnp.array(sent))
    np.testing.assert_allclose(np.asarray(out['start_prob']), want_s.numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out['end_prob']), want_e.numpy(),
                               atol=3e-5, rtol=1e-4)


def test_gmd_eval_forward_parity(weights, rng):
    sd, mods = weights
    sent, video = make_inputs(rng)
    with torch.no_grad():
        word_feat, sent_embed, frame_feat = oracle_encoders(
            mods, torch.from_numpy(sent), torch.from_numpy(video))
        match_logit = oracle_csmm(mods, frame_feat, sent_embed)
        cross = torch.cat([frame_feat,
                           sent_embed.unsqueeze(1).expand(-1, T, -1)], -1)
        gated = match_logit.unsqueeze(-1) * cross
        want_s, want_e = oracle_span(mods, gated)

    model = GMD(m_temp='none', m_pred_hidden=M_PRED_HID, m_pred_activ='relu',
                **model_kwargs())
    params = convert_reference_state_dict(sd, kind='gmd')
    out = model.apply({'params': params}, jnp.array(video), jnp.array(sent),
                      method=GMD.eval_forward)
    np.testing.assert_allclose(np.asarray(out['match_prob']),
                               match_logit.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out['start_prob']), want_s.numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out['end_prob']), want_e.numpy(),
                               atol=3e-5, rtol=1e-4)


def test_gmd_train_forward_parity(weights, rng):
    sd, mods = weights
    sent, video = make_inputs(rng)
    pseudo = np.ascontiguousarray(video[:, ::-1])  # any permutation works
    tm = (rng.rand(B, T) > 0.5).astype(np.int32)
    fm = (rng.rand(B, T) > 0.5).astype(np.int32)
    bm = (rng.rand(B, T) > 0.5).astype(np.int32)
    vm = np.ones((B, T), np.int32)

    with torch.no_grad():
        word_feat, sent_embed, ori_frame = oracle_encoders(
            mods, torch.from_numpy(sent), torch.from_numpy(video))
        _, _, pse_frame = oracle_encoders(
            mods, torch.from_numpy(sent), torch.from_numpy(pseudo))
        ori_match = oracle_csmm(mods, ori_frame, sent_embed)
        pse_match = oracle_csmm(mods, pse_frame, sent_embed)
        cross = torch.cat([ori_frame,
                           sent_embed.unsqueeze(1).expand(-1, T, -1)], -1)
        want_s, want_e = oracle_span(mods, ori_match.unsqueeze(-1) * cross)
        want_disc_o = oracle_tod(mods, ori_frame, torch.from_numpy(tm),
                                 torch.from_numpy(fm), torch.from_numpy(bm))
        want_disc_p = oracle_tod(mods, pse_frame, torch.from_numpy(tm),
                                 torch.from_numpy(fm), torch.from_numpy(bm))

    model = GMD(m_temp='none', m_pred_hidden=M_PRED_HID, m_pred_activ='relu',
                **model_kwargs())
    params = convert_reference_state_dict(sd, kind='gmd')
    out = model.apply(
        {'params': params}, jnp.array(sent), jnp.ones((B, N), jnp.int32),
        jnp.array(video), jnp.array(vm), jnp.array(pseudo), jnp.array(vm),
        jnp.array(tm), jnp.array(fm), jnp.array(bm),
        jnp.array(tm), jnp.array(fm), jnp.array(bm))
    np.testing.assert_allclose(np.asarray(out['ori_match_prob']),
                               ori_match.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out['pseudo_match_prob']),
                               pse_match.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out['start_prob']), want_s.numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out['end_prob']), want_e.numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out['ori_disc_prob']),
                               want_disc_o.numpy(), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out['pseudo_disc_prob']),
                               want_disc_p.numpy(), atol=3e-5, rtol=1e-4)


def test_init_tree_matches_converted(weights):
    """model.init must produce the same tree structure/shapes as conversion."""
    sd, _ = weights
    model = GMD(m_temp='none', m_pred_hidden=M_PRED_HID, m_pred_activ='relu',
                **model_kwargs())
    video = jnp.zeros((1, T, D_VID))
    sent = jnp.zeros((1, N, D_WORD))
    m = jnp.ones((1, T), jnp.int32)
    # init through the full train forward so every head (incl. TOD, which
    # eval_forward never touches) gets parameters
    variables = model.init(jax.random.PRNGKey(0), sent,
                           jnp.ones((1, N), jnp.int32), video, m, video, m,
                           m, m, m, m, m, m)
    converted = convert_reference_state_dict(sd, kind='gmd')

    flat_init = jax.tree_util.tree_flatten_with_path(variables['params'])[0]
    flat_conv = jax.tree_util.tree_flatten_with_path(converted)[0]
    paths_init = {jax.tree_util.keystr(p): v.shape for p, v in flat_init}
    paths_conv = {jax.tree_util.keystr(p): v.shape for p, v in flat_conv}
    assert paths_init == paths_conv
