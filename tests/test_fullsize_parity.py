"""Full-size (production-dimension) Baseline parity vs the torch oracle:
T=128, D=1024, H=256, N=15 — the Charades-CD configuration. Slower than the
small-dim parity tests but pins the real shapes end-to-end."""

import numpy as np
import torch

import jax.numpy as jnp

from shufflingvideosfortsg_tpu.models import Baseline
from shufflingvideosfortsg_tpu.utils.torch_interop import (
    convert_reference_state_dict)

B, T, N = 4, 128, 15
D_WORD, D_VID = 300, 1024
H = 256
TEXT_DIM = VIS_DIM = 512


def test_fullsize_baseline_parity(rng):
    torch.manual_seed(3)
    sd = {}

    def reg(prefix, mod):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v.detach().numpy()
        return mod

    word_embed = reg("sentence_encoder.word_embed", torch.nn.Linear(300, 300))
    sent_lstm = reg("sentence_encoder.rnn_cell.lstm",
                    torch.nn.LSTM(300, H, 2, batch_first=True,
                                  bidirectional=True))
    blocks = []
    for i in range(2):
        in_dim = D_VID if i == 0 else VIS_DIM
        blocks.append(dict(
            lstm=reg(f"video_encoder.blocks.{i}.rnn_cell.lstm",
                     torch.nn.LSTM(in_dim, H, 2, batch_first=True,
                                   bidirectional=True)),
            W_s=reg(f"video_encoder.blocks.{i}.attention.W_s",
                    torch.nn.Linear(TEXT_DIM, VIS_DIM, bias=False)),
            W_a=reg(f"video_encoder.blocks.{i}.attention.W_a",
                    torch.nn.Linear(VIS_DIM, VIS_DIM)),
            w=reg(f"video_encoder.blocks.{i}.attention.w",
                  torch.nn.Linear(VIS_DIM, 1, bias=False)),
            sl=reg(f"video_encoder.blocks.{i}.sent_linear",
                   torch.nn.Linear(TEXT_DIM, VIS_DIM)),
        ))
    norm = reg("video_encoder.norm", torch.nn.LayerNorm(VIS_DIM))
    heads = {}
    for h in ("start", "end"):
        heads[f"{h}1"] = reg(f"span_predictor.predictor.{h}_mlp_1",
                             torch.nn.Linear(VIS_DIM + TEXT_DIM, 256))
        heads[f"{h}2"] = reg(f"span_predictor.predictor.{h}_mlp_2",
                             torch.nn.Linear(256, 1))

    sent = rng.randn(B, N, D_WORD).astype(np.float32)
    video = rng.randn(B, T, D_VID).astype(np.float32)

    with torch.no_grad():
        we = word_embed(torch.from_numpy(sent))
        word_feat, (hn, _) = sent_lstm(we)
        sent_embed = torch.cat([hn[-2], hn[-1]], -1)
        residual = torch.from_numpy(video)
        for blk in blocks:
            rnn_out, _ = blk["lstm"](residual)
            Ws = blk["W_s"](word_feat)
            Wa = blk["W_a"](rnn_out)
            P = torch.softmax(
                blk["w"](torch.tanh(Wa.unsqueeze(2) + Ws.unsqueeze(1))
                         ).squeeze(-1), dim=-1)
            C = torch.bmm(P, word_feat)
            residual = rnn_out * torch.sigmoid(blk["sl"](C))
        frame = norm(residual)
        cross = torch.cat([frame, sent_embed.unsqueeze(1).expand(-1, T, -1)],
                          -1)
        ws = torch.softmax(heads["start2"](
            torch.tanh(heads["start1"](cross))).squeeze(-1), 1)
        we_ = torch.softmax(heads["end2"](
            torch.tanh(heads["end1"](cross))).squeeze(-1), 1)

    model = Baseline(sent_hidden=H, sent_layers=2, video_hidden=H,
                     video_layers=2, nblocks=2, cross_name='vs',
                     predictor_name='mlp', mlp_hidden_dim=256,
                     span_hidden_dim=128, video_if_mask=False, dropout=0.0)
    params = convert_reference_state_dict(sd, kind='baseline')
    out = model.apply({'params': params}, jnp.array(video), jnp.array(sent))
    np.testing.assert_allclose(np.asarray(out['start_prob']), ws.numpy(),
                               atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out['end_prob']), we_.numpy(),
                               atol=5e-5, rtol=1e-3)
