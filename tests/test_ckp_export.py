"""Checkpoint EXPORT interop: weights trained in this framework load into
the reference's own torch GMD via ``load_state_dict(strict=True)`` and
produce the same forward — the inverse of the ``.ckp`` reader.

The oracle is the reference's actual module tree
(/root/reference/grounding/model/SpanGroundMatchDisc.py), the same import
pattern as tests/test_grad_parity.py. Asserted here:

1. exported key set == the reference ``state_dict()`` key set exactly
   (so ``strict=True`` holds for any consumer),
2. reference eval_forward on the exported weights == our eval_forward,
3. export -> import roundtrip reproduces the param pytree bit-exactly,
4. ``save_reference_ckp`` files read back through our own
   ``load_checkpoint`` (which detects the torch format).
"""

import logging
import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.models import GMD
from shufflingvideosfortsg_tpu.utils.saver import load_checkpoint
from shufflingvideosfortsg_tpu.utils.torch_interop import (
    convert_reference_state_dict, convert_to_reference_state_dict,
    save_reference_ckp)

REF_GROUNDING = "/root/reference/grounding"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_GROUNDING), reason="reference tree unavailable")

D_WORD, H_SENT, L_SENT = 20, 12, 2
D_VID, H_VID, L_VID, NBLOCKS = 10, 16, 2, 2
MLP_HID, M_PRED_HID, SPAN_HID = 8, 16, 4
B, T, N = 4, 20, 7


@pytest.fixture(scope="module")
def ref_gmd_cls():
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **kw: self
    sys.path.insert(0, REF_GROUNDING)
    try:
        from model.SpanGroundMatchDisc import GMD as RefGMD
    finally:
        sys.path.remove(REF_GROUNDING)
    yield RefGMD
    torch.Tensor.cuda = orig_cuda


def build_ref_model(RefGMD):
    torch.manual_seed(99)
    log = logging.getLogger("ckp_export_oracle")
    return RefGMD(
        dict(name='query_aware_encoder', input_dim=D_VID,
             rnn_hidden_dim=H_VID, rnn_layers=L_VID, rnn_cell='lstm',
             mask=False, drop_out=0.0, T=T, nblocks=NBLOCKS),
        dict(name='rnn', input_dim=D_WORD, rnn_hidden_dim=H_SENT,
             rnn_layers=L_SENT, rnn_cell='lstm', drop_out=0.0),
        dict(cross_name='vs', name='mlp', lstm_hidden_dim=SPAN_HID,
             mlp_hidden_dim=MLP_HID),
        dict(cross=dict(name='concat'),
             temporal=dict(name='none', hidden_dim=256, layers=2,
                           dropout=0.0),
             predict=dict(name='mlp', activation='relu',
                          hidden_dim=M_PRED_HID)),
        log, 0.0)


def make_flax_params():
    model = GMD(sent_hidden=H_SENT, sent_layers=L_SENT, video_hidden=H_VID,
                video_layers=L_VID, nblocks=NBLOCKS, cross_name='vs',
                predictor_name='mlp', mlp_hidden_dim=MLP_HID,
                span_hidden_dim=SPAN_HID, video_if_mask=False, dropout=0.0,
                m_temp='none', m_pred_hidden=M_PRED_HID,
                m_pred_activ='relu')
    rng = np.random.RandomState(3)
    sent = jnp.asarray(rng.randn(B, N, D_WORD), jnp.float32)
    video = jnp.asarray(rng.randn(B, T, D_VID), jnp.float32)
    masks = [jnp.ones((B, T), jnp.int32)] * 6
    variables = model.init(jax.random.PRNGKey(11), sent,
                           jnp.ones((B, N), jnp.int32), video,
                           jnp.ones((B, T), jnp.int32), video,
                           jnp.ones((B, T), jnp.int32), *masks)
    return model, variables['params']


EXPORT_KW = dict(kind='gmd', sent_layers=L_SENT, video_layers=L_VID,
                 nblocks=NBLOCKS, predictor_name='mlp', m_temp='none')


def test_exported_keys_match_reference_state_dict(ref_gmd_cls):
    ref = build_ref_model(ref_gmd_cls)
    _, params = make_flax_params()
    sd = convert_to_reference_state_dict(params, **EXPORT_KW)
    want = {k: tuple(v.shape) for k, v in ref.state_dict().items()}
    got = {k: tuple(v.shape) for k, v in sd.items()}
    assert got == want


def test_reference_model_runs_exported_weights(ref_gmd_cls):
    ref = build_ref_model(ref_gmd_cls)
    ref.eval()
    model, params = make_flax_params()
    sd = convert_to_reference_state_dict(params, **EXPORT_KW)
    missing = ref.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=True)
    assert not missing.missing_keys and not missing.unexpected_keys

    rng = np.random.RandomState(17)
    sent = rng.randn(B, N, D_WORD).astype(np.float32)
    video = rng.randn(B, T, D_VID).astype(np.float32)

    with torch.no_grad():
        span = ref.eval_forward(torch.from_numpy(video),
                                torch.from_numpy(sent),
                                torch.ones(B, T), torch.ones(B, N))
    out = model.apply({'params': params}, jnp.asarray(video),
                      jnp.asarray(sent), jnp.ones((B, T), jnp.int32),
                      jnp.ones((B, N), jnp.int32),
                      method=model.eval_forward)
    np.testing.assert_allclose(np.asarray(out['start_prob']),
                               span['start'].numpy(), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(out['end_prob']),
                               span['end'].numpy(), atol=2e-5, rtol=2e-5)


def test_export_import_roundtrip_bit_exact():
    _, params = make_flax_params()
    sd = convert_to_reference_state_dict(params, **EXPORT_KW)
    back = convert_reference_state_dict(sd, **EXPORT_KW)
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b))


def test_saved_file_reads_back_through_load_checkpoint(tmp_path):
    _, params = make_flax_params()
    path = str(tmp_path / 'exported.ckp')
    save_reference_ckp(params, path, **EXPORT_KW)
    payload, is_ref = load_checkpoint(
        path, torch_convert_kwargs=EXPORT_KW)
    assert is_ref
    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(payload['params'])[0]
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b))
