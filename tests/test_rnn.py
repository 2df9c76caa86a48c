"""BiLSTM/BiGRU parity vs torch cuDNN-layout RNNs with transplanted weights.

This is the strongest correctness anchor for the rebuild: the reference's
compute is dominated by five BiLSTM stacks, so exact recurrence parity here
transfers directly to model-level parity.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.ops.rnn import BiGRU, BiLSTM
from shufflingvideosfortsg_tpu.utils.torch_interop import bilstm_from_torch


def torch_sd_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


@pytest.mark.parametrize("num_layers", [1, 2])
@pytest.mark.parametrize("B,T,D,H", [(3, 11, 16, 8), (2, 25, 300, 32)])
def test_bilstm_matches_torch(num_layers, B, T, D, H, rng):
    torch.manual_seed(0)
    ref = torch.nn.LSTM(D, H, num_layers, batch_first=True,
                        bidirectional=True, dropout=0.0)
    x = rng.randn(B, T, D).astype(np.float32)
    with torch.no_grad():
        want_out, (want_hn, want_cn) = ref(torch.from_numpy(x))

    model = BiLSTM(hidden_size=H, num_layers=num_layers)
    variables = model.init(jax.random.PRNGKey(0), jnp.array(x))
    sd = {f"lstm.{k}": v for k, v in torch_sd_numpy(ref).items()}
    params = bilstm_from_torch(sd, "lstm", num_layers)
    got_out, got_hn, got_cn = model.apply({"params": params}, jnp.array(x))

    np.testing.assert_allclose(np.asarray(got_out), want_out.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_hn), want_hn.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_cn), want_cn.numpy(),
                               atol=2e-5, rtol=1e-4)
    # init produced the same tree structure as the converted params
    assert set(variables["params"].keys()) == set(params.keys())
    for k in params:
        assert variables["params"][k].shape == params[k].shape


def test_bigru_matches_torch(rng):
    B, T, D, H, L = 2, 13, 20, 12, 2
    torch.manual_seed(1)
    ref = torch.nn.GRU(D, H, L, batch_first=True, bidirectional=True)
    x = rng.randn(B, T, D).astype(np.float32)
    with torch.no_grad():
        want_out, want_hn = ref(torch.from_numpy(x))

    model = BiGRU(hidden_size=H, num_layers=L)
    model.init(jax.random.PRNGKey(0), jnp.array(x))
    sd = torch_sd_numpy(ref)
    params = {}
    for layer in range(L):
        w_ih, w_hh, b_ih, b_hh = [], [], [], []
        for rev in ("", "_reverse"):
            w_ih.append(sd[f"weight_ih_l{layer}{rev}"].T)
            w_hh.append(sd[f"weight_hh_l{layer}{rev}"].T)
            b_ih.append(sd[f"bias_ih_l{layer}{rev}"])
            b_hh.append(sd[f"bias_hh_l{layer}{rev}"])
        params[f"w_ih_l{layer}"] = np.stack(w_ih, 0)
        params[f"w_hh_l{layer}"] = np.stack(w_hh, 0)
        params[f"b_ih_l{layer}"] = np.stack(b_ih, 0)
        params[f"b_hh_l{layer}"] = np.stack(b_hh, 0)
    got_out, got_hn = model.apply({"params": params}, jnp.array(x))
    np.testing.assert_allclose(np.asarray(got_out), want_out.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_hn), want_hn.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_bilstm_hn_matches_output_edges(rng):
    # hn[-2] must equal fwd output at t=T-1; hn[-1] the bwd output at t=0
    B, T, D, H = 4, 9, 10, 6
    model = BiLSTM(hidden_size=H, num_layers=2)
    x = jnp.array(rng.randn(B, T, D).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(2), x)
    out, hn, _ = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out[:, -1, :H]), np.asarray(hn[-2]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, 0, H:]), np.asarray(hn[-1]), rtol=1e-6)


def test_bilstm_dropout_active_only_in_training(rng):
    B, T, D, H = 2, 5, 8, 4
    model = BiLSTM(hidden_size=H, num_layers=2, dropout=0.5)
    x = jnp.array(rng.randn(B, T, D).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out_det, _, _ = model.apply(variables, x, deterministic=True)
    out_det2, _, _ = model.apply(variables, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_det), np.asarray(out_det2))
    out_tr, _, _ = model.apply(variables, x, deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(7)})
    assert not np.allclose(np.asarray(out_tr), np.asarray(out_det))
