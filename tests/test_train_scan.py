"""Chunked scan training (device-bank mode) reproduces the per-step path
bit-for-bit: the scan carries the PRNG key and splits it per step exactly
like the host loop, so same batches + same initial key => same parameters.
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from shufflingvideosfortsg_tpu import cli
from shufflingvideosfortsg_tpu.config import load_config
from shufflingvideosfortsg_tpu.data.device_bank import DeviceFeatureBank
from shufflingvideosfortsg_tpu.data.pipeline import (BatchLoader,
                                                     SentenceGroundingDataset)
from shufflingvideosfortsg_tpu.models import build_model
from shufflingvideosfortsg_tpu.parallel.mesh import create_mesh, shard_batch
from shufflingvideosfortsg_tpu.train.state import (create_train_state,
                                                   make_optimizer)
from shufflingvideosfortsg_tpu.train.steps import make_gmd_train_step

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ANNO = "/root/reference/data/Charades-CD/charades_val.json"
T, D = 16, 32


@pytest.fixture(scope="module")
def pack_dir(tmp_path_factory):
    if not os.path.isfile(ANNO):
        pytest.skip("reference annotations unavailable")
    out = str(tmp_path_factory.mktemp("pack_scan"))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_synth_pack.py"),
         "--annotations", ANNO, "--out", out, "--t", str(T), "--d", str(D),
         "--dtype", "f16"],
        check=True, capture_output=True)
    return out


def test_chunked_scan_training_matches_per_step(pack_dir):
    params = load_config(
        os.path.join(REPO, "cfgs/charades_cd_i3d.yml"),
        overrides=dict(valid_featpath=pack_dir, video_len=T,
                       video_feature_dim=D, sent_len=15,
                       sent_rnn_hiddendim=8, video_rnn_hiddendim=8,
                       mlp_hidden_dim=8, span_hidden_dim=8, m_pred_hidden=8),
        data_root="/root/reference/data")
    ds = SentenceGroundingDataset(params["val_data"],
                                  params["valid_featpath"], params,
                                  dataset_name="charades")
    mesh = create_mesh([1])
    bank = DeviceFeatureBank(ds.pack, ds.vocab, mesh)
    model = build_model(params, 'gmd')
    step = make_gmd_train_step(model, params, assembler=bank.assemble)

    def batches(n):
        loader = BatchLoader(ds, 4, shuffle=False, prefetch=0,
                             device_assemble=True)
        out = []
        for b in loader:
            out.append(b)
            if len(out) == n:
                break
        return out

    def fresh_state():
        mt = np.ones((2, T), np.int32)
        mn = np.ones((2, 15), np.int32)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), np.zeros((2, 15, 300), np.float32), mn,
            np.zeros((2, T, D), np.float32), mt,
            np.zeros((2, T, D), np.float32), mt, mt, mt, mt, mt, mt, mt)
        tx = make_optimizer(params, steps_per_epoch=10)
        return create_train_state(variables['params'], tx)

    host_batches = batches(6)

    # per-step reference: the exact host-loop key discipline
    state_a = fresh_state()
    key = jax.random.PRNGKey(11)
    losses_a = []
    for b in host_batches:
        key, sk = jax.random.split(key)
        state_a, m = step(state_a, shard_batch(mesh, b, bank), sk)
        losses_a.append(float(m['loss']))

    # chunked: two scans of 3 steps, key carried inside
    run = cli._banked_train_chunks_factory(step, bank, mesh)
    state_b = fresh_state()
    key_b = jax.random.PRNGKey(11)
    state_b, key_b, m1 = run(state_b, key_b, host_batches[:3])
    state_b, key_b, m2 = run(state_b, key_b, host_batches[3:])

    # chunk-mean metrics equal the mean of the per-step losses
    np.testing.assert_allclose(float(m1['loss']), np.mean(losses_a[:3]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m2['loss']), np.mean(losses_a[3:]),
                               rtol=1e-5)
    # same final parameters (identical key stream + batches)
    leaves_a = jax.tree.leaves(state_a.params)
    leaves_b = jax.tree.leaves(state_b.params)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=1e-6, rtol=1e-5)
    # the carried key matches the host loop's final key
    np.testing.assert_array_equal(np.asarray(key), np.asarray(key_b))
