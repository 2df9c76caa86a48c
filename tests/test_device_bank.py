"""Device-resident feature bank: assembled device batches are identical to
host-gathered batches, and the train step computes the same loss either way.

The bank exists because the driver path was H2D-bound (data/device_bank.py
module docstring); correctness is pure parity — same pack bytes, same GloVe
rows, same inclusive-end mask semantics as data/masks.py.
"""

import json
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from shufflingvideosfortsg_tpu.config import load_config
from shufflingvideosfortsg_tpu.data.device_bank import (DeviceFeatureBank,
                                                        maybe_device_bank)
from shufflingvideosfortsg_tpu.data.pipeline import (BatchLoader,
                                                     SentenceGroundingDataset)
from shufflingvideosfortsg_tpu.parallel.mesh import create_mesh, shard_batch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ANNO = "/root/reference/data/Charades-CD/charades_val.json"

T, D = 16, 32


@pytest.fixture(scope="module")
def pack_dir(tmp_path_factory):
    if not os.path.isfile(ANNO):
        pytest.skip("reference annotations unavailable")
    out = str(tmp_path_factory.mktemp("pack_f16"))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_synth_pack.py"),
         "--annotations", ANNO, "--out", out, "--t", str(T), "--d", str(D),
         "--dtype", "f16"],
        check=True, capture_output=True)
    return out


def _params(pack, **over):
    return load_config(
        os.path.join(REPO, "cfgs/charades_cd_i3d.yml"),
        overrides=dict(valid_featpath=pack, video_len=T,
                       video_feature_dim=D, sent_len=15,
                       sent_rnn_hiddendim=8, video_rnn_hiddendim=8,
                       mlp_hidden_dim=8, span_hidden_dim=8,
                       m_pred_hidden=8, **over),
        data_root="/root/reference/data")


def _dataset(params):
    return SentenceGroundingDataset(params["val_data"],
                                    params["valid_featpath"], params,
                                    dataset_name="charades")


def test_assembled_batch_matches_host_batch(pack_dir):
    params = _params(pack_dir)
    ds = _dataset(params)
    mesh = create_mesh([1])
    bank = DeviceFeatureBank(ds.pack, ds.vocab, mesh)

    host = next(iter(BatchLoader(ds, 8, shuffle=False, prefetch=0)))
    dev = next(iter(BatchLoader(ds, 8, shuffle=False, prefetch=0,
                                device_assemble=True)))
    for k in ('video_feat', 'sent_feat', 'sent_mask', 'video_mask',
              'temporal_labels', 'fore_masks', 'back_masks'):
        assert k not in dev
    assembled = jax.jit(bank.assemble)(shard_batch(mesh, dev, bank))
    np.testing.assert_array_equal(
        np.asarray(assembled['video_feat']), host['video_feat'])
    np.testing.assert_array_equal(
        np.asarray(assembled['sent_feat']), host['sent_feat'])
    for k in ('sent_mask', 'video_mask', 'temporal_labels', 'fore_masks',
              'back_masks'):
        np.testing.assert_array_equal(np.asarray(assembled[k]), host[k],
                                      err_msg=k)


def test_train_step_loss_matches_host_mode(pack_dir):
    from shufflingvideosfortsg_tpu.models import build_model
    from shufflingvideosfortsg_tpu.train.state import (create_train_state,
                                                       make_optimizer)
    from shufflingvideosfortsg_tpu.train.steps import make_gmd_train_step

    params = _params(pack_dir)
    ds = _dataset(params)
    mesh = create_mesh([1])
    bank = DeviceFeatureBank(ds.pack, ds.vocab, mesh)
    model = build_model(params, 'gmd')

    def fresh_state():
        mt = np.ones((2, T), np.int32)
        mn = np.ones((2, 15), np.int32)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), np.zeros((2, 15, 300), np.float32), mn,
            np.zeros((2, T, D), np.float32), mt,
            np.zeros((2, T, D), np.float32), mt, mt, mt, mt, mt, mt, mt)
        tx = make_optimizer(params, steps_per_epoch=10)
        return create_train_state(variables['params'], tx)

    key = jax.random.PRNGKey(7)
    host_b = next(iter(BatchLoader(ds, 8, shuffle=False, prefetch=0)))
    dev_b = next(iter(BatchLoader(ds, 8, shuffle=False, prefetch=0,
                                  device_assemble=True)))

    step_host = make_gmd_train_step(model, params)
    step_dev = make_gmd_train_step(model, params, assembler=bank.assemble)
    _, m_host = step_host(fresh_state(), shard_batch(mesh, host_b), key)
    _, m_dev = step_dev(fresh_state(), shard_batch(mesh, dev_b, bank), key)
    np.testing.assert_allclose(float(m_host['loss']), float(m_dev['loss']),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m_host['miou']), float(m_dev['miou']),
                               rtol=1e-6)


def test_maybe_device_bank_gating(pack_dir):
    mesh = create_mesh([1])
    params = _params(pack_dir)
    ds = _dataset(params)
    assert maybe_device_bank(params, ds, mesh) is not None

    # disabled by flag
    params2 = _params(pack_dir, device_bank=False)
    assert maybe_device_bank(params2, _dataset(params2), mesh) is None

    # over HBM budget
    params3 = _params(pack_dir, device_bank_max_gb=1e-9)
    assert maybe_device_bank(params3, _dataset(params3), mesh) is None

    # host augmentation on a train split needs host features
    params4 = _params(pack_dir, if_aug=True)
    ds4 = _dataset(params4)
    ds4.is_train = True
    assert maybe_device_bank(params4, ds4, mesh) is None

    # per-file (non-pack) stores have nothing to upload
    ds5 = _dataset(params)
    ds5.pack = None
    assert maybe_device_bank(params, ds5, mesh) is None


def test_bank_budget_is_cumulative(pack_dir, tmp_path, monkeypatch):
    """The HBM budget counts banks already resident: a second, distinct
    pack that fits the budget alone but not alongside the first is
    refused (the cache never evicts, so admitting both would OOM)."""
    from shufflingvideosfortsg_tpu.data import device_bank as db

    second = str(tmp_path / "pack2")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_synth_pack.py"),
         "--annotations", ANNO, "--out", second, "--t", str(T),
         "--d", str(D), "--dtype", "f16", "--seed", "1"],
        check=True, capture_output=True)

    monkeypatch.setattr(db, "_BANK_CACHE", {})
    mesh = create_mesh([1])
    params = _params(pack_dir)
    ds1 = _dataset(params)
    pack_bytes = ds1.pack.num_videos * T * D * 2
    # budget fits ~1.5 packs: the first is admitted, the second refused
    budget_gb = 1.5 * pack_bytes / 2 ** 30
    params = _params(pack_dir, device_bank_max_gb=budget_gb)
    assert maybe_device_bank(params, ds1, mesh) is not None

    params2 = _params(second, device_bank_max_gb=budget_gb)
    ds2 = _dataset(params2)
    assert maybe_device_bank(params2, ds2, mesh) is None

    # re-requesting the FIRST pack still hits the cache (not refused by
    # its own residency)
    assert maybe_device_bank(params, ds1, mesh) is not None


def test_chunked_upload_reconstructs_exactly():
    """_upload_replicated with a small chunk size (forcing the donated
    dynamic_update_slice path) reproduces the host array bit-for-bit."""
    from shufflingvideosfortsg_tpu.data.device_bank import _upload_replicated
    from shufflingvideosfortsg_tpu.parallel.mesh import replicated_sharding

    mesh = create_mesh([1])
    host = np.arange(997 * 16, dtype=np.float16).reshape(997, 16)
    out = _upload_replicated(host, replicated_sharding(mesh),
                             chunk_bytes=100 * 16 * 2)  # 100-row chunks
    np.testing.assert_array_equal(np.asarray(out), host)


@pytest.fixture(scope="module")
def pack_dir_f32(tmp_path_factory):
    if not os.path.isfile(ANNO):
        pytest.skip("reference annotations unavailable")
    out = str(tmp_path_factory.mktemp("pack_f32"))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_synth_pack.py"),
         "--annotations", ANNO, "--out", out, "--t", str(T), "--d", str(D),
         "--dtype", "f32"],
        check=True, capture_output=True)
    return out


def test_bf16_bank_tier_decode_neutral(pack_dir_f32):
    """device_bank_dtype='bf16': an f32 pack's bank is stored bf16 (half
    the HBM residency) and the banked eval decode is identical — same
    predicted spans, scores equal to bf16 rounding (VERDICT r2 item 7)."""
    import jax.numpy as jnp

    from shufflingvideosfortsg_tpu.models import build_model
    from shufflingvideosfortsg_tpu.train.steps import make_gmd_test_step

    params = _params(pack_dir_f32)
    ds = _dataset(params)
    mesh = create_mesh([1])
    bank_raw = DeviceFeatureBank(ds.pack, ds.vocab, mesh)
    bank_bf16 = DeviceFeatureBank(ds.pack, ds.vocab, mesh, dtype="bf16")
    assert bank_raw.feats.dtype == jnp.float32
    assert bank_bf16.feats.dtype == jnp.bfloat16
    assert bank_bf16.nbytes < bank_raw.nbytes

    model = build_model(params, "gmd", inference=True)
    mt = np.ones((2, T), np.int32)
    mn = np.ones((2, 15), np.int32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((2, 15, 300), np.float32), mn,
        np.zeros((2, T, D), np.float32), mt,
        np.zeros((2, T, D), np.float32), mt, mt, mt, mt, mt, mt, mt)

    dev_b = next(iter(BatchLoader(ds, 8, shuffle=False, prefetch=0,
                                  device_assemble=True)))
    step = make_gmd_test_step(model, assembler=DeviceFeatureBank.assemble)
    out_raw = step(variables["params"], shard_batch(mesh, dev_b, bank_raw))
    out_bf16 = step(variables["params"], shard_batch(mesh, dev_b, bank_bf16))
    np.testing.assert_array_equal(np.asarray(out_raw["pred_time"]),
                                  np.asarray(out_bf16["pred_time"]))
    np.testing.assert_allclose(np.asarray(out_raw["score"]),
                               np.asarray(out_bf16["score"]), atol=2e-2)
    np.testing.assert_allclose(float(out_raw["miou"]),
                               float(out_bf16["miou"]), atol=1e-6)


def test_bf16_bank_gating_and_budget(pack_dir_f32, monkeypatch):
    """maybe_device_bank accounts the bf16 tier at half the f32 bytes and
    keys the cache by dtype (a raw and a bf16 bank of the same pack are
    distinct residents)."""
    from shufflingvideosfortsg_tpu.data import device_bank as db

    monkeypatch.setattr(db, "_BANK_CACHE", {})
    mesh = create_mesh([1])
    params = _params(pack_dir_f32)
    ds = _dataset(params)
    f32_bytes = ds.pack.num_videos * T * D * 4
    # budget admits the bf16 bank (half size) but not the raw f32 bank
    budget_gb = 0.75 * f32_bytes / 2 ** 30
    p_raw = _params(pack_dir_f32, device_bank_max_gb=budget_gb)
    assert maybe_device_bank(p_raw, ds, mesh) is None
    p_bf16 = _params(pack_dir_f32, device_bank_max_gb=budget_gb,
                     device_bank_dtype="bf16")
    bank = maybe_device_bank(p_bf16, ds, mesh)
    assert bank is not None
    emb_bytes = np.asarray(ds.vocab.embeddings, np.float32).nbytes
    assert bank.nbytes - emb_bytes == f32_bytes // 2


def test_upload_quantized_chunked_matches_whole():
    """_upload_quantized with a small chunk size reproduces whole-array
    quantization exactly (incl. the all-zero-row scale=1/127 branch)."""
    from shufflingvideosfortsg_tpu.data.device_bank import (_quant_chunk,
                                                            _upload_quantized)
    from shufflingvideosfortsg_tpu.parallel.mesh import replicated_sharding

    mesh = create_mesh([1])
    rng = np.random.default_rng(0)
    host = rng.standard_normal((37, 5, 16)).astype(np.float32)
    host[3] = 0.0
    q_ref, s_ref = _quant_chunk(host)
    q, s = _upload_quantized(host, replicated_sharding(mesh),
                             chunk_bytes=4 * 5 * 16)  # 4-video chunks
    np.testing.assert_array_equal(np.asarray(q), q_ref)
    np.testing.assert_array_equal(np.asarray(s), s_ref)
    assert np.asarray(q)[3].max() == 0 and np.asarray(s)[3].min() == 1 / 127.0


def test_int8_bank_tier_quant_bound(pack_dir):
    """device_bank_dtype='int8' on an f16 pack: half the residency, and the
    assembled (dequantized on device) features stay within the per-frame
    quantization bound |x_q - x| <= amax/254; index-derived batch members
    are untouched."""
    import jax.numpy as jnp

    params = _params(pack_dir)
    ds = _dataset(params)
    mesh = create_mesh([1])
    bank_raw = DeviceFeatureBank(ds.pack, ds.vocab, mesh)
    bank_i8 = DeviceFeatureBank(ds.pack, ds.vocab, mesh, dtype="int8")
    assert bank_i8.feats.dtype == jnp.int8
    assert bank_i8.scales is not None
    assert bank_i8.nbytes < bank_raw.nbytes

    host = next(iter(BatchLoader(ds, 8, shuffle=False, prefetch=0)))
    dev = next(iter(BatchLoader(ds, 8, shuffle=False, prefetch=0,
                                device_assemble=True)))
    assembled = jax.jit(bank_i8.assemble)(shard_batch(mesh, dev, bank_i8))
    got = np.asarray(assembled['video_feat'], np.float32)
    want = np.asarray(host['video_feat'], np.float32)
    bound = np.max(np.abs(want), axis=-1, keepdims=True) / 254.0 + 1e-6
    assert np.all(np.abs(got - want) <= bound)
    np.testing.assert_array_equal(np.asarray(assembled['sent_feat']),
                                  host['sent_feat'])
    for k in ('sent_mask', 'video_mask', 'temporal_labels', 'fore_masks',
              'back_masks'):
        np.testing.assert_array_equal(np.asarray(assembled[k]), host[k],
                                      err_msg=k)


def test_int8_bank_decode_quality_neutral(pack_dir_f32):
    """int8-banked eval decode vs the raw f32 bank: scores shift by at most
    the quantization noise, spans agree on nearly all rows, batch mIoU is
    unaffected."""
    from shufflingvideosfortsg_tpu.models import build_model
    from shufflingvideosfortsg_tpu.train.steps import make_gmd_test_step

    params = _params(pack_dir_f32)
    ds = _dataset(params)
    mesh = create_mesh([1])
    bank_raw = DeviceFeatureBank(ds.pack, ds.vocab, mesh)
    bank_i8 = DeviceFeatureBank(ds.pack, ds.vocab, mesh, dtype="int8")

    model = build_model(params, "gmd", inference=True)
    mt = np.ones((2, T), np.int32)
    mn = np.ones((2, 15), np.int32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((2, 15, 300), np.float32), mn,
        np.zeros((2, T, D), np.float32), mt,
        np.zeros((2, T, D), np.float32), mt, mt, mt, mt, mt, mt, mt)

    dev_b = next(iter(BatchLoader(ds, 8, shuffle=False, prefetch=0,
                                  device_assemble=True)))
    step = make_gmd_test_step(model, assembler=DeviceFeatureBank.assemble)
    out_raw = step(variables["params"], shard_batch(mesh, dev_b, bank_raw))
    out_i8 = step(variables["params"], shard_batch(mesh, dev_b, bank_i8))
    agree = np.mean(np.all(np.isclose(np.asarray(out_raw["pred_time"]),
                                      np.asarray(out_i8["pred_time"]),
                                      atol=1e-4), axis=-1))
    assert agree >= 0.75
    np.testing.assert_allclose(np.asarray(out_raw["score"]),
                               np.asarray(out_i8["score"]), atol=5e-2)
    assert abs(float(out_raw["miou"]) - float(out_i8["miou"])) <= 0.1


def test_int8_bank_gating_and_budget(pack_dir_f32, monkeypatch):
    """maybe_device_bank accounts the int8 tier at quarter bytes (plus the
    [V, T] f32 scales) and admits it under a budget that refuses bf16."""
    from shufflingvideosfortsg_tpu.data import device_bank as db

    monkeypatch.setattr(db, "_BANK_CACHE", {})
    mesh = create_mesh([1])
    params = _params(pack_dir_f32)
    ds = _dataset(params)
    f32_bytes = ds.pack.num_videos * T * D * 4
    i8_bytes = f32_bytes // 4 + ds.pack.num_videos * T * 4
    budget_gb = 1.5 * i8_bytes / 2 ** 30
    p_bf16 = _params(pack_dir_f32, device_bank_max_gb=budget_gb,
                     device_bank_dtype="bf16")
    assert maybe_device_bank(p_bf16, ds, mesh) is None
    p_i8 = _params(pack_dir_f32, device_bank_max_gb=budget_gb,
                   device_bank_dtype="int8")
    bank = maybe_device_bank(p_i8, ds, mesh)
    assert bank is not None
    emb_bytes = np.asarray(ds.vocab.embeddings, np.float32).nbytes
    assert bank.nbytes - emb_bytes == i8_bytes
