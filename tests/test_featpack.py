"""Featpack: offline packer + native/numpy readers agree with the direct
per-sample path, and the pipeline's packed fast path yields identical
batches."""

import os
import subprocess
import sys

import numpy as np
import pytest

from shufflingvideosfortsg_tpu.config import load_config
from shufflingvideosfortsg_tpu.data.featpack import (PackedFeatureSource,
                                                     is_featpack_dir)
from shufflingvideosfortsg_tpu.data.pipeline import (BatchLoader,
                                                     SentenceGroundingDataset)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ANNO = "/root/reference/data/Charades-CD/charades_val.json"


@pytest.fixture(scope="module", autouse=True)
def build_native():
    """Build the featpack shared library if the toolchain is available;
    the readers fall back to numpy when it isn't."""
    subprocess.run(["make", "-C", os.path.join(REPO, "native")],
                   capture_output=True)


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    if not os.path.isfile(ANNO):
        pytest.skip("reference annotations unavailable")
    feat_dir = str(tmp_path_factory.mktemp("raw_feats"))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_synth_features.py"),
         "--dataset", "charades", "--out", feat_dir,
         "--annotations", ANNO, "--dim", "32"],
        check=True, capture_output=True)
    pack_dir = str(tmp_path_factory.mktemp("pack"))
    env = dict(os.environ, SVTSG_PLATFORM="cpu")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/featpack.py"),
         "--cfg", os.path.join(REPO, "cfgs/charades_cd_i3d.yml"),
         "--annotation", ANNO, "--featpath", feat_dir, "--out", pack_dir,
         "--data_root", "/root/reference/data"],
        check=True, capture_output=True, env=env)
    return feat_dir, pack_dir


def _params(feat):
    return load_config(os.path.join(REPO, "cfgs/charades_cd_i3d.yml"),
                       overrides={"valid_featpath": feat},
                       data_root="/root/reference/data")


def test_pack_readers_agree(packed):
    feat_dir, pack_dir = packed
    assert is_featpack_dir(pack_dir)
    src_native = PackedFeatureSource(pack_dir, use_native=True)
    src_np = PackedFeatureSource(pack_dir, use_native=False)
    assert not src_np.native
    rows = np.arange(min(16, src_np.num_videos), dtype=np.int64)
    a = src_native.gather(rows)
    b = src_np.gather(rows)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(src_native.nfeats_for(rows),
                                  src_np.nfeats_for(rows))
    if src_native.native:
        # out-of-range row yields zeros (native guard)
        z = src_native.gather(np.asarray([10 ** 6], np.int64))
        np.testing.assert_array_equal(z, 0)


def test_pack_matches_direct_pipeline(packed):
    feat_dir, pack_dir = packed
    params = _params(feat_dir)
    ds_direct = SentenceGroundingDataset(ANNO, feat_dir, params, "charades")
    ds_packed = SentenceGroundingDataset(ANNO, pack_dir, params, "charades")
    assert ds_packed.pack is not None

    b_direct = next(iter(BatchLoader(ds_direct, 32, shuffle=False, prefetch=0)))
    b_packed = next(iter(BatchLoader(ds_packed, 32, shuffle=False, prefetch=0)))
    np.testing.assert_allclose(b_packed["video_feat"], b_direct["video_feat"],
                               rtol=1e-6)
    for k in ("nfeats", "framestps", "video_mask", "temporal_labels"):
        np.testing.assert_array_equal(b_packed[k], b_direct[k])


def test_pack_host_aug_path(packed):
    feat_dir, pack_dir = packed
    params = dict(_params(feat_dir), if_aug=True, aug_percentage=1.0,
                  aug_mode="gt_translate")
    ds = SentenceGroundingDataset(ANNO, pack_dir, params, "charades")
    ds.split, ds.is_train = "train", True
    b = next(iter(BatchLoader(ds, 8, shuffle=False, prefetch=0)))
    assert b["video_feat"].shape[0] == 8  # per-sample gather fallback works
    s, e = b["framestps"][0]
    assert b["temporal_labels"][0][s:e + 1].sum() == e - s + 1


@pytest.fixture(scope="module")
def packed_f16(packed, tmp_path_factory):
    feat_dir, _ = packed
    pack_dir = str(tmp_path_factory.mktemp("pack16"))
    env = dict(os.environ, SVTSG_PLATFORM="cpu")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/featpack.py"),
         "--cfg", os.path.join(REPO, "cfgs/charades_cd_i3d.yml"),
         "--annotation", ANNO, "--featpath", feat_dir, "--out", pack_dir,
         "--dtype", "f16", "--data_root", "/root/reference/data"],
        check=True, capture_output=True, env=env)
    return feat_dir, pack_dir


def test_gather_raw_f16(packed_f16):
    """gather_raw ships the pack's stored dtype unconverted (the halved-H2D
    path); the f32 gather is exactly its upcast; native and numpy agree."""
    _, pack_dir = packed_f16
    src = PackedFeatureSource(pack_dir, use_native=True)
    src_np = PackedFeatureSource(pack_dir, use_native=False)
    rows = np.arange(min(16, src.num_videos), dtype=np.int64)
    raw = src.gather_raw(rows)
    assert raw.dtype == np.float16
    np.testing.assert_array_equal(raw, src_np.gather_raw(rows))
    np.testing.assert_array_equal(raw.astype(np.float32), src.gather(rows))


def test_pipeline_ships_f16_when_raw(packed_f16):
    feat_dir, pack_dir = packed_f16
    params = _params(feat_dir)
    assert params.get('h2d_dtype', 'raw') == 'raw'
    ds = SentenceGroundingDataset(ANNO, pack_dir, params, "charades")
    b = next(iter(BatchLoader(ds, 8, shuffle=False, prefetch=0)))
    assert b["video_feat"].dtype == np.float16

    params_f32 = dict(params, h2d_dtype='f32')
    ds32 = SentenceGroundingDataset(ANNO, pack_dir, params_f32, "charades")
    b32 = next(iter(BatchLoader(ds32, 8, shuffle=False, prefetch=0)))
    assert b32["video_feat"].dtype == np.float32
    np.testing.assert_array_equal(
        b["video_feat"].astype(np.float32), b32["video_feat"])


def test_pack_anet_duration_sampler_mode(tmp_path):
    """The anet c3d samplers ('f2s'/'114') pool per (video, duration)
    only, so they are packable: batches from the pack equal batches from
    the per-file store."""
    anno = "/root/reference/data/ANet-CD/anet_val.json"
    if not os.path.isfile(anno):
        pytest.skip("reference annotations unavailable")
    feat_dir = str(tmp_path / "raw")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_synth_features.py"),
         "--dataset", "anet", "--out", feat_dir, "--annotations", anno,
         "--dim", "24"], check=True, capture_output=True)
    # the ANet GloVe matrix is an external download; synthesize one
    wordtoix = np.load("/root/reference/data/ANet/words/wordtoix.npy",
                       allow_pickle=True).tolist()
    emb_path = str(tmp_path / "anet_glove.npy")
    np.save(emb_path, np.zeros((len(wordtoix), 300), np.float32))
    pack_dir = str(tmp_path / "pack")
    env = dict(os.environ, SVTSG_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/featpack.py"),
         "--cfg", os.path.join(REPO, "cfgs/anet_cd_c3d.yml"),
         "--annotation", anno, "--featpath", feat_dir, "--out", pack_dir,
         "--data_root", "/root/reference/data",
         "--word_fts_path", emb_path],
        capture_output=True, env=env, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert is_featpack_dir(pack_dir)

    params = load_config(os.path.join(REPO, "cfgs/anet_cd_c3d.yml"),
                         data_root="/root/reference/data")
    params["video_feature_dim"] = 24
    params["word_fts_path"] = emb_path

    def batch_from(feat):
        p = dict(params)
        ds = SentenceGroundingDataset(anno, feat, p, dataset_name="anet")
        assert (ds.pack is not None) == (feat == pack_dir)
        if feat != pack_dir:
            assert ds._mode in ("114", "f2s")
        loader = BatchLoader(ds, 8, shuffle=False, prefetch=0)
        return next(iter(loader))

    b_store = batch_from(feat_dir)
    b_pack = batch_from(pack_dir)
    np.testing.assert_allclose(b_pack["video_feat"],
                               b_store["video_feat"].astype(np.float32),
                               rtol=1e-6)
    np.testing.assert_array_equal(b_pack["nfeats"], b_store["nfeats"])
    np.testing.assert_array_equal(b_pack["framestps"], b_store["framestps"])
    for k in ("video_mask", "temporal_labels", "fore_masks", "back_masks"):
        np.testing.assert_array_equal(b_pack[k], b_store[k], err_msg=k)
