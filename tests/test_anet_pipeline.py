"""ANet dataset path: 1:1 i3d sampler, anet text rules, frame2sec identity,
and the c3d frame-to-second path on real ANet-CD annotations."""

import os
import subprocess
import sys

import numpy as np
import pytest

from shufflingvideosfortsg_tpu.config import load_config
from shufflingvideosfortsg_tpu.data.pipeline import (BatchLoader,
                                                     SentenceGroundingDataset)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ANNO = "/root/reference/data/ANet-CD/anet_val.json"


@pytest.fixture(scope="module")
def anet_setup(tmp_path_factory):
    if not os.path.isfile(ANNO):
        pytest.skip("reference annotations unavailable")
    feat_dir = str(tmp_path_factory.mktemp("anet_feats"))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_synth_features.py"),
         "--dataset", "anet", "--out", feat_dir, "--annotations", ANNO,
         "--dim", "48", "--clips-per-sec", "1.0", "--limit", "40"],
        check=True, capture_output=True)
    params = load_config(
        os.path.join(REPO, "cfgs/anet_cd_i3d.yml"),
        data_root="/root/reference/data")
    # the ANet [V,300] GloVe matrix is an external download in the
    # reference too (README.md:29-31) — fabricate one sized to the vocab
    wordtoix = np.load(params["wordtoix_path"], allow_pickle=True).tolist()
    emb_path = str(tmp_path_factory.mktemp("words") / "word_glove.npy")
    np.save(emb_path, np.random.RandomState(0).randn(
        len(wordtoix), 300).astype(np.float32))
    params["word_fts_path"] = emb_path
    return params, feat_dir


def _trim_to_available(ds, feat_dir):
    have = {f[:-4] for f in os.listdir(feat_dir)}
    ds.samples = [s for s in ds.samples if s.vid in have]
    return ds


def test_anet_i3d_dataset(anet_setup):
    params, feat_dir = anet_setup
    ds = SentenceGroundingDataset(ANNO, feat_dir, params, "anet")
    assert ds.split == "val"
    assert ds._mode == "1to1"
    _trim_to_available(ds, feat_dir)
    assert len(ds) > 0
    rec = ds.build_record(0)
    assert rec["video_feat"].shape == (240, 48)
    assert rec["token_ids"].shape == (25,)
    s, e = rec["framestps"]
    assert 0 <= s <= e < 240
    # frame index == seconds for the i3d path (identity frame2sec)
    fs = ds.frame2sec(np.array([[s, e]], np.float32),
                      np.array([rec["duration"]]), np.array([rec["nfeats"]]))
    np.testing.assert_array_equal(fs, [[s, e]])


def test_anet_c3d_frame_to_second(anet_setup):
    params, feat_dir = anet_setup
    p = dict(params, feature_type="c3d", vfeat_fn="raw")
    ds = SentenceGroundingDataset(ANNO, feat_dir, p, "anet")
    assert ds._mode == "f2s"
    _trim_to_available(ds, feat_dir)
    rec = ds.build_record(0)
    dur = rec["duration"]
    # nfeats counts output seconds below duration
    assert rec["nfeats"] == min(int(np.ceil(dur)) if dur != int(dur)
                                else int(dur), 240)


def test_anet_batch(anet_setup):
    params, feat_dir = anet_setup
    ds = SentenceGroundingDataset(ANNO, feat_dir, params, "anet")
    _trim_to_available(ds, feat_dir)
    b = next(iter(BatchLoader(ds, 16, shuffle=False, prefetch=0)))
    assert b["sent_feat"].shape == (16, 25, 300)
    assert b["video_feat"].shape == (16, 240, 48)
