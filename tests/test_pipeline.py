"""End-to-end input pipeline against real reference annotations + synthetic
features: shapes, mask invariants, tokenization parity, batch padding."""

import os
import string
import subprocess
import sys

import numpy as np
import pytest

from shufflingvideosfortsg_tpu.config import load_config
from shufflingvideosfortsg_tpu.data.pipeline import (BatchLoader,
                                                     SentenceGroundingDataset)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def charades_setup(tmp_path_factory):
    root = "/root/reference/data"
    anno = os.path.join(root, "Charades-CD/charades_val.json")
    if not os.path.isfile(anno):
        pytest.skip("reference annotations unavailable")
    feat_dir = str(tmp_path_factory.mktemp("synth_feats"))
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_synth_features.py"),
         "--dataset", "charades", "--out", feat_dir,
         "--annotations", anno, "--dim", "64"],
        check=True, capture_output=True)
    params = load_config(
        "/root/reference/grounding/cfgs/charades_cd_i3d.yml",
        overrides={"val_data": anno, "valid_featpath": feat_dir},
        data_root=root)
    return params, anno, feat_dir


def make_dataset(charades_setup, **over):
    params, anno, feat_dir = charades_setup
    p = dict(params)
    p.update(over)
    return SentenceGroundingDataset(anno, feat_dir, p, dataset_name="charades")


def test_dataset_basics(charades_setup):
    ds = make_dataset(charades_setup)
    assert ds.split == "val"
    assert len(ds) == 859  # charades_val sentence count (SURVEY.md §6)
    rec = ds.build_record(0)
    assert rec["video_feat"].shape == (128, 64)
    assert rec["sent_mask"].shape == (15,)
    assert rec["token_ids"].shape == (15,)
    s, e = rec["framestps"]
    assert 0 <= s <= e < 128
    # mask invariants
    assert rec["temporal_labels"][s:e + 1].sum() == e - s + 1
    assert rec["video_mask"][0] == 1
    assert rec["fore_masks"][0] == 1 and rec["fore_masks"][s] == 1
    assert rec["back_masks"][e] == 1


def test_tokenization_matches_reference_rules(charades_setup):
    ds = make_dataset(charades_setup)
    s = ds.samples[0]
    # reproduce the published rule directly
    import json
    anno = json.load(open(charades_setup[1]))
    raw = anno[s.vid]["sentences"][0]
    for c in string.punctuation:
        raw = raw.replace(c, " ")
    want = [ds.vocab.wordtoix[w] for w in raw.lower().split(" ")
            if w in ds.vocab.wordtoix]
    got = [int(t) for t in s.token_ids[:s.sentence_len]]
    assert got == want
    assert s.sentence == raw


def test_batch_loader_shapes_and_padding(charades_setup):
    ds = make_dataset(charades_setup)
    loader = BatchLoader(ds, batch_size=64, shuffle=False, prefetch=0)
    batches = list(loader)
    assert len(batches) == (859 + 63) // 64
    total_valid = sum(b["n_valid"] for b in batches)
    assert total_valid == 859
    b = batches[0]
    assert b["sent_feat"].shape == (64, 15, 300)
    assert b["sent_feat"].dtype == np.float32
    assert b["video_feat"].shape == (64, 128, 64)
    assert b["video_mask"].shape == (64, 128)
    assert b["framestps"].shape == (64, 2)
    last = batches[-1]
    assert last["n_valid"] == 859 % 64
    assert last["video_feat"].shape == (64, 128, 64)  # padded to full


def test_shuffle_determinism(charades_setup):
    ds = make_dataset(charades_setup)
    l1 = BatchLoader(ds, 32, shuffle=True, seed=5, prefetch=0)
    l2 = BatchLoader(ds, 32, shuffle=True, seed=5, prefetch=0)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    assert b1["vid"] == b2["vid"]
    np.testing.assert_array_equal(b1["video_feat"], b2["video_feat"])
    # different epoch -> different order
    b1b = next(iter(l1))
    assert b1b["vid"] != b1["vid"]


def test_host_pair_aug_mode(charades_setup):
    ds = make_dataset(charades_setup, if_aug=True, aug_percentage=1,
                      aug_mode="gt_translate")
    ds.split = "train"
    ds.is_train = True
    loader = BatchLoader(ds, 8, shuffle=False, host_pair_aug=True, prefetch=0)
    b = next(iter(loader))
    assert b["pseudo_video_feat"].shape == b["video_feat"].shape
    s, e = b["pseudo_framestps"][0]
    rs, re = b["framestps"][0]
    assert e - s == re - rs  # gt_translate preserves span length
    lbl = b["pseudo_temporal_labels"][0]
    assert lbl[s:e + 1].sum() == e - s + 1


def test_prefetch_equals_sync(charades_setup):
    ds = make_dataset(charades_setup)
    sync = list(BatchLoader(ds, 128, shuffle=False, prefetch=0))
    pre = list(BatchLoader(ds, 128, shuffle=False, prefetch=2))
    assert len(sync) == len(pre)
    for a, c in zip(sync, pre):
        np.testing.assert_array_equal(a["video_feat"], c["video_feat"])
        assert a["vid"] == c["vid"]


def test_multihost_striping(charades_setup):
    """Per-process loader stripes partition the global shuffle disjointly
    and completely (multi-host data parallelism contract)."""
    ds = make_dataset(charades_setup)
    loaders = [BatchLoader(ds, 32, shuffle=True, seed=9, prefetch=0,
                           process_index=i, process_count=4)
               for i in range(4)]
    seen = []
    for ld in loaders:
        for b in ld:
            seen.extend(b["vid"][:b["n_valid"]])
    assert len(seen) == len(ds)  # every sample exactly once across hosts
    # identical global order: striping the same seed must tile the shuffle
    full = BatchLoader(ds, 32, shuffle=True, seed=9, prefetch=0)
    b_full = next(iter(full))
    b_0 = next(iter(BatchLoader(ds, 8, shuffle=True, seed=9, prefetch=0,
                                process_index=0, process_count=4)))
    assert b_0["vid"][0] == b_full["vid"][0]
