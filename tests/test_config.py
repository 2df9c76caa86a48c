"""Config parsing: the reference YAMLs must parse unchanged and merge with
the reference's override semantics (helper_function.py:21-26)."""

import os

import pytest

from shufflingvideosfortsg_tpu.config import (
    DEFAULTS, load_config, resolve_data_paths, update_values)

REF_CFGS = [
    "charades_cd_i3d.yml", "anet_cd_i3d.yml", "charades_i3d.yml",
    "anet_i3d.yml", "anet_c3d.yml", "anet_cd_c3d.yml", "charades_lgi3d.yml",
]


@pytest.mark.parametrize("cfg", REF_CFGS)
def test_reference_yaml_parses(reference_root, cfg):
    path = os.path.join(reference_root, "grounding", "cfgs", cfg)
    if not os.path.isfile(path):
        pytest.skip("cfg missing")
    params = load_config(path)
    # YAML wins over defaults
    assert params["train_data"].endswith(".json")
    assert params["video_len"] in (128, 240)
    assert params["sent_len"] in (15, 25, 20)
    # untouched defaults survive
    assert params["sent_rnn_hiddendim"] == 256
    assert params["dropout"] == 0.5


def test_charades_cd_values(reference_root):
    path = os.path.join(reference_root, "grounding", "cfgs", "charades_cd_i3d.yml")
    params = load_config(path)
    assert params["video_len"] == 128
    assert params["sent_len"] == 15
    assert params["video_feature_dim"] == 1024
    assert params["feature_type"] == "i3d"
    assert params["runs"] == "runs/charades_cd"
    assert params["train"] == "charades"


def test_update_values_none_ignored():
    d = {"a": 1, "b": {"c": 2}}
    update_values({"a": None, "b": {"c": 5, "d": None}}, d)
    assert d["a"] == 1
    assert d["b"]["c"] == 5


def test_overrides_after_yaml(reference_root):
    path = os.path.join(reference_root, "grounding", "cfgs", "charades_cd_i3d.yml")
    params = load_config(path, overrides={"alias": "unit", "batch_size": [4, 4, 4]})
    assert params["alias"] == "unit"
    assert params["batch_size"] == [4, 4, 4]


def test_resolve_data_paths():
    params = {"train_data": "../data/Charades-CD/charades_train.json",
              "wordtoix_path": "../data/Charades/words/wordtoix.npy",
              "test_featpath": "/abs/path/i3d", "data_root": None,
              "val_data": "../data/Charades-CD/charades_val.json",
              "test_data": "x.json", "train_featpath": "../data/Charades/i3d_feature",
              "valid_featpath": "../data/Charades/i3d_feature",
              "ixtoword_path": "../data/Charades/words/ixtoword.npy",
              "word_fts_path": "../data/Charades/words/word_glove_fts_init.npy"}
    resolve_data_paths(params, "/root/reference/data")
    assert params["train_data"] == "/root/reference/data/Charades-CD/charades_train.json"
    assert params["test_featpath"] == "/abs/path/i3d"  # absolute untouched


def test_defaults_cover_reference_params_json(reference_root):
    import json
    path = os.path.join(reference_root, "grounding", "ckp", "charades_cd", "params.json")
    if not os.path.isfile(path):
        pytest.skip("params.json missing")
    ref_params = json.load(open(path))
    missing = [k for k in ref_params if k not in DEFAULTS]
    assert not missing, f"defaults missing reference keys: {missing}"
