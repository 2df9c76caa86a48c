"""Re-derivation of the missing ANet-CD training annotations
(reference/.MISSING_LARGE_BLOBS:1): the CD splits re-divide the bundled
original ActivityNet Captions files, so CD-train is recoverable by set
subtraction + the annotation-merge rule — which must reconstruct the three
BUNDLED CD splits bit-exactly to be trusted."""

import os

import numpy as np
import pytest

from tools.make_anet_cd_train import (check_rule, derive_train,
                                      load_cd_splits, load_sources)

DATA = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(DATA, 'ANet', 'train.json')),
    reason="bundled ANet annotations unavailable")


@pytest.fixture(scope="module")
def derived():
    return derive_train(DATA)


def test_merge_rule_reconstructs_bundled_cd_splits(derived):
    _, sources, cd_splits = derived
    assert check_rule(sources, cd_splits) == 0
    assert sum(len(cd) for cd in cd_splits.values()) == 3942


def test_derived_train_matches_reference_log(derived):
    train, _, cd_splits = derived
    # grounding/ckp/anet_cd/train.log:3 records 10984 training videos
    assert len(train) == 10984
    cd_vids = set().union(*cd_splits.values())
    assert not (set(train) & cd_vids)  # disjoint from val/test
    rec = next(iter(train.values()))
    assert set(rec) == {'duration', 'timestamps', 'sentences'}
    assert len(rec['timestamps']) == len(rec['sentences'])


def test_derived_train_feeds_the_anet_pipeline(derived, tmp_path):
    """Loader-level smoke: the derived JSON parses through the ANet dataset
    path and batches at the production T=240 shape."""
    import json
    import subprocess
    import sys

    from shufflingvideosfortsg_tpu.config import load_config
    from shufflingvideosfortsg_tpu.data.pipeline import (
        BatchLoader, SentenceGroundingDataset)

    train, _, _ = derived
    small = dict(list(train.items())[:64])
    anno = tmp_path / 'anet_train_head.json'
    anno.write_text(json.dumps(small))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pack = str(tmp_path / 'pack')
    subprocess.run(
        [sys.executable, os.path.join(repo, 'tools/make_synth_pack.py'),
         '--annotations', str(anno), '--out', pack, '--t', '240',
         '--d', '32', '--dtype', 'f16'], check=True, capture_output=True)

    # the ANet GloVe matrix is an external download (reference README:29-31);
    # fabricate one matching the bundled 13745-word vocab
    wordtoix = np.load(os.path.join(DATA, 'ANet/words/wordtoix.npy'),
                       allow_pickle=True).tolist()
    fts = tmp_path / 'word_glove_fts_init.npy'
    np.save(fts, np.zeros((len(wordtoix), 300), np.float32))

    params = load_config(os.path.join(repo, 'cfgs/anet_cd_i3d.yml'),
                         data_root=DATA)
    params.update(dict(video_feature_dim=32, word_fts_path=str(fts)))
    ds = SentenceGroundingDataset(str(anno), pack, params, 'anet')
    batch = next(iter(BatchLoader(ds, 8, shuffle=False, prefetch=0)))
    assert batch['video_feat'].shape == (8, 240, 32)
    assert batch['video_feat'].dtype == np.float16
    assert batch['sent_feat'].shape[0] == 8
    s, e = batch['framestps'][0]
    assert batch['temporal_labels'][0][s:e + 1].sum() == e - s + 1


def test_one_epoch_train_smoke_on_derived_annotations(derived, tmp_path):
    """The VERDICT's 'loader-accepted JSON + 1-epoch smoke': run the real
    main_train driver (debug-truncated) on the derived ANet-CD train split
    at tiny model dims."""
    import json
    import subprocess
    import sys

    from shufflingvideosfortsg_tpu import cli
    from shufflingvideosfortsg_tpu.config import load_config

    train, _, _ = derived
    small = dict(list(train.items())[:48])
    anno = tmp_path / 'anet_train_head.json'
    anno.write_text(json.dumps(small))

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pack = str(tmp_path / 'pack')
    subprocess.run(
        [sys.executable, os.path.join(repo, 'tools/make_synth_pack.py'),
         '--annotations', str(anno), '--out', pack, '--t', '48',
         '--d', '32', '--dtype', 'f16'], check=True, capture_output=True)

    wordtoix = np.load(os.path.join(DATA, 'ANet/words/wordtoix.npy'),
                       allow_pickle=True).tolist()
    fts = tmp_path / 'word_glove_fts_init.npy'
    np.save(fts, np.zeros((len(wordtoix), 300), np.float32))

    params = load_config(os.path.join(repo, 'cfgs/anet_cd_i3d.yml'),
                         data_root=DATA)
    params.update(dict(
        alias='anet_cd_train_smoke', runs=str(tmp_path / 'runs'), debug=True,
        train_data=str(anno), val_data=str(anno),
        train_featpath=pack, valid_featpath=pack,
        word_fts_path=str(fts), video_feature_dim=32, video_len=48,
        sent_len=8, sent_rnn_hiddendim=8, video_rnn_hiddendim=8,
        mlp_hidden_dim=8, span_hidden_dim=8, m_pred_hidden=16,
        batch_size=[8, 8, 8], epoch=1, batch_log_interval=-1,
        start_from=None))
    stats = cli.main_train(params)
    assert 0 in stats['loss'] and np.isfinite(stats['loss'][0])
