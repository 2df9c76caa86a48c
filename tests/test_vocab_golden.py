"""Golden vocab-artifact regression: rebuilding the Charades vocabulary from
the bundled annotation JSONs must reproduce the bundled wordtoix/ixtoword
artifacts bit-exactly, and the ported verify_word_embedding checker must
accept them and reproduce the reference's logged sentence-length stats
(reference: generate_glove_wordembed.py:94-142 builder, :144-194 checker,
whose docstring pins charades train max/min/mean = 11/2/6.21)."""

import json
import os

import numpy as np
import pytest

from shufflingvideosfortsg_tpu.data.vocab import (
    build_word_vocab, preprocess_sentence_anet, verify_word_embedding)

WORDS = "/root/reference/data/Charades/words"
TRAIN = "/root/reference/data/Charades/train.json"
TEST = "/root/reference/data/Charades/test.json"

pytestmark = pytest.mark.skipif(
    not (os.path.isdir(WORDS) and os.path.isfile(TRAIN)),
    reason="bundled Charades artifacts unavailable")


def _collect(*paths):
    sents = []
    for p in paths:
        anno = json.load(open(p))
        for vid in anno:
            for s in anno[vid]['sentences']:
                sents.append(preprocess_sentence_anet(s))
    return sents


def test_charades_vocab_rebuild_is_bit_exact():
    wordtoix, ixtoword = build_word_vocab(_collect(TRAIN, TEST), 1)
    golden_w = np.load(os.path.join(WORDS, 'wordtoix.npy'),
                       allow_pickle=True).tolist()
    golden_i = np.load(os.path.join(WORDS, 'ixtoword.npy'),
                       allow_pickle=True).tolist()
    assert len(golden_w) == 1294
    assert wordtoix == golden_w
    assert ixtoword == golden_i


def test_verify_word_embedding_accepts_bundled_artifacts():
    stats = verify_word_embedding(
        TRAIN,
        os.path.join(WORDS, 'wordtoix.npy'),
        os.path.join(WORDS, 'ixtoword.npy'),
        os.path.join(WORDS, 'word_glove_fts_init.npy'))
    # the reference checker's logged numbers for charades train
    # (generate_glove_wordembed.py:176-184)
    assert stats['max_len'] == 11
    assert stats['min_len'] == 2
    assert round(stats['mean_len'], 2) == 6.21
    stats_test = verify_word_embedding(
        TEST,
        os.path.join(WORDS, 'wordtoix.npy'),
        os.path.join(WORDS, 'ixtoword.npy'),
        os.path.join(WORDS, 'word_glove_fts_init.npy'))
    assert stats_test['max_len'] == 10
    assert round(stats_test['mean_len'], 2) == 6.24


def test_verify_word_embedding_rejects_corrupt_mapping(tmp_path):
    wordtoix = np.load(os.path.join(WORDS, 'wordtoix.npy'),
                       allow_pickle=True).tolist()
    ixtoword = np.load(os.path.join(WORDS, 'ixtoword.npy'),
                       allow_pickle=True).tolist()
    ixtoword[5] = 'not-the-right-word'
    np.save(tmp_path / 'ixtoword.npy', ixtoword)
    with pytest.raises(ValueError, match='disagree'):
        verify_word_embedding(
            TRAIN, os.path.join(WORDS, 'wordtoix.npy'),
            str(tmp_path / 'ixtoword.npy'),
            os.path.join(WORDS, 'word_glove_fts_init.npy'))
