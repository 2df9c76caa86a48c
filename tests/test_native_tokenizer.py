"""Native tokenizer (native/tokenizer.cpp) parity with the Python pipeline.

The tokenizer is the text half of the serving gateway: it must reproduce
the per-dataset preprocessing + OOV-drop indexing rules the offline
pipeline uses (reference: grounding/dataset/charades.py:120-132,
anet.py:92-112; here data/vocab.py + annotations.py:64-67) byte-for-byte —
a serving query must tokenize exactly like a training sentence. The parity
bound is a sweep over EVERY bundled annotation sentence for both datasets
against the real vocab artifacts, plus adversarial unit cases.
"""

import json
import os
import subprocess

import numpy as np
import pytest

from shufflingvideosfortsg_tpu.data import text_native
from shufflingvideosfortsg_tpu.data.vocab import (
    preprocess_sentence_anet, preprocess_sentence_charades)

REF = '/root/reference/data'
CHARADES_WORDS = f'{REF}/Charades/words/wordtoix.npy'
ANET_WORDS = f'{REF}/ANet/words/wordtoix.npy'

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason='reference data assets not present')


@pytest.fixture(scope='module', autouse=True)
def built_native():
    if not text_native.native_available():
        subprocess.run(['make', '-C', 'native', 'libtokenizer.so'],
                       check=True)
        text_native._LIB = text_native._load_native()
    assert text_native.native_available()


def _python_encode(text, wordtoix, dataset):
    pre = (preprocess_sentence_charades(text) if dataset == 'charades'
           else preprocess_sentence_anet(text))
    return [wordtoix[w] for w in pre.lower().split(' ') if w in wordtoix]


def _vocab(path):
    return np.load(path, allow_pickle=True).tolist()


# ------------------------------------------------------------- unit cases --

CASES = [
    'A person opens the door.',
    'person  double--spaced,punct!ed (parenthetical) end',
    "it's a contraction-heavy, semi;colon: sentence",
    '  leading and trailing   ',
    '',
    'UPPERCASE SHOUTING WITH TABS\tAND\nNEWLINES',
    'word1.word2 glued,comma split',
    'totally-unseen zz9qq words only',
    '!!! ... ,,, ???',
    'the the the the the the the the the the the the the the the the',
]


@pytest.mark.parametrize('dataset,vocab_path',
                         [('charades', CHARADES_WORDS),
                          ('anet', ANET_WORDS)])
def test_unit_cases_match_python(dataset, vocab_path):
    wordtoix = _vocab(vocab_path)
    tok = text_native.NativeTokenizer(wordtoix, dataset)
    assert tok.native
    for text in CASES:
        ids, n = tok.encode(text)
        want = _python_encode(text, wordtoix, dataset)
        assert n == len(want), text
        assert ids == want[:tok.max_out], text


def test_overflow_reports_total_count():
    wordtoix = _vocab(CHARADES_WORDS)
    tok = text_native.NativeTokenizer(wordtoix, 'charades', max_out=4)
    text = 'the ' * 12 + 'the'
    want = _python_encode(text, wordtoix, 'charades')
    assert len(want) == 13
    ids, n = tok.encode(text)
    assert n == 13 and ids == want[:4]


@pytest.mark.parametrize('dataset,vocab_path',
                         [('charades', CHARADES_WORDS),
                          ('anet', ANET_WORDS)])
def test_encode_batch_matches_per_call(dataset, vocab_path):
    wordtoix = _vocab(vocab_path)
    tok = text_native.NativeTokenizer(wordtoix, dataset, max_out=6)
    py = text_native.NativeTokenizer(wordtoix, dataset, max_out=6,
                                     use_native=False)
    ids, counts = tok.encode_batch(CASES)
    ids_py, counts_py = py.encode_batch(CASES)
    np.testing.assert_array_equal(ids, ids_py)
    np.testing.assert_array_equal(counts, counts_py)
    for i, text in enumerate(CASES):
        row, n = tok.encode(text)
        assert counts[i] == n
        want = np.zeros(6, np.int32)
        want[:len(row)] = row
        np.testing.assert_array_equal(ids[i], want, err_msg=text)
    e_ids, e_counts = tok.encode_batch([])
    assert e_ids.shape == (0, 6) and e_counts.shape == (0,)


def test_python_fallback_path_identical():
    wordtoix = _vocab(CHARADES_WORDS)
    nat = text_native.NativeTokenizer(wordtoix, 'charades')
    py = text_native.NativeTokenizer(wordtoix, 'charades', use_native=False)
    assert not py.native
    for text in CASES:
        assert nat.encode(text) == py.encode(text)


# ------------------------------------------------- full-corpus parity sweep --

def _all_sentences(paths):
    for p in paths:
        with open(p) as f:
            anno = json.load(f)
        for rec in anno.values():
            yield from rec['sentences']


@pytest.mark.parametrize('dataset,vocab_path,anno_glob', [
    ('charades', CHARADES_WORDS,
     ['charades_train.json', 'charades_val.json',
      'charades_test_iid.json', 'charades_test_ood.json']),
    ('anet', ANET_WORDS,
     ['anet_val.json', 'anet_test_iid.json', 'anet_test_ood.json']),
])
def test_every_bundled_sentence_matches(dataset, vocab_path, anno_glob):
    root = f'{REF}/Charades-CD' if dataset == 'charades' else f'{REF}/ANet-CD'
    wordtoix = _vocab(vocab_path)
    tok = text_native.NativeTokenizer(wordtoix, dataset, max_out=256)
    n_sent = 0
    for text in _all_sentences([os.path.join(root, g) for g in anno_glob]):
        ids, n = tok.encode(text)
        want = _python_encode(text, wordtoix, dataset)
        assert n == len(want) and ids == want, text
        n_sent += 1
    assert n_sent > 3000  # the sweep actually covered the corpus
