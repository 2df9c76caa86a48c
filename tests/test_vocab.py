"""Vocabulary builder and preprocessing rules."""

import numpy as np

from shufflingvideosfortsg_tpu.data.vocab import (
    Vocab, build_word_vocab, extract_embedding_matrix, pad_indices,
    preprocess_sentence_anet, preprocess_sentence_charades)


def test_charades_preprocessing():
    s = "A person's dog, running; fast!"
    out = preprocess_sentence_charades(s)
    assert out == "A person s dog  running  fast "
    # tokens after lower().split(' '): empties appear but are OOV-dropped


def test_anet_preprocessing():
    s = "  A person's dog, running; fast!\nYes  "
    out = preprocess_sentence_anet(s)
    # ','->space, other punctuation deleted, whitespace collapsed; NOTE the
    # reference deletes '\n' (anet.py:98) so words around it merge —
    # preserved as-is
    assert out == "a persons dog running fastyes"


def test_build_word_vocab_special_slots():
    sentences = ["the cat sat", "the dog sat", "a cat"]
    wordtoix, ixtoword = build_word_vocab(sentences, word_count_threshold=1)
    assert wordtoix['#START#'] == 0
    assert ixtoword[0] == '.'
    assert wordtoix['the'] == 1  # first-appearance order
    # threshold filters
    w2, _ = build_word_vocab(sentences, word_count_threshold=2)
    assert 'dog' not in w2 and 'the' in w2 and 'cat' in w2 and 'sat' in w2


def test_embedding_extraction(rng):
    wordtoix, ixtoword = build_word_vocab(["hello world"], 1)
    glove = {'hello': np.ones(300, np.float32) * 0.5}
    emb = extract_embedding_matrix(glove, wordtoix, ixtoword,
                                   np.random.RandomState(0))
    assert emb.shape == (len(wordtoix), 300)
    hix = wordtoix['hello']
    np.testing.assert_array_equal(emb[hix], 0.5)
    # OOV rows are U(-3, 3) random
    wix = wordtoix['world']
    assert np.abs(emb[wix]).max() <= 3.0
    assert not np.allclose(emb[wix], 0.5)


def test_vocab_encode_drops_oov():
    v = Vocab({'a': 1, 'b': 2}, {1: 'a', 2: 'b'}, np.zeros((3, 300)))
    assert v.encode(['a', 'zzz', 'b', '']) == [1, 2]


def test_pad_indices():
    arr, n = pad_indices([3, 4, 5], 6)
    assert n == 3
    np.testing.assert_array_equal(arr, [3, 4, 5, 0, 0, 0])
    arr, n = pad_indices(list(range(10)), 4)
    assert n == 10
    np.testing.assert_array_equal(arr, [0, 1, 2, 3])


def test_step_timer():
    from shufflingvideosfortsg_tpu.utils.profiling import StepTimer
    import jax.numpy as jnp
    t = StepTimer(sync_every=2)
    out = jnp.ones(3)
    rates = [t.tick(out, items=4) for _ in range(6)]
    assert sum(r is not None for r in rates) == 3
    stats = t.finish(out)
    assert stats['steps'] == 6 and stats['items'] == 24
    assert stats['items_per_sec'] > 0
