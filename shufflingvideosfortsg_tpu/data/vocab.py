"""Vocabulary and GloVe word-embedding artifacts.

Loads the reference's npy artifacts (wordtoix / ixtoword dicts, [V, 300]
embedding matrix) and provides the per-dataset sentence preprocessing +
indexing rules (reference: charades.py:120-132, anet.py:92-112):

- charades: every punctuation char -> space; tokens = lower().split(' ');
  OOV words dropped (not UNK'd); pad with index 0 to sent_len
  (crash-on-overflow in the reference; here we truncate and note it).
- anet: lower().strip() first; ',' -> space, other punctuation deleted,
  whitespace collapsed; pad to sent_len or truncate.

Also hosts the offline vocab builder used by generate_glove_wordembed.py
(reference: generate_glove_wordembed.py:9-142).
"""

from __future__ import annotations

import os
import string
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np


class Vocab:
    def __init__(self, wordtoix: Dict[str, int], ixtoword: Dict[int, str],
                 embeddings: np.ndarray):
        self.wordtoix = wordtoix
        self.ixtoword = ixtoword
        self.embeddings = embeddings  # [V, 300] float32

    @classmethod
    def load(cls, wordtoix_path: str, ixtoword_path: str,
             word_fts_path: str) -> "Vocab":
        wordtoix = np.load(wordtoix_path, allow_pickle=True).tolist()
        ixtoword = np.load(ixtoword_path, allow_pickle=True).tolist()
        emb = np.asarray(np.load(word_fts_path), dtype=np.float32)
        return cls(wordtoix, ixtoword, emb)

    def encode(self, tokens: Iterable[str]) -> List[int]:
        """OOV words are dropped, matching the reference indexer."""
        return [self.wordtoix[w] for w in tokens if w in self.wordtoix]


def preprocess_sentence_charades(sentence: str) -> str:
    for c in string.punctuation:
        sentence = sentence.replace(c, ' ')
    return sentence


def tokenize_charades(sentence: str) -> List[str]:
    return sentence.lower().split(' ')


def preprocess_sentence_anet(sentence: str) -> str:
    s = sentence.lower().strip()
    for c in string.punctuation:
        s = s.replace(c, ' ') if c == ',' else s.replace(c, '')
    return ' '.join(s.replace('\n', '').split())


def tokenize_anet(sentence: str) -> List[str]:
    return sentence.lower().split(' ')


def pad_indices(idxs: Sequence[int], max_len: int) -> Tuple[np.ndarray, int]:
    """Pad with 0 (the '.' token) to max_len; truncate if longer.

    (The reference's charades path would raise on overflow — charades
    sentences never exceed 15 tokens; the anet path truncates. Truncation is
    used for both here.)"""
    arr = np.zeros(max_len, dtype=np.int64)
    n = min(len(idxs), max_len)
    arr[:n] = np.asarray(idxs[:n], dtype=np.int64)
    return arr, len(idxs)


# ---------------------------------------------------------------------------
# Offline vocab building (generate_glove_wordembed parity)
# ---------------------------------------------------------------------------

def build_word_vocab(sentences: Iterable[str], word_count_threshold: int = 1
                     ) -> Tuple[Dict[str, int], Dict[int, str]]:
    """Count-threshold vocab with the reference's special slots: index 0 is
    '.' / '#START#' (generate_glove_wordembed.py:40-67). Insertion order of
    first appearance is preserved (python dicts are ordered)."""
    word_counts: Dict[str, int] = {}
    for sent in sentences:
        for w in sent.lower().split(' '):
            word_counts[w] = word_counts.get(w, 0) + 1
    vocab = [w for w in word_counts if word_counts[w] >= word_count_threshold]
    ixtoword: Dict[int, str] = {0: '.'}
    wordtoix: Dict[str, int] = {'#START#': 0}
    for ix, w in enumerate(vocab, start=1):
        wordtoix[w] = ix
        ixtoword[ix] = w
    return wordtoix, ixtoword


def glove_txt_to_dict(glove_txt_path: str) -> Dict[str, np.ndarray]:
    """Parse a GloVe text file into {token: [300] float32}. Tokens with
    internal spaces keep the last 300 fields as the vector (the reference's
    `row[-300:]` rule)."""
    table: Dict[str, np.ndarray] = {}
    with open(glove_txt_path) as ifs:
        for line in ifs:
            line = line.strip()
            if not line:
                continue
            row = line.split()
            table[row[0]] = np.asarray(row[-300:], dtype=np.float32)
    return table


def verify_word_embedding(annotation_json: str, wordtoix_path: str,
                          ixtoword_path: str, word_fts_path: str,
                          max_sentence_len: int = 25) -> Dict[str, float]:
    """Offline artifact checker (port of the reference's debug verifier,
    generate_glove_wordembed.py:144-194): preprocess every annotation
    sentence with the offline (ANet-style) rule, index it against the
    wordtoix artifact, pad/truncate to ``max_sentence_len``, and look up the
    embedding rows — exercising the exact artifact access pattern of the
    training pipeline. Returns {n_sentences, max_len, min_len, mean_len}
    and raises on inconsistent artifacts instead of just printing."""
    import json

    wordtoix = np.load(wordtoix_path, allow_pickle=True).tolist()
    ixtoword = np.load(ixtoword_path, allow_pickle=True).tolist()
    emb = np.array(np.load(word_fts_path).tolist(), np.float32)

    if len(wordtoix) != len(ixtoword) or emb.shape != (len(wordtoix), 300):
        raise ValueError(
            f'inconsistent artifacts: |wordtoix|={len(wordtoix)} '
            f'|ixtoword|={len(ixtoword)} emb={emb.shape}')
    # bijection check modulo the index-0 '.'/'#START#' aliasing
    for w, ix in wordtoix.items():
        if ix != 0 and ixtoword.get(ix) != w:
            raise ValueError(f'wordtoix/ixtoword disagree at index {ix}: '
                             f'{w!r} vs {ixtoword.get(ix)!r}')

    anno = json.load(open(annotation_json))
    sentences = [preprocess_sentence_anet(s)
                 for vid in anno for s in anno[vid]['sentences']]
    idxes = [[wordtoix[w] for w in s.lower().split(' ') if w in wordtoix]
             for s in sentences]
    lens = [len(x) for x in idxes]
    for x in idxes:
        arr, _ = pad_indices(x, max_sentence_len)
        _ = emb[arr]  # every index must be a valid embedding row
    stats = {'n_sentences': len(lens), 'max_len': max(lens),
             'min_len': min(lens), 'mean_len': sum(lens) / len(lens)}
    print('Max sentence len: {max_len:d}, Min len: {min_len:d}, '
          'Mean: {mean_len:.2f}'.format(**stats))
    return stats


def extract_embedding_matrix(glove: Dict[str, np.ndarray],
                             wordtoix: Dict[str, int],
                             ixtoword: Dict[int, str],
                             rng: np.random.RandomState) -> np.ndarray:
    """[V, 300] matrix: GloVe vector when known, U(-3, 3) otherwise
    (generate_glove_wordembed.py:9-38)."""
    V = len(wordtoix)
    out = rng.uniform(-3, 3, size=(V, 300))
    for ix in range(V):
        word = ixtoword.get(ix)
        if word is not None and word in glove:
            out[ix] = glove[word]
    return out
