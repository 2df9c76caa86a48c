#!/usr/bin/env python3
"""Offline GloVe vocabulary/embedding preprocessing.

Builds wordtoix.npy / ixtoword.npy / word_glove_fts_init.npy from annotation
JSONs + glove.840B.300d.txt, with the reference's vocabulary rules
(generate_glove_wordembed.py): index 0 is the '.'/'#START#' slot, OOV words
get U(-3, 3) random vectors, and sentence preprocessing matches the
ANet-style rule (','->space, other punctuation deleted).

Usage:
  python generate_glove_wordembed.py --glove_txt data/glove.840B.300d.txt \
      --train_json .../train.json --test_json .../test.json \
      --out_dir words/ [--val_json ...] [--threshold 1]
"""

import argparse
import json
import os

import numpy as np

from shufflingvideosfortsg_tpu.data.vocab import (
    build_word_vocab, extract_embedding_matrix, glove_txt_to_dict,
    preprocess_sentence_anet, verify_word_embedding)


def collect_sentences(*json_paths):
    sentences = []
    for path in json_paths:
        if not path:
            continue
        anno = json.load(open(path))
        for vid in anno:
            for sentence in anno[vid]['sentences']:
                sentences.append(preprocess_sentence_anet(sentence))
    return sentences


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--glove_txt', required=True)
    ap.add_argument('--train_json', required=True)
    ap.add_argument('--test_json', required=True)
    ap.add_argument('--val_json', default=None)
    ap.add_argument('--out_dir', required=True)
    ap.add_argument('--threshold', type=int, default=1)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--verify', action='store_true',
                    help='run the artifact checker on train/test after '
                         'writing (reference verify_word_embedding)')
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    sentences = collect_sentences(args.train_json, args.test_json, args.val_json)
    wordtoix, ixtoword = build_word_vocab(sentences, args.threshold)
    print(f'vocab size: {len(wordtoix)}')

    glove = glove_txt_to_dict(args.glove_txt)
    emb = extract_embedding_matrix(glove, wordtoix, ixtoword,
                                   np.random.RandomState(args.seed))
    known = sum(1 for i in range(len(wordtoix)) if ixtoword.get(i) in glove)
    print(f'total {known:d} words embedding loaded of {len(wordtoix):d} words')

    np.save(os.path.join(args.out_dir, 'wordtoix.npy'), wordtoix)
    np.save(os.path.join(args.out_dir, 'ixtoword.npy'), ixtoword)
    np.save(os.path.join(args.out_dir, 'word_glove_fts_init.npy'), emb)
    print('Process over.')

    if args.verify:
        # reference runs the checker on train then test after writing
        # (generate_glove_wordembed.py:243-244)
        for path in (args.train_json, args.test_json):
            verify_word_embedding(
                path,
                os.path.join(args.out_dir, 'wordtoix.npy'),
                os.path.join(args.out_dir, 'ixtoword.npy'),
                os.path.join(args.out_dir, 'word_glove_fts_init.npy'))


if __name__ == '__main__':
    main()
