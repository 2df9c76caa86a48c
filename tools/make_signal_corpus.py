#!/usr/bin/env python3
"""Signal-bearing biased synthetic corpus: the learning/debiasing testbed.

`make_synth_pack.py` fabricates *noise* features (throughput soaks only).
This tool builds a corpus on which grounding is actually LEARNABLE and the
train split is temporally BIASED, mirroring the Charades-CD construction
(reference paper arXiv 2207.14698 §4; data/Charades-CD/*.json):

- K "concepts", each a fixed multi-word phrase from the bundled Charades
  GloVe vocabulary and a fixed random unit motif vector in feature space;
- each video = background noise + its concept's motif added over the GT
  moment + `--distractors` other concepts' motifs on non-overlapping
  spans (so localization REQUIRES conditioning on the query — the moment
  is not just "the unusual segment");
- train/val spans are biased EARLY (start <= bias_frac * free range),
  test_ood spans are LATE (start >= ood_frac), test_iid matches train —
  the changing-distribution protocol of the CD splits.

A grounder that learns content generalizes to test_ood; one that exploits
the train-time position prior does not. This is the corpus behind the
GMD-beats-baseline-under-shift proof (tests/test_learning.py, LEARNING.md).

Outputs under --out:
  annotations/charades_{train,val,test_iid,test_ood}.json  (charades schema)
  pack/{pack.bin,index.json}                               (FEATPAK1)
  meta.json                                                (generator truth)

Usage (full-size default):
  python tools/make_signal_corpus.py --out /tmp/signal_corpus
"""

import argparse
import json
import os
import struct

import numpy as np

MAGIC = b'FEATPAK1'
HEADER_FMT = '<8sIIIIQ'


def load_word_pool(words_dir, pool_size, rng):
    w2i = np.load(os.path.join(words_dir, 'wordtoix.npy'),
                  allow_pickle=True).item()
    # plain alphabetic words only (no '#START#'/punctuation artifacts)
    words = sorted(w for w in w2i if w.isalpha())
    assert len(words) >= pool_size, (len(words), pool_size)
    idx = rng.choice(len(words), size=pool_size, replace=False)
    return [words[i] for i in idx]


def make_phrases(pool, k, phrase_len, rng):
    """K distinct phrases of `phrase_len` words from the pool."""
    seen, phrases = set(), []
    while len(phrases) < k:
        ws = tuple(pool[i] for i in rng.choice(len(pool), size=phrase_len,
                                               replace=False))
        if ws in seen:
            continue
        seen.add(ws)
        phrases.append(' '.join(ws))
    return phrases


def draw_span(nfeats, lmin, lmax, lo_frac, hi_frac, rng):
    """Inclusive [s, e] with length in [lmin, lmax] and start uniform in
    [lo_frac, hi_frac] of the free range (the bias knob)."""
    L = int(rng.integers(lmin, lmax + 1))
    L = min(L, nfeats)
    free = nfeats - L
    lo = int(np.ceil(lo_frac * free))
    hi = int(np.floor(hi_frac * free))
    s = int(rng.integers(lo, max(lo, hi) + 1))
    return s, s + L - 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', required=True)
    ap.add_argument('--t', type=int, default=128)
    ap.add_argument('--d', type=int, default=1024)
    ap.add_argument('--concepts', type=int, default=150)
    ap.add_argument('--phrase-len', type=int, default=3)
    ap.add_argument('--word-pool', type=int, default=200)
    ap.add_argument('--train', type=int, default=6000)
    ap.add_argument('--val', type=int, default=800)
    ap.add_argument('--iid', type=int, default=800)
    ap.add_argument('--ood', type=int, default=2000)
    ap.add_argument('--signal', type=float, default=1.0,
                    help='motif scale (per-dim) added over moment frames')
    ap.add_argument('--bg', type=float, default=1.0,
                    help='background noise std')
    ap.add_argument('--distractors', type=int, default=4)
    ap.add_argument('--len-min', type=int, default=8)
    ap.add_argument('--len-max', type=int, default=24)
    ap.add_argument('--nfeats-min-frac', type=float, default=0.75,
                    help='nfeats ~ U[frac*T, T]')
    ap.add_argument('--bias-frac', type=float, default=0.25,
                    help='train/val/iid starts fall in the first bias_frac '
                         'of the free range')
    ap.add_argument('--ood-frac', type=float, default=0.6,
                    help='ood starts fall past ood_frac of the free range')
    ap.add_argument('--dtype', choices=['f16', 'f32'], default='f16')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--words-dir',
                    default='/root/reference/data/Charades/words')
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    T, D = args.t, args.d
    pool = load_word_pool(args.words_dir, args.word_pool, rng)
    phrases = make_phrases(pool, args.concepts, args.phrase_len, rng)
    # concept motifs with per-dim amplitude == args.signal (so the
    # per-frame motif-vs-noise contrast is signal/bg per dimension, i.e.
    # sqrt(D)*signal/bg in norm — detectable but noisy at signal ~ 0.3)
    motifs = rng.standard_normal((args.concepts, D)).astype(np.float32)
    motifs /= np.linalg.norm(motifs, axis=1, keepdims=True)
    motifs *= args.signal * np.sqrt(D)

    splits = [('train', args.train, 0.0, args.bias_frac),
              ('val', args.val, 0.0, args.bias_frac),
              ('test_iid', args.iid, 0.0, args.bias_frac),
              ('test_ood', args.ood, args.ood_frac, 1.0)]

    os.makedirs(os.path.join(args.out, 'annotations'), exist_ok=True)
    os.makedirs(os.path.join(args.out, 'pack'), exist_ok=True)

    np_dtype = np.float16 if args.dtype == 'f16' else np.float32
    dtype_code = 1 if args.dtype == 'f16' else 0
    vids, all_nfeats = {}, []
    meta = {'phrases': phrases, 'splits': {}, 'args': vars(args)}
    n_total = sum(n for _, n, _, _ in splits)
    pack_f = open(os.path.join(args.out, 'pack', 'pack.bin'), 'wb')
    pack_f.write(struct.pack(HEADER_FMT, MAGIC, n_total, T, D, dtype_code, 0))

    for split, n, lo_frac, hi_frac in splits:
        anno = {}
        concepts = rng.integers(0, args.concepts, size=n)
        for i in range(n):
            # the FULL split name: 'test_iid'/'test_ood' share a 2-char
            # prefix, and a vid collision silently corrupts the pack
            # index ({vid: position}) for every split after the first
            vid = f'SIG_{split}_{i:05d}'
            assert vid not in vids, vid
            j = int(concepts[i])
            nfeats = int(rng.integers(int(args.nfeats_min_frac * T), T + 1))
            s, e = draw_span(nfeats, args.len_min, args.len_max,
                             lo_frac, hi_frac, rng)
            feats = (args.bg *
                     rng.standard_normal((T, D))).astype(np.float32)
            feats[nfeats:] = 0.0
            feats[s:e + 1] += motifs[j]
            # distractor concepts on spans disjoint from the GT moment
            placed = 0
            for _ in range(40):
                if placed >= args.distractors:
                    break
                k = int(rng.integers(0, args.concepts))
                if k == j:
                    continue
                ds, de = draw_span(nfeats, args.len_min, args.len_max,
                                   0.0, 1.0, rng)
                if ds <= e and s <= de:   # overlaps the GT moment
                    continue
                feats[ds:de + 1] += motifs[k]
                placed += 1
            pack_f.write(feats.astype(np_dtype).tobytes())
            vids[vid] = len(vids)
            all_nfeats.append(nfeats)
            anno[vid] = {
                'sentences': [phrases[j]],
                'timestamps': [[float(s), float(e)]],
                'video_duration': float(nfeats),
                'decode_fps': 1.0,
            }
        path = os.path.join(args.out, 'annotations',
                            f'charades_{split}.json')
        with open(path, 'w') as f:
            json.dump(anno, f)
        meta['splits'][split] = {'n': n, 'start_frac': [lo_frac, hi_frac]}
        print(f'{split}: {n} videos -> {path}')

    pack_f.close()
    with open(os.path.join(args.out, 'pack', 'index.json'), 'w') as f:
        json.dump({'vids': vids, 'nfeats': all_nfeats, 't': T, 'd': D,
                   'dtype': args.dtype, 'mode': 'raw'}, f)
    with open(os.path.join(args.out, 'meta.json'), 'w') as f:
        json.dump(meta, f)
    gib = n_total * T * D * np_dtype().itemsize / 2 ** 30
    print(f'pack: {n_total} videos, T={T}, D={D}, {args.dtype}, {gib:.2f} GiB')


if __name__ == '__main__':
    main()
