"""Native-vs-Python tokenizer throughput over the real annotation corpora.

Times `data.text_native.NativeTokenizer.encode` (C++ path vs the pure-
Python fallback, same instances the gateway uses) over every bundled
sentence of a dataset, repeated enough to be timer-stable. Host-only —
no JAX — so run it on an otherwise idle machine.

Usage: python tools/bench_tokenizer.py [--dataset charades|anet] [--reps 20]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shufflingvideosfortsg_tpu.data import text_native  # noqa: E402

REF = os.environ.get('SVTSG_DATA_ROOT', '/root/reference/data')

ANNOS = {
    'charades': ('Charades-CD', ['charades_train.json', 'charades_val.json',
                                 'charades_test_iid.json',
                                 'charades_test_ood.json'],
                 'Charades/words/wordtoix.npy'),
    'anet': ('ANet-CD', ['anet_val.json', 'anet_test_iid.json',
                         'anet_test_ood.json'],
             'ANet/words/wordtoix.npy'),
}


def load_sentences(dataset):
    sub, files, vocab_rel = ANNOS[dataset]
    sents = []
    for f in files:
        with open(os.path.join(REF, sub, f)) as fh:
            for rec in json.load(fh).values():
                sents.extend(rec['sentences'])
    wordtoix = np.load(os.path.join(REF, vocab_rel),
                       allow_pickle=True).tolist()
    return sents, wordtoix


def run(tok, sents, reps):
    # warmup + correctness anchor
    total_ids = sum(tok.encode(s)[1] for s in sents)
    t0 = time.perf_counter()
    for _ in range(reps):
        for s in sents:
            tok.encode(s)
    dt = (time.perf_counter() - t0) / reps
    return dt, total_ids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dataset', default='charades', choices=list(ANNOS))
    ap.add_argument('--reps', type=int, default=20)
    args = ap.parse_args()

    sents, wordtoix = load_sentences(args.dataset)
    assert text_native.native_available(), 'make -C native libtokenizer.so'
    nat = text_native.NativeTokenizer(wordtoix, args.dataset, max_out=256)
    py = text_native.NativeTokenizer(wordtoix, args.dataset, max_out=256,
                                     use_native=False)

    dt_nat, ids_nat = run(nat, sents, args.reps)
    dt_py, ids_py = run(py, sents, max(1, args.reps // 10))
    assert ids_nat == ids_py

    # batch mode: one foreign call for the whole corpus
    _, counts = nat.encode_batch(sents)  # warmup
    assert int(counts.sum()) == ids_nat
    t0 = time.perf_counter()
    for _ in range(args.reps):
        nat.encode_batch(sents)
    dt_batch = (time.perf_counter() - t0) / args.reps

    n = len(sents)
    print(json.dumps({
        'dataset': args.dataset, 'sentences': n, 'tokens': ids_nat,
        'native_sent_per_s': round(n / dt_nat),
        'native_batch_sent_per_s': round(n / dt_batch),
        'python_sent_per_s': round(n / dt_py),
        'speedup_percall': round(dt_py / dt_nat, 2),
        'speedup_batch': round(dt_py / dt_batch, 2),
        'native_us_per_sentence': round(dt_nat / n * 1e6, 2),
        'batch_us_per_sentence': round(dt_batch / n * 1e6, 2),
    }))


if __name__ == '__main__':
    main()
