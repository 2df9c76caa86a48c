#!/usr/bin/env python3
"""As-shipped driver throughput: one rep of the REAL cli train/eval path
on a signal-bearing synthetic corpus at production dims, reported as one
JSON line (the same contract as bench.py, so tools/run_soak.py can
median it).

Unlike bench.py's train/eval modes (which time the jitted steps around
the driver), this measures the driver itself — RunManager, BatchLoader,
device bank residency, chunked-scan dispatch, logging, checkpoint
write — i.e. the numbers RUNTIME.md quotes for the end-to-end paths.

  python tools/bench_driver.py --mode train --corpus /tmp/soak_corpus
  python tools/bench_driver.py --mode eval  --corpus /tmp/soak_corpus

The corpus is generated on first use (make_signal_corpus.py defaults:
T=128, D=1024, 6000 train / 2000 ood sentences) and reused across reps.
Train reports the SECOND epoch's pairs/s (first epoch pays the compile);
eval runs the test driver twice and reports the warm run's sentences/s.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# GPU reference baselines (BASELINE.md): 78 pairs/s train, 676 sent/s eval
BASE_TRAIN = 78.0
BASE_EVAL = 676.0


def ensure_corpus(path):
    if os.path.isfile(os.path.join(path, 'meta.json')):
        return path
    subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools/make_signal_corpus.py'),
         '--out', path, '--seed', '7', '--bias-frac', '0.5',
         '--ood-frac', '0.35'], check=True)
    return path


def corpus_params(corpus, workdir, alias, **over):
    from shufflingvideosfortsg_tpu.config import load_config
    anno = lambda s: os.path.join(corpus, 'annotations',  # noqa: E731
                                  f'charades_{s}.json')
    pack = os.path.join(corpus, 'pack')
    overrides = dict(
        train_data=anno('train'), val_data=anno('val'),
        test_data=anno('test_ood'),
        train_featpath=pack, valid_featpath=pack, test_featpath=pack,
        alias=alias, runs=os.path.join(workdir, 'runs'),
        start_from=None, batch_log_interval=-1,
        test_interval=1000, save_model_interval=1000)
    overrides.update(over)
    return load_config(os.path.join(REPO, 'cfgs', 'charades_cd_i3d.yml'),
                       overrides=overrides,
                       data_root='/root/reference/data')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--mode', choices=['train', 'eval'], required=True)
    ap.add_argument('--corpus', default='/tmp/svtsg_soak_corpus')
    ap.add_argument('--workdir', default=None)
    ap.add_argument('--epochs', type=int, default=2)
    args = ap.parse_args()

    corpus = ensure_corpus(os.path.abspath(args.corpus))
    workdir = args.workdir or os.path.join(corpus, f'bench_{args.mode}')
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)

    from shufflingvideosfortsg_tpu import cli

    if args.mode == 'train':
        params = corpus_params(corpus, workdir, 'soak_train',
                               epoch=args.epochs)
        n_pairs = sum(len(r['sentences']) for r in json.load(
            open(params['train_data'])).values())
        cli.main_train(params)
        secs = [json.loads(l)['seconds'] for l in open(os.path.join(
            workdir, 'runs', 'soak_train', 'metrics.jsonl'))
            if json.loads(l).get('phase') == 'train']
        warm = secs[-1]  # last epoch: compile paid in epoch 0
        print(json.dumps({
            'metric': 'driver_train_pairs_per_sec',
            'value': round(n_pairs / warm, 1),
            'unit': 'pairs/s',
            'vs_baseline': round(n_pairs / warm / BASE_TRAIN, 2),
            'config': {'T': params['video_len'], 'epochs': args.epochs,
                       'pairs_per_epoch': n_pairs,
                       'warm_epoch_seconds': round(warm, 2),
                       'path': 'cli.main_train (device bank + '
                               'chunked scan, as shipped)'},
        }), flush=True)
        return

    # eval: train nothing — a fresh-init model exercises the identical
    # compute path; run the test driver twice, report the warm pass
    n_sent = sum(len(r['sentences']) for r in json.load(open(os.path.join(
        corpus, 'annotations', 'charades_test_ood.json'))).values())
    params = corpus_params(corpus, workdir, 'test_soak_eval')
    cli.main_test(params)
    params2 = corpus_params(corpus, workdir, 'test_soak_eval2')
    t0 = time.perf_counter()
    cli.main_test(params2)
    dt = time.perf_counter() - t0
    print(json.dumps({
        'metric': 'driver_eval_sentences_per_sec',
        'value': round(n_sent / dt, 1),
        'unit': 'sentences/s',
        'vs_baseline': round(n_sent / dt / BASE_EVAL, 2),
        'config': {'T': params['video_len'], 'sentences': n_sent,
                   'warm_seconds': round(dt, 2),
                   'path': 'cli.main_test (device bank + whole-epoch '
                           'scan + submit write + scoring, as shipped)'},
    }), flush=True)


if __name__ == '__main__':
    main()
