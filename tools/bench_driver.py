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

# GPU reference baselines (BASELINE.md): 78 pairs/s train, 676 sent/s
# Charades-CD eval (T=128), 386 sent/s ANet-CD eval (T=240)
BASE_TRAIN = 78.0
BASE_EVAL = 676.0
BASE_EVAL_ANET = 386.0


def ensure_corpus(path, t=128, ood=2000, train=6000):
    if os.path.isfile(os.path.join(path, 'meta.json')):
        return path
    subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools/make_signal_corpus.py'),
         '--out', path, '--seed', '7', '--bias-frac', '0.5',
         '--ood-frac', '0.35', '--t', str(t), '--ood', str(ood),
         '--train', str(train)], check=True)
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
    ap.add_argument('--t', type=int, default=128,
                    help='video_len of the corpus (128=Charades dims, '
                         '240=ANet dims; sets the GPU eval baseline '
                         '676 vs 386 sent/s)')
    ap.add_argument('--ood', type=int, default=2000,
                    help='eval-split sentence count (real split sizes: '
                         '3375 Charades-CD ood, 13578 ANet-CD ood)')
    ap.add_argument('--train-size', type=int, default=6000,
                    help='train-split size (shrink for eval-only corpora '
                         'so the pack stays within the bank budget)')
    args = ap.parse_args()

    corpus = ensure_corpus(os.path.abspath(args.corpus), t=args.t,
                           ood=args.ood, train=args.train_size)
    workdir = args.workdir or os.path.join(corpus, f'bench_{args.mode}')
    shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)

    from shufflingvideosfortsg_tpu import cli

    dims = {} if args.t == 128 else dict(video_len=args.t)
    base_eval = BASE_EVAL if args.t == 128 else BASE_EVAL_ANET

    if args.mode == 'train':
        params = corpus_params(corpus, workdir, 'soak_train',
                               epoch=args.epochs, **dims)
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

    # eval: the real user path — the reference's test.py ALWAYS loads a
    # checkpoint (test.py:76-78), so the timed run does too. Write a
    # fresh-init checkpoint once, run the driver cold (pays the
    # compiles), then time the warm pass end-to-end; the loop-only
    # figure (reference "elapsed time" scope, test.py:85-148) comes from
    # the submit's metrics json.
    import jax
    from shufflingvideosfortsg_tpu.models import build_model
    from shufflingvideosfortsg_tpu.train.state import (create_train_state,
                                                       make_optimizer)
    from shufflingvideosfortsg_tpu.utils.saver import save_checkpoint

    n_sent = sum(len(r['sentences']) for r in json.load(open(os.path.join(
        corpus, 'annotations', 'charades_test_ood.json'))).values())
    params0 = corpus_params(corpus, workdir, 'test_soak_ckpt', **dims)
    model = build_model(params0, 'gmd', inference=True)
    mp = cli.init_model_params(model, params0, jax.random.PRNGKey(0), 'gmd')
    state = create_train_state(mp, make_optimizer(params0,
                                                  steps_per_epoch=1))
    ckpt = os.path.join(workdir, 'bench_init.ckp')
    save_checkpoint(ckpt, state)

    params = corpus_params(corpus, workdir, 'test_soak_eval',
                           start_from=ckpt, **dims)
    cli.main_test(params)
    params2 = corpus_params(corpus, workdir, 'test_soak_eval2',
                            start_from=ckpt, **dims)
    t0 = time.perf_counter()
    submit = cli.main_test(params2)
    dt = time.perf_counter() - t0
    loop_s = json.load(open(submit + '.metrics.json'))['elapsed_loop_s']
    print(json.dumps({
        'metric': 'driver_eval_sentences_per_sec',
        'value': round(n_sent / dt, 1),
        'unit': 'sentences/s',
        'vs_baseline': round(n_sent / dt / base_eval, 2),
        'config': {'T': params['video_len'], 'sentences': n_sent,
                   'warm_seconds': round(dt, 2),
                   'loop_seconds': round(loop_s, 3),
                   'loop_sentences_per_sec': round(n_sent / loop_s, 1),
                   'loop_vs_baseline': round(n_sent / loop_s / base_eval, 2),
                   'gpu_baseline_sent_per_sec': base_eval,
                   'path': 'cli.main_test with --start_from checkpoint '
                           '(load + device bank + whole-epoch scan + '
                           'submit write + scoring, as shipped)'},
    }), flush=True)


if __name__ == '__main__':
    main()
