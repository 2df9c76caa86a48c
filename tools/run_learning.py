#!/usr/bin/env python3
"""One-command learning/debiasing experiment (the LEARNING.json protocol).

Orchestrates the full end-to-end proof on one seed: build a signal-bearing
temporally-biased corpus (tools/make_signal_corpus.py), train GMD and the
QAVE baseline through the real drivers (cli.main_train /
main_train_baseline — the same code paths train.py / train_baseline.py
invoke), evaluate the final-epoch checkpoints through the real test
drivers on the iid and position-shifted ood splits, measure "chance" as a
fresh-init GMD through the same test driver, and emit one JSON block in
LEARNING.json's results schema.

The reference's counterpart artifact is its published run log
(/root/reference/grounding/ckp/anet_cd/train.log, test.log); here the
whole experiment is reproducible with one command:

  python tools/run_learning.py --out /tmp/learn_s1 --seed 1 \
      --bias-frac 0.5 --ood-frac 0.35 --signal 1.0

Defaults reproduce the CD-like main experiment (moderate bias, overlapping
start distributions) at production dims (T=128, D=1024, 24 epochs,
charades_cd_i3d.yml model dims, device bank + chunked-scan dispatch).
`--bias-frac 0.25 --ood-frac 0.6 --signal 0.5` reproduces the
disjoint-distribution stress variant.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPLITS = ('train', 'val', 'test_iid', 'test_ood')


SMOKE_CORPUS = ['--t', '32', '--d', '64', '--concepts', '12',
                '--word-pool', '40', '--train', '256', '--val', '64',
                '--iid', '64', '--ood', '64', '--len-min', '4',
                '--len-max', '10']
SMOKE_MODEL = dict(video_len=32, video_feature_dim=64, sent_len=15,
                   sent_rnn_hiddendim=32, video_rnn_hiddendim=32,
                   mlp_hidden_dim=32, span_hidden_dim=16, m_pred_hidden=32,
                   batch_size=[64, 64, 64])


def build_corpus(out, a):
    corpus = os.path.join(out, 'corpus')
    if os.path.isfile(os.path.join(corpus, 'meta.json')):
        print(f'[run_learning] corpus exists: {corpus}')
        return corpus
    cmd = [sys.executable, os.path.join(REPO, 'tools/make_signal_corpus.py'),
           '--out', corpus, '--seed', str(a.seed),
           '--signal', str(a.signal), '--bias-frac', str(a.bias_frac),
           '--ood-frac', str(a.ood_frac)] + (SMOKE_CORPUS if a.smoke else [])
    print('[run_learning]', ' '.join(cmd))
    subprocess.run(cmd, check=True)
    return corpus


def corpus_params(corpus, out, alias, a, **over):
    """charades_cd_i3d.yml defaults re-pointed at the synthetic corpus."""
    from shufflingvideosfortsg_tpu.config import load_config
    anno = lambda split: os.path.join(corpus, 'annotations',
                                      f'charades_{split}.json')
    pack = os.path.join(corpus, 'pack')
    overrides = dict(
        train_data=anno('train'), val_data=anno('val'),
        test_data=anno('test_ood'),
        train_featpath=pack, valid_featpath=pack, test_featpath=pack,
        epoch=a.epochs, alias=alias, runs=os.path.join(out, 'runs'),
        start_from=None, batch_log_interval=-1)
    if a.smoke:
        overrides.update(SMOKE_MODEL)
    overrides.update(over)
    return load_config(os.path.join(REPO, 'cfgs', 'charades_cd_i3d.yml'),
                       overrides=overrides,
                       data_root='/root/reference/data')


def eval_split(corpus, out, a, kind, split, start_from):
    """Run the real test driver on one split; return its metrics dict."""
    from shufflingvideosfortsg_tpu import cli
    from shufflingvideosfortsg_tpu.eval.iou import retrieval_eval
    tag = os.path.basename(str(start_from) or 'fresh').replace('.ckp', '')
    params = corpus_params(
        corpus, out, f'test_{kind}_{split}_{tag}', a,
        test_data=os.path.join(corpus, 'annotations',
                               f'charades_{split}.json'),
        start_from=start_from)
    main = cli.main_test if kind == 'gmd' else cli.main_test_baseline
    return retrieval_eval(main(params), quiet=True)


def final_ckpt(out, alias):
    from shufflingvideosfortsg_tpu.utils.saver import latest_checkpoint
    found = latest_checkpoint(os.path.join(out, 'runs', alias, 'model'))
    assert found is not None, f'no checkpoint under {out}/runs/{alias}/model'
    path, epoch = found
    print(f'[run_learning] {alias}: final checkpoint epoch {epoch}: {path}')
    return path

def row(metrics):
    return dict(mIoU=metrics['mIoU'],
                r1=[metrics[k] for k in sorted(metrics)
                    if k.startswith('R1@')])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', required=True,
                    help='fresh workdir (corpus/, runs/, learning.json)')
    ap.add_argument('--seed', type=int, default=1,
                    help='corpus generator seed (independent draw per seed)')
    ap.add_argument('--signal', type=float, default=1.0)
    ap.add_argument('--bias-frac', type=float, default=0.5)
    ap.add_argument('--ood-frac', type=float, default=0.35)
    ap.add_argument('--epochs', type=int, default=24)
    ap.add_argument('--models', default='gmd,qave,chance',
                    help='comma subset of gmd,qave,chance')
    ap.add_argument('--smoke', action='store_true',
                    help='tiny corpus + tiny model dims (CPU smoke of the '
                         'whole orchestration; not the headline protocol)')
    args = ap.parse_args()

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    corpus = build_corpus(out, args)
    models = args.models.split(',')

    from shufflingvideosfortsg_tpu import cli

    results = {}
    for kind, trainer in (('gmd', cli.main_train),
                          ('qave', cli.main_train_baseline)):
        if kind not in models:
            continue
        alias = f'{kind}_s{args.seed}'
        run_dir = os.path.join(out, 'runs', alias)
        if os.path.isdir(run_dir):
            print(f'[run_learning] reusing finished run {run_dir}')
        else:
            trainer(corpus_params(corpus, out, alias, args))
        ckpt = final_ckpt(out, alias)
        iid = eval_split(corpus, out, args, kind, 'test_iid', ckpt)
        ood = eval_split(corpus, out, args, kind, 'test_ood', ckpt)
        val = eval_split(corpus, out, args, kind, 'val', ckpt)
        results[kind] = dict(val=val['mIoU'], test_iid=iid['mIoU'],
                             test_ood=ood['mIoU'], r1_ood=row(ood)['r1'])
        print(f'[run_learning] {kind}: {json.dumps(results[kind])}')
    if 'chance' in models:
        ood = eval_split(corpus, out, args, 'gmd', 'test_ood', None)
        results['chance'] = dict(test_ood=ood['mIoU'])
        print(f'[run_learning] chance: {json.dumps(results["chance"])}')

    block = dict(
        corpus=dict(seed=args.seed, signal=args.signal,
                    bias_frac=args.bias_frac, ood_frac=args.ood_frac,
                    epochs=args.epochs),
        results=results)
    path = os.path.join(out, 'learning.json')
    with open(path, 'w') as f:
        json.dump(block, f, indent=1)
    print(f'[run_learning] wrote {path}')
    print(json.dumps(block))


if __name__ == '__main__':
    main()
