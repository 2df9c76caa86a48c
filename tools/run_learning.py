#!/usr/bin/env python3
"""One-command learning/debiasing experiment (the LEARNING.json protocol).

Orchestrates the full end-to-end proof on one corpus draw: build a
signal-bearing temporally-biased corpus (tools/make_signal_corpus.py),
train GMD and the QAVE baseline through the real drivers (cli.main_train /
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
disjoint-distribution stress variant. `--t 240 --sent-len 25 --lr-step 15`
reproduces the experiment at ANet-CD dims (anet_cd_i3d.yml's video_len/
sent_len/schedule on the same synthetic-charades-schema corpus).

`--multi-seed S` puts error bars on the debiasing margin: S training
seeds per model trained in ONE vmapped run each (train/multiseed.py),
every seed's final checkpoint evaluated on iid/ood, and per-seed PAIRED
margins (GMD_i − QAVE_i on the shifted ood split) reported with
mean ± sample std.
"""

import argparse
import glob
import json
import math
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SMOKE_CORPUS = dict(t=32, d=64, concepts=12, word_pool=40, train=256,
                    val=64, iid=64, ood=64, len_min=4, len_max=10)
SMOKE_MODEL = dict(video_len=32, video_feature_dim=64, sent_len=15,
                   sent_rnn_hiddendim=32, video_rnn_hiddendim=32,
                   mlp_hidden_dim=32, span_hidden_dim=16, m_pred_hidden=32,
                   batch_size=[64, 64, 64])


def corpus_args(a):
    """The generator flags this invocation asks for, keyed exactly as
    make_signal_corpus.py stores them in meta.json['args']."""
    want = dict(seed=a.seed, signal=a.signal, bias_frac=a.bias_frac,
                ood_frac=a.ood_frac, t=a.t)
    if a.smoke:
        want.update(SMOKE_CORPUS)
    return want


def build_corpus(out, a):
    corpus = os.path.join(out, 'corpus')
    meta_path = os.path.join(corpus, 'meta.json')
    want = corpus_args(a)
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            got = json.load(f).get('args', {})
        stale = {k: (got.get(k), v) for k, v in want.items()
                 if got.get(k) != v}
        if stale:
            sys.exit(f'[run_learning] corpus {corpus} exists but was '
                     f'generated with different parameters '
                     f'{{k: (have, want)}} = {stale}; delete it or pick '
                     f'a fresh --out')
        print(f'[run_learning] corpus exists (parameters match): {corpus}')
        return corpus
    cmd = [sys.executable, os.path.join(REPO, 'tools/make_signal_corpus.py'),
           '--out', corpus]
    for k, v in want.items():
        cmd += [f'--{k.replace("_", "-")}', str(v)]
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
        start_from=None, batch_log_interval=-1,
        video_len=a.t, sent_len=a.sent_len,
        # the protocol only evaluates the FINAL checkpoint (eval_split
        # below, through the real test drivers) — skip the per-epoch
        # validation + checkpoint round-trips, which dominate wall time
        # through the remote-relay link (5 seeds x val epoch x 24)
        test_interval=a.epochs, save_model_interval=a.epochs)
    if a.lr_step:
        overrides['lr_step'] = list(a.lr_step)
    if a.lambda_kl is not None:
        overrides['loss_m2_lambda'] = a.lambda_kl
    if a.lambda_disc is not None:
        overrides['loss_disc_lambda'] = a.lambda_disc
    if getattr(a, 'lambda_pseudo_ground', None) is not None:
        overrides['loss_pseudo_ground_lambda'] = a.lambda_pseudo_ground
    if a.smoke:
        overrides.update(SMOKE_MODEL)
    overrides.update(over)
    return load_config(os.path.join(REPO, 'cfgs', 'charades_cd_i3d.yml'),
                       overrides=overrides,
                       data_root='/root/reference/data')


def eval_split(corpus, out, a, kind, split, start_from):
    """Run the real test driver on one split; return the metrics the
    driver itself scored (<submit>.metrics.json — no re-scoring here)."""
    from shufflingvideosfortsg_tpu import cli
    tag = (os.path.basename(start_from).replace('.ckp', '')
           if start_from else 'fresh')
    params = corpus_params(
        corpus, out, f'test_{kind}_{split}_{tag}', a,
        test_data=os.path.join(corpus, 'annotations',
                               f'charades_{split}.json'),
        start_from=start_from)
    main = cli.main_test if kind == 'gmd' else cli.main_test_baseline
    submit = main(params)
    with open(submit + '.metrics.json') as f:
        return json.load(f)


def final_ckpt(out, alias, a, seed_idx=None):
    """Final-epoch checkpoint path; refuses a partial run (a crashed run
    dir would otherwise be silently reused at an intermediate epoch)."""
    model_dir = os.path.join(out, 'runs', alias, 'model')
    suffix = '' if seed_idx is None else f'_s{seed_idx}'
    path = os.path.join(model_dir, f'{alias}_{a.epochs - 1:05d}{suffix}.ckp')
    if not os.path.isfile(path):
        have = sorted(os.path.basename(p)
                      for p in glob.glob(os.path.join(model_dir, '*.ckp')))
        sys.exit(f'[run_learning] final-epoch checkpoint missing: {path}\n'
                 f'  run dir holds {have or "nothing"} — a partial/crashed '
                 f'run; delete {os.path.dirname(model_dir)} to retrain')
    return path


def row(metrics):
    return dict(mIoU=metrics['mIoU'],
                r1=[metrics[k] for k in sorted(metrics)
                    if k.startswith('R1@')])


def mean_std(xs):
    m = sum(xs) / len(xs)
    var = (sum((x - m) ** 2 for x in xs) / (len(xs) - 1)
           if len(xs) > 1 else 0.0)
    return round(m, 3), round(math.sqrt(var), 3)


def train_model(corpus, out, a, kind, trainer):
    """Train (or reuse) one model; return its results block."""
    alias = f'{kind}_s{a.seed}'
    run_dir = os.path.join(out, 'runs', alias)
    S = a.multi_seed
    if os.path.isdir(run_dir):
        print(f'[run_learning] reusing run dir {run_dir} (checkpoint '
              f'completeness checked below)')
    else:
        trainer(corpus_params(corpus, out, alias, a,
                              multi_seed=(S if S > 1 else 0)))
    if S <= 1:
        ckpt = final_ckpt(out, alias, a)
        iid = eval_split(corpus, out, a, kind, 'test_iid', ckpt)
        ood = eval_split(corpus, out, a, kind, 'test_ood', ckpt)
        val = eval_split(corpus, out, a, kind, 'val', ckpt)
        return dict(val=val['mIoU'], test_iid=iid['mIoU'],
                    test_ood=ood['mIoU'], r1_ood=row(ood)['r1'],
                    ckpt_epoch=a.epochs - 1)
    per_seed = []
    for i in range(S):
        ckpt = final_ckpt(out, alias, a, seed_idx=i)
        iid = eval_split(corpus, out, a, kind, 'test_iid', ckpt)
        ood = eval_split(corpus, out, a, kind, 'test_ood', ckpt)
        per_seed.append(dict(train_seed=i, test_iid=iid['mIoU'],
                             test_ood=ood['mIoU']))
        print(f'[run_learning] {kind} seed {i}: {json.dumps(per_seed[-1])}')
    iid_m, iid_s = mean_std([p['test_iid'] for p in per_seed])
    ood_m, ood_s = mean_std([p['test_ood'] for p in per_seed])
    return dict(per_seed=per_seed, test_iid_mean=iid_m, test_iid_std=iid_s,
                test_ood_mean=ood_m, test_ood_std=ood_s,
                ckpt_epoch=a.epochs - 1)


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
    ap.add_argument('--t', type=int, default=128,
                    help='video_len for corpus AND model (240 = ANet dims)')
    ap.add_argument('--sent-len', type=int, default=15,
                    help='model sent_len (25 = ANet dims)')
    ap.add_argument('--lr-step', type=int, nargs='*', default=None,
                    help='override lr decay epochs (anet_cd_i3d.yml: 15)')
    ap.add_argument('--lambda-kl', type=float, default=None,
                    help='override lambda_KL (stress-recovery sweeps)')
    ap.add_argument('--lambda-pseudo-ground', type=float, default=None,
                    help='add a 5th loss term: lambda * span grounding '
                         'NLL on the pseudo stream\'s translated labels '
                         '(shared predictor) — the stress-study method-'
                         'floor probe')
    ap.add_argument('--lambda-disc', type=float, default=None,
                    help='override lambda_disc (stress-recovery sweeps)')
    ap.add_argument('--multi-seed', type=int, default=0,
                    help='S>1: train S seeds per model in one vmapped run '
                         'and report paired ood margins with mean±std')
    ap.add_argument('--models', default='gmd,qave,chance',
                    help='comma subset of gmd,qave,chance')
    ap.add_argument('--smoke', action='store_true',
                    help='tiny corpus + tiny model dims (CPU smoke of the '
                         'whole orchestration; not the headline protocol)')
    args = ap.parse_args()
    if args.smoke:
        args.t = SMOKE_CORPUS['t']

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    corpus = build_corpus(out, args)
    models = args.models.split(',')

    from shufflingvideosfortsg_tpu import cli

    results = {}
    for kind, trainer in (('gmd', cli.main_train),
                          ('qave', cli.main_train_baseline)):
        if kind in models:
            results[kind] = train_model(corpus, out, args, kind, trainer)
            print(f'[run_learning] {kind}: {json.dumps(results[kind])}')
    if 'chance' in models:
        ood = eval_split(corpus, out, args, 'gmd', 'test_ood', None)
        results['chance'] = dict(test_ood=ood['mIoU'])
        print(f'[run_learning] chance: {json.dumps(results["chance"])}')

    if args.multi_seed > 1 and 'gmd' in results and 'qave' in results:
        margins = [round(g['test_ood'] - q['test_ood'], 3)
                   for g, q in zip(results['gmd']['per_seed'],
                                   results['qave']['per_seed'])]
        m, s = mean_std(margins)
        results['paired_ood_margins'] = dict(
            per_seed=margins, mean=m, std=s,
            positive=sum(x > 0 for x in margins), n=len(margins))
        print(f'[run_learning] paired ood margins (gmd-qave): '
              f'{json.dumps(results["paired_ood_margins"])}')

    block = dict(
        corpus=dict(seed=args.seed, signal=args.signal,
                    bias_frac=args.bias_frac, ood_frac=args.ood_frac,
                    epochs=args.epochs, t=args.t, sent_len=args.sent_len,
                    lr_step=args.lr_step, multi_seed=args.multi_seed,
                    lambda_kl=args.lambda_kl, lambda_disc=args.lambda_disc,
                    lambda_pseudo_ground=args.lambda_pseudo_ground),
        results=results)
    path = os.path.join(out, 'learning.json')
    with open(path, 'w') as f:
        json.dump(block, f, indent=1)
    print(f'[run_learning] wrote {path}')
    print(json.dumps(block))


if __name__ == '__main__':
    main()
