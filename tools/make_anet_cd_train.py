#!/usr/bin/env python3
"""Re-derive the missing ANet-CD training annotations.

``data/ANet-CD/anet_train.json`` is a missing large blob in the reference
tree (/root/reference/.MISSING_LARGE_BLOBS:1). The CD ("changing
distribution") splits re-divide the ORIGINAL ActivityNet Captions
annotations (data/ANet/{train,val_1,val_2}.json), which ARE bundled, so the
train split is recoverable:

- membership: a video is in CD-train iff it appears in some original split
  and in none of the bundled CD val/test files. This yields exactly 10984
  videos — the count the reference's own training log records
  (grounding/ckp/anet_cd/train.log:3).
- record merge: timestamps/sentences concatenated over the original splits
  in (train, val_1, val_2) order; duration from the first split containing
  the video. This rule reconstructs ALL 3942 videos of the three bundled CD
  files BIT-EXACTLY (verified by --check and tests/test_anet_cd_train.py),
  so it is the same rule the CD authors used.

Usage:
  python tools/make_anet_cd_train.py --data_root /root/reference/data \
      --out data/ANet-CD/anet_train.json [--check]
"""

import argparse
import json
import os


def load_sources(data_root):
    base = os.path.join(data_root, 'ANet')
    return [json.load(open(os.path.join(base, f'{n}.json')))
            for n in ('train', 'val_1', 'val_2')]


def load_cd_splits(data_root):
    base = os.path.join(data_root, 'ANet-CD')
    return {n: json.load(open(os.path.join(base, f'anet_{n}.json')))
            for n in ('val', 'test_iid', 'test_ood')}


def merge_record(vid, sources):
    stamps, sents, dur = [], [], None
    for src in sources:
        if vid in src:
            rec = src[vid]
            stamps += [list(t) for t in rec['timestamps']]
            sents += list(rec['sentences'])
            if dur is None:
                dur = rec['duration']
    return {'duration': dur, 'timestamps': stamps, 'sentences': sents}


def check_rule(sources, cd_splits):
    """The derivation proof: the merge rule must reconstruct every bundled
    CD record exactly."""
    bad = 0
    for name, cd in cd_splits.items():
        for vid, rec in cd.items():
            got = merge_record(vid, sources)
            if (got['sentences'] != list(rec['sentences'])
                    or [list(map(float, t)) for t in got['timestamps']]
                    != [list(map(float, t)) for t in rec['timestamps']]
                    or float(got['duration']) != float(rec['duration'])):
                bad += 1
                print(f'MISMATCH {name}/{vid}')
    return bad


def derive_train(data_root):
    sources = load_sources(data_root)
    cd_splits = load_cd_splits(data_root)
    cd_vids = set()
    for cd in cd_splits.values():
        cd_vids.update(cd)
    # preserve first-appearance order over (train, val_1, val_2)
    train = {}
    for src in sources:
        for vid in src:
            if vid not in cd_vids and vid not in train:
                train[vid] = merge_record(vid, sources)
    return train, sources, cd_splits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data_root', default='/root/reference/data')
    ap.add_argument('--out', default='data/ANet-CD/anet_train.json')
    ap.add_argument('--check', action='store_true',
                    help='also verify the merge rule reconstructs the '
                         'bundled CD splits bit-exactly')
    args = ap.parse_args()

    train, sources, cd_splits = derive_train(args.data_root)
    if args.check:
        bad = check_rule(sources, cd_splits)
        n_checked = sum(len(cd) for cd in cd_splits.values())
        print(f'rule check: {n_checked - bad}/{n_checked} bundled CD '
              f'records reconstructed exactly')
        if bad:
            raise SystemExit(1)
    n_sent = sum(len(r['sentences']) for r in train.values())
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, 'w') as f:
        json.dump(train, f)
    print(f'wrote {args.out}: {len(train)} videos (reference train.log '
          f'says 10984), {n_sent} sentences')


if __name__ == '__main__':
    main()
