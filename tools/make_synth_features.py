#!/usr/bin/env python3
"""Generate synthetic per-video feature .npy files for smoke/driving runs.

The real I3D/C3D feature archives are external downloads (reference
README.md:22-31) and are not bundled; this tool fabricates deterministic
random clip features with realistic shapes so the full train/test drivers
can be exercised end-to-end.

Usage:
  python tools/make_synth_features.py --dataset charades --out /tmp/synth_feats \
      [--annotations a.json b.json ...] [--dim 1024] [--clips-per-sec 1.0]
"""

import argparse
import json
import os

import numpy as np

DEFAULT_ANNOS = {
    'charades': ['Charades-CD/charades_train.json', 'Charades-CD/charades_val.json',
                 'Charades-CD/charades_test_iid.json', 'Charades-CD/charades_test_ood.json',
                 'Charades/train.json', 'Charades/test.json'],
    'anet': ['ANet-CD/anet_val.json', 'ANet-CD/anet_test_iid.json',
             'ANet-CD/anet_test_ood.json', 'ANet/train.json',
             'ANet/val_1.json', 'ANet/val_2.json'],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--dataset', choices=['charades', 'anet'], required=True)
    ap.add_argument('--out', required=True)
    ap.add_argument('--data-root', default=os.environ.get(
        'SVTSG_DATA_ROOT', '/root/reference/data'))
    ap.add_argument('--annotations', nargs='*', default=None)
    ap.add_argument('--dim', type=int, default=1024)
    ap.add_argument('--clips-per-sec', type=float, default=2.0,
                    help='charades i3d has ~2 clips/sec before pair pooling; '
                         'anet i3d ~1/sec')
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--limit', type=int, default=0,
                    help='only the first N videos per annotation file')
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    annos = args.annotations or [os.path.join(args.data_root, a)
                                 for a in DEFAULT_ANNOS[args.dataset]]
    rng = np.random.RandomState(args.seed)
    written = 0
    for anno_path in annos:
        if not os.path.isfile(anno_path):
            continue
        anno = json.load(open(anno_path))
        vids = list(anno.keys())
        if args.limit:
            vids = vids[:args.limit]
        for vid in vids:
            path = os.path.join(args.out, vid + '.npy')
            if os.path.exists(path):
                continue
            entry = anno[vid]
            duration = entry.get('video_duration', entry.get('duration', 30.0))
            n_clips = max(4, int(duration * args.clips_per_sec))
            feats = rng.randn(n_clips, args.dim).astype(np.float32)
            np.save(path, feats)
            written += 1
    print(f'wrote {written} feature files to {args.out}')


if __name__ == '__main__':
    main()
