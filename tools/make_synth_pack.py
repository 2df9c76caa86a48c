#!/usr/bin/env python3
"""Fabricate a production-sized FEATPAK1 feature pack for driver soaks.

The real i3d/c3d archives are external downloads (reference README:22-23);
this writes a pack with the correct vids/shape/dtype directly (no
intermediate per-video .npy files) so the as-shipped input path —
featpack gather -> collate -> H2D -> jitted step — can be measured at
production dims (T=128/240, D=1024).

Usage:
  python tools/make_synth_pack.py --annotations a.json [b.json ...] \
      --out /path/pack --t 128 --d 1024 [--dtype f16] [--mode raw]
"""

import argparse
import json
import os
import struct

import numpy as np

MAGIC = b'FEATPAK1'
HEADER_FMT = '<8sIIIIQ'


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--annotations', nargs='+', required=True)
    ap.add_argument('--out', required=True)
    ap.add_argument('--t', type=int, default=128)
    ap.add_argument('--d', type=int, default=1024)
    ap.add_argument('--dtype', choices=['f32', 'f16'], default='f16')
    ap.add_argument('--mode', default='raw')
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    vids = {}
    for path in args.annotations:
        anno = json.load(open(path))
        for vid in anno:
            vids.setdefault(vid, len(vids))

    rng = np.random.RandomState(args.seed)
    np_dtype = np.float16 if args.dtype == 'f16' else np.float32
    dtype_code = 1 if args.dtype == 'f16' else 0
    os.makedirs(args.out, exist_ok=True)
    nfeats = rng.randint(max(2, args.t // 6), args.t + 1,
                         size=len(vids)).astype(np.int32)
    with open(os.path.join(args.out, 'pack.bin'), 'wb') as f:
        f.write(struct.pack(HEADER_FMT, MAGIC, len(vids), args.t, args.d,
                            dtype_code, 0))
        for i in range(len(vids)):
            feats = np.zeros((args.t, args.d), np_dtype)
            feats[:nfeats[i]] = rng.randn(
                int(nfeats[i]), args.d).astype(np_dtype)
            f.write(feats.tobytes())
    with open(os.path.join(args.out, 'index.json'), 'w') as f:
        json.dump({'vids': vids, 'nfeats': nfeats.tolist(), 't': args.t,
                   'd': args.d, 'dtype': args.dtype, 'mode': args.mode}, f)
    gib = len(vids) * args.t * args.d * np_dtype().itemsize / 2 ** 30
    print(f'wrote {args.out}: {len(vids)} videos, T={args.t}, D={args.d}, '
          f'{args.dtype}, {gib:.2f} GiB')


if __name__ == '__main__':
    main()
