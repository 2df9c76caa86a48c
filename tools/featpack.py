#!/usr/bin/env python3
"""Offline feature packer: per-video .npy dirs -> one packed blob.

Applies the configured pooling sampler ONCE per video and writes:
  <out>/pack.bin   — FEATPAK1 header + [num_videos, T, D] f32/f16 payload
  <out>/index.json — {"vids": {vid: row}, "nfeats": [...], "t": T, "d": D,
                      "dtype": "f32"|"f16", "mode": sampler}

Runtime batch assembly then becomes a single parallel gather
(native/featpack.cpp via data/featpack.py), replacing per-sample np.load.

Usage:
  python tools/featpack.py --cfg charades_cd_i3d.yml \
      --featpath /data/Charades/i3d_feature --out /data/charades_i3d.featpack \
      [--dtype f16] [--annotations a.json b.json]
"""

import argparse
import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shufflingvideosfortsg_tpu.config import load_config  # noqa: E402
from shufflingvideosfortsg_tpu.data.pipeline import (  # noqa: E402
    SentenceGroundingDataset)

MAGIC = b'FEATPAK1'
HEADER_FMT = '<8sIIIIQ'  # magic, num_videos, t, d, dtype, reserved


def write_pack(out_dir: str, dataset: SentenceGroundingDataset,
               dtype: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    vids = sorted({s.vid for s in dataset.samples})
    durations = {s.vid: s.duration for s in dataset.samples}
    mode = dataset._mode

    def pooled_row(vid):
        if mode in ('pair', 'triple', '1to1'):
            return dataset._pooled(vid)
        # '114'/'f2s' pool from (video, duration) only — per-video
        # deterministic, so packable; the per-sample framestamps use the
        # same clip_framestamps rule the pack loader applies, and nfeats
        # is per-video ('114': raw clip count; 'f2s': seconds)
        out, _, nfeats = dataset._sample_features(vid, (0.0, 0.0),
                                                  durations[vid])
        return out, nfeats

    T = dataset.sample_len
    first, _ = pooled_row(vids[0])
    D = first.shape[-1]
    np_dtype = np.float16 if dtype == 'f16' else np.float32
    dtype_code = 1 if dtype == 'f16' else 0

    bin_path = os.path.join(out_dir, 'pack.bin')
    nfeats_list = []
    with open(bin_path, 'wb') as f:
        f.write(struct.pack(HEADER_FMT, MAGIC, len(vids), T, D, dtype_code, 0))
        for vid in vids:
            pooled, nfeats = pooled_row(vid)
            f.write(np.ascontiguousarray(pooled[0], dtype=np_dtype).tobytes())
            nfeats_list.append(int(nfeats))
    index = {
        'vids': {vid: i for i, vid in enumerate(vids)},
        'nfeats': nfeats_list,
        't': T, 'd': D, 'dtype': dtype, 'mode': dataset._mode,
    }
    with open(os.path.join(out_dir, 'index.json'), 'w') as f:
        json.dump(index, f)
    print(f'packed {len(vids)} videos -> {bin_path} '
          f'({os.path.getsize(bin_path) / 1e6:.1f} MB)')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', required=True)
    ap.add_argument('--featpath', default=None)
    ap.add_argument('--annotation', default=None,
                    help='annotation JSON (defaults to the cfg train_data)')
    ap.add_argument('--out', required=True)
    ap.add_argument('--dtype', choices=['f32', 'f16'], default='f32')
    ap.add_argument('--data_root', default=None)
    ap.add_argument('--word_fts_path', default=None,
                    help='override the GloVe matrix path (the ANet matrix '
                         'is an external download; packing does not use '
                         'embeddings but the dataset loads its vocab)')
    args = ap.parse_args()

    params = load_config(args.cfg, data_root=args.data_root)
    if args.word_fts_path:
        params['word_fts_path'] = args.word_fts_path
    anno = args.annotation or params['train_data']
    feat = args.featpath or params['train_featpath']
    ds = SentenceGroundingDataset(anno, feat, params,
                                  dataset_name=params['train'])
    if ds._mode == 'lg':
        raise SystemExit("sampler mode 'lg' crops randomly per sample and "
                         "cannot be packed; all other modes pool "
                         "deterministically per video")
    write_pack(args.out, ds, args.dtype)


if __name__ == '__main__':
    main()
