#!/usr/bin/env python
"""Build an AOT serving artifact (StableHLO + weights + vocab) from a
checkpoint: the deployable form of the multi-query grounding service.

    python tools/export_serving.py --cfg charades_cd_i3d.yml \
        --ckpt runs/charades_cd/my_run/model/my_run_00029.ckp \
        --out /tmp/gmd_artifact [--video_len 1024] [--query_batch 256] \
        [--platforms tpu,cpu] [--vocab words/word_glove_fts_init.npy]

The artifact directory is self-contained: a host with jax (no flax model
code, no this-repo models/) serves it via
``utils.aot.load_grounder_artifact`` — see docs/SERVING.md.
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

if os.environ.get('SVTSG_PLATFORM'):
    jax.config.update('jax_platforms', os.environ['SVTSG_PLATFORM'])

from shufflingvideosfortsg_tpu.config import load_config  # noqa: E402
from shufflingvideosfortsg_tpu.serving import MultiQueryGrounder  # noqa: E402
from shufflingvideosfortsg_tpu.utils.aot import export_grounder  # noqa: E402
from shufflingvideosfortsg_tpu.utils.saver import load_checkpoint  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', required=True,
                    help='config yml, or the run\'s params.json (exact '
                         'trained dims, recommended)')
    ap.add_argument('--ckpt', required=True)
    ap.add_argument('--out', required=True)
    ap.add_argument('--video_len', type=int, default=None,
                    help='resident video length T (default: cfg video_len)')
    ap.add_argument('--query_batch', type=int, default=256)
    ap.add_argument('--platforms', type=str, default=None,
                    help='comma-separated lowering platforms, '
                         'e.g. tpu,cpu (default: current backend)')
    ap.add_argument('--vocab', type=str, default=None,
                    help='GloVe matrix .npy to bundle for token-id serving '
                         '(default: cfg word_fts_path if readable)')
    ap.add_argument('--corpus', type=str, default=None,
                    help='featpack dir: pin the WHOLE corpus bank and '
                         'export the (query, vid) serving tier too')
    ap.add_argument('--bank_dtype', type=str, default='raw',
                    choices=['raw', 'int8'],
                    help='corpus bank storage (int8 = half bf16 residency)')
    args = ap.parse_args()

    if args.cfg.endswith('.json'):
        import json
        with open(args.cfg) as f:
            params = json.load(f)
    else:
        params = load_config(args.cfg,
                             data_root=os.environ.get('SVTSG_DATA_ROOT'))
    payload, is_ref = load_checkpoint(
        args.ckpt, torch_convert_kwargs=dict(
            kind='gmd', predictor_name=params['predictor'],
            m_temp=params['m_temp']))
    print(f'checkpoint: {args.ckpt} (reference-format={is_ref})')

    platforms = args.platforms.split(',') if args.platforms else None
    if platforms:
        # cross-platform lowering cannot use the TPU Pallas recurrence
        # (no CPU lowering) — portable artifacts take the XLA scan path
        params = dict(params, fused_inference=False)
        print('portable artifact: Pallas recurrence disabled '
              '(fused_inference=False)')

    g = MultiQueryGrounder(params, payload['params'],
                           query_batch=args.query_batch)
    T = args.video_len or int(params['video_len'])
    Dv = int(params['video_feature_dim'])
    # resident video fixes the exported T; contents are irrelevant
    g.set_video(np.zeros((T, Dv), np.float32))

    vocab = args.vocab or params.get('word_fts_path')
    if vocab and os.path.isfile(vocab):
        emb = np.load(vocab).astype(np.float32)
        g.set_vocab(emb)
        print(f'vocab: {vocab} {emb.shape}')
    else:
        print('no vocab bundled (feature-query serving only)')

    if args.corpus:
        from shufflingvideosfortsg_tpu.data.featpack import (
            PackedFeatureSource)
        pack = PackedFeatureSource(args.corpus)
        g.set_corpus(pack, dtype=args.bank_dtype)
        print(f'corpus bank: {pack.num_videos} videos '
              f'({args.bank_dtype}) from {args.corpus}')

    g_tpu = None
    if platforms and 'tpu' in platforms:
        # beside the portable scan-recurrence functions, bundle
        # TPU-native Pallas-fused variants (same weights; Mosaic lowers
        # ahead-of-time, so no TPU needed here) — the loader prefers
        # them on TPU backends
        g_tpu = MultiQueryGrounder(dict(params, fused_inference=True),
                                   payload['params'],
                                   query_batch=args.query_batch)
        print('bundling TPU-native fused variants beside the portable ones')

    manifest = export_grounder(g, args.out, platforms=platforms,
                               tpu_grounder=g_tpu)
    size = sum(os.path.getsize(os.path.join(args.out, f))
               for f in os.listdir(args.out))
    print(f'exported {manifest["functions"]} for T={manifest["video_len"]}, '
          f'Q={manifest["query_batch"]}, platforms={manifest["platforms"]} '
          f'(tpu-native: {manifest["tpu_native"]}) '
          f'-> {args.out} ({size / 2**20:.1f} MiB)')


if __name__ == '__main__':
    main()
