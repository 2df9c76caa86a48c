#!/usr/bin/env python
"""Export a framework checkpoint to the reference's raw-torch ``.ckp`` format.

The reference saves ``model.state_dict()`` directly
(/root/reference/grounding/train.py:406-408) and loads it with
``model.load_state_dict(torch.load(path))``
(/root/reference/grounding/test.py:76-78). This tool converts a checkpoint
written by this framework ({params, opt_state, step, rng} msgpack) into
exactly that file, so weights trained on TPU here can be evaluated or
deployed through the reference's own PyTorch code — the inverse of the
``.ckp`` *reader* the drivers already have (utils/saver.py::load_checkpoint).

Usage:
    python tools/export_reference_ckp.py \
        --ckpt runs/charades_cd/my_run/model/my_run_00029.ckp \
        --cfg charades_cd_i3d.yml --out /tmp/my_run_torch.ckp
    # then, with the reference code:  python test.py ... --start_from
    # /tmp/my_run_torch.ckp

Model-shape flags (--kind/--predictor/--m-temp/layer counts) default from
the --cfg config the run was trained with; layouts + strict-load parity are
asserted by tests/test_ckp_export.py.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('JAX_PLATFORMS', 'cpu')  # pure host-side conversion

from shufflingvideosfortsg_tpu.config import load_config  # noqa: E402
from shufflingvideosfortsg_tpu.utils.saver import load_checkpoint  # noqa: E402
from shufflingvideosfortsg_tpu.utils.torch_interop import (  # noqa: E402
    save_reference_ckp)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('--ckpt', required=True,
                    help='framework checkpoint (msgpack .ckp)')
    ap.add_argument('--out', required=True,
                    help='output path for the torch-format state_dict')
    ap.add_argument('--cfg', default=None,
                    help='config the run was trained with (derives model '
                         'shape flags); any flag below overrides it')
    ap.add_argument('--kind', default='gmd', choices=['gmd', 'baseline'])
    ap.add_argument('--predictor', default=None)
    ap.add_argument('--m-temp', default=None)
    ap.add_argument('--sent-layers', type=int, default=None)
    ap.add_argument('--video-layers', type=int, default=None)
    args = ap.parse_args()

    params = load_config(args.cfg) if args.cfg else load_config()
    kwargs = dict(
        kind=args.kind,
        sent_layers=args.sent_layers or params['sent_rnn_layers'],
        video_layers=args.video_layers or params['video_rnn_layers'],
        nblocks=2,
        predictor_name=args.predictor or params['predictor'],
        m_temp=args.m_temp or params['m_temp'],
    )

    payload, is_ref = load_checkpoint(args.ckpt)
    if is_ref:
        raise SystemExit(f'{args.ckpt} is already a reference-format '
                         'torch state_dict')
    save_reference_ckp(payload['params'], args.out, **kwargs)
    n = sum(1 for _ in payload['params'])
    print(f'wrote {args.out} (reference torch state_dict, step '
          f'{payload.get("step", "?")}, {n} top-level param groups, '
          f'kind={args.kind})')


if __name__ == '__main__':
    main()
