#!/usr/bin/env python3
"""Learning-outcome parity vs the reference's OWN training loop.

tests/test_grad_parity.py pins loss/gradient/3-Adam-step equality against
the reference's real torch modules; this tool closes the remaining gap —
"does the rebuild LEARN like the reference over a run?" — by training
BOTH stacks end-to-end on the same tiny signal-bearing corpus at matched
dims/hyperparameters and comparing outcomes:

- reference side: the actual modules from /root/reference/grounding
  (GMD from model/SpanGroundMatchDisc.py), the actual 4-term loss
  assembly (train.py:140-165), torch.optim.Adam(lr, wd=1e-4, eps=1e-6) +
  MultiStepLR — a faithful transcription of train.py's train() epoch loop
  (:106-207), runnable on CPU via the same Tensor.cuda identity patch the
  grad-parity test uses. Batches come from OUR loader (the reference's
  Dataset wants per-video .npy dirs; the collate schema is equivalent and
  golden-tested), host gt_translate pseudo streams, same batch size.
- rebuild side: the REAL shipped drivers via tools/run_learning.py
  --smoke (cli.main_train / main_test — device bank, on-device
  augmentation, chunked scan), same corpus, same epochs.

Both sides' predictions are scored by the same retrieval_eval (bit-exact
vs the reference's IoU_eval on the bundled golden tables). The emitted
JSON compares val/iid/ood mIoU; the test asserts both stacks land in the
same regime (iid >> chance, comparable magnitudes).

  python tools/run_reference_parity.py --out /tmp/refparity --epochs 12
"""

import argparse
import importlib.util
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_GROUNDING = '/root/reference/grounding'

_spec = importlib.util.spec_from_file_location(
    'run_learning', os.path.join(REPO, 'tools', 'run_learning.py'))
run_learning = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(run_learning)


def ref_modules():
    """Import the reference's real modules, CPU-runnable via the
    Tensor.cuda identity patch (RNN.py:37-38 hardcodes .cuda())."""
    import torch
    torch.Tensor.cuda = lambda self, *a, **kw: self
    sys.path.insert(0, REF_GROUNDING)
    from model.SpanGroundMatchDisc import GMD as RefGMD
    import loss as ref_loss
    from model.networks.attention import masked_softmax as ref_msoftmax
    return RefGMD, ref_loss, ref_msoftmax


def build_ref_model(RefGMD, params, seed=1234):
    """The reference driver's constract_model (train.py:44-104), fed the
    same flat params namespace."""
    import logging
    import torch
    torch.manual_seed(seed)
    log = logging.getLogger('reference_parity')
    video_seq_set = dict(
        name=params['video_encoder'], input_dim=params['video_feature_dim'],
        rnn_hidden_dim=params['video_rnn_hiddendim'],
        rnn_layers=params['video_rnn_layers'],
        rnn_cell=params['video_rnn_cell'], mask=params['mask'],
        drop_out=params['dropout'], T=params['video_len'], nblocks=2)
    sent_seq_set = dict(
        name=params['sent_encoder'], input_dim=300,
        rnn_hidden_dim=params['sent_rnn_hiddendim'],
        rnn_layers=params['sent_rnn_layers'],
        rnn_cell=params['sent_rnn_cell'], drop_out=params['dropout'])
    grounding_set = dict(
        cross_name=params['crossmodal'], name=params['predictor'],
        lstm_hidden_dim=params['span_hidden_dim'],
        mlp_hidden_dim=params['mlp_hidden_dim'])
    matching_set = dict(
        cross=dict(name=params['m_cross']),
        temporal=dict(name=params['m_temp'], hidden_dim=256, layers=2,
                      dropout=params['dropout']),
        predict=dict(name=params['m_pred'], activation=params['m_pred_activ'],
                     hidden_dim=params['m_pred_hidden']))
    return RefGMD(video_seq_set, sent_seq_set, grounding_set, matching_set,
                  log, params['dropout'])


def torch_train(params, corpus, epochs):
    """A faithful transcription of the reference train() loop
    (train.py:106-207) over our loader's host-pair batches."""
    import torch
    from shufflingvideosfortsg_tpu.data.pipeline import (BatchLoader,
                                                         SentenceGroundingDataset)

    RefGMD, ref_loss, ref_msoftmax = ref_modules()
    model = build_ref_model(RefGMD, params)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=params['lr'],
                           weight_decay=params['weight_decay'], eps=1e-6)
    sched = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=params.get('lr_step', [15]),
        gamma=params.get('lr_decay_rate', 0.1))
    ce = torch.nn.CrossEntropyLoss()
    lam1 = params['loss_m1_lambda']
    lam2 = params['loss_m2_lambda']
    lamd = params['loss_disc_lambda']

    anno = os.path.join(corpus, 'annotations', 'charades_train.json')
    pack = os.path.join(corpus, 'pack')
    ds = SentenceGroundingDataset(anno, pack, params,
                                  dataset_name='charades')
    loader = BatchLoader(ds, params['batch_size'][0], shuffle=True,
                         seed=params.get('seed', 123), host_pair_aug=True,
                         prefetch=0)
    t = lambda x: torch.from_numpy(np.ascontiguousarray(x))  # noqa: E731

    for epoch in range(epochs):
        tot, nb = 0.0, 0
        for b in loader:
            Bv = b['video_feat'].shape[0]
            vm = torch.ones(Bv, params['video_len'])
            sm = torch.ones(Bv, params['sent_len'])
            span_prob, ori_m, pse_m, ori_d, pse_d = model(
                t(b['sent_feat']).float(), sm, t(b['video_feat']).float(),
                vm, t(b['pseudo_video_feat']).float(), vm,
                t(b['temporal_labels']).float(), t(b['fore_masks']).float(),
                t(b['back_masks']).float(),
                t(b['pseudo_temporal_labels']).float(),
                t(b['pseudo_fore_masks']).float(),
                t(b['pseudo_back_masks']).float())
            fstps = [tuple(r) for r in b['framestps'].tolist()]
            pstps = [tuple(r) for r in b['pseudo_framestps'].tolist()]
            loss_g = ref_loss.span_ground_loss(span_prob['start'],
                                               span_prob['end'], fstps)
            loss_intra = lam1 * (
                ref_loss.BCE_loss(ori_m, t(b['temporal_labels']).float(),
                                  t(b['video_mask']).float())
                + ref_loss.BCE_loss(pse_m,
                                    t(b['pseudo_temporal_labels']).float(),
                                    t(b['pseudo_video_mask']).float()))
            osm = ref_msoftmax(ori_m, t(b['temporal_labels']).float())
            psm = ref_msoftmax(pse_m, t(b['pseudo_temporal_labels']).float())
            loss_inter = lam2 * ref_loss.matching_KL_divergence(
                osm, psm, fstps, pstps)
            loss_d = ref_loss.temporal_order_discrimination_loss(
                ori_d, pse_d, ce)
            loss = loss_g + loss_intra + loss_inter + lamd * loss_d
            opt.zero_grad()
            loss.backward()
            opt.step()
            tot += float(loss.detach())
            nb += 1
        sched.step()
        print(f'[torch] epoch {epoch}: avg loss {tot / nb:.3f}', flush=True)
    model.eval()
    return model


def ref_span_pred(start_prob, end_prob):
    """The reference's B x T x T argmax decode (loss.py:53-70),
    verbatim except one torch-2 shim: loss.py:66 indexes with a (2, B)
    numpy array, which torch 1.6 interpreted as COORDINATE (tuple-style)
    indexing; torch 2.x treats it as dim-0 advanced indexing and breaks.
    ``tuple(idx)`` restores the 1.6 semantics."""
    import torch
    B, T = start_prob.size()
    start_matrix = start_prob.unsqueeze(dim=-1).expand(B, T, T)
    end_matrix = end_prob.unsqueeze(dim=-1).expand(B, T, T).permute(0, 2, 1)
    prob_matrix = (start_matrix + end_matrix).triu(diagonal=0)
    row_max, row_max_idx = prob_matrix.max(dim=2)
    prob_max, colum_max_idx = row_max.max(dim=1)
    idx = torch.arange(0, B)
    idx = torch.stack((idx, colum_max_idx), dim=0).numpy()
    start = colum_max_idx
    end = row_max_idx[tuple(idx)]  # torch-1.6 coordinate semantics
    pred_time = torch.cat((start.unsqueeze(dim=-1),
                           end.unsqueeze(dim=-1)), dim=-1)
    return pred_time, prob_max


def torch_eval(model, params, corpus, split, workdir):
    """The reference test() path (test.py:82-150): eval_forward +
    span_pred decode + submit JSON, scored by our golden-tested
    retrieval_eval."""
    import torch
    from shufflingvideosfortsg_tpu.data.pipeline import (BatchLoader,
                                                         SentenceGroundingDataset)
    from shufflingvideosfortsg_tpu.eval.iou import retrieval_eval

    anno = os.path.join(corpus, 'annotations', f'charades_{split}.json')
    pack = os.path.join(corpus, 'pack')
    ds = SentenceGroundingDataset(anno, pack, params,
                                  dataset_name='charades')
    loader = BatchLoader(ds, params['batch_size'][2], shuffle=False,
                         prefetch=0)
    pred_dict = {'version': 'V0', 'results': {},
                 'external_data': {'used': True,
                                   'details': 'provided i3D feature'},
                 'params': {k: v for k, v in params.items()
                            if isinstance(v, (int, float, str, bool))}}
    t = lambda x: torch.from_numpy(np.ascontiguousarray(x))  # noqa: E731
    with torch.no_grad():
        for b in loader:
            Bv = b['video_feat'].shape[0]
            span_prob = model.eval_forward(
                t(b['video_feat']).float(), t(b['sent_feat']).float(),
                torch.ones(Bv, params['video_len']),
                torch.ones(Bv, params['sent_len']))
            pred_time, score = ref_span_pred(
                span_prob['start'].cpu(), span_prob['end'].cpu())
            pred_time = pred_time.numpy().astype(np.float32)
            for i in range(b['n_valid']):
                pred_dict['results'].setdefault(b['vid'][i], []).append({
                    'sentence': b['sentence'][i],
                    'timestamp': pred_time[i].tolist(),
                    'gt_timestamp': np.asarray(b['timestps'][i]).tolist(),
                    'score': float(score[i]),
                    'video_duration': float(b['duration'][i]),
                })
    path = os.path.join(workdir, f'torch_submit_{split}.json')
    with open(path, 'w') as f:
        json.dump(pred_dict, f)
    return retrieval_eval(path, quiet=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', required=True)
    ap.add_argument('--epochs', type=int, default=12)
    ap.add_argument('--seed', type=int, default=1)
    args = ap.parse_args()
    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)

    # 1) rebuild side: the shipped drivers, smoke dims, same corpus
    cmd = [sys.executable, os.path.join(REPO, 'tools/run_learning.py'),
           '--out', out, '--smoke', '--epochs', str(args.epochs),
           '--seed', str(args.seed), '--models', 'gmd,chance']
    print('[parity]', ' '.join(cmd), flush=True)
    # CPU-only: ALSO skip the axon PJRT registration (sitecustomize
    # dials the TPU relay at import time in every python process; a
    # concurrent TPU run must not share that single link)
    env = dict(os.environ, JAX_PLATFORMS='cpu', PALLAS_AXON_POOL_IPS='')
    subprocess.run(cmd, check=True, env=env)
    with open(os.path.join(out, 'learning.json')) as f:
        jax_block = json.load(f)

    # 2) reference side: same corpus, same dims/hypers, torch loop
    ns = argparse.Namespace(
        seed=args.seed, signal=1.0, bias_frac=0.5, ood_frac=0.35,
        epochs=args.epochs, t=run_learning.SMOKE_CORPUS['t'], sent_len=15,
        lr_step=None, lambda_kl=None, lambda_disc=None, smoke=True,
        multi_seed=0)
    corpus = os.path.join(out, 'corpus')
    params = run_learning.corpus_params(corpus, out, 'torch_ref', ns)
    model = torch_train(params, corpus, args.epochs)
    ref = {split: torch_eval(model, params, corpus, split, out)['mIoU']
           for split in ('val', 'test_iid', 'test_ood')}

    jx = jax_block['results']['gmd']
    result = {
        'protocol': f'{args.epochs} epochs, smoke dims '
                    f'(T={ns.t}, D=64), same corpus/batches/hypers; '
                    'reference = its real modules + 4-term loss + Adam '
                    'in a faithful train.py loop (CPU, .cuda identity '
                    'patch); rebuild = the shipped cli drivers '
                    '(run_learning --smoke); both scored by the same '
                    'golden-tested retrieval_eval',
        'reference_torch': ref,
        'rebuild_jax': {k: jx[k] for k in ('val', 'test_iid', 'test_ood')},
        'chance_ood': jax_block['results']['chance']['test_ood'],
    }
    path = os.path.join(out, 'reference_parity.json')
    with open(path, 'w') as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == '__main__':
    main()
