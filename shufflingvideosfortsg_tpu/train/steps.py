"""Pure jitted train/valid/test steps for GMD and the QAVE baseline.

One ``train_step(state, batch, key)`` per model, assembling the reference's
loss (grounding/train.py:140-165): grounding NLL + λ1·(intra-video BCE on
raw+pseudo) + λ2·(inter-video span KL) + λ3·(order-discrimination CE).
Pseudo videos are generated on device by default (gt_translate as a gather,
ops/augment_device.py) so only the raw batch crosses host->device.

Span decoding + mean IoU run on device in the same step — the reference's
per-batch `.cpu()` sync for statistics (train.py:175-184) has no analog.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..ops.augment_device import gt_translate_batch
from ..ops.losses import (bce_loss, masked_softmax, matching_kl_divergence,
                          span_ground_loss, temporal_order_discrimination_loss)
from ..ops.span import compute_mean_iou, span_decode, span_topk_nms
from .state import TrainState


def _stats(start_prob, end_prob, batch, lg_frame2sec: bool):
    pred, score = span_decode(start_prob, end_prob)
    pred_f = pred.astype(jnp.float32)
    if lg_frame2sec:
        pred_f = pred_f / batch['nfeats'][:, None].astype(jnp.float32) \
            * batch['duration'][:, None].astype(jnp.float32)
    miou = compute_mean_iou(pred_f, batch['timestps'])
    return pred_f, score, miou


def _topk_stats(start_prob, end_prob, batch, lg_frame2sec: bool, k: int,
                nms_iou: float):
    """Top-k NMS proposals in prediction time units (beyond-parity R@k)."""
    spans, scores = span_topk_nms(start_prob, end_prob, k,
                                  iou_threshold=nms_iou)
    spans_f = spans.astype(jnp.float32)
    if lg_frame2sec:
        scale = (batch['duration'] / batch['nfeats'].astype(jnp.float32))
        spans_f = spans_f * scale[:, None, None].astype(jnp.float32)
    return spans_f, scores




# batch keys the GMD loss consumes — the only ones split into microbatches
# (the rest, e.g. nfeats/duration/timestps, are used by full-batch stats)
_GMD_LOSS_KEYS = ('sent_feat', 'sent_mask', 'video_feat', 'video_mask',
                  'temporal_labels', 'fore_masks', 'back_masks', 'framestps')


def _accumulate_grads(grad_fn, model_params, batch, pseudo, dropout_key,
                      accum, keys=_GMD_LOSS_KEYS):
    """Gradient accumulation: ``accum`` microbatches per optimizer update,
    inside the jitted step (``lax.scan``, so activation memory is one
    microbatch's — the TPU-native way to raise the effective batch past
    HBM). Grad = mean of microbatch grads; the loss is therefore the mean
    of microbatch losses — exact for the per-sample-mean terms (grounding
    NLL, KL, TOD) and the standard accumulation semantics for the
    mask-count-normalized BCE (identical when microbatch mask counts are
    equal). Dropout draws a fresh key per microbatch — with any live
    dropout (incl. the TOD head's reference-mandated p=0.5,
    ``disc_dropout``) the accumulated update therefore matches the
    full-batch one in distribution, not bitwise. Requires the global
    batch divisible by ``accum`` (and each microbatch by the data-mesh
    size when sharded)."""
    b = next(iter(pseudo.values())).shape[0] if pseudo else \
        batch[keys[0]].shape[0]
    if b % accum:
        raise ValueError(f'grad_accum_steps={accum} must divide the batch '
                         f'size ({b})')

    def mb(x):
        return x.reshape((accum, x.shape[0] // accum) + x.shape[1:])

    b_mb = {k: mb(batch[k]) for k in keys if k in batch}
    p_mb = jax.tree.map(mb, pseudo)
    mkeys = jax.random.split(dropout_key, accum)
    zero = jax.tree.map(jnp.zeros_like, model_params)

    def body(acc, xs):
        bk, pk, k = xs
        (_, aux_i), g = grad_fn(model_params, bk, pk, k)
        return jax.tree.map(jnp.add, acc, g), aux_i

    grads, auxs = jax.lax.scan(body, zero, (b_mb, p_mb, mkeys))
    grads = jax.tree.map(lambda g: g / accum, grads)
    # scalars (stacked [accum]) average; per-sample outputs (e.g. the
    # [accum, B/accum, T] span probs) flatten back to the full batch
    aux = {k: (v.mean() if v.ndim == 1
               else v.reshape((-1,) + v.shape[2:]))
           for k, v in auxs.items()}
    return grads, aux


class JittedStep:
    """A jitted step that also exposes its traceable body (``inner``) so
    drivers can embed it inside a whole-epoch/chunked ``lax.scan``
    (cli._banked_eval_epoch / cli._banked_train_chunks_factory) instead of
    dispatching per batch."""

    def __init__(self, fn, donate_argnums=None):
        self.inner = fn
        if donate_argnums is not None:
            self._jit = jax.jit(fn, donate_argnums=donate_argnums)
        else:
            self._jit = jax.jit(fn)

    def __call__(self, *args, **kwargs):
        return self._jit(*args, **kwargs)


def make_gmd_train_step(model, params: Dict[str, Any],
                        lg_frame2sec: bool = False, assembler=None,
                        mesh=None, forward=None, extra_constrain=None):
    """``forward(p, batch, pseudo, dropout_key)`` -> GMD output dict
    overrides the model forward (default: the monolithic ``__call__``) —
    the seam encoder-sharded variants (train/pipelined.py) plug into
    while reusing the exact 4-term loss assembly. ``extra_constrain``
    re-pins a custom state sharding after the optimizer update (same
    contract as the FSDP constrainer)."""
    m1 = float(params['loss_m1_lambda'])
    m2 = float(params['loss_m2_lambda'])
    md = float(params['loss_disc_lambda'])
    mpg = float(params.get('loss_pseudo_ground_lambda', 0) or 0)
    on_device_aug = bool(params.get('on_device_aug', True))
    accum = int(params.get('grad_accum_steps', 1) or 1)
    from ..parallel.fsdp import state_constrainer
    fsdp_constrain = state_constrainer(params, mesh)
    if fsdp_constrain and extra_constrain:
        # compose, FSDP pin last (it owns the final placement)
        constrain = lambda st: fsdp_constrain(extra_constrain(st))  # noqa: E731
    else:
        constrain = fsdp_constrain or extra_constrain

    def default_forward(p, batch, pseudo, dropout_key):
        return model.apply(
            {'params': p},
            batch['sent_feat'], batch['sent_mask'],
            batch['video_feat'], batch['video_mask'],
            pseudo['video_feat'], pseudo['video_mask'],
            batch['temporal_labels'], batch['fore_masks'], batch['back_masks'],
            pseudo['temporal_labels'], pseudo['fore_masks'], pseudo['back_masks'],
            deterministic=False, rngs={'dropout': dropout_key})

    fwd = forward if forward is not None else default_forward

    def loss_fn(p, batch, pseudo, dropout_key):
        out = fwd(p, batch, pseudo, dropout_key)
        loss_g = span_ground_loss(out['start_prob'], out['end_prob'],
                                  batch['framestps'])
        loss_intra = m1 * (
            bce_loss(out['ori_match_prob'], batch['temporal_labels'],
                     batch['video_mask'])
            + bce_loss(out['pseudo_match_prob'], pseudo['temporal_labels'],
                       pseudo['video_mask']))
        ori_sm = masked_softmax(out['ori_match_prob'], batch['temporal_labels'])
        pse_sm = masked_softmax(out['pseudo_match_prob'],
                                pseudo['temporal_labels'])
        loss_inter = m2 * matching_kl_divergence(
            ori_sm, pse_sm, batch['framestps'], pseudo['framestps'])
        loss_disc = temporal_order_discrimination_loss(
            out['ori_disc_prob'], out['pseudo_disc_prob'])
        loss = loss_g + loss_intra + loss_inter + md * loss_disc
        if mpg > 0:
            # beyond-reference 5th term (LEARNING.md stress probe):
            # grounding NLL on the pseudo stream's TRANSLATED labels
            # through the shared span predictor
            loss_pg = span_ground_loss(out['pseudo_start_prob'],
                                       out['pseudo_end_prob'],
                                       pseudo['framestps'])
            loss = loss + mpg * loss_pg
        aux = {'loss': loss, 'loss_g': loss_g, 'loss_intra': loss_intra,
               'loss_inter': loss_inter, 'loss_d': loss_disc,
               'start_prob': out['start_prob'], 'end_prob': out['end_prob']}
        return loss, aux

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   key: jax.Array) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        if assembler is not None:
            batch = assembler(batch)
        aug_key, dropout_key = jax.random.split(key)
        if on_device_aug:
            pseudo_feat, pseudo_framestps, pmasks = gt_translate_batch(
                aug_key, batch['video_feat'], batch['framestps'],
                batch['nfeats'])
            pseudo = {'video_feat': pseudo_feat,
                      'framestps': pseudo_framestps,
                      'video_mask': pmasks['video_mask'],
                      'temporal_labels': pmasks['temporal_labels'],
                      'fore_masks': pmasks['fore_masks'],
                      'back_masks': pmasks['back_masks']}
        else:
            pseudo = {'video_feat': batch['pseudo_video_feat'],
                      'framestps': batch['pseudo_framestps'],
                      'video_mask': batch['pseudo_video_mask'],
                      'temporal_labels': batch['pseudo_temporal_labels'],
                      'fore_masks': batch['pseudo_fore_masks'],
                      'back_masks': batch['pseudo_back_masks']}
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum > 1:
            grads, aux = _accumulate_grads(grad_fn, state.params, batch,
                                           pseudo, dropout_key, accum)
        else:
            (_, aux), grads = grad_fn(state.params, batch, pseudo,
                                      dropout_key)
        state = state.apply_gradients(grads)
        if constrain is not None:  # FSDP: pin the ZeRO-3 placement
            state = constrain(state)
        _, _, miou = _stats(aux.pop('start_prob'), aux.pop('end_prob'),
                            batch, lg_frame2sec)
        aux['miou'] = miou
        return state, aux

    step = JittedStep(train_step, donate_argnums=(0,))
    # exposed for per-stage profiling (tools/profile_train.py): the raw
    # 4-term loss body, taking the pseudo stream explicitly
    step.loss_fn = loss_fn
    return step


def make_gmd_valid_step(model, params: Dict[str, Any],
                        lg_frame2sec: bool = False, assembler=None):
    """The reference's valid(): full pair forward without dropout, losses
    minus the discriminator term, plus decoded spans for the submit file
    (train.py:209-318)."""
    m1 = float(params['loss_m1_lambda'])
    m2 = float(params['loss_m2_lambda'])

    def valid_step(p, batch, key):
        if assembler is not None:
            batch = assembler(batch)
        pseudo_feat, pseudo_framestps, pmasks = gt_translate_batch(
            key, batch['video_feat'], batch['framestps'], batch['nfeats'])
        out = model.apply(
            {'params': p},
            batch['sent_feat'], batch['sent_mask'],
            batch['video_feat'], batch['video_mask'],
            pseudo_feat, pmasks['video_mask'],
            batch['temporal_labels'], batch['fore_masks'], batch['back_masks'],
            pmasks['temporal_labels'], pmasks['fore_masks'], pmasks['back_masks'])
        loss_g = span_ground_loss(out['start_prob'], out['end_prob'],
                                  batch['framestps'])
        loss_intra = m1 * (
            bce_loss(out['ori_match_prob'], batch['temporal_labels'],
                     batch['video_mask'])
            + bce_loss(out['pseudo_match_prob'], pmasks['temporal_labels'],
                       pmasks['video_mask']))
        ori_sm = masked_softmax(out['ori_match_prob'], batch['temporal_labels'])
        pse_sm = masked_softmax(out['pseudo_match_prob'],
                                pmasks['temporal_labels'])
        loss_inter = m2 * matching_kl_divergence(
            ori_sm, pse_sm, batch['framestps'], pseudo_framestps)
        loss = loss_g + loss_intra + loss_inter
        pred_f, score, miou = _stats(out['start_prob'], out['end_prob'],
                                     batch, lg_frame2sec)
        return {'loss': loss, 'loss_g': loss_g, 'loss_intra': loss_intra,
                'loss_inter': loss_inter, 'miou': miou,
                'pred_time': pred_f, 'score': score}

    step = JittedStep(valid_step)
    step.cache_token = ('gmd_valid', repr(model), lg_frame2sec,
                        assembler is None, m1, m2)
    return step


# resident bank arrays ride the batch dict but are NOT per-sample — the
# group flattener must pass them through untouched
_BANK_KEYS = ('bank_feats', 'bank_emb', 'bank_scale')


def _flatten_group(gbatch):
    """[G, B, ...]-leaved batch dict -> ([G*B, ...] dict, G, B)."""
    first = next(v for k, v in gbatch.items()
                 if k not in _BANK_KEYS and hasattr(v, 'ndim')
                 and v.ndim >= 2)
    G, B = first.shape[0], first.shape[1]
    flat = {k: (v.reshape((G * B,) + v.shape[2:])
                if k not in _BANK_KEYS and hasattr(v, 'ndim')
                and v.ndim >= 2 else v)
            for k, v in gbatch.items()}
    return flat, G, B


def _regroup(per_sample, G, B):
    """Per-sample [G*B, ...] outputs -> per-batch metrics + [G, B, ...]
    outputs: 'nll'/'iou' mean over each loader batch (exactly the
    per-batch scalars of the ungrouped step), everything else reshapes."""
    res = {'loss': per_sample.pop('nll').reshape(G, B).mean(1),
           'miou': per_sample.pop('iou').reshape(G, B).mean(1)}
    for k, v in per_sample.items():
        res[k] = v.reshape((G, B) + v.shape[1:])
    return res


def make_gmd_test_step(model, lg_frame2sec: bool = False, assembler=None,
                       topk: int = 1, topk_nms_iou: float = 0.5):
    """Single-video inference (test.py:104-124): eval_forward + decode.

    ``topk > 1`` additionally decodes the top-k NMS proposals per sentence
    (beyond parity; the R@1 outputs are unchanged)."""
    from ..ops.losses import span_ground_nll
    from ..ops.span import iou_per_sample

    def per_sample(p, batch):
        if assembler is not None:
            batch = assembler(batch)
        out = model.apply({'params': p}, batch['video_feat'],
                          batch['sent_feat'], batch['video_mask'],
                          batch['sent_mask'], method=model.eval_forward)
        nll = span_ground_nll(out['start_prob'], out['end_prob'],
                              batch['framestps'])
        pred, score = span_decode(out['start_prob'], out['end_prob'])
        pred_f = pred.astype(jnp.float32)
        if lg_frame2sec:
            pred_f = pred_f / batch['nfeats'][:, None].astype(jnp.float32) \
                * batch['duration'][:, None].astype(jnp.float32)
        iou = iou_per_sample(pred_f, batch['timestps'])
        res = {'nll': nll, 'iou': iou, 'pred_time': pred_f, 'score': score}
        if topk > 1:
            res['pred_time_topk'], res['score_topk'] = _topk_stats(
                out['start_prob'], out['end_prob'], batch, lg_frame2sec,
                topk, topk_nms_iou)
        return res

    def test_step(p, batch):
        out = per_sample(p, batch)
        res = {'loss': out.pop('nll').mean(), 'miou': out.pop('iou').mean()}
        res.update(out)
        return res

    def grouped_inner(p, gbatch):
        """[G, B, ...] batches execute as ONE [G*B] model pass (the MXU
        sees the full group; the vmap route kept the Pallas recurrence
        at per-batch width) while per-batch loss/miou stay exact."""
        flat, G, B = _flatten_group(gbatch)
        return _regroup(per_sample(p, flat), G, B)

    step = JittedStep(test_step)
    # semantically-identical steps share cli's module-level epoch-scan
    # cache (repr(model) covers every config field of the flax module;
    # the bank assembler is a staticmethod identical across banks)
    step.cache_token = ('gmd_test', repr(model), lg_frame2sec,
                        assembler is None, topk, topk_nms_iou)
    step.grouped_inner = grouped_inner
    return step


# ---------------------------------------------------------------------------
# Baseline (QAVE): grounding loss only
# ---------------------------------------------------------------------------

def make_baseline_train_step(model, params: Dict[str, Any],
                             lg_frame2sec: bool = False, assembler=None,
                             mesh=None):
    from ..parallel.fsdp import state_constrainer
    constrain = state_constrainer(params, mesh)
    accum = int(params.get('grad_accum_steps', 1) or 1)
    mb_keys = ('video_feat', 'sent_feat', 'video_mask', 'sent_mask',
               'framestps')

    def loss_fn(p, mbatch, _pseudo, k):
        out = model.apply({'params': p}, mbatch['video_feat'],
                          mbatch['sent_feat'], mbatch['video_mask'],
                          mbatch['sent_mask'], deterministic=False,
                          rngs={'dropout': k})
        loss_g = span_ground_loss(out['start_prob'], out['end_prob'],
                                  mbatch['framestps'])
        return loss_g, {'loss': loss_g, 'start_prob': out['start_prob'],
                        'end_prob': out['end_prob']}

    def train_step(state: TrainState, batch, key):
        if assembler is not None:
            batch = assembler(batch)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum > 1:
            grads, aux = _accumulate_grads(grad_fn, state.params, batch,
                                           {}, key, accum, keys=mb_keys)
        else:
            (_, aux), grads = grad_fn(state.params, batch, {}, key)
        state = state.apply_gradients(grads)
        if constrain is not None:  # FSDP: pin the ZeRO-3 placement
            state = constrain(state)
        _, _, miou = _stats(aux.pop('start_prob'), aux.pop('end_prob'),
                            batch, lg_frame2sec)
        return state, {'loss': aux['loss'], 'miou': miou}

    return JittedStep(train_step, donate_argnums=(0,))


def make_baseline_eval_step(model, lg_frame2sec: bool = False,
                            assembler=None, topk: int = 1,
                            topk_nms_iou: float = 0.5):
    from ..ops.losses import span_ground_nll
    from ..ops.span import iou_per_sample

    def per_sample(p, batch):
        if assembler is not None:
            batch = assembler(batch)
        out = model.apply({'params': p}, batch['video_feat'],
                          batch['sent_feat'], batch['video_mask'],
                          batch['sent_mask'])
        nll = span_ground_nll(out['start_prob'], out['end_prob'],
                              batch['framestps'])
        pred, score = span_decode(out['start_prob'], out['end_prob'])
        pred_f = pred.astype(jnp.float32)
        if lg_frame2sec:
            pred_f = pred_f / batch['nfeats'][:, None].astype(jnp.float32) \
                * batch['duration'][:, None].astype(jnp.float32)
        iou = iou_per_sample(pred_f, batch['timestps'])
        res = {'nll': nll, 'iou': iou, 'pred_time': pred_f, 'score': score}
        if topk > 1:
            res['pred_time_topk'], res['score_topk'] = _topk_stats(
                out['start_prob'], out['end_prob'], batch, lg_frame2sec,
                topk, topk_nms_iou)
        return res

    def eval_step(p, batch):
        out = per_sample(p, batch)
        res = {'loss': out.pop('nll').mean(), 'miou': out.pop('iou').mean()}
        res.update(out)
        return res

    def grouped_inner(p, gbatch):
        flat, G, B = _flatten_group(gbatch)
        return _regroup(per_sample(p, flat), G, B)

    step = JittedStep(eval_step)
    step.cache_token = ('baseline_eval', repr(model), lg_frame2sec,
                        assembler is None, topk, topk_nms_iou)
    step.grouped_inner = grouped_inner
    return step
