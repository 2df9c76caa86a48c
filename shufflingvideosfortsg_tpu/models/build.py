"""Model construction from the flat parameter namespace (the reference's
constract_model, grounding/train.py:44-104, keyed by the same params)."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from .baseline import Baseline
from .gmd import GMD


def _dtype(params: Dict[str, Any]):
    return jnp.bfloat16 if str(params.get('precision', 'f32')).lower() in (
        'bf16', 'bfloat16') else jnp.float32


def _fused(params: Dict[str, Any], inference: bool):
    """Pallas recurrence mode: 'eval' kernel for inference builds,
    custom-VJP 'train' kernel for training builds (both TPU-only; the
    module falls back to lax.scan per-shape when over VMEM budget)."""
    mode = params.get('fused_inference', 'auto')
    if mode == 'auto':
        import jax
        if jax.default_backend() != 'tpu':
            return False
        return 'eval' if inference else 'train'
    if not mode:
        return False
    return 'eval' if inference else 'train'


def model_config_from_params(params: Dict[str, Any],
                             inference: bool = False) -> Dict[str, Any]:
    return dict(
        fused_inference=_fused(params, inference),
        sent_hidden=params['sent_rnn_hiddendim'],
        sent_layers=params['sent_rnn_layers'],
        video_encoder_name=params['video_encoder'],
        video_hidden=params['video_rnn_hiddendim'],
        video_layers=params['video_rnn_layers'],
        # 2 is hardcoded in the reference driver (train.py:60); the
        # pipeline_stages depth-scaling config deepens the stack and
        # trains it with the GPipe schedule (train/pipelined.py)
        nblocks=(int(params.get('pipeline_stages') or 0) + 1
                 if params.get('pipeline_stages') else 2),
        cross_name=params['crossmodal'],
        predictor_name=params['predictor'],
        mlp_hidden_dim=params['mlp_hidden_dim'],
        span_hidden_dim=params['span_hidden_dim'],
        video_if_mask=bool(params['mask']),
        remat=bool(params.get('remat', False)),
        dropout=params['dropout'],
        dtype=_dtype(params),
    )


def build_model(params: Dict[str, Any], kind: str = 'gmd',
                inference: bool = False):
    cfg = model_config_from_params(params, inference)
    if kind.lower() in ('gmd', 'qave_match'):
        return GMD(
            m_temp=params['m_temp'],
            m_temp_hidden=256,  # fixed in the reference driver (train.py:85)
            m_temp_layers=2,
            m_pred_hidden=params['m_pred_hidden'],
            m_pred_activ=params['m_pred_activ'],
            disc_dropout=float(params.get('disc_dropout', 0.5)),
            pseudo_ground=float(
                params.get('loss_pseudo_ground_lambda', 0) or 0) > 0,
            **cfg)
    if kind.lower() in ('baseline', 'qave'):
        return Baseline(**cfg)
    raise ValueError(f'unknown model kind: {kind}')
