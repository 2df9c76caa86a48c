"""Config system: argparse-compatible defaults + YAML override merge.

Mirrors the reference's flag surface (reference: grounding/train.py:415-575)
and its merge rule (reference: grounding/util/helper_function.py:21-26 —
YAML values override the argparse/default values; nested dicts merge
recursively; explicit ``null`` values in YAML are ignored).

The seven reference YAML configs parse unchanged through :func:`load_config`.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, Optional

import yaml

# Default parameter namespace, matching the reference argparse defaults
# (reference: grounding/train.py:415-575). Keys and value types are preserved
# so that params.json written by a run is key-compatible with the reference's.
DEFAULTS: Dict[str, Any] = {
    "debug": False,
    # Datasets
    "feature_type": "i3d",
    "vfeat_fn": "raw",
    "cfg": "charades_cd_i3d.yml",
    "train": "charades",
    "valid": "charades",
    "test": "charades",
    "train_data": "../data/Charades/train.json",
    "val_data": "../data/Charades/test.json",
    "test_data": "../data/Charades/test.json",
    "train_featpath": "../data/Charades/i3d_feature",
    "valid_featpath": "../data/Charades/i3d_feature",
    "test_featpath": "../data/Charades/i3d_feature",
    "wordtoix_path": "words/wordtoix.npy",
    "ixtoword_path": "words/ixtoword.npy",
    "word_fts_path": "words/word_glove_fts_init.npy",
    # Data augmentation
    "if_aug": False,
    "aug_percentage": 0.5,
    "aug_mode": "gt_translate",
    # Load & save
    "start_from": None,
    "save_model_interval": 1,
    "batch_log_interval": 50,
    "batch_log_interval_test": 50,
    "test_interval": 1,
    # Training setting
    "batch_size": [32, 28, 64],
    "epoch": 30,
    "num_workers": 1,
    "alias": "test",
    "runs": "runs",
    "gpu_id": -1,  # accepted for CLI parity; ignored on TPU
    # Loss weights
    "loss_disc_lambda": 1.0,
    "loss_m1_lambda": 1.0,
    "loss_m2_lambda": 1.0,
    # Optim / LR
    "optim": "adam",
    "lr_schd": "ms",
    "lr": 1e-3,
    "lr_decay_rate": 0.1,
    "lr_step": [15],
    "momentum": 0.8,
    "weight_decay": 1e-4,
    "grad_clip": False,
    "grad_clip_max": 1.0,
    "group_weight": False,
    # Model
    "model": "QAVE_match",
    "dropout": 0.5,
    # Language
    "sent_encoder": "rnn",
    "sent_embedding_dim": 300,
    "sent_rnn_hiddendim": 256,
    "sent_rnn_layers": 2,
    "sent_rnn_cell": "lstm",
    "sent_len": 20,
    # Video
    "video_encoder": "query_aware_encoder",
    "video_len": 128,
    "video_feature_dim": 1024,
    "video_rnn_hiddendim": 256,
    "video_rnn_layers": 2,
    "video_rnn_cell": "lstm",
    "mask": False,
    # Cross-modal interaction
    "crossmodal": "vs",
    # Span predictor
    "predictor": "mlp",
    "mlp_hidden_dim": 256,
    "span_hidden_dim": 128,
    # Matching (CSMM)
    "m_cross": "concat",
    "m_temp": "none",
    "m_pred": "mlp",
    "m_pred_activ": "relu",
    "m_pred_hidden": 1024,
    # --- TPU-native extensions (absent from the reference; defaulted so that
    # reference YAMLs need no changes) ---
    "precision": "f32",          # "f32" | "bf16" compute dtype
    "seed": 123,
    "data_root": None,            # if set, rewrites ../data/... paths onto it
    "mesh_shape": None,           # e.g. [8] for an 8-way data mesh; None = all devices
    "host_prefetch": 2,           # batches prefetched to device
    "on_device_aug": True,        # pseudo-video permutation inside train_step
    "nan_check_interval": 100,    # unconditional finite-loss watchdog cadence
    "h2d_dtype": "raw",           # 'raw': ship f16 packs as f16 host->device
                                  # (half the H2D bytes); 'f32': legacy upcast
    "device_bank": True,          # keep packed features resident in HBM and
                                  # gather on device (index-only H2D batches)
    "device_bank_max_gb": 8.0,    # HBM budget for the resident pack
    "device_bank_dtype": "raw",   # 'raw': bank keeps the pack dtype;
                                  # 'bf16': f32 packs stored bf16 (half the
                                  # upload/HBM; gather widened to f32);
                                  # 'int8': per-frame symmetric quant (1/4
                                  # of f32, 1/2 of f16; dequant on device)
    "train_scan_chunk": 16,       # train steps per dispatch in bank mode
                                  # (lax.scan chunk; 1 = per-step dispatch)
    "loss_pseudo_ground_lambda": 0.0,
                                  # >0: add lambda * span grounding loss
                                  # on the PSEUDO stream's translated
                                  # labels (shared span predictor) — the
                                  # stress-study method-floor probe
                                  # (LEARNING.md); 0 = reference loss
    "eval_scan_group": 8,         # loader batches vmapped per epoch-scan
                                  # tick (effective eval batch G*B; the
                                  # parity B=32 underfills the MXU ~8x);
                                  # 1 = one batch per tick; forced 1 on
                                  # multi-host
    "fsdp": False,                # ZeRO-3 state sharding: params + Adam
                                  # moments split over the data axis
                                  # (parallel/fsdp.py; multi-host gathers
                                  # collectively before checkpoint writes)
    "fsdp_min_bytes": 65536,      # leaves below this stay replicated
                                  # (sharding a [512] bias saves nothing
                                  # and costs an all-gather dispatch)
    "multi_seed": 0,              # train S seeds vmapped in ONE jitted
                                  # step (0/1 = off). Per-seed val +
                                  # checkpoints (_s{i}.ckp); excludes
                                  # --fsdp / --start_from
    "pipeline_stages": 0,         # >0: DEEPENED QAVE (nblocks = stages
                                  # + 1) trained with the GPipe micro-
                                  # batch schedule over a 'pipe' mesh
                                  # axis (train/pipelined.py); check-
                                  # points stay sequential-layout so
                                  # test drivers load them unchanged
    "pipeline_microbatches": 4,   # GPipe microbatches per step (bubble
                                  # = (stages-1)/(micro+stages-1));
                                  # batch_size/data-shards must divide
    "tensor_parallel": 0,         # >0: WIDENED GMD (video_rnn_hiddendim
                                  # 512/1024/...) trained with the video
                                  # recurrences hidden-sharded over a
                                  # 'model' mesh axis (train/tp.py);
                                  # state stays sequential/replicated so
                                  # checkpoints/test drivers are
                                  # untouched; excludes --fsdp /
                                  # --pipeline_stages / --multi_seed
    "remat": False,               # jax.checkpoint each QAVE block: the
                                  # backward recomputes activations
                                  # instead of saving them — for large-B
                                  # training past the HBM spill point
                                  # (docs/KERNELS.md B-sweep)
    "grad_accum_steps": 1,        # microbatches per optimizer update
                                  # (lax.scan inside the jitted step:
                                  # activation memory is one micro-
                                  # batch's; batch_size must divide)
    "disc_dropout": 0.5,          # TOD head dropout — the reference
                                  # hardcodes p=0.5 (TemporalOrder-
                                  # Discriminator.py:23); exposed so
                                  # deterministic runs can zero it
    "async_checkpoint": False,    # overlap checkpoint D2H fetch + disk
                                  # write with the next epoch (on-device
                                  # snapshot first — donation-safe;
                                  # utils/saver.AsyncCheckpointer)
    "aug_seg_len": None,          # segment length for shuffle_temporal modes
    "eval_topk": 1,               # >1: test drivers also decode the top-k
                                  # NMS span proposals per sentence into the
                                  # submit file ("timestamps_topk"); the
                                  # evaluator then prints R@k rows below the
                                  # unchanged R@1 table (beyond parity —
                                  # the reference decodes only the argmax
                                  # span, grounding/loss.py:53-70)
    "topk_nms_iou": 0.5,          # greedy-NMS IoU threshold for eval_topk
}


def update_values(dict_from: Dict[str, Any], dict_to: Dict[str, Any]) -> None:
    """Recursive override merge with the reference's semantics: values from
    ``dict_from`` win, except explicit Nones which are ignored."""
    for key, value in dict_from.items():
        if isinstance(value, dict) and isinstance(dict_to.get(key), dict):
            update_values(value, dict_to[key])
        elif value is not None:
            dict_to[key] = value


_DATA_PATH_KEYS = (
    "train_data", "val_data", "test_data",
    "train_featpath", "valid_featpath", "test_featpath",
    "wordtoix_path", "ixtoword_path", "word_fts_path",
)


def resolve_data_paths(params: Dict[str, Any], data_root: Optional[str] = None) -> None:
    """Rewrite the reference's relative ``../data/...`` paths onto a data root.

    The reference is meant to be run from its ``grounding/`` directory with
    annotation/feature paths like ``../data/Charades-CD/...``. To keep those
    YAMLs readable unchanged while running from anywhere, any path that
    contains a ``data/`` segment is re-rooted at ``data_root`` when provided
    (or at $SVTSG_DATA_ROOT).
    """
    root = data_root or params.get("data_root") or os.environ.get("SVTSG_DATA_ROOT")
    if not root:
        return
    for key in _DATA_PATH_KEYS:
        p = params.get(key)
        if not p or os.path.isabs(p):
            continue
        norm = p.replace("\\", "/")
        if "data/" in norm:
            suffix = norm.split("data/", 1)[1]
            params[key] = os.path.join(root, suffix)
    params["data_root"] = root


def find_cfg_file(cfg: str) -> str:
    """Locate a config file: absolute path, cwd, repo cfgs/, or reference cfgs."""
    candidates = [
        cfg,
        os.path.join("cfgs", cfg),
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "cfgs", cfg),
    ]
    ref_cfgs = os.environ.get("SVTSG_REF_CFGS", "/root/reference/grounding/cfgs")
    candidates.append(os.path.join(ref_cfgs, cfg))
    for c in candidates:
        if os.path.isfile(c):
            return c
    raise FileNotFoundError(f"config file not found: {cfg} (searched {candidates})")


def load_config(cfg: Optional[str] = None,
                overrides: Optional[Dict[str, Any]] = None,
                data_root: Optional[str] = None) -> Dict[str, Any]:
    """Build the merged parameter dict.

    Merge order mirrors the reference driver (grounding/train.py:576-583):
    defaults (= argparse values) first, then YAML wins. ``overrides`` are
    applied after YAML, standing in for values the user typed explicitly.
    """
    params = copy.deepcopy(DEFAULTS)
    if cfg:
        path = find_cfg_file(cfg)
        with open(path, "r") as handle:
            options_yaml = yaml.safe_load(handle) or {}
        update_values(options_yaml, params)
        params["cfg"] = cfg
    if overrides:
        update_values(overrides, params)
    resolve_data_paths(params, data_root)
    return params
