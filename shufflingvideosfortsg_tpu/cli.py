"""Driver logic for the four CLI entry points.

CLI surface parity with the reference (grounding/train.py:415-575 etc.):
same flags, same YAML merge, same run-dir/params.json/submit/checkpoint
naming, same printed statistics. ``--gpu_id`` is accepted and ignored
(device selection is JAX's job on TPU).
"""

from __future__ import annotations

import argparse
import functools
import json
import logging
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

# Optional platform override for local smokes (SVTSG_PLATFORM=cpu ...);
# must land before any JAX backend initializes. Plain env vars are too late
# here because the TPU-tunnel sitecustomize imports jax at interpreter start.
if os.environ.get('SVTSG_PLATFORM'):
    jax.config.update('jax_platforms', os.environ['SVTSG_PLATFORM'])

from .utils.cache import enable_compilation_cache
enable_compilation_cache()

from .config import DEFAULTS, load_config
from .data.device_bank import maybe_device_bank
from .data.pipeline import BatchLoader, SentenceGroundingDataset
from .eval.iou import retrieval_eval
from .models import build_model
from .parallel.mesh import (OutputAccumulator, create_mesh, device_prefetch,
                            replicate_tree, shard_batch)
from .train.state import create_train_state, make_optimizer
from .train.steps import (JittedStep, make_baseline_eval_step,
                          make_baseline_train_step, make_gmd_test_step,
                          make_gmd_train_step, make_gmd_valid_step)
from .utils.saver import (RunManager, latest_checkpoint, load_checkpoint,
                          restore_train_state)


# ---------------------------------------------------------------------------
# argparse surface
# ---------------------------------------------------------------------------

def build_argparser(default_model: str = 'QAVE_match',
                    suppress: bool = False) -> argparse.ArgumentParser:
    """Argparse surface mirroring the reference flags.

    With ``suppress=True`` every default becomes ``argparse.SUPPRESS`` so the
    parsed namespace contains exactly the flags the user actually typed —
    this is how :func:`parse_params` tracks explicit-flag presence.
    """
    p = argparse.ArgumentParser()
    for key, value in DEFAULTS.items():
        flag = '--' + key
        if key == 'model':
            default = argparse.SUPPRESS if suppress else default_model
            p.add_argument(flag, type=str, default=default)
            continue
        default = argparse.SUPPRESS if suppress else value
        if isinstance(value, bool):
            p.add_argument(flag, action='store_true', default=default)
        elif isinstance(value, list):
            p.add_argument(flag, type=int, nargs='+', default=default)
        elif isinstance(value, int):
            p.add_argument(flag, type=int, default=default)
        elif isinstance(value, float):
            p.add_argument(flag, type=float, default=default)
        else:
            p.add_argument(flag, type=str, default=default)
    return p


def parse_params(argv=None, default_model: str = 'QAVE_match') -> Dict[str, Any]:
    """Merge defaults < YAML < explicitly-typed CLI flags.

    The reference lets YAML win over argparse unconditionally
    (grounding/train.py:579-583); here an *explicitly typed* flag wins over
    YAML even when its value equals the argparse default (e.g.
    ``--epoch 30`` against a YAML ``epoch: 25`` trains 30). Presence is
    tracked with a second SUPPRESS-defaults parse, not value comparison.
    """
    parser = build_argparser(default_model)
    args = vars(parser.parse_args(argv))
    explicit = vars(build_argparser(default_model, suppress=True)
                    .parse_args(argv))
    cfg = args.pop('cfg', None)
    explicit.pop('cfg', None)
    params = load_config(cfg, overrides=None)
    model = explicit.pop('model', None)
    for k, v in explicit.items():
        if k in DEFAULTS:
            params[k] = v
    # no reference YAML sets `model`; the per-driver default decides GMD vs
    # baseline unless the user overrides it explicitly
    params['model'] = model if model is not None else default_model
    params['cfg'] = cfg
    return params


def setup_logger(alias: str) -> logging.Logger:
    logging.basicConfig()
    logger = logging.getLogger(alias)
    logger.setLevel(logging.INFO)
    return logger


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------

def _dataset_kind(name: str) -> str:
    if name in ('charades', 'charades_cd'):
        return 'charades'
    if name in ('anet', 'anet_cd'):
        return 'anet'
    raise AssertionError('Error datasetname' + name)


def make_dataset(params, anno_key: str, feat_key: str, kind_key: str):
    kind = _dataset_kind(params[kind_key])
    ds = SentenceGroundingDataset(params[anno_key], params[feat_key],
                                  params, dataset_name=kind)
    if params.get('debug'):
        ds.samples = ds.samples[:4 * params['batch_size'][0]]
    return ds


def init_model_params(model, params, key, kind: str):
    B = 2
    T, N = params['video_len'], params['sent_len']
    Dv = params['video_feature_dim']
    video = np.zeros((B, T, Dv), np.float32)
    sent = np.zeros((B, N, 300), np.float32)
    m_t = np.ones((B, T), np.int32)
    m_n = np.ones((B, N), np.int32)
    # jit the init: eager init issues thousands of single-op dispatches,
    # which is pathologically slow through a remote-TPU relay
    if kind == 'gmd':
        variables = jax.jit(model.init)(key, sent, m_n, video, m_t, video,
                                        m_t, m_t, m_t, m_t, m_t, m_t, m_t)
    else:
        variables = jax.jit(model.init)(key, video, sent, m_t, m_n)
    return variables['params']


def _collect_predictions(pred_dict, batch, pred_time, score,
                         pred_topk=None, score_topk=None):
    n = batch['n_valid']
    # bulk ndarray->list conversion (one C-level pass per array) — the
    # per-row .tolist() calls were ~40% of the warm driver's loop time
    # at 2,000 sentences
    pt_l = np.asarray(pred_time).tolist()
    ts_l = np.asarray(batch['timestps']).tolist()
    sc_l = np.asarray(score, np.float64).tolist()
    dur_l = np.asarray(batch['duration'], np.float64).tolist()
    results = pred_dict['results']
    for i in range(n):
        vid = batch['vid'][i]
        entry = {
            'sentence': batch['sentence'][i],
            'timestamp': pt_l[i],
            'gt_timestamp': ts_l[i],
            'score': sc_l[i],
            'video_duration': dur_l[i],
        }
        if pred_topk is not None:
            # beyond-parity R@k proposals (eval_topk > 1); finite-score
            # rows only — NMS pads an exhausted pool with -inf repeats
            keep = np.isfinite(np.asarray(score_topk[i]))
            entry['timestamps_topk'] = np.asarray(pred_topk[i])[keep].tolist()
            entry['scores_topk'] = np.asarray(score_topk[i])[keep].tolist()
        results.setdefault(vid, []).append(entry)


def _new_pred_dict(params):
    return {'version': 'V0', 'results': {},
            'external_data': {'used': True, 'details': 'provided i3D feature'},
            'params': params}


def _avg(metrics_list, key):
    return float(np.mean([float(m[key]) for m in metrics_list]))


def _loader_kwargs():
    """Multi-host data parallelism: each process loads a disjoint 1/Nth
    stripe of the identically-seeded global shuffle (SURVEY §5 contract);
    shard_batch assembles the stripes into global arrays."""
    return dict(process_index=jax.process_index(),
                process_count=jax.process_count())


def _is_proc0() -> bool:
    return jax.process_index() == 0


def _submit_key(base: str) -> str:
    """Per-host submit shard name on multi-host runs (each host holds a
    disjoint stripe of predictions); tools/merge_submits.py recombines."""
    if jax.process_count() > 1:
        return f'{base}.part{jax.process_index()}'
    return base


class _PhaseTimer:
    """Wall-clock attribution of a driver run's phases. ``mark(name)``
    charges the time since the previous mark to ``name``; ``line()``
    renders one log line. Used by the test drivers to attribute their
    fixed (non-loop) cost — the round-4 soak showed the whole-driver
    wall dominated by ~2.5 s of unattributed host work at small corpus
    sizes (VERDICT r4 missing #1)."""

    def __init__(self):
        self.t = time.perf_counter()
        self.phases: Dict[str, float] = {}

    def mark(self, name: str) -> None:
        now = time.perf_counter()
        self.phases[name] = self.phases.get(name, 0.0) + (now - self.t)
        self.t = now

    def line(self) -> str:
        total = sum(self.phases.values())
        parts = ' '.join(f'{k}={v:.3f}s' for k, v in self.phases.items())
        return f'driver phases ({total:.3f}s total): {parts}'


def _write_metrics_json(submit: str, metrics: Dict[str, float]) -> str:
    """Persist the test drivers' retrieval_eval table beside the submit
    file (<submit>.metrics.json) so downstream tooling (tools/
    run_learning.py) reads the scores instead of re-scoring the JSON."""
    path = submit + '.metrics.json'
    with open(path, 'w') as f:
        json.dump(metrics, f)
    return path



def _place_state(state, mesh, params, logger):
    """Train-state placement: replicated (default) or ZeRO-3 sharded over
    the data axis (``fsdp: true`` / ``--fsdp``; parallel/fsdp.py). Under
    multi-host every process assembles its local shards from its own host
    copy of the (identical) full state."""
    if params.get('fsdp'):
        from .parallel.fsdp import (FSDP_MIN_BYTES, resident_state_bytes,
                                    shard_train_state)
        state = shard_train_state(
            state, mesh,
            min_bytes=params.get('fsdp_min_bytes', FSDP_MIN_BYTES))
        logger.info('fsdp: train state ZeRO-3-sharded over %d devices '
                    '(%.1f MiB resident per device)', mesh.devices.size,
                    resident_state_bytes(state) / 2**20)
        return state
    return replicate_tree(mesh, state)


def _saveable_state(state):
    """A state jax.device_get can fetch. Multi-host FSDP shards are not
    fully addressable, so replicate them first — gather_state is a
    COLLECTIVE: every process must reach this call, only process 0
    writes the file afterwards. Pipelined states convert back to the
    sequential block1..k layout so checkpoints stay interchangeable with
    every other driver (and the reference exporter)."""
    from .parallel.fsdp import gather_state, needs_gather
    from .train.pipelined import is_pipelined_tree, to_sequential_state
    if is_pipelined_tree(state.params):
        state = to_sequential_state(state)
    return gather_state(state) if needs_gather(state) else state


def _check_finite(metrics, state, saver, key, logger, epoch, idx):
    """Failure detection: a non-finite loss aborts with an emergency
    checkpoint instead of silently corrupting the run (the reference had
    no failure handling at all — SURVEY.md §5). Every process calls this
    on the same psum-reduced metrics, so the gather inside
    _saveable_state stays collectively consistent."""
    loss = float(metrics['loss'])
    if np.isfinite(loss):
        return
    path = saver.model_path(99999)
    saver.save_checkpoint(path, _saveable_state(state), key, sync=True)
    logger.error('non-finite loss %s at epoch %d batch %d; emergency '
                 'checkpoint saved to %s', loss, epoch, idx, path)
    raise FloatingPointError(f'non-finite loss at epoch {epoch} batch {idx}')


def _multiseed_validate(params) -> int:
    """Check --multi_seed combinations up front (called by the train
    mains BEFORE any checkpoint is touched, so the error beats a
    missing-file one). Returns S (0/1 = off)."""
    S = int(params.get('multi_seed', 0) or 0)
    if S <= 1:
        return S
    if params.get('fsdp'):
        raise ValueError('--multi_seed does not compose with --fsdp: the '
                         'stacked seed axis changes every leaf shape the '
                         'ZeRO-3 placement rule keys on')
    if params.get('start_from'):
        raise ValueError('--multi_seed cannot resume (--start_from): '
                         'checkpoints are written per seed; restart the '
                         'study or train the single seed you want')
    return S


def _multiseed_setup(params, state, train_step, init_fn, tx, logger):
    """``--multi_seed S``: train S independent seeds vmapped inside ONE
    jitted step (train/multiseed.py). Seed 0 keeps the single-seed run's
    init key (fold_in(init_key, 0) is NOT used — the unstacked run and
    seed 0 are the same model); seeds 1..S-1 fold their index into the
    init key. The wrapped step keeps the single-seed (state, batch, key)
    -> (state, scalar-metrics) contract by seed-MEANING the metrics, so
    the chunked-scan path, logging, and the NaN watchdog (a NaN in any
    seed propagates through the mean) all compose untouched. Per-seed
    numbers surface where they matter: validation and checkpoints.

    Returns (state, train_step, S) with S == 0 when off."""
    S = _multiseed_validate(params)
    if S <= 1:
        return state, train_step, 0
    import jax.numpy as jnp
    from .train.multiseed import make_multiseed_train_step, stack_states
    states = [state] + [create_train_state(init_fn(i), tx)
                        for i in range(1, S)]
    state = stack_states(states)
    inner = make_multiseed_train_step(train_step, S).inner

    def mean_step(st, batch, key):
        st, m = inner(st, batch, key)
        return st, {k: jnp.mean(v, axis=0) for k, v in m.items()}

    logger.info('multi-seed: %d seeds stacked, one vmapped train step; '
                'validation and checkpoints run per seed', S)
    return state, JittedStep(mean_step, donate_argnums=(0,)), S


def _multiseed_save(saver, saveable, step_epoch, key, logger, n_seeds):
    """Per-seed checkpoint slices: alias_EEEEE_s{i}.ckp, each loadable by
    the test drivers' --start_from."""
    from .train.multiseed import unstack_state
    for i in range(n_seeds):
        path = saver.model_path(step_epoch).replace('.ckp', f'_s{i}.ckp')
        saver.save_checkpoint(path, unstack_state(saveable, i), key)
        logger.info('Save model in %s', path)


# ---------------------------------------------------------------------------
# GMD training driver (train.py)
# ---------------------------------------------------------------------------

# module-level epoch-scan cache for steps carrying a cache_token (see
# _banked_eval_epoch): {token: {attr: jitted epoch closure}}
_EPOCH_SCAN_CACHE: Dict[Any, Dict[Any, Any]] = {}

# device-resident checkpoint cache for the test drivers: shipping a 55 MB
# f32 param tree over the ~45 MB/s relay link costs ~1.2 s per
# invocation — the single largest fixed cost of a warm eval after the
# bank is resident. Sweeps that evaluate one checkpoint on several
# splits (tools/run_learning.py; the soak protocol's warm pass) reuse
# the uploaded copy. Keyed by (path, mtime, size, devices); small LRU so
# a many-checkpoint sweep cannot accumulate HBM.
_CKPT_DEVICE_CACHE: Dict[Any, Any] = {}
_CKPT_DEVICE_CACHE_MAX = 4


def _load_checkpoint_device(path: str, mesh, torch_kwargs, logger):
    """Load + replicate checkpoint params, device-cached per process."""
    st = os.stat(path)
    key = (os.path.abspath(path), st.st_mtime_ns, st.st_size,
           tuple(d.id for d in mesh.devices.flat))
    hit = _CKPT_DEVICE_CACHE.pop(key, None)
    if hit is not None:
        _CKPT_DEVICE_CACHE[key] = hit  # re-insert: LRU recency
        logger.warning('use checkpoint: %s (device-cached)', path)
        return hit
    payload, is_ref = load_checkpoint(path, torch_convert_kwargs=torch_kwargs)
    dev = replicate_tree(mesh, payload['params'])
    _CKPT_DEVICE_CACHE[key] = dev
    while len(_CKPT_DEVICE_CACHE) > _CKPT_DEVICE_CACHE_MAX:
        _CKPT_DEVICE_CACHE.pop(next(iter(_CKPT_DEVICE_CACHE)))
    logger.warning('use checkpoint: %s (reference-format=%s)', path, is_ref)
    return dev


def _banked_eval_epoch(step, model_params, host_batches, bank, mesh,
                       keys=None, timer=None, group: int = 1):
    """Run a whole eval epoch as ONE jitted lax.scan over device-resident
    stacked index batches (device-bank mode, single process).

    The per-batch loop paid a dispatch + ~10 small H2D transfers per batch
    through the remote relay (~0.4 s/batch of pure overhead at B=32); here
    the stacked index arrays upload once (~7 transfers for the whole
    split), the scan executes every batch on device, and the outputs fetch
    once. ``keys`` (one PRNG key per batch) threads the valid step's
    on-device pseudo-video draws.

    ``group`` > 1 vmaps G loader batches per scan step (effective batch
    G*B): the driver's reference-parity B=32 underfills the MXU badly —
    the recurrence is latency-bound — so executing 8 batches per tick
    approaches the B=256 device-resident throughput while per-batch
    metrics/outputs keep their exact per-batch shapes (vmap semantics).
    The epoch pads to a multiple of G by repeating the last stacked batch
    and slices the outputs back.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .parallel.mesh import DATA_AXIS, replicated_sharding

    def mark(name):
        if timer is not None:
            timer.mark(name)

    arrays = {}
    for k in host_batches[0]:
        if k in ('vid', 'sentence', 'n_valid'):
            continue
        arrays[k] = np.stack([np.asarray(b[k]) for b in host_batches])
    n_real = len(host_batches)
    if jax.process_count() > 1:
        group = 1  # multi-host stripes assemble along the batch axis
    group = max(1, min(int(group), n_real))
    if group > 1:
        pad = -n_real % group
        if pad:
            arrays = {k: np.concatenate(
                [v, np.repeat(v[-1:], pad, axis=0)]) for k, v in
                arrays.items()}
            if keys is not None:
                keys = jax.numpy.concatenate(
                    [keys, jax.numpy.repeat(keys[-1:], pad, axis=0)])
        arrays = {k: v.reshape((v.shape[0] // group, group) + v.shape[1:])
                  for k, v in arrays.items()}
        if keys is not None:
            keys = keys.reshape((keys.shape[0] // group, group)
                                + keys.shape[1:])
    mark('eval_stack')
    batch_spec = P(None, DATA_AXIS) if group == 1 \
        else P(None, None, DATA_AXIS)
    sharding = NamedSharding(mesh, batch_spec)
    multihost = jax.process_count() > 1
    if multihost:
        # each host stacked its own loader stripe (equal batch counts by
        # BatchLoader's stripe equalization); assemble global arrays
        dev = {k: jax.make_array_from_process_local_data(sharding, v)
               for k, v in arrays.items()}
    else:
        dev = {k: jax.device_put(v, sharding) for k, v in arrays.items()}
    mark('eval_upload')
    inner = step.inner

    # the jitted epoch closure is cached: a fresh closure per call would
    # RETRACE (and remote-recompile) the whole scan on every validation
    # epoch of a training run. The cache key includes batch count +
    # shapes so a second loader with a different epoch geometry on the
    # same step gets its own entry instead of a silent retrace of the
    # shared one. Steps that carry a ``cache_token`` (a value equal for
    # semantically identical steps — model config + decode options) share
    # a MODULE-LEVEL cache, so a second driver invocation in the same
    # process (run_learning sweeps, the soak protocol's warm pass) reuses
    # the already-traced-and-compiled epoch instead of paying ~1s of
    # retrace + compile-cache load for a new-but-identical step object;
    # tokenless steps keep the per-object cache.
    shape_key = tuple(sorted((k, v.shape, str(v.dtype))
                             for k, v in arrays.items()))
    bank_key = (bank.feats.shape, str(bank.feats.dtype),
                bank.embeddings.shape, bank.scales is None)
    attr = ('_epoch_scan' if keys is None else '_epoch_scan_keys',
            shape_key, bank_key, multihost)
    token = getattr(step, 'cache_token', None)
    if token is not None:
        cache = _EPOCH_SCAN_CACHE.setdefault(token, {})
    else:
        cache = getattr(step, '_epoch_scan_cache', None)
        if cache is None:
            cache = {}
            step._epoch_scan_cache = cache
    epoch = cache.get(attr)
    if epoch is None:
        # multi-host: replicate outputs so every host can fetch them (the
        # per-sample rows are sliced back to the local stripe below) — an
        # all-gather of a few hundred KB once per epoch
        jit_kw = dict(out_shardings=replicated_sharding(mesh)) \
            if multihost else {}

        grouped = getattr(step, 'grouped_inner', None)

        def run_one(p, b, kk, feats, emb, scales):
            b = dict(b)
            b['bank_feats'] = feats
            b['bank_emb'] = emb
            if scales is not None:  # int8 bank tier
                b['bank_scale'] = scales
            return inner(p, b) if kk is None else inner(p, b, kk)

        def run_group(p, b, kk, feats, emb, scales):
            # steps that expose a grouped body execute the G batches as
            # ONE [G*B] model pass (full MXU width; per-batch metrics
            # exact); keyed steps and tokenless steps fall back to vmap
            if grouped is not None and kk is None:
                b = dict(b)
                b['bank_feats'] = feats
                b['bank_emb'] = emb
                if scales is not None:
                    b['bank_scale'] = scales
                return grouped(p, b)
            if kk is None:
                return jax.vmap(
                    lambda bb: run_one(p, bb, None, feats, emb, scales))(b)
            return jax.vmap(
                lambda bb, k2: run_one(p, bb, k2, feats, emb, scales)
            )(b, kk)

        if keys is None:
            @functools.partial(jax.jit, **jit_kw)
            def epoch(p, batches, feats, emb, scales):
                def body(_, b):
                    if group > 1:
                        return None, run_group(p, b, None, feats, emb,
                                               scales)
                    return None, run_one(p, b, None, feats, emb, scales)
                return jax.lax.scan(body, None, batches)[1]
        else:
            @functools.partial(jax.jit, **jit_kw)
            def epoch(p, batches, ks, feats, emb, scales):
                def body(_, xs):
                    b, kk = xs
                    if group > 1:
                        return None, run_group(p, b, kk, feats, emb,
                                               scales)
                    return None, run_one(p, b, kk, feats, emb, scales)
                return jax.lax.scan(body, None, (batches, ks))[1]
        cache[attr] = epoch
    mark('eval_build')
    if keys is None:
        outs = epoch(model_params, dev, bank.feats, bank.embeddings,
                     bank.scales)
    else:
        outs = epoch(model_params, dev, keys, bank.feats, bank.embeddings,
                     bank.scales)
    # ONE batched D2H transfer: a per-key np.asarray loop serializes a
    # relay round trip per output (~97 ms for 4 outputs vs ~27 ms
    # batched — measured round 5)
    fetched = jax.device_get(outs)
    if group > 1:
        # [n/G, G, ...] -> [n_padded, ...] -> drop the repeated-pad tail
        fetched = {k: v.reshape((-1,) + v.shape[2:])[:n_real]
                   for k, v in fetched.items()}
    mark('eval_exec')
    if multihost:
        # keep this host's stripe of per-sample outputs so indices line up
        # with the local host_batches (assembly was process-major)
        b_local = next(iter(arrays.values())).shape[1]
        b_global = b_local * jax.process_count()
        lo = jax.process_index() * b_local
        for k, v in fetched.items():
            if v.ndim >= 2 and v.shape[1] == b_global:
                fetched[k] = v[:, lo:lo + b_local]
    return fetched


def _log_eval_batches(logger, tag, fetched, n_batches, interval, mean_dt):
    if interval == -1:
        return
    for idx in range(0, n_batches, interval):
        logger.info('%s: epoch[%03d], batch[%04d/%04d], elapsed '
                    'time=%0.2fs, loss: %03.3f, miou: %03.3f', tag, 0, idx,
                    n_batches, mean_dt, float(fetched['loss'][idx]),
                    float(fetched['miou'][idx]))


def _banked_train_chunks_factory(train_step, bank, mesh):
    """Chunked scan training for device-bank mode: K train steps per
    dispatch. The per-step path pays a dispatch + H2D of the index batch
    per step (~11 ms of overhead against ~6 ms of compute at B=32);
    scanning K steps amortizes that to one dispatch per chunk. The PRNG
    key is carried and split inside the scan exactly like the host loop
    (key, sk = split(key) per step), so the chunked path consumes the
    SAME key stream and reproduces the per-step run bit-for-bit
    (tests/test_train_scan.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .parallel.mesh import DATA_AXIS
    inner = train_step.inner
    sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    multihost = jax.process_count() > 1

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_chunk(state, key, batches, feats, emb, scales):
        def body(carry, b):
            st, k = carry
            k, sk = jax.random.split(k)
            b = dict(b)
            b['bank_feats'] = feats
            b['bank_emb'] = emb
            if scales is not None:  # int8 bank tier
                b['bank_scale'] = scales
            st, m = inner(st, b, sk)
            return (st, k), m
        (state, key), ms = jax.lax.scan(body, (state, key), batches)
        # chunk-mean metrics: the epoch average and the log lines only
        # need means; per-step values would be a [K]-fetch for nothing
        return state, key, jax.tree.map(lambda a: a.mean(0), ms)

    def run(state, key, host_chunk):
        arrays = {}
        for k in host_chunk[0]:
            if k in ('vid', 'sentence', 'n_valid'):
                continue
            arrays[k] = np.stack([np.asarray(b[k]) for b in host_chunk])
        if multihost:
            # per-host stripes assemble into global [K, B_global, ...]
            # arrays; every host runs the same chunk boundaries (stripe
            # lengths are equalized by the loader), so the lockstep scan
            # dispatches and XLA's gradient all-reduces line up
            dev = {k: jax.make_array_from_process_local_data(sharding, v)
                   for k, v in arrays.items()}
        else:
            dev = {k: jax.device_put(v, sharding) for k, v in arrays.items()}
        return run_chunk(state, key, dev, bank.feats, bank.embeddings,
                         bank.scales)

    return run


def _start_trace_if_requested() -> bool:
    """SVTSG_TRACE_DIR=<dir> captures a jax.profiler (TensorBoard) trace of
    the whole driver run; meant for short profiling runs (--epoch 1
    --debug). Returns whether a trace was started."""
    d = os.environ.get('SVTSG_TRACE_DIR')
    if not d:
        return False
    jax.profiler.start_trace(d)
    return True


def _stop_trace(started: bool) -> None:
    if started:
        jax.profiler.stop_trace()


def _resolve_auto_resume(params) -> Tuple[bool, int]:
    """Handle ``--start_from auto``: resolve the newest checkpoint of this
    alias's own run dir (crash recovery / preemption restart). Returns
    (allow_existing_run_dir, start_epoch). With no checkpoint yet the run
    starts fresh at epoch 0 (reusing the dir if it exists)."""
    if str(params.get('start_from') or '').lower() != 'auto':
        return False, 0
    model_dir = os.path.join(params['runs'], params['alias'], 'model')
    found = latest_checkpoint(model_dir)
    if found is None:
        params['start_from'] = None
        return os.path.isdir(os.path.dirname(model_dir)), 0
    params['start_from'] = found[0]
    return True, found[1] + 1


def _eval_epoch(step, model_params, loader, bank, mesh, key=None,
                timer=None, group: int = 1):
    """One eval pass over ``loader``: (host_batches, fetched outputs).

    Device-bank single-process runs use the whole-epoch scan
    (_banked_eval_epoch); everything else enqueues per batch into an
    OutputAccumulator and fetches once. ``key`` threads per-batch PRNG
    keys (valid steps' on-device pseudo draws).
    """
    if bank is not None:
        host_batches = list(loader)
        keys = None
        if key is not None:
            # iterate the SAME split chain as the per-batch path (key, sk =
            # split(key) per batch) so banked and host-mode validation
            # pseudo draws are bit-identical
            sks = []
            for _ in host_batches:
                key, sk = jax.random.split(key)
                sks.append(sk)
            keys = jax.numpy.stack(sks)
        return host_batches, _banked_eval_epoch(step, model_params,
                                                host_batches, bank, mesh,
                                                keys=keys, timer=timer,
                                                group=group)
    host_batches = []
    acc = OutputAccumulator(len(loader))
    for batch in loader:
        sb = shard_batch(mesh, batch, bank)
        host_batches.append(batch)
        if key is None:
            acc.append(step(model_params, sb))
        else:
            key, sk = jax.random.split(key)
            acc.append(step(model_params, sb, sk))
    return host_batches, acc.fetch()


def _pipeline_validate(params) -> int:
    """Check --pipeline_stages combinations up front. Returns the stage
    count (0 = off)."""
    pp = int(params.get('pipeline_stages') or 0)
    if pp <= 0:
        return 0
    if params.get('fsdp'):
        raise ValueError('--pipeline_stages does not compose with --fsdp: '
                         'stage weights already shard over the pipe axis')
    if int(params.get('multi_seed', 0) or 0) > 1:
        raise ValueError('--pipeline_stages does not compose with '
                         '--multi_seed: the stacked seed axis and the '
                         'stacked stage axis both claim leaf axis 0')
    if int(params.get('tensor_parallel', 0) or 0) > 1:
        raise ValueError('--pipeline_stages does not compose with '
                         '--tensor_parallel: both claim the non-data mesh '
                         'axis (depth-shard OR width-shard, not both)')
    if params.get('remat'):
        # the GPipe path builds its stage blocks outside the flax module,
        # so the QAVE nn.remat wrapper never applies; be loud instead of
        # silently dropping the activation-checkpointing request
        logging.getLogger(__name__).warning(
            '--remat is ignored with --pipeline_stages: the pipelined '
            'stage blocks run outside the nn.remat wrapper (microbatch '
            'activations are already one-microbatch-sized)')
    n_dev = len(jax.devices())
    if n_dev % pp:
        raise ValueError(f'--pipeline_stages={pp} needs a device count '
                         f'divisible by it (have {n_dev})')
    return pp


def _tp_validate(params) -> int:
    """Check --tensor_parallel combinations up front. Returns the model-
    axis width (0 = off)."""
    tp = int(params.get('tensor_parallel', 0) or 0)
    if tp <= 1:
        return 0
    if params.get('fsdp'):
        raise ValueError('--tensor_parallel does not compose with --fsdp: '
                         'TP keeps the state replicated by design (its '
                         'axis shards recurrence compute/activations); '
                         'ZeRO-3 placement would fight that layout')
    if int(params.get('multi_seed', 0) or 0) > 1:
        raise ValueError('--tensor_parallel does not compose with '
                         '--multi_seed: the vmapped seed axis cannot wrap '
                         'the shard_map-ped recurrence')
    n_dev = len(jax.devices())
    if n_dev % tp:
        raise ValueError(f'--tensor_parallel={tp} needs a device count '
                         f'divisible by it (have {n_dev})')
    H = int(params['video_rnn_hiddendim'])
    if H % tp:
        raise ValueError(f'--tensor_parallel={tp} must divide '
                         f'video_rnn_hiddendim ({H})')
    return tp


def main_train(params: Dict[str, Any]) -> Dict[str, Any]:
    logger = setup_logger(params['alias'])
    _multiseed_validate(params)
    pp_stages = _pipeline_validate(params)
    tp_width = _tp_validate(params)
    allow_existing, start_epoch = _resolve_auto_resume(params)
    saver = RunManager(params, allow_existing=allow_existing)
    if pp_stages:
        from .parallel.pipeline import create_pp_mesh
        mesh = create_pp_mesh(len(jax.devices()) // pp_stages, pp_stages)
        logger.info('pipeline parallelism: %d stages (nblocks=%d) on a '
                    '%s mesh, %d microbatches/step', pp_stages,
                    pp_stages + 1, dict(mesh.shape),
                    int(params.get('pipeline_microbatches', 4)))
    elif tp_width:
        from .parallel.tensor_parallel import create_tp_mesh
        mesh = create_tp_mesh(len(jax.devices()) // tp_width, tp_width)
        logger.info('tensor parallelism: video recurrences (H=%d) hidden-'
                    'sharded %d-way on a %s mesh; state replicated',
                    int(params['video_rnn_hiddendim']), tp_width,
                    dict(mesh.shape))
    else:
        mesh = create_mesh(params.get('mesh_shape'))
    lg = str(params['vfeat_fn']).lower() == 'lg'

    model = build_model(params, 'gmd')
    train_set = make_dataset(params, 'train_data', 'train_featpath', 'train')
    valid_set = make_dataset(params, 'val_data', 'valid_featpath', 'valid')
    host_pair = not params.get('on_device_aug', True)
    train_bank = None if host_pair else \
        maybe_device_bank(params, train_set, mesh, logger)
    valid_bank = maybe_device_bank(params, valid_set, mesh, logger)
    train_loader = BatchLoader(train_set, params['batch_size'][0],
                               shuffle=True, seed=params.get('seed', 123),
                               host_pair_aug=host_pair,
                               device_assemble=train_bank is not None,
                               **_loader_kwargs())
    valid_loader = BatchLoader(valid_set, params['batch_size'][2],
                               shuffle=False,
                               device_assemble=valid_bank is not None,
                               **_loader_kwargs())

    key = jax.random.PRNGKey(params.get('seed', 123))
    key, init_key = jax.random.split(key)
    model_params = init_model_params(model, params, init_key, 'gmd')
    tx = make_optimizer(params, steps_per_epoch=len(train_loader))
    state = create_train_state(model_params, tx)
    if params.get('start_from'):
        payload, is_ref = load_checkpoint(
            params['start_from'],
            torch_convert_kwargs=dict(kind='gmd',
                                      predictor_name=params['predictor'],
                                      m_temp=params['m_temp']))
        state = restore_train_state(state, payload)
        if payload.get('rng') is not None:
            key = jax.numpy.asarray(payload['rng'])
        logger.warning('resume from checkpoint: %s (reference-format=%s, '
                       'step=%s)', params['start_from'], is_ref,
                       payload.get('step'))
    if pp_stages:
        from .train.pipelined import (make_gmd_pipelined_train_step,
                                      to_pipelined_state)
        state = to_pipelined_state(state, model.nblocks, mesh)
        train_step = make_gmd_pipelined_train_step(
            model, params, mesh,
            int(params.get('pipeline_microbatches', 4)), lg,
            assembler=train_bank.assemble if train_bank else None)
    elif tp_width:
        from .train.tp import make_gmd_tp_train_step
        state = _place_state(state, mesh, params, logger)
        train_step = make_gmd_tp_train_step(
            model, params, mesh, lg,
            assembler=train_bank.assemble if train_bank else None)
    else:
        state = _place_state(state, mesh, params, logger)
        train_step = make_gmd_train_step(
            model, params, lg,
            assembler=train_bank.assemble if train_bank else None, mesh=mesh)
    valid_step = make_gmd_valid_step(
        model, params, lg,
        assembler=valid_bank.assemble if valid_bank else None)
    state, train_step, n_seeds = _multiseed_setup(
        params, state, train_step,
        lambda i: init_model_params(
            model, params, jax.random.fold_in(init_key, i), 'gmd'),
        tx, logger)
    if n_seeds:
        state = replicate_tree(mesh, state)
    chunk = int(params.get('train_scan_chunk', 16))
    run_chunk = None
    if train_bank is not None and chunk > 1:
        run_chunk = _banked_train_chunks_factory(train_step, train_bank,
                                                 mesh)

    tracing = _start_trace_if_requested()
    statistics = {'loss': {}, 'mIoU': {}}
    log_iv = params['batch_log_interval']
    check_iv = params.get('nan_check_interval', 100)
    for step_epoch in range(start_epoch, params['epoch']):
        t0 = time.time()
        epoch_metrics = []
        metric_weights = []
        if run_chunk is not None:
            # chunked scan training: K steps per dispatch
            pending = []
            idx = 0
            t_b = time.time()

            def flush(pending, state, key, idx, t_b):
                state, key, m = run_chunk(state, key, pending)
                epoch_metrics.append(m)
                metric_weights.append(len(pending))
                do_log = log_iv != -1 and (idx // max(log_iv, 1)) != \
                    ((idx + len(pending)) // max(log_iv, 1))
                # idx == 0 matches the per-step path's idx % check_iv == 0
                # first-step check, so a NaN at step 0 is caught on the
                # first flush, not check_iv batches later
                do_check = idx == 0 or (idx // check_iv) != \
                    ((idx + len(pending)) // check_iv)
                if do_log or do_check:
                    mh = jax.device_get(m)
                    if do_log:
                        logger.info(
                            'train: epoch[%03d], batch[%04d/%04d], elapsed '
                            'time=%0.2fs, loss: %03.3f, miou: %03.3f, '
                            'loss_g: %03.3f, loss_intra: %03.3f, '
                            'loss_inter: %03.3f, loss_d: %03.3f',
                            step_epoch, idx, len(train_loader),
                            time.time() - t_b, mh['loss'], mh['miou'],
                            mh['loss_g'], mh['loss_intra'],
                            mh['loss_inter'], mh['loss_d'])
                    _check_finite(mh, state, saver, key, logger, step_epoch,
                                  idx)
                return state, key

            for batch in train_loader:
                pending.append(batch)
                if len(pending) == chunk:
                    state, key = flush(pending, state, key, idx, t_b)
                    idx += len(pending)
                    pending = []
                    t_b = time.time()
            if pending:  # tail chunk (shorter scan; compiles once)
                state, key = flush(pending, state, key, idx, t_b)
        else:
            for idx, (batch, sb) in enumerate(
                    device_prefetch(train_loader, mesh,
                                    params.get('host_prefetch', 2),
                                    bank=train_bank)):
                t_b = time.time()
                key, sk = jax.random.split(key)
                state, metrics = train_step(state, sb, sk)
                epoch_metrics.append(metrics)
                do_log = log_iv != -1 and idx % log_iv == 0
                # watchdog runs on its own unconditional cadence so
                # disabling batch logging (-1) cannot disable failure
                # detection
                do_check = idx % check_iv == 0
                if do_log or do_check:
                    m = jax.device_get(metrics)
                    if do_log:
                        logger.info(
                            'train: epoch[%03d], batch[%04d/%04d], elapsed time=%0.2fs, '
                            'loss: %03.3f, miou: %03.3f, loss_g: %03.3f, '
                            'loss_intra: %03.3f, loss_inter: %03.3f, loss_d: %03.3f',
                            step_epoch, idx, len(train_loader), time.time() - t_b,
                            m['loss'], m['miou'], m['loss_g'], m['loss_intra'],
                            m['loss_inter'], m['loss_d'])
                    _check_finite(m, state, saver, key, logger, step_epoch, idx)
        epoch_metrics = jax.device_get(epoch_metrics)
        w = metric_weights or None  # chunk-mean entries weight by size

        def eavg(k):
            return float(np.average([float(m[k]) for m in epoch_metrics],
                                    weights=w))

        avg_loss = eavg('loss')
        epoch_secs = time.time() - t0
        logger.info('epoch [%03d]: elapsed time:%0.2fs, avg loss: %03.3f, '
                    'miou: %03.3f', step_epoch, epoch_secs, avg_loss,
                    eavg('miou'))
        saver.log_metrics({
            'epoch': step_epoch, 'phase': 'train', 'seconds': epoch_secs,
            'loss': avg_loss, 'miou': eavg('miou'),
            'loss_g': eavg('loss_g'),
            'loss_intra': eavg('loss_intra'),
            'loss_inter': eavg('loss_inter'),
            'loss_d': eavg('loss_d')})

        if (step_epoch + 1) % params['test_interval'] == 0 or step_epoch == 0:
            statistics['loss'][step_epoch] = round(avg_loss, 3)
        if (step_epoch + 1) % params['test_interval'] == 0:
            # fork the key so validation's aug draws never alias the
            # training stream
            vkey = jax.random.fold_in(key, 0x5a11d)
            if n_seeds:
                from .train.multiseed import unstack_state
                per_seed = [
                    run_valid(valid_step, unstack_state(state, i),
                              valid_loader, valid_set, params, logger,
                              step_epoch, saver, mesh, vkey,
                              bank=valid_bank, submit_suffix=f'.s{i}')
                    for i in range(n_seeds)]
                miou = float(np.mean(per_seed))
                logger.info('multi-seed valid: miou per seed %s, '
                            'mean %0.4f, std %0.4f',
                            ['%.4f' % m for m in per_seed], miou,
                            float(np.std(per_seed)))
                saver.log_metrics({'epoch': step_epoch, 'phase': 'valid',
                                   'miou': miou,
                                   'miou_per_seed': per_seed})
            else:
                vstate = state
                if pp_stages:  # valid runs the plain flax model
                    from .train.pipelined import unstack_encoder_tail
                    vstate = state.replace(
                        params=unstack_encoder_tail(state.params))
                miou = run_valid(valid_step, vstate, valid_loader,
                                 valid_set, params, logger, step_epoch,
                                 saver, mesh, vkey, bank=valid_bank)
                saver.log_metrics({'epoch': step_epoch, 'phase': 'valid',
                                   'miou': miou})
            statistics['mIoU'][step_epoch] = round(miou * 100, 2)
        if ((step_epoch + 1) % params['save_model_interval'] == 0
                or (step_epoch + 1) == params['epoch']):
            # the gather (multi-host FSDP) is collective: all processes
            # reach it; only process 0 then writes the file
            to_save = _saveable_state(state)
            if _is_proc0():
                if n_seeds:
                    _multiseed_save(saver, to_save, step_epoch, key,
                                    logger, n_seeds)
                else:
                    path = saver.save_checkpoint(step_epoch, to_save, key)
                    logger.info('Save model in %s', path)

    saver.wait()  # drain the async checkpoint writer before returning
    _stop_trace(tracing)
    _print_statistics(statistics)
    return statistics


def run_valid(valid_step, state, loader, dataset, params, logger, epoch,
              saver: Optional[RunManager], mesh, key, bank=None,
              submit_suffix: str = '') -> float:
    pred_dict = _new_pred_dict(params)
    t0 = time.time()
    host_batches, fetched = _eval_epoch(
        valid_step, state.params, loader, bank, mesh, key=key,
        group=int(params.get('eval_scan_group', 8)))
    all_metrics = [{k: float(fetched[k][i]) for k in
                    ('loss', 'loss_g', 'loss_intra', 'loss_inter', 'miou')}
                   for i in range(len(host_batches))]
    # frame->seconds conversion already happened in-step (_stats);
    # on multi-host each process collects its own stripe's rows
    for i, batch in enumerate(host_batches):
        _collect_predictions(pred_dict, batch, fetched['pred_time'][i],
                             fetched['score'][i])
    if saver is not None:
        saver.save_submits(pred_dict, epoch,
                           _submit_key('val_data') + submit_suffix)
    miou = _avg(all_metrics, 'miou')
    logger.info('epoch [%03d]: elapsed time:%0.4fs, avg loss: %03.3f, '
                'miou: %03.3f avg loss_g: %03.3f, avg loss_m1: %03.3f, '
                'avg loss_m2: %03.3f', epoch, time.time() - t0,
                _avg(all_metrics, 'loss'), miou, _avg(all_metrics, 'loss_g'),
                _avg(all_metrics, 'loss_intra'), _avg(all_metrics, 'loss_inter'))
    return miou


def _print_statistics(statistics):
    for title in ('loss', 'mIoU'):
        print(title, ':')
        print('\t'.join(str(k) for k in statistics[title].keys()))
        print('\t'.join(str(v) for v in statistics[title].values()))
        if title == 'mIoU' and statistics[title]:
            keys = list(statistics[title].keys())
            vals = list(statistics[title].values())
            print('Max mIoU:', max(vals), '\tEpoch', keys[vals.index(max(vals))])


# ---------------------------------------------------------------------------
# GMD test driver (test.py)
# ---------------------------------------------------------------------------

def main_test(params: Dict[str, Any]) -> str:
    pt = _PhaseTimer()
    logger = setup_logger(params['alias'])
    saver = RunManager(params)
    mesh = create_mesh(params.get('mesh_shape'))
    lg = str(params['vfeat_fn']).lower() == 'lg'

    model = build_model(params, 'gmd', inference=True)
    pt.mark('setup')
    test_set = make_dataset(params, 'test_data', 'test_featpath', 'test')
    pt.mark('dataset')
    test_bank = maybe_device_bank(params, test_set, mesh, logger)
    test_loader = BatchLoader(test_set, params['batch_size'][0],
                              shuffle=False,
                              device_assemble=test_bank is not None,
                              **_loader_kwargs())
    pt.mark('bank')

    key = jax.random.PRNGKey(params.get('seed', 123))
    if params.get('start_from'):
        # checkpoint params replace the init values wholesale, so skip
        # model.init entirely: its jit was the dominant fixed cost of the
        # warm driver (~4.5 s/invocation of compile-cache load for a
        # result that was thrown away — round-5 phase profile); the
        # upload itself is device-cached across invocations
        model_params = _load_checkpoint_device(
            params['start_from'], mesh,
            dict(kind='gmd', predictor_name=params['predictor'],
                 m_temp=params['m_temp']), logger)
    else:
        model_params = replicate_tree(
            mesh, init_model_params(model, params, key, 'gmd'))
    pt.mark('init')

    topk = int(params.get('eval_topk', 1) or 1)
    test_step = make_gmd_test_step(
        model, lg, assembler=test_bank.assemble if test_bank else None,
        topk=topk, topk_nms_iou=float(params.get('topk_nms_iou', 0.5)))
    pred_dict = _new_pred_dict(params)
    t0 = time.time()
    host_batches, fetched = _eval_epoch(
        test_step, model_params, test_loader, test_bank, mesh, timer=pt,
        group=int(params.get('eval_scan_group', 8)))
    pt.mark('eval_loop')
    _log_eval_batches(logger, 'test', fetched, len(host_batches),
                      params['batch_log_interval'],
                      (time.time() - t0) / max(len(host_batches), 1))
    losses = [float(x) for x in fetched['loss']]
    mious = [float(x) for x in fetched['miou']]
    for i, batch in enumerate(host_batches):
        _collect_predictions(
            pred_dict, batch, fetched['pred_time'][i], fetched['score'][i],
            pred_topk=fetched['pred_time_topk'][i] if topk > 1 else None,
            score_topk=fetched['score_topk'][i] if topk > 1 else None)
    submit = saver.save_submits(pred_dict, 0, _submit_key('test_data'))
    # reference-semantics "elapsed time" — the same scope as the
    # reference's test() timer (/root/reference/grounding/test.py:85-148:
    # eval loop + decode + prediction collect + submit write; NOT model
    # build, checkpoint load, or retrieval_eval)
    loop_s = time.time() - t0
    logger.info('epoch [%03d]: elapsed time:%0.4fs, avg loss: %03.3f, '
                'miou: %03.3f', 0, loop_s,
                float(np.mean(losses)), float(np.mean(mious)))
    pt.mark('collect_submit')
    # on a multi-host run each shard's table covers this host's stripe;
    # merge the .partN submit shards offline (tools/merge_submits.py) for
    # the global table
    metrics = retrieval_eval(submit)
    metrics['elapsed_loop_s'] = round(loop_s, 4)
    _write_metrics_json(submit, metrics)
    pt.mark('score')
    logger.info(pt.line())
    return submit


# ---------------------------------------------------------------------------
# Baseline drivers (train_baseline.py / test_baseline.py)
# ---------------------------------------------------------------------------

def main_train_baseline(params: Dict[str, Any]) -> Dict[str, Any]:
    logger = setup_logger(params['alias'])
    _multiseed_validate(params)
    allow_existing, start_epoch = _resolve_auto_resume(params)
    saver = RunManager(params, allow_existing=allow_existing)
    mesh = create_mesh(params.get('mesh_shape'))
    lg = str(params['vfeat_fn']).lower() == 'lg'

    model = build_model(params, 'baseline')
    train_set = make_dataset(params, 'train_data', 'train_featpath', 'train')
    valid_set = make_dataset(params, 'val_data', 'valid_featpath', 'valid')
    train_bank = maybe_device_bank(params, train_set, mesh, logger)
    valid_bank = maybe_device_bank(params, valid_set, mesh, logger)
    train_loader = BatchLoader(train_set, params['batch_size'][0],
                               shuffle=True, seed=params.get('seed', 123),
                               device_assemble=train_bank is not None,
                               **_loader_kwargs())
    valid_loader = BatchLoader(valid_set, params['batch_size'][2],
                               shuffle=False,
                               device_assemble=valid_bank is not None,
                               **_loader_kwargs())

    key = jax.random.PRNGKey(params.get('seed', 123))
    key, init_key = jax.random.split(key)
    model_params = init_model_params(model, params, init_key, 'baseline')
    tx = make_optimizer(params, steps_per_epoch=len(train_loader))
    state = create_train_state(model_params, tx)
    if params.get('start_from'):
        payload, is_ref = load_checkpoint(
            params['start_from'],
            torch_convert_kwargs=dict(kind='baseline',
                                      predictor_name=params['predictor']))
        state = restore_train_state(state, payload)
        if payload.get('rng') is not None:
            key = jax.numpy.asarray(payload['rng'])
        logger.warning('resume from checkpoint: %s (reference-format=%s, '
                       'step=%s)', params['start_from'], is_ref,
                       payload.get('step'))
    state = _place_state(state, mesh, params, logger)

    train_step = make_baseline_train_step(
        model, params, lg,
        assembler=train_bank.assemble if train_bank else None, mesh=mesh)
    eval_step = make_baseline_eval_step(
        model, lg, assembler=valid_bank.assemble if valid_bank else None)
    state, train_step, n_seeds = _multiseed_setup(
        params, state, train_step,
        lambda i: init_model_params(
            model, params, jax.random.fold_in(init_key, i), 'baseline'),
        tx, logger)
    if n_seeds:
        state = replicate_tree(mesh, state)

    tracing = _start_trace_if_requested()
    statistics = {'loss': {}, 'mIoU': {}}
    for step_epoch in range(start_epoch, params['epoch']):
        t0 = time.time()
        epoch_metrics = []
        for idx, (batch, sb) in enumerate(
                device_prefetch(train_loader, mesh,
                                params.get('host_prefetch', 2),
                                bank=train_bank)):
            t_b = time.time()
            key, sk = jax.random.split(key)
            state, metrics = train_step(state, sb, sk)
            epoch_metrics.append(metrics)
            do_log = params['batch_log_interval'] != -1 and \
                idx % params['batch_log_interval'] == 0
            do_check = idx % params.get('nan_check_interval', 100) == 0
            if do_log or do_check:
                m = jax.device_get(metrics)
                if do_log:
                    logger.info('train: epoch[%03d], batch[%04d/%04d], elapsed '
                                'time=%0.2fs, loss: %03.3f, miou: %03.3f',
                                step_epoch, idx, len(train_loader),
                                time.time() - t_b, m['loss'], m['miou'])
                _check_finite(m, state, saver, key, logger, step_epoch, idx)
        epoch_metrics = jax.device_get(epoch_metrics)
        avg_loss = _avg(epoch_metrics, 'loss')
        epoch_secs = time.time() - t0
        logger.info('epoch [%03d]: elapsed time:%0.2fs, avg loss: %03.3f, '
                    'miou: %03.3f', step_epoch, epoch_secs, avg_loss,
                    _avg(epoch_metrics, 'miou'))
        saver.log_metrics({'epoch': step_epoch, 'phase': 'train',
                           'seconds': epoch_secs, 'loss': avg_loss,
                           'miou': _avg(epoch_metrics, 'miou')})
        if (step_epoch + 1) % params['test_interval'] == 0 or step_epoch == 0:
            statistics['loss'][step_epoch] = round(avg_loss, 3)
        if (step_epoch + 1) % params['test_interval'] == 0:
            if n_seeds:
                from .train.multiseed import unstack_state
                per_seed = [
                    run_eval_collect(eval_step,
                                     unstack_state(state, i).params,
                                     valid_loader, params, logger,
                                     step_epoch, saver, mesh, 'val_data',
                                     bank=valid_bank,
                                     submit_suffix=f'.s{i}')
                    for i in range(n_seeds)]
                miou = float(np.mean(per_seed))
                logger.info('multi-seed valid: miou per seed %s, '
                            'mean %0.4f, std %0.4f',
                            ['%.4f' % m for m in per_seed], miou,
                            float(np.std(per_seed)))
                saver.log_metrics({'epoch': step_epoch, 'phase': 'valid',
                                   'miou': miou,
                                   'miou_per_seed': per_seed})
            else:
                miou = run_eval_collect(eval_step, state.params,
                                        valid_loader, params, logger,
                                        step_epoch, saver, mesh,
                                        'val_data', bank=valid_bank)
                saver.log_metrics({'epoch': step_epoch, 'phase': 'valid',
                                   'miou': miou})
            statistics['mIoU'][step_epoch] = round(miou * 100, 2)
        if ((step_epoch + 1) % params['save_model_interval'] == 0
                or (step_epoch + 1) == params['epoch']):
            # the gather (multi-host FSDP) is collective: all processes
            # reach it; only process 0 then writes the file
            to_save = _saveable_state(state)
            if _is_proc0():
                if n_seeds:
                    _multiseed_save(saver, to_save, step_epoch, key,
                                    logger, n_seeds)
                else:
                    path = saver.save_checkpoint(step_epoch, to_save, key)
                    logger.info('Save model in %s', path)
    saver.wait()  # drain the async checkpoint writer before returning
    _stop_trace(tracing)
    _print_statistics(statistics)
    return statistics


def run_eval_collect(eval_step, model_params, loader, params, logger, epoch,
                     saver, mesh, submit_key, bank=None,
                     submit_suffix: str = '') -> float:
    pred_dict = _new_pred_dict(params)
    t0 = time.time()
    host_batches, fetched = _eval_epoch(
        eval_step, model_params, loader, bank, mesh,
        group=int(params.get('eval_scan_group', 8)))
    losses = [float(x) for x in fetched['loss']]
    mious = [float(x) for x in fetched['miou']]
    for i, batch in enumerate(host_batches):
        _collect_predictions(pred_dict, batch, fetched['pred_time'][i],
                             fetched['score'][i])
    if saver is not None:
        saver.save_submits(pred_dict, epoch,
                           _submit_key(submit_key) + submit_suffix)
    miou = float(np.mean(mious))
    logger.info('epoch [%03d]: elapsed time:%0.4fs, avg loss: %03.3f, '
                'miou: %03.3f', epoch, time.time() - t0,
                float(np.mean(losses)), miou)
    return miou


def main_test_baseline(params: Dict[str, Any]) -> str:
    logger = setup_logger(params['alias'])
    saver = RunManager(params)
    mesh = create_mesh(params.get('mesh_shape'))
    lg = str(params['vfeat_fn']).lower() == 'lg'

    model = build_model(params, 'baseline', inference=True)
    test_set = make_dataset(params, 'test_data', 'test_featpath', 'test')
    test_bank = maybe_device_bank(params, test_set, mesh, logger)
    test_loader = BatchLoader(test_set, params['batch_size'][0],
                              shuffle=False,
                              device_assemble=test_bank is not None,
                              **_loader_kwargs())

    key = jax.random.PRNGKey(params.get('seed', 123))
    if params.get('start_from'):
        # same init-skip + device-cached upload as main_test
        model_params = _load_checkpoint_device(
            params['start_from'], mesh,
            dict(kind='baseline', predictor_name=params['predictor']),
            logger)
    else:
        model_params = replicate_tree(
            mesh, init_model_params(model, params, key, 'baseline'))

    topk = int(params.get('eval_topk', 1) or 1)
    eval_step = make_baseline_eval_step(
        model, lg, assembler=test_bank.assemble if test_bank else None,
        topk=topk, topk_nms_iou=float(params.get('topk_nms_iou', 0.5)))
    pred_dict = _new_pred_dict(params)
    t0 = time.time()
    host_batches, fetched = _eval_epoch(
        eval_step, model_params, test_loader, test_bank, mesh,
        group=int(params.get('eval_scan_group', 8)))
    losses = [float(x) for x in fetched['loss']]
    mious = [float(x) for x in fetched['miou']]
    for i, batch in enumerate(host_batches):
        _collect_predictions(
            pred_dict, batch, fetched['pred_time'][i], fetched['score'][i],
            pred_topk=fetched['pred_time_topk'][i] if topk > 1 else None,
            score_topk=fetched['score_topk'][i] if topk > 1 else None)
    submit = saver.save_submits(pred_dict, 0, _submit_key('test_data'))
    logger.info('epoch [%03d]: elapsed time:%0.4fs, avg loss: %03.3f, '
                'miou: %03.3f', 0, time.time() - t0,
                float(np.mean(losses)), float(np.mean(mious)))
    _write_metrics_json(submit, retrieval_eval(submit))
    return submit
