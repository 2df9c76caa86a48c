"""Run management: run directories, params.json, checkpoints, submit files.

Mirrors the reference ModelSaver's observable behavior (grounding/util/
model_saver.py): ``<runs>/<alias>/{model,submits}`` layout, params.json,
refusal to reuse an alias unless it starts with 'test'/'inference' (then the
old run directory is removed), checkpoint names ``<alias>_<step:05d>.ckp``
and submit names ``<alias>_<step:05d>_<split>.json``.

Checkpoints are richer than the reference's raw state_dict: a msgpack
(flax.serialization) payload holding {params, opt_state, step, rng_key},
so resume restores optimizer state too (the reference never saved it —
SURVEY.md §5). ``load_checkpoint`` also accepts reference torch ``.ckp``
files, converting through utils/torch_interop.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

MAGIC = b'SVTSG1\n'


def snapshot_state(state):
    """Donation-safe, on-device snapshot of a train state.

    The jitted train steps donate the state buffer (train/steps.py:122),
    so an async writer holding the live state would read freed memory once
    the next step dispatches. Fully-addressable leaves are copied on
    device (HBM-bandwidth cheap, ~µs for the ~50 MB state) before the
    writer thread takes over. Non-fully-addressable leaves (multi-host)
    are necessarily fresh `gather_state` outputs (cli._saveable_state) —
    never donated — and an eager copy would need every process, so they
    pass through untouched.
    """
    import jax.numpy as jnp

    def cp(x):
        if isinstance(x, jax.Array) and x.is_fully_addressable:
            return jnp.copy(x)
        return x

    return jax.tree.map(cp, state)


class AsyncCheckpointer:
    """Background checkpoint writer (orbax-style two-phase save).

    Phase 1 (caller's thread, fast): on-device snapshot via
    :func:`snapshot_state`. Phase 2 (writer thread): the blocking
    device→host fetch, msgpack serialization, and the atomic file write.
    Training resumes after phase 1 — the D2H fetch (~seconds for the full
    state through a slow host link) and the disk write overlap the next
    epoch instead of stalling it.

    One save in flight at a time: a new save (or :meth:`wait`) joins the
    previous writer first, and any exception it raised is re-raised on
    the caller's thread so failures aren't silently swallowed.
    """

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def save(self, path: str, state, rng_key=None) -> None:
        self.wait()
        snap = snapshot_state(state)
        rng = None if rng_key is None else snapshot_state(rng_key)

        def write():
            try:
                save_checkpoint(path, snap, rng)
            except BaseException as e:  # surfaced by the next wait()
                self._error = e

        self._thread = threading.Thread(target=write, daemon=True,
                                        name='svtsg-ckpt-writer')
        self._thread.start()

    def wait(self) -> None:
        """Block until the in-flight save (if any) is durable; re-raise
        its failure. Drivers call this before exiting and before any
        read-back of the checkpoint they just scheduled."""
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err


class RunManager:
    def __init__(self, params: Dict[str, Any], allow_existing: bool = False):
        self.params = params
        self.root_folder = os.path.join(params['runs'], params['alias'])
        self.model_folder = os.path.join(self.root_folder, 'model')
        self.submits_folder = os.path.join(self.root_folder, 'submits')
        self._async = (AsyncCheckpointer()
                       if params.get('async_checkpoint') else None)
        # multi-host: only process 0 owns run-dir lifecycle (alias
        # strictness, params.json); other hosts just ensure the dirs exist
        # (shared filesystem) so their submit shards have a home
        if jax.process_index() == 0:
            self._init_dirs(allow_existing)
            with open(os.path.join(self.root_folder, 'params.json'), 'w') as f:
                json.dump(_jsonable(params), f)
        else:
            os.makedirs(self.model_folder, exist_ok=True)
            os.makedirs(self.submits_folder, exist_ok=True)

    def _init_dirs(self, allow_existing: bool = False):
        if os.path.exists(self.root_folder) and not allow_existing:
            alias = self.params['alias']
            if alias.startswith('test') or alias.startswith('inference'):
                shutil.rmtree(self.root_folder)
                print(f'warning: remove test({self.root_folder}) folder')
            else:
                print('error: alias already in use, abort')
                sys.exit(1)
        os.makedirs(self.model_folder, exist_ok=True)
        os.makedirs(self.submits_folder, exist_ok=True)

    def model_path(self, step: int) -> str:
        return os.path.join(self.model_folder,
                            '%s_%05d.ckp' % (self.params['alias'], step))

    def save_checkpoint(self, path_or_step, state, rng_key=None,
                        sync: bool = False) -> str:
        """Write (or, with ``async_checkpoint: true``, schedule) a
        checkpoint. ``sync=True`` forces a blocking write regardless —
        the emergency path (cli._check_finite) uses it because the
        process aborts right after."""
        path = (self.model_path(path_or_step)
                if isinstance(path_or_step, int) else path_or_step)
        if self._async is not None and not sync:
            self._async.save(path, state, rng_key)
        else:
            self.wait()  # keep write order vs any in-flight async save
            save_checkpoint(path, state, rng_key)
        return path

    def wait(self) -> None:
        """Drain the async writer (no-op in sync mode); re-raises any
        writer failure. Drivers call this before returning."""
        if self._async is not None:
            self._async.wait()

    def log_metrics(self, record: Dict[str, Any]) -> None:
        """Append one JSON line to <run>/metrics.jsonl (machine-readable
        training curve; the reference only had free-text logs)."""
        path = os.path.join(self.root_folder, 'metrics.jsonl')
        with open(path, 'a') as f:
            f.write(json.dumps(_jsonable(record)) + '\n')

    def save_submits(self, submits: Dict[str, Any], step: int,
                     key: str = 'val_data') -> str:
        # multi-host submit shards arrive as '<key>.partN' (cli._submit_key):
        # the params lookup uses the base key, the shard suffix lands in the
        # file name so tools/merge_submits.py can recombine
        base, _, part = key.partition('.')
        split = self.params[base].split('/')[-1].split('.')[0]
        if part:
            split = f'{split}.{part}'
        file_name = os.path.join(
            self.submits_folder,
            '%s_%05d_%s.json' % (self.params['alias'], step, split))
        with open(file_name, 'w') as f:
            json.dump(_jsonable(submits), f)
        return file_name


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    return obj


def latest_checkpoint(model_dir: str) -> Optional[Tuple[str, int]]:
    """Newest ``*_NNNNN.ckp`` in a run's model dir as (path, epoch), or
    None. Powers ``--start_from auto`` crash recovery: the train drivers
    resume from here and continue at epoch+1."""
    if not os.path.isdir(model_dir):
        return None
    best: Optional[Tuple[str, int]] = None
    for name in os.listdir(model_dir):
        if not name.endswith('.ckp'):
            continue
        stem = name[:-4]
        tail = stem.rsplit('_', 1)[-1]
        if not tail.isdigit():
            continue
        epoch = int(tail)
        if best is None or epoch > best[1]:
            best = (os.path.join(model_dir, name), epoch)
    return best


def save_checkpoint(path: str, state, rng_key=None) -> None:
    """Serialize {params, opt_state, step, rng} with flax msgpack."""
    from flax import serialization

    payload = {
        'params': jax.device_get(state.params),
        # to_state_dict flattens optax's tuple/namedtuple pytree into
        # msgpack-friendly nested dicts; restore with restore_train_state
        'opt_state': serialization.to_state_dict(
            jax.device_get(state.opt_state)),
        'step': int(jax.device_get(state.step)),
        'rng': None if rng_key is None else np.asarray(jax.device_get(rng_key)),
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = path + '.tmp'
    with open(tmp, 'wb') as f:
        f.write(MAGIC)
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, torch_convert_kwargs: Optional[Dict] = None
                    ) -> Tuple[Dict[str, Any], bool]:
    """Load a checkpoint.

    Returns (payload, is_reference_format). For our format the payload is
    {params, opt_state, step, rng}; for a reference torch .ckp it is
    {'params': <converted pytree>} only.
    """
    with open(path, 'rb') as f:
        head = f.read(len(MAGIC))
        if head == MAGIC:
            from flax import serialization
            payload = serialization.msgpack_restore(f.read())
            return payload, False
    # torch state_dict (zip or legacy pickle)
    from .torch_interop import load_reference_ckp
    params = load_reference_ckp(path, **(torch_convert_kwargs or {}))
    return {'params': params, 'opt_state': None, 'step': 0, 'rng': None}, True


def restore_train_state(state, payload):
    """Rebuild a TrainState from a loaded payload (resume path). ``state``
    supplies the opt_state structure for from_state_dict."""
    from flax import serialization
    import jax.numpy as jnp

    opt_state = state.opt_state
    if payload.get('opt_state') is not None:
        opt_state = serialization.from_state_dict(state.opt_state,
                                                  payload['opt_state'])
    return state.replace(params=payload['params'], opt_state=opt_state,
                         step=jnp.asarray(payload.get('step', 0), jnp.int32))
