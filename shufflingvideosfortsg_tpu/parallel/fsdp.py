"""FSDP / ZeRO-3-style parameter + optimizer-state sharding.

Data parallelism (parallel/mesh.py) replicates parameters and Adam moments
on every device. For the shipped GMD configs that costs ~3x the parameter
bytes per chip (params + mu + nu) — irrelevant at H=256, but the binding
HBM term for scaled-up variants once the feature bank takes the rest of
the chip. This module shards the *state* over the existing ``data`` axis,
the classic ZeRO-3 split, the TPU-native way:

- No wrapper module, no manual collectives. FSDP here is a PLACEMENT
  POLICY: every large state leaf is ``device_put`` with a
  ``NamedSharding`` that splits its largest mesh-divisible axis over
  'data' (:func:`sharding_for_leaf`); small leaves and scalars stay
  replicated. The jitted train step is the SAME traced function as the
  replicated path — XLA's SPMD partitioner sees sharded operands,
  all-gathers a parameter right before use, computes the batch-sharded
  gradient, and reduce-scatters it into the sharded Adam update. The
  all-gather/reduce-scatter pair replaces data parallelism's all-reduce
  at identical total bytes on a ring — ZeRO-3's bandwidth-neutrality
  argument — while per-device state residency drops n-fold.
- The train steps pin the post-update state to this placement with one
  ``with_sharding_constraint`` (:func:`state_constrainer`): the
  elementwise update propagates the input sharding today, but output
  placement is otherwise emergent compiler behavior, not a contract.
  Pinned, steps chain (and ``lax.scan`` chunked training composes)
  without re-placement.
- Checkpointing is unchanged: ``jax.device_get`` on a sharded leaf
  gathers it, so ``utils/saver.py`` writes the same full-state file.

Multi-host composes: every process holds the identical full state on
host (same init PRNG key, or the same checkpoint payload), so
:func:`shard_train_state` assembles global sharded arrays with
``jax.make_array_from_callback`` — each process materializes exactly
the shards its local devices own. Checkpointing under multi-host FSDP
needs one extra step: a sharded global array is not fully addressable,
so the drivers run :func:`gather_state` (a jitted identity forced to
replicated output — a collective, called on EVERY process) before
process 0 writes the file.

Reference scope: none — the reference is single-GPU torch DataParallel
(grounding/train.py:343). Beyond-parity scaling surface, same category
as parallel/{seq,tensor,pipeline,expert}_parallel.py. Enable with
``fsdp: true`` in config (config.py) or pass ``--fsdp`` to the train
CLIs; equality vs the replicated path and the n-fold residency cut are
asserted in tests/test_fsdp.py.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

# Leaves below this many bytes stay replicated: sharding a [512]-float
# bias saves nothing and costs an all-gather dispatch. 64 KiB keeps every
# production-dim weight matrix sharded and every LayerNorm/bias whole.
FSDP_MIN_BYTES = 64 * 1024


def sharding_for_leaf(x: Any, mesh: Mesh, axis: str = DATA_AXIS,
                      min_bytes: int = FSDP_MIN_BYTES) -> NamedSharding:
    """The FSDP placement rule for one state leaf: split the largest
    axis divisible by the mesh axis size; replicate scalars, small
    leaves, and shapes with no divisible axis."""
    n = int(mesh.shape[axis])
    shape = getattr(x, 'shape', ())
    dtype = np.dtype(getattr(x, 'dtype', np.float32))
    size = int(np.prod(shape)) if shape else 1
    if n <= 1 or not shape or size * dtype.itemsize < min_bytes:
        return NamedSharding(mesh, P())
    cands = [i for i, d in enumerate(shape) if d % n == 0 and d >= n]
    if not cands:
        return NamedSharding(mesh, P())
    dim = max(cands, key=lambda i: shape[i])
    return NamedSharding(
        mesh, P(*[axis if i == dim else None for i in range(len(shape))]))


def fsdp_shardings(tree: Any, mesh: Mesh, axis: str = DATA_AXIS,
                   min_bytes: int = FSDP_MIN_BYTES) -> Any:
    """Pytree of ``NamedSharding`` mirroring ``tree``'s array leaves."""
    return jax.tree.map(
        lambda x: sharding_for_leaf(x, mesh, axis, min_bytes), tree)


def shard_train_state(state: Any, mesh: Mesh, axis: str = DATA_AXIS,
                      min_bytes: int = FSDP_MIN_BYTES) -> Any:
    """Place a TrainState (or any state pytree) ZeRO-3-sharded: params
    and optimizer moments split over ``axis``, scalars replicated. The
    returned state feeds the unmodified jitted train step.

    Multi-host: every process must hold the identical full state (true
    for fresh inits from a shared PRNG key and for checkpoint resumes);
    each process then materializes only its local devices' shards."""
    shardings = fsdp_shardings(state, mesh, axis, min_bytes)
    if jax.process_count() <= 1:
        return jax.device_put(state, shardings)
    host = jax.device_get(state)

    def place(x, s):
        arr = np.asarray(x)
        return jax.make_array_from_callback(
            arr.shape, s, lambda idx, a=arr: np.asarray(a[idx]))

    return jax.tree.map(place, host, shardings)


def state_constrainer(params: dict, mesh: Mesh | None,
                      axis: str = DATA_AXIS,
                      min_bytes: int = FSDP_MIN_BYTES):
    """``None`` unless FSDP is on; else a function that pins a state tree
    to its FSDP placement *inside jit* (``with_sharding_constraint``).

    Without the pin, XLA's output-sharding propagation chooses the
    updated state's placement: the elementwise update (sharded param ×
    replicated grad) propagates the sharding today, but that is emergent
    compiler behavior, not a contract — a propagation change would
    silently undo ZeRO-3 after the first step while the loss stayed
    correct. The train steps apply this to the post-``apply_gradients``
    state so placement is guaranteed on both the per-step path and the
    chunked ``lax.scan`` carry."""
    if not (params.get('fsdp') and mesh is not None
            and mesh.devices.size > 1):
        return None
    min_bytes = params.get('fsdp_min_bytes', min_bytes)

    def constrain(state):
        return jax.lax.with_sharding_constraint(
            state, fsdp_shardings(state, mesh, axis, min_bytes))

    return constrain


def needs_gather(state: Any) -> bool:
    """True when checkpointing this state requires :func:`gather_state`
    first (multi-host + at least one non-fully-addressable leaf)."""
    if jax.process_count() <= 1:
        return False
    return any(isinstance(l, jax.Array) and not l.is_fully_addressable
               for l in jax.tree.leaves(state))


def gather_state(state: Any) -> Any:
    """Replicate every leaf of a sharded state so ``jax.device_get``
    works again (the checkpoint path). This lowers to an all-gather per
    sharded leaf — a COLLECTIVE: under multi-host every process must
    call it, even though only process 0 writes the file."""
    meshes = [l.sharding.mesh for l in jax.tree.leaves(state)
              if isinstance(l, jax.Array)
              and isinstance(l.sharding, NamedSharding)]
    if not meshes:
        return state
    repl = NamedSharding(meshes[0], P())
    return jax.jit(lambda s: s, out_shardings=repl)(state)


def resident_state_bytes(state: Any) -> int:
    """Per-device bytes actually resident for this state (sum of one
    addressable shard per leaf) — the number FSDP shrinks n-fold."""
    total = 0
    for leaf in jax.tree.leaves(state):
        if isinstance(leaf, jax.Array) and leaf.addressable_shards:
            s = leaf.addressable_shards[0].data
            total += int(np.prod(s.shape)) * np.dtype(s.dtype).itemsize
        elif hasattr(leaf, 'nbytes'):
            total += int(leaf.nbytes)
    return total
