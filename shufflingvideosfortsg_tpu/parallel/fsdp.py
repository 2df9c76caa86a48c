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
- Because the update is elementwise over leaves, the output state keeps
  the input sharding with no forced ``out_shardings``; steps chain (and
  ``lax.scan`` chunked training composes) without re-placement.
- Checkpointing is unchanged: ``jax.device_get`` on a sharded leaf
  gathers it, so ``utils/saver.py`` writes the same full-state file.

Single-controller scope: with multiple processes the host-side numpy
state would need ``make_array_from_process_local_data`` assembly per
shard; the drivers fall back to replication there (cli.py guards it).

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
    returned state feeds the unmodified jitted train step."""
    return jax.device_put(state, fsdp_shardings(state, mesh, axis,
                                                min_bytes))


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
