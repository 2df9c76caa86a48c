"""Multi-seed training: S independent seeds trained in ONE jitted step.

The reference quantifies seed robustness by re-running its whole driver
per seed (its published tables are single-seed; our LEARNING.md
replication trained each seed sequentially). On TPU the natural shape is
different: ``jax.vmap`` over a stacked seed axis turns S independent
model replicas into one batched program — every matmul grows an S-fold
leading dimension (larger MXU tiles, same HBM-resident feature bank
shared by all seeds), so an S-seed study costs far less than S runs and
needs no orchestration.

Semantics: seeds share the batch stream (same data order) and differ in
init, dropout draws, and on-device augmentation draws — exactly the
reference's seed protocol minus loader reshuffling. Training S seeds
vmapped is bit-identical per seed to training each alone with the same
per-seed keys (tests/test_multiseed.py pins this against the unbatched
step).

Composes with data parallelism: the batch axis stays sharded over the
mesh's 'data' axis inside the vmapped step; the seed axis is an
unsharded leading axis on the (replicated) state. FSDP placement and
multi-seed are mutually exclusive today (stacked leaves change the
leaf-shape-keyed placement rule) — multi-seed targets the production
~17 MB state where replication is free.

Reference scope: none (beyond-parity scaling surface, same category as
parallel/*). Anchors: grounding/train.py:131-172 trains one seed per
process invocation.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

from .state import TrainState, create_train_state
from .steps import JittedStep


def stack_states(states: Sequence[TrainState]) -> TrainState:
    """Stack S TrainStates leaf-wise into one with a leading seed axis.
    ``tx`` (static field) must be shared; ``step`` stacks like any leaf
    so per-seed LR schedules stay independent."""
    tx = states[0].tx
    assert all(s.tx is tx for s in states[1:]), \
        'all seeds must share one optimizer'
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def unstack_state(stacked: TrainState, i: int) -> TrainState:
    """Slice seed ``i`` back out of a stacked TrainState."""
    return jax.tree.map(lambda x: x[i], stacked)


def n_seeds_of(stacked: TrainState) -> int:
    return int(stacked.step.shape[0])


def init_multiseed_states(init_fn, seeds: Sequence[int], tx) -> TrainState:
    """Build a stacked TrainState from per-seed inits. ``init_fn(key)``
    returns a params tree (the model's ``init(...)['params']``)."""
    states: List[TrainState] = []
    for s in seeds:
        params_tree = init_fn(jax.random.PRNGKey(int(s)))
        states.append(create_train_state(jax.device_get(params_tree), tx))
    return stack_states(states)


def make_multiseed_train_step(step: JittedStep, n_seeds: int) -> JittedStep:
    """Vmap a train step built by make_gmd_train_step /
    make_baseline_train_step over the seed axis: stacked state in axis 0,
    batch shared, per-step key split into one independent key per seed.
    Metrics come back with a leading [S] axis."""
    inner = step.inner

    def multi_step(stacked: TrainState, batch: Dict[str, jnp.ndarray],
                   key: jax.Array):
        keys = jax.random.split(key, n_seeds)
        return jax.vmap(inner, in_axes=(0, None, 0))(stacked, batch, keys)

    return JittedStep(multi_step, donate_argnums=(0,))


def make_multiseed_valid_step(valid_step) -> Any:
    """Vmap a valid step (p, batch, key) over stacked params: shared
    batch and key (validation pseudo-draws are deterministic per batch in
    the driver; sharing the key keeps per-seed metrics comparable)."""
    inner = getattr(valid_step, 'inner', valid_step)

    def multi_valid(stacked_params, batch, key):
        return jax.vmap(inner, in_axes=(0, None, None))(
            stacked_params, batch, key)

    return jax.jit(multi_valid)
