"""FSDP / ZeRO-3 state sharding (parallel/fsdp.py): the sharded-state
train path equals the replicated path, the state is actually split over
the data axis, and checkpointing still writes the full state.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from shufflingvideosfortsg_tpu.config import load_config
from shufflingvideosfortsg_tpu.models import build_model
from shufflingvideosfortsg_tpu.parallel.fsdp import (
    fsdp_shardings, resident_state_bytes, shard_train_state,
    sharding_for_leaf)
from shufflingvideosfortsg_tpu.parallel.mesh import (DATA_AXIS, create_mesh,
                                                     replicate_tree)
from shufflingvideosfortsg_tpu.train.state import (create_train_state,
                                                   make_optimizer)
from shufflingvideosfortsg_tpu.train.steps import make_gmd_train_step

B, T, N, Dv = 8, 16, 7, 32


def _params():
    return load_config(None, overrides=dict(
        video_len=T, video_feature_dim=Dv, sent_len=N,
        sent_rnn_hiddendim=16, video_rnn_hiddendim=16,
        mlp_hidden_dim=16, span_hidden_dim=16, m_pred_hidden=16,
        dropout=0.0, lr=1e-3))


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    s = rng.randint(0, T - 4, B).astype(np.int32)
    e = (s + 2).astype(np.int32)
    return {
        'sent_feat': rng.randn(B, N, 300).astype(np.float32),
        'sent_mask': np.ones((B, N), np.int32),
        'video_feat': rng.randn(B, T, Dv).astype(np.float32),
        'video_mask': np.ones((B, T), np.int32),
        'nfeats': np.full((B,), T, np.int32),
        'framestps': np.stack([s, e], -1),
        'timestps': np.stack([s, e], -1).astype(np.float32),
        'duration': np.full((B,), float(T), np.float32),
        'temporal_labels': np.ones((B, T), np.int32),
        'fore_masks': np.ones((B, T), np.int32),
        'back_masks': np.ones((B, T), np.int32),
    }


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = create_mesh([8])
    params = _params()
    model = build_model(params, 'gmd')
    mt = np.ones((2, T), np.int32)
    mn = np.ones((2, N), np.int32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), np.zeros((2, N, 300), np.float32), mn,
        np.zeros((2, T, Dv), np.float32), mt,
        np.zeros((2, T, Dv), np.float32), mt, mt, mt, mt, mt, mt, mt)
    # host copy: the train step donates its state, and on the CPU backend
    # device_put can alias the source buffer on the overlapping device, so
    # reusing the same device arrays across runs would feed deleted buffers
    variables = jax.device_get(variables)
    tx = make_optimizer(params, steps_per_epoch=10)
    step = make_gmd_train_step(model, params)
    # the FSDP step pins the ZeRO-3 placement on its output state
    # (parallel/fsdp.state_constrainer inside the step body); the plain
    # step stays the unconstrained replicated oracle
    fstep = make_gmd_train_step(
        model, dict(params, fsdp=True, fsdp_min_bytes=0), mesh=mesh)

    def fresh():
        return create_train_state(variables['params'], tx)

    return mesh, params, step, fstep, fresh


def _run(step, state, mesh, n_steps=3):
    key = jax.random.PRNGKey(7)
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    for i in range(n_steps):
        key, sk = jax.random.split(key)
        batch = {k: jax.device_put(v, sharding)
                 for k, v in _batch(i).items()}
        state, metrics = step(state, batch, sk)
    return state, metrics


def test_sharding_rule():
    mesh = create_mesh([8])
    n = mesh.devices.size
    if n < 8:
        pytest.skip("needs 8 devices")
    # largest divisible axis shards
    s = sharding_for_leaf(np.zeros((2, 24, 64), np.float32), mesh,
                          min_bytes=0)
    assert s.spec == P(None, None, DATA_AXIS)
    # scalars, small leaves, and non-divisible shapes stay replicated
    assert sharding_for_leaf(np.float32(0.0), mesh, min_bytes=0).spec == P()
    assert sharding_for_leaf(np.zeros((300, 33), np.float32), mesh,
                             min_bytes=0).spec == P()
    assert sharding_for_leaf(np.zeros((8, 8), np.float32), mesh,
                             min_bytes=2**20).spec == P()


def test_fsdp_state_is_sharded_and_smaller(setup):
    mesh, params, step, fstep, fresh = setup
    repl = replicate_tree(mesh, fresh())
    shrd = shard_train_state(fresh(), mesh, min_bytes=0)
    specs = [leaf.sharding.spec for leaf in jax.tree.leaves(shrd.params)
             if isinstance(leaf, jax.Array)]
    n_sharded = sum(1 for s in specs if DATA_AXIS in s)
    assert n_sharded >= 10, f"only {n_sharded} sharded param leaves"
    # Adam moments shard too (mirrored pytree => same rule applies)
    mu_specs = [leaf.sharding.spec
                for leaf in jax.tree.leaves(shrd.opt_state)
                if isinstance(leaf, jax.Array) and leaf.ndim > 0]
    assert any(DATA_AXIS in s for s in mu_specs)
    # per-device residency drops (far from 8x at these tiny dims: the
    # non-divisible [300, 2H] GloVe rows and per-gate biases dominate;
    # at production dims the sharded share is >95% of state bytes)
    assert resident_state_bytes(shrd) < 0.65 * resident_state_bytes(repl)


def test_fsdp_training_equals_replicated(setup):
    mesh, params, step, fstep, fresh = setup
    state_r, metrics_r = _run(step, replicate_tree(mesh, fresh()), mesh)
    state_f, metrics_f = _run(fstep, shard_train_state(fresh(), mesh,
                                                       min_bytes=0), mesh)
    np.testing.assert_allclose(float(metrics_f['loss']),
                               float(metrics_r['loss']), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(state_r.params)[0],
            jax.tree_util.tree_flatten_with_path(state_f.params)[0]):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6, err_msg=str(pa))
    # the updated state keeps its FSDP placement across steps (no silent
    # re-replication), so residency stays n-fold smaller while training
    specs = [leaf.sharding.spec for leaf in jax.tree.leaves(state_f.params)
             if isinstance(leaf, jax.Array)]
    assert any(DATA_AXIS in s for s in specs)


def test_fsdp_composes_with_chunked_scan(setup):
    """cli's chunked-scan training (K steps per dispatch via lax.scan over
    the step body) must preserve FSDP placement across the scan carry and
    match the per-step FSDP path bit-for-bit (same key-split chain)."""
    mesh, params, step, fstep, fresh = setup
    state_s, _ = _run(fstep, shard_train_state(fresh(), mesh, min_bytes=0),
                      mesh, n_steps=3)

    sharding = NamedSharding(mesh, P(None, DATA_AXIS))
    stacked = {k: jax.device_put(np.stack([_batch(i)[k] for i in range(3)]),
                                 sharding)
               for k in _batch(0)}
    inner = fstep.inner

    @jax.jit
    def run_chunk(state, key, batches):
        def body(carry, b):
            st, k = carry
            k, sk = jax.random.split(k)
            st, m = inner(st, b, sk)
            return (st, k), m
        (state, key), ms = jax.lax.scan(body, (state, key), batches)
        return state, ms

    state_c, _ = run_chunk(shard_train_state(fresh(), mesh, min_bytes=0),
                           jax.random.PRNGKey(7), stacked)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(
                jax.device_get(state_s.params))[0],
            jax.tree_util.tree_flatten_with_path(
                jax.device_get(state_c.params))[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))
    specs = [leaf.sharding.spec for leaf in jax.tree.leaves(state_c.params)
             if isinstance(leaf, jax.Array)]
    assert any(DATA_AXIS in s for s in specs), \
        "scan carry dropped the FSDP placement"


def test_fsdp_checkpoint_roundtrip(setup, tmp_path):
    from shufflingvideosfortsg_tpu.utils.saver import (load_checkpoint,
                                                       save_checkpoint)
    mesh, params, step, fstep, fresh = setup
    state, _ = _run(fstep, shard_train_state(fresh(), mesh, min_bytes=0),
                    mesh, n_steps=1)
    path = str(tmp_path / 'fsdp.ckp')
    save_checkpoint(path, state, jax.random.PRNGKey(3))
    payload, is_ref = load_checkpoint(path)
    assert not is_ref and payload['step'] == 1
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(
                jax.device_get(state.params))[0],
            jax.tree_util.tree_flatten_with_path(payload['params'])[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
