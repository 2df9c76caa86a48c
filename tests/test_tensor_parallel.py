"""Tensor-parallel (hidden-axis-sharded) BiLSTM: the Megatron-split
recurrence over a model mesh must equal the plain BiLSTM module, on a
pure model mesh and on a 2D data-x-model mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.ops.rnn import BiLSTM
from shufflingvideosfortsg_tpu.parallel.tensor_parallel import (
    bilstm_hidden_sharded, create_tp_mesh)

T, B, H, D = 12, 8, 16, 24


def _params_and_ref(num_layers):
    rng = np.random.default_rng(7)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    mod = BiLSTM(hidden_size=H, num_layers=num_layers, dropout=0.0)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    ref, _, _ = mod.apply({"params": params}, jnp.asarray(x))
    return params, x, np.asarray(ref)


def test_model_mesh_equals_bilstm():
    """8-way pure model parallelism == the lax.scan module, 2 layers."""
    params, x, ref = _params_and_ref(2)
    mesh = create_tp_mesh(1, 8)
    out = jax.jit(lambda p, a: bilstm_hidden_sharded(
        p, a, mesh, 2, data_axis=None))(
            params, jnp.transpose(jnp.asarray(x), (1, 0, 2)))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (1, 0, 2)),
                               ref, rtol=1e-5, atol=1e-5)


def test_2d_mesh_equals_bilstm():
    """2x4 data-x-model mesh: batch shards over 'data' while hidden
    shards over 'model'; result equals the module."""
    params, x, ref = _params_and_ref(1)
    mesh = create_tp_mesh(2, 4)
    out = jax.jit(lambda p, a: bilstm_hidden_sharded(p, a, mesh, 1))(
        params, jnp.transpose(jnp.asarray(x), (1, 0, 2)))
    np.testing.assert_allclose(np.transpose(np.asarray(out), (1, 0, 2)),
                               ref, rtol=1e-5, atol=1e-5)


def test_indivisible_hidden_raises():
    params, x, _ = _params_and_ref(1)
    mesh = create_tp_mesh(1, 3)
    with pytest.raises(ValueError, match="divide"):
        bilstm_hidden_sharded(params, jnp.transpose(
            jnp.asarray(x), (1, 0, 2)), mesh, 1, data_axis=None)


def test_too_few_devices_raises():
    with pytest.raises(ValueError, match="devices"):
        create_tp_mesh(4, 4)


def test_model_mesh_gradients_equal_bilstm():
    """Backward through the hidden-sharded recurrence: jax.grad through
    the shard_map (the per-step all-gather transposes to a reduce-scatter
    in the VJP — XLA inserts it) must match grads through the lax.scan
    module, for every layer's weights AND the input."""
    params, x, _ = _params_and_ref(2)
    mesh = create_tp_mesh(1, 8)
    xt = jnp.transpose(jnp.asarray(x), (1, 0, 2))

    def loss_tp(p, a):
        y = bilstm_hidden_sharded(p, a, mesh, 2, data_axis=None)
        return jnp.sum(jnp.sin(y))

    def loss_ref(p, a):
        y, _, _ = BiLSTM(hidden_size=H, num_layers=2, dropout=0.0).apply(
            {"params": p}, jnp.transpose(a, (1, 0, 2)))
        return jnp.sum(jnp.sin(jnp.transpose(y, (1, 0, 2))))

    (g_tp, gx_tp) = jax.jit(jax.grad(loss_tp, argnums=(0, 1)))(params, xt)
    (g_rf, gx_rf) = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(params, xt)
    for k in g_rf:
        np.testing.assert_allclose(np.asarray(g_tp[k]), np.asarray(g_rf[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)
    np.testing.assert_allclose(np.asarray(gx_tp), np.asarray(gx_rf),
                               rtol=2e-5, atol=2e-6)


def test_2d_mesh_gradients_equal_bilstm():
    """Same on a 2x4 data-x-model mesh: batch sharding composes with the
    weight-shard VJP (grads psum over 'data' automatically)."""
    params, x, _ = _params_and_ref(1)
    mesh = create_tp_mesh(2, 4)
    xt = jnp.transpose(jnp.asarray(x), (1, 0, 2))

    def loss_tp(p, a):
        y = bilstm_hidden_sharded(p, a, mesh, 1)
        return jnp.sum(jnp.sin(y))

    def loss_ref(p, a):
        y, _, _ = BiLSTM(hidden_size=H, num_layers=1, dropout=0.0).apply(
            {"params": p}, jnp.transpose(a, (1, 0, 2)))
        return jnp.sum(jnp.sin(jnp.transpose(y, (1, 0, 2))))

    g_tp = jax.jit(jax.grad(loss_tp))(params, xt)
    g_rf = jax.jit(jax.grad(loss_ref))(params, xt)
    for k in g_rf:
        np.testing.assert_allclose(np.asarray(g_tp[k]), np.asarray(g_rf[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)
