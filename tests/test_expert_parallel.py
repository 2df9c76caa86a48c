"""Expert-parallel MoE FFN: the all_to_all-dispatched sharded layer must
equal the dense per-stripe oracle (same routing, same capacity drops),
for the forward value AND the gradient, on a pure expert mesh and on a
2D data-x-expert mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.parallel.expert_parallel import (
    create_ep_mesh, init_moe_params, moe_ffn_dense, moe_ffn_sharded,
    moe_span_head)

C, HM, E, CAP = 16, 24, 8, 6
S = 64  # total tokens; stripes of S/n per device


def _setup():
    params = init_moe_params(jax.random.PRNGKey(0), C, HM, E)
    x = np.random.default_rng(5).standard_normal((S, C)).astype(np.float32)
    return params, jnp.asarray(x)


def _dense_striped(params, x, n):
    """Oracle: dense layer applied independently per device stripe
    (capacity is per (device, expert), exactly as the sharded layer)."""
    stripes = jnp.split(x, n)
    return jnp.concatenate(
        [moe_ffn_dense(params, s, CAP) for s in stripes])


def test_expert_mesh_equals_dense():
    params, x = _setup()
    mesh = create_ep_mesh(1, 8)
    out = jax.jit(lambda p, a: moe_ffn_sharded(p, a, mesh, CAP,
                                               data_axis=None))(params, x)
    ref = _dense_striped(params, x, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_2d_mesh_equals_dense():
    params, x = _setup()
    mesh = create_ep_mesh(2, 4)
    out = jax.jit(lambda p, a: moe_ffn_sharded(p, a, mesh, CAP))(params, x)
    ref = _dense_striped(params, x, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradient_matches_dense():
    """Router + expert gradients flow through dispatch/combine and the
    all_to_all pair identically to the dense oracle."""
    params, x = _setup()
    mesh = create_ep_mesh(1, 8)
    loss_sh = lambda p: jnp.sum(  # noqa: E731
        moe_ffn_sharded(p, x, mesh, CAP, data_axis=None) ** 2)
    loss_dn = lambda p: jnp.sum(_dense_striped(p, x, 8) ** 2)  # noqa: E731
    g_sh = jax.jit(jax.grad(loss_sh))(params)
    g_dn = jax.jit(jax.grad(loss_dn))(params)
    for k in params:
        np.testing.assert_allclose(np.asarray(g_sh[k]), np.asarray(g_dn[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)


def test_capacity_drops_fall_back_to_identity():
    """moe_span_head is residual: with capacity 0 every token drops and
    the head is exactly the identity."""
    params, x = _setup()
    feat = x.reshape(4, S // 4, C)
    out = moe_span_head(params, feat, capacity=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(feat))


def test_indivisible_experts_raise():
    params, x = _setup()
    mesh = create_ep_mesh(1, 3)
    with pytest.raises(ValueError, match="divide"):
        moe_ffn_sharded(params, x[:48], mesh, CAP, data_axis=None)
