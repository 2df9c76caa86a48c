"""Pipeline-parallel QAVE tail: the GPipe microbatch schedule over a
'pipe' mesh axis must equal running the blocks sequentially through the
flax modules, on a pure pipe mesh and on a 2D data-x-pipe mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.models.components import QueryAwareEncoder
from shufflingvideosfortsg_tpu.parallel.pipeline import (
    create_pp_mesh, qave_pipelined, stack_stage_params)

B, T, N, Dv, Ds, H = 8, 12, 5, 16, 16, 8
NBLOCKS = 5  # block0 + 4 pipelined stages


def _params_and_ref():
    rng = np.random.default_rng(3)
    video = rng.standard_normal((B, T, Dv)).astype(np.float32)
    word = rng.standard_normal((B, N, Ds)).astype(np.float32)
    mod = QueryAwareEncoder(hidden_dim=H, n_layers=1, nblocks=NBLOCKS,
                            dropout=0.0)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(video),
                      jnp.asarray(word))["params"]
    ref = mod.apply({"params": params}, jnp.asarray(video),
                    jnp.asarray(word))
    return params, video, word, np.asarray(ref)


def _run(mesh, params, video, word, n_micro, data_axis):
    stacked = stack_stage_params(
        [params[f"block{i}"] for i in range(1, NBLOCKS)], mesh=mesh)
    fn = lambda p, st, v, w: qave_pipelined(  # noqa: E731
        p, st, v, w, mesh, hidden_dim=H, n_layers=1, nblocks=NBLOCKS,
        n_micro=n_micro, data_axis=data_axis)
    return np.asarray(jax.jit(fn)(params, stacked, jnp.asarray(video),
                                  jnp.asarray(word)))


def test_pipe_mesh_equals_sequential():
    """1x4 pure pipeline mesh, 4 microbatches == the sequential stack."""
    params, video, word, ref = _params_and_ref()
    mesh = create_pp_mesh(1, 4)
    out = _run(mesh, params, video, word, n_micro=4, data_axis=None)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_2d_mesh_equals_sequential():
    """2x4 data-x-pipe mesh: batch shards over 'data' while stages shard
    over 'pipe'; 2 microbatches of the local batch."""
    params, video, word, ref = _params_and_ref()
    mesh = create_pp_mesh(2, 4)
    out = _run(mesh, params, video, word, n_micro=2, data_axis="data")
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_stage_count_mismatch_raises():
    params, video, word, _ = _params_and_ref()
    mesh = create_pp_mesh(1, 8)
    stacked = stack_stage_params(
        [params[f"block{i}"] for i in range(1, NBLOCKS)])
    with pytest.raises(ValueError, match="mesh axis"):
        qave_pipelined(params, stacked, jnp.asarray(video),
                       jnp.asarray(word), mesh, hidden_dim=H, n_layers=1,
                       nblocks=NBLOCKS, n_micro=2, data_axis=None)


def test_heterogeneous_stages_raise():
    a = {"w": jnp.zeros((2, 3))}
    with pytest.raises(ValueError, match="homogeneous"):
        stack_stage_params([a, {"w": jnp.zeros((2, 4))}])
    with pytest.raises(ValueError, match="treedef"):
        stack_stage_params([a, {"v": jnp.zeros((2, 3))}])


def test_indivisible_microbatch_raises():
    params, video, word, _ = _params_and_ref()
    mesh = create_pp_mesh(1, 4)
    with pytest.raises(ValueError, match="microbatch"):
        _run(mesh, params, video, word, n_micro=3, data_axis=None)


def test_pipeline_gradients_equal_sequential():
    """Backward through the GPipe schedule: jax.grad reverses the tick
    scan — microbatch cotangents ripple right-to-left via the transposed
    ppermute, which IS the GPipe backward schedule. Grads w.r.t. block0,
    the stacked stage weights, the final norm, and both inputs must match
    the sequential stack."""
    params, video, word, _ = _params_and_ref()
    mesh = create_pp_mesh(1, 4)
    stacked = stack_stage_params(
        [params[f"block{i}"] for i in range(1, NBLOCKS)], mesh=mesh)
    mod = QueryAwareEncoder(hidden_dim=H, n_layers=1, nblocks=NBLOCKS,
                            dropout=0.0)
    v, w = jnp.asarray(video), jnp.asarray(word)

    def loss_pp(p, st, v, w):
        y = qave_pipelined(p, st, v, w, mesh, hidden_dim=H, n_layers=1,
                           nblocks=NBLOCKS, n_micro=4, data_axis=None)
        return jnp.sum(jnp.sin(y))

    def loss_ref(p, v, w):
        return jnp.sum(jnp.sin(mod.apply({"params": p}, v, w)))

    gp, gs, gv, gw = jax.jit(jax.grad(loss_pp, argnums=(0, 1, 2, 3)))(
        params, stacked, v, w)
    gr, gv_r, gw_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(
        params, v, w)

    def close(a, b, msg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-6, err_msg=msg)

    for part in ("block0", "norm"):
        for (ka, a), b in zip(jax.tree.leaves_with_path(gp[part]),
                              jax.tree.leaves(gr[part])):
            close(a, b, f"{part}{jax.tree_util.keystr(ka)}")
    for i in range(1, NBLOCKS):
        sl = jax.tree.map(lambda a, i=i: a[i - 1], gs)
        for (ka, a), b in zip(jax.tree.leaves_with_path(sl),
                              jax.tree.leaves(gr[f"block{i}"])):
            close(a, b, f"stage{i}{jax.tree_util.keystr(ka)}")
    close(gv, gv_r, "d/dvideo")
    close(gw, gw_r, "d/dword")
