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
