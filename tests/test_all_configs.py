"""Every shipped config must build a GMD and a Baseline whose full forward
shape-checks at the config's real dimensions (jax.eval_shape — no compute)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.config import load_config
from shufflingvideosfortsg_tpu.models import build_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFGS = ["charades_cd_i3d.yml", "anet_cd_i3d.yml", "charades_i3d.yml",
        "anet_i3d.yml", "anet_c3d.yml", "anet_cd_c3d.yml",
        "charades_lgi3d.yml"]


@pytest.mark.parametrize("cfg", CFGS)
def test_config_builds_and_shape_checks(cfg):
    params = load_config(os.path.join(REPO, "cfgs", cfg))
    B, T, N = 2, params["video_len"], params["sent_len"]
    Dv = params["video_feature_dim"]
    video = jax.ShapeDtypeStruct((B, T, Dv), jnp.float32)
    sent = jax.ShapeDtypeStruct((B, N, 300), jnp.float32)
    mask_t = jax.ShapeDtypeStruct((B, T), jnp.int32)
    mask_n = jax.ShapeDtypeStruct((B, N), jnp.int32)

    gmd = build_model(params, "gmd")
    shapes = jax.eval_shape(
        gmd.init, jax.random.PRNGKey(0), sent, mask_n, video, mask_t,
        video, mask_t, mask_t, mask_t, mask_t, mask_t, mask_t, mask_t)
    n_params = sum(int(np.prod(s.shape))
                   for s in jax.tree_util.tree_leaves(shapes))
    assert n_params > 1e6  # full-size model

    base = build_model(params, "baseline")
    out = jax.eval_shape(
        lambda v: base.apply(v, jnp.zeros((B, T, Dv)), jnp.zeros((B, N, 300))),
        jax.eval_shape(base.init, jax.random.PRNGKey(0), video, sent))
    assert out["start_prob"].shape == (B, T)
    assert out["end_prob"].shape == (B, T)
