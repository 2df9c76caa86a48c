"""On-device pseudo-video generation (the shuffling framework's hot path).

The reference builds the pseudo video per sample inside DataLoader workers
with np.delete/np.insert (grounding/dataset/data_augment.py:135-156 via
charades_pair_aug.py:102). On TPU the same transform is a pure index
permutation of the padded [T, D] feature array, so it runs *inside* the
jitted train step as a gather keyed by the batch PRNG: no second video
tensor crosses host->device, and the work is one [B, T] gather.

``gt_translate_batch`` also recomputes the four masks for the translated
span on device (broadcasted-iota comparisons — no host round trip).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def gt_translate_indices(s: jnp.ndarray, e: jnp.ndarray, n: jnp.ndarray,
                         cropin: jnp.ndarray, T: int
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gather map for one sample's gt_moment_translate.

    s, e: GT span (inclusive); n: nfeats; cropin: new start. Returns
    (idx [T], new_s, new_e). For the no-op condition (span length <= 1 or
    >= nfeats) the identity map and original span are returned — the same
    guard as the reference (data_augment.py:137-139).

    Output position t reads from:
      t < cropin:        t        if t < s else t + L    (the wo-GT prefix)
      cropin <= t <= ne: s + (t - cropin)                (the moved moment)
      t > ne:            t - L    if t - L < s else t    (the wo-GT suffix)
    Positions t >= n keep reading zero-padded slots (map stays >= n there).
    """
    L = e - s + 1
    ts = jnp.arange(T, dtype=jnp.int32)
    new_s = cropin
    new_e = cropin + L - 1
    before = jnp.where(ts < s, ts, ts + L)
    inside = s + (ts - cropin)
    after = jnp.where(ts - L < s, ts - L, ts)
    idx = jnp.where(ts < new_s, before, jnp.where(ts <= new_e, inside, after))
    idx = jnp.clip(idx, 0, T - 1)
    noop = (L <= 1) | (L >= n)
    idx = jnp.where(noop, ts, idx)
    new_s = jnp.where(noop, s, new_s)
    new_e = jnp.where(noop, e, new_e)
    return idx, new_s, new_e


def device_masks(framestps_s: jnp.ndarray, framestps_e: jnp.ndarray,
                 nfeats: jnp.ndarray, T: int) -> Dict[str, jnp.ndarray]:
    """The four reference masks, batched (inclusive ends, like
    data/masks.py)."""
    ts = jnp.arange(T, dtype=jnp.int32)[None, :]
    s = framestps_s[:, None]
    e = framestps_e[:, None]
    n = nfeats[:, None]

    def incl(lo, hi):
        hi = jnp.minimum(hi, T - 1)
        lo = jnp.maximum(lo, 0)
        return ((ts >= lo) & (ts <= hi)).astype(jnp.int32)

    return {
        'video_mask': incl(jnp.zeros_like(n), n),
        'temporal_labels': incl(s, e),
        'fore_masks': incl(jnp.zeros_like(s), s),
        'back_masks': incl(e, n),
    }


def gt_translate_batch(key: jax.Array, video_feat: jnp.ndarray,
                       framestps: jnp.ndarray, nfeats: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Batched on-device gt_moment_translate.

    video_feat: [B, T, D] zero-padded; framestps: [B, 2] int; nfeats: [B].
    Returns (pseudo_feat [B,T,D], pseudo_framestps [B,2], pseudo masks).

    The insertion offset is uniform on [0, nfeats - L] inclusive, matching
    the reference's randint bounds (data_augment.py:150).
    """
    B, T, _ = video_feat.shape
    s = framestps[:, 0].astype(jnp.int32)
    e = framestps[:, 1].astype(jnp.int32)
    n = nfeats.astype(jnp.int32)
    L = e - s + 1
    hi = jnp.maximum(n - L, 0)  # inclusive upper bound
    u = jax.random.uniform(key, (B,))
    cropin = jnp.minimum((u * (hi + 1).astype(jnp.float32)).astype(jnp.int32), hi)

    idx, new_s, new_e = jax.vmap(gt_translate_indices, in_axes=(0, 0, 0, 0, None)
                                 )(s, e, n, cropin, T)
    pseudo = jnp.take_along_axis(video_feat, idx[:, :, None], axis=1)
    masks = device_masks(new_s, new_e, n, T)
    pseudo_framestps = jnp.stack([new_s, new_e], axis=-1)
    return pseudo, pseudo_framestps, masks


def segment_shuffle_batch(key: jax.Array, video_feat: jnp.ndarray,
                          seg_len: int) -> jnp.ndarray:
    """On-device segment-permutation shuffle (data_augment.py:158-166):
    split [T] into T//seg_len segments and permute them (shared tail kept
    in place when T % seg_len != 0). Independent permutation per sample."""
    B, T, D = video_feat.shape
    T_ = T // seg_len
    body = video_feat[:, :T_ * seg_len].reshape(B, T_, seg_len, D)
    perms = jax.vmap(lambda k: jax.random.permutation(k, T_))(
        jax.random.split(key, B))
    shuffled = jnp.take_along_axis(body, perms[:, :, None, None], axis=1)
    out = shuffled.reshape(B, T_ * seg_len, D)
    if T_ * seg_len < T:
        out = jnp.concatenate([out, video_feat[:, T_ * seg_len:]], axis=1)
    return out
