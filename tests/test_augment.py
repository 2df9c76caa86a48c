"""Augmentation: host numpy library invariants (the reference's
data_augment.py:202-226 fixture cases promoted to real unit tests) and
device-vs-host equivalence of gt_translate at fixed insertion offsets."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.data.augment import DataAugmentForTSG
from shufflingvideosfortsg_tpu.data.masks import sample_masks, sequence_mask
from shufflingvideosfortsg_tpu.ops.augment_device import (
    device_masks, gt_translate_batch, gt_translate_indices,
    segment_shuffle_batch)

T, NFEATS = 40, 40
# the reference's smoke fixture spans (data_augment.py:211)
FIXTURE_SPANS = [[10, 20], [0, 1], [0, 2], [0, 38], [0, 39], [38, 39], [37, 39]]


def ramp_video(t=T, dim=1):
    return np.arange(0, t, dtype=float).repeat(dim).reshape((1, t, dim))


def translate_contract(fstps, new_ftps, new_nfeats, out):
    s, e = fstps
    L = e - s + 1
    ns, ne = new_ftps
    flat = out.reshape(-1)
    if L <= 1 or L >= NFEATS:
        np.testing.assert_array_equal(out, ramp_video())
        return
    assert new_nfeats == NFEATS
    assert ne - ns == e - s
    # moved moment content preserved
    np.testing.assert_array_equal(flat[ns:ne + 1], np.arange(s, e + 1))
    # the remaining positions hold the complement, in order
    complement = np.concatenate([np.arange(0, s), np.arange(e + 1, NFEATS)])
    rest = np.concatenate([flat[:ns], flat[ne + 1:NFEATS]])
    np.testing.assert_array_equal(rest, complement)


@pytest.mark.parametrize("fstps", FIXTURE_SPANS)
def test_gt_translate_fixture_cases(fstps):
    aug = DataAugmentForTSG(seed=3, aug_percentage=1, mode='gt_translate')
    for _ in range(10):
        new_ftps, new_nfeats, out = aug.gt_moment_translate(
            fstps, NFEATS, ramp_video())
        translate_contract(fstps, new_ftps, new_nfeats, out)


def test_label_consistency_invariant():
    """sum(temporal_labels[s:e+1]) == e-s+1 after augmentation — the
    reference's own smoke assertion (charades_pair_aug.py:218-219)."""
    aug = DataAugmentForTSG(seed=7, aug_percentage=1, mode='gt_translate')
    for fstps in FIXTURE_SPANS:
        new_ftps, new_nfeats, _ = aug.gt_moment_translate(fstps, NFEATS, ramp_video())
        labels = sequence_mask(T, new_ftps)
        s, e = new_ftps
        assert labels[s:e + 1].sum() == e - s + 1


def test_gt_crop_semantics():
    aug = DataAugmentForTSG(seed=0, aug_percentage=1, mode='gt_crop')
    new_ftps, new_nfeats, out = aug.gt_moment_crop([10, 20], NFEATS, ramp_video())
    width = NFEATS - new_nfeats
    assert 1 <= width <= 6  # ceil(11*0.2)=3 .. ceil(11*0.5)=6
    assert new_ftps[0] == 10 and new_ftps[1] == 20 - width
    flat = out.reshape(-1)
    # prefix untouched, suffix shifted left by width, tail zero-padded
    np.testing.assert_array_equal(flat[:10], np.arange(10))
    np.testing.assert_array_equal(flat[NFEATS - width:], np.zeros(width))


def test_cropout_preserves_labels_and_outside():
    aug = DataAugmentForTSG(seed=5, aug_percentage=1, mode='gt_cropout')
    fstps = [15, 25]
    new_ftps, new_nfeats, out = aug.gt_moment_cropout(fstps, NFEATS, ramp_video())
    assert new_ftps == fstps and new_nfeats == NFEATS
    flat = out.reshape(-1)
    # outside the protected interior, everything is unchanged
    np.testing.assert_array_equal(flat[:17], np.arange(17))  # prot_start_r=15+3
    np.testing.assert_array_equal(flat[24:], np.arange(24, 40))  # prot_end_l+1


def test_segment_shuffle_is_permutation():
    aug = DataAugmentForTSG(seed=1, aug_percentage=1, mode='shuffle_temporal')
    _, _, out = aug.shuffle_temporal_order_by_short_segments(
        [0, 0], NFEATS, ramp_video(), 8)
    flat = np.sort(out.reshape(-1))
    np.testing.assert_array_equal(flat, np.arange(NFEATS))


def test_aug_percentage_zero_is_noop():
    aug = DataAugmentForTSG(seed=3, aug_percentage=0, mode='gt_translate')
    for i in range(50):
        f, n, v = aug.aug_data([10, 20], NFEATS, ramp_video())
        np.testing.assert_array_equal(v, ramp_video())
    assert aug.count == 50


# ---------------------------------------------------------------------------
# device == host at fixed insertion offset
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fstps", FIXTURE_SPANS)
@pytest.mark.parametrize("cropin_frac", [0.0, 0.33, 0.9])
def test_device_translate_matches_host(fstps, cropin_frac):
    s, e = fstps
    L = e - s + 1
    wo_len = NFEATS - L
    cropin = int(round(cropin_frac * max(wo_len, 0)))
    video = ramp_video(T, 4)

    want_ftps, want_n, want = DataAugmentForTSG.gt_moment_translate_at(
        fstps, NFEATS, video, cropin)

    idx, ns, ne = gt_translate_indices(
        jnp.int32(s), jnp.int32(e), jnp.int32(NFEATS), jnp.int32(cropin), T)
    got = np.asarray(jnp.take_along_axis(
        jnp.array(video[0]), np.asarray(idx)[:, None], axis=0))
    np.testing.assert_array_equal(got, want[0])
    assert [int(ns), int(ne)] == list(want_ftps)


def test_device_masks_match_host():
    fstps = np.array([[3, 9], [0, 0], [20, 39]], np.int32)
    nfeats = np.array([30, 40, 40], np.int32)
    got = device_masks(jnp.array(fstps[:, 0]), jnp.array(fstps[:, 1]),
                       jnp.array(nfeats), T)
    for b in range(3):
        vm, tl, fm, bm = sample_masks(T, fstps[b], nfeats[b])
        np.testing.assert_array_equal(np.asarray(got['video_mask'][b]), vm)
        np.testing.assert_array_equal(np.asarray(got['temporal_labels'][b]), tl)
        np.testing.assert_array_equal(np.asarray(got['fore_masks'][b]), fm)
        np.testing.assert_array_equal(np.asarray(got['back_masks'][b]), bm)


def test_gt_translate_batch_invariants(rng):
    B, D = 16, 8
    video = rng.randn(B, T, D).astype(np.float32)
    nfeats = rng.randint(10, T + 1, size=B).astype(np.int32)
    for b in range(B):
        video[b, nfeats[b]:] = 0.0
    s = rng.randint(0, nfeats - 1)
    e = np.minimum(s + rng.randint(0, 10, size=B), nfeats - 1)
    fstps = np.stack([s, e], -1).astype(np.int32)

    pseudo, pftps, masks = gt_translate_batch(
        jax.random.PRNGKey(0), jnp.array(video), jnp.array(fstps),
        jnp.array(nfeats))
    pseudo = np.asarray(pseudo)
    pftps = np.asarray(pftps)
    for b in range(B):
        L = fstps[b, 1] - fstps[b, 0] + 1
        assert pftps[b, 1] - pftps[b, 0] == L - 1
        assert 0 <= pftps[b, 0] and pftps[b, 1] < nfeats[b]
        # moved moment preserved exactly
        np.testing.assert_array_equal(
            pseudo[b, pftps[b, 0]:pftps[b, 1] + 1],
            video[b, fstps[b, 0]:fstps[b, 1] + 1])
        # multiset of valid frames preserved
        np.testing.assert_allclose(
            np.sort(pseudo[b, :nfeats[b]], axis=0),
            np.sort(video[b, :nfeats[b]], axis=0))
        # padding region untouched
        np.testing.assert_array_equal(pseudo[b, nfeats[b]:], 0.0)


def test_segment_shuffle_batch(rng):
    B, D, seg = 4, 3, 8
    video = rng.randn(B, T, D).astype(np.float32)
    out = np.asarray(segment_shuffle_batch(jax.random.PRNGKey(1),
                                           jnp.array(video), seg))
    for b in range(B):
        np.testing.assert_allclose(np.sort(out[b], axis=0),
                                   np.sort(video[b], axis=0), rtol=1e-6)
        # segments move as blocks
        blocks_in = {video[b, i * seg:(i + 1) * seg].tobytes()
                     for i in range(T // seg)}
        blocks_out = {out[b, i * seg:(i + 1) * seg].tobytes()
                      for i in range(T // seg)}
        assert blocks_in == blocks_out


def test_shuffle_temporal_via_aug_data_requires_seg_len():
    # The reference's aug_data dispatch passes crop *ratios* into seg_len
    # (data_augment.py:28-36 -> :158-200) and crashes with a float reshape;
    # we require an explicit seg_len and raise a clear error instead.
    aug = DataAugmentForTSG(seed=1, aug_percentage=1, mode='shuffle_temporal')
    with pytest.raises(ValueError, match='seg_len'):
        aug.aug_data([10, 20], NFEATS, ramp_video())


def test_shuffle_temporal_via_aug_data_with_seg_len():
    aug = DataAugmentForTSG(seed=1, aug_percentage=1, mode='shuffle_temporal',
                            seg_len=8)
    fstps, nfeats, out = aug.aug_data([10, 20], NFEATS, ramp_video())
    assert fstps == [10, 20] and nfeats == NFEATS
    np.testing.assert_array_equal(np.sort(out.reshape(-1)), np.arange(NFEATS))


@pytest.mark.parametrize("bad", [0.2, 0, -3, None])
def test_shuffle_functions_reject_non_integer_seg_len(bad):
    aug = DataAugmentForTSG(seed=1, aug_percentage=1, mode='shuffle_temporal')
    for fn in (aug.shuffle_temporal_order_by_short_segments,
               aug.shuffle_temporal_order_by_short_segments_pad,
               aug.shuffle_temporal_order_by_short_segments2):
        with pytest.raises(ValueError, match='seg_len'):
            fn([10, 20], NFEATS, ramp_video(), bad)


def test_device_translate_matches_host_randomized_sweep():
    """Randomized device==host equivalence over many (span, nfeats,
    insertion-offset) combinations, including boundary spans and short
    videos — generalizes the fixed fixture cases above."""
    rng = np.random.RandomState(1234)
    for _ in range(200):
        nfeats = int(rng.randint(2, T + 1))
        s = int(rng.randint(0, nfeats))
        e = int(rng.randint(s, nfeats))
        L = e - s + 1
        wo_len = nfeats - L
        cropin = int(rng.randint(0, max(wo_len, 0) + 1))
        video = np.zeros((1, T, 3), np.float32)
        video[0, :nfeats] = rng.randn(nfeats, 3).astype(np.float32)

        want_ftps, want_n, want = DataAugmentForTSG.gt_moment_translate_at(
            (s, e), nfeats, video, cropin)
        idx, ns, ne = gt_translate_indices(
            jnp.int32(s), jnp.int32(e), jnp.int32(nfeats),
            jnp.int32(cropin), T)
        got = np.asarray(jnp.take_along_axis(
            jnp.array(video[0]), np.asarray(idx)[:, None], axis=0))
        np.testing.assert_array_equal(got, want[0],
                                      err_msg=f's={s} e={e} n={nfeats} '
                                              f'cropin={cropin}')
        assert [int(ns), int(ne)] == list(want_ftps)
        assert want_n == nfeats
