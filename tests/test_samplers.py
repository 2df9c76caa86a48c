"""Feature samplers vs per-clip loop oracles (restating the published loops
from charades.py:177-196 / anet.py:173-230)."""

import numpy as np
import pytest

from shufflingvideosfortsg_tpu.data.samplers import (
    frame_to_second, frame_to_second_114, lg_fixed_length, one_to_one,
    pair_mean_pool, triple_mean_pool)


def oracle_pair_pool(fts, sample_len):
    cn, dim = fts.shape
    out = np.zeros((1, sample_len, dim))
    add = 0
    for i in range(cn):
        if i % 2 == 0 and i + 1 <= cn - 1:
            out[0, add] = fts[i:i + 2].mean(0)
            add += 1
        elif i % 2 == 0 and i + 1 > cn - 1:
            out[0, add] = fts[i]
            add += 1
        if add == sample_len:
            return out, add
    return out, add


def oracle_triple_pool(fts, sample_len):
    cn, dim = fts.shape
    out = np.zeros((1, sample_len, dim))
    add = 0
    for i in range(cn):
        if i % 3 == 0:
            if i + 2 <= cn - 1:
                out[0, add] = fts[i:i + 3].mean(0)
            elif i + 1 <= cn - 1:
                out[0, add] = fts[i:i + 2].mean(0)
            else:
                out[0, add] = fts[i]
            add += 1
        if add == sample_len:
            return out, add
    return out, add


@pytest.mark.parametrize("cn", [1, 2, 7, 64, 255, 256, 400])
def test_pair_mean_pool(rng, cn):
    fts = rng.randn(cn, 6)
    out, stamps, n = pair_mean_pool(fts, (3.7, 12.2), 30.0, 128)
    want, want_n = oracle_pair_pool(fts, 128)
    assert n == want_n
    np.testing.assert_allclose(out, want, rtol=1e-12)
    assert stamps == [3, 12]


@pytest.mark.parametrize("cn", [1, 2, 3, 8, 100, 500])
def test_triple_mean_pool(rng, cn):
    fts = rng.randn(cn, 5)
    out, _, n = triple_mean_pool(fts, (0, 1), 10.0, 128)
    want, want_n = oracle_triple_pool(fts, 128)
    assert n == want_n
    np.testing.assert_allclose(out, want, rtol=1e-12)


def test_one_to_one(rng):
    fts = rng.randn(300, 4)
    out, stamps, n = one_to_one(fts, (250.0, 400.0), 500.0, 240)
    assert n == 240
    np.testing.assert_allclose(out[0], fts[:240])
    assert stamps == [239, 239]  # both clipped to SAMPLE_LEN-1


def test_frame_to_second(rng):
    fts = rng.randn(77, 4)
    duration = 30.5
    out, _, n = frame_to_second(fts, (0, 5), duration, 240)
    assert n == 31  # i in [0,240) with i < 30.5
    rate = 77 / duration
    for i in range(240):
        if i < duration:
            np.testing.assert_allclose(out[0, i], fts[int(np.floor(i * rate))])
        else:
            np.testing.assert_array_equal(out[0, i], 0)


def test_frame_to_second_114_returns_clip_count(rng):
    fts = rng.randn(90, 4)
    out, _, n = frame_to_second_114(fts, (0, 5), 45.0, 240)
    assert n == 90  # the reference's quirk: nfeats = raw clip count
    rate = 2.0
    np.testing.assert_allclose(out[0, 0], fts[0:2].mean(0))
    np.testing.assert_allclose(out[0, 10], fts[20:22].mean(0))


def test_lg_fixed_length_eval(rng):
    fts = rng.randn(300, 4)
    out, (si, ei), n = lg_fixed_length(fts, (10.0, 20.0), 60.0, 128, False,
                                       np.random.RandomState(0))
    assert n == 128
    assert 0 <= si <= ei or ei == 127
    # stride sampling: first sampled clip is clip 0 when spos=0
    np.testing.assert_allclose(out[0, 0], fts[0])


def test_lg_short_video(rng):
    fts = rng.randn(50, 4)
    out, _, n = lg_fixed_length(fts, (1.0, 3.0), 10.0, 128, False,
                                np.random.RandomState(0))
    assert n == 50
    np.testing.assert_allclose(out[0, :50], fts)
    np.testing.assert_array_equal(out[0, 50:], 0)
