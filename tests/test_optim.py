"""Optimizer/schedule parity vs torch semantics."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.train.state import (create_train_state,
                                                   group_weight_mask,
                                                   lr_schedule_fn,
                                                   make_optimizer)


def _params(**over):
    p = dict(optim='adam', lr=1e-3, weight_decay=1e-4, lr_schd='ms',
             lr_step=[15], lr_decay_rate=0.1, momentum=0.8, grad_clip=False,
             grad_clip_max=1.0, group_weight=False)
    p.update(over)
    return p


def test_multistep_schedule():
    fn = lr_schedule_fn(_params(), steps_per_epoch=10)
    # epochs 0..14 -> lr, 15+ -> lr*0.1 (torch MultiStepLR semantics)
    assert float(fn(0)) == pytest.approx(1e-3)
    assert float(fn(149)) == pytest.approx(1e-3)
    assert float(fn(150)) == pytest.approx(1e-4)
    assert float(fn(400)) == pytest.approx(1e-4)


def test_multistep_multiple_milestones():
    fn = lr_schedule_fn(_params(lr_step=[2, 4]), steps_per_epoch=1)
    vals = [float(fn(s)) for s in range(6)]
    np.testing.assert_allclose(
        vals, [1e-3, 1e-3, 1e-4, 1e-4, 1e-5, 1e-5], rtol=1e-6)


def test_lambda_schedule_quirk():
    # reference LambdaLR factor = lr - epoch*1e-6 (multiplicative!)
    fn = lr_schedule_fn(_params(lr_schd='l'), steps_per_epoch=10)
    assert float(fn(0)) == pytest.approx(1e-3 * 1e-3)
    assert float(fn(20)) == pytest.approx(1e-3 * (1e-3 - 2e-6))


@pytest.mark.parametrize("optim", ["adam", "sgd"])
def test_step_parity_vs_torch(optim, rng):
    w0 = rng.randn(4, 3).astype(np.float32)
    grads_seq = [rng.randn(4, 3).astype(np.float32) for _ in range(4)]

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    if optim == 'adam':
        topt = torch.optim.Adam([tw], lr=1e-3, weight_decay=1e-4, eps=1e-6)
    else:
        topt = torch.optim.SGD([tw], lr=1e-3, weight_decay=1e-4, momentum=0.8)
    for g in grads_seq:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    tx = make_optimizer(_params(optim=optim), steps_per_epoch=1000)
    state = create_train_state({'w': jnp.array(w0)}, tx)
    for g in grads_seq:
        state = state.apply_gradients({'w': jnp.array(g)})
    np.testing.assert_allclose(np.asarray(state.params['w']),
                               tw.detach().numpy(), atol=1e-6, rtol=1e-5)


def test_group_weight_mask():
    tree = {
        'encoder': {
            'dense': {'kernel': np.zeros((2, 2)), 'bias': np.zeros(2)},
            'norm': {'scale': np.ones(2), 'bias': np.zeros(2)},
            'rnn': {'w_ih_l0': np.zeros((2, 2, 8)), 'b_ih_l0': np.zeros((2, 8))},
        }
    }
    mask = group_weight_mask(tree)
    assert mask['encoder']['dense']['kernel'] is True
    assert mask['encoder']['dense']['bias'] is False
    assert mask['encoder']['norm']['scale'] is False
    assert mask['encoder']['norm']['bias'] is False
    assert mask['encoder']['rnn']['w_ih_l0'] is True
    assert mask['encoder']['rnn']['b_ih_l0'] is True  # reference decays RNN biases


def test_grad_clip_applied():
    # use SGD: Adam's moment normalization is scale-invariant, so clipping
    # is only observable through a scale-sensitive optimizer
    tx = make_optimizer(_params(optim='sgd', grad_clip=True,
                                grad_clip_max=0.001, weight_decay=0.0),
                        steps_per_epoch=1)
    state = create_train_state({'w': jnp.zeros(3)}, tx)
    state = state.apply_gradients({'w': jnp.array([100.0, 0.0, 0.0])})
    # |update| <= lr * clipped_norm = 1e-3 * 1e-3
    assert np.abs(np.asarray(state.params['w'])).max() <= 1.1e-6
    assert np.abs(np.asarray(state.params['w'])).max() > 0
