"""Train state + optimizer factory with reference-equivalent semantics.

Optimizers (reference: grounding/train.py:367-380):
- adam:  torch.optim.Adam(lr, weight_decay, eps=1e-6) — L2-style weight
  decay folded into the gradient BEFORE the Adam moments (optax ordering:
  add_decayed_weights -> scale_by_adam), eps after the sqrt, eps_root=0.
- adamw: decoupled decay (optax.adamw).
- sgd:   momentum=params['momentum'], L2 decay.

LR schedules (train.py:382-387), epoch-granular like torch:
- 'ms' MultiStepLR(milestones=lr_step, gamma=lr_decay_rate)
- 'l'  LambdaLR with the reference's factor ``lr - epoch * 1e-6``
  (a multiplicative factor, so actual lr = lr * (lr - epoch*1e-6) —
  reproduced as-is).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def lr_schedule_fn(params: Dict[str, Any], steps_per_epoch: int
                   ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    base_lr = float(params['lr'])
    schd = str(params.get('lr_schd', 'ms')).lower()
    if schd in ('multistep', 'ms'):
        milestones = jnp.asarray(sorted(params.get('lr_step', [15])),
                                 dtype=jnp.int32)
        gamma = float(params.get('lr_decay_rate', 0.1))

        def fn(step):
            epoch = step // steps_per_epoch
            n = jnp.sum(epoch >= milestones)
            return base_lr * (gamma ** n)
        return fn
    if schd in ('lambda', 'l'):
        def fn(step):
            epoch = jnp.asarray(step // steps_per_epoch, jnp.float32)
            return base_lr * (base_lr - epoch * 1e-6)
        return fn
    raise ValueError(f'unknown lr_schd: {schd}')


def group_weight_mask(params_tree) -> Any:
    """Decay mask replicating the reference's group_weight partition
    (helper_function.py:43-70): Linear kernels decay, Linear biases and
    LayerNorm scale/bias do not; RNN weights AND biases decay (they fall
    into the leftover 'no children' group there)."""
    def walk(node):
        if isinstance(node, dict):
            keys = set(node.keys())
            if 'kernel' in keys:  # a Dense: kernel decays, bias doesn't
                return {k: (k == 'kernel') for k in keys}
            if keys == {'scale', 'bias'}:  # LayerNorm: no decay
                return {k: False for k in keys}
            return {k: walk(v) for k, v in node.items()}
        return True
    return walk(jax.tree_util.tree_map(lambda x: x, params_tree))


def _decay(wd: float, use_groups: bool) -> optax.GradientTransformation:
    if use_groups:
        return optax.masked(optax.add_decayed_weights(wd), group_weight_mask)
    return optax.add_decayed_weights(wd)


def make_optimizer(params: Dict[str, Any], steps_per_epoch: int
                   ) -> optax.GradientTransformation:
    schedule = lr_schedule_fn(params, steps_per_epoch)
    wd = float(params.get('weight_decay', 0.0))
    grouped = bool(params.get('group_weight', False))
    name = str(params.get('optim', 'adam')).lower()
    chain = []
    if params.get('grad_clip'):
        chain.append(optax.clip_by_global_norm(float(params['grad_clip_max'])))
    if name == 'adam':
        if wd:
            chain.append(_decay(wd, grouped))
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-6, eps_root=0.0))
    elif name == 'adamw':
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8, eps_root=0.0))
        if wd:
            chain.append(_decay(wd, grouped))
    elif name == 'sgd':
        if wd:
            chain.append(_decay(wd, grouped))
        chain.append(optax.trace(decay=float(params.get('momentum', 0.8)),
                                 nesterov=False))
    else:
        raise ValueError(f'unknown optimizer: {name}')
    chain.append(optax.scale_by_schedule(lambda s: -schedule(s)))
    return optax.chain(*chain)


def create_train_state(params_tree, tx) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params_tree,
                      opt_state=tx.init(params_tree), tx=tx)
