"""Checkpointing: roundtrip of {params, opt_state, step, rng}; reading
reference-format torch .ckp files through the converter."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from shufflingvideosfortsg_tpu.train.state import (create_train_state,
                                                   make_optimizer)
from shufflingvideosfortsg_tpu.utils.saver import (RunManager,
                                                   load_checkpoint,
                                                   restore_train_state,
                                                   save_checkpoint)


def _opt_params():
    return dict(optim='adam', lr=1e-3, weight_decay=1e-4, lr_schd='ms',
                lr_step=[15], lr_decay_rate=0.1, grad_clip=False)


def test_roundtrip(tmp_path, rng):
    tree = {'a': {'kernel': jnp.array(rng.randn(3, 4), jnp.float32)},
            'b': jnp.array(rng.randn(5), jnp.float32)}
    tx = make_optimizer(_opt_params(), 10)
    state = create_train_state(tree, tx)
    state = state.apply_gradients(jax.tree_util.tree_map(jnp.ones_like, tree))
    key = jax.random.PRNGKey(42)

    path = str(tmp_path / 'x.ckp')
    save_checkpoint(path, state, key)
    payload, is_ref = load_checkpoint(path)
    assert not is_ref
    assert payload['step'] == 1
    np.testing.assert_array_equal(payload['rng'], np.asarray(key))
    np.testing.assert_allclose(payload['params']['a']['kernel'],
                               np.asarray(state.params['a']['kernel']))

    fresh = create_train_state(jax.tree_util.tree_map(jnp.zeros_like, tree), tx)
    restored = restore_train_state(fresh, payload)
    assert int(restored.step) == 1
    np.testing.assert_allclose(np.asarray(restored.params['b']),
                               np.asarray(state.params['b']))
    # optimizer moments restored
    flat_a = jax.tree_util.tree_leaves(state.opt_state)
    flat_b = jax.tree_util.tree_leaves(restored.opt_state)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_load_reference_torch_ckp(tmp_path):
    """A reference-format .ckp (raw torch state_dict) loads and converts."""
    torch.manual_seed(0)
    sd = {}

    def reg(prefix, mod):
        for k, v in mod.state_dict().items():
            sd[f'{prefix}.{k}'] = v

    reg('sentence_encoder.word_embed', torch.nn.Linear(300, 300))
    reg('sentence_encoder.rnn_cell.lstm',
        torch.nn.LSTM(300, 8, 2, batch_first=True, bidirectional=True))
    for i in range(2):
        in_dim = 16 if i == 0 else 16
        reg(f'video_encoder.blocks.{i}.rnn_cell.lstm',
            torch.nn.LSTM(in_dim, 8, 2, batch_first=True, bidirectional=True))
        reg(f'video_encoder.blocks.{i}.attention.W_s', torch.nn.Linear(16, 16, bias=False))
        reg(f'video_encoder.blocks.{i}.attention.W_a', torch.nn.Linear(16, 16))
        reg(f'video_encoder.blocks.{i}.attention.w', torch.nn.Linear(16, 1, bias=False))
        reg(f'video_encoder.blocks.{i}.sent_linear', torch.nn.Linear(16, 16))
    reg('video_encoder.norm', torch.nn.LayerNorm(16))
    for head in ('start', 'end'):
        reg(f'span_predictor.predictor.{head}_mlp_1', torch.nn.Linear(32, 8))
        reg(f'span_predictor.predictor.{head}_mlp_2', torch.nn.Linear(8, 1))
    reg('csmm.predict.predict.0', torch.nn.Linear(32, 8))
    reg('csmm.predict.predict.2', torch.nn.Linear(8, 1))
    reg('tod.foreback_context.0', torch.nn.Linear(32, 16))
    reg('tod.fc_classifier_domain_video.0', torch.nn.Linear(48, 2))

    path = str(tmp_path / 'ref.ckp')
    torch.save(sd, path)

    payload, is_ref = load_checkpoint(
        path, torch_convert_kwargs=dict(kind='gmd', predictor_name='mlp'))
    assert is_ref
    p = payload['params']
    assert p['sentence_encoder']['word_embed']['kernel'].shape == (300, 300)
    assert p['video_encoder']['block0']['rnn']['w_ih_l0'].shape == (2, 16, 32)
    assert p['tod']['classifier']['kernel'].shape == (48, 2)


def test_run_manager_layout(tmp_path):
    params = {'runs': str(tmp_path / 'runs'), 'alias': 'unit_x',
              'val_data': '/x/charades_val.json', 'test_data': '/x/t.json'}
    rm = RunManager(params)
    assert os.path.isdir(rm.model_folder)
    assert os.path.isdir(rm.submits_folder)
    assert os.path.isfile(os.path.join(rm.root_folder, 'params.json'))
    sub = rm.save_submits({'version': 'V0', 'results': {},
                           'external_data': {}}, 7)
    assert sub.endswith('unit_x_00007_charades_val.json')
    assert rm.model_path(3).endswith('unit_x_00003.ckp')


def test_async_checkpoint_matches_sync_and_survives_donation(tmp_path, rng):
    """async_checkpoint writes the same payload as the sync path, and the
    on-device snapshot (utils/saver.snapshot_state) keeps the write correct
    even when the live state's buffers are freed right after scheduling —
    the donated-buffer hazard of the jitted train steps (train/steps.py:122;
    donation is a no-op on CPU, so the hazard is simulated with an explicit
    .delete())."""
    tree = {'a': {'kernel': jnp.array(rng.randn(64, 64), jnp.float32)},
            'b': jnp.array(rng.randn(257), jnp.float32)}
    tx = make_optimizer(_opt_params(), 10)
    state = create_train_state(tree, tx)
    state = state.apply_gradients(jax.tree_util.tree_map(jnp.ones_like, tree))
    key = jax.random.PRNGKey(7)

    sync_path = str(tmp_path / 'sync.ckp')
    save_checkpoint(sync_path, state, key)

    params = {'runs': str(tmp_path / 'runs'), 'alias': 'unit_async',
              'val_data': 'v.json', 'test_data': 't.json',
              'async_checkpoint': True}
    rm = RunManager(params)
    async_path = rm.save_checkpoint(3, state, key)
    # free the live buffers while the writer drains: the snapshot must
    # have decoupled the write from them
    for leaf in jax.tree_util.tree_leaves(state):
        if isinstance(leaf, jax.Array):
            leaf.delete()
    rm.wait()

    a, _ = load_checkpoint(async_path)
    s, _ = load_checkpoint(sync_path)
    assert a['step'] == s['step']
    np.testing.assert_array_equal(a['rng'], s['rng'])
    for x, y in zip(jax.tree_util.tree_leaves(a['params']),
                    jax.tree_util.tree_leaves(s['params'])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    for x, y in zip(jax.tree_util.tree_leaves(a['opt_state']),
                    jax.tree_util.tree_leaves(s['opt_state'])):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_async_checkpoint_wait_surfaces_writer_errors(tmp_path, rng):
    tree = {'w': jnp.array(rng.randn(4, 4), jnp.float32)}
    state = create_train_state(tree, make_optimizer(_opt_params(), 10))
    params = {'runs': str(tmp_path / 'runs'), 'alias': 'unit_async_err',
              'val_data': 'v.json', 'test_data': 't.json',
              'async_checkpoint': True}
    rm = RunManager(params)
    bad = str(tmp_path / 'no_such_dir' / 'x.ckp')
    rm.save_checkpoint(bad, state)
    with pytest.raises(OSError):
        rm.wait()
    rm.wait()  # error consumed; subsequent waits are clean no-ops


def test_run_manager_alias_reuse(tmp_path):
    params = {'runs': str(tmp_path / 'runs'), 'alias': 'keepme',
              'val_data': 'v.json', 'test_data': 't.json'}
    RunManager(params)
    with pytest.raises(SystemExit):
        RunManager(params)
    # test-prefixed aliases are recycled
    params2 = dict(params, alias='test_tmp')
    RunManager(params2)
    RunManager(params2)  # no raise
