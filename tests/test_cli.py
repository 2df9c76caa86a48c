"""CLI flag surface: parse_params merge semantics, reference flag set."""

import os

import pytest

from shufflingvideosfortsg_tpu.cli import build_argparser, parse_params

CFG = "/root/reference/grounding/cfgs/charades_cd_i3d.yml"


def test_all_reference_flags_exist():
    parser = build_argparser()
    # the flag set the reference README uses
    args = parser.parse_args([
        '--cfg', 'charades_cd_i3d.yml', '--alias', 'x', '--gpu_id', '0',
        '--lr', '0.001', '--batch_size', '32', '28', '64',
        '--epoch', '30', '--if_aug', '--aug_mode', 'gt_translate',
        '--video_len', '128', '--sent_len', '15', '--mask',
        '--predictor', 'mlp', '--m_pred_hidden', '1024',
    ])
    assert args.alias == 'x'
    assert args.batch_size == [32, 28, 64]
    assert args.if_aug is True


@pytest.mark.skipif(not os.path.isfile(CFG), reason="reference cfg missing")
def test_yaml_wins_over_defaults_cli_wins_over_yaml():
    params = parse_params(['--cfg', CFG, '--alias', 'abc'])
    assert params['video_len'] == 128        # YAML over default
    assert params['alias'] == 'abc'          # explicit CLI survives
    assert params['sent_rnn_hiddendim'] == 256
    params2 = parse_params(['--cfg', CFG, '--video_len', '64'])
    assert params2['video_len'] == 64        # explicit CLI over YAML


def test_gpu_id_accepted():
    params = parse_params(['--gpu_id', '3'])
    assert params['gpu_id'] == 3  # accepted (and ignored downstream)


@pytest.mark.skipif(not os.path.isfile(CFG), reason="reference cfg missing")
def test_explicit_flag_at_default_value_beats_yaml():
    # YAML sets sent_len: 15; the argparse default is 20. Typing
    # `--sent_len 20` explicitly must override the YAML (presence-tracked
    # merge, not value comparison).
    params = parse_params(['--cfg', CFG])
    assert params['sent_len'] == 15           # YAML wins when flag untyped
    params2 = parse_params(['--cfg', CFG, '--sent_len', '20'])
    assert params2['sent_len'] == 20          # explicit flag at its default
