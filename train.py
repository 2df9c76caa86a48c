#!/usr/bin/env python3
"""Shuffling-framework (GMD) training driver.

CLI-compatible with the reference entry point:
    python train.py --cfg charades_cd_i3d.yml --alias <name> [--gpu_id N]
(`--gpu_id` is accepted and ignored; devices are managed by JAX/TPU.)
"""

from shufflingvideosfortsg_tpu.cli import main_train, parse_params

if __name__ == '__main__':
    params = parse_params(default_model='QAVE_match')
    main_train(params)
    print('Training finished successfully!')
