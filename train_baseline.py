#!/usr/bin/env python3
"""QAVE baseline training driver (grounding loss only).

CLI-compatible with the reference entry point:
    python train_baseline.py --cfg charades_cd_i3d.yml --alias <name>
"""

from shufflingvideosfortsg_tpu.cli import main_train_baseline, parse_params

if __name__ == '__main__':
    params = parse_params(default_model='QAVE')
    main_train_baseline(params)
    print('Training finished successfully!')
