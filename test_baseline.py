#!/usr/bin/env python3
"""QAVE baseline evaluation driver.

CLI-compatible with the reference entry point:
    python test_baseline.py --cfg charades_cd_i3d.yml --alias test_<name>
"""

from shufflingvideosfortsg_tpu.cli import main_test_baseline, parse_params

if __name__ == '__main__':
    params = parse_params(default_model='QAVE')
    main_test_baseline(params)
    print('Testing finished successfully!')
