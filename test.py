#!/usr/bin/env python3
"""Shuffling-framework (GMD) evaluation driver.

CLI-compatible with the reference entry point:
    python test.py --cfg charades_cd_i3d.yml --alias test_<name>
Loads `start_from` (ours or a reference torch .ckp), dumps the submit JSON,
and prints the retrieval metric table.
"""

from shufflingvideosfortsg_tpu.cli import main_test, parse_params

if __name__ == '__main__':
    params = parse_params(default_model='GMD')
    main_test(params)
    print('Testing finished successfully!')
