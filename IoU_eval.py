#!/usr/bin/env python3
"""Standalone retrieval-metric CLI.

Drop-in for the reference's evaluator CLI (grounding/IoU_eval.py:158-173):
reads a prediction JSON (the submit-file schema) and prints the R@1 /
mIoU table in the identical format.

Usage:
    python IoU_eval.py --submit runs/.../submits/<alias>_<step>_<split>.json
"""

import argparse

from shufflingvideosfortsg_tpu.eval.iou import retrieval_eval


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--submit', type=str, required=True, help='submit file')
    args = parser.parse_args()
    retrieval_eval(args.submit)


if __name__ == '__main__':
    main()
