#!/usr/bin/env python3
"""Merge per-host submit shards from a multi-host eval run.

Multi-host runs write one prediction JSON per process
(``<alias>_<step>_<split>.partN.json``, disjoint sentence stripes); this
merges them into one submit file with the reference schema
(reference: grounding/test.py:88-142) so IoU_eval.py reports the global
table.

Usage:
  python tools/merge_submits.py out.json part0.json part1.json [...]
"""

import json
import sys


def merge(paths):
    out = None
    for p in paths:
        d = json.load(open(p))
        if out is None:
            out = d
            continue
        for vid, rows in d['results'].items():
            out['results'].setdefault(vid, []).extend(rows)
    return out


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    out_path, parts = sys.argv[1], sys.argv[2:]
    merged = merge(parts)
    n = sum(len(v) for v in merged['results'].values())
    with open(out_path, 'w') as f:
        json.dump(merged, f)
    print(f'merged {len(parts)} shards -> {out_path} ({n} predictions)')


if __name__ == '__main__':
    main()
