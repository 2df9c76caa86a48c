#!/usr/bin/env python3
"""Multi-host steady-state training throughput (VERDICT r2 item 5 tail).

`tools/dryrun_multihost.py` proves the multi-host fast paths (chunked-scan
training + banked whole-epoch eval) compute bit-identical results; this
tool measures what they COST: the same global training workload on the
same 8 virtual CPU devices, once as a single process and once split over
2 (and optionally 4) jax.distributed processes, reporting steady-state
pairs/s from the driver's own per-epoch metrics (metrics.jsonl).

The numbers are CPU-mesh numbers — this image has one TPU chip, so no
multi-host ICI exists to measure — but the *ratio* isolates exactly the
cost the topology adds: per-host stripe loading +
jax.make_array_from_process_local_data assembly + gloo coordination,
against an otherwise identical compute graph. On a real pod slice the
compute term scales with chips and this overhead term is what remains.

Usage:
  python tools/bench_multihost.py [--epochs 4] [--global-batch 64] \
      [--topologies 1x8 2x4]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ANNO = os.environ.get('SVTSG_MH_ANNO',
                      '/root/reference/data/Charades-CD/charades_val.json')

# moderate dims: big enough that a CPU step is compute (not dispatch)
# dominated, small enough that 8 virtual devices on one host stay fast
DIMS = dict(
    video_feature_dim=128, video_len=48, sent_len=10,
    sent_rnn_hiddendim=64, video_rnn_hiddendim=64,
    mlp_hidden_dim=64, span_hidden_dim=32, m_pred_hidden=128,
    precision='f32',
)


def run_worker(args):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    if args.num_processes > 1:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.worker)
        assert jax.process_count() == args.num_processes

    from shufflingvideosfortsg_tpu import cli
    from shufflingvideosfortsg_tpu.config import load_config

    params = load_config(os.path.join(REPO, 'cfgs', 'charades_cd_i3d.yml'),
                         data_root='/root/reference/data')
    params.update(DIMS)
    per_host = args.global_batch // args.num_processes
    run_root = os.path.join(args.work_dir,
                            f'runs_{args.num_processes}x_p{args.worker}')
    params.update(dict(
        train_data=ANNO, val_data=ANNO,
        train_featpath=args.pack_dir, valid_featpath=args.pack_dir,
        batch_size=[per_host, per_host, per_host],
        device_bank=True, train_scan_chunk=4,
        epoch=args.epochs, test_interval=99, save_model_interval=99,
        # debug caps the dataset at 4x the PER-HOST batch, which would give
        # each topology a different workload — keep the full split
        batch_log_interval=-1, debug=False, start_from=None,
        alias='mhbench', runs=run_root))
    cli.main_train(params)

    if args.worker == 0:
        import numpy as np
        dataset = cli.make_dataset(params, 'train_data', 'train_featpath',
                                   'train')
        n_pairs = len(dataset)
        # per-epoch wall seconds from the run's own metrics stream
        mpath = None
        for root, _dirs, files in os.walk(run_root):
            if 'metrics.jsonl' in files:
                mpath = os.path.join(root, 'metrics.jsonl')
        secs = []
        with open(mpath) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get('phase') == 'train':
                    secs.append((rec['epoch'], rec['seconds']))
        warm = [s for e, s in secs if e >= 1]  # epoch 0 pays compile
        med = float(np.median(warm))
        print('MHBENCH ' + json.dumps({
            'processes': args.num_processes,
            'local_devices': args.local_devices,
            'global_batch': args.global_batch,
            'n_pairs': n_pairs, 'epochs': len(secs),
            'warm_epoch_seconds': round(med, 3),
            'pairs_per_s': round(n_pairs / med, 1)}), flush=True)


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_orchestrator(args):
    if not os.path.isfile(ANNO):
        print('bench_multihost skipped: reference annotations unavailable')
        return 0
    tmp = tempfile.mkdtemp(prefix='svtsg_mhb_')
    pack_dir = os.path.join(tmp, 'pack')
    subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools/make_synth_pack.py'),
         '--annotations', ANNO, '--out', pack_dir,
         '--t', str(DIMS['video_len']),
         '--d', str(DIMS['video_feature_dim']), '--dtype', 'f16'],
        check=True, capture_output=True)

    def env_for(n_local):
        env = dict(os.environ)
        env['JAX_PLATFORMS'] = 'cpu'
        kept = [f for f in env.get('XLA_FLAGS', '').split()
                if not f.startswith('--xla_force_host_platform_device_count')]
        kept.append(f'--xla_force_host_platform_device_count={n_local}')
        env['XLA_FLAGS'] = ' '.join(kept)
        env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
        env['SVTSG_PLATFORM'] = 'cpu'
        return env

    rows = []
    for topo in args.topologies:
        np_, nl = (int(x) for x in topo.split('x'))
        coordinator = f'127.0.0.1:{_free_port()}'
        procs = []
        for i in range(np_):
            cmd = [sys.executable, os.path.abspath(__file__),
                   '--worker', str(i), '--num_processes', str(np_),
                   '--local_devices', str(nl),
                   '--coordinator', coordinator, '--pack_dir', pack_dir,
                   '--work_dir', tmp, '--epochs', str(args.epochs),
                   '--global-batch', str(args.global_batch)]
            procs.append(subprocess.Popen(cmd, env=env_for(nl),
                                          stdout=subprocess.PIPE,
                                          stderr=subprocess.PIPE, text=True))
        outs = [p.communicate(timeout=1800) for p in procs]
        for p, (o, e) in zip(procs, outs):
            if p.returncode != 0:
                print(o)
                print(e[-4000:])
                print(f'bench_multihost FAILED: {topo} worker exited',
                      p.returncode)
                return 1
        for o, _ in outs:
            for line in o.splitlines():
                if line.startswith('MHBENCH '):
                    rows.append(json.loads(line[len('MHBENCH '):]))
        print(f'{topo} done', file=sys.stderr, flush=True)

    base = rows[0]['pairs_per_s']
    for r in rows:
        r['vs_single_process'] = round(r['pairs_per_s'] / base, 3)
    print(json.dumps({'note': 'CPU-mesh measurement: same 8 virtual '
                              'devices and global batch per row; the '
                              'ratio isolates multi-host input-assembly '
                              '+ coordination overhead on the chunked-'
                              'scan fast path',
                      'rows': rows}, indent=1))
    return 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--epochs', type=int, default=4)
    ap.add_argument('--global-batch', type=int, default=64)
    ap.add_argument('--topologies', nargs='+', default=['1x8', '2x4'])
    ap.add_argument('--worker', type=int, default=None)
    ap.add_argument('--num_processes', type=int, default=1)
    ap.add_argument('--local_devices', type=int, default=8)
    ap.add_argument('--coordinator', default=None)
    ap.add_argument('--pack_dir', default=None)
    ap.add_argument('--work_dir', default=None)
    args = ap.parse_args()
    if args.worker is not None:
        run_worker(args)
    else:
        sys.exit(run_orchestrator(args))


if __name__ == '__main__':
    main()
