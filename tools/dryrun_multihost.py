#!/usr/bin/env python3
"""Multi-host data-parallel dryrun: prove that the multi-host input pipeline
(per-host BatchLoader stripes + jax.make_array_from_process_local_data
assembly — SURVEY §5 contract) computes the SAME one-step training loss as a
single-process run over the identical global batch.

Three modes:

- orchestrator (default): builds synthetic features, spawns N worker
  processes (jax.distributed over CPU, each with its own virtual CPU
  devices), runs the single-process oracle, compares losses, prints
  ``dryrun_multihost ok: ...`` on success.
- ``--worker I``: one jax.distributed process; loads its 1/Nth stripe via
  BatchLoader(process_index=I, process_count=N), assembles the global batch
  with shard_batch, runs ONE jitted GMD train step, prints the loss.
- ``--oracle``: single process; rebuilds the same global batch by
  concatenating the N per-host stripes' first batches and runs the identical
  step on a local mesh.

Usage: python tools/dryrun_multihost.py [--num_processes 2] [--local_devices 2]
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

TINY = dict(
    video_feature_dim=32, video_len=24, sent_len=8,
    sent_rnn_hiddendim=8, video_rnn_hiddendim=8,
    mlp_hidden_dim=8, span_hidden_dim=8, m_pred_hidden=16,
    batch_size=[4, 4, 4], precision='f32',
)


def build_params(feat_dir):
    from shufflingvideosfortsg_tpu.config import load_config
    params = load_config(os.path.join(REPO, 'cfgs', 'charades_cd_i3d.yml'),
                         data_root='/root/reference/data')
    params.update(TINY)
    params.update(dict(train_data=ANNO, train_featpath=feat_dir,
                       start_from=None, debug=False))
    return params


def one_step_loss(params, stripes):
    """Run one GMD train step over the global batch assembled from the given
    (process_index, process_count) stripes. In a worker, ``stripes`` holds
    only this process's (I, N); in the oracle it holds all N, concatenated
    host-side into the same global row order."""
    import jax
    import numpy as np

    from shufflingvideosfortsg_tpu import cli
    from shufflingvideosfortsg_tpu.data.pipeline import BatchLoader
    from shufflingvideosfortsg_tpu.models import build_model
    from shufflingvideosfortsg_tpu.parallel.mesh import (create_mesh,
                                                         shard_batch)
    from shufflingvideosfortsg_tpu.train.state import (create_train_state,
                                                       make_optimizer)
    from shufflingvideosfortsg_tpu.train.steps import make_gmd_train_step

    dataset = cli.make_dataset(params, 'train_data', 'train_featpath',
                               'train')
    locals_ = []
    for (pi, pc) in stripes:
        loader = BatchLoader(dataset, params['batch_size'][0], shuffle=False,
                             prefetch=0, process_index=pi, process_count=pc)
        locals_.append(next(iter(loader)))
    if len(locals_) == 1:
        batch = locals_[0]
    else:  # oracle: concatenate stripes in process order = global row order
        batch = {}
        for k in locals_[0]:
            if isinstance(locals_[0][k], list):
                batch[k] = sum((b[k] for b in locals_), [])
            elif k == 'n_valid':
                batch[k] = sum(b[k] for b in locals_)
            else:
                batch[k] = np.concatenate([b[k] for b in locals_], 0)

    model = build_model(params, 'gmd')
    key = jax.random.PRNGKey(0)
    model_params = cli.init_model_params(model, params, key, 'gmd')
    tx = make_optimizer(params, steps_per_epoch=100)
    state = create_train_state(model_params, tx)
    mesh = create_mesh(None)
    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    sb = shard_batch(mesh, batch)
    train_step = make_gmd_train_step(model, params)
    _, metrics = train_step(state, sb, jax.random.PRNGKey(1))
    return float(np.asarray(jax.device_get(metrics['loss'])))


def run_worker(args):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.worker)
    assert jax.process_count() == args.num_processes
    params = build_params(args.feat_dir)
    loss = one_step_loss(params, [(args.worker, args.num_processes)])
    print(f'MHLOSS {args.worker} {loss:.6f}', flush=True)


def run_driver_worker(args):
    """Full driver epoch through cli.main_train on every multi-host fast
    path: (a) device bank + chunked scan training + banked whole-epoch
    scan eval, (b) bank + per-step dispatch, (c) no bank (host-gathered
    per-batch path). The three must agree: same PRNG stream, same global
    batches, same features — chunking and banking are pure dispatch
    optimizations (VERDICT r2 weak #3)."""
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.worker)
    assert jax.process_count() == args.num_processes

    from shufflingvideosfortsg_tpu import cli

    def train_once(alias, chunk, bank, fsdp=False):
        params = build_params(args.feat_dir)
        params.update(dict(
            train_featpath=args.pack_dir, valid_featpath=args.pack_dir,
            val_data=ANNO, device_bank=bool(bank), train_scan_chunk=chunk,
            fsdp=fsdp, epoch=1, test_interval=1, save_model_interval=99,
            batch_log_interval=-1, debug=True, alias=alias,
            # attempt-suffixed so a gloo-timeout retry gets fresh run dirs
            # (RunManager refuses alias reuse)
            runs=os.path.join(args.pack_dir,
                              f'runs_a{args.attempt}_{alias}_p{args.worker}')))
        stats = cli.main_train(params)
        return stats['loss'][0], stats['mIoU'][0]

    la, ma = train_once('mh_scan2', 2, True)    # chunked scan + banked eval
    lb, mb = train_once('mh_scan1', 1, True)    # per-step + banked eval
    lc, mc = train_once('mh_nobank', 1, False)  # host per-batch everything
    # ZeRO-3 multi-host: per-process shard assembly + collective gather
    # before the epoch-1 checkpoint write; must equal the replicated run
    ld, md = train_once('mh_fsdp', 2, True, fsdp=True)
    print(f'MHDRV {args.worker} {la:.6f} {lb:.6f} {lc:.6f} {ld:.6f} '
          f'{ma:.4f} {mb:.4f} {mc:.4f} {md:.4f}', flush=True)


def run_oracle(args):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    params = build_params(args.feat_dir)
    loss = one_step_loss(params,
                         [(i, args.num_processes)
                          for i in range(args.num_processes)])
    print(f'MHLOSS oracle {loss:.6f}', flush=True)


def _free_port():
    s = socket.socket()
    s.bind(('127.0.0.1', 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_orchestrator(args):
    if not os.path.isfile(ANNO):
        print('dryrun_multihost skipped: reference annotations unavailable')
        return 0
    tmp = tempfile.mkdtemp(prefix='svtsg_mh_')
    feat_dir = os.path.join(tmp, 'feats')
    subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools/make_synth_features.py'),
         '--dataset', 'charades', '--out', feat_dir, '--annotations', ANNO,
         '--dim', str(TINY['video_feature_dim'])],
        check=True, capture_output=True)

    def env_for(n_local):
        env = dict(os.environ)
        env['JAX_PLATFORMS'] = 'cpu'
        # drop any inherited device-count flag (e.g. from tests/conftest.py)
        # before setting ours, or the duplicate breaks the device math
        kept = [f for f in env.get('XLA_FLAGS', '').split()
                if not f.startswith('--xla_force_host_platform_device_count')]
        kept.append(f'--xla_force_host_platform_device_count={n_local}')
        env['XLA_FLAGS'] = ' '.join(kept)
        # prepend (never replace) so the axon sitecustomize stays reachable
        env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
        env['SVTSG_PLATFORM'] = 'cpu'
        return env

    def spawn_workers(extra, label, attempts=3):
        """Launch the N-process pod; retry on gloo's hard 30s KV-store
        rendezvous timeout, which a single-core host blows whenever one
        process out-compiles the other between collectives (environment,
        not wiring — the XLA compile cache warms across attempts, so a
        retry converges). Any other failure aborts immediately."""
        for attempt in range(attempts):
            coordinator = f'127.0.0.1:{_free_port()}'
            procs = []
            for i in range(args.num_processes):
                cmd = [sys.executable, os.path.abspath(__file__),
                       '--worker', str(i), '--num_processes',
                       str(args.num_processes), '--coordinator', coordinator,
                       '--feat_dir', feat_dir, '--attempt', str(attempt),
                       '--local_devices', str(args.local_devices)] + extra
                procs.append(subprocess.Popen(
                    cmd, env=env_for(args.local_devices),
                    stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                    text=True))
            outs = [w.communicate(timeout=900) for w in procs]
            if all(w.returncode == 0 for w in procs):
                return outs
            blob = ''.join(o + e for o, e in outs)
            retryable = 'DEADLINE_EXCEEDED' in blob or 'timed out' in blob
            if not retryable or attempt == attempts - 1:
                for w, (o, e) in zip(procs, outs):
                    if w.returncode != 0:
                        print(o)
                        print(e[-4000:])
                        print(f'dryrun_multihost FAILED: {label} exited',
                              w.returncode)
                return None
            print(f'dryrun_multihost: {label} hit the gloo rendezvous '
                  f'timeout (attempt {attempt + 1}); retrying', flush=True)
        return None

    outs = spawn_workers([], 'worker')
    if outs is None:
        return 1

    # phase 2: the driver fast paths (chunked scan train + banked eval)
    pack_dir = os.path.join(tmp, 'pack')
    subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools/make_synth_pack.py'),
         '--annotations', ANNO, '--out', pack_dir, '--t', '24', '--d',
         str(TINY['video_feature_dim']), '--dtype', 'f16'],
        check=True, capture_output=True)
    douts = spawn_workers(['--driver-worker', '--pack_dir', pack_dir],
                          'driver worker')
    if douts is None:
        return 1

    oracle = subprocess.run(
        [sys.executable, os.path.abspath(__file__), '--oracle',
         '--num_processes', str(args.num_processes), '--feat_dir', feat_dir,
         '--local_devices', str(args.num_processes * args.local_devices)],
        env=env_for(args.num_processes * args.local_devices),
        capture_output=True, text=True, timeout=900)
    if oracle.returncode != 0:
        print(oracle.stdout)
        print(oracle.stderr[-4000:])
        print('dryrun_multihost FAILED: oracle exited', oracle.returncode)
        return 1

    def parse(text):
        for line in text.splitlines():
            if line.startswith('MHLOSS'):
                return float(line.split()[-1])
        raise ValueError(f'no MHLOSS line in: {text!r}')

    worker_losses = [parse(o) for o, _ in outs]
    oracle_loss = parse(oracle.stdout)
    spread = max(worker_losses) - min(worker_losses)
    diff = abs(worker_losses[0] - oracle_loss)
    ok = spread < 1e-5 and diff < 1e-4 * max(1.0, abs(oracle_loss))

    def parse_drv(text):
        for line in text.splitlines():
            if line.startswith('MHDRV'):
                vals = line.split()[2:]
                return [float(v) for v in vals]
        raise ValueError(f'no MHDRV line in: {text!r}')

    drv = [parse_drv(o) for o, _ in douts]
    # hosts agree with each other, and on each host: chunked-scan loss ==
    # per-step loss == host-path loss == fsdp loss; banked eval mIoU ==
    # host-path mIoU == fsdp mIoU
    drv_spread = max(max(r) - min(r) for r in zip(*drv))
    la, lb, lc, ld, ma, mb, mc, md = drv[0]
    drv_ok = (drv_spread < 1e-4
              and abs(la - lb) < 1e-4 and abs(la - lc) < 1e-3
              and abs(la - ld) < 1e-3
              and abs(ma - mb) < 1e-3 and abs(ma - mc) < 1e-2
              and abs(ma - md) < 1e-2)
    ok = ok and drv_ok
    result = {'workers': worker_losses, 'oracle': oracle_loss,
              'spread': spread, 'diff': diff,
              'driver': {'loss_scan2': la, 'loss_scan1': lb,
                         'loss_host': lc, 'loss_fsdp': ld,
                         'miou_scan2': ma, 'miou_scan1': mb,
                         'miou_host': mc, 'miou_fsdp': md,
                         'host_spread': drv_spread, 'ok': drv_ok},
              'ok': ok}
    print('dryrun_multihost', 'ok:' if ok else 'FAILED:',
          json.dumps(result))
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--num_processes', type=int, default=2)
    ap.add_argument('--local_devices', type=int, default=2)
    ap.add_argument('--worker', type=int, default=None)
    ap.add_argument('--driver-worker', action='store_true')
    ap.add_argument('--oracle', action='store_true')
    ap.add_argument('--coordinator', default=None)
    ap.add_argument('--feat_dir', default=None)
    ap.add_argument('--pack_dir', default=None)
    ap.add_argument('--attempt', type=int, default=0)
    args = ap.parse_args()
    if args.driver_worker:
        run_driver_worker(args)
    elif args.worker is not None:
        run_worker(args)
    elif args.oracle:
        run_oracle(args)
    else:
        sys.exit(run_orchestrator(args))


if __name__ == '__main__':
    main()
