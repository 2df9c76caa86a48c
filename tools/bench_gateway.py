#!/usr/bin/env python3
"""Online-serving benchmark: sustained q/s + latency through the native
dynamic-batching gateway (shufflingvideosfortsg_tpu/gateway.py).

Unlike `bench.py --mode serve*` (offline: pre-formed full batches), this
measures the production shape of serving — many independent clients, each
submitting ONE query and blocking for ITS result (closed loop), the native
scheduler forming micro-batches under a flush deadline. Reports sustained
q/s, latency percentiles, and the realized mean batch size, e.g.:

  python tools/bench_gateway.py --clients 256 --requests 40 \
      --video-len 128 --bank-videos 64 --query-batch 256

The default traffic is token ids against a resident video bank + GloVe
matrix — the only traffic shape that is not host-link-bound through a slow
relay (docs/KERNELS.md)."""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shufflingvideosfortsg_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from shufflingvideosfortsg_tpu.config import load_config          # noqa: E402
from shufflingvideosfortsg_tpu.gateway import ServingGateway      # noqa: E402
from shufflingvideosfortsg_tpu.serving import MultiQueryGrounder  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--clients', type=int, default=256)
    ap.add_argument('--requests', type=int, default=40,
                    help='closed-loop requests per client')
    ap.add_argument('--video-len', type=int, default=128)
    ap.add_argument('--sent-len', type=int, default=15)
    ap.add_argument('--bank-videos', type=int, default=64)
    ap.add_argument('--vocab', type=int, default=1294)
    ap.add_argument('--query-batch', type=int, default=256,
                    help='jitted program batch = gateway max_batch')
    ap.add_argument('--flush-us', type=int, default=2000)
    ap.add_argument('--pipeline-depth', type=int, default=2)
    ap.add_argument('--precision', default='bf16')
    ap.add_argument('--warmup', type=int, default=2,
                    help='warmup dispatches before timing')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp  # noqa: F401

    T, N = args.video_len, args.sent_len
    params = load_config(None, overrides=dict(
        video_len=T, sent_len=N, video_feature_dim=1024,
        precision=args.precision))
    rng = np.random.RandomState(0)
    model_params = None

    # init full-size model params
    from shufflingvideosfortsg_tpu.models import build_model
    model = build_model(params, 'gmd', inference=True)
    mt = jnp.ones((2, T), jnp.int32)
    mn = jnp.ones((2, N), jnp.int32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((2, N, 300)), mn,
        jnp.zeros((2, T, 1024)), mt, jnp.zeros((2, T, 1024)), mt, mt, mt,
        mt, mt, mt, mt)
    model_params = variables['params']

    g = MultiQueryGrounder(params, model_params,
                           query_batch=args.query_batch)
    g.set_videos(rng.randn(args.bank_videos, T, 1024).astype(np.float32))
    g.set_vocab(rng.randn(args.vocab, 300).astype(np.float32))

    # compile + warm the jitted program through the direct path first so
    # gateway timing is steady-state dispatch, not compilation
    warm_tokens = rng.randint(0, args.vocab,
                              (args.query_batch, N)).astype(np.int32)
    warm_vids = (np.arange(args.query_batch) % args.bank_videos
                 ).astype(np.int32)
    for _ in range(args.warmup):
        g.ground_tokens(warm_tokens, warm_vids)

    gw = ServingGateway(g, mode='bank', max_batch=args.query_batch,
                        flush_us=args.flush_us, max_tokens=N,
                        capacity=max(4096, 2 * args.clients),
                        pipeline_depth=args.pipeline_depth)

    latencies = []
    lock = threading.Lock()
    start_barrier = threading.Barrier(args.clients + 1)

    def client(seed):
        crng = np.random.RandomState(seed)
        toks = crng.randint(0, args.vocab,
                            (args.requests, N)).astype(np.int32)
        vids = crng.randint(0, args.bank_videos, args.requests)
        mine = []
        start_barrier.wait()
        for i in range(args.requests):
            t0 = time.perf_counter()
            ticket = gw.submit(toks[i], int(vids[i]))
            out = gw.result(ticket, timeout_s=120)
            mine.append(time.perf_counter() - t0)
            assert out[1] >= out[0]
        with lock:
            latencies.extend(mine)

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(args.clients)]
    for t in threads:
        t.start()
    start_barrier.wait()
    t0 = time.perf_counter()
    for t in threads:
        t.join()
    dt = time.perf_counter() - t0
    gw.close()

    lat = np.sort(np.asarray(latencies)) * 1e3
    total = args.clients * args.requests
    stats = gw.stats()
    print(json.dumps({
        'metric': 'gateway_online_serving_queries_per_sec',
        'value': round(total / dt, 1),
        'unit': 'queries/s',
        'config': {'clients': args.clients, 'requests': args.requests,
                   'T': T, 'bank_videos': args.bank_videos,
                   'query_batch': args.query_batch,
                   'flush_us': args.flush_us},
        'latency_ms': {'p50': round(float(lat[len(lat) // 2]), 1),
                       'p95': round(float(lat[int(len(lat) * 0.95)]), 1),
                       'p99': round(float(lat[int(len(lat) * 0.99)]), 1)},
        'mean_batch': round(stats['mean_batch'], 1),
        'batches': stats['batches'],
    }), flush=True)


if __name__ == '__main__':
    main()
