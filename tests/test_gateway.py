"""Native serving gateway: the C++ micro-batching queue must be correct
under concurrency, and the dispatch worker's results must equal the direct
`ground_tokens` path bit-for-bit.

The reference has no online serving surface (its only inference path is
the offline eval loop, grounding/test.py); the gateway is this framework's
production-serving runtime, so its tests are correctness-vs-direct plus
scheduler behavior (deadline batching, partial flush, backpressure)."""

import subprocess
import threading
import time

import numpy as np
import pytest

from shufflingvideosfortsg_tpu import gateway as gwmod

T, N, DV = 20, 6, 16


@pytest.fixture(scope='module', autouse=True)
def built_native():
    if not gwmod.native_available():
        subprocess.run(['make', '-C', 'native', 'libgateway.so'], check=True)
        gwmod._LIB = gwmod._load_native()
    assert gwmod.native_available()


# ---------------------------------------------------------------- queue --

def _echo_worker(q, max_batch=16, first_wait_us=200_000, flush_us=1_000):
    """Consumer that answers each request with (sum(tokens), video_row,
    n_nonzero) so clients can verify their own payload came back."""
    while True:
        try:
            tickets, tokens, vids = q.next_batch(max_batch, first_wait_us,
                                                 flush_us)
        except gwmod.GatewayClosed:
            return
        if len(tickets) == 0:
            continue
        q.complete(tickets, tokens.sum(axis=1).astype(np.float32),
                   vids.astype(np.float32),
                   (tokens != 0).sum(axis=1).astype(np.float32))


def test_queue_concurrent_roundtrip():
    q = gwmod.NativeBatchQueue(capacity=256, max_tokens=8)
    worker = threading.Thread(target=_echo_worker, args=(q,), daemon=True)
    worker.start()
    errors = []

    def client(seed):
        rng = np.random.RandomState(seed)
        for _ in range(50):
            n_tok = rng.randint(1, 9)
            toks = rng.randint(1, 100, n_tok).astype(np.int32)
            vid = int(rng.randint(0, 1000))
            t = q.submit(toks, vid)
            out = q.wait(t, timeout_us=5_000_000)
            if out is None:
                errors.append((seed, 'timeout'))
                return
            s, e, sc = out
            if s != float(toks.sum()) or e != float(vid) \
                    or sc != float(n_tok):
                errors.append((seed, toks, vid, out))

    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors[:3]
    stats = q.stats()
    assert stats['submitted'] == stats['completed'] == 300
    # micro-batching actually happened (6 concurrent producers, 1ms flush)
    assert stats['batches'] < 300
    q.shutdown()
    worker.join(timeout=5)
    assert not worker.is_alive()


def test_partial_batch_flushes_on_deadline():
    """One lone request must come back after ~flush_us, not wait for a
    full batch."""
    q = gwmod.NativeBatchQueue(capacity=16, max_tokens=4)
    worker = threading.Thread(target=_echo_worker, args=(q, 64),
                              daemon=True)
    worker.start()
    t0 = time.perf_counter()
    ticket = q.submit([7], 3)
    out = q.wait(ticket, timeout_us=2_000_000)
    dt = time.perf_counter() - t0
    assert out is not None and out[0] == 7.0
    assert dt < 1.0  # not stuck until first_wait expiry cycles
    q.shutdown()
    worker.join(timeout=5)


def test_backpressure_and_bad_tickets():
    q = gwmod.NativeBatchQueue(capacity=2, max_tokens=4)
    t1 = q.submit([1], 0)
    q.submit([2], 0)
    with pytest.raises(gwmod.QueueFull):
        q.submit([3], 0)
    # consume + complete one to free a slot
    tickets, tokens, vids = q.next_batch(1, 10_000, 0)
    assert list(tickets) == [t1]
    q.complete(tickets, np.zeros(1), np.zeros(1), np.zeros(1))
    assert q.wait(t1, 100_000) == (0.0, 0.0, 0.0)
    q.submit([3], 0)  # slot recycled
    # consumed ticket is dead (generation bumped)
    with pytest.raises(KeyError):
        q.wait(t1, 0)
    # unknown ticket
    with pytest.raises(KeyError):
        q.wait(10**12, 0)
    q.shutdown()
    with pytest.raises(gwmod.GatewayClosed):
        q.submit([4], 0)


def test_shutdown_drains_queued_work():
    """Requests already queued at shutdown are still served (drain), THEN
    the consumer sees GatewayClosed."""
    q = gwmod.NativeBatchQueue(capacity=16, max_tokens=4)
    tickets = [q.submit([i], 0) for i in range(1, 6)]
    q.shutdown()
    got, toks, vids = q.next_batch(16, 10_000, 0)
    assert len(got) == 5
    q.complete(got, toks.sum(axis=1).astype(np.float32),
               np.zeros(5), np.zeros(5))
    for i, t in enumerate(tickets):
        assert q.wait(t, 100_000)[0] == float(i + 1)
    with pytest.raises(gwmod.GatewayClosed):
        q.next_batch(16, 1_000, 0)


# ------------------------------------------------------------- end2end --

@pytest.fixture(scope='module')
def grounder():
    import jax
    import jax.numpy as jnp
    from shufflingvideosfortsg_tpu.models import GMD
    from shufflingvideosfortsg_tpu.serving import MultiQueryGrounder

    model = GMD(sent_hidden=8, sent_layers=1, video_hidden=8,
                video_layers=1, nblocks=2, cross_name='vs',
                predictor_name='mlp', mlp_hidden_dim=8, span_hidden_dim=8,
                video_if_mask=False, dropout=0.0, m_temp='none',
                m_pred_hidden=16, m_pred_activ='relu')
    mt = jnp.ones((2, T), jnp.int32)
    mn = jnp.ones((2, N), jnp.int32)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, N, 300)), mn,
                   jnp.zeros((2, T, DV)), mt, jnp.zeros((2, T, DV)), mt,
                   mt, mt, mt, mt, mt, mt)
    cfg = dict(sent_rnn_hiddendim=8, sent_rnn_layers=1,
               video_encoder='query_aware_encoder', video_rnn_hiddendim=8,
               video_rnn_layers=1, crossmodal='vs', predictor='mlp',
               mlp_hidden_dim=8, span_hidden_dim=8, mask=False, dropout=0.0,
               m_temp='none', m_pred_hidden=16, m_pred_activ='relu',
               precision='f32', mesh_shape=[8], sent_len=N)
    g = MultiQueryGrounder(cfg, v['params'], query_batch=8)
    rng = np.random.RandomState(7)
    g.set_videos(rng.randn(3, T, DV).astype(np.float32))
    g.set_vocab(rng.randn(50, 300).astype(np.float32))
    return g


@pytest.mark.parametrize('depth', [1, 3])
def test_gateway_matches_direct(grounder, depth):
    rng = np.random.RandomState(11)
    Q = 40
    token_ids = rng.randint(0, 50, (Q, N)).astype(np.int32)
    vids = (np.arange(Q) % 3).astype(np.int32)
    p_direct, s_direct = grounder.ground_tokens(token_ids, vids)

    # depth=1 is the synchronous loop; depth=3 exercises the pipelined
    # dispatch/completer pair (overlapped fetches, slot-first batching)
    gw = gwmod.ServingGateway(grounder, mode='bank', flush_us=2_000,
                              max_tokens=N, pipeline_depth=depth)
    try:
        results = {}
        lock = threading.Lock()

        def client(lo, hi):
            tickets = [(i, gw.submit(token_ids[i], int(vids[i])))
                       for i in range(lo, hi)]
            for i, t in tickets:
                out = gw.result(t, timeout_s=60)
                with lock:
                    results[i] = out

        threads = [threading.Thread(target=client, args=(i, i + 10))
                   for i in range(0, Q, 10)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == Q
        for i in range(Q):
            s, e, sc = results[i]
            assert (s, e) == (p_direct[i, 0], p_direct[i, 1]), i
            np.testing.assert_allclose(sc, s_direct[i], rtol=1e-5)
        stats = gw.stats()
        assert stats['completed'] == Q
    finally:
        gw.close()


def test_gateway_video_mode_matches_direct(grounder):
    rng = np.random.RandomState(13)
    video = rng.randn(T, DV).astype(np.float32)
    grounder.set_video(video)
    token_ids = rng.randint(0, 50, (9, N)).astype(np.int32)
    p_direct, s_direct = grounder.ground_tokens_video(token_ids)

    gw = gwmod.ServingGateway(grounder, mode='video', max_tokens=N)
    try:
        tickets = [gw.submit(token_ids[i]) for i in range(9)]
        for i, t in enumerate(tickets):
            s, e, sc = gw.result(t, timeout_s=60)
            assert (s, e) == (p_direct[i, 0], p_direct[i, 1])
            np.testing.assert_allclose(sc, s_direct[i], rtol=1e-5)
    finally:
        gw.close()


def test_gateway_rejects_bad_mode(grounder):
    with pytest.raises(AssertionError):
        gwmod.ServingGateway(grounder, mode='nope')


def test_gateway_raw_text_matches_direct(grounder):
    """submit_text: native tokenize + enqueue must equal tokenize-by-hand
    then ground_tokens — the full raw-sentence serving path."""
    from shufflingvideosfortsg_tpu.data.text_native import NativeTokenizer

    wordtoix = {'person': 3, 'opens': 17, 'the': 5, 'door': 29,
                'closes': 41, 'a': 8, 'window': 12}
    tok = NativeTokenizer(wordtoix, 'charades', max_out=N)
    texts = ['A person opens the door.',
             'the PERSON closes a window!',
             'door window door window door window',  # N=6 exactly
             'unknownword the door']                  # OOV dropped
    padded = np.zeros((len(texts), N), np.int32)
    vids = np.array([0, 1, 2, 0], np.int32)
    for i, s in enumerate(texts):
        ids, _ = tok.encode(s)
        assert ids, s
        padded[i, :len(ids)] = ids
    p_direct, s_direct = grounder.ground_tokens(padded, vids)

    gw = gwmod.ServingGateway(grounder, mode='bank', max_tokens=N,
                              tokenizer=tok)
    try:
        for i, s in enumerate(texts):
            st, en, sc = gw.ground_text(s, int(vids[i]), timeout_s=60)
            assert (st, en) == (p_direct[i, 0], p_direct[i, 1]), s
            np.testing.assert_allclose(sc, s_direct[i], rtol=1e-5)
        with pytest.raises(ValueError, match='no in-vocab'):
            gw.submit_text('zz9qq entirely oov !!!')
    finally:
        gw.close()
        tok.close()


def test_gateway_text_requires_tokenizer(grounder):
    gw = gwmod.ServingGateway(grounder, mode='bank', max_tokens=N)
    try:
        with pytest.raises(ValueError, match='tokenizer'):
            gw.submit_text('a person opens the door')
    finally:
        gw.close()
