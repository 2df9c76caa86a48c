"""AOT serving artifacts: jax.export StableHLO bundles for deployment.

A deployed grounding service should not need the model's Python source,
flax module definitions, or a tracing step. :func:`export_grounder`
serializes the jitted serving computations of a live
``serving.MultiQueryGrounder`` — the query-independent ``precompute``
(block-0 recurrence) and the per-batch ``serve`` paths — as versioned
StableHLO artifacts (``jax.export``), together with the model weights and
the resident GloVe matrix, into one self-contained directory.
:func:`load_grounder_artifact` restores a serving object from that
directory alone: deserialization rebuilds the compiled call without
touching ``models/`` (XLA still compiles the deserialized StableHLO on
first call; the on-disk compilation cache makes that a one-time cost per
machine).

The reference has no deployment story at all (its eval driver re-builds
the torch model from source every run, grounding/test.py:20-80); this is
TPU-native infrastructure beyond parity. Artifacts record their lowering
platforms — pass ``platforms=('tpu', 'cpu')`` to build one bundle that
runs on both (jax.export cross-platform lowering).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import serialization
from jax import export as jax_export

MANIFEST = "manifest.json"
WEIGHTS = "weights.msgpack"
VOCAB = "vocab.npy"
BANK = "bank.npz"
_FNS = ("precompute", "serve_features", "serve_tokens",
        "serve_bank", "serve_bank_tokens")

# Calling convention of every exported fn: weights are always the first
# argument (kept OUT of the artifact constants so one artifact serves any
# checkpoint of the same architecture; they ride along in weights.msgpack).


def _spec_tree(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        tree)


def _fn_table(grounder) -> Dict[str, Any]:
    """Exported-name -> jitted serving fn for a live grounder."""
    return {"precompute": grounder._precompute,
            "serve_features": grounder._serve,
            "serve_tokens": grounder._serve_tokens,
            "serve_bank": grounder._serve_multi,
            "serve_bank_tokens": grounder._serve_multi_tokens}


def export_grounder(grounder, out_dir: str,
                    platforms: Optional[Sequence[str]] = None,
                    video_feature_dim: Optional[int] = None,
                    tpu_grounder=None) -> Dict[str, Any]:
    """Export a live MultiQueryGrounder's serving paths to ``out_dir``.

    Tiers follow what is resident on the grounder: a resident video
    (:meth:`set_video`) exports the single-video ``precompute`` /
    ``serve_features`` (+ ``serve_tokens`` with a vocab); a resident
    CORPUS bank (:meth:`set_corpus` / :meth:`set_videos`) additionally
    exports ``serve_bank`` (feature queries × per-query video ids) and
    ``serve_bank_tokens`` — the production serving paths
    (docs/SERVING.md tier table). The bank itself (f32/bf16 array or the
    int8 (values, scales) pair) is stored beside the weights in
    ``bank.npz`` and rides into every call as an argument, exactly as in
    the live grounder. The serve batch shape is the grounder's
    ``query_batch`` and the config's ``sent_len``. Returns the manifest.

    A portable (multi-platform) bundle must lower the pure-XLA scan
    recurrence — the Pallas kernels have no CPU lowering — and the scan
    recurrence measured ~2.5x the fused kernel's time per recurrence
    layer on TPU (docs/KERNELS.md). Pass ``tpu_grounder`` (a second
    grounder over the SAME weights built with ``fused_inference=True``;
    no resident state needed — everything rides as call arguments) to
    ALSO export TPU-native fused variants as ``<name>.tpu.stablehlo``;
    :class:`ExportedGrounder` prefers those when it finds itself on a
    TPU backend, so one artifact serves CPU portably and TPU at full
    speed. Mosaic lowering is ahead-of-time, so this works from any
    host, TPU-less included.
    """
    bank = grounder._resident_bank
    if grounder._resident_rnn0 is None and bank is None:
        raise ValueError("set_video(...) or set_corpus(...) first: export "
                         "fixes shapes from the resident state")
    os.makedirs(out_dir, exist_ok=True)
    params_host = jax.device_get(grounder.model_params)
    rnn0 = grounder._resident_rnn0
    Q = grounder.query_batch
    N = int(grounder.params.get("sent_len", 20))
    Dv = int(video_feature_dim
             or grounder.params.get("video_feature_dim", 1024))
    T = int(rnn0.shape[1] if rnn0 is not None
            else jax.tree.leaves(bank)[0].shape[1])
    kw = dict(platforms=tuple(platforms)) if platforms else {}

    p_spec = _spec_tree(params_host)
    specs = {}
    if rnn0 is not None:
        specs["precompute"] = (
            p_spec, jax.ShapeDtypeStruct((1, T, Dv), jnp.float32))
        specs["serve_features"] = (
            p_spec, _spec_tree(rnn0),
            jax.ShapeDtypeStruct((Q, N, 300), jnp.float32))
    emb = None
    if grounder._resident_emb is not None:
        emb = np.asarray(jax.device_get(grounder._resident_emb), np.float32)
        np.save(os.path.join(out_dir, VOCAB), emb)
        if rnn0 is not None:
            specs["serve_tokens"] = (
                p_spec, _spec_tree(rnn0), _spec_tree(emb),
                jax.ShapeDtypeStruct((Q, N), jnp.int32))
    num_videos = bank_dtype = None
    if bank is not None:
        bank_host = jax.device_get(bank)
        ids_spec = jax.ShapeDtypeStruct((Q,), jnp.int32)
        specs["serve_bank"] = (
            p_spec, _spec_tree(bank_host),
            jax.ShapeDtypeStruct((Q, N, 300), jnp.float32), ids_spec)
        if emb is not None:
            specs["serve_bank_tokens"] = (
                p_spec, _spec_tree(bank_host), _spec_tree(emb),
                jax.ShapeDtypeStruct((Q, N), jnp.int32), ids_spec)
        if isinstance(bank_host, tuple):  # int8 tier: (values, scales)
            np.savez(os.path.join(out_dir, BANK),
                     bank_q=np.asarray(bank_host[0]),
                     bank_s=np.asarray(bank_host[1]))
            bank_dtype = "int8"
        else:
            arr = np.asarray(bank_host)
            # bf16 has no numpy dtype — store via f32 round-trip and
            # record the wire dtype so load restores it
            bank_dtype = str(bank_host.dtype)
            np.savez(os.path.join(out_dir, BANK),
                     bank=arr.astype(np.float32))
        num_videos = int(jax.tree.leaves(bank_host)[0].shape[0])

    # one source of truth for name -> serving fn (also used for the
    # tpu-native variants below); filtered by which tiers are resident
    fns = {name: _fn_table(grounder)[name] for name in specs}

    exported_names = []
    for name, spec in specs.items():
        try:
            exp = jax_export.export(fns[name], **kw)(*spec)
        except ValueError as err:
            if "interpret mode" in str(err) or "pallas" in str(err).lower():
                raise ValueError(
                    "cross-platform export requires the pure-XLA recurrence: "
                    "build the grounder with fused_inference=False in its "
                    "config (the Pallas kernel has no CPU lowering); "
                    "tools/export_serving.py does this automatically when "
                    "--platforms is given") from err
            raise
        with open(os.path.join(out_dir, f"{name}.stablehlo"), "wb") as f:
            f.write(exp.serialize())
        exported_names.append(name)

    tpu_native = []
    if tpu_grounder is not None:
        native_fns = _fn_table(tpu_grounder)
        for name in exported_names:
            try:
                exp = jax_export.export(
                    native_fns[name], platforms=("tpu",))(*specs[name])
            except Exception as err:  # noqa: BLE001 — record, don't abort
                print(f"[aot] WARNING: tpu-native export of {name} failed "
                      f"({type(err).__name__}: {err}); the portable "
                      f"variant will serve on TPU too")
                continue
            with open(os.path.join(out_dir, f"{name}.tpu.stablehlo"),
                      "wb") as f:
                f.write(exp.serialize())
            tpu_native.append(name)

    with open(os.path.join(out_dir, WEIGHTS), "wb") as f:
        f.write(serialization.msgpack_serialize(
            jax.tree.map(np.asarray, params_host)))
    manifest = {
        "format": "svtsg-aot-v1",
        "functions": exported_names,
        "video_len": T,
        "video_feature_dim": Dv,
        "sent_len": N,
        "query_batch": Q,
        "num_videos": num_videos,
        "bank_dtype": bank_dtype,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "tpu_native": tpu_native,
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ExportedGrounder:
    """Serving from an AOT artifact directory — no model source needed.

    Mirrors the live grounder's surface for the single-resident-video
    tiers: :meth:`set_video` (runs the exported block-0 precompute),
    :meth:`ground` (feature queries) and :meth:`ground_tokens_video`
    (token-id queries against the bundled vocab), with the same
    chunk/pad/trim convention, so results are interchangeable
    (equality-tested against the live grounder).
    """

    def __init__(self, path: str, prefer_native: bool = True):
        with open(os.path.join(path, MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("format") != "svtsg-aot-v1":
            raise ValueError(f"not a svtsg AOT artifact: {path}")
        self._calls = {}
        # a portable bundle may carry TPU-native (Pallas-fused) variants
        # beside the cross-platform XLA-scan ones; serve those when we
        # find ourselves on a TPU backend (full kernel speed), fall back
        # to the portable files anywhere else (prefer_native=False forces
        # the portable files even on TPU — for A/B measurement)
        on_tpu = prefer_native and jax.default_backend() == "tpu"
        native = set(self.manifest.get("tpu_native") or ())
        self.native_loaded = []
        for name in self.manifest["functions"]:
            fname = f"{name}.stablehlo"
            if on_tpu and name in native and os.path.isfile(
                    os.path.join(path, f"{name}.tpu.stablehlo")):
                fname = f"{name}.tpu.stablehlo"
                self.native_loaded.append(name)
            with open(os.path.join(path, fname), "rb") as f:
                exp = jax_export.deserialize(f.read())
            self._calls[name] = jax.jit(exp.call)
        with open(os.path.join(path, WEIGHTS), "rb") as f:
            weights_host = serialization.msgpack_restore(f.read())
        # device_put ONCE: numpy leaves passed to jit re-upload every
        # call (measured through the remote relay: a 53 MB weight tree
        # per call collapsed serving 20x below the live grounder)
        self.weights = jax.device_put(weights_host)
        vocab_path = os.path.join(path, VOCAB)
        self._emb = jax.device_put(np.load(vocab_path)) \
            if os.path.isfile(vocab_path) else None
        self.query_batch = int(self.manifest["query_batch"])
        self._rnn0 = None
        self._bank = None
        bank_path = os.path.join(path, BANK)
        if os.path.isfile(bank_path):
            z = np.load(bank_path)
            if "bank_q" in z:  # int8 tier: (values, scales)
                self._bank = (jnp.asarray(z["bank_q"]),
                              jnp.asarray(z["bank_s"]))
            else:
                dt = self.manifest.get("bank_dtype") or "float32"
                self._bank = jnp.asarray(z["bank"]).astype(dt)

    def set_video(self, video_feats: np.ndarray) -> None:
        if "precompute" not in self._calls:
            raise ValueError("artifact has no single-video tier (it was "
                             "exported from a corpus-bank-only grounder; "
                             "use ground_bank/ground_tokens, or call "
                             "set_video before export)")
        T, Dv = self.manifest["video_len"], self.manifest["video_feature_dim"]
        if video_feats.shape != (T, Dv):
            raise ValueError(f"artifact was exported for video shape "
                             f"({T}, {Dv}); got {video_feats.shape}")
        self._rnn0 = self._calls["precompute"](
            self.weights, jnp.asarray(video_feats, jnp.float32)[None])

    def _chunked(self, fn, arr, dtype):
        assert self._rnn0 is not None, "no video set"
        Q, qb = arr.shape[0], self.query_batch
        preds, scores = [], []
        for i in range(0, Q, qb):
            chunk = arr[i:i + qb]
            n = len(chunk)
            if n < qb:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], qb - n, axis=0)], axis=0)
            pred, score = fn(jnp.asarray(chunk, dtype))
            preds.append(np.asarray(pred)[:n])
            scores.append(np.asarray(score)[:n])
        return np.concatenate(preds), np.concatenate(scores)

    def ground(self, sent_feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        call = self._calls["serve_features"]
        return self._chunked(
            lambda q: call(self.weights, self._rnn0, q),
            sent_feats, jnp.float32)

    def ground_tokens_video(self, token_ids: np.ndarray
                            ) -> Tuple[np.ndarray, np.ndarray]:
        if "serve_tokens" not in self._calls:
            raise ValueError("artifact was exported without a vocab "
                             "(set_vocab before export_grounder)")
        call = self._calls["serve_tokens"]
        return self._chunked(
            lambda q: call(self.weights, self._rnn0, self._emb, q),
            token_ids, jnp.int32)

    # ----- corpus/bank tier (per-query video ids; bank bundled) -----

    def _chunked_ids(self, fn, arr, ids, dtype):
        Q, qb = arr.shape[0], self.query_batch
        if ids.shape[0] != Q:
            raise ValueError("one video id per query")
        preds, scores = [], []
        for i in range(0, Q, qb):
            chunk, idc = arr[i:i + qb], ids[i:i + qb]
            n = len(chunk)
            if n < qb:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], qb - n, axis=0)], axis=0)
                idc = np.concatenate([idc, np.repeat(idc[-1:], qb - n)])
            pred, score = fn(jnp.asarray(chunk, dtype),
                             jnp.asarray(idc, jnp.int32))
            preds.append(np.asarray(pred)[:n])
            scores.append(np.asarray(score)[:n])
        return np.concatenate(preds), np.concatenate(scores)

    def ground_bank(self, sent_feats: np.ndarray, video_ids: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """Feature queries against the bundled corpus bank: query i
        grounds against bank video ``video_ids[i]`` (the live grounder's
        ground_bank surface)."""
        if "serve_bank" not in self._calls:
            raise ValueError("artifact was exported without a corpus bank "
                             "(set_corpus/set_videos before export)")
        call = self._calls["serve_bank"]
        return self._chunked_ids(
            lambda q, v: call(self.weights, self._bank, q, v),
            sent_feats, video_ids, jnp.float32)

    def ground_tokens(self, token_ids: np.ndarray, video_ids: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
        """Token-id queries against the bundled corpus bank (the live
        grounder's ground_tokens surface — the production tier)."""
        if "serve_bank_tokens" not in self._calls:
            raise ValueError("artifact lacks the token corpus tier "
                             "(set_corpus AND set_vocab before export)")
        call = self._calls["serve_bank_tokens"]
        return self._chunked_ids(
            lambda q, v: call(self.weights, self._bank, self._emb, q, v),
            token_ids, video_ids, jnp.int32)


def load_grounder_artifact(path: str,
                           prefer_native: bool = True) -> ExportedGrounder:
    return ExportedGrounder(path, prefer_native=prefer_native)
