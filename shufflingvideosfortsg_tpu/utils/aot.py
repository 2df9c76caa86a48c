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
_FNS = ("precompute", "serve_features", "serve_tokens")

# Calling convention of every exported fn: weights are always the first
# argument (kept OUT of the artifact constants so one artifact serves any
# checkpoint of the same architecture; they ride along in weights.msgpack).


def _spec_tree(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        tree)


def export_grounder(grounder, out_dir: str,
                    platforms: Optional[Sequence[str]] = None,
                    video_feature_dim: Optional[int] = None) -> Dict[str, Any]:
    """Export a live MultiQueryGrounder's serving paths to ``out_dir``.

    Requires a resident video (:meth:`set_video` — fixes T); exports
    ``serve_tokens`` too when a vocab is resident (:meth:`set_vocab`).
    The serve batch shape is the grounder's ``query_batch`` and the
    config's ``sent_len`` (the same chunk/pad convention the live
    grounder uses). Returns the manifest dict.
    """
    if grounder._resident_rnn0 is None:
        raise ValueError("set_video(...) first: export fixes the video "
                         "length T from the resident recurrence")
    os.makedirs(out_dir, exist_ok=True)
    params_host = jax.device_get(grounder.model_params)
    rnn0 = grounder._resident_rnn0
    Q = grounder.query_batch
    N = int(grounder.params.get("sent_len", 20))
    Dv = int(video_feature_dim
             or grounder.params.get("video_feature_dim", 1024))
    T = int(rnn0.shape[1])
    kw = dict(platforms=tuple(platforms)) if platforms else {}

    p_spec = _spec_tree(params_host)
    specs = {
        "precompute": (p_spec,
                       jax.ShapeDtypeStruct((1, T, Dv), jnp.float32)),
        "serve_features": (p_spec, _spec_tree(rnn0),
                           jax.ShapeDtypeStruct((Q, N, 300), jnp.float32)),
    }
    fns = {"precompute": grounder._precompute,
           "serve_features": grounder._serve}
    if grounder._resident_emb is not None:
        emb = np.asarray(jax.device_get(grounder._resident_emb), np.float32)
        np.save(os.path.join(out_dir, VOCAB), emb)
        specs["serve_tokens"] = (p_spec, _spec_tree(rnn0), _spec_tree(emb),
                                 jax.ShapeDtypeStruct((Q, N), jnp.int32))
        fns["serve_tokens"] = grounder._serve_tokens

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
        "platforms": list(platforms) if platforms else [jax.default_backend()],
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

    def __init__(self, path: str):
        with open(os.path.join(path, MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest.get("format") != "svtsg-aot-v1":
            raise ValueError(f"not a svtsg AOT artifact: {path}")
        self._calls = {}
        for name in self.manifest["functions"]:
            with open(os.path.join(path, f"{name}.stablehlo"), "rb") as f:
                exp = jax_export.deserialize(f.read())
            self._calls[name] = jax.jit(exp.call)
        with open(os.path.join(path, WEIGHTS), "rb") as f:
            self.weights = serialization.msgpack_restore(f.read())
        vocab_path = os.path.join(path, VOCAB)
        self._emb = jnp.asarray(np.load(vocab_path)) \
            if os.path.isfile(vocab_path) else None
        self.query_batch = int(self.manifest["query_batch"])
        self._rnn0 = None

    def set_video(self, video_feats: np.ndarray) -> None:
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


def load_grounder_artifact(path: str) -> ExportedGrounder:
    return ExportedGrounder(path)
