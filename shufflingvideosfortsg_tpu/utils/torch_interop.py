"""Torch checkpoint interop: map reference ``state_dict`` tensors onto this
framework's parameter pytrees.

The reference saves raw ``model.state_dict()`` files (grounding/train.py:
406-408). These helpers convert the relevant tensor layouts:

- ``nn.Linear``: weight [out, in] -> kernel [in, out]; bias unchanged.
- ``nn.LSTM`` (cuDNN layout): per layer/direction ``weight_ih_l{k}[_reverse]``
  [4H, D] -> ``w_ih_l{k}`` [2, D, 4H]; both biases are kept as separate
  parameters (``b_ih_l{k}``/``b_hh_l{k}``) so optimizer dynamics and
  round-trips match the reference exactly.
- ``nn.LayerNorm``: weight/bias -> scale/bias.

Array-level only: inputs are numpy arrays (callers do ``torch.load`` with
``map_location='cpu'`` and ``.numpy()`` themselves, keeping torch optional).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def linear_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def layernorm_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def bilstm_from_torch(sd: Dict[str, np.ndarray], prefix: str,
                      num_layers: int) -> Dict[str, np.ndarray]:
    """Convert a bidirectional torch LSTM's tensors under ``{prefix}.``."""
    params: Dict[str, np.ndarray] = {}
    for layer in range(num_layers):
        w_ih, w_hh, b_ih, b_hh = [], [], [], []
        for rev in ("", "_reverse"):
            w_ih.append(sd[f"{prefix}.weight_ih_l{layer}{rev}"].T)
            w_hh.append(sd[f"{prefix}.weight_hh_l{layer}{rev}"].T)
            b_ih.append(sd[f"{prefix}.bias_ih_l{layer}{rev}"])
            b_hh.append(sd[f"{prefix}.bias_hh_l{layer}{rev}"])
        params[f"w_ih_l{layer}"] = np.ascontiguousarray(np.stack(w_ih, 0))
        params[f"w_hh_l{layer}"] = np.ascontiguousarray(np.stack(w_hh, 0))
        params[f"b_ih_l{layer}"] = np.stack(b_ih, 0)
        params[f"b_hh_l{layer}"] = np.stack(b_hh, 0)
    return params


def _scdm_from_torch(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    return {
        "W_s": linear_from_torch(sd, f"{prefix}.W_s"),
        "W_a": linear_from_torch(sd, f"{prefix}.W_a"),
        "w": np.ascontiguousarray(sd[f"{prefix}.w.weight"].T),
    }


def _video_encoder_from_torch(sd: Dict[str, np.ndarray], nblocks: int,
                              video_layers: int) -> Dict:
    """QueryAwareEncoder tree from reference keys
    ``video_encoder.blocks.{i}.*`` + ``video_encoder.norm``."""
    tree: Dict = {}
    for i in range(nblocks):
        p = f"video_encoder.blocks.{i}"
        tree[f"block{i}"] = {
            "rnn": bilstm_from_torch(sd, f"{p}.rnn_cell.lstm", video_layers),
            "attention": _scdm_from_torch(sd, f"{p}.attention"),
            "sent_linear": linear_from_torch(sd, f"{p}.sent_linear"),
        }
    tree["norm"] = layernorm_from_torch(sd, "video_encoder.norm")
    return tree


def _span_predictor_from_torch(sd: Dict[str, np.ndarray],
                               predictor_name: str) -> Dict:
    p = "span_predictor.predictor"
    tree: Dict = {}
    if predictor_name in ("mlp", "a"):
        names = ("start_mlp_1", "start_mlp_2", "end_mlp_1", "end_mlp_2")
    elif predictor_name in ("tied_lstm", "b", "cat_tied_lstm", "b2"):
        tree["cross_lstm"] = bilstm_from_torch(sd, f"{p}.cross_lstm.lstm", 1)
        names = ("start_mlp_1", "start_mlp_2", "end_mlp_1", "end_mlp_2")
    elif predictor_name in ("condi_lstm", "c"):
        tree["start_lstm"] = bilstm_from_torch(sd, f"{p}.start_lstm.lstm", 1)
        tree["end_lstm"] = bilstm_from_torch(sd, f"{p}.end_lstm.lstm", 1)
        names = ("start_fc", "end_fc")
    elif predictor_name in ("cat_condi_lstm", "c2"):
        tree["start_lstm"] = bilstm_from_torch(sd, f"{p}.start_lstm.lstm", 1)
        tree["end_lstm"] = bilstm_from_torch(sd, f"{p}.end_lstm.lstm", 1)
        names = ("start_mlp_1", "start_mlp_2", "end_mlp_1", "end_mlp_2")
    else:
        raise ValueError(f"unsupported predictor for conversion: {predictor_name}")
    for n in names:
        tree[n] = linear_from_torch(sd, f"{p}.{n}")
    return {"predictor": tree}


def convert_reference_state_dict(sd: Dict[str, np.ndarray],
                                 kind: str = "gmd",
                                 sent_layers: int = 2,
                                 video_layers: int = 2,
                                 nblocks: int = 2,
                                 predictor_name: str = "mlp",
                                 m_temp: str = "none") -> Dict:
    """Map a reference ``model.state_dict()`` (numpy-valued) onto this
    framework's parameter pytree for GMD or Baseline."""
    params: Dict = {
        "sentence_encoder": {
            "word_embed": linear_from_torch(sd, "sentence_encoder.word_embed"),
            "rnn": bilstm_from_torch(sd, "sentence_encoder.rnn_cell.lstm",
                                     sent_layers),
        },
        "video_encoder": _video_encoder_from_torch(sd, nblocks, video_layers),
        "span_predictor": _span_predictor_from_torch(sd, predictor_name),
    }
    if kind.lower() in ("gmd", "qave_match"):
        csmm: Dict = {
            "predict_1": linear_from_torch(sd, "csmm.predict.predict.0"),
            "predict_2": linear_from_torch(sd, "csmm.predict.predict.2"),
        }
        if m_temp.lower() == "lstm":
            csmm["temporal"] = bilstm_from_torch(sd, "csmm.temporal.lstm.lstm", 2)
        params["csmm"] = csmm
        params["tod"] = {
            "foreback": linear_from_torch(sd, "tod.foreback_context.0"),
            "classifier": linear_from_torch(sd, "tod.fc_classifier_domain_video.0"),
        }
    return params


def load_reference_ckp(path: str, **kwargs) -> Dict:
    """Read a reference ``.ckp`` (raw torch state_dict) into a param pytree.

    Requires torch (CPU) at call time only.
    """
    import torch

    obj = torch.load(path, map_location="cpu")
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    sd = {k: v.detach().cpu().numpy() for k, v in obj.items()}
    return convert_reference_state_dict(sd, **kwargs)


# ---------------------------------------------------------------------------
# Export direction: this framework's pytree -> reference state_dict, so
# weights trained here load into the reference's own torch modules
# (grounding/test.py:76-78 does `model.load_state_dict(torch.load(...))`
# on the raw dicts written by grounding/train.py:406-408). Exact inverses
# of the converters above; strict-load + forward parity against the
# reference's GMD is asserted in tests/test_ckp_export.py.


def _f32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.float32))


def linear_to_torch(tree: Dict, prefix: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{prefix}.weight"] = _f32(tree["kernel"]).T.copy()
    if "bias" in tree:
        out[f"{prefix}.bias"] = _f32(tree["bias"])


def layernorm_to_torch(tree: Dict, prefix: str, out: Dict[str, np.ndarray]) -> None:
    out[f"{prefix}.weight"] = _f32(tree["scale"])
    out[f"{prefix}.bias"] = _f32(tree["bias"])


def bilstm_to_torch(tree: Dict, prefix: str, num_layers: int,
                    out: Dict[str, np.ndarray]) -> None:
    """[2, D, 4H]-stacked directions back to cuDNN per-direction tensors."""
    for layer in range(num_layers):
        for r, rev in enumerate(("", "_reverse")):
            out[f"{prefix}.weight_ih_l{layer}{rev}"] = \
                _f32(tree[f"w_ih_l{layer}"][r]).T.copy()
            out[f"{prefix}.weight_hh_l{layer}{rev}"] = \
                _f32(tree[f"w_hh_l{layer}"][r]).T.copy()
            out[f"{prefix}.bias_ih_l{layer}{rev}"] = \
                _f32(tree[f"b_ih_l{layer}"][r])
            out[f"{prefix}.bias_hh_l{layer}{rev}"] = \
                _f32(tree[f"b_hh_l{layer}"][r])


def _scdm_to_torch(tree: Dict, prefix: str, out: Dict[str, np.ndarray]) -> None:
    linear_to_torch(tree["W_s"], f"{prefix}.W_s", out)
    linear_to_torch(tree["W_a"], f"{prefix}.W_a", out)
    out[f"{prefix}.w.weight"] = _f32(tree["w"]).T.copy()


def _video_encoder_to_torch(tree: Dict, nblocks: int, video_layers: int,
                            out: Dict[str, np.ndarray]) -> None:
    for i in range(nblocks):
        block = tree[f"block{i}"]
        p = f"video_encoder.blocks.{i}"
        bilstm_to_torch(block["rnn"], f"{p}.rnn_cell.lstm", video_layers, out)
        _scdm_to_torch(block["attention"], f"{p}.attention", out)
        linear_to_torch(block["sent_linear"], f"{p}.sent_linear", out)
    layernorm_to_torch(tree["norm"], "video_encoder.norm", out)


def _span_predictor_to_torch(tree: Dict, predictor_name: str,
                             out: Dict[str, np.ndarray]) -> None:
    pred = tree["predictor"]
    p = "span_predictor.predictor"
    if predictor_name in ("mlp", "a"):
        names = ("start_mlp_1", "start_mlp_2", "end_mlp_1", "end_mlp_2")
    elif predictor_name in ("tied_lstm", "b", "cat_tied_lstm", "b2"):
        bilstm_to_torch(pred["cross_lstm"], f"{p}.cross_lstm.lstm", 1, out)
        names = ("start_mlp_1", "start_mlp_2", "end_mlp_1", "end_mlp_2")
    elif predictor_name in ("condi_lstm", "c"):
        bilstm_to_torch(pred["start_lstm"], f"{p}.start_lstm.lstm", 1, out)
        bilstm_to_torch(pred["end_lstm"], f"{p}.end_lstm.lstm", 1, out)
        names = ("start_fc", "end_fc")
    elif predictor_name in ("cat_condi_lstm", "c2"):
        bilstm_to_torch(pred["start_lstm"], f"{p}.start_lstm.lstm", 1, out)
        bilstm_to_torch(pred["end_lstm"], f"{p}.end_lstm.lstm", 1, out)
        names = ("start_mlp_1", "start_mlp_2", "end_mlp_1", "end_mlp_2")
    else:
        raise ValueError(f"unsupported predictor for export: {predictor_name}")
    for n in names:
        linear_to_torch(pred[n], f"{p}.{n}", out)


def convert_to_reference_state_dict(params: Dict,
                                    kind: str = "gmd",
                                    sent_layers: int = 2,
                                    video_layers: int = 2,
                                    nblocks: int = 2,
                                    predictor_name: str = "mlp",
                                    m_temp: str = "none"
                                    ) -> Dict[str, np.ndarray]:
    """Map this framework's parameter pytree onto a reference
    ``model.state_dict()`` (numpy-valued, float32) for GMD or Baseline."""
    out: Dict[str, np.ndarray] = {}
    linear_to_torch(params["sentence_encoder"]["word_embed"],
                    "sentence_encoder.word_embed", out)
    bilstm_to_torch(params["sentence_encoder"]["rnn"],
                    "sentence_encoder.rnn_cell.lstm", sent_layers, out)
    _video_encoder_to_torch(params["video_encoder"], nblocks, video_layers,
                            out)
    _span_predictor_to_torch(params["span_predictor"], predictor_name, out)
    if kind.lower() in ("gmd", "qave_match"):
        csmm = params["csmm"]
        linear_to_torch(csmm["predict_1"], "csmm.predict.predict.0", out)
        linear_to_torch(csmm["predict_2"], "csmm.predict.predict.2", out)
        if m_temp.lower() == "lstm":
            bilstm_to_torch(csmm["temporal"], "csmm.temporal.lstm.lstm", 2,
                            out)
        linear_to_torch(params["tod"]["foreback"], "tod.foreback_context.0",
                        out)
        linear_to_torch(params["tod"]["classifier"],
                        "tod.fc_classifier_domain_video.0", out)
    return out


def save_reference_ckp(params: Dict, path: str, **kwargs) -> None:
    """Write a reference-format ``.ckp``: a raw torch ``state_dict`` the
    reference's ``test.py`` loads unchanged. Requires torch (CPU)."""
    import torch

    sd = convert_to_reference_state_dict(params, **kwargs)
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
               path)
