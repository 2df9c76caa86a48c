"""Torch checkpoint interop: map reference ``state_dict`` tensors onto this
framework's parameter pytrees.

The reference saves raw ``model.state_dict()`` files (grounding/train.py:
406-408). These helpers convert the relevant tensor layouts:

- ``nn.Linear``: weight [out, in] -> kernel [in, out]; bias unchanged.
- ``nn.LSTM`` (cuDNN layout): per layer/direction ``weight_ih_l{k}[_reverse]``
  [4H, D] -> ``w_ih_l{k}`` [2, D, 4H]; the two biases are summed into one
  fused bias (mathematically identical recurrence).
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
        w_ih, w_hh, b = [], [], []
        for rev in ("", "_reverse"):
            w_ih.append(sd[f"{prefix}.weight_ih_l{layer}{rev}"].T)
            w_hh.append(sd[f"{prefix}.weight_hh_l{layer}{rev}"].T)
            b.append(sd[f"{prefix}.bias_ih_l{layer}{rev}"]
                     + sd[f"{prefix}.bias_hh_l{layer}{rev}"])
        params[f"w_ih_l{layer}"] = np.ascontiguousarray(np.stack(w_ih, 0))
        params[f"w_hh_l{layer}"] = np.ascontiguousarray(np.stack(w_hh, 0))
        params[f"b_l{layer}"] = np.stack(b, 0)
    return params
