"""Convert reference PyTorch checkpoints to Flax variables.

The reference ships legacy torch-pickle checkpoints of the form
``{"model_state_dict": ..., "optimizer_state_dict": ...[, "epoch"]}``
(train.py:90, selfplay.py:208, loaded at boke.py:31-38).  This module maps
them onto the Flax module trees in :mod:`bokego_tpu.models.nets`:

* conv weights: torch OIHW -> flax HWIO,
* linear weights: torch (out, in) -> flax (in, out),
* BatchNorm weight/bias/running_mean/running_var ->
  scale/bias + batch_stats mean/var,
* untied bias (out, 9, 9) -> (9, 9, out).

Sequential indices in the torch nets: conv layers at 0,3,6,9,12,15,18 and
the untied-bias head at 21 (PolicyNet/ValueNet, nnet.py:31-53/73-95); the
v2 net has convs at 0,2,4,6,8,10 and head at 12 (nnet.py:119-132).
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _conv(sd: dict, key: str) -> dict[str, np.ndarray]:
    out = {"kernel": _t(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)}
    if f"{key}.bias" in sd:
        out["bias"] = _t(sd[f"{key}.bias"])
    return out


def _bn(sd: dict, key: str) -> tuple[dict, dict]:
    params = {"scale": _t(sd[f"{key}.weight"]), "bias": _t(sd[f"{key}.bias"])}
    stats = {"mean": _t(sd[f"{key}.running_mean"]), "var": _t(sd[f"{key}.running_var"])}
    return params, stats


def _dense(sd: dict, key: str) -> dict[str, np.ndarray]:
    return {"kernel": _t(sd[f"{key}.weight"]).T, "bias": _t(sd[f"{key}.bias"])}


def _untied(sd: dict, key: str) -> dict[str, Any]:
    kernel = _t(sd[f"{key}.weight"]).transpose(2, 3, 1, 0)  # (1,1,128,1)
    bias = _t(sd[f"{key}.bias"]).transpose(1, 2, 0)  # (9,9,1)
    return {"conv": {"kernel": kernel}, "untied_bias": bias}


def _trunk(sd: dict, prefix: str = "conv") -> tuple[dict, dict]:
    """Map the 8-layer BN trunk of PolicyNet/ValueNet."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    conv_idx = [0, 3, 6, 9, 12, 15, 18]
    for i, ci in enumerate(conv_idx):
        params[f"conv{i}"] = _conv(sd, f"{prefix}.{ci}")
        p, s = _bn(sd, f"{prefix}.{ci + 1}")
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    params["head"] = _untied(sd, f"{prefix}.21")
    return params, stats


def policy_from_torch(state_dict: dict) -> dict:
    """Torch PolicyNet state_dict -> {'params', 'batch_stats'} variables."""
    params, stats = _trunk(state_dict)
    return {"params": {"trunk": params}, "batch_stats": {"trunk": stats}}


def value_from_torch(state_dict: dict) -> dict:
    """Torch ValueNet state_dict -> {'params', 'batch_stats'} variables."""
    trunk_p, trunk_s = _trunk(state_dict)
    bn_head_p, bn_head_s = _bn(state_dict, "bn")
    bn_lin_p, bn_lin_s = _bn(state_dict, "lin_bn")
    params = {
        "trunk": trunk_p,
        "bn_head": bn_head_p,
        "lin1": _dense(state_dict, "lin1"),
        "bn_lin": bn_lin_p,
        "lin2": _dense(state_dict, "lin2"),
    }
    stats = {"trunk": trunk_s, "bn_head": bn_head_s, "bn_lin": bn_lin_s}
    return {"params": params, "batch_stats": stats}


def policy_v2_from_torch(state_dict: dict) -> dict:
    """Torch PolicyNet_v2 state_dict -> {'params'} variables (no BN)."""
    params: dict[str, Any] = {}
    for i, ci in enumerate([0, 2, 4, 6, 8, 10]):
        params[f"conv{i}"] = _conv(state_dict, f"conv.{ci}")
    params["head"] = _untied(state_dict, "conv.12")
    return {"params": params}


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference checkpoint file and return its model state dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        return ckpt["model_state_dict"]
    return ckpt


# -- Flax -> torch (inverse direction) ---------------------------------------
#
# Lets weights trained HERE run in the reference engine (e.g. giving the
# reference its missing ValueNet for engine-vs-engine evaluation) and keeps
# checkpoint portability bidirectional.


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _conv_back(sd: dict, key: str, p: dict):
    sd[f"{key}.weight"] = _np(p["kernel"]).transpose(3, 2, 0, 1)
    if "bias" in p:
        sd[f"{key}.bias"] = _np(p["bias"])


def _bn_back(sd: dict, key: str, p: dict, s: dict):
    sd[f"{key}.weight"] = _np(p["scale"])
    sd[f"{key}.bias"] = _np(p["bias"])
    sd[f"{key}.running_mean"] = _np(s["mean"])
    sd[f"{key}.running_var"] = _np(s["var"])
    sd[f"{key}.num_batches_tracked"] = np.int64(0)


def _dense_back(sd: dict, key: str, p: dict):
    sd[f"{key}.weight"] = _np(p["kernel"]).T
    sd[f"{key}.bias"] = _np(p["bias"])


def _trunk_back(sd: dict, params: dict, stats: dict, prefix: str = "conv"):
    conv_idx = [0, 3, 6, 9, 12, 15, 18]
    for i, ci in enumerate(conv_idx):
        _conv_back(sd, f"{prefix}.{ci}", params[f"conv{i}"])
        _bn_back(sd, f"{prefix}.{ci + 1}", params[f"bn{i}"], stats[f"bn{i}"])
    head = params["head"]
    sd[f"{prefix}.21.weight"] = _np(head["conv"]["kernel"]).transpose(3, 2, 0, 1)
    sd[f"{prefix}.21.bias"] = _np(head["untied_bias"]).transpose(2, 0, 1)


def _to_torch_sd(sd_np: dict) -> dict:
    import torch

    return {k: torch.from_numpy(np.ascontiguousarray(v)) if v.ndim else
            torch.tensor(v) for k, v in sd_np.items()}


def policy_to_torch(variables: dict) -> dict:
    """Flax policy variables -> torch PolicyNet state_dict."""
    sd: dict[str, Any] = {}
    _trunk_back(sd, variables["params"]["trunk"], variables["batch_stats"]["trunk"])
    return _to_torch_sd(sd)


def value_to_torch(variables: dict) -> dict:
    """Flax value variables -> torch ValueNet state_dict."""
    sd: dict[str, Any] = {}
    p, s = variables["params"], variables["batch_stats"]
    _trunk_back(sd, p["trunk"], s["trunk"])
    _bn_back(sd, "bn", p["bn_head"], s["bn_head"])
    _bn_back(sd, "lin_bn", p["bn_lin"], s["bn_lin"])
    _dense_back(sd, "lin1", p["lin1"])
    _dense_back(sd, "lin2", p["lin2"])
    return _to_torch_sd(sd)


def save_torch(path: str, state_dict: dict):
    """Write a reference-format checkpoint file (boke.py:31-38 loads it)."""
    import torch

    torch.save({"model_state_dict": state_dict}, path)


def load_policy(path: str) -> dict:
    """Reference policy checkpoint file -> Flax variables."""
    return policy_from_torch(load_torch_checkpoint(path))


def load_value(path: str) -> dict:
    """Reference value checkpoint file -> Flax variables."""
    return value_from_torch(load_torch_checkpoint(path))
