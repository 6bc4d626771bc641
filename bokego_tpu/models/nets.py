"""Policy and value convnets in Flax (NHWC, bfloat16-ready).

Architectures mirror the reference nets so that converted checkpoints
reproduce logits exactly:

* ``PolicyNet`` (nnet.py:19-57): 5x5 conv 27->128, six 3x3 convs 128->128,
  BatchNorm+ReLU between all, final 1x1 conv to one channel with an
  *untied* (per-position) bias -> 81 logits.
* ``ValueNet`` (nnet.py:59-113): same trunk, then BN+ReLU, FC 81->64
  (BN+ReLU), FC 64->1, tanh — value from the side to move's perspective.
* ``PolicyNetV2`` (nnet.py:116-136): the v0.2 arch (no BatchNorm), kept for
  loading legacy checkpoints.

BatchNorm uses torch semantics (momentum 0.1 => flax momentum 0.9,
eps 1e-5).  Inference runs with running averages, matching ``.eval()``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from bokego_tpu.coords import NN


class UntiedBiasConv(nn.Module):
    """Conv with shared kernel but per-position bias (nnet.py:138-180).

    The bias has shape (height, width, out_channels) — a learned positional
    prior for the final layer.
    """

    features: int = 1
    kernel_size: tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            self.kernel_size,
            padding="SAME",
            use_bias=False,
            name="conv",
            dtype=x.dtype,
        )(x)
        bias = self.param(
            "untied_bias",
            nn.initializers.zeros_init(),
            (x.shape[-3], x.shape[-2], self.features),
        )
        return x + bias.astype(x.dtype)


class _Trunk(nn.Module):
    """Shared conv trunk: 5x5 then six 3x3, BN+ReLU, untied-bias 1x1 head."""

    channels: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        kernels = [(5, 5)] + [(3, 3)] * 6
        for i, k in enumerate(kernels):
            x = nn.Conv(
                self.channels, k, padding="SAME", name=f"conv{i}", dtype=x.dtype
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name=f"bn{i}",
                dtype=jnp.float32,
            )(x)
            x = nn.relu(x)
        return UntiedBiasConv(features=1, name="head")(x)


class PolicyNet(nn.Module):
    """(B, 9, 9, 27) -> (B, 81) move logits."""

    channels: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _Trunk(channels=self.channels, name="trunk")(x, train)
        return x.reshape(x.shape[0], NN)


class ValueNet(nn.Module):
    """(B, 9, 9, 27) -> (B, 1) value in (-1, 1) for the side to move."""

    channels: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _Trunk(channels=self.channels, name="trunk")(x, train)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            name="bn_head",
            dtype=jnp.float32,
        )(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], NN)
        x = nn.Dense(64, name="lin1", dtype=x.dtype)(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            name="bn_lin",
            dtype=jnp.float32,
        )(x)
        x = nn.relu(x)
        x = nn.Dense(1, name="lin2", dtype=x.dtype)(x)
        return jnp.tanh(x)


class PolicyNetV2(nn.Module):
    """Legacy v0.2 policy (nnet.py:116-136): no BatchNorm, 27->64->128..."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths = [64, 128, 128, 128, 128, 128]
        kernels = [(5, 5)] + [(3, 3)] * 5
        for i, (w, k) in enumerate(zip(widths, kernels)):
            x = nn.Conv(w, k, padding="SAME", name=f"conv{i}", dtype=x.dtype)(x)
            x = nn.relu(x)
        x = UntiedBiasConv(features=1, name="head")(x)
        return x.reshape(x.shape[0], NN)


def init_policy(rng: jax.Array, channels: int = 128) -> dict[str, Any]:
    """Fresh PolicyNet variables {'params', 'batch_stats'}."""
    net = PolicyNet(channels=channels)
    return net.init(rng, jnp.zeros((1, 9, 9, 27), jnp.float32), train=False)


def init_value(rng: jax.Array, channels: int = 128) -> dict[str, Any]:
    net = ValueNet(channels=channels)
    return net.init(rng, jnp.zeros((1, 9, 9, 27), jnp.float32), train=False)


def value_from_policy(value_vars: dict, policy_vars: dict) -> dict:
    """Initialize a ValueNet's trunk from a PolicyNet checkpoint
    (``ValueNet.load_policy_dict``, nnet.py:103-107)."""
    import flax

    vv = flax.core.unfreeze(value_vars)
    pv = flax.core.unfreeze(policy_vars)
    vv["params"]["trunk"] = jax.tree.map(lambda x: x, pv["params"]["trunk"])
    if "batch_stats" in pv:
        vv["batch_stats"]["trunk"] = jax.tree.map(lambda x: x, pv["batch_stats"]["trunk"])
    return vv
