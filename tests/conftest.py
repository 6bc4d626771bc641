"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding paths run in CI without TPUs (SURVEY.md §4).

The container boots with an `axon` TPU PJRT plugin pre-registered via
sitecustomize (jax is already imported by the time conftest runs), so the
env-var route is too late — the override must go through jax.config before
the first backend initialization.  On TPU, convolutions run bf16 and the
exact-parity assertions would be meaningless; CPU gives f32 ground truth.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
