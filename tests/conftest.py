"""Test configuration: force an 8-device virtual CPU platform BEFORE any
test imports jax, so sharding/mesh tests run hermetically without TPU
hardware.

Note: this image presets JAX_PLATFORMS=axon (TPU-tunnel backend) and a
sitecustomize that registers it, so plain env vars are not enough — the
config API must override the platform list.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
