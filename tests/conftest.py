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

# Persistent XLA compile cache shared across test runs (and with the
# agent runtime / bench, which use the same dir): the e2e tiers spend
# most of their wall clock compiling the same programs every run.
for _key, _val in (
    ("jax_compilation_cache_dir", "/tmp/acmpc_jit_cache"),
    ("jax_persistent_cache_min_compile_time_secs", 1.0),
    ("jax_persistent_cache_min_entry_size_bytes", 0),
):
    try:
        jax.config.update(_key, _val)
    except Exception:
        pass
