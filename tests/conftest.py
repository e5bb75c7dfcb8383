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

# NO persistent XLA compile cache for tests. Round 5 measured the
# hazard: this sandbox is a VM that can migrate between physical hosts
# mid-session, and XLA:CPU AOT cache entries compiled on a host with
# different CPU features load with only a warning and produce SILENTLY
# WRONG numerics (the shipped FPN checkpoint scored IoU 0.000 against
# its own training masks from a stale cache entry). Correctness over
# compile time here; the TPU-side bench/agent keep a per-backend cache
# (TPU executables are not host-CPU-feature dependent).
