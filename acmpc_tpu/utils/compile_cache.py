"""Persistent XLA compile-cache policy.

The agent and the benchmark compile the same large jitted programs (the
fused MPC step, the perception pipeline) once per machine instead of
once per session — the analogue of the reference's serialized TensorRT
engines (/root/reference/src/acmpc/perception/segmentation.py:93-117)
for the whole stack. Cold, the headline B=256 fused step compiles in
~10 minutes through the TPU tunnel; warm it loads in seconds.

Cache keying (round-5 hardening): this sandbox is a VM that can migrate
between physical hosts mid-session, and XLA:CPU AOT cache entries
compiled on a host with different CPU features load with only a warning
and can return silently wrong numerics (measured: a stale entry scored
the shipped FPN checkpoint at IoU 0.000 against its own training
masks). TPU executables are not host-CPU-feature dependent, so the TPU
cache is keyed by backend alone; the CPU cache dir is additionally keyed
by a hash of the host's CPU flags so a migrated VM never loads another
host's AOT code. Tests use NO persistent cache at all
(tests/conftest.py).
"""

from __future__ import annotations

import hashlib
import pathlib


def cache_dir_for_backend(backend: str) -> str:
    if backend != "cpu":
        return f"/tmp/acmpc_jit_cache_{backend}"
    try:
        flags = ""
        for line in pathlib.Path("/proc/cpuinfo").read_text().splitlines():
            if line.startswith("flags"):
                flags = " ".join(sorted(line.split(":")[1].split()))
                break
        tag = hashlib.sha256(flags.encode()).hexdigest()[:12]
    except Exception:
        tag = "nohost"
    return f"/tmp/acmpc_jit_cache_cpu_{tag}"


def enable_compile_cache() -> None:
    """Point JAX's persistent compile cache at the backend-appropriate
    directory. Safe to call more than once; swallows config errors so a
    missing knob on an older jax never takes the caller down."""
    import jax

    for key, val in (
        (
            "jax_compilation_cache_dir",
            cache_dir_for_backend(jax.default_backend()),
        ),
        ("jax_persistent_cache_min_compile_time_secs", 1.0),
        ("jax_persistent_cache_min_entry_size_bytes", 0),
    ):
        try:
            jax.config.update(key, val)
        except Exception:
            pass
