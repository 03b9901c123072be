"""Runtime configuration helpers.

The reference has no config system (compile-time constants, SURVEY.md §5);
here the few global knobs live in one place.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache. TPU compiles (especially
    through a remote-compile tunnel) cost seconds to minutes; the cache
    amortizes them across processes. Returns the cache directory."""
    import jax

    path = path or os.environ.get(
        "DBI_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "dbi_tpu_xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path


def force_cpu(n_devices: int | None = None) -> None:
    """Force the CPU backend (with an optional virtual device count) —
    must run before any device computation. Note: in environments that pin
    JAX_PLATFORMS externally the env var is ignored; the config update is
    what actually works."""
    if n_devices is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={n_devices}"
            ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
