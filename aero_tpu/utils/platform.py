"""Backend platform selection for CLIs.

This image's sitecustomize hook initializes JAX's platform list to
``axon,cpu`` at interpreter startup, overriding ``JAX_PLATFORMS`` from
the environment. CLIs call :func:`select_platform_from_env` first thing
so tests/CI can force CPU via ``AERO_PLATFORM=cpu`` (optionally with
``AERO_NUM_CPU_DEVICES=8`` for a virtual mesh).
"""

from __future__ import annotations

import os


def select_platform_from_env() -> None:
    import jax

    plat = os.environ.get("AERO_PLATFORM")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
            n = os.environ.get("AERO_NUM_CPU_DEVICES")
            if n:
                jax.config.update("jax_num_cpu_devices", int(n))
        except RuntimeError:
            # backends already initialized; too late to switch
            pass

    # Persistent compilation cache: repeat CLI invocations skip XLA
    # recompiles (first compile of the full model is minutes).
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "aero_tpu",
                     "jax_cache"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (RuntimeError, OSError):
        pass
