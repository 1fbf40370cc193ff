"""Backend platform selection for CLIs.

This image's sitecustomize hook initializes JAX's platform list to
``axon,cpu`` at interpreter startup, overriding ``JAX_PLATFORMS`` from
the environment. CLIs call :func:`select_platform_from_env` first thing
so tests/CI can force CPU via ``AERO_PLATFORM=cpu`` (optionally with
``AERO_NUM_CPU_DEVICES=8`` for a virtual mesh).
"""

from __future__ import annotations

import hashlib
import os


def machine_namespace() -> str:
    """Short fingerprint of this host's CPU, to namespace the persistent
    XLA compile cache. XLA:CPU caches AOT-compiled code specialized to
    the compiling machine's CPU features; reusing it on a different host
    risks SIGILL ("machine feature mismatch" warnings). Keying the cache
    dir by CPU model isolates heterogeneous hosts from each other."""
    import platform as _plat

    desc = f"{_plat.machine()};{_plat.processor()}"
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    desc += ";" + line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return hashlib.sha1(desc.encode()).hexdigest()[:12]


def cache_dir_for(base: str) -> str:
    return os.path.join(base, machine_namespace())


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
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR") or cache_dir_for(
        os.path.join(os.path.expanduser("~"), ".cache", "aero_tpu",
                     "jax_cache"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (RuntimeError, OSError):
        pass
