"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native "fake backend": forcing 8 CPU devices gives every
multi-chip sharding test a real mesh without TPU hardware (SURVEY.md §4).

Note: the session environment pins ``JAX_PLATFORMS=axon`` (a tunneled TPU)
and a sitecustomize hook initializes JAX at interpreter startup, so plain
env vars are too late here — we must override through ``jax.config``.
"""

import os

os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("AERO_TEST_PLATFORM", "cpu"))
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: repeat test runs skip XLA recompiles.
# Namespaced per machine — XLA:CPU AOT code is specialized to the
# compiling host's CPU features (reuse elsewhere risks SIGILL).
from aero_tpu.utils.platform import cache_dir_for  # noqa: E402

_cache_dir = cache_dir_for(os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache")))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _reset_compute_dtype():
    """Isolate the global compute dtype across tests.

    build_models(precision=bfloat16) flips the module-level compute
    dtype; without restoration, a bf16-building test silently degrades
    every later torch-parity tolerance (order-dependent failures)."""
    from aero_tpu.models import modules

    prev = modules.compute_dtype()
    yield
    modules.set_compute_dtype(prev)
