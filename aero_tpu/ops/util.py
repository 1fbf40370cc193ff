"""Shared helpers for the Pallas kernel modules."""

from __future__ import annotations


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``x`` (tile/block padding)."""
    return -(-x // m) * m


def pallas_platform_ok(has_pallas: bool, interpret: bool) -> bool:
    """Shared Pallas availability probe: importable AND (interpret test
    mode OR a real TPU backend). Each kernel module layers its own
    policy (env opt-ins, measured defaults) on top of this."""
    if not has_pallas:
        return False
    if interpret:
        return True
    import jax

    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    return platform in ("tpu", "axon")
