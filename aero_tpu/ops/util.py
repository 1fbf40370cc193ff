"""Shared helpers for the Pallas kernel modules."""

from __future__ import annotations


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``x`` (tile/block padding)."""
    return -(-x // m) * m
