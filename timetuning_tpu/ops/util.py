"""Shared ops helpers."""

from __future__ import annotations


def pad_to_multiple(n: int, m: int = 128) -> int:
    """Smallest multiple of ``m`` that is >= ``n`` (TPU lane/sublane
    alignment; the single home of the ceil-to-multiple formula)."""
    return ((n + m - 1) // m) * m
