"""Torch ViT oracle for golden-parity tests — re-exported from the product's
parity harness (timetuning_tpu/eval/parity_oracle.py) so tests and the
real-artifact parity CLI share one reference implementation."""

from __future__ import annotations

from timetuning_tpu.eval.parity_oracle import build_oracle


def OracleViT(img_size=224, patch_size=16, dim=384, depth=12, heads=6):
    return build_oracle(img_size, patch_size, dim, depth, heads)
