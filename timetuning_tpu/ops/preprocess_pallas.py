"""Fused eval-preprocess kernel: uint8 frame → resized, normalized bf16.

The XLA perf path (`data/transforms.eval_preprocess_batch` with
``compute_dtype=bfloat16``) materializes three HBM-round-tripping stages for
a 480p eval batch: the uint8→bf16 cast of the full-resolution frames
(2.46 MB/frame written + re-read), the H-pass resize intermediate and the
W-pass output — measured 3.3-4.5 ms per 200-frame DAVIS batch and the
second-largest stage of the propagation-eval pipeline after the trunk
(reference workload: mask_propagation.py:717-842 resizes every 480p frame
to the eval resolution before the ViT forward).

This kernel does the whole stage in one pass per frame — the uint8 frame's
only HBM traffic is one read (1.23 MB at 480p):

  * **H-pass on the int8 MXU, no conversion pass.** Mosaic has no u8→bf16
    cast, and widening through i16/i32 costs several VPU+VMEM passes over
    the full-res frame (measured: the largest single cost in the bf16
    variant). Instead the raw bytes go to the MXU directly: ``x ^ 0x80``
    bitcast to int8 is exactly ``v−128``, contracted with the resize
    weights quantized to int8 (scale 127/max|w|) into an i32 accumulator;
    the exact integer correction ``Wq @ 128·𝟙`` and the dequant scale
    restore the real-valued row in one small f32 pass over the ALREADY
    DOWNSCALED [S, W·3] intermediate (≈4× smaller than the input).
  * **W-pass as one channel-block-diagonal bf16 matmul.** ``Wbig`` embeds
    the W-axis weights per channel, so the channel-interleaved [H, W*3]
    row layout stays intact through both contractions — no
    transpose/deinterleave relayout (the reason a pure-XLA matmul
    formulation measures SLOWER than resize's own lowering; a
    strided-lane per-channel variant does not lower in Mosaic).
  * **Normalization folded into weights.** /255 rides the H-pass weights,
    1/std the W-pass columns, and −mean/std enters as a per-channel bias
    generated in-kernel from the lane index (shipping a [1, S*3] operand
    block measured slower).

Weight matrices reproduce ``jax.image.resize(..., 'bilinear')``'s
antialiased kernel exactly (pinned against identity-resize in tests);
availability is gated to downscale, where that construction is verified.

Numerics: the H-pass weight quantization to 8 bits lands at the SAME error
level as bf16 arithmetic (max |Δ| vs the f32 XLA path: 0.0209 quantized vs
0.0201 for a pure-bf16 kernel variant on uniform-random 480p frames) — the
perf-path contract (f32 = faithful, bf16 = perf at bf16 rounding) is
unchanged. `cli.propagate --compute_dtype bfloat16` J&F equivalence vs f32
is the end-to-end gate (tests/test_preprocess_pallas.py pins values;
tests/test_cli.py drives the CLI).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

# VMEM high-water estimate for one program vs the ~16 MB/core of v5e.
_VMEM_BUDGET_BYTES = 14 * 2 ** 20


@functools.lru_cache(maxsize=64)
def _resize_weights(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] weights reproducing ``jax.image.resize(x, (n_out, ...),
    'bilinear')`` as a matrix for n_out <= n_in: half-pixel-centered
    triangle kernel, widened by 1/scale when downscaling (antialias —
    resize's default), rows renormalized so out-of-range taps redistribute
    to the edge. Resize is a linear map, so this matrix is unique; tests
    pin it against resizing an identity matrix."""
    scale = n_out / n_in
    sample_f = (np.arange(n_out) + 0.5) / scale - 0.5        # src centers
    inv = max(1.0 / scale, 1.0)                              # antialias width
    j = np.arange(n_in)
    t = (j[None, :] - sample_f[:, None]) / inv
    w = np.maximum(0.0, 1.0 - np.abs(t))                     # triangle
    w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    return w.astype(np.float32)


@functools.lru_cache(maxsize=16)
def _folded_weights(h: int, w: int, out_size: int, mean: tuple, std: tuple):
    """Returns numpy (cache must outlive jit traces):
      wh_q  [S, H]   int8  — H-pass resize weights (/255 folded) × qscale
      corr  [S, 1]   f32   — exact integer correction  wh_q @ 128·𝟙
      wbig  [W3,S3]  f32   — channel-block-diag W-pass weights, /std folded
      bias  [3]      f32   — −mean/std
      inv_qscale     float — dequant scale for the H-pass accumulator
    """
    s = out_size
    wh = _resize_weights(h, s) / 255.0                       # [S, H]
    ww = _resize_weights(w, s)                               # [S, W]
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    qscale = 127.0 / float(np.abs(wh).max())
    wh_q = np.round(wh.astype(np.float64) * qscale)
    corr = (wh_q @ np.full((h,), 128.0))[:, None]            # exact in f64
    wbig = np.zeros((w * 3, s * 3), np.float32)
    for c in range(3):
        wbig[c::3, c::3] = ww.T / std_a[c]
    return (
        wh_q.astype(np.int8),
        corr.astype(np.float32),
        wbig,
        (-mean_a / std_a).astype(np.float32),
        float(1.0 / qscale),
    )


def _kernel(x_ref, whq_ref, corr_ref, wbig_ref, o_ref, *,
            bias: tuple, inv_qscale: float):
    """Program b: one frame. x [1,H,W3] u8 → o [1,S,S3] out_dtype."""
    # v − 128 = bitcast(v XOR 0x80) — the bytes feed the int8 MXU directly
    xi8 = jax.lax.bitcast_convert_type(x_ref[0] ^ jnp.uint8(0x80), jnp.int8)
    acc = jnp.dot(whq_ref[...], xi8,
                  preferred_element_type=jnp.int32)          # [S, W3]
    a = (acc.astype(jnp.float32) + corr_ref[...]) * jnp.float32(inv_qscale)
    b = jnp.dot(a.astype(jnp.bfloat16), wbig_ref[...],
                preferred_element_type=jnp.float32)          # [S, S3]
    # per-channel bias from the lane index (c = lane mod 3)
    lane = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1) % 3
    bias_v = jnp.where(lane == 0, bias[0],
                       jnp.where(lane == 1, bias[1], bias[2]))
    o_ref[0] = (b + bias_v).astype(o_ref.dtype)


def preprocess_pallas_available(h: int, w: int, out_size: int,
                                frames_dtype, compute_dtype) -> bool:
    """Gate: TPU backend, uint8 input, bf16 compute, downscale on both
    axes, per-program working set within VMEM budget."""
    if pltpu is None or jax.default_backend() != "tpu":
        return False
    if jnp.dtype(frames_dtype) != jnp.dtype(jnp.uint8):
        return False
    if jnp.dtype(compute_dtype) != jnp.dtype(jnp.bfloat16):
        return False
    s = out_size
    if h < s or w < s or h < 2 or w < 2:
        # downscale only: the weight construction is pinned against
        # jax.image.resize's antialiased (shrinking) branch; eval inputs
        # are high-res frames, upscale never hits this path
        return False
    need = (
        2 * h * w * 3                   # u8 frame + i8 view
        + s * w * 3 * (4 + 4 + 2)       # i32 acc + f32 a + bf16 a
        + (w * 3) * (s * 3) * 2         # Wbig
        + s * h                         # wh_q
        + s * s * 3 * (4 + 2)           # f32 out accumulator + cast
    )
    return need <= _VMEM_BUDGET_BYTES


def eval_preprocess_pallas(frames, out_size: int, mean: tuple, std: tuple,
                           out_dtype=jnp.bfloat16, interpret: bool = False):
    """[..., H, W, 3] uint8 → [..., S, S, 3] ``out_dtype``, fused
    resize+normalize (see module docstring). Caller gates via
    `preprocess_pallas_available`; ``interpret`` runs the kernel in Pallas
    interpret mode (CPU tests).

    NOTE callers inside jit should pass frames whose on-device layout was
    BORN flat-minor (e.g. uploaded as [..., H, W*3] and viewed here) — see
    `data.transforms.eval_preprocess_flat`. Reshaping a live [.., H, W, 3]
    device array to [.., H, W*3] costs a measured ~1.3 ms/200-frame
    relayout on TPU, eating most of the kernel's win.
    """
    lead = frames.shape[:-3]
    h, w, _ = frames.shape[-3:]
    s = out_size
    b = int(np.prod(lead)) if lead else 1
    x = frames.reshape(b, h, w * 3)
    wh_q, corr, wbig, bias, inv_qscale = _folded_weights(
        h, w, s, tuple(mean), tuple(std))

    out = pl.pallas_call(
        functools.partial(_kernel, bias=tuple(float(v) for v in bias),
                          inv_qscale=inv_qscale),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w * 3), lambda i: (i, 0, 0)),
            pl.BlockSpec((s, h), lambda i: (0, 0)),
            pl.BlockSpec((s, 1), lambda i: (0, 0)),
            pl.BlockSpec((w * 3, s * 3), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, s * 3), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, s * 3), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ) if pltpu is not None and not interpret else None,
        interpret=interpret,
    )(x, jnp.asarray(wh_q), jnp.asarray(corr),
      jnp.asarray(wbig, jnp.bfloat16))
    return out.reshape(lead + (s, s, 3))
