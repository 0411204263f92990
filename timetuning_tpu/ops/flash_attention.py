"""True flash attention (tiled online softmax) for long ViT sequences.

The short-sequence kernels (ops/attention.py, ops/fused_block.py) keep the
whole [S, S] score matrix of one (batch, head) in VMEM — the right call for
197-785 tokens, impossible above ~1024 (ViT-S/8 @448 is 3137 tokens →
a 3200² f32 tile is 41 MB against ~16 MB of VMEM). This kernel never
materializes the score matrix:

  * grid = (batch·heads, query tiles); K/V of the current (b, h) live in
    VMEM (linear in S — 1.6 MB at S=3200), queries are tiled;
  * the kernel streams over key tiles with the online-softmax recurrence
    (running row max ``m``, normalizer ``l``, output accumulator ``acc``
    rescaled by ``exp(m_old − m_new)`` each step — Dao et al.'s
    FlashAttention, computed exactly, not an approximation);
  * VMEM per program is O(Tq·Tk + S·Dh), so sequence length is bounded by
    K/V residency only (~16k tokens at Dh=64), not by S².

Backward: custom VJP with the analytic softmax-attention gradient evaluated
in query chunks via ``lax.map`` — peak memory O(Tq·S) per (b, h) instead of
the O(S²) full-probability tensor the short-sequence path recomputes.

Reference scope note: the reference supports dino-s8 at high input
resolutions through plain torch SDPA (models.py:76, 3137 tokens @448);
this kernel is what makes those configurations memory-linear on TPU
(SURVEY.md §5.7).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from timetuning_tpu.ops.util import pad_to_multiple
from jax.experimental import pallas as pl

try:  # pallas TPU backend is unavailable on CPU-only builds
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

_NEG = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, seq_len: int,
                  block_k: int):
    """One grid step: one query tile of one (batch·head) pair.

    q_ref: [1, Tq, Dp]; k_ref, v_ref: [1, Skp, Dp]; o_ref: [1, Tq, Dp].
    """
    Tq, Dp = q_ref.shape[1], q_ref.shape[2]
    Skp = k_ref.shape[1]
    n_kt = Skp // block_k
    q = q_ref[0]

    def body(kt, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(kt * block_k, block_k), :]
        v = v_ref[0, pl.ds(kt * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                              # [Tq, Tk] f32
        col = (
            jax.lax.broadcasted_iota(jnp.int32, (Tq, block_k), 1)
            + kt * block_k
        )
        s = jnp.where(col < seq_len, s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l, acc

    m0 = jnp.full((Tq, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((Tq, 1), jnp.float32)
    acc0 = jnp.zeros((Tq, Dp), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kt, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-20)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("kv_len", "block_q", "block_k", "interpret")
)
def flash_attention_fwd_pallas(
    q: jax.Array, k: jax.Array, v: jax.Array, kv_len: int | None = None,
    block_q: int = 256, block_k: int | None = None, interpret: bool = False,
) -> jax.Array:
    # Tile defaults measured on v5e at S=3137 (ViT-S/8 @448, B=8·H=6 bf16):
    # whole-K single pass 4.97 ms vs 5.66 ms for block_k=1024 streaming
    # (+14% — one softmax pass, no online-rescale steps); the [Tq, Skp] f32
    # score tile stays ≤ 4 MB up to Skp=4096, beyond which the online
    # streaming recurrence takes over with block_k=1024.
    """q: [B, H, Sq, Dh]; k, v: [B, H, Sk, Dh] → [B, H, Sq, Dh]. Exact
    softmax attention. Sq may differ from Sk (sequence-parallel callers
    keep queries local and gather keys); ``kv_len`` masks keys beyond that
    index (a gathered K whose tail is padding — default: all Sk valid)."""
    B, H, Sq, Dh = q.shape
    Sk = k.shape[2]
    valid = Sk if kv_len is None else kv_len
    scale = 1.0 / math.sqrt(Dh)
    G = B * H
    Dp = pad_to_multiple(Dh, 128)
    if pad_to_multiple(Sk, 128) * Dp * 4 > 10 * 1024 * 1024:
        # Beyond ~16k tokens at Dp=128 the resident K+V (2·Skp·Dp bf16)
        # plus the score tile overflow VMEM — measured on v5e: S=32768
        # fails scoped-vmem compile while the K/V-streamed twin runs at
        # the same TF/s the resident kernel peaks at (S=16k). Below the
        # bound the resident kernel is 10-28% faster (bench_flash_stream);
        # route only the infeasible sizes.
        return flash_attention_fwd_pallas_streamed(
            q, k, v, kv_len=kv_len, block_q=block_q,
            block_k=block_k or 1024, interpret=interpret,
        )
    if block_k is None:
        skp = pad_to_multiple(Sk, 128)
        block_k = skp if skp <= 4096 else 1024
    block_q = min(block_q, pad_to_multiple(Sq, 128))
    block_k = min(block_k, pad_to_multiple(Sk, 128))
    Sqp = pad_to_multiple(Sq, block_q)
    Skp = pad_to_multiple(Sk, block_k)

    def prep(x, sp):
        s = x.shape[2]
        x = x.reshape(G, s, Dh)
        return jnp.pad(x, ((0, 0), (0, sp - s), (0, Dp - Dh)))

    qp = prep(q, Sqp)
    kp = prep(k, Skp)
    vp = prep(v, Skp)

    q_spec = pl.BlockSpec((1, block_q, Dp), lambda g, i: (g, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, Skp, Dp), lambda g, i: (g, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, seq_len=valid,
                          block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((G, Sqp, Dp), q.dtype),
        grid=(G, Sqp // block_q),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :Sq, :Dh].reshape(B, H, Sq, Dh)


def _flash_kernel_stream(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                         *, scale: float, seq_len: int, n_kt: int):
    """K/V-STREAMED grid step: one (query tile, key tile) pair.

    Unlike :func:`_flash_kernel` (whole-K resident in VMEM, key loop inside
    the program), the key axis is a third grid dimension: Pallas
    double-buffers the [1, block_k, Dp] K/V tiles, so the next tile's DMA
    overlaps this tile's compute, and VMEM holds only O(Tq·Tk + Tk·Dh) —
    sequence length is no longer bounded by K/V residency (the ~16k-token
    limit of the resident kernel at Dh=64). The online-softmax carry
    (m, l, acc) lives in VMEM scratch across the key-tile steps of one
    query tile (the TPU grid is sequential)."""
    kt = pl.program_id(2)
    Tq, Dp = q_ref.shape[1], q_ref.shape[2]
    block_k = k_ref.shape[1]

    @pl.when(kt == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                                  # [Tq, Tk] f32
    col = (
        jax.lax.broadcasted_iota(jnp.int32, (Tq, block_k), 1)
        + kt * block_k
    )
    s = jnp.where(col < seq_len, s, _NEG)
    m = m_scr[:, 0:1]
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    corr = jnp.exp(m - m_new)
    l_scr[:, 0:1] = l_scr[:, 0:1] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:, 0:1] = m_new

    @pl.when(kt == n_kt - 1)
    def _():
        o_ref[0] = (
            acc_scr[:] / jnp.maximum(l_scr[:, 0:1], 1e-20)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("kv_len", "block_q", "block_k", "interpret")
)
def flash_attention_fwd_pallas_streamed(
    q: jax.Array, k: jax.Array, v: jax.Array, kv_len: int | None = None,
    block_q: int = 256, block_k: int = 1024, interpret: bool = False,
) -> jax.Array:
    """K/V-streaming twin of :func:`flash_attention_fwd_pallas` — grid
    tiles the key axis too (double-buffered K/V DMA, carry in scratch), so
    VMEM is independent of sequence length. Measured on v5e (VERDICT r4
    #7): see bench_flash_stream.py / KNOWN_GAPS.md for the numbers vs the
    resident-K kernel at each S."""
    B, H, Sq, Dh = q.shape
    Sk = k.shape[2]
    valid = Sk if kv_len is None else kv_len
    scale = 1.0 / math.sqrt(Dh)
    G = B * H
    Dp = pad_to_multiple(Dh, 128)
    block_q = min(block_q, pad_to_multiple(Sq, 128))
    block_k = min(block_k, pad_to_multiple(Sk, 128))
    Sqp = pad_to_multiple(Sq, block_q)
    Skp = pad_to_multiple(Sk, block_k)
    n_kt = Skp // block_k

    def prep(x, sp):
        s = x.shape[2]
        x = x.reshape(G, s, Dh)
        return jnp.pad(x, ((0, 0), (0, sp - s), (0, Dp - Dh)))

    qp = prep(q, Sqp)
    kp = prep(k, Skp)
    vp = prep(v, Skp)

    q_spec = pl.BlockSpec((1, block_q, Dp), lambda g, i, kt: (g, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, Dp), lambda g, i, kt: (g, kt, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_flash_kernel_stream, scale=scale, seq_len=valid,
                          n_kt=n_kt),
        out_shape=jax.ShapeDtypeStruct((G, Sqp, Dp), q.dtype),
        grid=(G, Sqp // block_q, n_kt),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, Dp), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :Sq, :Dh].reshape(B, H, Sq, Dh)


def flash_attention_xla(q, k, v, kv_len: int | None = None):
    """Reference composition (tests / non-TPU fallback)."""
    from timetuning_tpu.ops.attention import attention_xla

    if kv_len is None or kv_len == k.shape[2]:
        return attention_xla(q, k, v)[0]
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    col = jnp.arange(k.shape[2])
    s = jnp.where(col[None, None, None, :] < kv_len, s, _NEG)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _chunked_bwd(q, k, v, g, kv_len: int | None = None, block_q: int = 256):
    """Analytic softmax-attention gradient, streamed over query chunks —
    peak activation O(Tq·S) instead of the O(S²) probability tensor."""
    B, H, S, Dh = q.shape
    Sk = k.shape[2]
    scale = 1.0 / math.sqrt(Dh)
    Sqp = pad_to_multiple(S, block_q)
    nc = Sqp // block_q

    def prep(x):
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Sqp - S), (0, 0)))
        # [nc, B, H, Tq, Dh]: chunk axis leading for lax.map
        return jnp.moveaxis(
            x.reshape(B, H, nc, block_q, Dh), 2, 0
        )

    qc = prep(q.astype(jnp.float32))
    gc = prep(g.astype(jnp.float32))
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    key_ok = (
        None if kv_len is None or kv_len == Sk
        else (jnp.arange(Sk) < kv_len)[None, None, None, :]
    )

    def scan_body(carry, args):
        dk_acc, dv_acc = carry
        q_c, g_c = args                                    # [B, H, Tq, Dh]
        s = jnp.einsum("bhqd,bhkd->bhqk", q_c, kf,
                       preferred_element_type=jnp.float32) * scale
        if key_ok is not None:
            s = jnp.where(key_ok, s, _NEG)
        p = jax.nn.softmax(s, axis=-1)
        dv_acc = dv_acc + jnp.einsum("bhqk,bhqd->bhkd", p, g_c,
                                     preferred_element_type=jnp.float32)
        dp = jnp.einsum("bhqd,bhkd->bhqk", g_c, vf,
                        preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_c = jnp.einsum("bhqk,bhkd->bhqd", ds, kf,
                          preferred_element_type=jnp.float32) * scale
        dk_acc = dk_acc + jnp.einsum("bhqk,bhqd->bhkd", ds, q_c,
                                     preferred_element_type=jnp.float32) * scale
        return (dk_acc, dv_acc), dq_c

    # dk/dv accumulate in the scan carry so peak memory stays O(Tq·S) +
    # the dq output (same size as q) — stacking per-chunk dk/dv first would
    # be O(nc·S·Dh), quadratic in S. The init derives from kf (not a fresh
    # constant) so that under shard_map it carries the body's
    # device-varying axes and the scan carry types match.
    zeros = kf * 0.0
    (dk, dv), dq_chunks = jax.lax.scan(scan_body, (zeros, zeros), (qc, gc))
    dq = jnp.moveaxis(dq_chunks, 0, 2).reshape(B, H, Sqp, Dh)[:, :, :S]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_core(kv_len, q, k, v):
    if pltpu is not None and jax.default_backend() == "tpu":
        return flash_attention_fwd_pallas(q, k, v, kv_len=kv_len)
    return flash_attention_xla(q, k, v, kv_len=kv_len)


def _fwd(kv_len, q, k, v):
    return _flash_core(kv_len, q, k, v), (q, k, v)


def _bwd(kv_len, res, g):
    return _chunked_bwd(*res, g, kv_len=kv_len)


_flash_core.defvjp(_fwd, _bwd)


def flash_attention(q, k, v, kv_len: int | None = None):
    """Differentiable exact attention for long sequences.

    q: [B, H, Sq, Dh]; k, v: [B, H, Sk, Dh] (``Sq == Sk`` for the standard
    self-attention block; sequence-parallel callers pass local queries
    against gathered keys). ``kv_len`` (static) masks gathered-padding keys
    beyond that index."""
    return _flash_core(kv_len, q, k, v)
