"""Sequence (context) parallelism for long-token dense-feature extraction
(beyond-reference).

The reference has no sequence sharding at all (SURVEY.md §5.7 — 197 tokens
per 224² frame, frames flattened into the batch); its high-resolution
dino-s8 configurations (models.py:76 — 3137 tokens @448) simply run bigger
SDPA calls on one GPU. The TPU build already makes those memory-linear on a
single chip via the flash kernel (ops/flash_attention.py); THIS module is
the next axis: shard the **token dimension itself over the mesh**, so one
forward's activation footprint and attention FLOPs split across chips —
the right tool when S grows past what one chip serves at target latency
(S/8 at 896² is 12k tokens) or when a dp-only mesh leaves chips idle on
small batches.

Design — all-gather-KV sequence parallelism (the scaling-book recipe; ring
attention buys nothing at ViT scale where K/V of the whole sequence fit
VMEM comfortably):

  * tokens are sharded ``P('data', 'seq')`` — each device holds a
    contiguous ``[B/dp, S/sp, D]`` token slab;
  * every per-token block op (LayerNorm, QKV / proj / MLP projections,
    residuals) runs on the local slab through the SAME fused row kernels
    the single-chip long-sequence path uses (ops/fused_block.py) — no new
    kernels, constant VMEM in S; the final norm is the plain XLA LayerNorm
    (elementwise, trivially fused by XLA — not worth a kernel);
  * attention gathers K and V over the ``seq`` axis (``lax.all_gather``,
    tiled — 2·S·D bytes per block, the only sequence-axis communication)
    and runs the flash core with **local queries against global keys**
    (``flash_attention(q_local, k_global, v_global, kv_len=S)``), masking
    the gathered padding tail;
  * the CLS token rides shard 0 — attention is global, so placement is
    irrelevant.

The stack is written in shard_map (not GSPMD annotations) because the
Pallas kernels are opaque to the SPMD partitioner — the same reason the
dp training path is shard_map (parallel/tp.py chooses the opposite trade
for tensor parallelism, where XLA's einsum splitting does the work).

Scope: the PRODUCT path is the dense-feature forward (eval / mask
propagation / serving via cli/export) — training at reference configs is
197 tokens where sequence parallelism is pure overhead. The backward is
nonetheless implemented and VERIFIED, not merely claimed: parameter
gradients through the token-sharded stack (row-kernel VJPs; the flash
core's chunked analytic softmax gradient; all_gather transposing to
psum_scatter) match the single-device gradients at two mesh geometries
(test_sp.py::test_sp_backward_matches_single_device), so the module
composes into a training step as a library building block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SEQ_AXIS = "seq"


def make_dp_sp_mesh(dp: int, sp: int, devices=None) -> Mesh:
    """2-D (data, seq) mesh; ``seq`` innermost so the per-block K/V
    all-gathers ride the fastest ICI links."""
    from timetuning_tpu.parallel.mesh import make_2d_mesh

    return make_2d_mesh(dp, sp, (DATA_AXIS, SEQ_AXIS), devices=devices)


def _kernels_on() -> bool:
    from timetuning_tpu.ops.fused_block import fused_block_available

    return fused_block_available()


def _ln_dense(x, s, b, w, bias):
    from timetuning_tpu.ops import fused_block as fb

    if _kernels_on():
        return fb.ln_dense_rows(x, s, b, w, bias)
    return fb.ln_dense_xla(x, s, b, w, bias)


def _dense_residual(y, x, w, bias):
    from timetuning_tpu.ops import fused_block as fb

    if _kernels_on():
        return fb.dense_residual_rows(y, x, w, bias)
    return fb.dense_residual_xla(y, x, w, bias)


def _mlp(x, s, b, w1, b1, w2, b2):
    from timetuning_tpu.ops import fused_block as fb

    if _kernels_on():
        return fb.mlp_block_branch(x, s, b, w1, b1, w2, b2)
    return fb.mlp_block_xla(x, s, b, w1, b1, w2, b2)


def _block_stack(params, h, *, cfg, s_valid: int, n_seq: int):
    """Blocks [0, depth) + final norm over a LOCAL token slab [Bl, Sl, D].

    Per-token math is identical to the single-chip long-sequence branch
    (ops/fused_block.attention_block_branch_flash + mlp_block_branch); the
    only cross-device step is the per-block K/V all-gather. ``s_valid``:
    global count of real tokens (the gathered tail beyond it is padding
    and is masked out of the softmax).
    """
    from timetuning_tpu.ops.fused_block import _ln
    from timetuning_tpu.ops.flash_attention import flash_attention

    dt = cfg.dtype
    x = h.astype(dt)
    Bl, Sl, D = x.shape
    H = cfg.num_heads
    Dh = D // H
    kv_len = None if s_valid == Sl * n_seq else s_valid

    for i in range(cfg.depth):
        p = params[f"blocks_{i}"]
        s1, b1 = p["norm1"]["scale"], p["norm1"]["bias"]
        wq = p["attn"]["qkv"]["kernel"].astype(dt)
        bq = p["attn"]["qkv"].get("bias")
        bq = jnp.zeros((3 * D,), jnp.float32) if bq is None else bq
        wp = p["attn"]["proj"]["kernel"].astype(dt)
        bp = p["attn"]["proj"]["bias"]

        qkv = _ln_dense(x, s1, b1, wq, bq)                 # [Bl, Sl, 3D]
        qkv = qkv.reshape(Bl, Sl, 3, H, Dh)
        q, k, v = (
            jnp.transpose(qkv[:, :, j], (0, 2, 1, 3)) for j in range(3)
        )                                                   # [Bl, H, Sl, Dh]
        # the one sequence-axis collective: K/V become global, Q stays local
        kg = jax.lax.all_gather(k, SEQ_AXIS, axis=2, tiled=True)
        vg = jax.lax.all_gather(v, SEQ_AXIS, axis=2, tiled=True)
        o = flash_attention(q, kg, vg, kv_len=kv_len)       # [Bl, H, Sl, Dh]
        merged = jnp.transpose(o, (0, 2, 1, 3)).reshape(Bl, Sl, D)
        x = _dense_residual(merged, x, wp, bp)

        m = p["mlp"]
        x = _mlp(
            x, p["norm2"]["scale"], p["norm2"]["bias"],
            m["fc1"]["kernel"].astype(dt), m["fc1"]["bias"],
            m["fc2"]["kernel"].astype(dt), m["fc2"]["bias"],
        )

    return _ln(x, params["norm"]["scale"], params["norm"]["bias"])


def sp_forward_fn(model, mesh: Mesh):
    """The raw (unjitted) sequence-parallel forward — exposed separately so
    AOT export (cli/export.py) can fold preprocessing around it before
    tracing. See :func:`make_sp_feature_fn` for semantics."""
    cfg = model.config
    n_seq = mesh.shape[SEQ_AXIS]

    def fwd(params, images):
        hid = model.apply({"params": params}, images, stop_block=0)
        h = hid["hidden"]                                   # [B, 1+N, D]
        B, S, D = h.shape
        Sp = -(-S // n_seq) * n_seq
        h = jnp.pad(h, ((0, 0), (0, Sp - S), (0, 0)))
        stack = jax.shard_map(
            functools.partial(_block_stack, cfg=cfg, s_valid=S, n_seq=n_seq),
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS, SEQ_AXIS)),
            out_specs=P(DATA_AXIS, SEQ_AXIS),
        )
        return stack(params, h)[:, :S]

    return fwd


def make_sp_feature_fn(model, mesh: Mesh):
    """Sequence-parallel dense-feature forward for a ``VisionTransformer``.

    ``model``: the backbone (``models.vit.VisionTransformer``); ``mesh``: a
    ``(data, seq)`` mesh from :func:`make_dp_sp_mesh`. Returns a jitted
    ``fwd(params, images) -> tokens [B, 1+N, D]`` numerically equivalent to
    ``model.apply(...)["tokens"]``: patch embed + pos-embed interpolation
    run as one GSPMD program with the batch sharded ``P('data')``; the
    token axis is then padded to a ``seq``-divisible length and the block
    stack runs under shard_map with tokens sharded ``P('data', 'seq')``.

    Geometry: batch must divide ``dp``. Any token count works (padding is
    masked out of attention and sliced off the output).
    """
    return jax.jit(
        sp_forward_fn(model, mesh),
        in_shardings=(
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P(DATA_AXIS)),
        ),
        out_shardings=NamedSharding(mesh, P(DATA_AXIS)),
    )
