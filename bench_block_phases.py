"""Per-phase roofline of the S/16 fused transformer block (VERDICT r4 #1).

Dense S/16 runs at ~55% of v5e bf16 peak while B/16 hits ~71% on the same
kernel stack. This bench decomposes ONE fused block at the flagship shape
(B=256, S=197→Sp=208, D=384, H=6, Dh=64) into its phases, measuring each as
its own Pallas kernel with the production memory layout, so the gap is
attributed to a phase instead of guessed at:

  * attn_full        — production attention-branch kernel (ops/fused_block)
  * attn_matmuls     — same kernel minus the attention core (LN+QKV+proj+res)
  * attn_core        — per-head loop only, from precomputed QKV
  * attn_core_paired — head-PAIRED core: 2×Dh=64 heads per Dh=128 block-diag
                       contraction (2× core MACs, full-lane); the experiment
                       VERDICT r4 #1 asks for
  * mlp_full         — production MLP-branch kernel
  * matmul SoL probes — plain [M,K]x[K,N] kernels at each phase's shape, the
                       speed-of-light at that geometry

Prints one JSON line per row: ms/block-layer, phase GFLOPs (2*MACs, useful
work only — the paired core's duplicated MACs are NOT counted as useful),
achieved TF/s, % of v5e bf16 peak.
"""

from __future__ import annotations

import functools
import json
import math
import sys

V5E_BF16_PEAK_TFS = 197.0


def _mk(shape, key):
    import jax
    import jax.numpy as jnp

    return jax.jit(
        lambda k: jax.random.normal(k, shape, jnp.bfloat16)
    )(jax.random.PRNGKey(key))


_TAIL_ONLY = False   # --tail: measure only the overhead/in-net rows
_TAIL_ROWS = ("dispatch_overhead_128x128x128",)


def _row(name, fn, bufs, flops, iters=60):
    from bench_util import time_chained_fps

    if _TAIL_ONLY and name not in _TAIL_ROWS:
        return {"phase": name, "skipped": True}
    # best of 3 chains: the tunneled dev chip shows run-to-run interference
    # (other tenants / tunnel latency); the min is the kernel's capability
    cps = max(
        time_chained_fps(fn, bufs, iters=iters, units_per_call=1.0)
        for _ in range(3)
    )
    ms = 1e3 / cps
    tfs = cps * flops / 1e12
    row = {
        "phase": name,
        "ms": round(ms, 4),
        "gflops": round(flops / 1e9, 2),
        "tf_s": round(tfs, 1),
        "pct_peak": round(100 * tfs / V5E_BF16_PEAK_TFS, 1),
    }
    print(json.dumps(row), flush=True)
    return row


# ------------------------------------------------------------------ #
# phase kernels (same layout conventions as ops/fused_block)

def _attn_matmuls_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                         wproj_ref, bproj_ref, o_ref, *, block_b):
    import jax
    import jax.numpy as jnp

    from timetuning_tpu.ops.fused_block import _ln_rows

    D = x_ref.shape[-1]
    Sp = x_ref.shape[1]
    x_all = x_ref[:].reshape(block_b * Sp, D)
    xn = _ln_rows(x_all.astype(jnp.float32), lns_ref[:], lnb_ref[:]).astype(
        x_all.dtype)
    qkv = jax.lax.dot_general(
        xn, wqkv_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[:]
    merged = qkv[:, :D].astype(x_all.dtype)       # stand-in for the attn core
    out = jax.lax.dot_general(
        merged, wproj_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[:]
    o_ref[:] = (x_all.astype(jnp.float32) + out).astype(o_ref.dtype).reshape(
        block_b, Sp, D)


def _attn_core_kernel(qkv_ref, o_ref, *, num_heads, seq_len, block_b):
    import jax
    import jax.numpy as jnp

    D = o_ref.shape[-1]
    Dh = D // num_heads
    scale = 1.0 / math.sqrt(Dh)
    Sp = qkv_ref.shape[1]
    neg = jnp.float32(-1e30)
    key_valid = jax.lax.broadcasted_iota(jnp.int32, (Sp, Sp), 1) < seq_len
    qkv = qkv_ref[:]
    merged_all = []
    for g in range(block_b):
        outs = []
        for h in range(num_heads):
            q = qkv[g, :, h * Dh:(h + 1) * Dh]
            k = qkv[g, :, D + h * Dh: D + (h + 1) * Dh]
            v = qkv[g, :, 2 * D + h * Dh: 2 * D + (h + 1) * Dh]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            s = jnp.where(key_valid, s, neg)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qkv.dtype)
            outs.append(jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(qkv.dtype))
        merged_all.append(jnp.concatenate(outs, axis=-1)[None])
    o_ref[:] = jnp.concatenate(merged_all, axis=0)


def _attn_core_paired_kernel(qkv_ref, o_ref, *, num_heads, seq_len, block_b):
    """Head-paired core: heads (2h, 2h+1) share one contraction.

    q_pair = [q_a | q_b]                        [Sp, 128]
    k_bd   = [[k_a, 0], [0, k_b]]               [2Sp, 128] block-diagonal
    s_pair = q_pair @ k_bd.T                    [Sp, 2Sp]  (K=128 full-lane)
      cols :Sp  = head-a scores, cols Sp: = head-b scores
    softmax per half, then
    v_bd   = [[v_a, 0], [0, v_b]]               [2Sp, 128]
    o_pair = p_pair @ v_bd                      [Sp, 128] = [o_a | o_b]
    2x the core MACs of the unpaired loop, but every contraction is K=128.
    """
    import jax
    import jax.numpy as jnp

    D = o_ref.shape[-1]
    Dh = D // num_heads
    scale = 1.0 / math.sqrt(Dh)
    Sp = qkv_ref.shape[1]
    neg = jnp.float32(-1e30)
    zero = None
    key_valid = jax.lax.broadcasted_iota(jnp.int32, (Sp, 2 * Sp), 1) % Sp < seq_len
    qkv = qkv_ref[:]
    merged_all = []
    for g in range(block_b):
        outs = []
        for hp in range(num_heads // 2):
            a, b = 2 * hp, 2 * hp + 1
            q_pair = qkv[g, :, a * Dh:(b + 1) * Dh]                 # [Sp, 2Dh]
            k_a = qkv[g, :, D + a * Dh: D + (a + 1) * Dh]
            k_b = qkv[g, :, D + b * Dh: D + (b + 1) * Dh]
            v_a = qkv[g, :, 2 * D + a * Dh: 2 * D + (a + 1) * Dh]
            v_b = qkv[g, :, 2 * D + b * Dh: 2 * D + (b + 1) * Dh]
            if zero is None:
                zero = jnp.zeros_like(k_a)
            k_bd = jnp.concatenate(
                [jnp.concatenate([k_a, zero], axis=1),
                 jnp.concatenate([zero, k_b], axis=1)], axis=0)     # [2Sp,2Dh]
            v_bd = jnp.concatenate(
                [jnp.concatenate([v_a, zero], axis=1),
                 jnp.concatenate([zero, v_b], axis=1)], axis=0)
            s = jax.lax.dot_general(
                q_pair, k_bd, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                               # [Sp, 2Sp]
            s = jnp.where(key_valid, s, neg)
            # per-half softmax via lane slices (Mosaic can't shape-cast
            # [Sp,2Sp]->[Sp,2,Sp])
            halves = []
            for h0 in range(2):
                sh = s[:, h0 * Sp:(h0 + 1) * Sp]
                m = jnp.max(sh, axis=-1, keepdims=True)
                e = jnp.exp(sh - m)
                halves.append(e / jnp.sum(e, axis=-1, keepdims=True))
            p = jnp.concatenate(halves, axis=1).astype(qkv.dtype)
            outs.append(jax.lax.dot_general(
                p, v_bd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(qkv.dtype))                                    # [Sp, 2Dh]
        merged_all.append(jnp.concatenate(outs, axis=-1)[None])
    o_ref[:] = jnp.concatenate(merged_all, axis=0)


def _matmul_kernel(a_ref, b_ref, o_ref):
    import jax
    import jax.numpy as jnp

    o_ref[0] = jax.lax.dot_general(
        a_ref[0], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from timetuning_tpu.runtime import setup_compilation_cache
    from timetuning_tpu.ops.fused_block import (
        _attn_pallas, _mlp_pallas, _full_spec, _seq_pad,
    )

    setup_compilation_cache()

    global _TAIL_ONLY
    _TAIL_ONLY = "--tail" in sys.argv   # just the overhead + in-net rows

    B, S, D, H = 256, 197, 384, 6
    Sp = _seq_pad(S, jnp.bfloat16)          # 208
    BLOCK_B = 4
    G = B // BLOCK_B

    x = _mk((B, S, D), 0)
    x2 = _mk((B, S, D), 1)
    ln_s = jnp.ones((D,), jnp.float32)
    ln_b = jnp.zeros((D,), jnp.float32)
    w_qkv = _mk((D, 3 * D), 2)
    b_qkv = jnp.zeros((3 * D,), jnp.float32)
    w_proj = _mk((D, D), 3)
    b_proj = jnp.zeros((D,), jnp.float32)
    w1 = _mk((D, 4 * D), 4)
    b1 = jnp.zeros((4 * D,), jnp.float32)
    w2 = _mk((4 * D, D), 5)
    b2 = jnp.zeros((D,), jnp.float32)

    f_qkv = 2 * B * Sp * D * 3 * D
    f_proj = 2 * B * Sp * D * D
    f_core = 4 * B * H * Sp * Sp * (D // H)
    f_mlp = 16 * B * Sp * D * D
    rows = []

    # -- production kernels ------------------------------------------------
    attn = jax.jit(lambda a: _attn_pallas(
        a, ln_s, ln_b, w_qkv, b_qkv, w_proj, b_proj, H))
    rows.append(_row("attn_full", attn, [(x,), (x2,)], f_qkv + f_proj + f_core))

    mlp = jax.jit(lambda a: _mlp_pallas(a, ln_s, ln_b, w1, b1, w2, b2))
    rows.append(_row("mlp_full", mlp, [(x,), (x2,)], f_mlp))

    # -- attention minus core ---------------------------------------------
    xp = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0)))
    xp2 = jnp.pad(x2, ((0, 0), (0, Sp - S), (0, 0)))
    x_spec = pl.BlockSpec((BLOCK_B, Sp, D), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    @jax.jit
    def attn_matmuls(a):
        return pl.pallas_call(
            functools.partial(_attn_matmuls_kernel, block_b=BLOCK_B),
            out_shape=jax.ShapeDtypeStruct((B, Sp, D), a.dtype),
            grid=(G,),
            in_specs=[x_spec, _full_spec(1, D), _full_spec(1, D),
                      _full_spec(D, 3 * D), _full_spec(1, 3 * D),
                      _full_spec(D, D), _full_spec(1, D)],
            out_specs=x_spec,
        )(a, ln_s.reshape(1, -1), ln_b.reshape(1, -1), w_qkv,
          b_qkv.reshape(1, -1), w_proj, b_proj.reshape(1, -1))

    rows.append(_row("attn_matmuls", attn_matmuls, [(xp,), (xp2,)],
                     f_qkv + f_proj))

    # -- attention core from precomputed QKV -------------------------------
    qkv_in = _mk((B, Sp, 3 * D), 6)
    qkv_in2 = _mk((B, Sp, 3 * D), 7)
    qkv_spec = pl.BlockSpec((BLOCK_B, Sp, 3 * D), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def core_call(kernel, a):
        return pl.pallas_call(
            functools.partial(kernel, num_heads=H, seq_len=S,
                              block_b=BLOCK_B),
            out_shape=jax.ShapeDtypeStruct((B, Sp, D), a.dtype),
            grid=(G,),
            in_specs=[qkv_spec],
            out_specs=x_spec,
        )(a)

    core = jax.jit(functools.partial(core_call, _attn_core_kernel))
    rows.append(_row("attn_core", core, [(qkv_in,), (qkv_in2,)], f_core))

    paired = jax.jit(functools.partial(core_call, _attn_core_paired_kernel))
    if not _TAIL_ONLY:
        # correctness first: paired must equal unpaired on the valid region
        ref = core(qkv_in)[:, :S]
        got = paired(qkv_in)[:, :S]
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        assert err < 0.05, f"paired core mismatch: {err}"
    rows.append(_row("attn_core_paired", paired, [(qkv_in,), (qkv_in2,)],
                     f_core))

    # -- matmul speed-of-light probes at each phase geometry ---------------
    def matmul_probe(name, M, K, N, grid=G):
        a = _mk((grid, M, K), 10)
        a2 = _mk((grid, M, K), 11)
        b = _mk((K, N), 12)

        @jax.jit
        def run(av):
            return pl.pallas_call(
                _matmul_kernel,
                out_shape=jax.ShapeDtypeStruct((grid, M, N), av.dtype),
                grid=(grid,),
                in_specs=[pl.BlockSpec((1, M, K), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                          _full_spec(K, N)],
                out_specs=pl.BlockSpec((1, M, N), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
            )(av, b)

        return _row(name, run, [(a,), (a2,)], 2 * grid * M * K * N)

    rows.append(matmul_probe("sol_qkv_832x384x1152", BLOCK_B * Sp, D, 3 * D))
    rows.append(matmul_probe("sol_proj_832x384x384", BLOCK_B * Sp, D, D))
    rows.append(matmul_probe("sol_mlp1_832x384x1536", BLOCK_B * Sp, D, 4 * D))
    rows.append(matmul_probe("sol_mlp2_832x1536x384", BLOCK_B * Sp, 4 * D, D))
    rows.append(matmul_probe("sol_head_208x64x208", Sp, 64, Sp,
                             grid=G * BLOCK_B * H))
    rows.append(matmul_probe("sol_pair_208x128x416", Sp, 128, 2 * Sp,
                             grid=G * BLOCK_B * H // 2))
    # chip sanity: big square matmul (1024³ — a 2048² bf16 block + f32
    # accumulator overflows the 16 MB scoped-vmem stack limit)
    rows.append(matmul_probe("sol_big_1024x1024x1024", 1024, 1024, 1024,
                             grid=32))

    # -- XLA full-batch dot at the same geometries ------------------------
    # If XLA's own schedule beats the per-tile Pallas SoL, the fused
    # block's grid granularity (M=block_b*Sp rows per step) is the bound,
    # not the (K, N) geometry itself.
    def xla_probe(name, K, N, M=B * Sp):
        a = _mk((M, K), 20)
        a2 = _mk((M, K), 21)
        w = _mk((K, N), 22)
        run = jax.jit(lambda av: jax.lax.dot_general(
            av, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))
        return _row(name, run, [(a,), (a2,)], 2 * M * K * N)

    rows.append(xla_probe("xla_qkv_53248x384x1152", D, 3 * D))
    rows.append(xla_probe("xla_proj_53248x384x384", D, D))
    rows.append(xla_probe("xla_mlp1_53248x384x1536", D, 4 * D))
    rows.append(xla_probe("xla_mlp2_53248x1536x384", 4 * D, D))
    rows.append(xla_probe("xla_big_4096x4096x4096", 4096, 4096, M=4096))

    # -- per-dispatch overhead probe ---------------------------------------
    # A near-empty kernel through the same methodology: its "ms" is the
    # fixed dispatch cost every isolated row above carries (the tunneled
    # chip adds a substantial per-dispatch floor). Subtract it before
    # comparing isolated phases with the single-dispatch production net.
    rows.append(matmul_probe("dispatch_overhead_128x128x128", 128, 128, 128,
                             grid=1))

    # -- marginal per-block cost inside the production net -----------------
    # Depth differencing removes dispatch overhead AND keeps cross-layer
    # pipelining: (t_depth12 − t_depth6) / 6 is the true steady-state cost
    # of one fused block in situ.
    from timetuning_tpu.models.vit import ViTConfig, VisionTransformer

    def depth_time(depth):
        cfg = ViTConfig(patch_size=16, embed_dim=D, depth=depth,
                        num_heads=H, img_size=224, dtype=jnp.bfloat16)
        net = VisionTransformer(cfg)
        params = net.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 224, 224, 3)))["params"]
        frames = [_mk((B, 224, 224, 3), 30 + i) for i in range(2)]
        fwd = jax.jit(lambda f: net.apply({"params": params}, f)["tokens"])
        from bench_util import time_chained_fps

        cps = max(
            time_chained_fps(fwd, [(frames[0],), (frames[1],)], iters=30,
                             units_per_call=1.0)
            for _ in range(3)
        )
        return 1e3 / cps

    t12, t6 = depth_time(12), depth_time(6)
    blk_ms = (t12 - t6) / 6
    blk_flops = f_qkv + f_proj + f_core + f_mlp
    rows.append({
        "phase": "block_marginal_in_net (depth12-depth6)/6",
        "ms": round(blk_ms, 4),
        "gflops": round(blk_flops / 1e9, 2),
        "tf_s": round(blk_flops / blk_ms / 1e9, 1),
        "pct_peak": round(100 * blk_flops / blk_ms / 1e9
                          / V5E_BF16_PEAK_TFS, 1),
    })
    print(json.dumps(rows[-1]), flush=True)

    # -- block_b sweep on the production kernels ---------------------------
    for bb in (2, 8):
        attn_bb = jax.jit(lambda a, bb=bb: _attn_pallas(
            a, ln_s, ln_b, w_qkv, b_qkv, w_proj, b_proj, H, block_b=bb))
        rows.append(_row(f"attn_full_bb{bb}", attn_bb, [(x,), (x2,)],
                         f_qkv + f_proj + f_core))
        mlp_bb = jax.jit(lambda a, bb=bb: _mlp_pallas(
            a, ln_s, ln_b, w1, b1, w2, b2, block_b=bb))
        rows.append(_row(f"mlp_full_bb{bb}", mlp_bb, [(x,), (x2,)], f_mlp))

    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    sys.exit(main())
