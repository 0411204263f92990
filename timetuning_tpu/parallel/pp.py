"""Pipeline parallelism (GPipe microbatch schedule) for the ViT block stack
(beyond-reference).

The reference has no pipeline parallelism (SURVEY.md §2.2 — DDP data
parallelism is its only distribution strategy). This module completes the
framework's parallelism matrix (dp / tp / sp / ZeRO-1 / pp): split the
transformer *depth* over a ``pipe`` mesh axis, so each device holds and
executes only ``depth / pp`` blocks — the right tool when the backbone's
parameters + activations outgrow one chip's HBM but the per-layer math is
too small for tensor parallelism to win (TP's per-block all-reduces vs PP's
single [B_mb, S, D] ppermute per stage boundary).

Design — classic GPipe forward schedule in ``shard_map``:

  * per-stage parameters: the ``blocks_i`` subtrees are stacked into one
    pytree with a leading ``[pp, depth/pp, ...]`` axis and sharded
    ``P('pipe')`` — each device materializes only its own stage's blocks;
  * the local batch splits into ``n_micro`` microbatches; a
    ``lax.scan`` of ``n_micro + pp - 1`` ticks flows them through the
    stages, each tick running this device's blocks and ``ppermute``-ing the
    activation slab to the next stage (one [B_mb, S, D] hop per tick — the
    only pipeline communication);
  * bubble ticks compute on don't-care slabs (the standard GPipe cost:
    a ``(pp-1)/(n_micro+pp-1)`` utilization bubble — raise ``n_micro`` to
    amortize);
  * the last stage collects finished microbatches; one masked ``psum``
    returns the result replicated over ``pipe``.

Stage math is the model's own ``Block`` module applied to sliced stage
params — the single-device forward's exact dispatch (fused kernels on TPU
bf16, XLA otherwise), so equivalence tests prove only the schedule.

Composes with data parallelism over a 2-D ``(data, pipe)`` mesh: batch
sharded ``P('data')``, stages over ``pipe``.

Scope: the PRODUCT path is the dense-feature forward (eval / serving via
cli/export), like parallel/sp.py — training at reference configs is 12
ViT-S blocks where PP is pure overhead. The backward is nonetheless
implemented and VERIFIED, not merely claimed: parameter gradients through
the GPipe schedule match the single-device gradients at both pipe-only
and dp×pp geometries (test_pp.py::test_pp_schedule_differentiable), so
the module composes into a training step as a library building block.
Note the default ``n_micro = pp`` forward bubble is ~50%; raise
``n_micro`` (docs/scaling.md discusses the GPipe-vs-1F1B trade — 1F1B
only helps activation memory of a *training* pipeline, not this bubble).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
PIPE_AXIS = "pipe"


def make_dp_pp_mesh(dp: int, pp: int, devices=None) -> Mesh:
    """2-D (data, pipe) mesh; ``pipe`` innermost so the stage-boundary
    ppermutes ride the fastest ICI links."""
    from timetuning_tpu.parallel.mesh import make_2d_mesh

    return make_2d_mesh(dp, pp, (DATA_AXIS, PIPE_AXIS), devices=devices)


def validate_pp_geometry(config, pp: int, batch: int, dp: int,
                         n_micro: int) -> None:
    """Shardability constraints: depth divides into equal stages, the local
    batch divides into microbatches."""
    if config.depth % pp:
        raise ValueError(f"depth={config.depth} not divisible by pp={pp}")
    if batch % dp:
        raise ValueError(f"batch={batch} not divisible by dp={dp}")
    if (batch // dp) % n_micro:
        raise ValueError(
            f"local batch {batch // dp} not divisible by n_micro={n_micro}"
        )


def stack_stage_params(params, n_stages: int):
    """Split ``blocks_0..blocks_{depth-1}`` into ``n_stages`` equal stages
    and stack them leaf-wise into ONE pytree with leading ``[n_stages, L]``
    axes (L = depth // n_stages). Returns ``(stacked, depth)``.

    Sharded ``P('pipe')`` on axis 0, each device holds exactly its stage's
    block parameters — the pipeline's memory win."""
    depth = sum(1 for k in params if str(k).startswith("blocks_"))
    if depth == 0:
        raise ValueError("param tree has no blocks_i subtrees")
    if depth % n_stages:
        raise ValueError(f"depth={depth} not divisible by pp={n_stages}")
    L = depth // n_stages
    stages = []
    for s in range(n_stages):
        group = [params[f"blocks_{s * L + i}"] for i in range(L)]
        stages.append(jax.tree.map(lambda *xs: jnp.stack(xs), *group))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *stages)
    return stacked, depth


def _pipeline_stage(stacked, h, *, block, n_pipe: int, n_micro: int):
    """shard_map body: run this device's stage over the GPipe schedule.

    stacked: stage params, leaves [1, L, ...] (this device's shard);
    h: local token slab [B_local, S, D]. Returns [B_local, S, D] replicated
    over ``pipe``."""
    stage = jax.lax.axis_index(PIPE_AXIS)
    local = jax.tree.map(lambda l: l[0], stacked)          # [L, ...]
    L = jax.tree.leaves(local)[0].shape[0]

    B_local, S, D = h.shape
    Bmb = B_local // n_micro
    micro = h.reshape(n_micro, Bmb, S, D)

    def stage_fn(x):
        for i in range(L):
            p_i = jax.tree.map(lambda l: l[i], local)
            x, _ = block.apply({"params": p_i}, x)
        return x.astype(h.dtype)

    fwd = [(d, (d + 1) % n_pipe) for d in range(n_pipe)]

    def tick(carry, t):
        h_recv, out_buf = carry
        mb = jax.lax.dynamic_index_in_dim(
            micro, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False
        )
        x_in = jnp.where(stage == 0, mb, h_recv)
        y = stage_fn(x_in)
        # the last stage banks microbatch t-(pp-1) once it's real
        o_idx = jnp.clip(t - (n_pipe - 1), 0, n_micro - 1)
        valid = (stage == n_pipe - 1) & (t >= n_pipe - 1)
        cur = jax.lax.dynamic_index_in_dim(out_buf, o_idx, 0, keepdims=False)
        out_buf = jax.lax.dynamic_update_index_in_dim(
            out_buf, jnp.where(valid, y, cur), o_idx, 0
        )
        # hand the slab to the next stage (wraps last→0; stage 0 ignores it)
        h_next = jax.lax.ppermute(y, PIPE_AXIS, fwd)
        return (h_next, out_buf), None

    # carries become device-varying on the first tick — mark the zero inits
    def vary(x):
        return jax.lax.pcast(x, (DATA_AXIS, PIPE_AXIS), to="varying")
    h0 = vary(jnp.zeros((Bmb, S, D), h.dtype))
    out0 = vary(jnp.zeros((n_micro, Bmb, S, D), h.dtype))
    (_, out_buf), _ = jax.lax.scan(
        tick, (h0, out0), jnp.arange(n_micro + n_pipe - 1)
    )
    out = jax.lax.psum(
        jnp.where(stage == n_pipe - 1, out_buf, jnp.zeros_like(out_buf)),
        PIPE_AXIS,
    )
    return out.reshape(B_local, S, D)


def _auto_n_micro(b_local: int, n_pipe: int) -> int:
    """Largest divisor of the local batch ≤ the pipe degree — THE auto rule
    (``cli/export.py`` imports this same function), so odd geometries
    (e.g. B_local=2, pp=3) pick a legal microbatch count instead of
    failing batch divisibility."""
    for nm in range(min(b_local, n_pipe), 0, -1):
        if b_local % nm == 0:
            return nm
    return 1


def pp_forward_fn(model, mesh: Mesh, n_micro: int | None):
    """The raw (unjitted) pipeline-parallel forward — exposed separately so
    AOT export can fold preprocessing around it before tracing. See
    :func:`make_pp_feature_fn` for semantics. ``n_micro=None`` picks the
    largest divisor of the local batch ≤ the pipe degree at trace time."""
    from flax import linen as nn

    from timetuning_tpu.models.vit import Block
    from timetuning_tpu.ops.fused_block import _ln

    cfg = model.config
    if getattr(cfg, "moe_every_k", 0):
        raise ValueError(
            "pipeline parallelism does not support MoE ViTs (MoE and dense "
            "blocks have different param trees, so stages cannot be stacked "
            "uniformly) — shard the experts instead (parallel/ep.py)"
        )
    n_pipe = mesh.shape[PIPE_AXIS]
    block_cls = nn.remat(Block) if cfg.remat else Block
    block = block_cls(cfg.num_heads, cfg.mlp_ratio, cfg.qkv_bias, cfg.dtype,
                      cfg.attn_impl)

    def fwd(params, images):
        # geometry checks at trace time (shapes are static): a clear
        # ValueError here instead of an opaque reshape failure inside the
        # shard_map body
        dp = mesh.shape[DATA_AXIS]
        B = images.shape[0]
        nm = n_micro if n_micro else _auto_n_micro(B // max(dp, 1), n_pipe)
        validate_pp_geometry(cfg, n_pipe, B, dp, nm)
        hid = model.apply({"params": params}, images, stop_block=0)
        h = hid["hidden"]                                    # [B, 1+N, D]
        stacked, _ = stack_stage_params(params, n_pipe)
        stacked = jax.lax.with_sharding_constraint(
            stacked, NamedSharding(mesh, P(PIPE_AXIS))
        )
        out = jax.shard_map(
            functools.partial(
                _pipeline_stage, block=block, n_pipe=n_pipe, n_micro=nm
            ),
            mesh=mesh,
            in_specs=(P(PIPE_AXIS), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
        )(stacked, h)
        # final norm is replicated + elementwise — outside the pipeline,
        # same f32-stats math as the single-device nn.LayerNorm
        return _ln(out, params["norm"]["scale"], params["norm"]["bias"])

    return fwd


def make_pp_feature_fn(model, mesh: Mesh, n_micro: int | None = None):
    """Pipeline-parallel dense-feature forward for a ``VisionTransformer``.

    ``model``: the backbone (``models.vit.VisionTransformer``); ``mesh``: a
    ``(data, pipe)`` mesh from :func:`make_dp_pp_mesh`; ``n_micro``:
    microbatches per local batch (default: picked at trace time as the
    largest divisor of the local batch ≤ the pipe degree — a 50%
    utilization floor; raise it to shrink the bubble). Returns a jitted
    ``fwd(params, images) -> tokens [B, 1+N, D]`` numerically equivalent to
    ``model.apply(...)["tokens"]``: patch embed + pos-embed interpolation
    run GSPMD with the batch ``P('data')``; the block stack then runs the
    GPipe schedule with stage params sharded ``P('pipe')``.

    Geometry: ``depth % pp == 0``, ``batch % dp == 0``,
    ``(batch/dp) % n_micro == 0`` (see :func:`validate_pp_geometry`).
    Params are passed in the ordinary (unstacked) layout and re-staged
    inside the program — one [params]-sized reshard per call, negligible
    against the forward at eval batch sizes and zero API friction.
    """
    return jax.jit(
        pp_forward_fn(model, mesh, n_micro),
        in_shardings=(
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P(DATA_AXIS)),
        ),
        out_shardings=NamedSharding(mesh, P(DATA_AXIS)),
    )
