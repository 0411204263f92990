"""Expert parallelism for Mixture-of-Experts MLP layers (beyond-reference).

No model in the reference inventory has MoE layers (SURVEY.md §2.2 — the
reference's only distribution strategy is DDP data parallelism), so this
axis exists purely as framework capability: it completes the parallelism
matrix (dp / tp / sp / pp / ZeRO-1 / ep) so a backbone that DOES adopt
sparse MLPs (the standard way past dense-FLOP scaling walls) drops in with
its experts sharded across the mesh rather than replicated.

Design — the Mesh-TensorFlow/Switch einsum formulation, partitioned by
GSPMD rather than hand-written collectives:

  * ``MoEMlp``: a drop-in sparse variant of the transformer MLP. A router
    Dense scores each token over ``n_experts``; top-1 (switch) routing
    with a capacity factor assigns each token a slot in its expert's
    ``[E, C, D]`` buffer (overflow tokens are dropped — their output is 0,
    so a residual connection passes them through unchanged, the Switch
    convention);
  * dispatch and combine are einsums against a ``[T, E, C]`` one-hot
    dispatch tensor, and the expert FFNs are ONE batched matmul pair over
    expert-stacked weights ``[E, D, H] / [E, H, D]`` — no per-expert
    Python loop, everything MXU-shaped;
  * expert parallelism = sharding those stacked weights (and the
    ``[E, C, D]`` expert buffers) ``P('expert')`` over a
    ``(data, expert)`` mesh and jitting the SAME dense math: the SPMD
    partitioner inserts the token all-to-alls that manual EP
    implementations hand-roll. Router params and LayerNorms replicate.

Gradients flow through gates and expert weights (routing argmax is
piecewise-constant, as in Switch); jax.grad works on the jitted EP
program unchanged.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
EXPERT_AXIS = "expert"


def make_dp_ep_mesh(dp: int, ep: int, devices=None) -> Mesh:
    """2-D (data, expert) mesh; ``expert`` innermost so the dispatch/combine
    all-to-alls ride the fastest ICI links."""
    from timetuning_tpu.parallel.mesh import make_2d_mesh

    return make_2d_mesh(dp, ep, (DATA_AXIS, EXPERT_AXIS), devices=devices)


class MoEMlp(nn.Module):
    """Switch-style top-1 MoE MLP: [B, S, D] → [B, S, D].

    ``capacity_factor`` sizes each expert's token buffer
    ``C = ceil(T/E · f)``; overflow tokens produce 0 (pass through a
    residual unchanged). Expert FFN weights are stacked ``[E, ...]`` so the
    whole layer is two batched matmuls — and so expert parallelism is just
    a ``P('expert')`` sharding on axis 0 (see :func:`ep_param_specs`).
    """

    n_experts: int
    hidden_dim: int
    capacity_factor: float = 1.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, S, D = x.shape
        E, H = self.n_experts, self.hidden_dim
        T = B * S
        C = max(1, int(-(-T * self.capacity_factor // E)))

        xt = x.reshape(T, D)
        logits = nn.Dense(E, use_bias=False, dtype=self.dtype,
                          name="router")(xt)            # [T, E]
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        expert = jnp.argmax(probs, axis=-1)             # [T]
        gate = jnp.take_along_axis(probs, expert[:, None], axis=1)[:, 0]

        onehot = jax.nn.one_hot(expert, E, dtype=jnp.float32)      # [T, E]
        # slot of each token within its expert (0-based), in token order —
        # the deterministic Switch tie-break
        pos = jnp.cumsum(onehot, axis=0) * onehot - 1.0            # [T, E]
        kept = (pos < C) & (onehot > 0)
        slot = jnp.clip(pos, 0, C - 1).astype(jnp.int32)
        slot_oh = jax.nn.one_hot(slot, C, dtype=jnp.float32) * kept[..., None]
        dispatch = slot_oh                                         # [T, E, C]
        combine = dispatch * gate[:, None, None]                   # [T, E, C]

        w1 = self.param("w1", nn.initializers.lecun_normal(), (E, D, H))
        b1 = self.param("b1", nn.initializers.zeros, (E, H))
        w2 = self.param("w2", nn.initializers.lecun_normal(), (E, H, D))
        b2 = self.param("b2", nn.initializers.zeros, (E, D))

        xin = jnp.einsum("tec,td->ecd", dispatch.astype(self.dtype),
                         xt.astype(self.dtype))                    # [E, C, D]
        h = jnp.einsum("ecd,edh->ech", xin, w1.astype(self.dtype))
        h = jax.nn.gelu(h + b1[:, None, :].astype(h.dtype),
                        approximate=False)
        out = jnp.einsum("ech,ehd->ecd", h, w2.astype(self.dtype))
        out = out + b2[:, None, :].astype(out.dtype)               # [E, C, D]
        yt = jnp.einsum("tec,ecd->td", combine.astype(out.dtype), out)
        return yt.reshape(B, S, D).astype(x.dtype)


def ep_param_specs(params, n_experts: int | None = None) -> object:
    """PartitionSpec tree for a param tree containing MoEMlp layers: the
    expert-stacked FFN leaves (w1/b1/w2/b2 under an MoE module) shard
    ``P('expert')`` on the expert axis; routers and everything else
    replicate.

    When ``n_experts`` is given, a w1/b1/w2/b2-named leaf is only treated as
    expert-stacked if its leading axis equals ``n_experts`` — a non-MoE
    parameter that happens to reuse those names stays replicated instead of
    being mis-sharded."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params)
    out = {}
    for k, v in flat.items():
        name = k[-1]
        stacked = name in ("w1", "b1", "w2", "b2") and getattr(v, "ndim", 0) >= 1
        if stacked and n_experts is not None:
            stacked = v.shape[0] == n_experts
        out[k] = P(EXPERT_AXIS) if stacked else P()
    return tu.unflatten_dict(out)


def make_ep_moe_fn(module: MoEMlp, mesh: Mesh):
    """Expert-parallel forward factory: returns ``fwd(params, x)`` jitted
    with the expert-stacked weights sharded ``P('expert')`` and the batch
    ``P('data')`` — GSPMD partitions the dispatch/expert/combine einsums
    and inserts the token all-to-alls. Numerically identical to
    ``module.apply`` (same program, different sharding)."""
    validate_ep_geometry(module.n_experts, mesh.shape[EXPERT_AXIS])

    def fwd(params, x):
        return module.apply({"params": params}, x)

    def make(params):
        specs = ep_param_specs(params, n_experts=module.n_experts)
        return jax.jit(
            fwd,
            in_shardings=(
                jax.tree.map(lambda sp: NamedSharding(mesh, sp), specs),
                NamedSharding(mesh, P(DATA_AXIS)),
            ),
            out_shardings=NamedSharding(mesh, P(DATA_AXIS)),
        )

    return make


def validate_ep_geometry(n_experts: int, ep: int) -> None:
    if n_experts % ep:
        raise ValueError(f"n_experts={n_experts} not divisible by ep={ep}")
