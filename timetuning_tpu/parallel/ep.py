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

    ``capacity_factor`` sizes each expert's per-group token buffer
    ``C = ceil(S_g/E · f)``; overflow tokens produce 0 (pass through a
    residual unchanged). Expert FFN weights are stacked ``[E, ...]`` so the
    whole layer is two batched matmuls — and so expert parallelism is just
    a ``P('expert')`` sharding on axis 0 (see :func:`ep_param_specs`).

    ``group_size`` controls the GShard-style routing groups. The dispatch/
    combine one-hots are ``[G, S_g, E, C]`` with ``E·C ≈ S_g·f``, so their
    memory AND einsum FLOPs scale as ``T · S_g`` — with one global group
    (``S_g = T``) both are quadratic in total tokens (at ViT-S/16 B=256
    that is a ~12 GB dispatch tensor and a dispatch matmul ~20× the expert
    FFN itself), while per-group dispatch overhead is ``S_g/H`` of the FFN
    (~13% at S_g=208, H=1536). Routing/capacity competition is local to a
    group (each (group, expert) pair has its own C slots) — the standard
    Switch/GShard semantics, where groups are per-device token blocks.

      * ``-1`` — one group per sample (axis 0 of the input): the product
        setting, used by the MoE ViT.
      * ``0``  — one global group over all B·S tokens (exact legacy/test
        semantics; only sane for tiny inputs).
      * ``>0`` — fixed token count per group; must divide B·S.
    """

    n_experts: int
    hidden_dim: int
    capacity_factor: float = 1.25
    dtype: Any = jnp.float32
    group_size: int = 0

    @nn.compact
    def __call__(self, x):
        B, S, D = x.shape
        E, H = self.n_experts, self.hidden_dim
        T = B * S
        if self.group_size == -1:
            G, Sg = B, S
        elif self.group_size == 0:
            G, Sg = 1, T
        else:
            if T % self.group_size:
                raise ValueError(
                    f"group_size={self.group_size} does not divide "
                    f"B*S={T} tokens"
                )
            G, Sg = T // self.group_size, self.group_size
        C = max(1, int(-(-Sg * self.capacity_factor // E)))

        xg = x.reshape(G, Sg, D)
        logits = nn.Dense(E, use_bias=False, dtype=self.dtype,
                          name="router")(xg)            # [G, Sg, E]
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        expert = jnp.argmax(probs, axis=-1)             # [G, Sg]
        gate = jnp.take_along_axis(probs, expert[..., None], axis=-1)[..., 0]

        onehot = jax.nn.one_hot(expert, E, dtype=jnp.float32)  # [G, Sg, E]
        # Switch load-balance auxiliary (Switch Transformer eqs. 4-6):
        # f_e = fraction of the group's tokens argmax-routed to e
        # (pre-capacity), P_e = mean router prob of e over the group;
        # aux = E · Σ_e f_e·P_e per group, averaged over groups. Perfectly
        # balanced routing gives aux == 1; a collapsed router gives E.
        # Sown into the "intermediates" collection — a no-op (and DCE'd)
        # unless the caller applies with mutable=["intermediates"], as the
        # train step does when TimeTConfig.moe_aux_weight > 0.
        aux = (
            E * jnp.sum(onehot.mean(axis=1) * probs.mean(axis=1), axis=-1)
        ).mean()
        self.sow("intermediates", "aux_loss", aux)
        # slot of each token within its (group, expert) buffer (0-based), in
        # token order — the deterministic Switch tie-break
        pos = jnp.cumsum(onehot, axis=1) * onehot - 1.0        # [G, Sg, E]
        kept = (pos < C) & (onehot > 0)
        slot = jnp.clip(pos, 0, C - 1).astype(jnp.int32)
        slot_oh = jax.nn.one_hot(slot, C, dtype=jnp.float32) * kept[..., None]
        dispatch = slot_oh                                     # [G, Sg, E, C]
        combine = dispatch * gate[..., None, None]             # [G, Sg, E, C]

        w1 = self.param("w1", nn.initializers.lecun_normal(), (E, D, H))
        b1 = self.param("b1", nn.initializers.zeros, (E, H))
        w2 = self.param("w2", nn.initializers.lecun_normal(), (E, H, D))
        b2 = self.param("b2", nn.initializers.zeros, (E, D))

        xin = jnp.einsum("gsec,gsd->egcd", dispatch.astype(self.dtype),
                         xg.astype(self.dtype))                # [E, G, C, D]
        h = jnp.einsum("egcd,edh->egch", xin, w1.astype(self.dtype))
        h = jax.nn.gelu(h + b1[:, None, None, :].astype(h.dtype),
                        approximate=False)
        out = jnp.einsum("egch,ehd->egcd", h, w2.astype(self.dtype))
        out = out + b2[:, None, None, :].astype(out.dtype)     # [E, G, C, D]
        yt = jnp.einsum("gsec,egcd->gsd", combine.astype(out.dtype), out)
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


# --- MoE-ViT product path (dense-feature forward + training step) ---------


def upcycle_dense_to_moe(dense_params, moe_params, cfg):
    """Sparse upcycling: initialize a MoE ViT from a DENSE checkpoint.

    Every shared leaf (patch embed, positions, attention, norms, dense-block
    MLPs) is copied; each MoE block's experts all start as copies of the
    dense checkpoint's corresponding MLP (the Sparse Upcycling recipe —
    the router stays at its random init, so the initial MoE output is the
    dense block's output scaled by the top-1 gate). Returns the grafted
    MoE param tree."""
    import flax.traverse_util as tu

    from timetuning_tpu.models.vit import is_moe_block

    dense = tu.flatten_dict(dense_params)
    out = dict(tu.flatten_dict(moe_params))
    for k in list(out):
        if k in dense:
            out[k] = dense[k]
    for i in range(cfg.depth):
        if not is_moe_block(cfg, i):
            continue
        blk = f"blocks_{i}"
        w1 = dense[(blk, "mlp", "fc1", "kernel")]
        b1 = dense[(blk, "mlp", "fc1", "bias")]
        w2 = dense[(blk, "mlp", "fc2", "kernel")]
        b2 = dense[(blk, "mlp", "fc2", "bias")]
        E = cfg.n_experts
        out[(blk, "moe", "w1")] = jnp.tile(w1[None], (E, 1, 1))
        out[(blk, "moe", "b1")] = jnp.tile(b1[None], (E, 1))
        out[(blk, "moe", "w2")] = jnp.tile(w2[None], (E, 1, 1))
        out[(blk, "moe", "b2")] = jnp.tile(b2[None], (E, 1))
    return tu.unflatten_dict(out)


def make_ep_feature_fn(model, mesh: Mesh):
    """Expert-parallel dense-feature forward for a MoE
    ``VisionTransformer`` (``ViTConfig.moe_every_k``/``n_experts``): the
    expert-stacked FFN leaves shard ``P('expert')``, everything else
    replicates, the batch shards ``P('data')``. Same program as the
    single-device forward — GSPMD inserts the token all-to-alls."""
    cfg = model.config
    if not getattr(cfg, "moe_every_k", 0):
        raise ValueError(
            "make_ep_feature_fn needs a MoE ViT (set ViTConfig.moe_every_k "
            "and n_experts); a dense backbone has no expert axis to shard"
        )
    validate_ep_geometry(cfg.n_experts, mesh.shape[EXPERT_AXIS])

    def fwd(params, x):
        return model.apply({"params": params}, x)["tokens"]

    def make(params):
        specs = ep_param_specs(params, n_experts=cfg.n_experts)
        return jax.jit(
            fwd,
            in_shardings=(
                jax.tree.map(lambda sp: NamedSharding(mesh, sp), specs),
                NamedSharding(mesh, P(DATA_AXIS)),
            ),
            out_shardings=NamedSharding(mesh, P(DATA_AXIS)),
        )

    return make


def ep_state_shardings(state, mesh: Mesh, n_experts: int):
    """NamedSharding tree for a TimeT ``TrainState`` on a (data, expert)
    mesh: expert-stacked leaves (student params, EMA teacher, and the Adam
    moments, which mirror the param tree) shard ``P('expert')``; the
    feature queue shards ``P('data')`` (its rows are batch-derived, as in
    parallel/tp.timet_state_shardings); everything else replicates."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    from timetuning_tpu.parallel.tp import _key_name

    out = []
    for path, leaf in flat:
        names = [_key_name(e) for e in path]
        ndim = getattr(leaf, "ndim", 0)
        if names and names[0] == "queue" and ndim == 2:
            spec = P(DATA_AXIS)
        elif (
            names
            and names[-1] in ("w1", "b1", "w2", "b2")
            and ndim >= 1
            and leaf.shape[0] == n_experts
            and "moe" in names
        ):
            spec = P(EXPERT_AXIS)
        else:
            spec = P()
        out.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, out)


def make_ep_train_step(model, cfg, tx, mesh: Mesh, state_like):
    """Full TimeT training step under dp×ep as ONE global GSPMD program
    (``cfg.axis_name`` must be None — the partitioner inserts the data-axis
    Sinkhorn/grad reductions and the expert all-to-alls itself). Returns
    ``(jitted_step, shardings)`` like parallel/tp.make_tp_train_step."""
    from timetuning_tpu.core.timet import make_train_step
    from timetuning_tpu.parallel.tp import gspmd_step_jit

    vcfg = model.feature_extractor.backbone.config
    if not getattr(vcfg, "moe_every_k", 0):
        raise ValueError("make_ep_train_step needs a MoE ViT backbone")
    validate_ep_geometry(vcfg.n_experts, mesh.shape[EXPERT_AXIS])
    if cfg.axis_name is not None:
        raise ValueError(
            "dp×ep runs as a single global program: set axis_name=None "
            "(the GSPMD partitioner owns the collectives)"
        )
    step = make_train_step(model, cfg, tx)
    shardings = ep_state_shardings(state_like, mesh, vcfg.n_experts)
    return gspmd_step_jit(step, mesh, state_like, shardings=shardings)
