"""TimeT — the self-supervised time-tuning core, as pure JAX.

What the reference implements imperatively across ``TimeT(nn.Module)``,
``SwavOptimizer`` and the training driver (reference time_tuning.py:80-302,
379-429, 508-669) is one functional train step here:

    state' , metrics = train_step(state, clip_batch, rng)

with all mutable pieces — student params, EMA-teacher params, prototype bank,
FIFO feature queue, optimizer moments, step counter — carried in a single
``TrainState`` pytree. The step jits/pjits end-to-end over a ``Mesh(('data',))``
with the Sinkhorn statistics psum'd over the mesh axis (the reference's
``dist.all_reduce``, my_utils.py:252-272), so single-chip and multi-chip runs
are the same program.

Compute-graph notes (identical math, TPU-shaped):
  * the reference runs three full-clip ViT passes per step — teacher, student
    w/ head, student w/o head (time_tuning.py:231-239). Only three *slices*
    of those passes are consumed by the loss: teacher(first frame) for the
    Sinkhorn targets, backbone(all frames, no grad) for propagation, and
    student-with-head(last frame) for the supervised scores. We compute
    exactly those (≈2× fewer frame-forwards), which leaves the loss and its
    gradients unchanged.
  * the per-sample Python propagation loop (time_tuning.py:277-301) is the
    vmapped/scanned ``propagate_labels_batch`` (ops/propagation.py).
  * EMA momentum follows the reference's (unconventional) direction
    ``teacher = teacher*(1-m) + student*m`` with m: 0.995→1.0
    (time_tuning.py:113-115 — SURVEY.md §2.5 quirk), i.e. the teacher tracks
    the student closely with a decaying lag.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence  # noqa: F401 — Sequence used in annotations

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from timetuning_tpu.core.schedules import cosine_scheduler, schedule_at
from timetuning_tpu.models.extractor import FeatureExtractor, apply_attention_mask
from timetuning_tpu.ops.propagation import propagate_labels_batch
from timetuning_tpu.ops.sinkhorn import sinkhorn_assignment

_EPS = 1e-12


def _l2norm(x, axis=-1):
    return x / (jnp.linalg.norm(x, axis=axis, keepdims=True) + _EPS)


def _proto_init(key, shape, dtype=jnp.float32):
    # Reference: randn then L2-normalize rows (time_tuning.py:90-93).
    w = jax.random.normal(key, shape, dtype)
    return _l2norm(w)


class TimeT(nn.Module):
    """Inference-facing module: FeatureExtractor + prototype bank.

    Mirrors the reference constructor ``TimeT(feature_extractor,
    prototype_number)`` (time_tuning.py:80-93); ``__call__`` mirrors
    ``TimeT.forward(train=False)`` (time_tuning.py:186-196) and returns
    (features, attentions). The param tree is
    ``{feature_extractor: {backbone, head}, prototypes}`` — the same layout
    as the published TimeT.pth state dict (README.md:70-72), so the importer
    grafts 1:1.
    """

    feature_extractor: FeatureExtractor
    n_prototypes: int = 200
    prototype_dim: int | None = None  # default: projection-head output dim

    def setup(self):
        dim = self.prototype_dim
        if dim is None:
            if not self.feature_extractor.head_dims:
                raise ValueError(
                    "prototype_dim is required when the extractor has no head"
                )
            dim = self.feature_extractor.head_dims[-1]
        self.prototypes = self.param("prototypes", _proto_init, (self.n_prototypes, dim))

    def __call__(self, x, use_head: bool = True, want_attention: bool = False):
        return self.feature_extractor(x, use_head=use_head, want_attention=want_attention)

    def similarity(self, feats):
        """Cosine scores vs the prototype bank
        (reference ``get_feature_prototype_similarity``, time_tuning.py:130-141).
        feats [..., D] → [..., K]. Prototypes are kept unit-norm by the
        post-step renormalization, so a plain dot product is cosine."""
        return jnp.einsum(
            "...d,kd->...k", _l2norm(feats), self.prototypes,
            preferred_element_type=jnp.float32,
        )


@dataclasses.dataclass(frozen=True)
class TimeTConfig:
    """Static training-hyperparameter bundle (reference argparse surface,
    time_tuning.py:673-714, with the *effective* loss defaults of
    get_loss — SURVEY.md §2.5)."""

    n_prototypes: int = 200
    epsilon: float = 0.05
    sinkhorn_iterations: int = 10      # get_loss default wins over the CLI flag
    n_last_frames: int = 7             # get_loss default (time_tuning.py:224)
    size_mask_neighborhood: int = 6
    topk: int = 5
    score_temperature: float = 0.1
    use_teacher: bool = True
    use_queue: bool = False
    queue_size: int = 16384            # divided by world size by the caller
    mask_features: bool = False
    axis_name: str | None = None       # mesh axis for global Sinkhorn
    world_size: int = 1
    ema_start: float = 0.995
    ema_end: float = 1.0
    num_epochs: int = 100
    steps_per_epoch: int = 1000
    spatial_resolution: int = 14
    # When only a *suffix* of the backbone trains (the reference default:
    # blocks 10/11, time_tuning.py:574), blocks [0, frozen_trunk_blocks) are
    # identical across student and EMA teacher for the whole run (the EMA of
    # never-moving leaves never moves), so the trunk is computed ONCE per
    # step over all frames and shared by the no-grad, teacher and student
    # passes — ~40% fewer backbone FLOPs at the reference configuration.
    # None disables the split (full three-pass computation).
    frozen_trunk_blocks: int | None = None
    # Attention implementation for the GRAD path (the student last-frame
    # pass inside loss_fn). The fused Pallas kernels win big on no-grad
    # forwards (the trunk/teacher/propagation passes) but add nothing on
    # differentiated blocks: their VJP recomputes the forward through XLA
    # anyway, so the kernel's fwd is pure extra work, and Pallas calls
    # inside autodiff also inflate step compile time. Routing only the
    # differentiated pass through plain XLA blocks (same params tree —
    # tested identical) measures +1-2% step throughput on v5e at B=32-128
    # and compiles faster; None keeps the model's own attn_impl everywhere.
    # Applies only when the model's attn_impl is "auto" — an explicitly
    # forced impl ("fused"/"pallas"/"xla") is honored on the grad path too.
    grad_attn_impl: str | None = "xla"
    # Switch load-balance auxiliary loss weight for MoE backbones
    # (ViTConfig.moe_every_k, beyond reference): adds
    # weight · mean-over-MoE-blocks of E·Σ_e f_e·P_e (Switch Transformer
    # eqs. 4-6; α=1e-2 there) to the training loss, differentiating through
    # the router's softmax so experts stay load-balanced instead of
    # collapsing onto one expert (whose capacity buffer then drops most
    # tokens). Collected from the MoE blocks on the GRAD path — with
    # frozen_trunk_blocks set, that is the trainable tail, which is also the
    # only place a router gradient can act. 0 disables (the default; dense
    # backbones must leave it 0).
    moe_aux_weight: float = 0.0


class TrainState(flax.struct.PyTreeNode):
    params: Any
    opt_state: Any
    teacher_params: Any
    queue: Any                       # [Q, D] or None
    queue_fill: jax.Array            # int32 scalar
    step: jax.Array                  # int32 scalar

    def ema_momentum(self, schedule):
        return schedule_at(schedule, self.step)


def init_state(
    model: TimeT,
    cfg: TimeTConfig,
    tx: optax.GradientTransformation,
    rng: jax.Array,
    sample_frame: jax.Array,
    pretrained_params=None,
    params=None,
    trainable_mask=None,
    zero1_plan=None,
) -> TrainState:
    """Initialize params (optionally grafting imported pretrained weights),
    teacher copy, queue, optimizer state.

    The queue is allocated at its *global* size ``queue_size * world_size``:
    under ``shard_map`` it is sharded ``P('data')`` so each device owns a
    private ``queue_size``-row FIFO — the reference's per-rank queue of
    ``queue_size/world`` rows (time_tuning.py:617-618). Inside the step the
    queue argument is therefore always the [queue_size, D] local shard.

    ``trainable_mask``: pass the mask from ``swav_optimizer(...,
    opt_over_trainable=True)`` to allocate optimizer state over the
    trainable subtree only (pairs with ``make_train_step(...,
    opt_over_trainable=True)``).
    """
    if params is None:
        params = model.init(rng, sample_frame)["params"]
    if pretrained_params is not None:
        params = _graft(params, pretrained_params)
    queue = None
    if cfg.use_queue:
        dim = params["prototypes"].shape[-1]
        queue = jnp.zeros(
            (cfg.queue_size * max(cfg.world_size, 1), dim), jnp.float32
        )
    if trainable_mask is not None:
        from timetuning_tpu.core.optimizer import trainable_subtree

        opt_params = trainable_subtree(params, trainable_mask)
    else:
        opt_params = params
    if zero1_plan is not None:
        # ZeRO-1: optimizer state over the padded flat vector of the
        # trainable subtree (sharded along the data axis by
        # state_partition_specs; tx here is zero1_tx(plan))
        from jax.flatten_util import ravel_pytree

        flat, _ = ravel_pytree(opt_params)
        if flat.shape[0] != zero1_plan.length:
            raise ValueError(
                f"zero1 plan built for {zero1_plan.length} trainable "
                f"elements, state has {flat.shape[0]} — different "
                "trainable set"
            )
        opt_params = jnp.pad(flat, (0, zero1_plan.padded - zero1_plan.length))
    return TrainState(
        params=params,
        opt_state=tx.init(opt_params),
        teacher_params=jax.tree.map(jnp.copy, params) if cfg.use_teacher else None,
        queue=queue,
        queue_fill=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), jnp.int32),
    )


def _graft(params, pretrained):
    """Overlay imported weights onto a freshly-initialized tree (keys present
    in ``pretrained`` win; shapes must match)."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params)
    pre = tu.flatten_dict(pretrained)
    for k, v in pre.items():
        if k in flat:
            if flat[k].shape != v.shape:
                raise ValueError(f"shape mismatch for {'/'.join(k)}: {flat[k].shape} vs {v.shape}")
            flat[k] = jnp.asarray(v, dtype=flat[k].dtype)
        else:
            raise KeyError(f"pretrained key {'/'.join(k)} not in model tree")
    return tu.unflatten_dict(flat)


def state_partition_specs(
    state: TrainState, axis_name: str = "data", zero1_padded: int | None = None
):
    """PartitionSpecs for a TrainState on a 1-D data mesh.

    Every leaf is replicated except the feature queue, which is sharded along
    the mesh axis so each device keeps its own ``queue_size``-row FIFO — the
    reference's per-rank queue (time_tuning.py:617-618, :250-261). The FIFO
    update inside the step is computed from the *local* batch shard, so a
    replicated out-spec would be a lie: XLA would keep one device's queue and
    silently discard every other device's stored features.

    ``zero1_padded``: with ZeRO-1 optimizer sharding, the [padded]-vector
    opt_state leaves (Adam mu/nu) shard along the axis too — each device
    holds only the chunk it updates.
    """
    from jax.sharding import PartitionSpec as P

    specs = jax.tree.map(lambda _: P(), state)
    if state.queue is not None:
        specs = specs.replace(queue=P(axis_name))
    if zero1_padded is not None:
        specs = specs.replace(
            opt_state=jax.tree.map(
                lambda x: P(axis_name)
                if getattr(x, "ndim", 0) == 1 and x.shape[0] == zero1_padded
                else P(),
                state.opt_state,
            )
        )
    return specs


def make_train_step(
    model: TimeT,
    cfg: TimeTConfig,
    tx: optax.GradientTransformation,
    trainable_mask=None,
    opt_over_trainable: bool = False,
    zero1_plan=None,
):
    """Build the jittable train step. Returns ``step_fn(state, clip, rng)``.

    clip: [B, F, H, W, 3] normalized frames (NHWC).

    ``trainable_mask`` (the bool pytree from ``swav_optimizer``) restricts
    autodiff to the trainable subtree: the reference default trains only
    blocks 10/11 + head + prototypes (time_tuning.py:574), so
    differentiating w.r.t. the frozen ten blocks builds a backward through
    the whole backbone whose output the optimizer then zeroes
    (optax.set_to_zero on frozen leaves). Closing the frozen leaves over
    the loss instead lets XLA skip that backward entirely — same gradients,
    ~20% faster step at the reference configuration.

    ``opt_over_trainable=True`` (requires ``trainable_mask`` and a tx built
    with ``swav_optimizer(..., opt_over_trainable=True)`` + ``init_state(...,
    trainable_mask=...)``) additionally runs the optimizer update, the
    gradient pmean and the EMA-teacher update over the trainable subtree
    only. Frozen leaves provably never change (the optimizer never sees
    them), so their teacher copies are the student leaves themselves; this
    removes full-tree HBM traffic (2× adam moments, zero-update adds,
    full-tree EMA) and shrinks the multi-chip gradient all-reduce to the
    trainable fraction. The trajectory is identical to the full-tree path
    (tested to float tolerance).
    """
    if opt_over_trainable and trainable_mask is None:
        raise ValueError("opt_over_trainable=True requires trainable_mask")
    if zero1_plan is not None and not (
        opt_over_trainable and cfg.axis_name is not None
    ):
        raise ValueError(
            "zero1_plan requires opt_over_trainable=True and a mesh axis "
            "(ZeRO-1 shards the optimizer state across data-parallel devices)"
        )
    momentum_schedule = cosine_scheduler(
        cfg.ema_start, cfg.ema_end, cfg.num_epochs, cfg.steps_per_epoch
    )
    res = cfg.spatial_resolution

    aux_w = cfg.moe_aux_weight
    if aux_w:
        vcfg = getattr(model.feature_extractor.backbone, "config", None)
        from timetuning_tpu.models.vit import is_moe_block

        moe_blocks = (
            [i for i in range(vcfg.depth) if is_moe_block(vcfg, i)]
            if vcfg is not None and getattr(vcfg, "moe_every_k", 0)
            else []
        )
        lo = cfg.frozen_trunk_blocks or 0
        if not any(i >= lo for i in moe_blocks):
            raise ValueError(
                f"moe_aux_weight={aux_w} but no MoE block on the grad path "
                f"(MoE blocks {moe_blocks}, grad path starts at block {lo}) "
                "— the router would get no balancing gradient"
            )

    def _aux_mean(variables):
        """Mean of the aux_loss scalars MoEMlp sows into 'intermediates'."""
        leaves = [
            v
            for path, v in jax.tree_util.tree_leaves_with_path(
                variables.get("intermediates", {})
            )
            if "aux_loss" in jax.tree_util.keystr(path)
        ]
        if not leaves:
            return jnp.zeros((), jnp.float32)
        return sum(leaves) / len(leaves)

    def apply(params, x, use_head, want_attention=False):
        return model.apply({"params": params}, x, use_head=use_head,
                           want_attention=want_attention)

    def similarity(params, feats):
        return model.apply({"params": params}, feats, method=TimeT.similarity)

    fe = model.feature_extractor

    # Grad-path clone: same module tree / param layout, but the
    # differentiated pass runs plain-XLA attention blocks (see
    # TimeTConfig.grad_attn_impl for the measurement motivating this).
    grad_model, grad_fe = model, fe
    bcfg = getattr(fe.backbone, "config", None)
    if (
        cfg.grad_attn_impl is not None
        and bcfg is not None
        and getattr(bcfg, "attn_impl", None) == "auto"
        and cfg.grad_attn_impl != "auto"
    ):
        # only the dispatcher default is rerouted: an explicitly forced
        # attn_impl ("fused"/"pallas"/"xla") keeps its impl on the grad
        # path too — forcing exists precisely to pin the kernel path
        # (e.g. debugging kernel gradients)
        import dataclasses as _dc

        grad_fe = fe.clone(
            backbone=fe.backbone.clone(
                config=_dc.replace(bcfg, attn_impl=cfg.grad_attn_impl)
            )
        )
        grad_model = model.clone(feature_extractor=grad_fe)

    def grad_apply(params, x, use_head, want_attention=False):
        if aux_w:
            (feats, attn), avars = grad_model.apply(
                {"params": params}, x, use_head=use_head,
                want_attention=want_attention, mutable=["intermediates"],
            )
            return feats, attn, _aux_mean(avars)
        return grad_model.apply({"params": params}, x, use_head=use_head,
                                want_attention=want_attention)
    split = cfg.frozen_trunk_blocks
    if split is not None and trainable_mask is not None:
        # the shared trunk is only valid when every block below the split is
        # frozen — a trainable trunk leaf would get exactly-zero grads (the
        # trunk is computed under stop_gradient) while weight decay keeps
        # shrinking it, silently
        import flax.traverse_util as tu

        import re as _re

        for kpath, t in tu.flatten_dict(trainable_mask).items():
            s = "/".join(str(p) for p in kpath)
            if not t or "backbone" not in s:
                continue
            m = _re.search(r"blocks_(\d+)", s)
            in_trunk = (
                int(m.group(1)) < split
                if m
                # non-block backbone leaves: the embedding params
                # (patch_embed / pos_embed / cls_token) run inside the
                # trunk; only the final norm belongs to the tail
                else "norm" not in s
            )
            if in_trunk:
                raise ValueError(
                    f"frozen_trunk_blocks={split} but trainable leaf {s} "
                    "lies inside the trunk"
                )

    def _make_tail_apply(fe_mod, collect_aux=False):
        def tail_apply(params, hidden, use_head, want_attention=False):
            """Blocks [split, depth) + norm (+ head) from shared trunk tokens."""
            if collect_aux:
                out, avars = fe_mod.backbone.apply(
                    {"params": params["feature_extractor"]["backbone"]},
                    hidden, start_block=split, want_attention=want_attention,
                    mutable=["intermediates"],
                )
            else:
                out = fe_mod.backbone.apply(
                    {"params": params["feature_extractor"]["backbone"]},
                    hidden, start_block=split, want_attention=want_attention,
                )
            feats = out["tokens"][:, 1:] if fe_mod.drop_cls else out["tokens"]
            if fe_mod.head_dims and use_head:
                from timetuning_tpu.models.heads import ProjectionHead

                feats = ProjectionHead(tuple(fe_mod.head_dims)).apply(
                    {"params": params["feature_extractor"]["head"]}, feats
                )
            if collect_aux:
                return feats, out.get("attention"), _aux_mean(avars)
            return feats, out.get("attention")

        return tail_apply

    tail_apply = _make_tail_apply(fe)
    grad_tail_apply = _make_tail_apply(grad_fe, collect_aux=bool(aux_w))

    def assign(params, feats, queue, queue_ready):
        """First-frame Sinkhorn codes, optionally over batch+queue
        (reference get_scores, time_tuning.py:195-217)."""
        B, N, D = feats.shape
        flat = feats.reshape(B * N, D)
        scores = similarity(params, flat)                      # [B*N, K]

        def with_queue(_):
            q_scores = similarity(params, queue)
            full = jnp.concatenate([scores, q_scores], axis=0)
            q = sinkhorn_assignment(
                full, cfg.epsilon, cfg.sinkhorn_iterations,
                axis_name=cfg.axis_name, world_size=cfg.world_size,
            )
            return q[: B * N]

        def without_queue(_):
            return sinkhorn_assignment(
                scores, cfg.epsilon, cfg.sinkhorn_iterations,
                axis_name=cfg.axis_name, world_size=cfg.world_size,
            )

        if queue is None:
            q = without_queue(None)
        else:
            q = jax.lax.cond(queue_ready, with_queue, without_queue, None)
        return q.reshape(B, N, -1), scores.reshape(B, N, -1)

    def step_fn(state: TrainState, clip: jax.Array, rng: jax.Array):
        B, F, H, W, _ = clip.shape
        frames = clip.reshape(B * F, H, W, 3)
        first = clip[:, 0]
        last = clip[:, -1]

        # --- no-grad context ------------------------------------------------
        # Backbone (no-head) features over all frames → propagation substrate
        # (reference time_tuning.py:238-239).
        code_params = state.teacher_params if cfg.use_teacher else state.params
        trunk_bf = None
        if split is not None:
            # shared frozen trunk over ALL frames, once (see TimeTConfig);
            # valid because blocks [0, split) are frozen and therefore
            # identical between student and EMA teacher for the whole run
            trunk = fe.backbone.apply(
                {"params": state.params["feature_extractor"]["backbone"]},
                frames, stop_block=split,
            )["hidden"]
            trunk = jax.lax.stop_gradient(trunk)           # [B*F, 1+N, D]
            bb_feats, _ = tail_apply(state.params, trunk, use_head=False)
            trunk_bf = trunk.reshape(B, F, *trunk.shape[1:])
        else:
            bb_feats, _ = apply(state.params, frames, use_head=False)
        bb_feats = jax.lax.stop_gradient(bb_feats)
        Nb, Db = bb_feats.shape[-2:]
        bb_feats = bb_feats.reshape(B, F, Nb, Db)

        # Source codes q: teacher first frame if enabled, else student
        # (time_tuning.py:263-268).
        if split is not None:
            src_feats, src_attn = tail_apply(
                code_params, trunk_bf[:, 0], use_head=True,
                want_attention=cfg.mask_features,
            )
        else:
            src_feats, src_attn = apply(
                code_params, first, use_head=True,
                want_attention=cfg.mask_features,
            )
        src_feats = jax.lax.stop_gradient(src_feats)
        if cfg.mask_features:
            masked, _ = apply_attention_mask(src_feats[:, None], src_attn, res)
            src_feats = masked[:, 0]

        # --- queue FIFO -------------------------------------------------
        # The reference inserts the current batch's first-frame features
        # BEFORE computing the Sinkhorn scores (time_tuning.py:250-261
        # precede get_scores at :263-268), so the step's assignment sees the
        # just-stored rows and the full-queue readiness check
        # (``queue[-1].count_nonzero()``, :207) triggers in the same step
        # the FIFO fills.
        queue, queue_fill = state.queue, state.queue_fill
        if cfg.use_queue:
            store_feats = src_feats.reshape(-1, src_feats.shape[-1])
            n_store = min(B * 10, cfg.queue_size)
            idx = jax.random.permutation(rng, store_feats.shape[0])[:n_store]
            selected = jax.lax.stop_gradient(store_feats[idx])
            queue = jnp.concatenate([selected, queue[:-n_store]], axis=0)
            queue_fill = jnp.minimum(queue_fill + n_store, cfg.queue_size)
        queue_ready = (
            queue_fill >= cfg.queue_size if cfg.use_queue else jnp.array(False)
        )

        q, _ = assign(code_params, src_feats, queue, queue_ready)
        q = jax.lax.stop_gradient(q)                          # [B, N, K]

        # Propagate q through the clip over backbone features
        # (make_seg_maps → propagate_labels, time_tuning.py:143-154, 285).
        prop = propagate_labels_batch(
            bb_feats,
            jnp.transpose(q, (0, 2, 1)),                      # [B, K, N]
            n_last=cfg.n_last_frames,
            radius=cfg.size_mask_neighborhood,
            topk=cfg.topk,
        )
        p_last = prop[:, -1]                                   # [B, K, N]
        labels = jnp.argmax(p_last, axis=1)                    # [B, N]

        # --- grad path ------------------------------------------------------
        def loss_fn(params):
            if split is not None:
                s_out = grad_tail_apply(
                    params, trunk_bf[:, -1], use_head=True,
                    want_attention=cfg.mask_features,
                )                                              # [B, N, Dh]
            else:
                s_out = grad_apply(
                    params, last, use_head=True,
                    want_attention=cfg.mask_features,
                )                                              # [B, N, Dh]
            if aux_w:
                s_feats, s_attn, aux = s_out
            else:
                (s_feats, s_attn), aux = s_out, jnp.zeros((), jnp.float32)
            if cfg.mask_features:
                masked, mask = apply_attention_mask(s_feats[:, None], s_attn, res)
                s_feats = masked[:, 0]
            target_scores = similarity(params, s_feats)        # [B, N, K]
            logits = target_scores / cfg.score_temperature
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, jax.lax.stop_gradient(labels)
            )                                                  # [B, N]
            if cfg.mask_features:
                ce = ce * mask[:, 0]
            return ce.mean() + aux_w * aux, aux

        if trainable_mask is None:
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            if cfg.axis_name is not None:
                grads = jax.lax.pmean(grads, cfg.axis_name)
                loss, aux = jax.lax.pmean((loss, aux), cfg.axis_name)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
        else:
            import flax.traverse_util as tu

            flat_mask = tu.flatten_dict(trainable_mask)
            flat_p = tu.flatten_dict(state.params)
            train_p = {k: v for k, v in flat_p.items() if flat_mask[k]}
            frozen_p = {k: v for k, v in flat_p.items() if not flat_mask[k]}

            def loss_trainable(tp):
                return loss_fn(tu.unflatten_dict({**frozen_p, **tp}))

            (loss, aux), g_t = jax.value_and_grad(loss_trainable, has_aux=True)(
                train_p
            )
            if zero1_plan is not None:
                # ZeRO-1 (beyond-reference): gradients arrive by
                # reduce-scatter, each device runs AdamW on its 1/world
                # chunk of the flat trainable vector against its opt_state
                # shard (the lr/decay mask vectors ride the state and are
                # sharded the same way), and a zeros-scatter + psum
                # rebuilds the update with statically-inferable
                # replication, so the shard_map VMA check stays ON.
                # Elementwise identical to the subtree path (tested).
                from jax.flatten_util import ravel_pytree

                from timetuning_tpu.core.optimizer import merge_subtree

                loss, aux = jax.lax.pmean((loss, aux), cfg.axis_name)
                sub = tu.unflatten_dict(train_p)
                p_flat, unravel = ravel_pytree(sub)
                g_flat, _ = ravel_pytree(tu.unflatten_dict(g_t))
                pad_n = zero1_plan.padded - zero1_plan.length
                g_chunk = jax.lax.psum_scatter(
                    jnp.pad(g_flat, (0, pad_n)), cfg.axis_name,
                    scatter_dimension=0, tiled=True,
                ) / zero1_plan.world
                idx = jax.lax.axis_index(cfg.axis_name)
                p_chunk = jax.lax.dynamic_slice(
                    jnp.pad(p_flat, (0, pad_n)),
                    (idx * zero1_plan.chunk,), (zero1_plan.chunk,),
                )
                updates_chunk, opt_state = tx.update(
                    g_chunk, state.opt_state, p_chunk
                )
                u_full = jax.lax.psum(
                    jax.lax.dynamic_update_slice(
                        jnp.zeros(
                            (zero1_plan.padded,), updates_chunk.dtype
                        ),
                        updates_chunk, (idx * zero1_plan.chunk,),
                    ),
                    cfg.axis_name,
                )[: zero1_plan.length]
                new_sub = unravel(p_flat + u_full)
                params = merge_subtree(state.params, new_sub)
            elif opt_over_trainable:
                # optimizer state / update / pmean over the trainable
                # subtree only; frozen leaves pass through untouched
                g_sub = tu.unflatten_dict(g_t)
                if cfg.axis_name is not None:
                    g_sub = jax.lax.pmean(g_sub, cfg.axis_name)
                    loss, aux = jax.lax.pmean((loss, aux), cfg.axis_name)
                from timetuning_tpu.core.optimizer import merge_subtree

                sub = tu.unflatten_dict(train_p)
                updates, opt_state = tx.update(g_sub, state.opt_state, sub)
                new_sub = optax.apply_updates(sub, updates)
                params = merge_subtree(state.params, new_sub)
            else:
                grads = tu.unflatten_dict(
                    {
                        k: (g_t[k] if k in g_t else jnp.zeros_like(v))
                        for k, v in flat_p.items()
                    }
                )
                if cfg.axis_name is not None:
                    grads = jax.lax.pmean(grads, cfg.axis_name)
                    loss, aux = jax.lax.pmean((loss, aux), cfg.axis_name)
                updates, opt_state = tx.update(grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
        # Prototype renorm after the step (time_tuning.py:125-128, 661).
        params = dict(params) | {"prototypes": _l2norm(params["prototypes"])}

        # --- EMA teacher ----------------------------------------------------
        teacher_params = state.teacher_params
        if cfg.use_teacher:
            m = schedule_at(momentum_schedule, state.step)
            if opt_over_trainable:
                # frozen leaves never change, so teacher == student there for
                # the whole run — the EMA only needs to touch the trainable
                # subtree (the frozen teacher leaves alias the student's)
                import flax.traverse_util as tu

                flat_mask = tu.flatten_dict(trainable_mask)
                flat_t = tu.flatten_dict(teacher_params)
                flat_s = tu.flatten_dict(params)
                teacher_params = tu.unflatten_dict(
                    {
                        k: (flat_t[k] * (1.0 - m) + flat_s[k] * m)
                        if flat_mask[k]
                        else flat_s[k]
                        for k in flat_s
                    }
                )
            else:
                teacher_params = jax.tree.map(
                    lambda t, s: t * (1.0 - m) + s * m, teacher_params, params
                )
            teacher_params = dict(teacher_params) | {
                "prototypes": _l2norm(teacher_params["prototypes"])
            }

        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            teacher_params=teacher_params,
            queue=queue,
            queue_fill=queue_fill,
            step=state.step + 1,
        )
        metrics = {
            "loss": loss,
            "momentum": schedule_at(momentum_schedule, state.step)
            if cfg.use_teacher
            else jnp.zeros(()),
        }
        if aux_w:
            # the UNWEIGHTED balance statistic (1 = perfectly balanced,
            # n_experts = collapsed); "loss" already includes aux_w · this
            metrics["moe_aux"] = aux
        return new_state, metrics

    return step_fn
