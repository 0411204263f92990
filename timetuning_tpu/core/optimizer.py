"""SwAV-style optimizer as one optax chain.

Reproduces the reference ``SwavOptimizer`` (time_tuning.py:379-429):
  * AdamW; three parameter groups — prototypes @ lr, projection head @ lr,
    backbone @ backbone_lr (= lr/10 in the training driver, time_tuning.py:613);
  * biases and 1-dim params excluded from weight decay (:391-403);
  * cosine-annealed LR over num_itr·num_epochs (:383-386);
  * weight decay itself cosine-scheduled 0.04 → 0.4 (:427-429, :613).

TPU-native differences: "freezing" (requires_grad=False on everything but
``unfreeze_layers``, models.py:929-935) is an optimizer mask here — frozen
leaves get exactly-zero updates and no decay — and every schedule is a pure
function of the step, so the whole update lives inside the jitted train step.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax

from timetuning_tpu.core.schedules import cosine_scheduler


def _path_str(path) -> str:
    parts = []
    for p in path:
        name = getattr(p, "key", None)
        if name is None:
            name = getattr(p, "name", str(p))
        parts.append(str(name))
    return "/".join(parts)


def trainable_subtree(tree, trainable_mask):
    """Restrict a params-shaped pytree to its trainable leaves (nested dict
    with frozen branches removed). The result's treedef is shared by every
    tree filtered with the same mask, so optimizer masks and gradients line
    up structurally."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(tree)
    mask = tu.flatten_dict(trainable_mask)
    return tu.unflatten_dict({k: v for k, v in flat.items() if mask[k]})


def merge_subtree(full, sub):
    """Overlay a trainable subtree onto the full params tree."""
    import flax.traverse_util as tu

    flat = dict(tu.flatten_dict(full))
    flat.update(tu.flatten_dict(sub))
    return tu.unflatten_dict(flat)


def migrate_opt_state(opt_state, params, trainable_mask, to_subtree: bool):
    """Convert an optax chain state between the two checkpoint layouts.

    Full-tree layout (``opt_over_trainable=False``): the chain starts with a
    ``optax.masked(set_to_zero)`` link (MaskedState) and Adam moments span the
    whole params tree (zeros at frozen leaves). Subtree layout: no masked
    link, moments over ``trainable_subtree(params, mask)`` only. Frozen-leaf
    moments are provably zero in the full layout, so the conversion is exact
    in both directions — restoring an old-layout checkpoint into a new-layout
    run continues the identical trajectory (tested in
    tests/test_optimizer_parity.py::test_migrate_opt_state_exact_both_directions
    and end-to-end in
    tests/test_training_e2e.py::test_cross_layout_checkpoint_migration).
    """
    states = list(opt_state)
    adam = _find_one(states, optax.ScaleByAdamState, "ScaleByAdamState")
    # identity-based index: tuple == on array-bearing states is ambiguous
    adam_idx = [i for i, s in enumerate(states) if s is adam]
    if to_subtree:
        adam = adam._replace(
            mu=trainable_subtree(adam.mu, trainable_mask),
            nu=trainable_subtree(adam.nu, trainable_mask),
        )
        states[adam_idx[0]] = adam
        states = [s for s in states if not isinstance(s, optax.MaskedState)]
    else:
        # distinct zero buffers for mu and nu: sharing one zeros tree would
        # alias the same buffer at two donated positions of the train step
        # (XLA rejects double donation)
        adam = adam._replace(
            mu=merge_subtree(jax.tree.map(jnp.zeros_like, params), adam.mu),
            nu=merge_subtree(jax.tree.map(jnp.zeros_like, params), adam.nu),
        )
        states[adam_idx[0]] = adam
        states = [optax.MaskedState(inner_state=optax.EmptyState())] + states
    return tuple(states)


def _norm(pattern: str) -> str:
    # Accept reference-style names ("blocks.11", "feature_extractor.backbone")
    # as well as flax-style ("blocks_11").
    return pattern.replace(".", "/").replace("blocks/", "blocks_")


def _matches(pattern: str, path_str: str) -> bool:
    """Pattern matches a contiguous run of FULL path segments — substring
    matching would make "blocks_1" also unfreeze blocks_10..19."""
    want = _norm(pattern).split("/")
    segs = path_str.split("/")
    n = len(want)
    return any(segs[i:i + n] == want for i in range(len(segs) - n + 1))


def build_masks(params, unfreeze_layers: Sequence[str]):
    """Return (trainable_mask, lr_factor_tree, decay_mask) pytrees of floats/bools.

    Trainability: prototypes and head always train; backbone leaves train only
    if their path contains one of ``unfreeze_layers`` (reference
    models.py:929-935 + time_tuning.py:574).
    """
    patterns = list(unfreeze_layers)

    def classify(path, leaf):
        s = _path_str(path)
        in_backbone = "backbone" in s.split("/")
        if not in_backbone:
            return "head"  # prototypes / projection head / probe params
        return "backbone" if any(_matches(p, s) for p in patterns) else "frozen"

    groups = jax.tree_util.tree_map_with_path(classify, params)
    trainable = jax.tree.map(lambda g: g != "frozen", groups)

    def decay_ok(path, leaf, grp):
        if grp == "frozen":
            return False
        s = _path_str(path)
        return leaf.ndim > 1 and not s.endswith("bias")

    decay = jax.tree_util.tree_map_with_path(decay_ok, params, groups)
    return groups, trainable, decay


class ScheduledWDState(NamedTuple):
    step: jnp.ndarray


def add_scheduled_decay(wd_fn: Callable[[jnp.ndarray], jnp.ndarray], mask) -> optax.GradientTransformation:
    """add_decayed_weights with a per-step weight-decay schedule."""

    def init(params):
        del params
        return ScheduledWDState(jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        wd = wd_fn(state.step)
        updates = jax.tree.map(
            lambda u, p, m: u + wd * p if m else u, updates, params, mask
        )
        return updates, ScheduledWDState(state.step + 1)

    return optax.GradientTransformation(init, update)


def swav_optimizer(
    params,
    lr: float = 1e-4,
    backbone_lr: float | None = None,
    num_steps: int = 100_000,
    unfreeze_layers: Sequence[str] = ("blocks.11", "blocks.10"),
    wd_start: float = 0.04,
    wd_end: float = 0.4,
    num_epochs: int | None = None,
    steps_per_epoch: int | None = None,
    use_cosine_lr: bool = True,
    opt_over_trainable: bool = False,
) -> tuple[optax.GradientTransformation, Any]:
    """Build the optimizer. Returns (tx, trainable_mask).

    ``opt_over_trainable=True`` builds a tx that operates on the *trainable
    subtree* only (``trainable_subtree(params, mask)``): with the reference
    configuration ~85% of the parameters are frozen, and a full-tree AdamW
    spends real per-step HBM traffic decaying 2× moments, adding zero
    updates, and (multi-chip) psum'ing zero gradients for leaves that
    provably never change. Pair it with ``init_state(...,
    trainable_mask=mask)`` and ``make_train_step(..., opt_over_trainable=
    True)``; the trajectory is identical (tested)."""
    trainable, lr_factor, decay = _swav_groups(
        params, lr, backbone_lr, unfreeze_layers
    )
    if opt_over_trainable:
        lr_factor = trainable_subtree(lr_factor, trainable)
        decay = trainable_subtree(decay, trainable)

    wd_fn, lr_schedule = _swav_schedules(
        lr, num_steps, wd_start, wd_end, use_cosine_lr,
        num_epochs, steps_per_epoch,
    )

    freeze_links = () if opt_over_trainable else (
        # zero grads of frozen leaves so adam moments stay at 0 for them
        optax.masked(optax.set_to_zero(), jax.tree.map(lambda t: not t, trainable)),
    )
    tx = optax.chain(
        *freeze_links,
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        add_scheduled_decay(wd_fn, decay),
        # per-group lr factor, then the shared cosine schedule and sign flip
        optax.GradientTransformation(
            lambda p: optax.EmptyState(),
            lambda u, s, p=None: (jax.tree.map(lambda x, f: x * f, u, lr_factor), s),
        ),
        optax.scale_by_learning_rate(lr_schedule),
    )
    return tx, trainable


def _find_one(states, kind, what: str):
    found = [s for s in states if isinstance(s, kind)]
    if len(found) != 1:
        raise ValueError(f"expected exactly one {what} in the chain")
    return found[0]


def migrate_zero1_to_subtree(opt_state, params, trainable_mask, plan=None):
    """Exact inverse of ``migrate_subtree_to_zero1``: unravel the ZeRO-1
    flat Adam moments back into the trainable-subtree chain layout
    (ScaleByAdamState, ScheduledWDState, EmptyState, lr-schedule state).
    Enables resuming a ZeRO-1 checkpoint into a non-ZeRO-1 run — or into a
    ZeRO-1 run at a DIFFERENT world size via subtree as the interchange
    layout (the padding differs per world).

    Validation against silent truncation (a saved LARGER trainable set
    whose padding coincides with the template's): the moment tails beyond
    the current trainable length must be exactly zero (the padding region
    is never touched by the optimizer — real moments there mean the saved
    vector belongs to a different trainable set), and, when ``plan`` is
    given, the saved per-element weight-decay mask must match the plan's —
    a pure-structure fingerprint of the trainable layout (invariant to lr
    config, which restore rebakes anyway)."""
    import numpy as np
    from jax.flatten_util import ravel_pytree

    sub = trainable_subtree(params, trainable_mask)
    flat, unravel = ravel_pytree(sub)
    length = int(flat.shape[0])
    if opt_state.adam.mu.shape[0] < length:
        raise ValueError(
            f"zero1 moments have {opt_state.adam.mu.shape[0]} elements, "
            f"trainable set needs {length} — different trainable set"
        )
    for name in ("mu", "nu"):
        tail = np.asarray(getattr(opt_state.adam, name))[length:]
        if tail.size and np.abs(tail).max() > 0:
            raise ValueError(
                f"zero1 {name} has nonzero moments beyond the trainable "
                f"length {length} — the checkpoint was written with a "
                "different (larger) trainable set"
            )
    if plan is not None:
        validate_zero1_fingerprint(opt_state.decay_vec, plan)
    adam = opt_state.adam._replace(
        mu=unravel(opt_state.adam.mu[:length]),
        nu=unravel(opt_state.adam.nu[:length]),
    )
    return (adam, opt_state.wd, optax.EmptyState(), opt_state.sched)


def validate_zero1_fingerprint(decay_vec, plan) -> None:
    """Reject a restored ZeRO-1 opt_state written with a different
    trainable set: the 0/1 per-element weight-decay mask is a
    pure-structure fingerprint of the trainable layout (invariant to lr
    config, which restore rebakes anyway)."""
    import numpy as np

    saved = np.asarray(decay_vec)[: plan.length]
    want = np.asarray(plan.decay_vec)[: plan.length]
    if not np.array_equal(saved, want):
        raise ValueError(
            "zero1 decay-mask fingerprint mismatch — the checkpoint's "
            "trainable layout differs from this run's"
        )


def zero1_plan_with_padding(plan: "Zero1Plan", padded: int) -> "Zero1Plan":
    """A copy of ``plan`` re-padded to a specific vector length — the
    restore template for a ZeRO-1 checkpoint written at an UNKNOWN world
    size whose padded length is known (from orbax array metadata,
    ``checkpoint.saved_zero1_padding``). The synthetic world/chunk are
    only template bookkeeping; the moments migrate out via
    ``migrate_zero1_to_subtree`` immediately after restore."""
    import numpy as np

    if padded < plan.length:
        raise ValueError(
            f"padded={padded} smaller than the trainable length {plan.length}"
        )

    def repad(v):
        return np.pad(np.asarray(v)[: plan.length], (0, padded - plan.length))

    return plan._replace(
        padded=padded, chunk=padded, world=1,
        lr_vec=repad(plan.lr_vec), decay_vec=repad(plan.decay_vec),
    )


def migrate_subtree_to_zero1(opt_state, zero1_plan):
    """Convert a trainable-subtree opt_state (``swav_optimizer(...,
    opt_over_trainable=True)``) into the ZeRO-1 ``Zero1State`` — exact: the
    Adam moments flatten by the same deterministic ``ravel_pytree`` order
    the plan's vectors were built with, and the schedule counters carry
    over. Enables resuming a pre-ZeRO-1 checkpoint into a ``zero1=True``
    run."""
    from jax.flatten_util import ravel_pytree

    states = list(opt_state)
    adam = _find_one(states, optax.ScaleByAdamState, "ScaleByAdamState")
    wd = _find_one(states, ScheduledWDState, "ScheduledWDState")
    sched = _find_one(states, optax.ScaleByScheduleState, "ScaleByScheduleState")
    pad_n = zero1_plan.padded - zero1_plan.length

    def vec(tree):
        flat, _ = ravel_pytree(tree)
        if flat.shape[0] != zero1_plan.length:
            raise ValueError(
                f"moment tree has {flat.shape[0]} elements, plan expects "
                f"{zero1_plan.length} — different trainable set"
            )
        return jnp.pad(flat, (0, pad_n))

    return Zero1State(
        adam=adam._replace(mu=vec(adam.mu), nu=vec(adam.nu)),
        wd=wd,
        sched=sched,
        lr_vec=jnp.asarray(zero1_plan.lr_vec),
        decay_vec=jnp.asarray(zero1_plan.decay_vec),
    )


class Zero1Plan(NamedTuple):
    """Static plan for ZeRO-1 optimizer-state sharding (beyond-reference;
    the reference replicates AdamW state on every DDP rank).

    The trainable subtree is flattened to one [length] vector, zero-padded
    to ``padded = world * chunk``, and the optimizer state (``Zero1State``)
    lives over that padded vector, sharded along the data axis — each
    device holds the [chunk] slice it updates. Inside the step, gradients
    arrive by a ``psum_scatter`` (reduce-scatter), the AdamW update runs on
    1/world of the elements, and a zeros-scatter + ``psum`` rebuilds the
    full update vector with statically-inferable replication. The
    per-element lr-group and weight-decay masks travel as [padded] vector
    *state leaves* so they shard with the moments — no full-length
    per-device constants.
    """

    length: int
    padded: int
    chunk: int
    world: int
    lr_vec: Any           # np [padded] per-element lr factor (init only)
    decay_vec: Any        # np [padded] 1.0 where decay applies (init only)
    wd_fn: Any            # step -> weight decay scalar
    lr_schedule: Any      # optax schedule


class Zero1State(NamedTuple):
    """Optimizer state of ``zero1_tx``. Every [padded]-vector leaf (Adam
    moments AND the lr/decay mask vectors) shards P('data') via
    ``state_partition_specs``; the counters stay replicated."""

    adam: optax.ScaleByAdamState
    wd: ScheduledWDState
    sched: Any            # ScaleByScheduleState
    lr_vec: Any
    decay_vec: Any


def zero1_tx(plan: Zero1Plan) -> optax.GradientTransformation:
    """One elementwise transformation reproducing the ``swav_optimizer``
    chain (Adam → scheduled decay → lr-group factor → lr schedule) over
    flat vectors. Because every op is elementwise and the masks live in the
    state, the SAME tx serves the [padded] init/global form and the
    per-device [chunk] form inside shard_map (state leaves arrive already
    sliced by the sharding)."""
    adam_tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    sched_tx = optax.scale_by_learning_rate(plan.lr_schedule)

    def init(params_vec):
        return Zero1State(
            adam=adam_tx.init(params_vec),
            wd=ScheduledWDState(jnp.zeros((), jnp.int32)),
            sched=sched_tx.init(params_vec),
            lr_vec=jnp.asarray(plan.lr_vec),
            decay_vec=jnp.asarray(plan.decay_vec),
        )

    def update(g, s, p=None):
        u, adam_s = adam_tx.update(g, s.adam, p)
        u = u + plan.wd_fn(s.wd.step) * p * s.decay_vec
        u = u * s.lr_vec
        u, sched_s = sched_tx.update(u, s.sched, p)
        return u, Zero1State(
            adam=adam_s, wd=ScheduledWDState(s.wd.step + 1), sched=sched_s,
            lr_vec=s.lr_vec, decay_vec=s.decay_vec,
        )

    return optax.GradientTransformation(init, update)


def _swav_schedules(lr, num_steps, wd_start, wd_end, use_cosine_lr,
                    num_epochs=None, steps_per_epoch=None):
    """The shared schedule construction of swav_optimizer and its ZeRO-1
    twin — one definition so a schedule fix cannot diverge the two paths."""
    if num_epochs is not None and steps_per_epoch is not None:
        num_steps = num_epochs * steps_per_epoch
    wd_sched = cosine_scheduler(wd_start, wd_end, 1, num_steps)

    def wd_fn(step):
        sched = jnp.asarray(wd_sched)
        return sched[jnp.minimum(step, sched.shape[0] - 1)]

    if use_cosine_lr:
        lr_schedule = optax.cosine_decay_schedule(lr, num_steps, alpha=0.0)
    else:
        lr_schedule = lambda _: lr  # noqa: E731
    return wd_fn, lr_schedule


def _swav_groups(params, lr, backbone_lr, unfreeze_layers):
    """Shared group construction: (trainable_mask, lr_factor tree, decay
    tree) with the reference's lr-group ratios."""
    if backbone_lr is None:
        backbone_lr = lr / 10.0  # reference driver: time_tuning.py:613
    groups, trainable, decay = build_masks(params, unfreeze_layers)
    lr_factor = jax.tree.map(
        lambda g: {"head": 1.0, "backbone": backbone_lr / lr, "frozen": 0.0}[g],
        groups,
    )
    return trainable, lr_factor, decay


def swav_optimizer_zero1(
    params,
    world_size: int,
    lr: float = 1e-4,
    backbone_lr: float | None = None,
    num_steps: int = 100_000,
    unfreeze_layers: Sequence[str] = ("blocks.11", "blocks.10"),
    wd_start: float = 0.04,
    wd_end: float = 0.4,
    num_epochs: int | None = None,
    steps_per_epoch: int | None = None,
    use_cosine_lr: bool = True,
) -> tuple[optax.GradientTransformation, Any, Zero1Plan]:
    """ZeRO-1 variant of ``swav_optimizer``: returns ``(tx, trainable_mask,
    plan)`` where ``tx = zero1_tx(plan)`` both inits the [padded]-vector
    ``Zero1State`` and runs the per-device chunk update inside the step.
    Elementwise-identical to the subtree ``swav_optimizer`` (tested), with
    1/world the optimizer memory and update FLOPs per device.

    Checkpoint note: this is a third opt_state layout (``Zero1State`` flat
    vectors) and restores only into a run with the same world size and
    trainable set; trainable-subtree checkpoints migrate in via
    ``migrate_subtree_to_zero1``."""
    import numpy as np
    from jax.flatten_util import ravel_pytree

    trainable, lr_factor, decay = _swav_groups(
        params, lr, backbone_lr, unfreeze_layers
    )
    sub = trainable_subtree(params, trainable)
    lr_sub = trainable_subtree(lr_factor, trainable)
    decay_sub = trainable_subtree(decay, trainable)

    def vec_of(factor_tree):
        tree = jax.tree.map(
            lambda p, f: jnp.full(p.shape, float(f), jnp.float32),
            sub, factor_tree,
        )
        return ravel_pytree(tree)[0]

    lr_vec = vec_of(lr_sub)
    decay_vec = vec_of(decay_sub)
    length = int(lr_vec.shape[0])
    from timetuning_tpu.ops.util import pad_to_multiple

    padded = pad_to_multiple(length, world_size)
    chunk = padded // world_size
    pad = lambda v: jnp.pad(v, (0, padded - length))  # noqa: E731
    lr_vec, decay_vec = np.asarray(pad(lr_vec)), np.asarray(pad(decay_vec))

    wd_fn, lr_schedule = _swav_schedules(
        lr, num_steps, wd_start, wd_end, use_cosine_lr,
        num_epochs, steps_per_epoch,
    )
    plan = Zero1Plan(
        length=length, padded=padded, chunk=chunk, world=world_size,
        lr_vec=lr_vec, decay_vec=decay_vec, wd_fn=wd_fn,
        lr_schedule=lr_schedule,
    )
    return zero1_tx(plan), trainable, plan
