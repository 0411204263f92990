"""SwAV optimizer chain vs torch AdamW + CosineAnnealingLR + scheduled WD.

The reference optimizer (time_tuning.py:379-429) is AdamW with three
parameter groups (prototypes@lr, head@lr, backbone@lr/10), bias/1-dim
params excluded from decay, per-step cosine LR annealing, and the weight
decay itself re-set each step from a cosine schedule. This test runs both
implementations on the same tiny problem and compares trajectories.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from timetuning_tpu.core.optimizer import swav_optimizer  # noqa: E402
from timetuning_tpu.core.schedules import cosine_scheduler  # noqa: E402

STEPS = 5
LR = 1e-2


def _params():
    rng = np.random.default_rng(0)
    return {
        "prototypes": rng.normal(size=(4, 3)).astype(np.float32),
        "feature_extractor": {
            "head": {
                "lin0": {
                    "kernel": rng.normal(size=(3, 4)).astype(np.float32),
                    "bias": rng.normal(size=(4,)).astype(np.float32),
                }
            },
            "backbone": {
                "blocks_1": {
                    "w": rng.normal(size=(2, 2)).astype(np.float32),
                },
                "blocks_0": {
                    "w": rng.normal(size=(2, 2)).astype(np.float32),
                },
            },
        },
    }


def _loss_jax(p):
    return (
        jnp.sum(p["prototypes"] ** 2) * 0.5
        + jnp.sum(p["feature_extractor"]["head"]["lin0"]["kernel"] ** 2) * 0.25
        + jnp.sum(p["feature_extractor"]["head"]["lin0"]["bias"] ** 2) * 0.25
        + jnp.sum(p["feature_extractor"]["backbone"]["blocks_1"]["w"] ** 2) * 0.125
        + jnp.sum(p["feature_extractor"]["backbone"]["blocks_0"]["w"] ** 2) * 0.125
    )


def test_matches_torch_adamw():
    import optax

    init = _params()
    tx, _ = swav_optimizer(
        jax.tree.map(jnp.asarray, init),
        lr=LR,
        num_epochs=1,
        steps_per_epoch=STEPS,
        unfreeze_layers=("blocks.1",),
    )
    params = jax.tree.map(jnp.asarray, init)
    opt_state = tx.init(params)
    for _ in range(STEPS):
        grads = jax.grad(_loss_jax)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    # torch mirror
    t_protos = torch.tensor(init["prototypes"], requires_grad=True)
    t_kernel = torch.tensor(init["feature_extractor"]["head"]["lin0"]["kernel"],
                            requires_grad=True)
    t_bias = torch.tensor(init["feature_extractor"]["head"]["lin0"]["bias"],
                          requires_grad=True)
    t_b1 = torch.tensor(init["feature_extractor"]["backbone"]["blocks_1"]["w"],
                        requires_grad=True)
    t_b0 = torch.tensor(init["feature_extractor"]["backbone"]["blocks_0"]["w"])

    wd_sched = cosine_scheduler(0.04, 0.4, 1, STEPS)
    groups = [
        {"params": [t_protos], "weight_decay": wd_sched[0], "lr": LR},
        {"params": [t_kernel], "weight_decay": wd_sched[0], "lr": LR},
        {"params": [t_bias], "weight_decay": 0.0, "lr": LR},
        {"params": [t_b1], "weight_decay": wd_sched[0], "lr": LR / 10},
    ]
    opt = torch.optim.AdamW(groups, LR)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=STEPS, eta_min=0)
    for step in range(STEPS):
        loss = (
            (t_protos ** 2).sum() * 0.5
            + (t_kernel ** 2).sum() * 0.25
            + (t_bias ** 2).sum() * 0.25
            + (t_b1 ** 2).sum() * 0.125
            + (t_b0 ** 2).sum() * 0.125
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        # reference re-sets wd from the schedule AFTER stepping
        # (time_tuning.py:427-429: wd_schedule[global_step] with the
        # incremented step)
        for g in opt.param_groups:
            if g["weight_decay"] != 0:
                g["weight_decay"] = wd_sched[min(step + 1, STEPS - 1)]

    np.testing.assert_allclose(
        np.asarray(params["prototypes"]), t_protos.detach().numpy(),
        rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["feature_extractor"]["head"]["lin0"]["kernel"]),
        t_kernel.detach().numpy(), rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["feature_extractor"]["head"]["lin0"]["bias"]),
        t_bias.detach().numpy(), rtol=1e-4, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["feature_extractor"]["backbone"]["blocks_1"]["w"]),
        t_b1.detach().numpy(), rtol=1e-4, atol=1e-6,
    )
    # frozen leaf untouched
    np.testing.assert_array_equal(
        np.asarray(params["feature_extractor"]["backbone"]["blocks_0"]["w"]),
        init["feature_extractor"]["backbone"]["blocks_0"]["w"],
    )


def test_unfreeze_matches_full_segments_only():
    """'blocks.1' must not unfreeze blocks_10/11 (substring false match)."""
    import jax.numpy as jnp

    from timetuning_tpu.core.optimizer import build_masks

    params = {
        "feature_extractor": {
            "backbone": {
                f"blocks_{i}": {"w": jnp.zeros((2, 2))} for i in (0, 1, 10, 11)
            }
        },
        "prototypes": jnp.zeros((4, 2)),
    }
    groups, trainable, _ = build_masks(params, ("blocks.1",))
    bb = trainable["feature_extractor"]["backbone"]
    assert bb["blocks_1"]["w"] is True
    assert bb["blocks_10"]["w"] is False
    assert bb["blocks_11"]["w"] is False
    assert bb["blocks_0"]["w"] is False
    assert trainable["prototypes"] is True


def test_migrate_opt_state_exact_both_directions():
    """Cross-layout opt_state migration continues the identical trajectory:
    run K steps in one layout, convert, run more steps — params match a run
    that never switched layouts (core/optimizer.migrate_opt_state)."""
    import optax

    from timetuning_tpu.core.optimizer import (
        merge_subtree,
        migrate_opt_state,
        trainable_subtree,
    )

    def build(over_trainable):
        return swav_optimizer(
            _params(), lr=LR, num_steps=STEPS * 2,
            unfreeze_layers=("blocks.1",),
            opt_over_trainable=over_trainable,
        )

    tx_full, mask = build(False)
    tx_sub, _ = build(True)
    grad_fn = jax.grad(_loss_jax)

    def step_full(params, st):
        g = grad_fn(params)
        upd, st = tx_full.update(g, st, params)
        return optax.apply_updates(params, upd), st

    def step_sub(params, st):
        g = trainable_subtree(grad_fn(params), mask)
        upd, st = tx_sub.update(g, st, trainable_subtree(params, mask))
        return merge_subtree(params, optax.apply_updates(
            trainable_subtree(params, mask), upd)), st

    init = jax.tree.map(jnp.asarray, _params())

    # uninterrupted full-tree run = ground truth
    p_ref, st_ref = init, tx_full.init(init)
    for _ in range(4):
        p_ref, st_ref = step_full(p_ref, st_ref)

    # full → subtree after 2 steps
    p, st = init, tx_full.init(init)
    for _ in range(2):
        p, st = step_full(p, st)
    st = migrate_opt_state(st, p, mask, to_subtree=True)
    for _ in range(2):
        p, st = step_sub(p, st)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        p, p_ref,
    )

    # subtree → full after 2 steps
    p, st = init, tx_sub.init(trainable_subtree(init, mask))
    for _ in range(2):
        p, st = step_sub(p, st)
    st = migrate_opt_state(st, p, mask, to_subtree=False)
    for _ in range(2):
        p, st = step_full(p, st)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        p, p_ref,
    )
