"""Compiled-HLO collective audit for the multi-chip programs (VERDICT r4 #4).

`dryrun_multichip` proves the sharded programs are *correct*;
`docs/scaling.md` gives *analytic* collective sizes. This tool closes the
gap between them: it lowers the dp, dp+ZeRO-1 and dp×tp train steps on an
8-device virtual CPU mesh, parses the optimized HLO, and records every
collective op (all-reduce / reduce-scatter / all-gather / collective-permute
/ all-to-all) with its payload shape and bytes. The committed result
(docs/collectives.json) is pinned by tests/test_collectives.py, so a code
change that adds an unexpected all-reduce fails the suite.

Byte convention: payload = result-shape bytes of the collective op (the
tensor being moved), NOT the ring-algorithm wire bytes (which depend on
world size and algorithm choice). The reference's entire comm surface for
comparison is a full-gradient DDP all-reduce + explicit feature all_gathers
(reference my_utils.py:246-274, models.py:1292-1306).

Run:  python tools/audit_collectives.py [--write]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

N_DEVICES = 8

_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

_COLLECTIVES = (
    "all-reduce", "reduce-scatter", "all-gather", "collective-permute",
    "all-to-all",
)

_SHAPE_RE = re.compile(r"\b(\w+)\[([\d,]*)\]")


def _shape_bytes(type_str: str):
    """Sum bytes over every dtype[dims] token in an HLO result-type string
    (handles tuple results)."""
    total = 0
    shapes = []
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _BYTES[dt]
        shapes.append(f"{dt}[{dims}]")
    return total, shapes


def parse_collectives(hlo_text: str):
    """Extract collective ops from optimized HLO text.

    Matches both sync (`all-reduce(`) and async-pair (`all-reduce-start(`)
    forms, counting each logical collective once (the `-done` halves are
    skipped).
    """
    ops = []
    for line in hlo_text.splitlines():
        if "=" not in line:
            continue
        for cname in _COLLECTIVES:
            m = re.search(
                rf"=\s+(.*?)\s+{cname}(?:-start)?\(", line
            )
            if m is None:
                continue
            nbytes, shapes = _shape_bytes(m.group(1))
            ops.append({"op": cname, "shapes": shapes, "bytes": nbytes})
            break
    return ops


def _summarize(name, ops):
    by_op = {}
    for o in ops:
        e = by_op.setdefault(o["op"], {"count": 0, "bytes": 0, "shapes": []})
        e["count"] += 1
        e["bytes"] += o["bytes"]
        if o["shapes"] not in e["shapes"]:
            e["shapes"].append(o["shapes"])
    return {
        "program": name,
        "total_collectives": len(ops),
        "total_payload_bytes": sum(o["bytes"] for o in ops),
        "by_op": by_op,
    }


def _tiny_setup():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from timetuning_tpu.core.optimizer import swav_optimizer
    from timetuning_tpu.core.timet import (
        TimeT, TimeTConfig, init_state, make_train_step,
    )
    from timetuning_tpu.models.extractor import FeatureExtractor
    from timetuning_tpu.models.vit import ViTConfig, VisionTransformer

    img, patch = 32, 8
    vcfg = ViTConfig(patch_size=patch, embed_dim=32, depth=2, num_heads=2,
                     img_size=img, attn_impl="xla")
    fe = FeatureExtractor(backbone=VisionTransformer(vcfg),
                          head_dims=(48, 24))
    model = TimeT(feature_extractor=fe, n_prototypes=8)
    cfg = TimeTConfig(
        n_prototypes=8, use_teacher=True, use_queue=True, queue_size=32,
        num_epochs=1, steps_per_epoch=2, spatial_resolution=img // patch,
        n_last_frames=2, size_mask_neighborhood=1,
        axis_name="data", world_size=N_DEVICES, frozen_trunk_blocks=1,
    )
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, img, img, 3))
    params = model.init(rng, sample)["params"]
    clip = jnp.asarray(
        np.random.default_rng(0).normal(size=(2 * N_DEVICES, 3, img, img, 3)),
        jnp.float32,
    )
    return model, cfg, params, rng, sample, clip


def audit():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", N_DEVICES)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, PartitionSpec as P

    from timetuning_tpu.core.optimizer import swav_optimizer, swav_optimizer_zero1
    from timetuning_tpu.core.timet import (
        init_state, make_train_step, state_partition_specs,
    )

    model, cfg, params, rng, sample, clip = _tiny_setup()
    mesh = Mesh(np.array(jax.devices()[:N_DEVICES]), ("data",))
    results = []

    # ---- dp (shard_map production step) -------------------------------
    tx, mask = swav_optimizer(params, lr=1e-3, num_epochs=1,
                              steps_per_epoch=2,
                              unfreeze_layers=("blocks.1",),
                              opt_over_trainable=True)
    state = init_state(model, cfg, tx, rng, sample, trainable_mask=mask)
    step = make_train_step(model, cfg, tx, trainable_mask=mask,
                           opt_over_trainable=True)
    specs = state_partition_specs(state, "data")
    dp = jax.jit(jax.shard_map(step, mesh=mesh,
                               in_specs=(specs, P("data"), P()),
                               out_specs=(specs, P())))
    hlo = dp.lower(state, clip, jax.random.PRNGKey(1)).compile().as_text()
    results.append(_summarize("dp_step", parse_collectives(hlo)))

    # ---- dp + ZeRO-1 ----------------------------------------------------
    tx_z, mask_z, plan = swav_optimizer_zero1(
        params, world_size=N_DEVICES, lr=1e-3, num_epochs=1,
        steps_per_epoch=2, unfreeze_layers=("blocks.1",),
    )
    state_z = init_state(model, cfg, tx_z, rng, sample,
                         trainable_mask=mask_z, zero1_plan=plan)
    step_z = make_train_step(model, cfg, tx_z, trainable_mask=mask_z,
                             opt_over_trainable=True, zero1_plan=plan)
    specs_z = state_partition_specs(state_z, "data",
                                    zero1_padded=plan.padded)
    dpz = jax.jit(jax.shard_map(step_z, mesh=mesh,
                                in_specs=(specs_z, P("data"), P()),
                                out_specs=(specs_z, P())))
    hlo = dpz.lower(state_z, clip, jax.random.PRNGKey(1)).compile().as_text()
    results.append(_summarize("dp_zero1_step", parse_collectives(hlo)))

    # ---- dp×tp (GSPMD global program) ----------------------------------
    import dataclasses

    from timetuning_tpu.parallel.tp import make_dp_tp_mesh, make_tp_train_step

    cfg_tp = dataclasses.replace(cfg, axis_name=None, world_size=1,
                                 queue_size=32 * N_DEVICES)
    tx_tp, _ = swav_optimizer(params, lr=1e-3, num_epochs=1,
                              steps_per_epoch=2,
                              unfreeze_layers=("blocks.1",))
    state_tp0 = init_state(model, cfg_tp, tx_tp, rng, sample)
    mesh_tp = make_dp_tp_mesh(N_DEVICES // 2, 2)
    step_tp, shardings = make_tp_train_step(model, cfg_tp, tx_tp, mesh_tp,
                                            state_like=state_tp0)
    state_tp = jax.device_put(state_tp0, shardings)
    hlo = step_tp.lower(
        state_tp, clip, jax.random.PRNGKey(1)
    ).compile().as_text()
    results.append(_summarize("dp_tp_step", parse_collectives(hlo)))

    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true",
                    help="write docs/collectives.json")
    args = ap.parse_args()
    results = audit()
    out = {
        "n_devices": N_DEVICES,
        "byte_convention": "payload = collective result-shape bytes",
        "programs": results,
    }
    text = json.dumps(out, indent=1)
    print(text)
    if args.write:
        path = os.path.join(os.path.dirname(__file__), "..", "docs",
                            "collectives.json")
        with open(os.path.abspath(path), "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    sys.exit(main())
