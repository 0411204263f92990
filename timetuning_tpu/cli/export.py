"""AOT model export for serving.

Serializes the dense-feature forward (uint8 frames → patch features, with
the eval preprocessing folded in) as a portable StableHLO artifact via
``jax.export`` — loadable for inference without the model code or the
checkpoint importer on the serving side:

    python -m timetuning_tpu.cli.export --architecture dino-s16 \
        --model_path TimeT.pth --batch_size 64 --out features.stablehlo

    # serving side
    from timetuning_tpu.cli.export import load_exported
    fn = load_exported("features.stablehlo")
    feats = fn(frames_u8)        # [B, H, W, 3] uint8 → [B, N, D]

The reference has no deployment path (models are re-instantiated from
Python + .pth everywhere); this is the TPU-native production equivalent —
the artifact embeds the weights as constants and compiles on whatever
devices the loader runs on.
"""

from __future__ import annotations

import argparse

from timetuning_tpu.cli.train import str2bool
from timetuning_tpu.runtime import setup_compilation_cache


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("timetuning_tpu.export")
    p.add_argument("--architecture", type=str, default="dino-s16")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=64,
                   help="static serving batch")
    p.add_argument("--input_resolution", type=int, default=224)
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--check", type=str2bool, default=True,
                   help="deserialize and verify against the live forward")
    p.add_argument("--symbolic_batch", type=str2bool, default=False,
                   help="export with a symbolic batch dimension: one "
                        "artifact serves ANY batch size (forces the XLA "
                        "attention path — the fused Pallas kernels have "
                        "batch-static grids); --batch_size becomes only "
                        "the round-trip-check batch")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="export a MULTI-CHIP artifact with the weights "
                        "embedded Megatron-sharded over this many model-axis "
                        "devices (for backbones that outgrow one chip); the "
                        "serving side calls it on a (data_parallel, "
                        "tensor_parallel) mesh of the same shape")
    p.add_argument("--data_parallel", type=int, default=1,
                   help="batch-shard the multi-chip artifact over this many "
                        "data-axis devices (total devices = data_parallel x "
                        "tensor_parallel or x sequence_parallel)")
    p.add_argument("--sequence_parallel", type=int, default=1,
                   help="export a MULTI-CHIP artifact that shards the TOKEN "
                        "axis over this many seq-axis devices (parallel/"
                        "sp.py: per-block K/V all-gather, local queries) — "
                        "for long-token geometries (e.g. s8 at high "
                        "resolution) where one chip can't serve at target "
                        "latency; composes with --data_parallel, mutually "
                        "exclusive with --tensor_parallel")
    p.add_argument("--pipeline_parallel", type=int, default=1,
                   help="export a MULTI-CHIP artifact that splits the block "
                        "STACK into this many pipeline stages (parallel/"
                        "pp.py: stage params sharded P('pipe'), GPipe "
                        "microbatch schedule) — for backbones whose depth "
                        "outgrows one chip; composes with --data_parallel, "
                        "mutually exclusive with --tensor_parallel/"
                        "--sequence_parallel")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="GPipe microbatches per data shard (0 = auto: the "
                        "pipe degree when it divides the local batch, else "
                        "1); more microbatches shrink the pipeline bubble")
    p.add_argument("--expert_parallel", type=int, default=1,
                   help="export a MULTI-CHIP artifact with the MoE expert "
                        "weights sharded over this many expert-axis devices "
                        "(parallel/ep.py; GSPMD inserts the token "
                        "all-to-alls) — requires a MoE ViT via "
                        "--moe_every_k/--moe_experts; composes with "
                        "--data_parallel, mutually exclusive with the other "
                        "multi-chip modes")
    p.add_argument("--moe_every_k", type=int, default=0,
                   help="make every k-th block's MLP a Switch top-1 MoE "
                        "(sparse-upcycled from the dense checkpoint: every "
                        "expert starts as a copy of that block's dense MLP)")
    p.add_argument("--moe_experts", type=int, default=0,
                   help="experts per MoE block (with --moe_every_k)")
    return p


def export_features(architecture: str, model_path: str | None,
                    batch_size: int, input_resolution: int,
                    compute_dtype: str = "bfloat16",
                    symbolic_batch: bool = False,
                    tensor_parallel: int = 1, data_parallel: int = 1,
                    sequence_parallel: int = 1, pipeline_parallel: int = 1,
                    pp_microbatches: int = 0, expert_parallel: int = 1,
                    moe_every_k: int = 0, moe_experts: int = 0):
    """Build and AOT-export the uint8→features forward. Returns
    (serialized bytes, live_fn, example_input_shape, mesh_or_None).

    ``tensor_parallel``/``data_parallel`` > 1 export a MULTI-CHIP artifact:
    the embedded weights carry their Megatron shardings (parallel/tp.py)
    over a ``(data_parallel, tensor_parallel)`` mesh and the batch shards
    over ``data`` — the serving side builds a mesh of the same shape and
    commits the input batch ``P('data')`` before calling. The XLA attention
    path is traced (a Pallas call is opaque to the partitioner).

    ``sequence_parallel`` > 1 instead shards the TOKEN axis over a
    ``(data_parallel, sequence_parallel)`` mesh (parallel/sp.py: replicated
    weights, per-block K/V all-gather) — the long-token serving geometry.
    Exported from a CPU/virtual mesh the traced per-token math is the XLA
    fallback path (portable artifact); exported on a TPU mesh the fused
    Pallas row kernels serialize as tpu custom calls (TPU-only artifact).

    ``pipeline_parallel`` > 1 splits the block STACK into stages over a
    ``(data_parallel, pipeline_parallel)`` mesh (parallel/pp.py: stage
    params sharded ``P('pipe')``, GPipe microbatch schedule) — the
    deep-backbone serving geometry where per-stage weights, not tokens,
    are what outgrow a chip."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: F401

    from timetuning_tpu.data.transforms import eval_preprocess_batch
    from timetuning_tpu.models.registry import get_backbone

    dtype = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    bb = get_backbone(architecture, model_path, dtype=dtype)
    if min(tensor_parallel, data_parallel, sequence_parallel,
           pipeline_parallel, expert_parallel) < 1:
        raise ValueError(
            "tensor_parallel/data_parallel/sequence_parallel/"
            "pipeline_parallel/expert_parallel must be >= 1"
        )
    if sum(d > 1 for d in (tensor_parallel, sequence_parallel,
                           pipeline_parallel, expert_parallel)) > 1:
        raise ValueError(
            "--tensor_parallel, --sequence_parallel, --pipeline_parallel "
            "and --expert_parallel are mutually exclusive (weight- vs "
            "token- vs stage- vs expert-sharded artifacts)"
        )
    n_mesh = (tensor_parallel * data_parallel * sequence_parallel
              * pipeline_parallel * expert_parallel)
    if expert_parallel > 1 and not (moe_every_k and moe_experts):
        raise ValueError(
            "--expert_parallel needs a MoE architecture: set "
            "--moe_every_k and --moe_experts"
        )
    if moe_every_k or moe_experts:
        # rebuild the backbone as a MoE ViT, sparse-upcycled from the dense
        # weights (each expert starts as a copy of its block's dense MLP)
        cfg0 = getattr(bb.module, "config", None)
        if not hasattr(cfg0, "depth"):
            raise ValueError("--moe_every_k supports ViT backbones only")
        if not (moe_every_k and moe_experts):
            raise ValueError("set BOTH --moe_every_k and --moe_experts")
        from timetuning_tpu.parallel.ep import (
            upcycle_dense_to_moe,
            validate_ep_geometry,
        )

        validate_ep_geometry(moe_experts, expert_parallel)
        moe_cfg = dataclasses.replace(
            cfg0, moe_every_k=moe_every_k, n_experts=moe_experts,
        )
        moe_module = bb.module.clone(config=moe_cfg)
        moe_params = moe_module.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, input_resolution, input_resolution, 3)),
        )["params"]
        bb = dataclasses.replace(
            bb,
            module=moe_module,
            variables={"params": upcycle_dense_to_moe(
                bb.variables["params"], moe_params, moe_cfg
            )},
        )
    if (symbolic_batch or n_mesh > 1) and hasattr(
        getattr(bb.module, "config", None), "attn_impl"
    ):
        # Pallas grids are batch-static AND opaque to the SPMD partitioner;
        # symbolic-batch and multi-chip artifacts trace the
        # shape-polymorphic / partitionable XLA attention path
        bb = dataclasses.replace(
            bb,
            module=bb.module.clone(
                config=dataclasses.replace(bb.module.config, attn_impl="xla")
            ),
        )
    variables = bb.variables
    mesh = None
    alt_fwd = None   # sp or pp forward replacing the plain apply
    if n_mesh > 1:
        if symbolic_batch:
            raise ValueError(
                "multi-chip artifacts are static-batch: the batch shards "
                "P('data'), which pins its size at export"
            )
        if batch_size % data_parallel:
            raise ValueError(
                f"batch_size {batch_size} must divide over "
                f"data_parallel={data_parallel}"
            )
        if len(jax.devices()) < n_mesh:
            raise ValueError(
                f"mesh export needs {n_mesh} devices, found "
                f"{len(jax.devices())}"
            )
        if sequence_parallel > 1:
            if not hasattr(getattr(bb.module, "config", None), "depth"):
                raise ValueError(
                    "--sequence_parallel supports ViT backbones only "
                    "(the token-sharded block stack, parallel/sp.py)"
                )
            from timetuning_tpu.parallel.sp import (
                make_dp_sp_mesh,
                sp_forward_fn,
            )

            mesh = make_dp_sp_mesh(data_parallel, sequence_parallel)
            alt_fwd = sp_forward_fn(bb.module, mesh)
        elif pipeline_parallel > 1:
            cfg = getattr(bb.module, "config", None)
            if not hasattr(cfg, "depth"):
                raise ValueError(
                    "--pipeline_parallel supports ViT backbones only "
                    "(the stage-sharded block stack, parallel/pp.py)"
                )
            from timetuning_tpu.parallel.pp import (
                _auto_n_micro,
                make_dp_pp_mesh,
                pp_forward_fn,
                validate_pp_geometry,
            )

            local_b = batch_size // data_parallel
            n_micro = pp_microbatches or _auto_n_micro(
                local_b, pipeline_parallel
            )
            validate_pp_geometry(cfg, pipeline_parallel, batch_size,
                                 data_parallel, n_micro)
            mesh = make_dp_pp_mesh(data_parallel, pipeline_parallel)
            alt_fwd = pp_forward_fn(bb.module, mesh, n_micro)
        elif expert_parallel > 1:
            from timetuning_tpu.parallel.ep import (
                ep_param_specs,
                make_dp_ep_mesh,
            )

            mesh = make_dp_ep_mesh(data_parallel, expert_parallel)
            specs = ep_param_specs(
                variables["params"], n_experts=moe_experts
            )
            variables = {
                "params": jax.device_put(
                    variables["params"],
                    jax.tree.map(lambda sp: NamedSharding(mesh, sp), specs),
                )
            }
        else:
            from timetuning_tpu.parallel.tp import (
                make_dp_tp_mesh,
                validate_tp_geometry,
                vit_param_specs,
            )

            if tensor_parallel > 1 and not hasattr(bb.module, "config"):
                # vit_param_specs would match nothing and silently export
                # a fully-replicated (no-op TP) artifact
                raise ValueError(
                    "--tensor_parallel supports ViT backbones only (the "
                    "Megatron sharding rules, parallel/tp.py)"
                )
            if hasattr(bb.module, "config"):
                validate_tp_geometry(bb.module.config, tensor_parallel)
            mesh = make_dp_tp_mesh(data_parallel, tensor_parallel)
            specs = vit_param_specs(variables["params"])
            variables = {
                "params": jax.device_put(
                    variables["params"],
                    jax.tree.map(lambda sp: NamedSharding(mesh, sp), specs),
                )
            }

    def forward(frames_u8):
        x = eval_preprocess_batch(frames_u8, out_size=input_resolution)
        if alt_fwd is not None:
            tokens = alt_fwd(variables["params"], x)
        else:
            tokens = bb.module.apply(variables, x)["tokens"]
        return tokens[:, 1:] if bb.drop_cls else tokens

    if mesh is not None:
        batch_sh = NamedSharding(mesh, P("data"))
        forward = jax.jit(
            forward, in_shardings=batch_sh, out_shardings=batch_sh
        )
    else:
        forward = jax.jit(forward)

    shape = (batch_size, input_resolution, input_resolution, 3)
    if symbolic_batch:
        (b,) = jexport.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct(
            (b, input_resolution, input_resolution, 3), jnp.uint8
        )
    elif mesh is not None:
        spec = jax.ShapeDtypeStruct(
            shape, jnp.uint8, sharding=NamedSharding(mesh, P("data"))
        )
    else:
        spec = jax.ShapeDtypeStruct(shape, jnp.uint8)
    exported = jexport.export(forward)(spec)
    return exported.serialize(), forward, shape, mesh


def load_exported(path: str):
    """Serving-side loader: path → callable(frames_u8) (no model code)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    return exported.call


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    setup_compilation_cache()
    import numpy as np

    blob, live, shape, mesh = export_features(
        args.architecture, args.model_path, args.batch_size,
        args.input_resolution, args.compute_dtype,
        symbolic_batch=args.symbolic_batch,
        tensor_parallel=args.tensor_parallel,
        data_parallel=args.data_parallel,
        sequence_parallel=args.sequence_parallel,
        pipeline_parallel=args.pipeline_parallel,
        pp_microbatches=args.pp_microbatches,
        expert_parallel=args.expert_parallel,
        moe_every_k=args.moe_every_k,
        moe_experts=args.moe_experts,
    )
    with open(args.out, "wb") as f:
        f.write(blob)
    if mesh is None:
        mesh_note = ""
    elif args.sequence_parallel > 1:
        mesh_note = f", {args.data_parallel}x{args.sequence_parallel} seq mesh"
    elif args.pipeline_parallel > 1:
        mesh_note = (
            f", {args.data_parallel}x{args.pipeline_parallel} pipe mesh"
        )
    elif args.expert_parallel > 1:
        mesh_note = (
            f", {args.data_parallel}x{args.expert_parallel} expert mesh "
            f"({args.moe_experts} experts upcycled every "
            f"{args.moe_every_k} blocks)"
        )
    else:
        mesh_note = f", {args.data_parallel}x{args.tensor_parallel} mesh"
    print(f"exported {args.architecture} forward "
          f"({shape} uint8 → features) to {args.out} "
          f"({len(blob) / 1e6:.1f} MB{mesh_note})")
    if args.check:
        import jax
        import jax.numpy as jnp

        fn = load_exported(args.out)
        x = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, shape, np.uint8)
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            x = jax.device_put(x, NamedSharding(mesh, P("data")))
        got = np.asarray(fn(x))
        want = np.asarray(live(x))
        err = float(np.abs(got.astype(np.float32) - want.astype(np.float32)).max())
        print(f"round-trip check: max|Δ| = {err:.2e}")
        if err > 1e-3:
            print("FAIL: round-trip mismatch")
            return 1
        if args.symbolic_batch:
            # one artifact, a different batch: prove shape polymorphism
            # (must genuinely differ from the example batch — at small
            # --batch_size the old //2+1 formula degenerated to equality)
            alt = args.batch_size + 1
            x2 = jnp.asarray(
                np.random.default_rng(1).integers(
                    0, 256, (alt,) + shape[1:], np.uint8
                )
            )
            got2 = np.asarray(fn(x2))
            assert got2.shape[0] == alt
            print(f"symbolic-batch check: batch {alt} ok "
                  f"(features {got2.shape})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
