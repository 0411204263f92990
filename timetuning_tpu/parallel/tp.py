"""Optional tensor parallelism for the ViT backbone (beyond-reference).

The reference has no TP (SURVEY.md §2.2) — data parallelism is all TimeT
needs at ViT-S scale. But the TPU-native formulation makes a ``model`` mesh
axis essentially free, and it is the right tool once the backbone outgrows
one chip's HBM (ViT-g/H class, or S/8 at high resolution with large
batches). The design is the scaling-book recipe, not hand-written
collectives:

  * a 2-D ``Mesh((dp, tp), ('data', 'model'))``;
  * Megatron-style parameter PartitionSpecs — qkv and fc1 kernels sharded on
    the *output* dim (column parallel: each shard computes its heads /
    hidden slice), attention-proj and fc2 kernels sharded on the *input*
    dim (row parallel) so XLA's SPMD partitioner inserts exactly one
    all-reduce per residual branch over the ``model`` axis;
  * everything else (embeddings, LayerNorms, biases of row-parallel layers,
    prototypes, heads) replicated.

This composes with jit/GSPMD, not shard_map: pass the specs as
``in_shardings`` and let the partitioner do the rest. The fused Pallas
kernels assume replicated weights, so the TP path runs the XLA attention
implementation (``attn_impl='xla'`` — GSPMD splits einsums natively;
a Pallas op is opaque to the partitioner).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_dp_tp_mesh(dp: int, tp: int, devices=None) -> Mesh:
    """2-D (data, model) mesh. ICI topology note: put ``model`` innermost so
    the per-layer all-reduces ride the fastest links."""
    if devices is None:
        devices = jax.devices()
    if dp * tp > len(devices):
        raise ValueError(f"dp*tp={dp * tp} exceeds {len(devices)} devices")
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _spec_for(path: tuple[str, ...], leaf) -> P:
    """Megatron sharding rule from the flax param path."""
    s = "/".join(str(p) for p in path)
    if s.endswith("attn/qkv/kernel") or s.endswith("mlp/fc1/kernel"):
        return P(None, MODEL_AXIS)          # column parallel
    if s.endswith("attn/qkv/bias") or s.endswith("mlp/fc1/bias"):
        return P(MODEL_AXIS)
    if s.endswith("attn/proj/kernel") or s.endswith("mlp/fc2/kernel"):
        return P(MODEL_AXIS, None)          # row parallel (psum after)
    return P()                              # replicated


def vit_param_specs(params) -> object:
    """PartitionSpec pytree for a (possibly nested) param tree containing a
    VisionTransformer."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params)
    return tu.unflatten_dict({k: _spec_for(k, v) for k, v in flat.items()})


def shard_params(mesh: Mesh, params):
    """Place params on the mesh under the TP specs."""
    specs = vit_param_specs(params)
    return jax.tree.map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), params, specs
    )


def tp_feature_fn(model, mesh: Mesh):
    """Returns a FACTORY: ``tp_feature_fn(model, mesh)(params)`` builds the
    jit'd dense-feature forward with dp-sharded batch + tp-sharded params
    (specs resolved from the concrete param tree); XLA inserts the
    model-axis collectives."""
    def fwd(params, x):
        out = model.apply({"params": params}, x)
        return out["tokens"]

    def make(params):
        specs = vit_param_specs(params)
        return jax.jit(
            fwd,
            in_shardings=(
                jax.tree.map(lambda sp: NamedSharding(mesh, sp), specs),
                NamedSharding(mesh, P(DATA_AXIS)),
            ),
            out_shardings=NamedSharding(mesh, P(DATA_AXIS)),
        )

    return make


def validate_tp_geometry(config, tp: int) -> None:
    """Shardability constraints: heads and the MLP hidden must divide."""
    if config.num_heads % tp != 0:
        raise ValueError(
            f"num_heads={config.num_heads} not divisible by tp={tp}"
        )
    hidden = int(config.embed_dim * config.mlp_ratio)
    if (3 * config.embed_dim) % tp or hidden % tp:
        raise ValueError(f"widths not divisible by tp={tp}")
