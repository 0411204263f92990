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
    """2-D (data, model) mesh; ``model`` innermost so the per-layer
    all-reduces ride the fastest ICI links."""
    from timetuning_tpu.parallel.mesh import make_2d_mesh

    return make_2d_mesh(dp, tp, (DATA_AXIS, MODEL_AXIS), devices=devices)


# The ONE Megatron rule table (suffix → spec), consumed by both lookup
# paths below (flax param trees via _spec_for, whole TrainStates via
# timet_state_shardings) so the forward/serving and training shardings
# cannot drift apart.
_MEGATRON_RULES = (
    ("attn/qkv/kernel", P(None, MODEL_AXIS)),   # column parallel
    ("mlp/fc1/kernel", P(None, MODEL_AXIS)),
    ("attn/qkv/bias", P(MODEL_AXIS)),
    ("mlp/fc1/bias", P(MODEL_AXIS)),
    ("attn/proj/kernel", P(MODEL_AXIS, None)),  # row parallel (psum after)
    ("mlp/fc2/kernel", P(MODEL_AXIS, None)),
)


def _suffix_spec(path_str: str, ndim: int) -> P:
    for suffix, p in _MEGATRON_RULES:
        if path_str.endswith(suffix) and ndim == len(p):
            return p
    return P()                              # replicated


def _spec_for(path: tuple[str, ...], leaf) -> P:
    """Megatron sharding rule from the flax param path."""
    return _suffix_spec(
        "/".join(str(p) for p in path), getattr(leaf, "ndim", 0)
    )


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


# --- full training step under dp×tp (GSPMD) --------------------------------


def _key_name(entry) -> str:
    """Render one tree_flatten_with_path entry (DictKey / GetAttrKey /
    SequenceKey) as its bare name."""
    for attr in ("key", "name", "idx"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def timet_state_shardings(state, mesh: Mesh):
    """NamedSharding tree for a ``TrainState`` on a ``(data, model)`` mesh.

    The Megatron rules of ``vit_param_specs`` are applied by *path suffix*
    anywhere in the state tree, which covers the student params, the EMA
    teacher copy AND the Adam moments (optax's mu/nu mirror the param tree,
    so their leaves carry the same ``['attn']['qkv']['kernel']`` path tails).
    The feature queue shards along ``data`` (its rows are batch-derived);
    every other leaf — embeddings, norms, prototypes, head, scalars — is
    replicated.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    out = []
    for path, leaf in flat:
        names = [_key_name(e) for e in path]
        ndim = getattr(leaf, "ndim", 0)
        if names and names[0] == "queue" and ndim == 2:
            spec = P(DATA_AXIS)
        else:
            spec = _suffix_spec("/".join(names), ndim)
        out.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, out)


def gspmd_step_jit(step, mesh: Mesh, state_like, n_batch_args: int = 1,
                   shardings=None):
    """Shared GSPMD jit harness for a TimeT step function
    ``step(state, *batch_args, key) -> (state, metrics)``:
    state under the Megatron shardings (or an explicit ``shardings`` tree —
    expert parallelism passes its own), the ``n_batch_args`` batch arguments
    ``P('data')``-sharded, key and metrics (all scalar) replicated, state
    donated. Returns ``(jitted_step, shardings)``."""
    if shardings is None:
        shardings = timet_state_shardings(state_like, mesh)
    repl = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P(DATA_AXIS))
    # metrics: a single replicated sharding as a PYTREE PREFIX for the whole
    # dict — its keys depend on the step config (e.g. 'moe_aux' appears when
    # TimeTConfig.moe_aux_weight > 0) and every entry is a scalar
    return jax.jit(
        step,
        in_shardings=(shardings,) + (batch,) * n_batch_args + (repl,),
        out_shardings=(shardings, repl),
        donate_argnums=0,
    ), shardings


def put_state_global(state, shardings):
    """Place a TrainState under the mesh shardings.

    Single-process: plain ``device_put``. Multi-process: every process holds
    the identical full value (same init seeds, or the same restored host
    checkpoint), so each leaf is materialized shard-by-shard with
    ``make_array_from_callback`` — ``device_put`` of a single-device array
    onto a sharding whose devices span processes is not portable."""
    if jax.process_count() == 1:
        return jax.device_put(state, shardings)

    def put(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree.map(put, state, shardings)


def gather_global_params(params):
    """Full host (numpy) copy of possibly model-sharded GLOBAL params.

    This is a COLLECTIVE (``multihost_utils.process_allgather`` of every
    non-fully-addressable leaf, which replicates it over the global mesh):
    on pods every process must call it, even when only process 0 consumes
    the result (the process-0-only eval/export paths). Addressable leaves
    device_get directly — routing them through a ``tiled=True`` allgather
    would CONCATENATE per-process copies instead."""
    from jax.experimental import multihost_utils

    def gather(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return multihost_utils.process_allgather(x, tiled=True)
        return jax.device_get(x)

    return jax.tree.map(gather, params)


def force_xla_attention(model):
    """Clone a TimeT model so its backbone runs the plain-XLA attention
    blocks: a Pallas call is opaque to the SPMD partitioner, so the fused
    kernels (which assume replicated weights) cannot run on model-sharded
    parameters. No-op when the backbone has no attn_impl or is already
    XLA."""
    import dataclasses as _dc

    bcfg = getattr(model.feature_extractor.backbone, "config", None)
    if bcfg is None or getattr(bcfg, "attn_impl", "xla") == "xla":
        return model
    fe = model.feature_extractor
    fe = fe.clone(
        backbone=fe.backbone.clone(config=_dc.replace(bcfg, attn_impl="xla"))
    )
    return model.clone(feature_extractor=fe)


def make_tp_train_step(
    model,
    cfg,
    tx,
    mesh: Mesh,
    state_like,
    trainable_mask=None,
    opt_over_trainable: bool = False,
):
    """Full TimeT training step partitioned over a 2-D ``(data, model)`` mesh.

    This is the GSPMD formulation (in contrast to the dp path's explicit
    ``shard_map``): the step is written as ONE global-array program —
    ``cfg.axis_name`` must be ``None`` — and jitted with the Megatron
    parameter shardings from :func:`timet_state_shardings`, a
    ``P('data')``-sharded batch and replicated scalars. The SPMD partitioner
    then inserts every collective itself: the model-axis all-reduce after
    each row-parallel matmul, the data-axis reductions inside the (globally
    normalized) Sinkhorn sums, and the gradient reduce for the replicated
    parameters. Semantics are bit-for-bit those of the single-device step,
    including ONE global feature FIFO (the reference's single-process queue)
    rather than the shard_map path's per-device FIFOs — the trade for
    letting XLA own the partitioning.

    The fused Pallas kernels assume replicated weights (a Pallas call is
    opaque to the partitioner), so the backbone is rerouted to the XLA
    attention implementation.

    ``state_like``: a ``TrainState`` (or matching ShapeDtypeStruct tree) to
    resolve the sharding tree from. Returns ``(step_fn, shardings)`` where
    ``step_fn(state, clip, rng)`` is jitted with donated state; place the
    initial state with ``jax.device_put(state, shardings)`` before the first
    call.
    """
    from timetuning_tpu.core.timet import make_train_step

    model = validate_tp_step(model, cfg, mesh)
    step = make_train_step(
        model, cfg, tx,
        trainable_mask=trainable_mask,
        opt_over_trainable=opt_over_trainable,
    )
    return gspmd_step_jit(step, mesh, state_like, n_batch_args=1)


def validate_tp_step(model, cfg, mesh: Mesh):
    """Shared preconditions for running a TimeT step under GSPMD TP: the
    config must describe a single global program, the geometry must divide,
    and the backbone must run XLA attention (returned model is rerouted if
    needed)."""
    if cfg.axis_name is not None or cfg.world_size != 1:
        raise ValueError(
            "the GSPMD TP step partitions a single global program: build "
            "TimeTConfig with axis_name=None, world_size=1 (the data-axis "
            "reductions are GSPMD's, not explicit psums)"
        )
    bcfg = getattr(model.feature_extractor.backbone, "config", None)
    if bcfg is not None:
        validate_tp_geometry(bcfg, mesh.shape[MODEL_AXIS])
    return force_xla_attention(model)
