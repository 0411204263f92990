"""End-to-end TimeT training driver.

Reference: the ``time_tuning()`` function + launcher (time_tuning.py:508-717):
model/data/optimizer assembly, epoch loop with per-epoch checkpointing,
every-4-epochs Pascal dataset-wise eval on rank 0 with best-model export,
per-step loss logging.

TPU-native composition:
  * one ``Mesh(('data',))`` over all local devices; the train step is
    shard_map'd with batch sharded and state replicated (the reference's
    mp.spawn/DDP/NCCL stack, time_tuning.py:516-521 + models.py:1292-1306);
  * the uint8 host batch is the only host→device transfer per step — the
    fused augmentation kernel and the TimeT step run as one program;
  * schedules, EMA, queue, prototype renorm all live inside the jitted step.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from timetuning_tpu.core.checkpoint import (
    export_best,
    find_last_run_directory,
    load_checkpoint,
    make_run_directory,
    save_checkpoint,
)
from timetuning_tpu.core.optimizer import swav_optimizer
from timetuning_tpu.core.timet import (
    TimeT,
    TimeTConfig,
    TrainState,
    init_state,
    make_train_step,
)
from timetuning_tpu.data.datasets import SamplingMode
from timetuning_tpu.data.loader import device_prefetch, make_loader
from timetuning_tpu.data.transforms import (
    AugmentConfig,
    IMAGENET_STD,
    augment_batch,
    eval_preprocess_batch,
)
from timetuning_tpu.eval.evaluator import Evaluator
from timetuning_tpu.models.extractor import FeatureExtractor
from timetuning_tpu.models.registry import get_backbone
from timetuning_tpu.obs.logging import MetricsWriter, dump_config, make_file_logger
from timetuning_tpu.ops.util import pad_to_multiple


@dataclasses.dataclass
class TrainingConfig:
    """Flag surface of the reference trainer (time_tuning.py:673-714)."""

    architecture: str = "dino-s16"
    model_path: str | None = None           # pretrained backbone ckpt (.pth)
    dataset: str = "ytvos"
    data_root: str | None = None
    pascal_root: str | None = None          # eval dataset (time_tuning.py:596)
    log_dir: str = "logs"
    evaluation_protocol: str = "dataset-wise"
    # Reference semantics (time_tuning.py:383): only the exact string
    # "CosineAnnealingLR" enables the cosine schedule; anything else means
    # constant LR (there, via a falsy identity compare — here, explicitly).
    lr_scheduler: str = "CosineAnnealingLR"
    head_lr: float = 1e-4
    batch_size: int = 128
    num_epochs: int = 100
    num_workers: int = 10
    num_clusters: int = 200
    input_resolution: int = 224
    eval_resolution: int | None = None      # default input/2 (:603)
    many_to_one: bool = False
    precision_based: bool = False
    num_frames: int = 4
    uvos: bool = False
    topk: int = 5
    size_mask_neighborhood: int = 6
    n_last_frames: int = 7                  # effective get_loss default
    epsilon: float = 0.05
    sinkhorn_iterations: int = 10           # effective get_loss default
    use_projection_head: bool = True
    use_queue: bool = False
    queue_size: int = 16384
    use_mask: bool = False
    use_teacher: bool = True
    ema_decay: float = 0.995
    load_checkpoint: bool = False
    regular_step: int = 3
    eval_every: int = 4
    decode_size: int = 256
    seed: int = 1
    head_dims: tuple = (1024, 1024, 512, 256)
    unfreeze_layers: tuple = ("blocks.11", "blocks.10")
    compute_dtype: str = "bfloat16"
    eval_num_clusters: int = 21             # Pascal (:603)
    max_steps_per_epoch: int | None = None  # test hook
    use_tensorboard: bool = True
    num_devices: int | None = None          # None → all visible devices
    streaming_eval: bool = False            # bounded-memory dataset-wise eval
    checkpoint_every_steps: int | None = None  # mid-epoch periodic saves
    handle_preemption: bool = True          # SIGTERM → save + clean exit
    # True (default): optimizer state / gradient collective / EMA run over
    # the trainable subtree only (+7% step, ~6× smaller multi-chip grad
    # all-reduce). Set False to get the full-tree opt_state layout — needed
    # to resume checkpoints written before the subtree layout existed (the
    # two layouts have different opt_state trees and are not
    # interchangeable at restore time).
    opt_over_trainable: bool = True
    # per-eval-epoch prototype-assignment histogram + entropy scalars and an
    # overlay seg-map gif artifact (reference time_tuning.py:433-457, 305-351)
    log_histograms: bool = False
    # ZeRO-1 optimizer-state sharding (beyond-reference): Adam moments shard
    # across the data axis (1/N memory per device), gradients arrive by
    # reduce-scatter and the update runs on 1/N of the elements. Requires
    # opt_over_trainable and >1 device (silently off single-device). The
    # opt_state checkpoint layout becomes flat vectors restorable only at
    # the same world size; subtree-layout checkpoints migrate in exactly.
    zero1: bool = False
    # decode-once packed clip cache (native/clippack.cpp): built at this path
    # on first use, then every epoch gathers raw frames instead of re-decoding
    # JPEGs (the reference's workers re-decode every epoch). DAVIS-layout
    # datasets, ytvos and kinetics.
    pack_path: str | None = None
    # JPEG DCT-domain reduced decode when the source is ≥2× decode_size
    # (YTVOS-class 720p sources: ~1.7× faster decode). Opt-in because the
    # scaled IDCT downsamples differently (better) than the reference's
    # full decode + bilinear — pixel values shift slightly.
    fast_decode: bool = False
    # Tensor parallelism (beyond-reference): shard the backbone's Megatron
    # axes over a (data, model) mesh with model size tensor_parallel; the
    # step becomes ONE global GSPMD program (XLA inserts the model-axis
    # all-reduces and the data-axis reductions). For backbones that outgrow
    # one chip's HBM. Notes: the feature queue becomes one GLOBAL FIFO
    # (the reference's single-process queue semantics) instead of the dp
    # path's per-device FIFOs, the fused Pallas attention is rerouted to
    # XLA (a Pallas call cannot be partitioned), and zero1 is unsupported.
    # Works on pods: batch_size stays per-host, state placement goes
    # through make_array_from_callback, and the process-0 eval/export
    # paths gather the model-sharded params with a process_allgather.
    tensor_parallel: int = 1


def frozen_trunk_split(unfreeze_layers, backbone_module) -> int | None:
    """Largest k such that blocks [0, k) are all frozen — enables the
    shared-trunk train step (TimeTConfig.frozen_trunk_blocks). Valid only
    for ViT backbones whose unfreeze patterns are all block names."""
    import re

    from timetuning_tpu.models.vit import VisionTransformer

    if not isinstance(backbone_module, VisionTransformer):
        return None
    idxs = []
    for u in unfreeze_layers:
        m = re.fullmatch(r"blocks[._](\d+)", str(u))
        if not m:
            return None  # a non-block unfreeze could touch the trunk
        idxs.append(int(m.group(1)))
    if not idxs:
        return None
    lo = min(i for i in idxs)
    depth = backbone_module.config.depth
    # patterns naming nonexistent blocks (e.g. blocks.10 on a depth-2 test
    # arch) leave everything frozen — no valid tail to differentiate
    if lo <= 0 or lo >= depth or max(idxs) >= depth:
        return None
    return lo


def default_eval_resolution(cfg: TrainingConfig) -> int:
    """Reference time_tuning.py:603: the in-training eval resolution is
    input/2 ONLY for the dataset-wise protocol; frame-/sample-wise run at
    full input resolution. ``--eval_resolution`` overrides either."""
    return cfg.eval_resolution or (
        cfg.input_resolution // 2
        if cfg.evaluation_protocol == "dataset-wise"
        else cfg.input_resolution
    )


def build_model(cfg: TrainingConfig):
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    bb = get_backbone(cfg.architecture, cfg.model_path, dtype=dtype)
    head_dims = tuple(cfg.head_dims) if cfg.use_projection_head else ()
    fe = FeatureExtractor(
        backbone=bb.module, head_dims=head_dims, drop_cls=bb.drop_cls
    )
    model = TimeT(
        feature_extractor=fe,
        n_prototypes=cfg.num_clusters,
        prototype_dim=None if head_dims else bb.feature_dim,
    )
    pretrained = None
    if cfg.model_path:
        pretrained = {"feature_extractor": {"backbone": bb.variables["params"]}}
    spatial_res = bb.spatial_resolution(cfg.input_resolution)
    return model, pretrained, spatial_res


def make_full_step(model, tcfg: TimeTConfig, tx, aug_cfg: AugmentConfig,
                   mesh=None, state_like=None, trainable_mask=None,
                   opt_over_trainable: bool | None = None, zero1_plan=None):
    """uint8 batch → augment → TimeT step, one jitted program; shard_map'd
    over a 1-D data mesh, GSPMD-partitioned over a 2-D (data, model) mesh
    (tensor parallelism — the step is one global program with the Megatron
    shardings of parallel/tp.py and ``tcfg.axis_name=None``)."""
    if opt_over_trainable is None:
        opt_over_trainable = trainable_mask is not None
    gspmd = mesh is not None and "model" in mesh.axis_names
    if gspmd:
        from timetuning_tpu.parallel.tp import validate_tp_step

        model = validate_tp_step(model, tcfg, mesh)
    base_step = make_train_step(model, tcfg, tx, trainable_mask=trainable_mask,
                                opt_over_trainable=opt_over_trainable,
                                zero1_plan=zero1_plan)

    def full(state, frames_u8, src_sizes, gray_means, key, sharded=False):
        k_aug, k_step = jax.random.split(key)
        if sharded:
            # decorrelate per-device augmentation AND queue-FIFO sampling
            # streams (the reference's per-rank RNG streams) — a shared
            # step key would make every device store the same (sample,
            # token) positions into its queue shard
            idx = jax.lax.axis_index("data")
            k_aug = jax.random.fold_in(k_aug, idx)
            k_step = jax.random.fold_in(k_step, idx)
        clips, _ = augment_batch(k_aug, frames_u8, None, aug_cfg,
                                 with_annotations=False, src_sizes=src_sizes,
                                 gray_means=gray_means)
        return base_step(state, clips, k_step)

    if mesh is None or mesh.size == 1:
        # donate the state: params/opt/teacher/queue buffers are reused
        # in place instead of copied every step
        return jax.jit(full, donate_argnums=(0,))
    from jax.sharding import PartitionSpec as P

    if gspmd:
        from timetuning_tpu.parallel.tp import gspmd_step_jit

        step_fn, _ = gspmd_step_jit(full, mesh, state_like, n_batch_args=3)
        return step_fn

    from timetuning_tpu.core.timet import state_partition_specs

    specs = state_partition_specs(
        state_like, "data",
        zero1_padded=zero1_plan.padded if zero1_plan is not None else None,
    )
    return jax.jit(
        jax.shard_map(
            lambda st, f, sz, gm, k: full(st, f, sz, gm, k, sharded=True),
            mesh=mesh,
            in_specs=(specs, P("data"), P("data"), P("data"), P()),
            out_specs=(specs, P()),
        ),
        donate_argnums=(0,),
    )


def make_diagnostics_scores_fn(model, input_resolution: int):
    """Jitted (normalized images, prototype scores) forward for the
    training diagnostics — built ONCE per run (re-creating it per eval
    epoch would recompile the full model forward every time)."""

    @jax.jit
    def scores_fn(p, frames_u8):
        x = eval_preprocess_batch(
            frames_u8, out_size=input_resolution, std=IMAGENET_STD
        )
        feats, _ = model.apply({"params": p}, x, use_head=True)
        s = model.apply({"params": p}, feats, method="similarity")
        return x, s

    return scores_fn


def log_training_diagnostics(
    scores_fn, params, eval_loader, writer, run_dir: str, epoch: int,
    cfg: TrainingConfig, spatial_res: int,
) -> float:
    """Prototype-assignment histogram + entropy scalars and an overlay
    seg-map gif over the eval set (reference ``get_similarity_histogram`` /
    ``log_assignment_histogram`` + overlay figures, time_tuning.py:433-457,
    305-351). The histogram bincount and the prototype argmax run on device.
    Returns the assignment entropy.

    Cost note: this is a SECOND full forward pass over the eval loader in
    the same eval epoch — deliberately mirroring the reference, whose
    ``get_similarity_histogram`` also re-iterates the whole eval loader
    after its Evaluator pass. Opt-in (``--log_histograms``)."""
    from timetuning_tpu.data.transforms import IMAGENET_MEAN
    from timetuning_tpu.obs.histograms import (
        assignment_histogram,
        log_assignment_histogram,
    )
    from timetuning_tpu.obs.viz import clip_overlay_frames, write_gif

    hist = np.zeros(cfg.num_clusters, np.int64)
    overlay = None
    for frames, _masks in eval_loader:
        x, s = scores_fn(params, jnp.asarray(frames))
        hist += np.asarray(assignment_histogram(s, cfg.num_clusters))
        if overlay is None:
            n = min(8, s.shape[0])
            seg = np.asarray(jnp.argmax(s[:n], -1)).reshape(
                n, spatial_res, spatial_res
            )
            overlay = clip_overlay_frames(
                np.asarray(x[:n], np.float32), seg,
                IMAGENET_MEAN, IMAGENET_STD,
            )
    ent = log_assignment_histogram(writer, hist, epoch)
    if overlay:
        art_dir = os.path.join(run_dir, "artifacts")
        os.makedirs(art_dir, exist_ok=True)
        write_gif(overlay, os.path.join(art_dir, f"assignments_epoch{epoch}.gif"))
    return ent


def _broadcast_str(s: str | None, max_len: int = 512) -> str:
    """Agree on a string across processes (process 0's value wins)."""
    from jax.experimental import multihost_utils

    buf = np.zeros(max_len, np.uint8)
    if s is not None:
        b = s.encode()
        if len(b) > max_len:
            raise ValueError(f"string too long to broadcast: {s!r}")
        buf[: len(b)] = np.frombuffer(b, np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    return bytes(np.asarray(out)).rstrip(b"\0").decode()


def run_training(cfg: TrainingConfig) -> dict[str, Any]:
    devices = jax.devices()
    n_dev = len(devices) if cfg.num_devices is None else cfg.num_devices
    if n_dev > len(devices):
        # a silent devices[:n] undershoot would desynchronize world_size
        # from the actual mesh (wrong Sinkhorn marginals, queue shapes)
        raise ValueError(
            f"num_devices={n_dev} exceeds the {len(devices)} available "
            "devices"
        )
    tp = cfg.tensor_parallel
    if tp < 1:
        raise ValueError(f"tensor_parallel must be >= 1, got {tp}")
    mesh = None
    dp = n_dev
    if tp > 1:
        if n_dev % tp != 0:
            raise ValueError(
                f"tensor_parallel={tp} must divide the {n_dev} devices"
            )
        dp = n_dev // tp
        # batch_size is PER-HOST (like the dp path): the global batch
        # assembled over the mesh is batch_size * processes
        if (cfg.batch_size * jax.process_count()) % dp != 0:
            raise ValueError(
                f"global batch {cfg.batch_size} x {jax.process_count()} "
                f"host(s) must divide over the data axis (dp={dp} at "
                f"tensor_parallel={tp})"
            )
        if cfg.zero1:
            raise ValueError(
                "zero1 and tensor_parallel are mutually exclusive (ZeRO-1 "
                "shards the flat optimizer vector over the data axis; under "
                "TP the moments already shard over the model axis)"
            )
        from timetuning_tpu.parallel.tp import make_dp_tp_mesh

        mesh = make_dp_tp_mesh(dp, tp, devices=devices[:n_dev])
    elif n_dev > 1:
        # batch_size is PER-HOST (each host's loader yields its own slice);
        # the global batch assembled over the mesh is batch_size * processes
        if (cfg.batch_size * jax.process_count()) % n_dev != 0:
            raise ValueError(
                f"global batch {cfg.batch_size} x {jax.process_count()} "
                f"host(s) must divide over {n_dev} devices (set "
                "num_devices to a divisor)"
            )
        from timetuning_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_devices=n_dev)

    if jax.process_index() == 0:
        run_dir = (
            find_last_run_directory(cfg.log_dir)
            if cfg.load_checkpoint
            else None
        ) or make_run_directory(cfg.log_dir)
    else:
        run_dir = None
    if jax.process_count() > 1:
        # the run dir is timestamped (and resume scans the filesystem), so
        # every process must adopt PROCESS 0's choice — independently
        # derived paths would mismatch the cross-process checkpoint
        # barriers (deadlock) or resume different runs per host
        run_dir = _broadcast_str(run_dir)
        os.makedirs(run_dir, exist_ok=True)
    dump_config(dataclasses.asdict(cfg), run_dir)
    writer = MetricsWriter(run_dir, use_tensorboard=cfg.use_tensorboard)
    logger = make_file_logger("train", run_dir)

    model, pretrained, spatial_res = build_model(cfg)
    if tp > 1:
        from timetuning_tpu.parallel.tp import (
            force_xla_attention,
            validate_tp_geometry,
        )

        bcfg = getattr(model.feature_extractor.backbone, "config", None)
        if bcfg is not None:
            validate_tp_geometry(bcfg, tp)
        model = force_xla_attention(model)

    # Per-host data sharding (the DistributedSampler equivalent): each host
    # loads its slice of the videos and feeds its local devices; the mesh
    # spans all hosts' devices.
    if cfg.pack_path:
        if cfg.fast_decode and jax.process_index() == 0:
            # steady-state pack epochs do no JPEG decode at all; the flag
            # reaches build_clip_pack via the dataset below
            logger.info("--fast_decode with --pack_path applies only to "
                        "the one-time pack build")
        if jax.process_index() == 0 and not (
            os.path.exists(cfg.pack_path)
            and os.path.exists(cfg.pack_path + ".index.json")
        ):
            from timetuning_tpu.native import build_clip_pack

            plain = make_loader(
                cfg.dataset, num_clip_frames=cfg.num_frames,
                batch_size=cfg.batch_size, root=cfg.data_root,
                decode_size=cfg.decode_size, fast_decode=cfg.fast_decode,
            )
            t0 = time.time()
            build_clip_pack(plain.dataset, cfg.pack_path)
            logger.info("clip pack built at %s in %.1fs",
                        cfg.pack_path, time.time() - t0)
        if jax.process_count() > 1:
            # All hosts need the pack before opening it. Participation must
            # be UNconditional on the existence probe: a host arriving after
            # the build finished would otherwise skip the barrier and pair
            # host 0's barrier psum with its first training collective
            # (hang / mismatched collective).
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("clip_pack_built")
    loader = make_loader(
        cfg.dataset,
        num_clip_frames=cfg.num_frames,
        batch_size=cfg.batch_size,
        regular_step=cfg.regular_step,
        sampling_mode=SamplingMode.UNIFORM,
        shuffle=True,
        num_workers=cfg.num_workers,
        root=cfg.data_root,
        decode_size=cfg.decode_size,
        world_size=jax.process_count(),
        rank=jax.process_index(),
        pack_path=cfg.pack_path,
        fast_decode=cfg.fast_decode,
        seed=cfg.seed,
        # the SSL loss never reads annotations; decoding their palette PNGs
        # costs ~25x the packed frame gather (data/datasets.py note)
        load_annotations=False,
    )
    if len(loader) == 0:
        # max(len, 1) below would otherwise mask this: every epoch runs ZERO
        # optimization steps ("loss None") while evals still fire — a config
        # mistake (batch_size > videos) that should fail loudly, not no-op
        raise ValueError(
            f"dataset '{cfg.dataset}' at {cfg.data_root} yields no batches "
            f"at batch_size={cfg.batch_size} — fewer videos than the batch; "
            "lower --batch_size"
        )
    steps_per_epoch = len(loader)
    if cfg.max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, cfg.max_steps_per_epoch)

    tcfg = TimeTConfig(
        n_prototypes=cfg.num_clusters,
        epsilon=cfg.epsilon,
        sinkhorn_iterations=cfg.sinkhorn_iterations,
        n_last_frames=cfg.n_last_frames,
        size_mask_neighborhood=cfg.size_mask_neighborhood,
        topk=cfg.topk,
        use_teacher=cfg.use_teacher,
        use_queue=cfg.use_queue,
        # dp: per-device FIFOs of queue_size/world rows (the reference's
        # per-rank queue); tp/GSPMD: one GLOBAL FIFO in a global program,
        # rounded down to a multiple of dp so its rows shard P('data')
        queue_size=(cfg.queue_size // dp) * dp if tp > 1
        else cfg.queue_size // max(n_dev, 1),
        mask_features=cfg.use_mask,
        axis_name="data" if (mesh is not None and tp == 1) else None,
        world_size=n_dev if (mesh is not None and tp == 1) else 1,
        ema_start=cfg.ema_decay,
        num_epochs=cfg.num_epochs,
        steps_per_epoch=steps_per_epoch,
        spatial_resolution=spatial_res,
        frozen_trunk_blocks=frozen_trunk_split(
            cfg.unfreeze_layers, model.feature_extractor.backbone
        ),
    )
    if cfg.use_queue and tcfg.queue_size <= 0:
        # queue_size//world == 0 would allocate a [0, D] queue that reports
        # itself "ready" (fill 0 >= size 0) from step 1 — training would run
        # "with queue" in the logs while the queue contributes nothing
        raise ValueError(
            f"--queue_size {cfg.queue_size} is smaller than the "
            f"{max(n_dev, 1)}-device world: the per-device FIFO would have "
            "0 rows. Use queue_size >= the device count (the reference "
            "default is 16384)."
        )

    rng = jax.random.PRNGKey(cfg.seed)
    sample = jnp.zeros((1, cfg.input_resolution, cfg.input_resolution, 3))
    params_init = model.init(rng, sample)["params"]
    zero1 = cfg.zero1 and mesh is not None and n_dev > 1
    if cfg.zero1 and not zero1:
        logger.warning(
            "zero1 requested but disabled: it needs >1 device (found %d). "
            "A ZeRO-1 checkpoint can still be resumed here — restore-time "
            "layout sniffing migrates it to the configured tree layout.",
            n_dev,
        )
    opt_kwargs = dict(
        lr=cfg.head_lr,
        backbone_lr=cfg.head_lr / 10,
        num_epochs=cfg.num_epochs,
        steps_per_epoch=steps_per_epoch,
        unfreeze_layers=cfg.unfreeze_layers,
        use_cosine_lr=cfg.lr_scheduler == "CosineAnnealingLR",
    )
    zero1_plan = None
    if zero1:
        if not cfg.opt_over_trainable:
            raise ValueError("zero1=True requires opt_over_trainable=True")
        from timetuning_tpu.core.optimizer import swav_optimizer_zero1

        tx, trainable_mask, zero1_plan = swav_optimizer_zero1(
            params_init, world_size=n_dev, **opt_kwargs
        )
    else:
        tx, trainable_mask = swav_optimizer(
            params_init,
            opt_over_trainable=cfg.opt_over_trainable,
            **opt_kwargs,
        )
    state = init_state(
        model, tcfg, tx, rng, sample,
        pretrained_params=pretrained, params=params_init,
        trainable_mask=trainable_mask if cfg.opt_over_trainable else None,
        zero1_plan=zero1_plan,
    )
    start_epoch = 0
    resume_skip = 0
    if cfg.load_checkpoint:
        try:
            state, start_epoch = load_checkpoint(run_dir, state)
            if zero1 and (
                state.opt_state.adam.mu.shape[0] != zero1_plan.padded
            ):
                # orbax restores SAVED shapes silently even into a
                # same-structure template of different shape — a ZeRO-1
                # checkpoint from a different world size lands here; raise
                # into the sniffing path, which probes candidate worlds
                raise ValueError(
                    f"zero1 checkpoint padding "
                    f"{state.opt_state.adam.mu.shape[0]} != plan "
                    f"{zero1_plan.padded} (different world size)"
                )
            if zero1:
                # a same-padding checkpoint from a DIFFERENT trainable set
                # restores shape-clean here — the fingerprint mismatch
                # raises into the sniffing path below
                from timetuning_tpu.core.optimizer import (
                    validate_zero1_fingerprint,
                )

                validate_zero1_fingerprint(
                    state.opt_state.decay_vec, zero1_plan
                )
                # The lr-group/decay mask vectors are CONFIG, not state —
                # they ride the opt_state only so they shard with the
                # moments. A restored checkpoint must not resurrect stale
                # factors (e.g. a changed backbone_lr): rebake from the
                # current plan, like the tree layouts do implicitly.
                state = state.replace(
                    opt_state=state.opt_state._replace(
                        lr_vec=jnp.asarray(zero1_plan.lr_vec),
                        decay_vec=jnp.asarray(zero1_plan.decay_vec),
                    )
                )
        except Exception as layout_err:
            # Layout sniffing: the checkpoint was written with a *different*
            # opt_state layout. Restore into a template of each candidate
            # layout, normalize to the trainable-subtree interchange form,
            # then convert to the configured layout — every conversion is
            # exact, so the trajectory continues unchanged:
            #   * full-tree ↔ trainable-subtree (frozen-leaf Adam moments
            #     are provably zero);
            #   * trainable-subtree ↔ ZeRO-1 flat vectors (same leaves,
            #     deterministic ravel order) — including ZeRO-1 checkpoints
            #     written at a DIFFERENT world size (their padding differs,
            #     so candidate worlds are probed by template shape).
            from timetuning_tpu.core.optimizer import (
                migrate_opt_state,
                migrate_subtree_to_zero1,
                migrate_zero1_to_subtree,
                swav_optimizer_zero1,
            )

            def restore_tree(over_trainable: bool):
                alt_tx, _ = swav_optimizer(
                    params_init, opt_over_trainable=over_trainable,
                    **opt_kwargs,
                )
                alt_state = init_state(
                    model, tcfg, alt_tx, rng, sample,
                    pretrained_params=pretrained, params=params_init,
                    trainable_mask=trainable_mask if over_trainable else None,
                )
                st, ep = load_checkpoint(run_dir, alt_state)
                sub = (
                    st.opt_state if over_trainable
                    else migrate_opt_state(
                        st.opt_state, st.params, trainable_mask,
                        to_subtree=True,
                    )
                )
                return st, ep, sub

            def restore_zero1(z_plan):
                from timetuning_tpu.core.optimizer import zero1_tx

                z_state = init_state(
                    model, tcfg, zero1_tx(z_plan), rng, sample,
                    pretrained_params=pretrained, params=params_init,
                    trainable_mask=trainable_mask, zero1_plan=z_plan,
                )
                st, ep = load_checkpoint(run_dir, z_state)
                if st.opt_state.adam.mu.shape[0] != z_plan.padded:
                    # orbax ignores template shapes — discriminate paddings
                    raise ValueError("padded length mismatch")
                sub = migrate_zero1_to_subtree(
                    st.opt_state, st.params, trainable_mask, plan=z_plan
                )
                return st, ep, sub

            candidates = []
            if zero1:
                candidates += [
                    ("trainable-subtree", lambda: restore_tree(True)),
                    ("full-tree", lambda: restore_tree(False)),
                ]
            else:
                other = not cfg.opt_over_trainable
                candidates.append((
                    "trainable-subtree" if other else "full-tree",
                    lambda: restore_tree(other),
                ))
            # ZeRO-1 template: the saved padded length is readable from
            # orbax array METADATA (shapes only), so the template is built
            # exactly — a checkpoint from ANY world size restores. Fallback
            # when metadata is unreadable: probe a few worlds, deduped by
            # the padding they produce (many worlds share one).
            from timetuning_tpu.core.checkpoint import saved_zero1_padding
            from timetuning_tpu.core.optimizer import zero1_plan_with_padding

            def base_plan():
                if zero1_plan is not None:
                    return zero1_plan
                return swav_optimizer_zero1(
                    params_init, world_size=1, **opt_kwargs
                )[2]

            z_padded = saved_zero1_padding(run_dir)
            if z_padded is not None:
                candidates.append((
                    f"ZeRO-1(padded={z_padded})",
                    lambda: restore_zero1(
                        zero1_plan_with_padding(base_plan(), z_padded)
                    ),
                ))
            else:
                plan0 = base_plan()
                tried = {zero1_plan.padded} if zero1 else set()
                paddings = []
                for w in (n_dev, 1, 2, 3, 4, 8, 16, 32, 64):
                    p = pad_to_multiple(plan0.length, w)
                    if p not in tried and p >= plan0.length:
                        tried.add(p)
                        paddings.append(p)
                for p in paddings:
                    candidates.append((
                        f"ZeRO-1(padded={p})",
                        lambda p=p: restore_zero1(
                            zero1_plan_with_padding(plan0, p)
                        ),
                    ))

            failures = []
            for from_layout, attempt in candidates:
                try:
                    alt_state, start_epoch, sub_opt = attempt()
                    break
                except Exception as cand_err:
                    failures.append((from_layout, cand_err))
                    continue
            else:
                # no layout restores: not a layout problem (corrupt file,
                # I/O error, incompatible model) — surface the ORIGINAL
                # failure, with each candidate's error in the log so a
                # matched-layout-but-failed-migration diagnosis (e.g.
                # 'different trainable set') is not hidden
                for fl, e in failures:
                    logger.info("restore candidate %s failed: %s", fl, e)
                raise layout_err

            if zero1:
                new_opt = migrate_subtree_to_zero1(sub_opt, zero1_plan)
                to_layout = "ZeRO-1"
            elif cfg.opt_over_trainable:
                new_opt = sub_opt
                to_layout = "trainable-subtree"
            else:
                new_opt = migrate_opt_state(
                    sub_opt, alt_state.params, trainable_mask,
                    to_subtree=False,
                )
                to_layout = "full-tree"
            state = alt_state.replace(opt_state=new_opt)
            logger.info(
                "checkpoint used the %s opt_state layout — converted to the "
                "configured %s layout at restore", from_layout, to_layout,
            )
        # A mid-epoch checkpoint (checkpoint_every_steps / preemption) holds
        # step > start_epoch·steps_per_epoch: fast-forward the first resumed
        # epoch past the already-consumed batches (the shuffle is keyed by
        # (seed, epoch), so the skipped prefix is exactly what was trained)
        # instead of replaying them — replay would double-apply optimizer/EMA
        # updates and overrun the cosine schedules.
        from timetuning_tpu.core.checkpoint import load_checkpoint_meta

        _meta_r = load_checkpoint_meta(run_dir) or {}
        if _meta_r.get("steps_per_epoch") == steps_per_epoch:
            resume_skip = min(
                max(0, int(state.step) - start_epoch * steps_per_epoch),
                steps_per_epoch,
            )
        else:
            # the batching changed since the save (different batch size /
            # world / dataset) or the checkpoint predates the sidecar: the
            # consumed-batch count is not meaningful under the new
            # partition — restart the epoch instead of mis-skipping
            resume_skip = 0

    if cfg.load_checkpoint and cfg.use_queue and state.queue is not None:
        from timetuning_tpu.core.checkpoint import load_checkpoint_meta

        want_rows = tcfg.queue_size * max(tcfg.world_size, 1)
        # The queue is FIFO state partitioned (world, rows/device); any
        # re-partitioning scrambles which rows queue_fill marks valid —
        # power-of-two world changes can even keep the TOTAL row count
        # identical while halving each device's FIFO, so shape alone
        # cannot detect it. The sidecar meta records the exact partition;
        # checkpoints written before the sidecar fall back to the
        # row-count check.
        meta = load_checkpoint_meta(run_dir)
        repartitioned = meta is not None and (
            meta.get("queue_rows_per_device") != tcfg.queue_size
            or meta.get("world_size") != max(tcfg.world_size, 1)
        )
        if state.queue.shape[0] != want_rows or repartitioned:
            # It holds unordered feature samples, so reset and let it
            # refill (~queue_size/(B·10) steps) rather than guessing a
            # re-sharding.
            logger.warning(
                "feature queue reset on restore: checkpoint has %s, this "
                "run needs %d device(s) x %d rows — it refills during "
                "training",
                (f"{meta.get('world_size')} device(s) x "
                 f"{meta.get('queue_rows_per_device')} rows" if meta
                 else f"{state.queue.shape[0]} total rows (no sidecar "
                      "meta)"),
                max(tcfg.world_size, 1), tcfg.queue_size,
            )
            state = state.replace(
                queue=jnp.zeros(
                    (want_rows, state.queue.shape[1]), state.queue.dtype
                ),
                queue_fill=jnp.zeros((), jnp.int32),
            )

    if tp > 1:
        # place the (fresh or restored) state under the Megatron shardings;
        # the GSPMD step keeps them on its outputs. On pods the placement
        # goes through make_array_from_callback (every process holds the
        # identical full value — same init seeds or same restored host
        # checkpoint).
        from timetuning_tpu.parallel.tp import (
            put_state_global,
            timet_state_shardings,
        )

        state = put_state_global(state, timet_state_shardings(state, mesh))

    aug_cfg = AugmentConfig(out_size=cfg.input_resolution)
    step_fn = make_full_step(model, tcfg, tx, aug_cfg, mesh, state_like=state,
                             trainable_mask=trainable_mask,
                             opt_over_trainable=cfg.opt_over_trainable,
                             zero1_plan=zero1_plan)

    evaluator = None
    if cfg.pascal_root:
        from timetuning_tpu.data.pascal import pascal_loader

        eval_res = default_eval_resolution(cfg)
        eval_loader = pascal_loader(
            60, cfg.pascal_root, "val", eval_res, cfg.input_resolution
        )

        from functools import partial

        @partial(jax.jit, static_argnames=("want_attention",))
        def feature_fn_jit(params, frames_u8, want_attention=False):
            x = eval_preprocess_batch(
                frames_u8, out_size=cfg.input_resolution, std=IMAGENET_STD
            )
            feats, attn = model.apply(
                {"params": params}, x, use_head=False,
                want_attention=want_attention,
            )
            return feats, attn

        def make_feature_fn(params):
            def fn(frames, want_attention=False):
                # propagate the flag — Evaluator's use_mask path needs the
                # last-layer attention for FG masking
                return feature_fn_jit(
                    params, jnp.asarray(frames), want_attention=bool(want_attention)
                )
            return fn

        evaluator_factory = lambda params: Evaluator(  # noqa: E731
            data_iter_factory=lambda: iter(eval_loader),
            feature_fn=make_feature_fn(params),
            spatial_resolution=spatial_res,
            num_classes=cfg.eval_num_clusters,
            involve_bg=True,
            # the reference trainer hands uvos_flag to its Evaluator
            # (time_tuning.py:602) — it only bites on the frame-/sample-wise
            # protocols, which binarize annotations under it
            uvos=cfg.uvos,
            ignore_index=255,
            logger=logger,
        )
    else:
        evaluator_factory = None

    # Preemption handling (beyond reference — SURVEY.md §5.3 notes the
    # reference has none): on SIGTERM, finish the in-flight step, write a
    # full checkpoint and exit cleanly so `--load_checkpoint` resumes.
    preempt = {"flag": False}
    prev_handler = None
    if cfg.handle_preemption:
        import signal
        import threading

        if threading.current_thread() is threading.main_thread():
            prev_handler = signal.signal(
                signal.SIGTERM, lambda *_: preempt.update(flag=True)
            )

    def _finish(preempted: bool = False):
        if prev_handler is not None:
            import signal

            signal.signal(signal.SIGTERM, prev_handler)
        writer.close()
        return {
            "run_dir": run_dir,
            "final_loss": last_loss,
            "best_score": best_score,
            "last_eval": last_eval,
            "global_step": global_step,
            "state": state,
            "preempted": preempted,
        }

    # double-buffered host→device prefetch: upload batch N+1 while batch N
    # computes (device_put is async). On a mesh, put each per-device shard
    # directly where it belongs instead of staging on device 0.
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_sharding = NamedSharding(mesh, P("data"))
    else:
        batch_sharding = devices[0]

    from timetuning_tpu.data.loader import host_batch_to_device

    def to_device(batch):
        frames = host_batch_to_device(
            np.ascontiguousarray(batch[0]), batch_sharding
        )
        sizes = getattr(batch, "orig_sizes", None)
        if sizes is not None:
            sizes = host_batch_to_device(
                np.ascontiguousarray(sizes), batch_sharding
            )
        gmeans = getattr(batch, "gray_means", None)
        if gmeans is None:
            # NaN = "no native mean recorded" (legacy pack): the kernel
            # falls back to the buffer mean inside the same traced program
            gmeans = np.full(batch[0].shape[:2], np.nan, np.float32)
        gmeans = host_batch_to_device(
            np.ascontiguousarray(gmeans), batch_sharding
        )
        return frames, sizes, gmeans

    global_step = int(state.step)
    # Per-step keys are a pure function of (seed, global_step), not a
    # sequentially-split host stream: a resumed run (global_step restored
    # from state.step) then consumes exactly the keys the uninterrupted run
    # would have at the same steps — the host PRNG needs no checkpointing
    # or fast-forwarding. fold_in(0x57e9) forks the stream away from the
    # init rng so step keys never collide with model.init's.
    step_rng = jax.random.fold_in(rng, 0x57E9)
    best_score = -1.0
    if cfg.load_checkpoint:
        # best-so-far rides the meta sidecar: without it, the first
        # post-resume eval always re-exports a spurious new "best"
        from timetuning_tpu.core.checkpoint import load_checkpoint_meta

        _meta0 = load_checkpoint_meta(run_dir)
        if _meta0 and "best_score" in _meta0:
            best_score = float(_meta0["best_score"])
    last_eval = None
    last_loss = None
    mem_reported = False   # one-time device-memory report (first step)
    diag_scores_fn = None  # built lazily, once (log_histograms)
    # Sidecar meta (checkpoint_meta.json): the exact queue partition and
    # opt_state layout — restore uses it to detect re-partitioned state
    # (shape heuristics miss power-of-two world changes).
    ckpt_meta = {
        "world_size": max(tcfg.world_size, 1),
        "queue_rows_per_device": tcfg.queue_size,
        "tensor_parallel": tp,
        "opt_layout": "zero1" if zero1 else (
            "trainable-subtree" if cfg.opt_over_trainable else "full-tree"
        ),
        "best_score": best_score,
        # resume-skip is only meaningful while the batching is unchanged
        "steps_per_epoch": steps_per_epoch,
    }
    for epoch in range(start_epoch, cfg.num_epochs):
        save_checkpoint(state, run_dir, epoch, meta=ckpt_meta)
        loader.set_epoch(epoch)
        do_eval = (
            evaluator_factory is not None and epoch % cfg.eval_every == 0
            # Resuming a mid-epoch checkpoint must NOT re-run this epoch's
            # top-of-epoch eval: the params already include the trained
            # prefix of the epoch, so the score is one the uninterrupted
            # run never produces — it would write a duplicate
            # Scores/localization point at this epoch and could export a
            # spurious new "best". The uninterrupted run's eval for this
            # epoch already happened before the preemption.
            and not (epoch == start_epoch and resume_skip > 0)
        )
        eval_params = None
        if do_eval:
            # On pods the post-step params are GLOBAL arrays (sharded over
            # every host's devices); the eval itself is a process-0-only
            # local computation, so pull them to host first — feeding a
            # multi-process array into a single-process jit raises (or
            # deadlocks the other hosts). dp-replicated params device_get
            # locally; model-sharded params (tensor_parallel on pods) need
            # the process_allgather COLLECTIVE, which every process joins.
            if jax.process_count() > 1 and tp > 1:
                from timetuning_tpu.parallel.tp import gather_global_params

                eval_params = gather_global_params(state.params)
            elif jax.process_count() > 1:
                eval_params = (
                    jax.device_get(state.params)
                    if jax.process_index() == 0 else None
                )
            else:
                eval_params = state.params
        if do_eval and jax.process_index() == 0:
            score = evaluator_factory(eval_params).evaluate(
                many_to_one=cfg.many_to_one,
                evaluation_protocol=cfg.evaluation_protocol,
                eval_resolution=eval_res,
                num_clusters=cfg.eval_num_clusters,
                use_mask=cfg.use_mask,
                precision_based=cfg.precision_based,
                streaming=cfg.streaming_eval,
            )
            writer.scalar("Scores/localization", score, epoch)
            last_eval = score
            if cfg.log_histograms:
                if diag_scores_fn is None:
                    diag_scores_fn = make_diagnostics_scores_fn(
                        model, cfg.input_resolution
                    )
                log_training_diagnostics(
                    diag_scores_fn, eval_params, eval_loader, writer,
                    run_dir, epoch, cfg, spatial_res,
                )
            if score > best_score:
                best_score = score
                ckpt_meta["best_score"] = best_score
                export_best(eval_params, run_dir, score, epoch)

        t0 = time.time()
        skip = resume_skip if epoch == start_epoch else 0
        if skip:
            loader.skip_next_batches(skip)
            logger.info(
                "resuming epoch %d at batch %d (mid-epoch checkpoint)",
                epoch, skip,
            )
        pending = None  # (step, metrics) — logged one step late so the
        # host never blocks on the in-flight device step (async dispatch)
        for bi, (frames_dev, sizes_dev, gmeans_dev) in enumerate(
            device_prefetch(loader, to_device)
        ):
            if cfg.max_steps_per_epoch and bi + skip >= cfg.max_steps_per_epoch:
                break
            key = jax.random.fold_in(step_rng, global_step)
            state, metrics = step_fn(
                state, frames_dev, sizes_dev, gmeans_dev, key
            )
            global_step += 1
            if not mem_reported and jax.process_index() == 0:
                # One-time device-memory report after this run's first step
                # (also fires on resumed runs). Sync the in-flight step
                # first — dispatch is async, so reading stats immediately
                # would race the step's own allocations; memory_stats() is
                # None on backends without it.
                mem_reported = True
                jax.block_until_ready(metrics["loss"])
                stats = jax.local_devices()[0].memory_stats() or {}
                if "bytes_in_use" in stats:
                    gib = 1024 ** 3
                    logger.info(
                        "device memory after step %d: %.2f GiB in use, "
                        "%.2f GiB peak",
                        global_step,
                        stats["bytes_in_use"] / gib,
                        stats.get("peak_bytes_in_use", 0) / gib,
                    )
                    writer.scalar(
                        "Memory/bytes_in_use", float(stats["bytes_in_use"]),
                        global_step,
                    )
            if pending is not None and jax.process_index() == 0:
                pstep, pmetrics = pending
                last_loss = float(pmetrics["loss"])
                writer.scalar("Loss/train", last_loss, pstep)
                writer.scalar("momentum", float(pmetrics["momentum"]), pstep)
            pending = (global_step, metrics)
            # mid-epoch actions (these sync the in-flight step, which is
            # exactly what a durable save needs)
            if (
                cfg.checkpoint_every_steps
                and global_step % cfg.checkpoint_every_steps == 0
            ):
                save_checkpoint(state, run_dir, epoch, meta=ckpt_meta)
            # Preemption: single-host acts on the local flag immediately.
            # Multi-host must NOT — the mid-epoch save's _to_host allgather
            # of non-addressable leaves is a COLLECTIVE, and SIGTERM may
            # reach one host first (or only one), which would park that
            # host in the allgather while the others keep training. All
            # processes instead agree on max(flag) at a fixed step cadence
            # (bi is aligned across processes: equal per-rank loader
            # counts), so every host stops at the same step. ~ms every 20
            # steps; SIGTERM grace windows are tens of seconds.
            preempt_now = preempt["flag"]
            if jax.process_count() > 1:
                preempt_now = False
                if (bi % 20) == 0:
                    from jax.experimental import multihost_utils

                    preempt_now = bool(
                        np.max(multihost_utils.process_allgather(
                            np.asarray(preempt["flag"], np.int32)
                        ))
                    )
            if preempt_now:
                pstep, pmetrics = pending
                last_loss = float(pmetrics["loss"])
                if jax.process_index() == 0:
                    writer.scalar("Loss/train", last_loss, pstep)
                    writer.scalar("momentum", float(pmetrics["momentum"]), pstep)
                save_checkpoint(state, run_dir, epoch, meta=ckpt_meta)
                logger.info(
                    "preemption signal — checkpoint saved at step %d "
                    "(epoch %d); resume with --load_checkpoint",
                    global_step, epoch,
                )
                return _finish(preempted=True)
        if pending is not None:
            pstep, pmetrics = pending
            last_loss = float(pmetrics["loss"])
            if jax.process_index() == 0:
                writer.scalar("Loss/train", last_loss, pstep)
                writer.scalar("momentum", float(pmetrics["momentum"]), pstep)
        logger.info(
            "epoch %d done in %.1fs (loss %s)", epoch, time.time() - t0, last_loss
        )

    # final save: the loop's epoch-top saves never persist the LAST epoch's
    # training (a resume would silently retrain it); epoch=num_epochs marks
    # every epoch trained, so a same-config resume is a no-op
    save_checkpoint(state, run_dir, cfg.num_epochs, meta=ckpt_meta)
    return _finish()
