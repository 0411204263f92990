"""Multi-device queue semantics (reference per-rank queue, time_tuning.py:617-618).

Each device must keep its own ``queue_size``-row FIFO of locally-extracted
teacher features (the reference divides ``queue_size`` by world size and each
rank maintains its slice, time_tuning.py:618, :250-261). Under ``shard_map``
this means the queue leaf is sharded ``P('data')`` — replicating it would
silently keep one device's queue and discard the rest.

Two properties are proven on an 8-virtual-device CPU mesh:

1. **Loss/param equivalence**: a dp step with a *ready* queue equals the
   single-device step on the concatenated batch with the concatenated queue —
   because the psum'd Sinkhorn statistics make the transport plan global over
   (all shards' batches) ∪ (all shards' queues), exactly the single-device
   row set.
2. **Queue content**: after the step, shard *d* of the global queue equals
   the FIFO update computed from device *d*'s local first-frame teacher
   features — i.e. every device's stored features survive.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from timetuning_tpu.core.optimizer import swav_optimizer
from timetuning_tpu.core.timet import (
    TimeT,
    TimeTConfig,
    TrainState,
    init_state,
    make_train_step,
    state_partition_specs,
)
from timetuning_tpu.models.extractor import FeatureExtractor
from timetuning_tpu.models.vit import ViTConfig, VisionTransformer

IMG, PATCH = 32, 8
RES = IMG // PATCH
N = RES * RES  # 16 patches
F = 3
Q_LOCAL = 8


def _build(world, queue_size, img=IMG):
    vcfg = ViTConfig(patch_size=PATCH, embed_dim=32, depth=2, num_heads=2,
                     img_size=img, attn_impl="xla")
    fe = FeatureExtractor(backbone=VisionTransformer(vcfg), head_dims=(48, 24))
    model = TimeT(feature_extractor=fe, n_prototypes=8)
    cfg = TimeTConfig(
        n_prototypes=8, use_teacher=True, use_queue=True,
        queue_size=queue_size, num_epochs=2, steps_per_epoch=4,
        spatial_resolution=img // PATCH, n_last_frames=2,
        size_mask_neighborhood=1,
        axis_name="data" if world > 1 else None, world_size=world,
    )
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, img, img, 3))
    params = model.init(rng, sample)["params"]
    tx, _ = swav_optimizer(params, lr=1e-3, num_epochs=2, steps_per_epoch=4,
                           unfreeze_layers=("blocks.1",))
    state = init_state(model, cfg, tx, rng, sample)
    step = make_train_step(model, cfg, tx)
    return model, cfg, tx, state, step


def test_dp_with_queue_matches_single_device():
    """dp step with a READY queue == single-device step on the concatenated
    batch + queue.

    The step inserts the current batch's first-frame features into the FIFO
    BEFORE the Sinkhorn (reference time_tuning.py:250-268), and insertion
    SELECTION is random per program — so exact equivalence needs a geometry
    where the inserted rows cover the WHOLE first-frame feature pool
    deterministically: 16×16 images at patch 8 give N=4 patches per frame,
    so pool/device = b_local·N = 8 = Q_LOCAL = n_store (and globally
    64 = Q_LOCAL·n_dev = n_store_single). Both programs then hold the same
    row SET (permuted), and the psum'd Sinkhorn statistics are row-order
    invariant."""
    n_dev = jax.device_count()
    assert n_dev >= 2
    img = 16                       # N = (16/8)² = 4 patches per frame
    b_local = 2
    b_global = b_local * n_dev
    clip = jnp.asarray(
        np.random.default_rng(3).normal(size=(b_global, F, img, img, 3)),
        jnp.float32,
    )
    # Shared pre-filled queue content: the single-device queue is the
    # concatenation of the per-device local queues. (Entirely displaced by
    # the in-step insertion in BOTH programs — pool == FIFO size.)
    queue0 = jnp.asarray(
        np.random.default_rng(4).normal(size=(Q_LOCAL * n_dev, 24)), jnp.float32
    )
    rng = jax.random.PRNGKey(9)

    # --- sharded run ------------------------------------------------------
    model, cfg_m, tx, state_m, step_m = _build(
        world=n_dev, queue_size=Q_LOCAL, img=img
    )
    assert min(b_local * 10, Q_LOCAL) == b_local * 4  # insertion == pool
    state_m = state_m.replace(
        queue=queue0, queue_fill=jnp.asarray(Q_LOCAL, jnp.int32)
    )
    mesh = Mesh(np.array(jax.devices()), ("data",))
    specs = state_partition_specs(state_m, "data")
    assert specs.queue == P("data") and specs.step == P()
    shard_step = jax.jit(
        jax.shard_map(
            step_m, mesh=mesh,
            in_specs=(specs, P("data"), P()),
            out_specs=(specs, P()),
        )
    )
    s_shard, m_shard = shard_step(state_m, clip, rng)

    # --- single-device run on the concatenated batch + queue ---------------
    _, cfg_s, _, state_s, step_s = _build(
        world=1, queue_size=Q_LOCAL * n_dev, img=img
    )
    state_s = state_s.replace(
        queue=queue0, queue_fill=jnp.asarray(Q_LOCAL * n_dev, jnp.int32)
    )
    s_single, m_single = jax.jit(step_s)(state_s, clip, rng)
    # both queues hold the same row set: every global first-frame feature
    feats, _ = model.apply(
        {"params": state_s.teacher_params}, clip[:, 0], use_head=True
    )
    pool = np.sort(np.asarray(feats).reshape(-1, 24), axis=0)
    np.testing.assert_allclose(
        np.sort(np.asarray(s_shard.queue), axis=0), pool, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(s_single.queue), axis=0), pool, rtol=1e-4, atol=1e-5
    )

    np.testing.assert_allclose(
        float(m_shard["loss"]), float(m_single["loss"]), rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(s_shard.params["prototypes"]),
        np.asarray(s_single.params["prototypes"]),
        rtol=1e-3, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s_shard.params["feature_extractor"]["head"]["lin0"]["kernel"]),
        np.asarray(s_single.params["feature_extractor"]["head"]["lin0"]["kernel"]),
        rtol=1e-3, atol=1e-5,
    )


def test_per_device_queue_content():
    """Shard d of the post-step queue == FIFO update from device d's local
    teacher features — no device's contribution is discarded."""
    n_dev = jax.device_count()
    b_local = 2
    b_global = b_local * n_dev
    clip = jnp.asarray(
        np.random.default_rng(5).normal(size=(b_global, F, IMG, IMG, 3)),
        jnp.float32,
    )
    rng = jax.random.PRNGKey(11)

    model, cfg, tx, state, step = _build(world=n_dev, queue_size=Q_LOCAL)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    specs = state_partition_specs(state, "data")
    shard_step = jax.jit(
        jax.shard_map(
            step, mesh=mesh,
            in_specs=(specs, P("data"), P()),
            out_specs=(specs, P()),
        )
    )
    new_state, _ = shard_step(state, clip, rng)
    queue = np.asarray(new_state.queue)          # [n_dev * Q_LOCAL, 24]
    assert queue.shape[0] == n_dev * Q_LOCAL
    # n_store = min(b_local*10, Q_LOCAL) = Q_LOCAL → the whole local FIFO is
    # replaced by a random selection of local first-frame teacher features.
    n_store = min(b_local * 10, Q_LOCAL)
    assert n_store == Q_LOCAL

    def expected_shard(d):
        first = clip[d * b_local:(d + 1) * b_local, 0]
        feats, _ = model.apply({"params": state.teacher_params}, first,
                               use_head=True)
        flat = feats.reshape(-1, feats.shape[-1])
        idx = jax.random.permutation(rng, flat.shape[0])[:n_store]
        return np.asarray(flat[idx])

    for d in range(n_dev):
        np.testing.assert_allclose(
            queue[d * Q_LOCAL:(d + 1) * Q_LOCAL], expected_shard(d),
            rtol=1e-4, atol=1e-5,
        )
    # and the shards are genuinely distinct per device
    assert not np.allclose(queue[:Q_LOCAL], queue[Q_LOCAL:2 * Q_LOCAL])
    assert int(new_state.queue_fill) == Q_LOCAL
