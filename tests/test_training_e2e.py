"""End-to-end training on a synthetic DAVIS tree with a tiny ViT —
the full driver path: loader → fused augmentation → TimeT step →
checkpoint → resume (SURVEY.md §4 integration seam)."""

import json
import os

import numpy as np
import pytest  # noqa: F401

cv2 = pytest.importorskip("cv2")

from timetuning_tpu.core.train import TrainingConfig, run_training


@pytest.fixture(scope="module")
def davis_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("davis_e2e")
    frames = root / "JPEGImages" / "480p"
    rng = np.random.default_rng(0)
    for v in range(4):
        fdir = frames / f"video{v}"
        fdir.mkdir(parents=True)
        for f in range(6):
            img = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
            cv2.imwrite(str(fdir / f"{f:05d}.jpg"), img)
    return str(root)


def _cfg(davis_tree, tmp_path, **kw):
    base = dict(
        architecture="vit-tiny-test",
        dataset="davis",
        data_root=davis_tree,
        pascal_root=None,
        log_dir=str(tmp_path / "logs"),
        batch_size=2,
        num_epochs=2,
        num_frames=3,
        num_workers=2,
        num_clusters=8,
        input_resolution=32,
        n_last_frames=2,
        size_mask_neighborhood=1,
        decode_size=48,
        head_dims=(16, 8),
        unfreeze_layers=("blocks.1",),
        compute_dtype="float32",
        use_queue=True,
        queue_size=64,
        max_steps_per_epoch=2,
        use_tensorboard=False,
        num_devices=2,  # exercise the shard_map path with batch 2
    )
    base.update(kw)
    return TrainingConfig(**base)


def test_training_runs_and_checkpoints(davis_tree, tmp_path):
    cfg = _cfg(davis_tree, tmp_path)
    result = run_training(cfg)
    assert result["final_loss"] is not None
    assert np.isfinite(result["final_loss"])
    assert result["global_step"] == 4  # 2 epochs × 2 steps
    run_dir = result["run_dir"]
    assert os.path.exists(os.path.join(run_dir, "checkpoint"))
    assert os.path.exists(os.path.join(run_dir, "config.txt"))
    lines = open(os.path.join(run_dir, "metrics.jsonl")).read().splitlines()
    tags = {json.loads(l)["tag"] for l in lines}
    assert "Loss/train" in tags and "momentum" in tags


@pytest.fixture(scope="module")
def voc_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc_e2e")
    (root / "images").mkdir()
    (root / "SegmentationClass").mkdir()
    (root / "sets").mkdir()
    rng = np.random.default_rng(0)
    names = [f"p{i}" for i in range(4)]
    for n in names:
        img = np.full((48, 48, 3), 30, np.uint8)
        mask = np.zeros((48, 48), np.uint8)
        img[10:34, 10:34] = [210, 50, 50]
        mask[10:34, 10:34] = 1
        cv2.imwrite(str(root / "images" / f"{n}.jpg"), img[..., ::-1])
        cv2.imwrite(str(root / "SegmentationClass" / f"{n}.png"), mask)
    (root / "sets" / "val.txt").write_text("\n".join(names))
    return str(root)


def test_training_with_pascal_eval(davis_tree, voc_tree, tmp_path):
    """The in-training eval loop: Scores/localization logged + best export
    (reference time_tuning.py:634-645)."""
    cfg = _cfg(
        davis_tree, tmp_path, pascal_root=voc_tree, eval_every=1,
        eval_resolution=16, eval_num_clusters=2, num_epochs=1,
    )
    result = run_training(cfg)
    assert result["last_eval"] is not None
    assert 0.0 <= result["last_eval"] <= 1.0
    assert result["best_score"] == result["last_eval"]
    lines = open(os.path.join(result["run_dir"], "metrics.jsonl")).read()
    assert "Scores/localization" in lines
    # best-model export directory exists
    exports = [d for d in os.listdir(result["run_dir"]) if d.endswith("_0")]
    assert exports, os.listdir(result["run_dir"])


def test_training_resume(davis_tree, tmp_path):
    cfg = _cfg(davis_tree, tmp_path)
    r1 = run_training(cfg)
    cfg2 = _cfg(davis_tree, tmp_path, load_checkpoint=True, num_epochs=3)
    r2 = run_training(cfg2)
    # resumed from the saved epoch-1 checkpoint (saved before epoch 1 ran),
    # so it continues rather than restarting from scratch
    assert r2["run_dir"] == r1["run_dir"]
    assert r2["global_step"] > 0


def test_resume_matches_uninterrupted_run(davis_tree, tmp_path, monkeypatch):
    """A preempted-then-resumed run must reproduce the uninterrupted
    run's remaining step-for-step loss trajectory EXACTLY: step keys are
    a pure function of (seed, global_step) rather than a sequentially-
    split host stream, batches are (seed, epoch)-keyed with the consumed
    prefix fast-forwarded, and queue/EMA/optimizer state rides the
    checkpoint bit-exactly — so no host PRNG needs checkpointing
    (core/train.py step_rng contract; the reference torch path has no
    such guarantee). The interruption is deterministic: SIGTERM is
    raised from the periodic save at global step 3 (mid-epoch-1), so the
    resume exercises the mid-epoch skip path, not just the epoch top."""
    import signal

    from timetuning_tpu.core import train as train_mod

    def losses(run_dir):
        rows = [json.loads(l)
                for l in open(os.path.join(run_dir, "metrics.jsonl"))]
        return {r["step"]: r["value"] for r in rows
                if r["tag"] == "Loss/train"}

    ra = run_training(_cfg(davis_tree, tmp_path,
                           log_dir=str(tmp_path / "uninterrupted"),
                           num_epochs=2))

    orig_save = train_mod.save_checkpoint

    def spy(state, run_dir, epoch, meta=None):
        p = orig_save(state, run_dir, epoch, meta=meta)
        if int(state.step) == 3:
            # main thread: the trainer's SIGTERM handler sets the preempt
            # flag, and the in-loop check right after this periodic save
            # stops the run at exactly this step — no timing involved
            signal.raise_signal(signal.SIGTERM)
        return p

    monkeypatch.setattr(train_mod, "save_checkpoint", spy)
    rb1 = run_training(_cfg(davis_tree, tmp_path,
                            log_dir=str(tmp_path / "resumed"),
                            num_epochs=2, checkpoint_every_steps=3))
    monkeypatch.setattr(train_mod, "save_checkpoint", orig_save)
    assert rb1["preempted"] is True and rb1["global_step"] == 3

    rb2 = run_training(_cfg(davis_tree, tmp_path,
                            log_dir=str(tmp_path / "resumed"),
                            num_epochs=2, load_checkpoint=True))
    assert rb2["run_dir"] == rb1["run_dir"]
    assert rb2["preempted"] is False and rb2["global_step"] == 4
    la, lb = losses(ra["run_dir"]), losses(rb2["run_dir"])
    assert {1, 2, 3, 4} <= set(la) and 4 in lb
    assert la[4] == lb[4], (
        f"step 4: uninterrupted loss {la[4]} != resumed loss {lb[4]}"
    )


def test_mid_epoch_resume_skips_duplicate_eval(davis_tree, voc_tree,
                                               tmp_path, monkeypatch):
    """Resuming a mid-epoch checkpoint must NOT re-run that epoch's
    top-of-epoch eval: the restored params already include the epoch's
    trained prefix, so a re-eval would log a duplicate
    Scores/localization point the uninterrupted run never produces and
    could export a spurious 'best' (core/train.py do_eval guard)."""
    import signal

    from timetuning_tpu.core import train as train_mod

    orig_save = train_mod.save_checkpoint

    def spy(state, run_dir, epoch, meta=None):
        p = orig_save(state, run_dir, epoch, meta=meta)
        if int(state.step) == 3:
            signal.raise_signal(signal.SIGTERM)
        return p

    monkeypatch.setattr(train_mod, "save_checkpoint", spy)
    r1 = run_training(_cfg(davis_tree, tmp_path, pascal_root=voc_tree,
                           eval_every=1, eval_resolution=16,
                           eval_num_clusters=2, num_epochs=2,
                           checkpoint_every_steps=3))
    monkeypatch.setattr(train_mod, "save_checkpoint", orig_save)
    assert r1["preempted"] is True and r1["global_step"] == 3

    r2 = run_training(_cfg(davis_tree, tmp_path, pascal_root=voc_tree,
                           eval_every=1, eval_resolution=16,
                           eval_num_clusters=2, num_epochs=2,
                           load_checkpoint=True))
    assert r2["run_dir"] == r1["run_dir"] and r2["global_step"] == 4
    # metrics.jsonl appends across the two runs: epoch 1's eval must
    # appear exactly once (from the pre-preemption run), never re-run
    rows = [json.loads(l)
            for l in open(os.path.join(r2["run_dir"], "metrics.jsonl"))]
    evals = [r["step"] for r in rows if r["tag"] == "Scores/localization"]
    assert evals == [0, 1], f"duplicate/missing top-of-epoch evals: {evals}"


def test_rejects_zero_row_per_device_queue(davis_tree, tmp_path):
    """queue_size below the device world would silently allocate 0-row
    per-device FIFOs that report themselves ready from step 1 — the run
    would log 'with queue' while the queue contributes nothing. The
    driver must refuse up front (core/train.py queue validation)."""
    cfg = _cfg(davis_tree, tmp_path, queue_size=1, num_devices=2)
    with pytest.raises(ValueError, match="queue_size"):
        run_training(cfg)


def test_preemption_saves_and_resumes(davis_tree, tmp_path):
    """SIGTERM mid-training → checkpoint written + clean 'preempted' exit;
    --load_checkpoint resumes from the saved state (SURVEY.md §5.3 — the
    reference has no preemption handling)."""
    import signal
    import threading

    cfg = _cfg(davis_tree, tmp_path, num_epochs=50, max_steps_per_epoch=2)
    timer = threading.Timer(
        6.0, lambda: signal.raise_signal(signal.SIGTERM)
    )
    timer.start()
    try:
        result = run_training(cfg)
    finally:
        timer.cancel()
    assert result["preempted"] is True
    assert result["global_step"] < 100
    run_dir = result["run_dir"]
    assert os.path.exists(os.path.join(run_dir, "checkpoint"))

    # resume: picks up the latest run dir and continues briefly
    cfg2 = _cfg(davis_tree, tmp_path, num_epochs=1, load_checkpoint=True)
    result2 = run_training(cfg2)
    assert result2["preempted"] is False
    assert result2["run_dir"] == run_dir


def test_periodic_mid_epoch_checkpoints(davis_tree, tmp_path, monkeypatch):
    """checkpoint_every_steps must fire MID-epoch, not only at the epoch
    flush: with 2 steps/epoch × 2 epochs and every_steps=3, only the
    mid-epoch-1 save can hold global step 3 (epoch-top saves hold steps
    0/2, the final save holds 4). The step-3 checkpoint is stashed by a
    save spy and restored afterwards to exercise the mid-epoch RESUME
    path (the final save would otherwise supersede it)."""
    import shutil

    from timetuning_tpu.core import train as train_mod
    from timetuning_tpu.core.checkpoint import load_checkpoint

    saves = []
    stash = tmp_path / "step3_stash"
    orig_save = train_mod.save_checkpoint

    def spy(state, run_dir, epoch, meta=None):
        p = orig_save(state, run_dir, epoch, meta=meta)
        saves.append((int(state.step), epoch))
        if int(state.step) == 3:
            shutil.copytree(p, stash / "checkpoint", dirs_exist_ok=True)
            mp = os.path.join(run_dir, "checkpoint_meta.json")
            if os.path.exists(mp):
                shutil.copy2(mp, stash / "checkpoint_meta.json")
        return p

    monkeypatch.setattr(train_mod, "save_checkpoint", spy)
    cfg = _cfg(davis_tree, tmp_path, num_epochs=2, checkpoint_every_steps=3)
    result = run_training(cfg)
    assert result["preempted"] is False
    assert result["global_step"] == 4
    assert (3, 1) in saves, "mid-epoch periodic save did not happen"
    # final save persists the LAST epoch (epoch marker == num_epochs, so a
    # same-config resume is a no-op instead of silently retraining it)
    st, ep = load_checkpoint(result["run_dir"], result["state"])
    assert int(st.step) == 4 and ep == 2
    cfg_noop = _cfg(davis_tree, tmp_path, num_epochs=2, load_checkpoint=True)
    r_noop = run_training(cfg_noop)
    assert r_noop["run_dir"] == result["run_dir"]
    assert r_noop["global_step"] == 4

    # restore the stashed step-3 mid-epoch checkpoint and resume: epoch 1's
    # first batch was already consumed, so the resumed run must SKIP it
    # (replaying would double-apply updates and overrun the schedules)
    shutil.rmtree(os.path.join(result["run_dir"], "checkpoint"))
    shutil.copytree(stash / "checkpoint",
                    os.path.join(result["run_dir"], "checkpoint"))
    shutil.copy2(stash / "checkpoint_meta.json",
                 os.path.join(result["run_dir"], "checkpoint_meta.json"))
    cfg2 = _cfg(davis_tree, tmp_path, num_epochs=2, load_checkpoint=True)
    result2 = run_training(cfg2)
    assert result2["run_dir"] == result["run_dir"]
    assert result2["global_step"] == 4, (
        "mid-epoch resume replayed already-trained batches"
    )


def test_full_tree_optimizer_layout(davis_tree, tmp_path):
    """opt_over_trainable=False restores the full-tree opt_state layout
    (compat escape hatch for checkpoints saved before the subtree layout)
    and trains + resumes end-to-end."""
    cfg = _cfg(davis_tree, tmp_path, num_epochs=1, opt_over_trainable=False)
    r1 = run_training(cfg)
    assert r1["final_loss"] is not None and np.isfinite(r1["final_loss"])
    cfg2 = _cfg(davis_tree, tmp_path, num_epochs=2, load_checkpoint=True,
                opt_over_trainable=False)
    r2 = run_training(cfg2)
    assert r2["run_dir"] == r1["run_dir"]
    assert r2["global_step"] > r1["global_step"]


def test_lr_scheduler_flag_plumbed(davis_tree, tmp_path):
    """Reference semantics (time_tuning.py:383): any value other than
    "CosineAnnealingLR" means constant LR. The flag must reach the
    optimizer (it used to be parsed and dropped)."""
    cfg = _cfg(davis_tree, tmp_path, num_epochs=1, lr_scheduler="StepLR")
    r = run_training(cfg)
    assert np.isfinite(r["final_loss"])
    cfgtxt = open(os.path.join(r["run_dir"], "config.txt")).read()
    assert "lr_scheduler: StepLR" in cfgtxt


def test_cross_layout_checkpoint_migration(davis_tree, tmp_path):
    """A checkpoint written with one opt_state layout resumes into a run
    configured for the other: restore-time layout sniffing converts the
    opt_state (VERDICT r2 weak #5; core/train.py resume path)."""
    # full-tree checkpoint → trainable-subtree run
    cfg = _cfg(davis_tree, tmp_path, num_epochs=1, opt_over_trainable=False)
    r1 = run_training(cfg)
    cfg2 = _cfg(davis_tree, tmp_path, num_epochs=2, load_checkpoint=True,
                opt_over_trainable=True)
    r2 = run_training(cfg2)
    assert r2["run_dir"] == r1["run_dir"]
    assert r2["global_step"] > r1["global_step"]
    assert np.isfinite(r2["final_loss"])

    # trainable-subtree checkpoint → full-tree run (fresh log dir)
    cfg3 = _cfg(davis_tree, tmp_path, num_epochs=1, opt_over_trainable=True,
                log_dir=str(tmp_path / "logs_b"))
    r3 = run_training(cfg3)
    cfg4 = _cfg(davis_tree, tmp_path, num_epochs=2, load_checkpoint=True,
                opt_over_trainable=False, log_dir=str(tmp_path / "logs_b"))
    r4 = run_training(cfg4)
    assert r4["run_dir"] == r3["run_dir"]
    assert r4["global_step"] > r3["global_step"]
    assert np.isfinite(r4["final_loss"])


def test_log_histograms_diagnostics(davis_tree, voc_tree, tmp_path):
    """--log_histograms wires the assignment histogram + entropy scalars and
    the overlay gif artifact into the eval epoch (VERDICT r2 missing #4;
    reference time_tuning.py:433-457, 305-351)."""
    cfg = _cfg(
        davis_tree, tmp_path, pascal_root=voc_tree, eval_every=1,
        eval_resolution=16, eval_num_clusters=2, num_epochs=1,
        log_histograms=True,
    )
    result = run_training(cfg)
    rows = [json.loads(l) for l in
            open(os.path.join(result["run_dir"], "metrics.jsonl"))]
    tags = {r["tag"] for r in rows}
    assert "Scores/entropy" in tags
    hist_rows = [r for r in rows if r["tag"] == "Assignment Histogram"]
    assert hist_rows and sum(hist_rows[0]["histogram"]) > 0
    assert len(hist_rows[0]["histogram"]) == cfg.num_clusters
    art = os.path.join(result["run_dir"], "artifacts")
    gifs = [f for f in os.listdir(art) if f.endswith(".gif")]
    assert gifs, "overlay gif artifact missing"


def test_training_with_pack_path(davis_tree, tmp_path):
    """--pack_path: the driver builds the decode-once clip pack on first use
    and trains through PackedVideoDataset; a second run reuses the existing
    pack. Losses must stay finite and the index must carry native dims (the
    aspect-preserving resize geometry)."""
    pack = str(tmp_path / "train.clippack")
    cfg = _cfg(davis_tree, tmp_path, num_epochs=1, pack_path=pack)
    result = run_training(cfg)
    assert np.isfinite(result["final_loss"])
    assert os.path.exists(pack) and os.path.exists(pack + ".index.json")
    idx = json.load(open(pack + ".index.json"))
    ent = next(iter(idx.values()))
    # (start, n_frames, native_h, native_w, [per-frame gray means])
    assert len(ent) == 5
    assert tuple(ent[2:4]) == (48, 64)
    assert len(ent[4]) == ent[1]
    # second run opens the existing pack (no rebuild): mtime unchanged
    mtime = os.path.getmtime(pack)
    cfg2 = _cfg(davis_tree, tmp_path, num_epochs=1, pack_path=pack,
                log_dir=str(tmp_path / "logs_pack2"))
    result2 = run_training(cfg2)
    assert np.isfinite(result2["final_loss"])
    assert os.path.getmtime(pack) == mtime


def test_training_zero1(davis_tree, tmp_path):
    """--zero1: the driver trains with ZeRO-1 optimizer-state sharding on
    the 2-device mesh (cfg.num_devices=2) and resumes a checkpoint written
    in that layout."""
    cfg = _cfg(davis_tree, tmp_path, num_epochs=1, zero1=True)
    result = run_training(cfg)
    assert np.isfinite(result["final_loss"])
    cfg2 = _cfg(davis_tree, tmp_path, num_epochs=2, zero1=True,
                load_checkpoint=True)
    result2 = run_training(cfg2)
    assert np.isfinite(result2["final_loss"])
    assert result2["global_step"] == 4


def test_zero1_resumes_subtree_checkpoint(davis_tree, tmp_path):
    """A pre-ZeRO-1 (trainable-subtree) checkpoint restores into a zero1
    run through the layout-sniffing migration path."""
    cfg = _cfg(davis_tree, tmp_path, num_epochs=1)
    result = run_training(cfg)
    cfg2 = _cfg(davis_tree, tmp_path, num_epochs=2, zero1=True,
                load_checkpoint=True)
    result2 = run_training(cfg2)
    assert np.isfinite(result2["final_loss"])
    assert result2["global_step"] == 4


def test_zero1_resumes_full_tree_checkpoint(davis_tree, tmp_path):
    """A full-tree-layout checkpoint (opt_over_trainable=False) restores
    into a zero1 run via the exact two-hop full->subtree->ZeRO-1
    migration."""
    cfg = _cfg(davis_tree, tmp_path, num_epochs=1, opt_over_trainable=False)
    run_training(cfg)
    cfg2 = _cfg(davis_tree, tmp_path, num_epochs=2, zero1=True,
                load_checkpoint=True)
    result2 = run_training(cfg2)
    assert np.isfinite(result2["final_loss"])
    assert result2["global_step"] == 4


def test_zero1_checkpoint_resumes_without_zero1(davis_tree, tmp_path):
    """A ZeRO-1 checkpoint (written on the 2-device mesh) restores into a
    run where zero1 is off — including the single-device case where the
    flag silently disables — via the exact zero1->subtree migration."""
    cfg = _cfg(davis_tree, tmp_path, num_epochs=1, zero1=True)
    run_training(cfg)
    # same command on a 1-device box: zero1 auto-disables, checkpoint must
    # still restore through layout sniffing (probing zero1 world=2)
    cfg2 = _cfg(davis_tree, tmp_path, num_epochs=2, zero1=True,
                load_checkpoint=True, num_devices=1)
    result2 = run_training(cfg2)
    assert np.isfinite(result2["final_loss"])
    assert result2["global_step"] == 4


def test_zero1_checkpoint_resumes_at_different_world(davis_tree, tmp_path):
    """A ZeRO-1 checkpoint written at world=2 resumes into a zero1 run at
    world=3 (different padding) via subtree as the interchange layout —
    the saved padded length is read from orbax array metadata, so the
    restore template is exact (no world probing)."""
    cfg = _cfg(davis_tree, tmp_path, num_epochs=1, zero1=True)
    run_training(cfg)
    # world=3 is the one size whose padded length differs for this model
    # (L=13432 divides 1/2/4/8), forcing the cross-padding path
    cfg2 = _cfg(davis_tree, tmp_path, num_epochs=3, zero1=True,
                load_checkpoint=True, num_devices=3, batch_size=3)
    result2 = run_training(cfg2)
    assert np.isfinite(result2["final_loss"])
    # steps_per_epoch shifts with the batch, so the proof of the
    # cross-world migration is the sniffing log line
    log = open(os.path.join(result2["run_dir"], "train.log")).read()
    assert "ZeRO-1(padded=" in log
    assert "configured ZeRO-1 layout" in log


def test_training_tensor_parallel(davis_tree, tmp_path):
    """--tensor_parallel: the driver trains on a (data, model) = (2, 2) mesh
    (GSPMD step, Megatron-sharded backbone + Adam moments, global FIFO
    queue) and resumes its own checkpoint back into the sharded placement."""
    cfg = _cfg(davis_tree, tmp_path, num_epochs=1, num_devices=4,
               tensor_parallel=2)
    result = run_training(cfg)
    assert np.isfinite(result["final_loss"])
    qkv = result["state"].params["feature_extractor"]["backbone"][
        "blocks_0"]["attn"]["qkv"]["kernel"]
    assert {s.data.shape for s in qkv.addressable_shards} == {(32, 48)}
    assert {s.data.shape for s in result["state"].queue.addressable_shards} \
        == {(32, 8)}  # 64 global rows / dp=2, head dim 8
    cfg2 = _cfg(davis_tree, tmp_path, num_epochs=2, num_devices=4,
                tensor_parallel=2, load_checkpoint=True)
    result2 = run_training(cfg2)
    assert np.isfinite(result2["final_loss"])
    assert result2["global_step"] == 4


def test_dp_checkpoint_resumes_under_tensor_parallel(davis_tree, tmp_path):
    """A checkpoint written by the dp/shard_map path restores into a
    tensor-parallel run (same opt_state tree layout, re-placed under the
    Megatron shardings). The queue total matches (64 rows) but the
    partition changed (2x32 per-device FIFOs -> 1x64 global FIFO), which
    the sidecar meta detects — the queue resets rather than letting the
    stale per-device queue_fill mark scrambled rows valid."""
    cfg = _cfg(davis_tree, tmp_path, num_epochs=1)
    run_training(cfg)
    cfg2 = _cfg(davis_tree, tmp_path, num_epochs=2, num_devices=4,
                tensor_parallel=2, load_checkpoint=True)
    result2 = run_training(cfg2)
    assert np.isfinite(result2["final_loss"])
    assert result2["global_step"] == 4
    log = open(os.path.join(result2["run_dir"], "train.log")).read()
    assert "feature queue reset" in log


def test_queue_resets_on_same_total_world_change(davis_tree, tmp_path):
    """Power-of-two world change (2 -> 4 devices) keeps the TOTAL queue
    row count identical (2x32 == 4x16), which the old shape heuristic
    could not see; the sidecar meta detects the re-partition and resets
    the queue instead of letting queue_fill mark half-stale FIFOs full."""
    cfg = _cfg(davis_tree, tmp_path, num_epochs=1)
    run_training(cfg)
    cfg2 = _cfg(davis_tree, tmp_path, num_epochs=2, num_devices=4,
                batch_size=4, load_checkpoint=True)
    result2 = run_training(cfg2)
    assert np.isfinite(result2["final_loss"])
    log = open(os.path.join(result2["run_dir"], "train.log")).read()
    assert "feature queue reset" in log
    assert "2 device(s) x 32 rows" in log and "4 device(s) x 16 rows" in log


def test_tensor_parallel_rejects_zero1(davis_tree, tmp_path):
    with pytest.raises(ValueError, match="mutually exclusive"):
        run_training(_cfg(davis_tree, tmp_path, num_devices=4,
                          tensor_parallel=2, zero1=True))


def test_tensor_parallel_rounds_queue_to_data_axis(davis_tree, tmp_path):
    """queue_size not divisible by dp (dp=3, 64 rows): the global FIFO is
    rounded down to 63 so it shards P('data') instead of crashing deep in
    device_put with an obscure sharding error."""
    cfg = _cfg(davis_tree, tmp_path, num_epochs=1, num_devices=6,
               tensor_parallel=2, batch_size=3)
    result = run_training(cfg)
    assert np.isfinite(result["final_loss"])
    assert result["state"].queue.shape[0] == 63
    assert {s.data.shape for s in result["state"].queue.addressable_shards} \
        == {(21, 8)}


def test_default_eval_resolution_is_protocol_aware():
    """Reference time_tuning.py:603: input/2 ONLY for dataset-wise;
    frame-/sample-wise in-training eval runs at full input resolution."""
    from timetuning_tpu.core.train import default_eval_resolution

    mk = lambda **kw: TrainingConfig(input_resolution=224, **kw)  # noqa: E731
    assert default_eval_resolution(mk()) == 112  # dataset-wise default
    assert default_eval_resolution(
        mk(evaluation_protocol="frame-wise")) == 224
    assert default_eval_resolution(
        mk(evaluation_protocol="sample-wise")) == 224
    assert default_eval_resolution(
        mk(evaluation_protocol="frame-wise", eval_resolution=100)) == 100


def test_empty_training_loader_raises(davis_tree, tmp_path):
    """batch_size > videos yields zero batches — the driver must fail loudly
    instead of silently running zero optimization steps per epoch."""
    with pytest.raises(ValueError, match="no batches"):
        run_training(_cfg(davis_tree, tmp_path, batch_size=32,
                          num_devices=1))
