"""Checkpoint/resume + observability tests."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from timetuning_tpu.core.checkpoint import (
    export_best,
    find_last_run_directory,
    load_checkpoint,
    make_run_directory,
    save_checkpoint,
)
from timetuning_tpu.obs.logging import MetricsWriter, dump_config, make_file_logger
from timetuning_tpu.obs.viz import (
    colorize_segmentation,
    davis_palette,
    denormalize,
    imwrite_indexed,
    overlay_segmentation,
    write_gif,
)


def test_run_directory_roundtrip(tmp_path):
    base = str(tmp_path / "logs")
    d1 = make_run_directory(base)
    assert find_last_run_directory(base) == d1
    assert find_last_run_directory(str(tmp_path / "missing")) is None


def test_checkpoint_save_load(tmp_path):
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "step": jnp.asarray(7, jnp.int32),
    }
    run = str(tmp_path / "run")
    os.makedirs(run)
    save_checkpoint(state, run, epoch=3)
    template = {
        "params": {"w": jnp.zeros((2, 3))},
        "step": jnp.asarray(0, jnp.int32),
    }
    restored, epoch = load_checkpoint(run, template)
    assert epoch == 3
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert int(restored["step"]) == 7


def test_checkpoint_missing_returns_template(tmp_path):
    template = {"x": jnp.ones((2,))}
    restored, epoch = load_checkpoint(str(tmp_path), template)
    assert epoch == 0
    np.testing.assert_array_equal(np.asarray(restored["x"]), [1, 1])


def test_export_best(tmp_path):
    p = export_best({"w": jnp.ones((2,))}, str(tmp_path), 0.1234, 5)
    assert os.path.exists(p)
    assert "0.1234_5" in p


def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path / "tb"), use_tensorboard=False)
    w.scalar("Loss/train", 1.5, 0)
    w.scalar("Loss/train", 1.2, 1)
    w.close()
    lines = open(str(tmp_path / "tb" / "metrics.jsonl")).read().splitlines()
    assert len(lines) == 2
    assert '"Loss/train"' in lines[0]


def test_metrics_writer_nonfinite_stays_strict_json(tmp_path):
    """A diverged run's NaN/inf must not poison metrics.jsonl with
    non-strict JSON tokens (jq/CI parsers reject NaN)."""
    import json

    w = MetricsWriter(str(tmp_path / "tb"), use_tensorboard=False)
    w.scalar("Loss/train", float("nan"), 0)
    w.scalar("Loss/train", float("inf"), 1)
    w.close()
    lines = open(str(tmp_path / "tb" / "metrics.jsonl")).read().splitlines()
    recs = [json.loads(l, parse_constant=lambda s: pytest.fail(
        f"non-strict JSON token {s}")) for l in lines]
    assert recs[0]["value"] == "nan"
    assert recs[1]["value"] == "inf"


def test_dump_config_and_logger(tmp_path):
    path = dump_config({"lr": 1e-4, "bs": 128}, str(tmp_path))
    text = open(path).read()
    assert "lr: 0.0001" in text and "bs: 128" in text
    lg = make_file_logger("evaltest", str(tmp_path))
    lg.info("hello")
    assert "hello" in open(str(tmp_path / "evaltest.log")).read()


def test_viz_helpers(tmp_path):
    pal = davis_palette()
    assert pal.shape == (256, 3)
    seg = np.zeros((8, 8), int)
    seg[2:6, 2:6] = 1
    rgb = colorize_segmentation(seg)
    assert rgb.shape == (8, 8, 3)
    img = np.full((8, 8, 3), 0.5, np.float32)
    over = overlay_segmentation(img, seg)
    assert over.dtype == np.uint8
    p = str(tmp_path / "seg.png")
    imwrite_indexed(p, seg)
    assert os.path.exists(p)
    g = write_gif([over, over], str(tmp_path / "a.gif"))
    assert os.path.exists(g)
    d = denormalize(np.zeros((4, 4, 3)), [0.5, 0.5, 0.5], [0.2, 0.2, 0.2])
    np.testing.assert_allclose(d, 0.5)
