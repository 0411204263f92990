"""CLI surface tests: parser parity + smoke runs on the synthetic tree."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from timetuning_tpu.cli import cbfe as cli_cbfe
from timetuning_tpu.cli import evaluate as cli_eval
from timetuning_tpu.cli import linear_probe as cli_probe
from timetuning_tpu.cli import propagate as cli_prop
from timetuning_tpu.cli import train as cli_train


def test_train_parser_defaults_match_reference():
    """Defaults from reference time_tuning.py:673-714."""
    a = cli_train.build_parser().parse_args([])
    assert a.architecture == "dino-s16"
    assert a.batch_size == 128
    assert a.num_epochs == 100
    assert a.num_clusters == 200
    assert a.input_resolution == 224
    assert a.num_frames == 4
    assert a.EMA_decay == 0.995
    assert a.epsilon == 0.05
    assert a.queue_size == 16384
    assert a.use_teacher is True
    assert a.use_queue is False
    assert a.regular_step == 3
    assert a.head_lr == 1e-4


def test_propagate_parser_defaults():
    """Defaults from reference mask_propagation.py:847-870."""
    a = cli_prop.build_parser().parse_args([])
    assert a.num_frames == 25
    assert a.n_last_frames == 4
    assert a.size_mask_neighborhood == 12
    assert a.topk == 5
    assert a.uvos is True


def test_other_parsers_build():
    assert cli_eval.build_parser().parse_args([]).evaluation_protocol == "frame-wise"
    assert cli_probe.build_parser().parse_args(["--pascal_root", "x"]).num_epochs == 50
    assert cli_cbfe.build_parser().parse_args(["--pascal_root", "x"]).num_clusters == 300


@pytest.fixture(scope="module")
def davis_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("davis_cli")
    frames = root / "JPEGImages" / "480p"
    annots = root / "Annotations" / "480p"
    rng = np.random.default_rng(0)
    for v in range(2):
        fdir, adir = frames / f"v{v}", annots / f"v{v}"
        fdir.mkdir(parents=True)
        adir.mkdir(parents=True)
        for f in range(5):
            cv2.imwrite(
                str(fdir / f"{f:05d}.jpg"),
                rng.integers(0, 255, size=(48, 48, 3), dtype=np.uint8),
            )
            ann = np.zeros((48, 48), np.uint8)
            ann[10:30, 10:30] = 1
            cv2.imwrite(str(adir / f"{f:05d}.png"), ann)
    return str(root)


def test_evaluate_cli_gif_logging(davis_tree, tmp_path, capsys):
    """--logging_directory: per-clip reordered/raw cluster-map gifs land
    under <dir>/<protocol>/ (reference evaluation.py:270-300)."""
    import glob

    gif_dir = str(tmp_path / "gifs")
    rc = cli_eval.main([
        "--architecture", "vit-tiny-test",
        "--dataset", "davis_val",
        "--data_root", davis_tree,
        "--batch_size", "2",
        "--num_frames", "2",
        "--input_resolution", "32",
        "--eval_resolution", "16",
        "--num_clusters", "2",
        "--evaluation_protocol", "frame-wise",
        "--num_workers", "2",
        "--logging_directory", gif_dir,
    ])
    assert rc == 0
    gifs = glob.glob(gif_dir + "/frame-wise/*.gif")
    assert any("reordered" in g for g in gifs), gifs
    assert any("inorder" in g for g in gifs), gifs


def test_propagate_cli_smoke(davis_tree, capsys):
    rc = cli_prop.main([
        "--architecture", "vit-tiny-test",
        "--dataset", "davis_val",
        "--data_root", davis_tree,
        "--num_frames", "4",
        "--n_last_frames", "2",
        "--size_mask_neighborhood", "1",
        "--input_resolution", "32",
        "--metric", "jf",
        "--num_workers", "2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "J&F" in out


def test_evaluate_cli_smoke(davis_tree, capsys):
    rc = cli_eval.main([
        "--architecture", "vit-tiny-test",
        "--dataset", "davis_val",
        "--data_root", davis_tree,
        "--batch_size", "2",
        "--num_frames", "2",
        "--input_resolution", "32",
        "--eval_resolution", "16",
        "--num_clusters", "2",
        "--evaluation_protocol", "frame-wise",
        "--num_workers", "2",
    ])
    assert rc == 0
    assert "score:" in capsys.readouterr().out


def test_propagate_cli_other_metrics(davis_tree, capsys):
    for metric, marker in [("propagation", "propagation J"), ("miou", "mIoU")]:
        rc = cli_prop.main([
            "--architecture", "vit-tiny-test",
            "--dataset", "davis_val",
            "--data_root", davis_tree,
            "--num_frames", "3",
            "--n_last_frames", "2",
            "--size_mask_neighborhood", "1",
            "--input_resolution", "32",
            "--metric", metric,
            "--num_workers", "2",
        ])
        assert rc == 0
        assert marker in capsys.readouterr().out


def test_propagate_clip_batch_equivalence(davis_tree):
    """--clip_batch is a pure throughput knob: batched dispatch (including
    a padded partial group) must reproduce the bs=1 metrics exactly."""
    base = [
        "--architecture", "vit-tiny-test",
        "--dataset", "davis_val",
        "--data_root", davis_tree,
        "--num_frames", "4",
        "--n_last_frames", "2",
        "--size_mask_neighborhood", "1",
        "--input_resolution", "32",
        "--num_workers", "2",
    ]
    results = {}
    for cb in ("1", "2", "3"):   # 2 clips: full group at 2, padded at 3
        args = cli_prop.build_parser().parse_args(base + ["--clip_batch", cb])
        results[cb] = cli_prop.run_propagation(args)
    for cb in ("2", "3"):
        assert results[cb]["jf"] == results["1"]["jf"], cb
        assert results[cb]["miou"] == results["1"]["miou"], cb
        assert results[cb]["propagation"] == results["1"]["propagation"], cb


def test_propagate_cli_optical_flow(davis_tree, capsys):
    rc = cli_prop.main([
        "--architecture", "vit-tiny-test",
        "--dataset", "davis_val",
        "--data_root", davis_tree,
        "--num_frames", "3",
        "--input_resolution", "32",
        "--use_optical_flow", "true",
        "--metric", "jf",
        "--num_workers", "2",
    ])
    assert rc == 0
    assert "J&F" in capsys.readouterr().out


def test_export_cli_roundtrip(tmp_path, capsys):
    """AOT export → serialized StableHLO → reload without model code →
    identical features."""
    from timetuning_tpu.cli import export as cli_export

    out = str(tmp_path / "feat.stablehlo")
    rc = cli_export.main([
        "--architecture", "vit-tiny-test",
        "--batch_size", "2",
        "--input_resolution", "32",
        "--compute_dtype", "float32",
        "--out", out,
        "--check", "true",
    ])
    stdout = capsys.readouterr().out
    assert rc == 0, stdout
    assert "round-trip check" in stdout
    import os
    assert os.path.getsize(out) > 1000


def test_export_cli_symbolic_batch(tmp_path, capsys):
    """--symbolic_batch: one artifact serves multiple batch sizes (XLA
    attention path; the check runs a second batch through the same
    deserialized artifact)."""
    from timetuning_tpu.cli import export as cli_export

    out = str(tmp_path / "feat_sym.stablehlo")
    rc = cli_export.main([
        "--architecture", "vit-tiny-test",
        "--batch_size", "4",
        "--input_resolution", "32",
        "--compute_dtype", "float32",
        "--symbolic_batch", "true",
        "--out", out,
        "--check", "true",
    ])
    stdout = capsys.readouterr().out
    assert rc == 0, stdout
    assert "symbolic-batch check: batch 5 ok" in stdout


def test_export_cli_mesh_sharded(tmp_path, capsys):
    """--tensor_parallel/--data_parallel: one artifact with the weights
    embedded Megatron-sharded over a (2, 2) mesh, batch sharded P('data');
    the round-trip check deserializes and matches the live forward."""
    from timetuning_tpu.cli import export as cli_export

    out = str(tmp_path / "feat_tp.stablehlo")
    rc = cli_export.main([
        "--architecture", "vit-tiny-test",
        "--batch_size", "4",
        "--input_resolution", "32",
        "--compute_dtype", "float32",
        "--tensor_parallel", "2",
        "--data_parallel", "2",
        "--out", out,
        "--check", "true",
    ])
    stdout = capsys.readouterr().out
    assert rc == 0, stdout
    assert "2x2 mesh" in stdout
    assert "round-trip check" in stdout
    # the serialized artifact itself records the 4-device assignment
    from jax import export as jexport

    with open(out, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    assert exported.nr_devices == 4


def test_export_cli_sequence_parallel(tmp_path, capsys):
    """--sequence_parallel: token-sharded artifact over a (2, 2) dp×sp mesh
    (parallel/sp.py) — round-trip checked against the live forward, and the
    features match the plain single-chip export bit-for-bit (same XLA
    fallback math on the CPU test mesh)."""
    import numpy as np

    from timetuning_tpu.cli import export as cli_export

    out = str(tmp_path / "feat_sp.stablehlo")
    rc = cli_export.main([
        "--architecture", "vit-tiny-test",
        "--batch_size", "4",
        "--input_resolution", "32",
        "--compute_dtype", "float32",
        "--sequence_parallel", "2",
        "--data_parallel", "2",
        "--out", out,
        "--check", "true",
    ])
    stdout = capsys.readouterr().out
    assert rc == 0, stdout
    assert "2x2 seq mesh" in stdout
    assert "round-trip check" in stdout

    # sp features == the plain export's features (numerical equivalence of
    # the token-sharded stack, through the full AOT path)
    blob, live, shape, _ = cli_export.export_features(
        "vit-tiny-test", None, 4, 32, "float32"
    )
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from timetuning_tpu.parallel.sp import make_dp_sp_mesh

    mesh = make_dp_sp_mesh(2, 2)
    x = np.random.default_rng(0).integers(0, 256, shape, np.uint8)
    want = np.asarray(live(x))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    got = np.asarray(cli_export.load_exported(out)(xs))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_export_cli_sp_tp_exclusive(tmp_path):
    """--sequence_parallel and --tensor_parallel cannot combine."""
    import pytest

    from timetuning_tpu.cli import export as cli_export

    with pytest.raises(ValueError, match="mutually"):
        cli_export.export_features(
            "vit-tiny-test", None, 4, 32, "float32",
            tensor_parallel=2, sequence_parallel=2,
        )


def test_eval_clis_bfloat16_compute_dtype(davis_tree, capsys):
    """--compute_dtype bfloat16 (the perf path: bf16 backbone + bf16
    preprocess resize) runs both eval CLIs and lands within rounding
    distance of the f32 scores."""
    common = [
        "--architecture", "vit-tiny-test",
        "--dataset", "davis_val",
        "--data_root", davis_tree,
        "--num_workers", "2",
    ]
    scores = {}
    for dt in ("float32", "bfloat16"):
        rc = cli_eval.main(common + [
            "--batch_size", "2", "--num_frames", "2",
            "--input_resolution", "32", "--eval_resolution", "16",
            "--num_clusters", "2",
            "--evaluation_protocol", "dataset-wise",
            "--compute_dtype", dt,
        ])
        assert rc == 0
        out = capsys.readouterr().out
        scores[dt] = float(out.strip().splitlines()[-1].split("score:")[1])
    assert abs(scores["float32"] - scores["bfloat16"]) < 0.1, scores

    js = {}
    for dt in ("float32", "bfloat16"):
        rc = cli_prop.main(common + [
            "--num_frames", "4", "--n_last_frames", "2",
            "--size_mask_neighborhood", "2", "--input_resolution", "64",
            "--metric", "jf", "--compute_dtype", dt,
        ])
        assert rc == 0
        out = capsys.readouterr().out
        row = [ln for ln in out.splitlines() if "J&F" in ln][-1]
        js[dt] = float(row.split("'J': ")[1].split(",")[0])
    assert abs(js["float32"] - js["bfloat16"]) < 0.05, js
