"""End-to-end test of the real-artifact parity harness (cli.parity) with a
random-weight TimeT.pth + synthetic DAVIS/Pascal trees — VERDICT r1 item 2:
when the real artifacts are mounted, parity is one command away."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
torch = pytest.importorskip("torch")

from timetuning_tpu.cli import parity as cli_parity  # noqa: E402
from timetuning_tpu.eval.parity_oracle import (  # noqa: E402
    build_oracle,
    build_oracle_head,
)


@pytest.fixture(scope="module")
def timet_pth(tmp_path_factory):
    """Random-weight checkpoint with the exact TimeT.pth key contract
    (README.md:66-76), sized to the vit-tiny-test architecture."""
    torch.manual_seed(0)
    oracle = build_oracle(img_size=32, patch_size=8, dim=32, depth=2, heads=2)
    head = build_oracle_head((48, 24), 32)
    protos = torch.nn.functional.normalize(torch.randn(8, 24), dim=-1)
    sd = {}
    for k, v in oracle.state_dict().items():
        sd[f"feature_extractor.backbone.{k}"] = v
    for k, v in head.state_dict().items():
        sd[f"feature_extractor.head.{k}"] = v
    sd["prototypes"] = protos
    path = tmp_path_factory.mktemp("ckpt") / "TimeT.pth"
    torch.save(sd, str(path))
    return str(path)


@pytest.fixture(scope="module")
def davis_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("davis")
    for v in range(2):
        fdir = root / "JPEGImages" / "480p" / f"video{v}"
        adir = root / "Annotations" / "480p" / f"video{v}"
        fdir.mkdir(parents=True)
        adir.mkdir(parents=True)
        for f in range(6):
            img = np.full((64, 64, 3), 30, np.uint8)
            y = 16 + f
            img[y:y + 24, 20:44] = [220, 40, 40]
            cv2.imwrite(str(fdir / f"{f:05d}.jpg"), img)
            ann = np.zeros((64, 64), np.uint8)
            ann[y:y + 24, 20:44] = 1
            cv2.imwrite(str(adir / f"{f:05d}.png"), ann)
    return str(root)


@pytest.fixture(scope="module")
def voc_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    (root / "images").mkdir()
    (root / "SegmentationClass").mkdir()
    (root / "SegmentationClassAug").mkdir()
    (root / "sets").mkdir()
    rng = np.random.default_rng(0)
    names = [f"img{i}" for i in range(4)]
    for n in names:
        img = np.full((64, 64, 3), 40, np.uint8)
        mask = np.zeros((64, 64), np.uint8)
        y = int(rng.integers(8, 24))
        img[y:y + 24, 16:48] = [200, 60, 60]
        mask[y:y + 24, 16:48] = 1
        cv2.imwrite(str(root / "images" / f"{n}.jpg"), img[..., ::-1])
        cv2.imwrite(str(root / "SegmentationClass" / f"{n}.png"), mask)
        cv2.imwrite(str(root / "SegmentationClassAug" / f"{n}.png"), mask)
    (root / "sets" / "val.txt").write_text("\n".join(names))
    (root / "sets" / "trainaug.txt").write_text("\n".join(names))
    return str(root)


def test_parity_import_stage_only(timet_pth, capsys):
    rc = cli_parity.main([
        "--timet_pth", timet_pth,
        "--architecture", "vit-tiny-test",
        "--input_resolution", "32",
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "patch_embed max|Δ|" in out
    assert "dense features max|Δ|" in out
    assert "prototype scores max|Δ|" in out
    assert "FAIL" not in out


def test_parity_full_pipeline(timet_pth, davis_tree, voc_tree, capsys):
    """All three stages on synthetic artifacts; the metric gates run against
    expectations recorded from this very pipeline (self-consistency — the
    real run swaps in the paper numbers)."""
    rc = cli_parity.main([
        "--timet_pth", timet_pth,
        "--architecture", "vit-tiny-test",
        "--input_resolution", "32",
        "--davis_root", davis_tree,
        "--pascal_root", voc_tree,
        "--num_frames", "4",
        "--n_last_frames", "2",
        "--size_mask_neighborhood", "2",
        "--pascal_clusters", "2",
        "--eval_resolution", "16",
        "--num_workers", "2",
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "DAVIS J&F (propagation)" in out
    assert "Pascal mIoU (dataset-wise, k=21)" in out
    assert "FAIL" not in out
    # the synthetic moving-box scene must be clearly propagatable
    jf_row = [ln for ln in out.splitlines() if "DAVIS J (" in ln][0]
    j_val = float(jf_row.split("ours=")[1].split()[0])
    assert j_val > 0.3


def test_parity_report_json_schema(timet_pth, tmp_path, capsys):
    """--report_json writes the machine-readable artifact: per-stage rows
    {metric, value, expected, tolerance, pass} + a summary block; gated rows
    carry booleans, report-only rows null."""
    import json

    out_path = str(tmp_path / "parity_report.json")
    rc = cli_parity.main([
        "--timet_pth", timet_pth,
        "--architecture", "vit-tiny-test",
        "--input_resolution", "32",
        "--report_json", out_path,
    ])
    assert rc == 0
    with open(out_path) as f:
        payload = json.load(f)
    assert set(payload) == {"rows", "summary"}
    assert payload["summary"]["ok"] is True
    assert payload["summary"]["failed"] == 0
    assert len(payload["rows"]) >= 3
    for row in payload["rows"]:
        assert set(row) == {"metric", "value", "expected", "tolerance", "pass"}
        assert isinstance(row["value"], float)
        assert row["pass"] in (True, False, None)
    # the import-fidelity rows are gated (atol defaults), so pass is boolean
    embed = [r for r in payload["rows"] if r["metric"].startswith("patch_embed")]
    assert embed and embed[0]["pass"] is True

    # a failing gate flips both the exit code and the JSON verdict
    rc = cli_parity.main([
        "--timet_pth", timet_pth,
        "--architecture", "vit-tiny-test",
        "--input_resolution", "32",
        "--feature_atol", "0",
        "--report_json", out_path,
    ])
    capsys.readouterr()
    assert rc == 1
    with open(out_path) as f:
        payload = json.load(f)
    assert payload["summary"]["ok"] is False
    assert any(r["pass"] is False for r in payload["rows"])


def test_parity_gate_fails_on_wrong_expectation(timet_pth, capsys):
    """A deliberately-wrong expected metric must flip the exit code."""
    rc = cli_parity.main([
        "--timet_pth", timet_pth,
        "--architecture", "vit-tiny-test",
        "--input_resolution", "32",
        "--feature_atol", "0",  # impossible gate
    ])
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL" in out


def test_parity_accepts_plain_backbone_checkpoint(tmp_path, capsys):
    """A backbone-only release (e.g. dino_deitsmall16_pretrain.pth layout,
    optionally under a stripped prefix) runs the import-fidelity stage."""
    torch.manual_seed(1)
    oracle = build_oracle(img_size=32, patch_size=8, dim=32, depth=2, heads=2)
    sd = {f"teacher.backbone.{k}": v for k, v in oracle.state_dict().items()}
    path = tmp_path / "dino_small.pth"
    torch.save(sd, str(path))
    rc = cli_parity.main([
        "--timet_pth", str(path),
        "--architecture", "vit-tiny-test",
        "--input_resolution", "32",
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "dense features max|Δ|" in out
    assert "prototype scores" not in out  # no prototypes in a backbone ckpt


def test_evaluate_cli_prototype_clustering(timet_pth, davis_tree, capsys):
    """--clustering_algorithm prototypes: the TimeT checkpoint's prototype
    bank is loaded and (head-space prototypes) features are head-projected
    before scoring — previously this path always crashed after the full
    extraction loop (Evaluator built without prototypes)."""
    from timetuning_tpu.cli import evaluate as cli_evaluate

    rc = cli_evaluate.main([
        "--architecture", "vit-tiny-test",
        "--model_path", timet_pth,
        "--dataset", "davis_val",
        "--data_root", davis_tree,
        "--batch_size", "2",
        "--num_frames", "2",
        "--input_resolution", "32",
        "--eval_resolution", "16",
        "--num_clusters", "8",
        "--evaluation_protocol", "dataset-wise",
        "--clustering_algorithm", "prototypes",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    score = float(out.strip().rsplit("score:", 1)[1])
    assert 0.0 <= score <= 1.0


def test_evaluate_cli_prototypes_requires_checkpoint(davis_tree):
    from timetuning_tpu.cli import evaluate as cli_evaluate

    with pytest.raises(SystemExit, match="requires --model_path"):
        cli_evaluate.main([
            "--architecture", "vit-tiny-test",
            "--dataset", "davis_val",
            "--data_root", davis_tree,
            "--clustering_algorithm", "prototypes",
        ])


def test_parity_extended_stages(timet_pth, voc_tree, capsys):
    """Stages 4-6 (prototype-argmax clustering, linear probe, CBFE +
    boundary-F) run e2e on synthetic artifacts through the one-command
    harness (VERDICT r2 next #1)."""
    rc = cli_parity.main([
        "--timet_pth", timet_pth,
        "--architecture", "vit-tiny-test",
        "--input_resolution", "32",
        "--pascal_root", voc_tree,
        "--pascal_clusters", "2",
        "--eval_resolution", "16",
        "--proto_clustering", "true",
        "--linear_probe", "true",
        "--linear_probe_epochs", "1",
        "--linear_resolution", "32",
        "--linear_mask_size", "16",
        "--linear_batch_size", "2",
        "--cbfe", "true",
        "--cbfe_clusters", "4",
        "--cbfe_input_resolution", "32",
        "--cbfe_resolution", "16",
        "--cbfe_batch_size", "2",
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "Pascal mIoU (prototype argmax)" in out
    assert "Pascal linear-probe mIoU (best)" in out
    assert "CBFE val Jaccard" in out
    assert "CBFE val boundary-F" in out
    assert "CBFE masked mIoU (many-to-one)" in out
    assert "FAIL" not in out


@pytest.fixture(scope="module")
def timet_pth_p4(tmp_path_factory):
    """Checkpoint sized for the dense-grid (s8-geometry) test arch."""
    torch.manual_seed(2)
    oracle = build_oracle(img_size=32, patch_size=4, dim=32, depth=2, heads=2)
    head = build_oracle_head((48, 24), 32)
    protos = torch.nn.functional.normalize(torch.randn(8, 24), dim=-1)
    sd = {f"feature_extractor.backbone.{k}": v
          for k, v in oracle.state_dict().items()}
    for k, v in head.state_dict().items():
        sd[f"feature_extractor.head.{k}"] = v
    sd["prototypes"] = protos
    path = tmp_path_factory.mktemp("ckpt_p4") / "TimeT_p4.pth"
    torch.save(sd, str(path))
    return str(path)


def test_parity_dense_grid_geometry(timet_pth_p4, davis_tree, capsys):
    """DAVIS propagation at the dino-s8 token-count geometry (dense patch
    grid, pos-embed interpolation 8x8 -> 16x16): the BASELINE.json s8 row's
    e2e seam (VERDICT r2 next #1)."""
    rc = cli_parity.main([
        "--timet_pth", timet_pth_p4,
        "--architecture", "vit-tiny-test-p4",
        "--input_resolution", "64",
        "--davis_root", davis_tree,
        "--num_frames", "4",
        "--n_last_frames", "2",
        "--size_mask_neighborhood", "4",
        "--num_workers", "2",
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "DAVIS J&F (propagation)" in out
    assert "FAIL" not in out
    j_row = [ln for ln in out.splitlines() if "DAVIS J (" in ln][0]
    assert float(j_row.split("ours=")[1].split()[0]) > 0.3


@pytest.fixture(scope="module")
def ytvos_frames_tree(tmp_path_factory):
    """Minimal YTVOS-layout train tree (JPEGImages only — training never
    reads annotations)."""
    root = tmp_path_factory.mktemp("ytvos_traj")
    rng = np.random.default_rng(3)
    for v in range(8):
        vdir = root / "JPEGImages" / f"video{v}"
        vdir.mkdir(parents=True)
        bg = rng.integers(20, 90, size=3)
        for f in range(6):
            img = np.full((64, 64, 3), bg, np.uint8)
            y = 8 + 3 * f
            img[y:y + 20, 16:44] = [220, 40, 40] if v % 2 else [40, 220, 40]
            cv2.imwrite(str(vdir / f"{f:05d}.jpg"), img)
    return str(root)


def test_parity_train_trajectory_stage(timet_pth, ytvos_frames_tree,
                                       voc_tree, tmp_path, capsys):
    """Stage 7 (VERDICT r4 #5): the training-trajectory replication runs the
    real train loop (YTVOS clips -> TimeT steps -> every-4-epochs Pascal
    dataset-wise eval), extracts the Scores/localization trajectory and
    gates its end point."""
    import json

    report = str(tmp_path / "traj_report.json")
    rc = cli_parity.main([
        "--timet_pth", timet_pth,
        "--architecture", "vit-tiny-test",
        "--input_resolution", "32",
        "--train_trajectory", "true",
        "--ytvos_root", ytvos_frames_tree,
        "--pascal_root", voc_tree,
        "--trajectory_epochs", "5",
        # conftest pins an 8-virtual-device CPU mesh; the global batch
        # must divide over it
        "--trajectory_batch_size", "8",
        "--pascal_clusters", "2",
        "--num_workers", "2",
        "--trajectory_tolerance", "1.0",  # rehearse the loop, not the number
        "--report_json", report,
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "Scores/localization trajectory" in out
    # evals fire at epochs 0 and 4 over a 5-epoch horizon
    traj_line = [ln for ln in out.splitlines()
                 if "trajectory:" in ln][0]
    assert traj_line.count("(") >= 2, traj_line
    rows = json.load(open(report))["rows"]
    row = [r for r in rows if "trajectory" in r["metric"]][0]
    assert row["pass"] is True
    assert row["expected"] == 0.125  # the pre-filled Performance.jpg gate
