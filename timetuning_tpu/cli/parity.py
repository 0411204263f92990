"""Real-artifact parity harness — one command, run the moment the published
checkpoint / datasets are mounted.

    python -m timetuning_tpu.cli.parity --timet_pth TimeT.pth \
        [--davis_root /data/davis] [--pascal_root /data/voc] \
        [--expected_davis_jf 0.65] [--expected_pascal_miou 0.125]

Stages (each runs only if its artifact is given):

  1. **Import fidelity** (needs only the .pth): imports the checkpoint per
     the README.md:66-76 contract, then compares our Flax forward against a
     torch reference ViT loaded from the *same* state dict
     (eval/parity_oracle.py) on a fixed random batch — the BASELINE.md
     "patch-embedding parity vs TimeT.pth" gate, plus full dense features,
     projection-head output and prototype scores.
  2. **DAVIS propagation** (reference mask_propagation.py:717-842 protocol:
     25 uniform frames, n_last=4, neighborhood 12, topk 5, uvos): J, F, J&F
     and sample-wise mIoU.
  3. **Pascal dataset-wise clustering mIoU** (reference evaluation.py:373-485
     protocol: k=21, eval resolution 112, k-means, dataset-wise Hungarian).
  4. **Pascal prototype-argmax clustering** (``--proto_clustering``;
     reference clustering.py:85-117 — requires the checkpoint's prototype
     bank + projection head).
  5. **Linear probe** (``--linear_probe``; reference linear_finetune.py:55-89
     — frozen backbone + 1×1 conv head, Pascal trainaug/val).
  6. **CBFE + boundary-F** (``--cbfe``; reference
     cluster_based_foreground_extraction.py:281-348 — k=300 overclustering,
     threshold tuning on train GT, masked dataset-wise rerun).

DAVIS propagation at the dino-s8 / dino-b16 geometries runs by passing
``--architecture dino-s8`` / ``dino-b16`` (each stage is
architecture-generic; the dense-grid geometry is e2e-tested at test scale
via ``vit-tiny-test-p4``).

Each stage prints a side-by-side row; stages with an ``--expected_*`` value
are gated (|ours − expected| ≤ tolerance, BASELINE.md "within 0.5" default);
without one they report the number for manual comparison. Exit code 1 if any
gate fails.
"""

from __future__ import annotations

import argparse

import numpy as np

from timetuning_tpu.cli.train import str2bool
from timetuning_tpu.runtime import setup_compilation_cache

_HEADS = {  # timm geometry per supported parity architecture
    "dino-s16": 6, "dino-s8": 6, "msn-s16": 6, "ibot-s16": 6, "leopart": 6,
    "dino-b16": 12, "vit": 12, "vit-tiny-test": 2, "vit-tiny-test-p4": 2,
}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("timetuning_tpu.parity")
    p.add_argument("--timet_pth", type=str, required=True,
                   help="published TimeT.pth (or any backbone .pth with the "
                        "feature_extractor.backbone.<timm key> contract)")
    p.add_argument("--architecture", type=str, default="dino-s16",
                   choices=sorted(_HEADS))
    p.add_argument("--davis_root", type=str, default=None)
    p.add_argument("--pascal_root", type=str, default=None)
    p.add_argument("--input_resolution", type=int, default=224)
    p.add_argument("--eval_resolution", type=int, default=None,
                   help="default input/2 (reference time_tuning.py:603)")
    p.add_argument("--pascal_clusters", type=int, default=21)
    p.add_argument("--num_frames", type=int, default=25)
    p.add_argument("--n_last_frames", type=int, default=4)
    p.add_argument("--size_mask_neighborhood", type=int, default=12)
    p.add_argument("--topk", type=int, default=5)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--expected_davis_jf", type=float, default=None,
                   help="reference J&F to gate against")
    p.add_argument("--expected_davis_miou", type=float, default=None)
    p.add_argument("--expected_pascal_miou", type=float, default=None)
    p.add_argument("--tolerance", type=float, default=0.005,
                   help="metric gate half-width, in FRACTION units (the "
                        "metrics here are [0, 1] fractions): 0.005 == the "
                        "0.5 mIoU POINTS of BASELINE.md's 'within 0.5 of "
                        "the reference' — a points-scale 0.5 here would "
                        "make every gate vacuously pass")
    p.add_argument("--feature_atol", type=float, default=5e-3,
                   help="max |Δ| gate for dense features vs the torch oracle")
    p.add_argument("--embed_atol", type=float, default=1e-4,
                   help="max |Δ| gate for the patch-embedding tokens")
    p.add_argument("--streaming", type=str2bool, default=False,
                   help="bounded-memory Pascal dataset-wise protocol")
    # stage 4: prototype-argmax Pascal clustering (reference
    # clustering.py:85-117; requires prototypes + head in the .pth)
    p.add_argument("--proto_clustering", type=str2bool, default=False)
    p.add_argument("--expected_pascal_proto_miou", type=float, default=None)
    # stage 5: linear probe (reference linear_finetune.py:55-89)
    p.add_argument("--linear_probe", type=str2bool, default=False)
    p.add_argument("--linear_probe_epochs", type=int, default=50)
    p.add_argument("--linear_resolution", type=int, default=448)
    p.add_argument("--linear_mask_size", type=int, default=100)
    p.add_argument("--linear_batch_size", type=int, default=64)
    p.add_argument("--expected_linear_miou", type=float, default=None)
    # stage 6: CBFE + boundary-F (reference
    # cluster_based_foreground_extraction.py:281-348)
    p.add_argument("--cbfe", type=str2bool, default=False)
    p.add_argument("--cbfe_clusters", type=int, default=300)
    p.add_argument("--cbfe_input_resolution", type=int, default=448)
    p.add_argument("--cbfe_resolution", type=int, default=100)
    p.add_argument("--cbfe_batch_size", type=int, default=32)
    p.add_argument("--expected_cbfe_miou", type=float, default=None)
    p.add_argument("--expected_cbfe_jaccard", type=float, default=None)
    # stage 7: training-trajectory replication (reference
    # time_tuning.py:637-645 / Images/Performance.jpg — Scores/localization
    # 0.06→0.125 over 24 YTVOS epochs, Pascal dataset-wise eval every 4)
    p.add_argument("--train_trajectory", type=str2bool, default=False,
                   help="train from --timet_pth (pass the DINO init here, "
                        "not the finished TimeT) on --ytvos_root with the "
                        "reference config and gate the final in-training "
                        "Pascal Scores/localization")
    p.add_argument("--ytvos_root", type=str, default=None)
    p.add_argument("--trajectory_epochs", type=int, default=24,
                   help="the Performance.jpg horizon")
    p.add_argument("--trajectory_batch_size", type=int, default=128)
    p.add_argument("--expected_localization", type=float, default=0.125,
                   help="Performance.jpg end point (pre-filled)")
    p.add_argument("--trajectory_tolerance", type=float, default=0.01,
                   help="gate half-width for the trajectory end point — "
                        "wider than --tolerance: a fresh SSL run has seed "
                        "variance the deterministic eval stages don't")
    p.add_argument("--report_json", type=str, default=None,
                   help="write the per-stage report as JSON: a list of "
                        "{metric, value, expected, tolerance, pass} rows "
                        "plus a summary — the machine-readable artifact of "
                        "the parity run")
    return p


class _Report:
    def __init__(self):
        self.rows = []
        self.failed = False

    def add(self, name, ours, expected, tol):
        if expected is None:
            status = "REPORT"
        elif abs(ours - expected) <= tol:
            status = "PASS"
        else:
            status = "FAIL"
            self.failed = True
        self.rows.append((name, ours, expected, tol, status))
        exp = "—" if expected is None else f"{expected:.6g}"
        print(f"{name:<38} ours={ours:<12.6g} ref={exp:<10} "
              f"tol={tol:<8.3g} {status}")

    def summary(self, report_json: str | None = None):
        n_pass = sum(r[-1] == "PASS" for r in self.rows)
        n_fail = sum(r[-1] == "FAIL" for r in self.rows)
        n_rep = sum(r[-1] == "REPORT" for r in self.rows)
        print(f"\nparity: {n_pass} passed, {n_fail} failed, "
              f"{n_rep} report-only")
        if report_json:
            import json

            payload = {
                "rows": [
                    {
                        "metric": name,
                        "value": float(ours),
                        "expected": None if expected is None else float(expected),
                        "tolerance": float(tol),
                        # gated rows carry true/false; report-only rows null
                        "pass": None if status == "REPORT" else status == "PASS",
                    }
                    for name, ours, expected, tol, status in self.rows
                ],
                "summary": {
                    "passed": n_pass, "failed": n_fail,
                    "report_only": n_rep, "ok": not self.failed,
                },
            }
            with open(report_json, "w") as f:
                json.dump(payload, f, indent=1)
            print(f"report written: {report_json}")
        return 1 if self.failed else 0


def _import_stage(args, report: _Report):
    """Stage 1: checkpoint import + torch-oracle numerical parity."""
    import jax
    import jax.numpy as jnp
    import torch

    from timetuning_tpu.core.timet import TimeT, _graft
    from timetuning_tpu.models.extractor import FeatureExtractor
    from timetuning_tpu.models.import_torch import (
        load_torch_state_dict,
        timet_params_from_torch,
    )
    from timetuning_tpu.models.registry import get_backbone
    from timetuning_tpu.eval.parity_oracle import (
        build_oracle_head,
        oracle_from_state_dict,
    )

    sd = load_torch_state_dict(args.timet_pth)
    if not any(k.startswith("feature_extractor.backbone.") for k in sd):
        # plain backbone release (dino_deitsmall16_pretrain.pth, MSN, iBOT,
        # MoCo-v3 — assorted prefixes stripped by the importer): lift it
        # into the TimeT.pth key contract so one code path gates both
        from timetuning_tpu.models.import_torch import strip_prefixes

        sd = {
            f"feature_extractor.backbone.{k}": v
            for k, v in strip_prefixes(sd).items()
        }
    imported = timet_params_from_torch(sd)
    from timetuning_tpu.models.import_torch import head_dims_from_params

    head_dims = head_dims_from_params(
        imported["feature_extractor"].get("head", {})
    )
    n_protos = imported.get("prototypes", np.zeros((200, 1))).shape[0]

    bb = get_backbone(args.architecture)
    # compare at the checkpoint's NATIVE resolution (pos-embed length), not
    # the eval input resolution — import fidelity is about the stored
    # weights; non-native forwards are covered by the torch-exact bicubic
    # pos-embed interpolation test (tests/test_vit_golden.py)
    try:
        n_pos = sd["feature_extractor.backbone.pos_embed"].shape[1] - 1
        patch = sd["feature_extractor.backbone.patch_embed.proj.weight"].shape[-1]
        img = int(round(float(n_pos) ** 0.5)) * int(patch)
    except KeyError:
        img = args.input_resolution
    model = TimeT(
        feature_extractor=FeatureExtractor(
            backbone=bb.module, head_dims=head_dims, drop_cls=bb.drop_cls
        ),
        n_prototypes=n_protos,
        prototype_dim=None if head_dims else bb.feature_dim,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)))[
        "params"
    ]
    params = _graft(params, imported)

    # torch side from the same state dict
    backbone_sd = {
        k[len("feature_extractor.backbone."):]: v
        for k, v in sd.items()
        if k.startswith("feature_extractor.backbone.")
    }
    oracle = oracle_from_state_dict(
        backbone_sd, img, _HEADS[args.architecture]
    )
    x = np.random.default_rng(0).normal(size=(2, 3, img, img)).astype(
        np.float32
    )
    with torch.no_grad():
        embed_t = oracle.embed(torch.from_numpy(x)).numpy()
        tokens_t, _ = oracle(torch.from_numpy(x))
        tokens_t = tokens_t.numpy()
        want_feats = tokens_t[:, 1:]
        if head_dims:
            head = build_oracle_head(head_dims, tokens_t.shape[-1])
            tsd = {}
            for j in range(len(head_dims)):
                tsd[f"{2*j}.weight"] = torch.as_tensor(
                    sd[f"feature_extractor.head.{2*j}.weight"])
                tsd[f"{2*j}.bias"] = torch.as_tensor(
                    sd[f"feature_extractor.head.{2*j}.bias"])
            head.load_state_dict(tsd)
            want_feats = head(torch.from_numpy(want_feats)).numpy()
        want_scores = None
        if "prototypes" in imported:
            f = torch.nn.functional.normalize(
                torch.from_numpy(want_feats), dim=-1
            )
            p = torch.as_tensor(np.asarray(imported["prototypes"]))
            want_scores = (f @ p.t()).numpy()

    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    embed_j = np.asarray(_flax_patch_embed(bb, params, xj))
    feats_j, _ = model.apply({"params": params}, xj, use_head=bool(head_dims))
    feats_j = np.asarray(feats_j)

    report.add("patch_embed max|Δ| (vs torch)",
               float(np.abs(embed_j - embed_t).max()), 0.0, args.embed_atol)
    report.add("dense features max|Δ| (vs torch)",
               float(np.abs(feats_j - want_feats).max()), 0.0,
               args.feature_atol)
    if want_scores is not None:
        scores_j = np.asarray(
            model.apply({"params": params}, jnp.asarray(feats_j),
                        method=TimeT.similarity)
        )
        report.add("prototype scores max|Δ| (vs torch)",
                   float(np.abs(scores_j - want_scores).max()), 0.0,
                   args.feature_atol)
    return model, params, imported, head_dims


def _flax_patch_embed(bb, params, xj):
    """Patch-embedding tokens from the flax side: conv + flatten (matches
    OracleViT.embed)."""
    import jax
    import jax.numpy as jnp

    p = params["feature_extractor"]["backbone"]["patch_embed"]
    k = jnp.asarray(p["kernel"])
    b = jnp.asarray(p["bias"])
    patch = k.shape[0]
    y = jax.lax.conv_general_dilated(
        xj, k, window_strides=(patch, patch), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    B, hp, wp, D = y.shape
    return y.reshape(B, hp * wp, D)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    setup_compilation_cache()
    report = _Report()

    print(f"== stage 1: checkpoint import fidelity ({args.timet_pth}) ==")
    model, params, imported, head_dims = _import_stage(args, report)

    if args.davis_root:
        print("\n== stage 2: DAVIS semi-supervised propagation ==")
        from timetuning_tpu.cli import propagate as cli_prop

        pargs = cli_prop.build_parser().parse_args([
            "--architecture", args.architecture,
            "--model_path", args.timet_pth,
            "--dataset", "davis_val",
            "--data_root", args.davis_root,
            "--num_frames", str(args.num_frames),
            "--n_last_frames", str(args.n_last_frames),
            "--size_mask_neighborhood", str(args.size_mask_neighborhood),
            "--topk", str(args.topk),
            "--input_resolution", str(args.input_resolution),
            "--num_workers", str(args.num_workers),
        ])
        res = cli_prop.run_propagation(pargs)
        report.add("DAVIS J (propagation)", float(res["jf"]["J"]), None,
                   args.tolerance)
        report.add("DAVIS J&F (propagation)", float(res["jf"]["J&F"]),
                   args.expected_davis_jf, args.tolerance)
        report.add("DAVIS mIoU (frame-wise, reference scoring)",
                   float(res["miou"]),
                   args.expected_davis_miou, args.tolerance)

    if args.pascal_root:
        print("\n== stage 3: Pascal dataset-wise clustering mIoU ==")
        import jax
        import jax.numpy as jnp

        from timetuning_tpu.data.pascal import pascal_loader
        from timetuning_tpu.data.transforms import (
            IMAGENET_STD,
            eval_preprocess_batch,
        )
        from timetuning_tpu.eval.evaluator import Evaluator
        from timetuning_tpu.models.registry import get_backbone

        bb = get_backbone(args.architecture, args.timet_pth)
        res_sp = bb.spatial_resolution(args.input_resolution)
        eval_res = args.eval_resolution or args.input_resolution // 2

        @jax.jit
        def feats_jit(frames_u8):
            # Pascal paths use the canonical 0.229 std (leoloader.py:246 —
            # the per-path quirk; every other Pascal eval in this repo does
            # the same: core/train.py, cli/cbfe.py, cli/linear_probe.py)
            x = eval_preprocess_batch(
                frames_u8, out_size=args.input_resolution, std=IMAGENET_STD
            )
            out = bb.module.apply(bb.variables, x)
            f = out["tokens"][:, 1:] if bb.drop_cls else out["tokens"]
            return f, None

        loader = pascal_loader(
            60, args.pascal_root, "val", eval_res, args.input_resolution
        )
        ev = Evaluator(
            data_iter_factory=lambda: iter(loader),
            feature_fn=lambda frames, want_attention=False: feats_jit(
                jnp.asarray(frames)),
            spatial_resolution=res_sp,
            num_classes=args.pascal_clusters,
            involve_bg=True,
            ignore_index=255,
        )
        score = ev.evaluate(
            evaluation_protocol="dataset-wise",
            eval_resolution=eval_res,
            num_clusters=args.pascal_clusters,
            streaming=args.streaming,
        )
        report.add("Pascal mIoU (dataset-wise, k=21)", float(score),
                   args.expected_pascal_miou, args.tolerance)

    if args.proto_clustering and args.pascal_root:
        # stage 3 always ran (same pascal_root gate), so its res_sp /
        # eval_res / loader are live in this scope — reuse them
        print("\n== stage 4: Pascal prototype-argmax clustering mIoU ==")
        import jax
        import jax.numpy as jnp

        from timetuning_tpu.data.transforms import (
            IMAGENET_STD,
            eval_preprocess_batch,
        )
        from timetuning_tpu.eval.evaluator import Evaluator

        if "prototypes" not in imported:
            raise SystemExit(
                "--proto_clustering needs a checkpoint with a prototype bank "
                "(TimeT.pth has one; plain backbone releases do not)"
            )

        @jax.jit
        def head_feats_jit(frames_u8):
            x = eval_preprocess_batch(
                frames_u8, out_size=args.input_resolution, std=IMAGENET_STD
            )
            feats, _ = model.apply(
                {"params": params}, x, use_head=bool(head_dims)
            )
            return feats, None

        ev = Evaluator(
            data_iter_factory=lambda: iter(loader),
            feature_fn=lambda frames, want_attention=False: head_feats_jit(
                jnp.asarray(frames)),
            spatial_resolution=res_sp,
            num_classes=args.pascal_clusters,
            involve_bg=True,
            ignore_index=255,
            clustering_algorithm="prototypes",
            prototypes=np.asarray(imported["prototypes"]),
        )
        score = ev.evaluate(
            evaluation_protocol="dataset-wise",
            eval_resolution=eval_res,
            num_clusters=args.pascal_clusters,
            streaming=args.streaming,
        )
        report.add("Pascal mIoU (prototype argmax)", float(score),
                   args.expected_pascal_proto_miou, args.tolerance)

    if args.linear_probe and args.pascal_root:
        print("\n== stage 5: Pascal linear probe mIoU ==")
        import argparse as _ap

        from timetuning_tpu.cli.linear_probe import run_linear_probe

        lp_args = _ap.Namespace(
            architecture=args.architecture, model_path=args.timet_pth,
            pascal_root=args.pascal_root, batch_size=args.linear_batch_size,
            num_classes=args.pascal_clusters,
            num_epochs=args.linear_probe_epochs,
            input_resolution=args.linear_resolution,
            mask_size=args.linear_mask_size, lr=0.01,
        )
        lp = run_linear_probe(lp_args)
        report.add("Pascal linear-probe mIoU (best)",
                   float(lp["best_miou"]), args.expected_linear_miou,
                   args.tolerance)

    if args.cbfe and args.pascal_root:
        print("\n== stage 6: CBFE foreground extraction + masked mIoU ==")
        import argparse as _ap

        from timetuning_tpu.cli.cbfe import run_cbfe

        cb_args = _ap.Namespace(
            architecture=args.architecture, model_path=args.timet_pth,
            pascal_root=args.pascal_root, batch_size=args.cbfe_batch_size,
            num_clusters=args.cbfe_clusters,
            input_resolution=args.cbfe_input_resolution,
            resolution=args.cbfe_resolution,
            eval_resolution=args.cbfe_resolution,
            num_eval_clusters=args.pascal_clusters, many_to_one=True,
        )
        cb = run_cbfe(cb_args)
        report.add("CBFE val Jaccard", cb["val_jaccard"],
                   args.expected_cbfe_jaccard, args.tolerance)
        report.add("CBFE val boundary-F", cb["val_bf"], None, args.tolerance)
        report.add("CBFE masked mIoU (many-to-one)", cb["masked_miou"],
                   args.expected_cbfe_miou, args.tolerance)

    if args.train_trajectory and args.ytvos_root and args.pascal_root:
        print("\n== stage 7: training-trajectory replication "
              f"({args.trajectory_epochs} epochs on {args.ytvos_root}) ==")
        import json as _json
        import os as _os

        from timetuning_tpu.core.train import TrainingConfig, run_training

        # the reference trainer's config (time_tuning.py:617-645 defaults):
        # dino-s16 init, YTVOS uniform 4-frame clips, bs 128, teacher EMA,
        # Pascal dataset-wise eval (k=21, res input/2) every 4 epochs
        result = run_training(TrainingConfig(
            architecture=args.architecture,
            model_path=args.timet_pth,
            dataset="ytvos",
            data_root=args.ytvos_root,
            pascal_root=args.pascal_root,
            log_dir=_os.path.join(
                _os.path.dirname(args.report_json) if args.report_json
                else ".", "trajectory_logs"),
            batch_size=args.trajectory_batch_size,
            num_epochs=args.trajectory_epochs,
            eval_every=4,
            eval_num_clusters=args.pascal_clusters,
            input_resolution=args.input_resolution,
            num_workers=args.num_workers,
        ))
        traj = []
        mpath = _os.path.join(result["run_dir"], "metrics.jsonl")
        with open(mpath) as f:
            for line in f:
                row = _json.loads(line)
                if row.get("tag") == "Scores/localization":
                    traj.append((row["step"], round(row["value"], 4)))
        print(f"  Scores/localization trajectory: {traj}")
        final = traj[-1][1] if traj else float("nan")
        report.add("trajectory final Scores/localization", final,
                   args.expected_localization, args.trajectory_tolerance)

    return report.summary(report_json=args.report_json)


if __name__ == "__main__":
    raise SystemExit(main())
