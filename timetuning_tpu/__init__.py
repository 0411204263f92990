"""timetuning_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities of
SMSD75/Timetuning (TimeT, ICCV 2023): self-supervised time-tuning of dense ViT
representations on unlabeled video, plus the full unsupervised-segmentation
evaluation suite (clustering mIoU, mask propagation J&F, linear probing, CBFE).

Built from scratch, TPU-first:
  * compute path: jit/pjit over a `jax.sharding.Mesh`, bf16 matmuls on the MXU,
    Pallas kernels for the hot attention/propagation ops;
  * data parallelism via NamedSharding + `lax.psum` (replaces the reference's
    DDP/NCCL, reference: time_tuning.py:516-521, my_utils.py:246-274);
  * host side: threaded data pipeline feeding device-resident fused
    augmentation kernels.

Layer map (mirrors SURVEY.md §1/§7):
  data/      dataset trees + clip samplers + on-device clip-consistent augs
  models/    backbone zoo (ViT/ResNet/...), FeatureExtractor, torch ckpt import
  core/      TimeT state + loss + train step + optimizer + schedules + ckpt
  ops/       sinkhorn, label propagation, k-means/PCA, matching, pallas kernels
  eval/      mIoU metrics, Evaluator protocols, J&F, linear probe, CBFE, bfscore
  parallel/  mesh construction + sharding rules
  obs/       logging/TB scalars, artifacts, profiling
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level conveniences (kept lazy so `import timetuning_tpu`
    stays cheap and backend-agnostic)."""
    lazy = {
        "TimeT": ("timetuning_tpu.core.timet", "TimeT"),
        "TimeTConfig": ("timetuning_tpu.core.timet", "TimeTConfig"),
        "make_train_step": ("timetuning_tpu.core.timet", "make_train_step"),
        "TrainingConfig": ("timetuning_tpu.core.train", "TrainingConfig"),
        "run_training": ("timetuning_tpu.core.train", "run_training"),
        "FeatureExtractor": ("timetuning_tpu.models.extractor", "FeatureExtractor"),
        "get_backbone": ("timetuning_tpu.models.registry", "get_backbone"),
        "make_loader": ("timetuning_tpu.data.loader", "make_loader"),
        "pascal_loader": ("timetuning_tpu.data.pascal", "pascal_loader"),
        "Evaluator": ("timetuning_tpu.eval.evaluator", "Evaluator"),
        "PredsmIoU": ("timetuning_tpu.eval.metrics", "PredsmIoU"),
        "propagate_labels": ("timetuning_tpu.ops.propagation", "propagate_labels"),
        "sinkhorn": ("timetuning_tpu.ops.sinkhorn", "sinkhorn"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'timetuning_tpu' has no attribute {name!r}")
