from timetuning_tpu.data.transforms import AugmentConfig, augment_batch, eval_preprocess_batch

__all__ = ["AugmentConfig", "augment_batch", "eval_preprocess_batch"]
