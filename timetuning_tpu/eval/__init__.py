from timetuning_tpu.eval.metrics import PredsmIoU

__all__ = ["PredsmIoU"]
