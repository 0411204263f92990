from timetuning_tpu.core.schedules import cosine_scheduler

__all__ = ["cosine_scheduler"]
