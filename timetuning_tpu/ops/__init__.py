from timetuning_tpu.ops.sinkhorn import sinkhorn, sinkhorn_assignment
from timetuning_tpu.ops.propagation import (
    neighborhood_mask,
    label_propagation_step,
    propagate_labels,
)

__all__ = [
    "sinkhorn",
    "sinkhorn_assignment",
    "neighborhood_mask",
    "label_propagation_step",
    "propagate_labels",
]
