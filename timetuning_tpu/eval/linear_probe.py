"""Linear probing of frozen TimeT features on Pascal VOC.

Reference: linear_finetune.py — a 1×1 conv head over the frozen backbone's
28×28 patch grid, bilinearly upsampled to ``mask_size``, trained with
SGD(lr=0.01, momentum=0.9, wd=1e-4) + StepLR(20, γ=0.1) and
CE(ignore_index=255) for 50 epochs (:55-89); validation reports
``PredsmIoU`` in linear-probe mode (no matching, :34-51).

TPU-native: features are extracted once per batch with the frozen backbone
under jit, and the head's train step (probe forward + masked CE + SGD) is a
second jitted function. The step-decay schedule is an optax
piecewise_constant_schedule.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from timetuning_tpu.eval.metrics import PredsmIoU
from timetuning_tpu.models.heads import LinearProbeHead
from timetuning_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass
class LinearProbeConfig:
    num_classes: int = 21
    mask_size: int = 100
    lr: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 1e-4
    lr_drop_every: int = 20     # epochs
    lr_drop_factor: float = 0.1
    num_epochs: int = 50
    ignore_index: int = 255


class LinearProbeTrainer:
    """Head-only trainer over a frozen ``feature_fn``.

    ``feature_fn(frames_u8) -> [B, N, D]`` — typically jitted
    eval-preprocess + backbone forward (no head).
    """

    def __init__(self, feature_fn: Callable, spatial_resolution: int,
                 cfg: LinearProbeConfig, steps_per_epoch: int):
        self.feature_fn = feature_fn
        self.res = spatial_resolution
        self.cfg = cfg
        self.head = LinearProbeHead(cfg.num_classes)
        self.params = None
        sched = optax.piecewise_constant_schedule(
            cfg.lr,
            {cfg.lr_drop_every * steps_per_epoch * i: cfg.lr_drop_factor
             for i in range(1, cfg.num_epochs // cfg.lr_drop_every + 1)},
        )
        self.tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(sched, momentum=cfg.momentum),
        )
        self.opt_state = None
        self._step = jax.jit(self._train_step)
        self._fwd = jax.jit(self._forward)

    def _forward(self, params, feats):
        B, N, D = feats.shape
        grid = feats.reshape(B, self.res, self.res, D)
        logits = self.head.apply({"params": params}, grid)
        return resize_bilinear(
            jnp.transpose(logits, (0, 3, 1, 2)),
            (self.cfg.mask_size, self.cfg.mask_size),
        )                                                     # [B, C, S, S]

    def _train_step(self, params, opt_state, feats, masks):
        def loss_fn(p):
            logits = self._forward(p, feats)                  # [B, C, S, S]
            logits = jnp.transpose(logits, (0, 2, 3, 1))
            labels = masks.astype(jnp.int32)
            valid = labels != self.cfg.ignore_index
            safe = jnp.where(valid, labels, 0)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, safe)
            return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def init(self, sample_feats):
        B, N, D = sample_feats.shape
        self.params = self.head.init(
            jax.random.PRNGKey(0), jnp.zeros((1, self.res, self.res, D))
        )["params"]
        self.opt_state = self.tx.init(self.params)

    def train_epoch(self, loader) -> float:
        losses = []
        for frames, masks in loader:
            feats = self.feature_fn(frames)
            if self.params is None:
                self.init(feats)
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, feats, jnp.asarray(masks)
            )
            losses.append(float(loss))
        return float(np.mean(losses))

    def validate(self, loader) -> float:
        """mIoU with linear_probe matching (reference linear_finetune.py:34-51)."""
        metric = PredsmIoU(self.cfg.num_classes, self.cfg.num_classes,
                           involve_bg=True)
        for frames, masks in loader:
            feats = self.feature_fn(frames)
            logits = self._fwd(self.params, feats)
            preds = np.asarray(jnp.argmax(logits, axis=1))
            masks = np.asarray(masks)
            keep = masks != self.cfg.ignore_index
            metric.update(masks[keep].reshape(-1), preds[keep].reshape(-1))
        return metric.compute(True, linear_probe=True)[0]
