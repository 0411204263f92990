"""Evaluation harness: the three clustering-mIoU protocols.

Reference: ``Evaluator`` + ``evaluate_localizations`` (evaluation.py:250-485).
Protocols:
  * frame-wise   — Hungarian/many-to-one match per frame, mean over frames;
  * sample-wise  — one match per clip, mean over clips;
  * dataset-wise — features of the whole set clustered together, one global
                   match (ignore-index pixels excluded, the Pascal ``!=255``
                   filter hardcoded at evaluation.py:303-306).

The harness is decoupled from data loading: it takes an iterator factory
yielding ``(frames [B, F, H, W, 3], annotations [B, F, h, w])`` host arrays
and a ``feature_fn``. Feature extraction, attention masking, PCA, k-means and
confusion-matrix accumulation all run on device; only the class matching is
host-side (tiny).
"""

from __future__ import annotations

import logging
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from timetuning_tpu.eval.clustering import cluster_features, proto_clustering
from timetuning_tpu.eval.metrics import PredsmIoU
from timetuning_tpu.models.extractor import apply_attention_mask
from timetuning_tpu.ops.resize import resize_nearest


def evaluate_localizations(
    preds_eval: PredsmIoU,
    gts: np.ndarray,          # [B, F, h, w] int
    preds: np.ndarray,        # [B, F, h, w] int
    evaluation_protocol: str,
    many_to_one: bool = False,
    precision_based: bool = False,
    ignore_index: int | None = None,
    logging_directory: str | None = None,
    clip_offset: int = 0,
) -> float:
    """Match cluster maps to annotations under a protocol; returns mean mIoU
    (reference evaluation.py:250-310). With ``logging_directory``, writes
    per-clip gifs of the matched (reordered) and raw cluster maps
    (reference :270-300)."""
    from timetuning_tpu.obs.viz import colorize_segmentation, write_gif

    B, F = preds.shape[:2]
    scores = []

    def log_clip(i, reordered_frames, raw_frames, clip_score):
        if logging_directory is None:
            return
        import os

        sub = os.path.join(logging_directory, evaluation_protocol)
        os.makedirs(sub, exist_ok=True)
        # clip_offset keeps names unique across the caller's batches —
        # batch-local indices alone would overwrite same-score clips
        n = clip_offset + i
        write_gif(
            [colorize_segmentation(f) for f in reordered_frames],
            os.path.join(sub, f"score_{clip_score:.3f}_reordered_{n}.gif"),
        )
        write_gif(
            [colorize_segmentation(f) for f in raw_frames],
            os.path.join(sub, f"score_{clip_score:.3f}_inorder_{n}.gif"),
        )

    if evaluation_protocol == "frame-wise":
        for i in range(B):
            clip_scores, reordered = [], []
            for j in range(F):
                preds_eval.update(gts[i, j].reshape(-1), preds[i, j].reshape(-1))
                s, _, _, _, mapping, _ = preds_eval.compute(
                    True, many_to_one, precision_based
                )
                clip_scores.append(s)
                if logging_directory is not None:
                    reordered.append(preds_eval.remap(preds[i, j], mapping))
                preds_eval.reset()
            scores += clip_scores
            log_clip(i, reordered, list(preds[i]), float(np.mean(clip_scores)))
    elif evaluation_protocol == "sample-wise":
        for i in range(B):
            for j in range(F):
                preds_eval.update(gts[i, j].reshape(-1), preds[i, j].reshape(-1))
            s, _, _, _, mapping, _ = preds_eval.compute(
                True, many_to_one, precision_based
            )
            scores.append(s)
            if logging_directory is not None:
                log_clip(
                    i,
                    [preds_eval.remap(preds[i, j], mapping) for j in range(F)],
                    list(preds[i]),
                    float(s),
                )
            preds_eval.reset()
    elif evaluation_protocol == "dataset-wise":
        if logging_directory is not None:
            logging.getLogger("timetuning_tpu.eval").warning(
                "gif logging is a frame-/sample-wise feature (reference "
                "evaluation.py:255-300) — no artifacts for dataset-wise"
            )
        for i in range(B):
            for j in range(F):
                g = gts[i, j].reshape(-1)
                p = preds[i, j].reshape(-1)
                if ignore_index is not None:
                    keep = g != ignore_index
                    g, p = g[keep], p[keep]
                preds_eval.update(g, p)
        scores.append(preds_eval.compute(True, many_to_one, precision_based)[0])
        preds_eval.reset()
    else:
        raise ValueError(f"unknown protocol {evaluation_protocol}")
    return float(np.mean(scores))


def evaluate_propagation(preds_eval: PredsmIoU, gts: np.ndarray, preds: np.ndarray) -> float:
    """Mean per-object propagation J over clips (reference
    evaluation.py:228-246)."""
    B, F = preds.shape[:2]
    all_scores = []
    for i in range(B):
        preds_eval.reset()
        for j in range(F):
            # reference passes (pred, gt) into update(gt=..., pred=...) —
            # the propagation score is symmetric in tp/fn bookkeeping per
            # object, we keep the (gt, pred) order.
            preds_eval.update_frame(gts[i, j].reshape(-1), preds[i, j].reshape(-1))
        all_scores += preds_eval.compute_propagation_score(True)
    preds_eval.reset()
    return float(np.mean(all_scores))


class Evaluator:
    """Owns the data iterator, feature fn and metric; runs the protocols.

    ``feature_fn(frames, use_head) -> (features [B*F, N, D], attentions)``
    — typically a jitted TimeT/FeatureExtractor apply.

    Deliberate reference asymmetry, kept for score parity (evaluation.py:
    387-485): precomputed ``fg_masks`` are applied only by the
    dataset-wise/streaming paths (reference :418-427), and ``uvos``
    annotation binarization only by the sample-/frame-wise batch path
    (reference :464-467) — the reference never routes either flag through
    the other protocol.
    """

    def __init__(
        self,
        data_iter_factory: Callable[[], Iterable],
        feature_fn,
        spatial_resolution: int,
        num_classes: int = 10,
        involve_bg: bool = True,
        clustering_algorithm: str = "k-means",
        prototypes=None,
        uvos: bool = False,
        fg_masks: np.ndarray | None = None,
        ignore_index: int | None = 255,
        logger: logging.Logger | None = None,
        logging_directory: str | None = None,
    ):
        self.data_iter_factory = data_iter_factory
        self.feature_fn = feature_fn
        self.res = spatial_resolution
        self.metric = PredsmIoU(
            max(num_classes, 256), max(num_classes, 256), involve_bg=involve_bg
        )
        self.clustering_algorithm = clustering_algorithm
        self.prototypes = prototypes
        self.uvos = uvos
        self.fg_masks = fg_masks
        self.ignore_index = ignore_index
        self.logger = logger or logging.getLogger("timetuning_tpu.eval")
        # reference Evaluator writes reordered/raw cluster-map gifs under
        # its logging directory during evaluation (evaluation.py:270-300)
        self.logging_directory = logging_directory

    def _extract(self, frames, use_mask):
        B, F = frames.shape[:2]
        flat = frames.reshape((B * F,) + frames.shape[2:])
        feats, attn = self.feature_fn(flat, use_mask)
        N, D = feats.shape[-2:]
        feats = feats.reshape(B, F, N, D)
        if use_mask and attn is not None and self.fg_masks is None:
            feats, _ = apply_attention_mask(feats, attn, self.res)
        return feats

    def _cluster(self, feats, protocol, eval_res, k, use_annotations, annotations):
        if self.clustering_algorithm == "k-means":
            return np.asarray(
                cluster_features(
                    feats, k, eval_res, protocol,
                    annotations=annotations if use_annotations else None,
                )
            )
        if self.clustering_algorithm == "prototypes":
            assert self.prototypes is not None
            return np.asarray(
                proto_clustering(feats, self.prototypes, eval_res, num_classes=k)
            )
        raise ValueError(self.clustering_algorithm)

    def _mask_batch(self, feats, offset):
        """Apply precomputed FG masks to a feature batch (patch-level
        multiply, same as the in-memory path). ``fg_masks`` is either
        clip-level [total_clips, F, h, w] (what cli/cbfe passes) or
        frame-level [total_frames, h, w]; ``offset`` counts CLIPS consumed
        so far — frame-level arrays index by ``offset * F``."""
        if self.fg_masks is None:
            return feats
        B, F = feats.shape[:2]
        if np.ndim(self.fg_masks) == 4:
            m = jnp.asarray(self.fg_masks[offset:offset + B], jnp.float32)
        else:
            m = jnp.asarray(
                self.fg_masks[offset * F:(offset + B) * F], jnp.float32
            )
        m = resize_nearest(m.reshape(B, F, *m.shape[-2:]), (self.res, self.res))
        return feats * m.reshape(B, F, -1, 1)

    def _evaluate_dataset_streaming_protos(
        self, many_to_one, eval_resolution, num_clusters, use_mask,
        precision_based,
    ) -> float:
        """Bounded-memory dataset-wise prototype-argmax protocol: scores are
        per-batch argmaxes against the fixed prototype bank, so one pass
        suffices (matches the in-memory proto_clustering path)."""
        assert self.prototypes is not None
        r = eval_resolution
        offset = 0
        merge = None
        if num_clusters is not None and num_clusters < self.prototypes.shape[0]:
            # the prototype-merge k-means depends only on the bank — compute
            # it ONCE instead of re-fitting identically inside every batch's
            # proto_clustering call
            from timetuning_tpu.eval.clustering import prototype_merge_table

            merge = np.asarray(prototype_merge_table(
                jnp.asarray(self.prototypes), num_clusters
            ))
        for batch in self.data_iter_factory():
            frames, annotations = batch[0], batch[1]
            frames = jnp.asarray(frames)
            if frames.ndim == 4:
                frames = frames[:, None]
                annotations = np.asarray(annotations)[:, None]
            feats = self._mask_batch(self._extract(frames, use_mask), offset)
            preds = np.asarray(
                proto_clustering(feats, self.prototypes, r, num_classes=None)
            )
            if merge is not None:
                preds = merge[preds]
            annots = np.asarray(
                resize_nearest(jnp.asarray(np.asarray(annotations),
                                           jnp.float32), (r, r))
            ).astype(np.int64)
            for i in range(preds.shape[0]):
                for j in range(preds.shape[1]):
                    g = annots[i, j].reshape(-1)
                    p = preds[i, j].reshape(-1)
                    if self.ignore_index is not None:
                        keep = g != self.ignore_index
                        g, p = g[keep], p[keep]
                    self.metric.update(g, p)
            offset += preds.shape[0]
        score = self.metric.compute(True, many_to_one, precision_based)[0]
        self.metric.reset()
        self.logger.info("dataset-wise score %s (streaming, prototypes)", score)
        return score

    def _evaluate_dataset_streaming(
        self,
        many_to_one: bool,
        eval_resolution: int,
        num_clusters: int,
        use_mask: bool,
        precision_based: bool,
        pca_dim: int = 50,
        sample_cap: int | None = None,
        use_annotations: bool = False,
    ) -> float:
        """Bounded-memory dataset-wise protocol.

        The in-memory path concatenates every batch's [B, F, N, D] features
        on device before clustering — fine for Pascal val (~0.4 GB), OOM for
        YTVOS-scale sets (the reference streamed to host instead,
        evaluation.py:417-430). This path never holds more than one batch:

          pass 1  PCA sufficient statistics (Σx, Σxxᵀ on device, folded into
                  float64 host accumulators) + a bounded uniform sample of
                  *upsampled* pixels for the k-means fit. faiss itself trains
                  on ≤ 256·k subsampled points (``max_points_per_centroid``),
                  so a sampled fit is the reference's own semantics.
          pass 2  reduce (patch level) → bilinear upsample → nearest-centroid
                  assign → confusion-matrix update, batch by batch.

        Since standardize+PCA and bilinear upsampling are both linear,
        reduce-then-upsample equals upsample-then-reduce; with an uncapped
        sample this path reproduces the in-memory result exactly (tested).
        """
        from timetuning_tpu.ops.kmeans import (
            apply_pca,
            init_moments,
            kmeans,
            kmeans_assign,
            pca_from_moments,
            update_moments,
        )
        from timetuning_tpu.ops.resize import patch_grid_to_image

        k = num_clusters
        r = eval_resolution
        if self.clustering_algorithm == "prototypes":
            # prototype-argmax needs no fit — one streaming pass
            return self._evaluate_dataset_streaming_protos(
                many_to_one, r, k, use_mask, precision_based
            )
        if sample_cap is None:
            sample_cap = max(256 * k, 16384)

        import functools

        @functools.partial(jax.jit, static_argnames=("n",))
        def sample_pixels(feats, key, n):
            B, F, N, D = feats.shape
            res = int(round(N ** 0.5))
            maps = patch_grid_to_image(
                feats.reshape(B * F, N, D), (res, res), (r, r)
            ).reshape(B * F * r * r, D)
            if n >= maps.shape[0]:
                return maps  # keep original order → bit-compatible with the
                # in-memory fit when the cap covers every pixel
            # with-replacement draw (negligible collisions at sampling scale;
            # avoids sorting the whole pixel pool on device)
            idx = jax.random.randint(key, (n,), 0, maps.shape[0])
            return maps[idx]

        # ---- pass 1: moments + pixel sample --------------------------------
        moments = None
        samples = []
        key = jax.random.PRNGKey(1)   # reference pins seed=1 (clustering.py:38)
        offset = 0
        n_batches = 0
        uniq: set = set()
        for batch in self.data_iter_factory():
            frames, annotations = batch[0], batch[1]
            frames = jnp.asarray(frames)
            if frames.ndim == 4:
                frames = frames[:, None]
            if use_annotations:
                # k = #unique labels (reference clustering.py:31-32) — the
                # in-memory path infers from annotations already resized to
                # eval resolution, so count the same thing
                resized = np.asarray(
                    resize_nearest(
                        jnp.asarray(np.asarray(annotations), jnp.float32),
                        (r, r),
                    )
                ).astype(np.int64)
                uniq |= set(np.unique(resized).tolist())
            feats = self._mask_batch(self._extract(frames, use_mask), offset)
            B, F, N, D = feats.shape
            if moments is None:
                moments = init_moments(D)
            moments = update_moments(moments, feats.reshape(B * F * N, D))
            key, k_s = jax.random.split(key)
            n_pix = B * F * r * r
            n_take = min(max(sample_cap // 8, 1024), n_pix)
            samples.append(np.asarray(sample_pixels(feats, k_s, n_take)))
            offset += B
            n_batches += 1
        if moments is None:
            raise ValueError("empty evaluation dataset")
        if use_annotations and uniq:
            k = len(uniq)

        pca = pca_from_moments(moments, min(pca_dim, samples[0].shape[-1]))
        sample = np.concatenate(samples, axis=0)
        if sample.shape[0] > sample_cap:
            keep = np.random.default_rng(1).choice(
                sample.shape[0], sample_cap, replace=False
            )
            sample = sample[keep]
        reduced_sample = apply_pca(pca, jnp.asarray(sample))
        fit = kmeans(reduced_sample, k, jax.random.PRNGKey(1), n_iter=50, n_redo=5)
        self.logger.info(
            "streaming dataset-wise: fit k=%d on %d sampled pixels "
            "(%d batches, objective %.4g)",
            k, sample.shape[0], n_batches, float(fit.objective),
        )

        @jax.jit
        def assign_batch(feats):
            B, F, N, D = feats.shape
            res = int(round(N ** 0.5))
            red = apply_pca(pca, feats.reshape(B * F * N, D))
            maps = patch_grid_to_image(
                red.reshape(B * F, N, -1), (res, res), (r, r)
            )
            a = kmeans_assign(maps.reshape(B * F * r * r, -1), fit.centroids)
            return a.reshape(B, F, r, r)

        # ---- pass 2: assign + streaming confusion update --------------------
        offset = 0
        for batch in self.data_iter_factory():
            frames, annotations = batch[0], batch[1]
            frames = jnp.asarray(frames)
            if frames.ndim == 4:
                frames = frames[:, None]
                annotations = np.asarray(annotations)[:, None]
            feats = self._mask_batch(self._extract(frames, use_mask), offset)
            preds = np.asarray(assign_batch(feats))
            annots = np.asarray(
                resize_nearest(jnp.asarray(np.asarray(annotations), jnp.float32),
                               (r, r))
            ).astype(np.int64)
            B, F = preds.shape[:2]
            for i in range(B):
                for j in range(F):
                    g = annots[i, j].reshape(-1)
                    p = preds[i, j].reshape(-1)
                    if self.ignore_index is not None:
                        keep = g != self.ignore_index
                        g, p = g[keep], p[keep]
                    self.metric.update(g, p)
            offset += B
        score = self.metric.compute(True, many_to_one, precision_based)[0]
        self.metric.reset()
        self.logger.info("dataset-wise score %s (streaming)", score)
        return score

    def evaluate(
        self,
        many_to_one: bool = False,
        evaluation_protocol: str = "frame-wise",
        eval_resolution: int = 112,
        num_clusters: int = 10,
        use_mask: bool = False,
        use_annotations: bool = False,
        precision_based: bool = False,
        streaming: bool = False,
        sample_cap: int | None = None,
    ) -> float:
        if evaluation_protocol == "dataset-wise" and streaming:
            return self._evaluate_dataset_streaming(
                many_to_one=many_to_one,
                eval_resolution=eval_resolution,
                num_clusters=num_clusters,
                use_mask=use_mask,
                precision_based=precision_based,
                sample_cap=sample_cap,
                use_annotations=use_annotations,
            )
        if evaluation_protocol == "dataset-wise":
            feats_all, annots_all = [], []
            for batch in self.data_iter_factory():
                frames, annotations = batch[0], batch[1]
                frames = jnp.asarray(frames)
                if frames.ndim == 4:      # image dataset → single-frame clips
                    frames = frames[:, None]
                    annotations = np.asarray(annotations)[:, None]
                feats_all.append(self._extract(frames, use_mask))
                annots_all.append(np.asarray(annotations))
            feats = jnp.concatenate(feats_all, axis=0)
            annotations = np.concatenate(annots_all, axis=0)
            if self.fg_masks is not None:
                m = jnp.asarray(self.fg_masks, jnp.float32)
                m = resize_nearest(m.reshape(feats.shape[0], feats.shape[1], *m.shape[-2:]),
                                   (self.res, self.res))
                feats = feats * m.reshape(feats.shape[0], feats.shape[1], -1, 1)
            annotations = np.asarray(
                resize_nearest(jnp.asarray(annotations, jnp.float32),
                               (eval_resolution, eval_resolution))
            ).astype(np.int64)
            cluster_maps = self._cluster(
                feats, evaluation_protocol, eval_resolution, num_clusters,
                use_annotations, annotations,
            )
            score = evaluate_localizations(
                self.metric, annotations, cluster_maps, evaluation_protocol,
                many_to_one, precision_based, ignore_index=self.ignore_index,
                logging_directory=self.logging_directory,
            )
            self.logger.info("dataset-wise score %s", score)
            return score

        batch_scores = []
        clips_seen = 0
        for batch in self.data_iter_factory():
            frames, annotations = batch[0], batch[1]
            frames = jnp.asarray(frames)
            annotations = np.asarray(annotations)
            if frames.ndim == 4:      # image dataset → single-frame clips
                frames = frames[:, None]
                annotations = annotations[:, None]
            feats = self._extract(frames, use_mask)
            if self.uvos:
                annotations = (annotations > 0).astype(np.int64)
            annotations = np.asarray(
                resize_nearest(jnp.asarray(annotations, jnp.float32),
                               (eval_resolution, eval_resolution))
            ).astype(np.int64)
            cluster_maps = self._cluster(
                feats, evaluation_protocol, eval_resolution, num_clusters,
                use_annotations, annotations,
            )
            batch_scores.append(
                evaluate_localizations(
                    self.metric, annotations, cluster_maps, evaluation_protocol,
                    many_to_one, precision_based,
                    logging_directory=self.logging_directory,
                    clip_offset=clips_seen,
                )
            )
            clips_seen += int(annotations.shape[0])
            self.logger.info("batch score %s", batch_scores[-1])
        # reference semantics: the dataset score is the MEAN OF PER-BATCH
        # scores (evaluation.py:483), ragged final batch included as one term
        return float(np.mean(batch_scores))
