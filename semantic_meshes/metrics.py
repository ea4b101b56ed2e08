"""jnp-native segmentation metrics: Accuracy, MeanIoU, ConfusionMatrix.

Replacement for the tfcv.metric classes the reference eval harness uses
(ref: eval-scannet/eval_scannet.py:108-122). Same streaming API:
`update_state(gt_probs, pred_probs)` with (..., classes) one-hot/probability
tensors, `result()`, plus `reset_state()`.

Don't-care semantics:
- ground-truth pixels with sum(gt) <= 0.5 are ignored everywhere (the eval
  encodes unlabeled pixels as all-zero one-hots via label -1).
- predictions with sum(pred) <= 0.5 ("the fusion produced nothing"):
  * dontcare_prediction="error": counted as a wrong prediction (bucketed in
    an internal don't-care column: hits accuracy's denominator and the gt
    class's false negatives).
  * dontcare_prediction="forbidden": assumed absent; pixels are classified
    by argmax regardless.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DONT_CARE_THRESHOLD = 0.5


def _cm_from_classes(cm, gt_cls, gt_valid, pred, classes_num, pred_error):
    C = classes_num
    pred = pred.reshape(-1, pred.shape[-1])
    pred_cls = jnp.argmax(pred, axis=-1)
    if pred_error:
        pred_dc = jnp.sum(pred, axis=-1) <= DONT_CARE_THRESHOLD
        pred_cls = jnp.where(pred_dc, C, pred_cls)  # don't-care column
    flat = jnp.where(gt_valid, gt_cls, 0) * (C + 1) + pred_cls
    upd = jax.ops.segment_sum(
        gt_valid.astype(jnp.float32),
        flat.astype(jnp.int32),
        num_segments=C * (C + 1),
    ).reshape(C, C + 1)
    return cm + upd


@functools.partial(jax.jit, static_argnames=("classes_num", "pred_error"))
def _confusion_update(cm, gt, pred, *, classes_num, pred_error):
    gt = gt.reshape(-1, gt.shape[-1])
    gt_valid = jnp.sum(gt, axis=-1) > DONT_CARE_THRESHOLD
    gt_cls = jnp.argmax(gt, axis=-1)
    return _cm_from_classes(cm, gt_cls, gt_valid, pred, classes_num,
                            pred_error)


@functools.partial(jax.jit, static_argnames=("classes_num", "pred_error"))
def _confusion_update_labels(cm, gt_labels, pred, *, classes_num,
                             pred_error):
    """Label-based update: gt as an integer image (-1 = ignore) instead of a
    one-hot tensor — keeps the device<->host traffic to a few MB per frame
    (a (1296, 968, 40) one-hot is 200 MB; the labels are 5 MB)."""
    gt_labels = gt_labels.reshape(-1)
    gt_valid = gt_labels >= 0
    gt_cls = jnp.maximum(gt_labels, 0)
    return _cm_from_classes(cm, gt_cls, gt_valid, pred, classes_num,
                            pred_error)


class ConfusionMatrix:
    name = "confusion_matrix"

    def __init__(self, classes_num, dontcare_prediction="error"):
        if dontcare_prediction not in ("error", "forbidden"):
            raise ValueError(
                f"dontcare_prediction must be 'error' or 'forbidden', got "
                f"{dontcare_prediction!r}"
            )
        self.classes_num = int(classes_num)
        self.pred_error = dontcare_prediction == "error"
        self.reset_state()

    def reset_state(self):
        # rows: gt class; cols: pred class + trailing don't-care bucket
        self._cm = jnp.zeros(
            (self.classes_num, self.classes_num + 1), jnp.float32
        )

    def update_state(self, gt_probs, pred_probs):
        self._cm = _confusion_update(
            self._cm,
            jnp.asarray(gt_probs, jnp.float32),
            jnp.asarray(pred_probs, jnp.float32),
            classes_num=self.classes_num,
            pred_error=self.pred_error,
        )

    def update_state_labels(self, gt_labels, pred_probs):
        """Like update_state, but ground truth is an integer label image
        with -1 meaning ignore (40x less data movement than one-hot)."""
        self._cm = _confusion_update_labels(
            self._cm,
            jnp.asarray(gt_labels),
            jnp.asarray(pred_probs, jnp.float32),
            classes_num=self.classes_num,
            pred_error=self.pred_error,
        )

    @property
    def full_matrix(self):
        """(C, C+1) including the predicted-don't-care bucket column."""
        return self._cm

    def result(self):
        """(C, C) confusion matrix (don't-care bucket dropped, parity with
        the reference's YAML schema)."""
        return self._cm[:, : self.classes_num]

    # merging partial results across scenes/hosts (graph generator semantics,
    # ref: eval-scannet/create_scannet_eval_graphs.py:49-88)
    def merge(self, other):
        self._cm = self._cm + other._cm


class Accuracy(ConfusionMatrix):
    name = "accuracy"

    def result(self):
        cm = self._cm
        correct = jnp.trace(cm[:, : self.classes_num])
        total = jnp.sum(cm)
        return jnp.where(total > 0, correct / total, 0.0)


class MeanIoU(ConfusionMatrix):
    name = "mean_iou"

    def result(self):
        cm = self._cm
        C = self.classes_num
        inter = jnp.diagonal(cm[:, :C])
        gt_total = jnp.sum(cm, axis=1)  # includes don't-care bucket (FN)
        pred_total = jnp.sum(cm[:, :C], axis=0)
        union = gt_total + pred_total - inter
        present = gt_total > 0
        iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
        denom = jnp.maximum(jnp.sum(present), 1)
        return jnp.sum(jnp.where(present, iou, 0.0)) / denom


def one_hot_with_ignore(labels, classes_num):
    """Labels (int, -1 = ignore) -> one-hot with all-zero rows for ignored
    pixels (the eval's gt encoding, ref: eval_scannet.py:234-236)."""
    labels = jnp.asarray(labels)
    oh = jax.nn.one_hot(jnp.maximum(labels, 0), classes_num, dtype=jnp.float32)
    return jnp.where((labels >= 0)[..., None], oh, 0.0)


def colorize_classes(class_image, class_to_color, dont_care_mask=None,
                     dont_care_color=(0, 0, 0)):
    """Map a class-index image to RGB uint8 via a palette (script helper)."""
    palette = np.asarray(class_to_color, np.uint8)
    img = palette[np.asarray(class_image)]
    if dont_care_mask is not None:
        img = np.where(
            np.asarray(dont_care_mask)[..., None],
            np.asarray(dont_care_color, np.uint8),
            img,
        )
    return img
