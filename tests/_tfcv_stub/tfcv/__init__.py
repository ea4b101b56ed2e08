"""Minimal numpy-backed `tfcv` stand-in (see sibling tensorflow stub).

Mirrors the attribute paths the reference workflow uses
(ref: eval-scannet/eval_scannet.py:84-86,
python/scripts/colorize_cityscapes_mesh.py:39-43):

- tfcv.model.pretrained.tuinicr.esanet_resnet_v1b_34_nbt1d_nyuv2
  {create, preprocess}  (40-class NYUv2 RGB-D model)
- tfcv.model.pretrained.vladkryvoruchko.pspnet_resnet_v1s_101_cityscapes
  {create, preprocess}  (19-class Cityscapes model)
- tfcv.predict.{sliding, multi_scale}

The stub "models" emit deterministic pseudo-probabilities derived from the
input pixels; tests assert the pipeline runs and produces schema-correct
output, not metric quality.
"""

from types import SimpleNamespace

import numpy as np


def _pseudo_probs(color_hw3, classes):
    """Deterministic (H, W, classes) distribution from pixel content."""
    cls = np.asarray(color_hw3).sum(-1).astype(np.int64) % classes
    onehot = np.eye(classes, dtype=np.float32)[cls]
    return 0.9 * onehot + 0.1 / classes


def _esanet_create():
    def model(inputs, training=False):
        color_b = np.asarray(inputs[0], np.float32)  # (1, H, W, 3)
        return _pseudo_probs(color_b[0], 40)[None]

    return model


def _esanet_preprocess(color, depth):
    return (
        np.asarray(color, np.float32) / 255.0,
        np.asarray(depth, np.float32),
    )


def _pspnet_create():
    def model(x, *a, **kw):
        x = np.asarray(x, np.float32)  # (1, H, W, 3)
        return _pseudo_probs(x[0], 19)[None]

    return model


def _pspnet_preprocess(image):
    return np.asarray(image, np.float32) / 255.0


def _sliding(predictor, window, overlap):
    return predictor


def _multi_scale(predictor, scales):
    return predictor


model = SimpleNamespace(
    pretrained=SimpleNamespace(
        tuinicr=SimpleNamespace(
            esanet_resnet_v1b_34_nbt1d_nyuv2=SimpleNamespace(
                create=_esanet_create, preprocess=_esanet_preprocess,
            ),
        ),
        vladkryvoruchko=SimpleNamespace(
            pspnet_resnet_v1s_101_cityscapes=SimpleNamespace(
                create=_pspnet_create, preprocess=_pspnet_preprocess,
            ),
        ),
    ),
)
predict = SimpleNamespace(sliding=_sliding, multi_scale=_multi_scale)
