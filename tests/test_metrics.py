import numpy as np
import pytest

from semantic_meshes import metrics


def _oh(labels, C):
    labels = np.asarray(labels)
    out = np.zeros(labels.shape + (C,), np.float32)
    valid = labels >= 0
    idx = np.nonzero(valid)
    out[idx + (labels[valid],)] = 1.0
    return out


class TestConfusionMatrix:
    def test_basic_counts(self):
        C = 4
        gt = np.array([[0, 1], [2, 3]])
        pred = np.array([[0, 2], [2, 3]])
        m = metrics.ConfusionMatrix(C)
        m.update_state(_oh(gt, C), _oh(pred, C))
        cm = np.asarray(m.result())
        expect = np.zeros((C, C))
        for g, p in zip(gt.ravel(), pred.ravel()):
            expect[g, p] += 1
        np.testing.assert_array_equal(cm, expect)

    def test_gt_dont_care_ignored(self):
        C = 3
        gt = np.array([0, -1, 2])
        pred = np.array([0, 1, 2])
        m = metrics.ConfusionMatrix(C)
        m.update_state(_oh(gt, C), _oh(pred, C))
        assert np.asarray(m.result()).sum() == 2

    def test_pred_dont_care_error_mode(self):
        C = 3
        gt = np.array([0, 1])
        pred_probs = _oh(np.array([0, 1]), C)
        pred_probs[1] = 0.0  # predicted nothing
        m = metrics.Accuracy(C, dontcare_prediction="error")
        m.update_state(_oh(gt, C), pred_probs)
        assert abs(float(m.result()) - 0.5) < 1e-6

    def test_pred_dont_care_forbidden_mode(self):
        C = 3
        gt = np.array([0, 1])
        pred_probs = _oh(np.array([0, 1]), C)
        pred_probs[1] = 0.0  # argmax -> class 0 under "forbidden"
        m = metrics.Accuracy(C, dontcare_prediction="forbidden")
        m.update_state(_oh(gt, C), pred_probs)
        assert abs(float(m.result()) - 0.5) < 1e-6  # class 0 != gt 1

    def test_invalid_mode_raises(self):
        with pytest.raises(ValueError):
            metrics.Accuracy(3, dontcare_prediction="nope")


class TestAccuracyMeanIoU:
    def test_streaming_equals_batch(self):
        rng = np.random.default_rng(0)
        C = 5
        gt = rng.integers(0, C, 400)
        pred = np.where(rng.random(400) < 0.7, gt, rng.integers(0, C, 400))
        m1 = metrics.Accuracy(C)
        m1.update_state(_oh(gt, C), _oh(pred, C))
        m2 = metrics.Accuracy(C)
        for i in range(0, 400, 100):
            m2.update_state(_oh(gt[i:i+100], C), _oh(pred[i:i+100], C))
        np.testing.assert_allclose(
            float(m1.result()), float(m2.result()), atol=1e-6
        )
        np.testing.assert_allclose(float(m1.result()), np.mean(gt == pred),
                                   atol=1e-6)

    def test_mean_iou_oracle(self):
        C = 3
        gt = np.array([0, 0, 1, 1, 2, 2])
        pred = np.array([0, 1, 1, 1, 2, 0])
        m = metrics.MeanIoU(C)
        m.update_state(_oh(gt, C), _oh(pred, C))
        # class0: inter 1, union 1(gt0)+... gt{0,0},pred{0,...}: tp=1 fn=1 fp=1 -> 1/3
        # class1: tp=2 fn=0 fp=1 -> 2/3; class2: tp=1 fn=1 fp=0 -> 1/2
        expect = (1 / 3 + 2 / 3 + 1 / 2) / 3
        np.testing.assert_allclose(float(m.result()), expect, atol=1e-6)

    def test_absent_class_excluded(self):
        C = 4  # class 3 never appears in gt
        gt = np.array([0, 1, 2])
        pred = np.array([0, 1, 2])
        m = metrics.MeanIoU(C)
        m.update_state(_oh(gt, C), _oh(pred, C))
        np.testing.assert_allclose(float(m.result()), 1.0, atol=1e-6)

    def test_merge(self):
        rng = np.random.default_rng(1)
        C = 4
        gt = rng.integers(0, C, 200)
        pred = rng.integers(0, C, 200)
        whole = metrics.ConfusionMatrix(C)
        whole.update_state(_oh(gt, C), _oh(pred, C))
        a = metrics.ConfusionMatrix(C)
        b = metrics.ConfusionMatrix(C)
        a.update_state(_oh(gt[:100], C), _oh(pred[:100], C))
        b.update_state(_oh(gt[100:], C), _oh(pred[100:], C))
        a.merge(b)
        np.testing.assert_array_equal(
            np.asarray(a.result()), np.asarray(whole.result())
        )


def test_one_hot_with_ignore():
    oh = np.asarray(metrics.one_hot_with_ignore(np.array([1, -1, 0]), 3))
    np.testing.assert_array_equal(
        oh, [[0, 1, 0], [0, 0, 0], [1, 0, 0]]
    )


def test_colorize_classes():
    pal = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    img = metrics.colorize_classes(
        np.array([[0, 1]]), pal, dont_care_mask=np.array([[False, True]])
    )
    np.testing.assert_array_equal(img, [[[255, 0, 0], [0, 0, 0]]])


def test_update_state_labels_matches_probs():
    rng = np.random.default_rng(7)
    C = 5
    gt = rng.integers(-1, C, 300)
    pred = rng.random((300, C)).astype(np.float32)
    pred[rng.random(300) < 0.1] = 0.0  # some pred don't-cares
    for mode in ("error", "forbidden"):
        m1 = metrics.ConfusionMatrix(C, mode)
        m1.update_state(_oh(gt, C), pred)
        m2 = metrics.ConfusionMatrix(C, mode)
        m2.update_state_labels(gt, pred)
        np.testing.assert_array_equal(
            np.asarray(m1.full_matrix), np.asarray(m2.full_matrix)
        )
