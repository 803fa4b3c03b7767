"""Evaluation-protocol oracles: matching score and NN mAP on
constructed cases with known outcomes."""

import numpy as np
import pytest

from ssp.cli.evaluate import _nn_map, _unwarp_count


def _unit_rows(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestUnwarpCount:
    def test_translation(self):
        H = np.eye(3)
        H[0, 2] = 10.0  # image2 = image1 shifted right by 10
        # image-2 keypoints at x in {5, 15, 60}; unwarp subtracts 10
        pts2 = np.array([[5.0, 8.0, 1.0], [15.0, 8.0, 1.0], [60.0, 8.0, 1.0]])
        n = _unwarp_count(pts2, H, (32, 64))
        assert n == 2  # x=5 unwarps to -5 → outside


class TestNNmAP:
    def _pair(self, n=30, seed=0, good=True):
        rng = np.random.default_rng(seed)
        pts1 = np.concatenate(
            [rng.uniform(5, 55, (n, 2)), rng.uniform(0.5, 1, (n, 1))], axis=1
        )
        H = np.eye(3)
        H[0, 2] = 3.0
        pts2 = pts1.copy()
        pts2[:, 0] += 3.0
        d = _unit_rows(rng.normal(size=(n, 64)))
        if good:
            d2 = d  # perfect descriptors → all matches correct
        else:
            d2 = d[rng.permutation(n)]  # scrambled → matches are wrong pairs
        return {
            "prob": pts1, "warped_prob": pts2,
            "desc": d.astype(np.float32), "warped_desc": d2.astype(np.float32),
        }

    def test_perfect_descriptors_high_ap(self):
        ap = _nn_map(self._pair(good=True))
        assert ap > 0.95

    def test_empty_inputs(self):
        data = {
            "prob": np.zeros((0, 3)), "warped_prob": np.zeros((0, 3)),
            "desc": np.zeros((0, 64)), "warped_desc": np.zeros((0, 64)),
        }
        assert _nn_map(data) == 0.0


class TestSemanticMetrics:
    def test_perfect_prediction(self):
        from ssp.evaluations.semantic import evaluate_semantic

        target = np.array([[0, 1], [2, 133]])
        m = evaluate_semantic(target.copy(), target, n_classes=4)
        assert m["pixel_accuracy"] == 1.0
        assert m["mean_iou"] == 1.0

    def test_known_confusion(self):
        """Hand-computed 2-class case: class 0 half right, class 1 all
        right; ignore pixels excluded entirely."""
        from ssp.evaluations.semantic import evaluate_semantic

        target = np.array([0, 0, 1, 1, 133, 133])
        pred = np.array([0, 1, 1, 1, 0, 1])
        m = evaluate_semantic(pred, target, n_classes=2)
        assert m["pixel_accuracy"] == pytest.approx(3 / 4)
        # IoU: class0 = 1/2 (tp1, fn1, fp0), class1 = 2/3 (tp2, fp1)
        assert m["mean_iou"] == pytest.approx((1 / 2 + 2 / 3) / 2)
        assert m["mean_class_accuracy"] == pytest.approx((1 / 2 + 1) / 2)

    def test_out_of_range_void_labels_ignored(self):
        """Targets outside [0, n_classes) that aren't the declared
        ignore class (e.g. a 255 void convention) must be excluded,
        not crash the bincount reshape."""
        from ssp.evaluations.semantic import evaluate_semantic

        target = np.array([0, 1, 255, -1, 133])
        pred = np.array([0, 1, 0, 0, 0])
        m = evaluate_semantic(pred, target, n_classes=2, ignore_class=133)
        assert m["pixel_accuracy"] == 1.0

    def test_logits_argmax_path(self):
        from ssp.evaluations.semantic import evaluate_semantic

        target = np.array([[0, 1]])
        logits = np.zeros((1, 2, 3))
        logits[0, 0, 0] = 5.0
        logits[0, 1, 1] = 5.0
        m = evaluate_semantic(logits, target, n_classes=3)
        assert m["pixel_accuracy"] == 1.0

    def test_absent_classes_dont_dilute(self):
        from ssp.evaluations.semantic import evaluate_semantic

        target = np.array([0, 0])
        pred = np.array([0, 0])
        m = evaluate_semantic(pred, target, n_classes=133)
        assert m["mean_iou"] == 1.0
