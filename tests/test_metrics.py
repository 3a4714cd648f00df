"""Metric correctness vs independent numpy oracles.

(The reference uses torchmetrics, which is not in this image; the oracles
below implement the same definitions — macro one-vs-rest AUROC via explicit
threshold sweep, macro PRF from the confusion matrix.)
"""

import numpy as np

from dmf_tpu.evals import (
    classification_report,
    confusion_matrix,
    multiclass_auroc,
    multiclass_f1,
    multiclass_precision,
    multiclass_recall,
    per_class_accuracy,
)


def _data(rng, n=200, c=4):
    logits = rng.randn(n, c).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    labels = rng.randint(0, c, n)
    return probs, labels


def oracle_binary_auc(scores, y):
    """Trapezoidal ROC-AUC over all thresholds (independent of rank method)."""
    order = np.argsort(-scores)
    y = y[order]
    scores_sorted = scores[order]
    tps = np.cumsum(y)
    fps = np.cumsum(1 - y)
    # keep last index of each distinct threshold
    distinct = np.r_[scores_sorted[1:] != scores_sorted[:-1], True]
    tps, fps = tps[distinct], fps[distinct]
    tpr = np.r_[0, tps / tps[-1]]
    fpr = np.r_[0, fps / fps[-1]]
    return np.trapezoid(tpr, fpr)


class TestMetricParity:
    def test_auroc_vs_threshold_sweep(self, rng):
        probs, labels = _data(rng)
        ref = np.mean(
            [oracle_binary_auc(probs[:, c], (labels == c).astype(float))
             for c in range(4)]
        )
        ours = multiclass_auroc(probs, labels, 4)
        assert abs(ours - ref) < 1e-10

    def test_auroc_with_ties(self):
        probs = np.array([[0.5, 0.5], [0.5, 0.5], [0.9, 0.1], [0.1, 0.9]])
        labels = np.array([0, 1, 0, 1])
        ref = np.mean(
            [oracle_binary_auc(probs[:, c], (labels == c).astype(float))
             for c in range(2)]
        )
        assert abs(multiclass_auroc(probs, labels, 2) - ref) < 1e-10

    def test_prf_from_confmat(self, rng):
        probs, labels = _data(rng)
        preds = probs.argmax(1)
        cm = confusion_matrix(preds, labels, 4)
        precs, recs, f1s = [], [], []
        for c in range(4):
            tp = cm[c, c]
            fp = cm[:, c].sum() - tp
            fn = cm[c, :].sum() - tp
            p = tp / (tp + fp) if tp + fp else 0.0
            r = tp / (tp + fn) if tp + fn else 0.0
            precs.append(p)
            recs.append(r)
            f1s.append(2 * p * r / (p + r) if p + r else 0.0)
        assert abs(multiclass_f1(preds, labels, 4) - np.mean(f1s)) < 1e-10
        assert abs(multiclass_precision(preds, labels, 4) - np.mean(precs)) < 1e-10
        assert abs(multiclass_recall(preds, labels, 4) - np.mean(recs)) < 1e-10

    def test_confmat_counts(self):
        preds = np.array([0, 1, 2, 2, 0])
        labels = np.array([0, 1, 1, 2, 2])
        cm = confusion_matrix(preds, labels, 3)
        assert cm[0, 0] == 1 and cm[1, 1] == 1 and cm[1, 2] == 1
        assert cm[2, 2] == 1 and cm[2, 0] == 1
        assert cm.sum() == 5
        pca = per_class_accuracy(cm)
        assert np.allclose(pca, [1.0, 0.5, 0.5])

    def test_report_keys(self, rng):
        probs, labels = _data(rng, n=50)
        rep = classification_report(probs, labels, 4, prefix="test_")
        for k in ["test_acc", "test_roc_auc", "test_f1", "test_precision",
                  "test_recall", "test_acc_class_0", "test_acc_class_3"]:
            assert k in rep

    def test_degenerate_single_class(self):
        probs = np.array([[0.9, 0.1], [0.8, 0.2]])
        labels = np.array([0, 0])
        auc = multiclass_auroc(probs, labels, 2)
        assert np.isfinite(auc)
