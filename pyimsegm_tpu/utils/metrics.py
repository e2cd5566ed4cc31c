"""Segmentation quality metrics, device-friendly.

The reference's headline metric is the Adjusted Rand Score plus the usual
classification battery (`/root/reference/imsegm/classification.py:305-371`).
All metrics here are computable from a label contingency table built with one
``segment_sum`` — jittable for on-device evaluation, with numpy-friendly host
wrappers.
"""

import jax
import jax.numpy as jnp
import numpy as np


def contingency_table(labels_a, labels_b, num_a, num_b):
    """(num_a, num_b) co-occurrence counts of two flat label vectors."""
    a = jnp.asarray(labels_a).ravel().astype(jnp.int32)
    b = jnp.asarray(labels_b).ravel().astype(jnp.int32)
    idx = a * num_b + b
    counts = jax.ops.segment_sum(jnp.ones_like(idx, jnp.float32),
                                 idx, num_segments=num_a * num_b)
    return counts.reshape(num_a, num_b)


def adjusted_rand_score(labels_a, labels_b, num_a=None, num_b=None):
    """ARS of two labelings (host convenience; exact match with sklearn)."""
    la = np.asarray(labels_a).ravel()
    lb = np.asarray(labels_b).ravel()
    if num_a is None:
        num_a = int(la.max()) + 1
    if num_b is None:
        num_b = int(lb.max()) + 1
    c = np.asarray(contingency_table(la, lb, num_a, num_b))
    return float(_ars_from_contingency(c))


def _comb2(x):
    return x * (x - 1.0) / 2.0


def _ars_from_contingency(c):
    n = c.sum()
    sum_comb = _comb2(c).sum()
    a = _comb2(c.sum(axis=1)).sum()
    b = _comb2(c.sum(axis=0)).sum()
    expected = a * b / max(_comb2(n), 1.0)
    max_index = 0.5 * (a + b)
    denom = max_index - expected
    if denom == 0:
        return 1.0
    return (sum_comb - expected) / denom


def accuracy(labels_true, labels_pred):
    t = np.asarray(labels_true).ravel()
    p = np.asarray(labels_pred).ravel()
    return float(np.mean(t == p))


def confusion_matrix(labels_true, labels_pred, nb_labels=None):
    t = np.asarray(labels_true).ravel()
    p = np.asarray(labels_pred).ravel()
    if nb_labels is None:
        nb_labels = int(max(t.max(), p.max())) + 1
    return np.asarray(contingency_table(t, p, nb_labels, nb_labels))


def precision_recall_f1(labels_true, labels_pred, nb_labels=None, average='macro'):
    """Per-class precision/recall/F1 with macro or weighted averaging
    (reference metric set, `classification.py:305-371`)."""
    cm = confusion_matrix(labels_true, labels_pred, nb_labels)
    tp = np.diag(cm)
    support = cm.sum(axis=1)
    pred_cnt = cm.sum(axis=0)
    with np.errstate(divide='ignore', invalid='ignore'):
        prec = np.where(pred_cnt > 0, tp / pred_cnt, 0.0)
        rec = np.where(support > 0, tp / support, 0.0)
        f1 = np.where(prec + rec > 0, 2 * prec * rec / (prec + rec), 0.0)
    if average == 'macro':
        w = np.ones_like(support) / len(support)
    elif average == 'weighted':
        w = support / max(support.sum(), 1.0)
    else:
        return prec, rec, f1
    return float(prec @ w), float(rec @ w), float(f1 @ w)


def compute_classif_metrics(labels_true, labels_pred, nb_labels=None):
    """Metric dict matching the reference naming
    (`classification.py:305-371`)."""
    p_ma, r_ma, f_ma = precision_recall_f1(labels_true, labels_pred, nb_labels, 'macro')
    p_w, r_w, f_w = precision_recall_f1(labels_true, labels_pred, nb_labels, 'weighted')
    return {
        'ARS': adjusted_rand_score(labels_true, labels_pred),
        'accuracy': accuracy(labels_true, labels_pred),
        'confusion': confusion_matrix(labels_true, labels_pred, nb_labels).tolist(),
        'precision_macro': p_ma, 'recall_macro': r_ma, 'f1_macro': f_ma,
        'precision_weighted': p_w, 'recall_weighted': r_w, 'f1_weighted': f_w,
    }
