"""Supervised classification: classifier zoo, CV iterators, balancing,
hyper-parameter search, persistence.

Counterpart of `/root/reference/imsegm/classification.py`, with every
classifier trained and evaluated on device (see
``pyimsegm_tpu.models.forest`` / ``linear``):

=============  =====================================================
name           implementation
=============  =====================================================
RandForest     vectorised level-synchronous random forest (default)
GradBoost      histogram gradient-boosted trees (softmax boosting,
               Newton leaves; ``models/gbt``)
DecTree        single deep tree (forest with n_trees=1)
AdaBoost       SAMME.R boosting over reweighted trees (``models/adaboost``)
LogistRegr     multinomial logistic regression (full-batch Adam)
SVM            one-vs-rest squared-hinge linear SVM, softmax-calibrated
KNN            brute-force kNN via MXU distance matmul
MLP            one-hidden-layer network
=============  =====================================================

The CV iterators (:class:`HoldOut`, :class:`CrossValidate`,
:class:`CrossValidateGroups`) replicate the reference's group-aware
leave-P-images-out semantics (`classification.py:1401-1716`).
"""

import logging
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from pyimsegm_tpu.models import adaboost as adaboost_mod
from pyimsegm_tpu.models import forest as forest_mod
from pyimsegm_tpu.models import gbt as gbt_mod
from pyimsegm_tpu.models import linear as linear_mod
from pyimsegm_tpu.utils.metrics import compute_classif_metrics  # noqa: F401

#: default classifier (`classification.py:54`)
DEFAULT_CLASSIF_NAME = 'RandForest'
#: default clustering for unsupervised pipelines
DEFAULT_CLUSTERING = 'GMM'
#: file name pattern for persisted classifiers (`classification.py:52`)
TEMPLATE_NAME_CLF = 'classifier_{}.pkl'


class Classifier:
    """Scaler + on-device classifier with the sklearn-ish surface the
    pipelines rely on (``fit`` / ``predict`` / ``predict_proba`` /
    ``classes_``)."""

    def __init__(self, name=DEFAULT_CLASSIF_NAME, pca_coef=None, seed=0,
                 **hyper):
        self.name = name
        self.pca_coef = pca_coef
        self.seed = seed
        self.hyper = dict(hyper)
        self.classes_ = None
        self._params = None
        self._scaler = None
        self._pca = None

    # -------------------------------------------------------------- fit ---
    def fit(self, features, labels, sample_weight=None):
        self._device_fn = None            # invalidate the cached jit closure
        x = np.asarray(features, np.float32)
        y = np.asarray(labels)
        self.classes_ = np.unique(y)
        y_dense = np.searchsorted(self.classes_, y).astype(np.int32)
        n_classes = len(self.classes_)
        w = (np.ones(len(x), np.float32) if sample_weight is None
             else np.asarray(sample_weight, np.float32))

        mu, sd = x.mean(0), x.std(0) + 1e-12
        self._scaler = (mu, sd)
        xs = (x - mu) / sd
        if self.pca_coef is not None:
            cov = np.cov(xs.T)
            eigval, eigvec = np.linalg.eigh(np.atleast_2d(cov))
            order = np.argsort(eigval)[::-1]
            eigval, eigvec = eigval[order], eigvec[:, order]
            ratio = np.cumsum(eigval) / max(eigval.sum(), 1e-30)
            ncomp = int(np.searchsorted(ratio, self.pca_coef) + 1)
            self._pca = eigvec[:, :ncomp]
            xs = xs @ self._pca

        key = jax.random.PRNGKey(self.seed)
        xs_d = jnp.asarray(xs)
        y_d = jnp.asarray(y_dense)
        w_d = jnp.asarray(w)
        h = self.hyper
        if self.name == 'RandForest':
            self._params = forest_mod.forest_fit(
                key, xs_d, y_d, w_d, n_classes,
                n_trees=h.get('n_trees', 32), depth=h.get('depth', 8),
                n_candidates=h.get('n_candidates', 8))
        elif self.name == 'GradBoost':
            self._params = gbt_mod.gbt_fit(
                xs_d, y_d, w_d, n_classes,
                n_rounds=h.get('n_rounds', 64), depth=h.get('depth', 4),
                learning_rate=h.get('learning_rate', 0.1),
                n_bins=h.get('n_bins', 64))
        elif self.name == 'AdaBoost':
            self._params = adaboost_mod.adaboost_fit(
                key, xs_d, y_d, w_d, n_classes,
                n_rounds=h.get('n_rounds', 24), depth=h.get('depth', 3),
                n_candidates=h.get('n_candidates', 16))
        elif self.name == 'DecTree':
            self._params = forest_mod.forest_fit(
                key, xs_d, y_d, w_d, n_classes, n_trees=1,
                depth=h.get('depth', 12), n_candidates=h.get('n_candidates', 32),
                bootstrap=False)
        elif self.name == 'LogistRegr':
            self._params = linear_mod.logistic_fit(
                key, xs_d, y_d, w_d, n_classes, l2=h.get('l2', 1e-4),
                steps=h.get('steps', 300))
        elif self.name == 'SVM':
            self._params = linear_mod.linear_svm_fit(
                key, xs_d, y_d, w_d, n_classes, c_reg=h.get('C', 1.0),
                steps=h.get('steps', 400))
        elif self.name == 'MLP':
            self._params = linear_mod.mlp_fit(
                key, xs_d, y_d, w_d, n_classes, hidden=h.get('hidden', 64),
                steps=h.get('steps', 500))
        elif self.name == 'KNN':
            self._params = linear_mod.knn_fit(xs_d, y_d, w_d, n_classes,
                                              k=h.get('k', 5))
        else:
            raise ValueError('unknown classifier: %r' % self.name)
        return self

    # ---------------------------------------------------------- predict ---
    def _transform(self, features):
        x = np.asarray(features, np.float32)
        mu, sd = self._scaler
        xs = (x - mu) / sd
        if self._pca is not None:
            xs = xs @ self._pca
        return jnp.asarray(xs)

    def predict_proba(self, features):
        if self._params is None:
            raise RuntimeError('classifier is not fitted')
        x = self._transform(features)
        if self.name in ('RandForest', 'DecTree'):
            proba = forest_mod.forest_predict_proba(self._params, x)
        elif self.name == 'GradBoost':
            proba = gbt_mod.gbt_predict_proba(self._params, x)
        elif self.name == 'AdaBoost':
            proba = adaboost_mod.adaboost_predict_proba(self._params, x)
        elif self.name in ('LogistRegr', 'SVM'):
            proba = linear_mod.logistic_predict_proba(self._params, x)
        elif self.name == 'MLP':
            proba = linear_mod.mlp_predict_proba(self._params, x)
        elif self.name == 'KNN':
            proba = linear_mod.knn_predict_proba(self._params, x)
        return np.asarray(proba)

    def device_predict_fn(self):
        """Traceable predict: ``(apply_fn, arrays)`` with
        ``apply_fn(arrays, x) -> (N, C) proba`` usable *inside* jit.

        ``arrays`` is a pytree of device arrays (scaler moments, optional PCA
        basis, model parameters); every static attribute (model kind, tree
        depth, k) is baked into the closure, so a jitted pipeline can take
        ``apply_fn`` as a static argument and ``arrays`` as a dynamic one.
        The closure is cached per fitted classifier — one jit trace per
        model, not per call (the eager ``predict_proba`` round-trips
        features/proba through the host on every call, which dominates
        supervised per-image latency on a remote-attached device)."""
        if self._params is None:
            raise RuntimeError('classifier is not fitted')
        if getattr(self, '_device_fn', None) is not None:
            return self._device_fn
        mu, sd = self._scaler
        arrays = {'mu': jnp.asarray(mu, jnp.float32),
                  'sd': jnp.asarray(sd, jnp.float32)}
        if self._pca is not None:
            arrays['pca'] = jnp.asarray(self._pca, jnp.float32)
        p = self._params
        name = self.name
        if name in ('RandForest', 'DecTree'):
            depth = int(p.depth)
            arrays.update(feat=p.feat, thr=p.thr, leaf=p.leaf_proba)

            def model(a, xs):
                return forest_mod._forest_predict_jit(
                    a['feat'], a['thr'], a['leaf'], depth, xs)
        elif name == 'GradBoost':
            depth = int(p.depth)
            arrays.update(feat=p.feat, thr=p.thr, leaf=p.leaf,
                          base=p.base_score, lr=p.learning_rate)

            def model(a, xs):
                raw = gbt_mod._gbt_raw_scores(a['feat'], a['thr'], a['leaf'],
                                              a['base'], a['lr'], depth, xs)
                return jax.nn.softmax(raw, axis=-1)
        elif name == 'AdaBoost':
            depth = int(p.depth)
            arrays.update(feat=p.feat, thr=p.thr, leaf=p.leaf_proba)

            def model(a, xs):
                probs = forest_mod._forest_predict_jit(
                    a['feat'], a['thr'], a['leaf'], depth, xs,
                    reduce_mean=False)
                logp = jnp.log(jnp.clip(probs, 1e-10, 1.0))
                scores = logp - jnp.mean(logp, axis=-1, keepdims=True)
                return jax.nn.softmax(jnp.sum(scores, axis=0), axis=-1)
        elif name in ('LogistRegr', 'SVM'):
            arrays.update(w=p.w, b=p.b)

            def model(a, xs):
                return jax.nn.softmax(xs @ a['w'] + a['b'], axis=-1)
        elif name == 'MLP':
            arrays.update(w1=p.w1, b1=p.b1, w2=p.w2, b2=p.b2)

            def model(a, xs):
                h = jax.nn.relu(xs @ a['w1'] + a['b1'])
                return jax.nn.softmax(h @ a['w2'] + a['b2'], axis=-1)
        elif name == 'KNN':
            k = int(p.k)
            arrays.update(x=p.x, onehot=p.onehot, weight=p.weight)

            def model(a, xs):
                return linear_mod._knn_proba(a['x'], a['onehot'], a['weight'],
                                             xs, k)
        else:
            raise ValueError('unknown classifier: %r' % name)

        def apply(a, x):
            xs = (x.astype(jnp.float32) - a['mu']) / a['sd']
            if 'pca' in a:
                xs = xs @ a['pca']
            return model(a, xs)

        self._device_fn = (apply, arrays)
        return self._device_fn

    def predict(self, features):
        return self.classes_[np.argmax(self.predict_proba(features), axis=1)]

    def score(self, features, labels):
        return float(np.mean(self.predict(features) == np.asarray(labels)))


def create_classifiers(**kwargs):
    """Name -> unfitted Classifier dict (`classification.py:86-125`)."""
    names = ('RandForest', 'GradBoost', 'LogistRegr', 'KNN', 'SVM', 'DecTree',
             'AdaBoost', 'MLP')
    return {n: Classifier(n, **kwargs) for n in names}


#: randomised hyper-parameter distributions (`classification.py:146-258`)
CLF_PARAM_DISTRIBUTIONS = {
    'RandForest': {'n_trees': [16, 32, 64], 'depth': [6, 8, 10],
                   'n_candidates': [4, 8, 16]},
    'GradBoost': {'n_rounds': [32, 64, 96], 'depth': [3, 4, 5],
                  'learning_rate': [0.05, 0.1, 0.2]},
    'DecTree': {'depth': [8, 12, 16]},
    'AdaBoost': {'n_rounds': [12, 24, 48], 'depth': [2, 3, 4]},
    'LogistRegr': {'l2': [1e-5, 1e-4, 1e-3, 1e-2], 'steps': [200, 400]},
    'SVM': {'C': [0.1, 1.0, 10.0]},
    'KNN': {'k': [3, 5, 9, 15]},
    'MLP': {'hidden': [32, 64, 128], 'steps': [300, 600]},
}


# ------------------------------------------------------------ CV iterators ---

class HoldOut:
    """Single train/test split at a fixed index
    (`classification.py:1401-1458`)."""

    def __init__(self, nb_samples, hold_out, rand_seed=None):
        if hold_out >= nb_samples:
            raise ValueError('hold_out %i exceeds samples %i'
                             % (hold_out, nb_samples))
        self.total = nb_samples
        self.hold_out = hold_out
        self._indexes = list(range(nb_samples))
        if rand_seed is not None and rand_seed is not False:
            np.random.default_rng(rand_seed).shuffle(self._indexes)

    def __iter__(self):
        yield (self._indexes[:self.hold_out], self._indexes[self.hold_out:])

    def __len__(self):
        return 1


class CrossValidate:
    """K-fold-ish CV over samples with hold-out count
    (`classification.py:1461-1613`)."""

    def __init__(self, nb_samples, nb_hold_out, rand_seed=None, ignore_overflow=0.01):
        if nb_hold_out > nb_samples:
            raise ValueError('nb_hold_out %i exceeds samples %i'
                             % (nb_hold_out, nb_samples))
        self.nb_samples = nb_samples
        self.nb_hold_out = nb_hold_out
        self._indexes = list(range(nb_samples))
        if rand_seed is not None and rand_seed is not False:
            np.random.default_rng(rand_seed).shuffle(self._indexes)

    def __iter__(self):
        for start in range(0, self.nb_samples, self.nb_hold_out):
            test = self._indexes[start:start + self.nb_hold_out]
            train = [i for i in self._indexes if i not in set(test)]
            yield train, test

    def __len__(self):
        return int(np.ceil(self.nb_samples / float(self.nb_hold_out)))


class CrossValidateGroups:
    """Leave-P-groups-out CV where samples come in per-image blocks of given
    sizes (`classification.py:1616-1716`)."""

    def __init__(self, set_sizes, nb_hold_out, rand_seed=None):
        if nb_hold_out > len(set_sizes):
            raise ValueError('nb_hold_out %i exceeds groups %i'
                             % (nb_hold_out, len(set_sizes)))
        self.set_sizes = list(set_sizes)
        self.nb_hold_out = nb_hold_out
        offsets = np.cumsum([0] + self.set_sizes)
        self._group_idx = [list(range(offsets[i], offsets[i + 1]))
                           for i in range(len(self.set_sizes))]
        self._order = list(range(len(self.set_sizes)))
        if rand_seed is not None and rand_seed is not False:
            np.random.default_rng(rand_seed).shuffle(self._order)

    def __iter__(self):
        for start in range(0, len(self._order), self.nb_hold_out):
            test_groups = self._order[start:start + self.nb_hold_out]
            test = [i for g in test_groups for i in self._group_idx[g]]
            train = [i for g in self._order if g not in set(test_groups)
                     for i in self._group_idx[g]]
            yield train, test

    def __len__(self):
        return int(np.ceil(len(self.set_sizes) / float(self.nb_hold_out)))


# ------------------------------------------------------------- balancing ---

def down_sample_dict_features_random(dict_features, nb_samples, rand_seed=0):
    """Random down-sampling per label (`classification.py:1083-1107`)."""
    out = {}
    rng = np.random.default_rng(rand_seed)
    for lb, fts in dict_features.items():
        fts = np.asarray(fts)
        if len(fts) <= nb_samples:
            out[lb] = fts
        else:
            out[lb] = fts[rng.choice(len(fts), nb_samples, replace=False)]
    return out


def down_sample_dict_features_unique(dict_features):
    """Keep unique feature rows per label (`classification.py:1159-1180`)."""
    return {lb: np.unique(np.asarray(fts), axis=0)
            for lb, fts in dict_features.items()}


def down_sample_dict_features_kmean(dict_features, nb_samples, rand_seed=0):
    """k-means centroids as representatives (`classification.py:1110-1136`)."""
    from pyimsegm_tpu.models.gmm import kmeans_fit
    out = {}
    for lb, fts in dict_features.items():
        fts = np.asarray(fts, np.float32)
        if len(fts) <= nb_samples:
            out[lb] = fts
            continue
        centers, _ = kmeans_fit(jax.random.PRNGKey(rand_seed), jnp.asarray(fts),
                                jnp.ones(len(fts)), nb_samples, n_iter=15)
        out[lb] = np.asarray(centers)
    return out


def balance_dataset_by_(features, labels, balance_type='unique',
                        min_samples=None, rand_seed=0):
    """Balance per-label sample counts (`classification.py:1183-1216`)."""
    labels = np.asarray(labels)
    dict_features = {lb: np.asarray(features)[labels == lb]
                     for lb in np.unique(labels)}
    if balance_type == 'unique':
        dict_features = down_sample_dict_features_unique(dict_features)
    else:
        if min_samples is None:
            min_samples = min(len(v) for v in dict_features.values())
        if balance_type == 'random':
            dict_features = down_sample_dict_features_random(
                dict_features, min_samples, rand_seed)
        elif balance_type == 'kmeans':
            dict_features = down_sample_dict_features_kmean(
                dict_features, min_samples, rand_seed)
        else:
            raise ValueError('unknown balance_type: %r' % balance_type)
    fts = np.concatenate([dict_features[lb] for lb in sorted(dict_features)])
    lbs = np.concatenate([[lb] * len(dict_features[lb])
                          for lb in sorted(dict_features)])
    return fts, lbs


def convert_set_features_labels_2_dataset(dict_features, dict_labels,
                                          drop_labels=None, balance_type=None):
    """Assemble per-image features/labels into one dataset
    (`classification.py:1219-1262`).

    :returns: (features, labels, sizes) where sizes are per-image retained
        counts (for group CV).
    """
    drop = set(drop_labels or [])
    list_fts, list_lbs, sizes = [], [], []
    for key in dict_features:
        fts = np.asarray(dict_features[key])
        lbs = np.asarray(dict_labels[key])
        keep = ~np.isin(lbs, list(drop))
        fts, lbs = fts[keep], lbs[keep]
        if balance_type and balance_type != 'none':
            fts, lbs = balance_dataset_by_(fts, lbs, balance_type=balance_type)
        list_fts.append(fts)
        list_lbs.append(lbs)
        sizes.append(len(lbs))
    return (np.concatenate(list_fts), np.concatenate(list_lbs), sizes)


# ------------------------------------------------------ search/train/export ---

#: classifiers whose (fit, predict) pair is vmappable over CV folds
_FOLD_BATCHED_CLFS = ('RandForest', 'DecTree', 'GradBoost', 'LogistRegr',
                      'SVM', 'MLP')


def _fold_batched_fit_predict(clf_name, hyper):
    """(fit(key, x, y, w, C) -> params, predict(params, x) -> proba)."""
    h = hyper
    # predict closures take the tree depth statically: inside the vmapped
    # fold program the fitted params' depth leaf is a tracer, so the host
    # predict wrappers (which call int(params.depth)) cannot be used
    if clf_name in ('RandForest', 'DecTree'):
        kw = (dict(n_trees=1, depth=h.get('depth', 12),
                   n_candidates=h.get('n_candidates', 32), bootstrap=False)
              if clf_name == 'DecTree' else
              dict(n_trees=h.get('n_trees', 32), depth=h.get('depth', 8),
                   n_candidates=h.get('n_candidates', 8)))
        return (lambda key, x, y, w, c: forest_mod.forest_fit(
                    key, x, y, w, c, **kw),
                lambda p, x: forest_mod._forest_predict_jit(
                    p.feat, p.thr, p.leaf_proba, kw['depth'], x))
    if clf_name == 'GradBoost':
        kw = dict(n_rounds=h.get('n_rounds', 64), depth=h.get('depth', 4),
                  learning_rate=h.get('learning_rate', 0.1),
                  n_bins=h.get('n_bins', 64))
        return (lambda key, x, y, w, c: gbt_mod.gbt_fit(x, y, w, c, **kw),
                lambda p, x: jax.nn.softmax(gbt_mod._gbt_raw_scores(
                    p.feat, p.thr, p.leaf, p.base_score, p.learning_rate,
                    kw['depth'], x), axis=-1))
    if clf_name == 'LogistRegr':
        kw = dict(l2=h.get('l2', 1e-4), steps=h.get('steps', 300))
        return (lambda key, x, y, w, c: linear_mod.logistic_fit(
                    key, x, y, w, c, **kw),
                linear_mod.logistic_predict_proba)
    if clf_name == 'SVM':
        kw = dict(c_reg=h.get('C', 1.0), steps=h.get('steps', 400))
        return (lambda key, x, y, w, c: linear_mod.linear_svm_fit(
                    key, x, y, w, c, **kw),
                linear_mod.logistic_predict_proba)
    if clf_name == 'MLP':
        kw = dict(hidden=h.get('hidden', 64), steps=h.get('steps', 500))
        return (lambda key, x, y, w, c: linear_mod.mlp_fit(
                    key, x, y, w, c, **kw),
                linear_mod.mlp_predict_proba)
    raise ValueError(clf_name)


def _fold_mats(features, labels, folds):
    """(x, class-indexed y, per-fold train-weight matrix) for the vmapped
    CV programs: fold membership is expressed purely through 0/1 sample
    weights so every fold shares static shapes."""
    x = np.asarray(features, np.float32)
    classes = np.unique(labels)
    y = np.searchsorted(classes, labels).astype(np.int32)
    w_tr = np.zeros((len(folds), x.shape[0]), np.float32)
    for i, (train_idx, _test) in enumerate(folds):
        w_tr[i, np.asarray(train_idx, int)] = 1.0
    return x, y, len(classes), w_tr


def _fold_accuracy_fn(clf_name, hyper, xd, yd, n_classes):
    """One fold's fit+predict+score as a pure function of (key, weights);
    ``hyper`` values may be tracers for the non-static knobs."""
    fit, predict = _fold_batched_fit_predict(clf_name, hyper)

    def one_fold(key, w):
        wsum = jnp.maximum(jnp.sum(w), 1.0)
        mu = jnp.sum(xd * w[:, None], axis=0) / wsum
        sd = jnp.sqrt(jnp.sum(((xd - mu) ** 2) * w[:, None], axis=0)
                      / wsum) + 1e-12
        xs = (xd - mu) / sd
        params = fit(key, xs, yd, w, n_classes)
        pred = jnp.argmax(predict(params, xs), axis=-1)
        test_w = 1.0 - w
        hits = jnp.sum((pred == yd) * test_w)
        return hits / jnp.maximum(jnp.sum(test_w), 1.0)

    return one_fold


def _eval_cv_scores_fold_batched(clf_name, features, labels, folds, seed,
                                 hyper):
    """All CV folds fitted/scored in ONE vmapped device program.

    Every fold sees the full (N, F) matrix; membership is expressed purely
    through per-fold sample weights (train rows 1, test rows 0), so all
    folds share static shapes and ``jax.vmap`` batches the whole
    fit+predict+score chain — the TPU replacement for the reference's
    joblib ``n_jobs`` search parallelism (`classification.py:1004-1023`).
    """
    x, y, n_classes, w_tr = _fold_mats(features, labels, folds)
    one_fold = _fold_accuracy_fn(clf_name, hyper, jnp.asarray(x),
                                 jnp.asarray(y), n_classes)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(folds))
    accs = jax.jit(jax.vmap(one_fold))(keys, jnp.asarray(w_tr))
    return [float(a) for a in np.asarray(accs)]


#: hyper knobs that may be traced (no shape/loop-count effect) — these ride
#: a vmapped candidate axis inside one device program during random search
_TRACED_HYPER = {'LogistRegr': ('l2',), 'SVM': ('C',),
                 'GradBoost': ('learning_rate',)}
_TRACED_DEFAULTS = {'l2': 1e-4, 'C': 1.0, 'learning_rate': 0.1}


def _search_candidate_groups(clf_name, candidates):
    """Group hyper candidates by their static (shape-determining) knobs.

    :returns: list of (static_hyper dict, candidate indices, (G, T) float
        matrix of the group's traced-knob values) — one device dispatch per
        group; the default LogistRegr/SVM/GradBoost spaces collapse their
        continuous axes into the traced matrix, so the whole search runs in
        at most #static-combos dispatches.
    """
    traced_keys = _TRACED_HYPER.get(clf_name, ())
    groups = {}
    for ci, h in enumerate(candidates):
        stat = tuple(sorted((k, v) for k, v in h.items()
                            if k not in traced_keys))
        groups.setdefault(stat, []).append(ci)
    out = []
    for stat, idxs in groups.items():
        tmat = np.asarray(
            [[float(candidates[ci].get(k, _TRACED_DEFAULTS[k]))
              for k in traced_keys] for ci in idxs], np.float32)
        out.append((dict(stat), idxs, tmat))
    return out


def _eval_cv_search_batched(clf_name, features, labels, folds, seed,
                            candidates):
    """Mean CV accuracy for EVERY hyper candidate, candidate axis on device.

    Candidates are grouped by static knobs (`_search_candidate_groups`);
    within a group the traced knobs ride an outer ``vmap`` over the
    fold-batched program, so the random search costs #groups device
    dispatches instead of #candidates x #folds fits — the TPU counterpart
    of the reference's joblib-parallel ``RandomizedSearchCV``
    (`/root/reference/imsegm/classification.py:1004-1023`).

    :returns: (n_candidates,) mean-over-folds accuracy, candidate order in.
    """
    x, y, n_classes, w_tr = _fold_mats(features, labels, folds)
    xd, yd, wd = jnp.asarray(x), jnp.asarray(y), jnp.asarray(w_tr)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(folds))
    traced_keys = _TRACED_HYPER.get(clf_name, ())
    scores = np.zeros(len(candidates), np.float64)
    for stat_h, idxs, tmat in _search_candidate_groups(clf_name, candidates):

        def one_cand(tvec):
            h = dict(stat_h)
            for j, k in enumerate(traced_keys):
                h[k] = tvec[j]
            one_fold = _fold_accuracy_fn(clf_name, h, xd, yd, n_classes)
            return jnp.mean(jax.vmap(one_fold)(keys, wd))

        accs = jax.jit(jax.vmap(one_cand))(jnp.asarray(tmat))
        scores[np.asarray(idxs)] = np.asarray(accs, np.float64)
    return scores


def eval_classif_cross_val_scores(clf_name, features, labels, cross_val=10,
                                  pca_coef=None, seed=0, **hyper):
    """Accuracy per CV fold (`classification.py:762-848` condensed).

    For the fold-batchable classifiers (no PCA) all folds run as one
    vmapped device program; otherwise a host loop."""
    features = np.asarray(features)
    labels = np.asarray(labels)
    if isinstance(cross_val, int):
        cross_val = CrossValidate(len(labels), max(1, len(labels) // cross_val),
                                  rand_seed=seed)
    folds = list(cross_val)
    if pca_coef is None and clf_name in _FOLD_BATCHED_CLFS:
        return _eval_cv_scores_fold_batched(clf_name, features, labels,
                                            folds, seed, hyper)
    scores = []
    for train_idx, test_idx in folds:
        clf = Classifier(clf_name, pca_coef=pca_coef, seed=seed, **hyper)
        clf.fit(features[train_idx], labels[train_idx])
        scores.append(clf.score(features[test_idx], labels[test_idx]))
    return scores


def create_classif_search_train_export(clf_name, features, labels,
                                       cross_val=10, nb_search_iter=1,
                                       pca_coef=None, seed=0,
                                       path_out=None, **_ignored):
    """Random hyper-parameter search + final fit (+ optional pickle export),
    matching `classification.py:656-759`.

    :returns: (fitted Classifier, best hyper-params dict)
    """
    features = np.asarray(features, np.float32)
    labels = np.asarray(labels)
    rng = np.random.default_rng(seed)
    space = CLF_PARAM_DISTRIBUTIONS.get(clf_name, {})
    candidates = [{}]
    for _ in range(max(0, nb_search_iter - 1)):
        candidates.append({k: v[rng.integers(len(v))] for k, v in space.items()})

    best_hyper, best_score = {}, -np.inf
    if len(candidates) > 1:
        if pca_coef is None and clf_name in _FOLD_BATCHED_CLFS:
            # whole search on device: one dispatch per static-knob group
            if isinstance(cross_val, int):
                cv = CrossValidate(len(labels),
                                   max(1, len(labels) // cross_val),
                                   rand_seed=seed)
            else:
                cv = cross_val
            scores = _eval_cv_search_batched(clf_name, features, labels,
                                             list(cv), seed, candidates)
            for hyper, score in zip(candidates, scores):
                logging.debug('search %s %r -> %.4f', clf_name, hyper, score)
            best = int(np.argmax(scores))
            best_score, best_hyper = float(scores[best]), candidates[best]
        else:
            for hyper in candidates:
                scores = eval_classif_cross_val_scores(
                    clf_name, features, labels, cross_val=cross_val,
                    pca_coef=pca_coef, seed=seed, **hyper)
                score = float(np.mean(scores))
                logging.debug('search %s %r -> %.4f', clf_name, hyper, score)
                if score > best_score:
                    best_score, best_hyper = score, hyper
    classif = Classifier(clf_name, pca_coef=pca_coef, seed=seed, **best_hyper)
    classif.fit(features, labels)
    if path_out:
        save_classifier(path_out, classif, clf_name)
    return classif, best_hyper


def compute_tp_tn_fp_fn(annot, segm, label_positive=None):
    """Binary TP/TN/FP/FN counts (`classification.py:1265-1310`); NaNs when
    more than two labels appear.

    >>> annot = np.array([[0, 9], [9, 0]])
    >>> compute_tp_tn_fp_fn(annot, annot)
    (2, 2, 0, 0)
    """
    y_true = np.asarray(annot).ravel()
    y_pred = np.asarray(segm).ravel()
    uq_labels = np.unique([y_true, y_pred]).tolist()
    if len(uq_labels) > 2:
        return np.nan, np.nan, np.nan, np.nan
    if len(uq_labels) < 2:
        return len(y_true), 0, 0, 0
    if label_positive is None or label_positive not in uq_labels:
        label_positive = uq_labels[-1]
    uq_labels.remove(label_positive)
    label_negative = uq_labels[0]
    tp = int(np.sum((y_true == label_positive) & (y_pred == label_positive)))
    tn = int(np.sum((y_true == label_negative) & (y_pred == label_negative)))
    fp = int(np.sum((y_true == label_positive) & (y_pred == label_negative)))
    fn = int(np.sum((y_true == label_negative) & (y_pred == label_positive)))
    return tp, tn, fp, fn


def compute_metric_fpfn_tpfn(annot, segm, label_positive=None):
    """(FP + FN) / (TP + FN) (`classification.py:1313-1337`)."""
    tp, _, fp, fn = compute_tp_tn_fp_fn(annot, segm, label_positive)
    if tp is np.nan or (isinstance(tp, float) and np.isnan(tp)):
        return np.nan
    if (fp + fn) == 0:
        return 0.
    return float(fp + fn) / float(tp + fn)


def compute_metric_tpfp_tpfn(annot, segm, label_positive=None):
    """(TP + FP) / (TP + FN) (`classification.py:1340-1366`)."""
    tp, _, fp, fn = compute_tp_tn_fp_fn(annot, segm, label_positive)
    if tp is np.nan or (isinstance(tp, float) and np.isnan(tp)):
        return np.nan
    if (tp + fn) == 0:
        return 0.
    return float(tp + fp) / float(tp + fn)


def compute_classif_stat_segm_annot(annot_segm_name, drop_labels=None,
                                    relabel=False):
    """Per-image metric row for (annot, segm, name)
    (`classification.py:374-421`)."""
    annot, segm, name = annot_segm_name
    annot = np.asarray(annot).ravel()
    segm = np.asarray(segm).ravel()
    if drop_labels is not None:
        keep = ~np.isin(annot, list(drop_labels))
        annot, segm = annot[keep], segm[keep]
    if relabel:
        from pyimsegm_tpu.labeling import relabel_max_overlap_unique
        segm = relabel_max_overlap_unique(annot[None, :], segm[None, :],
                                          keep_bg=False).ravel()
    stat = compute_classif_metrics(annot, segm)
    stat['name'] = name
    return stat


def compute_stat_per_image(segms, annots, names=None, nb_workers=2,
                           drop_labels=None, relabel=False):
    """Metric table over image pairs (`classification.py:762-848`);
    returns a DataFrame indexed by name."""
    import pandas as pd
    if len(segms) != len(annots):
        raise RuntimeError('size of segment. (%i) and annot. (%i) should be'
                           ' equal' % (len(segms), len(annots)))
    if not names:
        names = list(map(str, range(len(segms))))
    rows = [compute_classif_stat_segm_annot((a, s, n), drop_labels, relabel)
            for a, s, n in zip(annots, segms, names)]
    df = pd.DataFrame(rows)
    return df.set_index('name')


def _f_classif_scores(features, labels):
    """One-way ANOVA F statistic per feature (sklearn f_classif numerics)."""
    features = np.asarray(features, float)
    labels = np.asarray(labels)
    classes = np.unique(labels)
    n, _ = features.shape
    overall_mean = features.mean(axis=0)
    ss_between = np.zeros(features.shape[1])
    ss_within = np.zeros(features.shape[1])
    for c in classes:
        grp = features[labels == c]
        ss_between += len(grp) * (grp.mean(axis=0) - overall_mean) ** 2
        ss_within += ((grp - grp.mean(axis=0)) ** 2).sum(axis=0)
    df_between = len(classes) - 1
    df_within = n - len(classes)
    with np.errstate(divide='ignore', invalid='ignore'):
        f = (ss_between / max(df_between, 1)) / \
            np.maximum(ss_within / max(df_within, 1), 1e-30)
    return f


def feature_scoring_selection(features, labels, names=None, path_out=''):
    """Rank features by forest split usage, F-test, k-Best, variance
    (`classification.py:474-545`).  The tree importance is permutation
    importance of the on-device forest (accuracy drop per shuffled feature).

    :returns: (indices sorted by forest importance desc, DataFrame)
    """
    import pandas as pd
    features = np.asarray(features, np.float32)
    labels = np.asarray(labels)
    clf = Classifier('RandForest', seed=0)
    clf.fit(features, labels)
    # permutation importance: accuracy drop when one feature is shuffled
    rng = np.random.default_rng(0)
    base_acc = clf.score(features, labels)
    importance = np.zeros(features.shape[1])
    for i in range(features.shape[1]):
        shuffled = features.copy()
        shuffled[:, i] = rng.permutation(shuffled[:, i])
        importance[i] = max(base_acc - clf.score(shuffled, labels), 0.0)
    importance /= max(importance.sum(), 1e-12)

    f_test = _f_classif_scores(features, labels)
    scores = {
        'ExtTree': importance,
        'F-test': f_test,
        'k-Best': f_test,
        'variance': features.var(axis=0),
    }
    indices = np.argsort(importance)[::-1]
    if names is None or len(names) < features.shape[1]:
        names = [str(i) for i in range(1, features.shape[1] + 1)]
    df_scoring = pd.DataFrame(
        [{**{k: scores[k][i] for k in scores}, 'feature': n}
         for i, n in enumerate(names)]).set_index('feature')
    if path_out and os.path.exists(path_out):
        df_scoring.to_csv(os.path.join(path_out, 'feature_scoring.csv'))
    return indices, df_scoring


def eval_classif_cross_val_roc(clf_name, features, labels, cross_val=10,
                               nb_steps=100, seed=0, **hyper):
    """Mean binary-ised ROC over CV folds + AUC
    (`classification.py:851-950`).

    :returns: (DataFrame with FP/TP columns, mean AUC)
    """
    import pandas as pd
    features = np.asarray(features)
    labels = np.asarray(labels)
    classes = np.unique(labels)
    if isinstance(cross_val, int):
        cross_val = CrossValidate(len(labels),
                                  max(1, len(labels) // cross_val),
                                  rand_seed=seed)
    fp_space = np.linspace(0, 1, nb_steps)
    tps, aucs = [], []
    for train_idx, test_idx in cross_val:
        clf = Classifier(clf_name, seed=seed, **hyper)
        clf.fit(features[train_idx], labels[train_idx])
        proba = clf.predict_proba(features[test_idx])
        y = labels[test_idx]
        # one-vs-rest micro ROC
        onehot = (y[:, None] == classes[None, :]).astype(float)
        score = proba.ravel()
        truth = onehot.ravel()
        order = np.argsort(-score)
        truth = truth[order]
        tp_cum = np.cumsum(truth) / max(truth.sum(), 1.0)
        fp_cum = np.cumsum(1 - truth) / max((1 - truth).sum(), 1.0)
        tps.append(np.interp(fp_space, np.concatenate([[0], fp_cum]),
                             np.concatenate([[0], tp_cum])))
        aucs.append(float(np.trapezoid(tps[-1], fp_space)))
    mean_tp = np.mean(tps, axis=0)
    mean_tp[0] = 0.0
    df = pd.DataFrame({'FP': fp_space, 'TP': mean_tp})
    return df, float(np.mean(aucs))


def save_classifier(path_out, classif, clf_name='classif'):
    """Pickle export (`classification.py:547-586`)."""
    import os
    path = os.path.join(path_out, TEMPLATE_NAME_CLF.format(clf_name))
    state = {
        'name': classif.name, 'pca_coef': classif.pca_coef,
        'seed': classif.seed, 'hyper': classif.hyper,
        'classes_': classif.classes_, 'scaler': classif._scaler,
        'pca': classif._pca,
        'params': jax.tree_util.tree_map(
            lambda a: np.asarray(a) if hasattr(a, 'shape') else a,
            classif._params),
    }
    with open(path, 'wb') as fp:
        pickle.dump(state, fp)
    return path


def load_classifier(path):
    """Load a pickled classifier (`classification.py:589-612`)."""
    with open(path, 'rb') as fp:
        state = pickle.load(fp)
    clf = Classifier(state['name'], pca_coef=state['pca_coef'],
                     seed=state['seed'], **state['hyper'])
    clf.classes_ = state['classes_']
    clf._scaler = state['scaler']
    clf._pca = state['pca']
    clf._params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a) if isinstance(a, np.ndarray) else a,
        state['params'])
    return clf

# ----------------------------- search objects & dataset helpers ------------
# Reference-parity surface (`classification.py:127-283,608-654,953-1080,1146`)

def create_clf_pipeline(name_classif=DEFAULT_CLASSIF_NAME, pca_coef=0.95):
    """Scaler + PCA + classifier pipeline (`classification.py:127-143`);
    the :class:`Classifier` already folds the scaler/PCA stages in."""
    return Classifier(name_classif, pca_coef=pca_coef)


def create_pipeline_neuron_net():
    """Simple neural-network pipeline (`classification.py:271-283`)."""
    return Classifier('MLP')


def create_clf_param_search_grid(name_classif=DEFAULT_CLASSIF_NAME):
    """Exhaustive hyper-parameter grid keyed like the reference's sklearn
    pipelines, ``classif__<param>`` (`classification.py:146-208`).

    >>> sorted(create_clf_param_search_grid('KNN'))
    ['classif__k']
    """
    space = CLF_PARAM_DISTRIBUTIONS.get(name_classif, {})
    return {'classif__%s' % k: list(v) for k, v in space.items()}


def create_clf_param_search_distrib(name_classif=DEFAULT_CLASSIF_NAME):
    """Randomised-search distributions (`classification.py:211-258`); here
    discrete lists sampled uniformly."""
    return create_clf_param_search_grid(name_classif)


def search_params_cut_down_max_nb_iter(clf_parameters, nb_iter):
    """Bound random-search iterations by the size of the discrete grid
    (`classification.py:953-977`).

    >>> search_params_cut_down_max_nb_iter({'a': [1, 2], 'b': [1, 2, 3]}, 100)
    6
    >>> search_params_cut_down_max_nb_iter({'a': [1, 2]}, 1)
    1
    """
    total = 1
    for vals in clf_parameters.values():
        try:
            total *= len(vals)
        except TypeError:   # continuous distribution -> unbounded
            return nb_iter
    return min(total, nb_iter)


class ClassifSearch:
    """Randomised/grid hyper-parameter search with CV, the counterpart of the
    reference's sklearn ``GridSearchCV``/``RandomizedSearchCV`` wrapper
    (`classification.py:980-1024`).  After :meth:`fit`: ``best_estimator_``,
    ``best_params_``, ``best_score_``, ``cv_results_``."""

    def __init__(self, clf_name, params=None, search_type='random',
                 cross_val=10, nb_iter=10, pca_coef=None, seed=0):
        self.clf_name = clf_name
        grid = params if params is not None \
            else create_clf_param_search_grid(clf_name)
        self.params = {k.split('__', 1)[-1]: list(v) for k, v in grid.items()}
        self.search_type = search_type
        self.cross_val = cross_val
        self.nb_iter = search_params_cut_down_max_nb_iter(self.params, nb_iter)
        self.pca_coef = pca_coef
        self.seed = seed
        self.best_estimator_ = None
        self.best_params_ = None
        self.best_score_ = None
        self.cv_results_ = None

    def _candidates(self):
        import itertools
        keys = sorted(self.params)
        if self.search_type == 'grid':
            for combo in itertools.product(*(self.params[k] for k in keys)):
                yield dict(zip(keys, combo))
            return
        rng = np.random.default_rng(self.seed)
        seen = set()
        for _ in range(self.nb_iter * 5):
            if len(seen) >= self.nb_iter:
                return
            cand = {k: self.params[k][rng.integers(len(self.params[k]))]
                    for k in keys}
            sig = tuple(sorted(cand.items()))
            if sig not in seen:
                seen.add(sig)
                yield cand

    def fit(self, features, labels):
        features = np.asarray(features, np.float32)
        labels = np.asarray(labels)
        results = {'params': [], 'mean_test_score': []}
        best_score, best_params = -np.inf, {}
        for cand in self._candidates():
            scores = eval_classif_cross_val_scores(
                self.clf_name, features, labels, cross_val=self.cross_val,
                pca_coef=self.pca_coef, seed=self.seed, **cand)
            score = float(np.mean(scores))
            results['params'].append(cand)
            results['mean_test_score'].append(score)
            if score > best_score:
                best_score, best_params = score, cand
        self.cv_results_ = results
        self.best_params_, self.best_score_ = best_params, best_score
        self.best_estimator_ = Classifier(self.clf_name,
                                          pca_coef=self.pca_coef,
                                          seed=self.seed, **best_params)
        self.best_estimator_.fit(features, labels)
        return self


def create_classif_search(name_clf, clf_pipeline=None, nb_labels=2,
                          search_type='random', cross_val=10,
                          eval_metric='f1', nb_iter=10, nb_workers=1):
    """Build an (unfitted) hyper-parameter search object
    (`classification.py:980-1024`)."""
    params = (create_clf_param_search_grid(name_clf)
              if search_type == 'grid'
              else create_clf_param_search_distrib(name_clf))
    pca_coef = getattr(clf_pipeline, 'pca_coef', None)
    return ClassifSearch(name_clf, params=params, search_type=search_type,
                         cross_val=cross_val, nb_iter=nb_iter,
                         pca_coef=pca_coef)


def export_results_clf_search(path_out, clf_name, clf_search):
    """Write search scores + best params next to the pickled classifier
    (`classification.py:608-632`)."""
    if not os.path.isdir(path_out):
        raise FileNotFoundError('missing folder: %s' % path_out)
    import pandas as pd
    res = clf_search.cv_results_ or {'params': [], 'mean_test_score': []}
    df = pd.DataFrame({'params': [repr(p) for p in res['params']],
                       'mean_test_score': res['mean_test_score']})
    path_csv = os.path.join(path_out, 'search_results_%s.csv' % clf_name)
    df.to_csv(path_csv)
    path_txt = os.path.join(path_out, 'search_params_best_%s.txt' % clf_name)
    with open(path_txt, 'w') as fp:
        fp.write('score: %r\nparams: %r\n'
                 % (clf_search.best_score_, clf_search.best_params_))
    return path_csv


def relabel_sequential(labels, uq_labels=None):
    """Relabel to a dense 0..K-1 range (`classification.py:635-653`).

    >>> relabel_sequential([0, 0, 0, 5, 5, 5, 0, 5])
    [0, 0, 0, 1, 1, 1, 0, 1]
    """
    labels = np.asarray(labels)
    if uq_labels is None:
        uq_labels = np.unique(labels)
    lut = {lb: i for i, lb in enumerate(uq_labels)}
    return [lut[lb] for lb in labels.tolist()]


def shuffle_features_labels(features, labels, rand_seed=None):
    """Joint random permutation of samples (`classification.py:1027-1051`)."""
    features = np.asarray(features)
    labels = np.asarray(labels)
    rng = np.random.default_rng(rand_seed)
    perm = rng.permutation(len(labels))
    return features[perm], labels[perm]


def convert_dict_label_features_2_vectors(dict_features):
    """{label: [feature rows]} -> (features, labels)
    (`classification.py:1054-1065`)."""
    features, labels = [], []
    for lb in dict_features:
        rows = np.asarray(dict_features[lb])
        features.append(rows)
        labels += [lb] * len(rows)
    return np.concatenate(features), labels


def compose_dict_label_features(features, labels):
    """(features, labels) -> {label: feature rows}
    (`classification.py:1068-1080`)."""
    features = np.asarray(features)
    labels = np.asarray(labels)
    return {lb: features[labels == lb] for lb in np.unique(labels)}


def unique_rows(data):
    """Distinct rows of a 2D matrix (`classification.py:1146-1157`).

    >>> unique_rows(np.array([[1, 2], [1, 2], [3, 4]])).tolist()
    [[1, 2], [3, 4]]
    """
    return np.unique(np.ascontiguousarray(data), axis=0)
