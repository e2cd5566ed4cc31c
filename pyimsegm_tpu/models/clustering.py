"""Self-contained clustering primitives (no sklearn dependency).

Covers the clustering the reference pulls from sklearn: DBSCAN for center
candidates (`/root/reference/experiments_ovary_centres/run_center_clustering.py:61-88`),
MeanShift/KMeans/Spectral for ray-shape model fitting
(`/root/reference/imsegm/region_growing.py:364-554`).

Distance matrices are computed on device as one (N, N) matmul-shaped op;
the component/mode bookkeeping is tiny and stays on host.
"""

import jax
import jax.numpy as jnp
import numpy as np


def pairwise_dist2(x, y=None):
    """(N, M) squared euclidean distances on device."""
    x = jnp.asarray(x, jnp.float32)
    y = x if y is None else jnp.asarray(y, jnp.float32)
    xx = jnp.sum(x * x, axis=1)[:, None]
    yy = jnp.sum(y * y, axis=1)[None, :]
    return jnp.maximum(xx + yy - 2.0 * (x @ y.T), 0.0)


def dbscan(points, eps, min_samples=1):
    """Density-based clustering; labels -1 = noise.

    Same semantics as sklearn DBSCAN used by the center-clustering stage
    (`run_center_clustering.py:61-88`): core points have >= min_samples
    neighbours within eps; clusters are connected components of core points,
    border points join a neighbouring core's cluster.

    :param points: (N, D)
    :returns: (N,) int labels
    """
    points = np.asarray(points, float)
    n = len(points)
    if n == 0:
        return np.zeros(0, dtype=int)
    d2 = np.asarray(pairwise_dist2(points))
    adj = d2 <= eps * eps                         # includes self
    n_neigh = adj.sum(axis=1)
    core = n_neigh >= min_samples

    labels = np.full(n, -1, dtype=int)
    cluster = 0
    for i in range(n):
        if labels[i] != -1 or not core[i]:
            continue
        # BFS over core connectivity
        stack = [i]
        labels[i] = cluster
        while stack:
            p = stack.pop()
            if not core[p]:
                continue
            for q in np.nonzero(adj[p])[0]:
                if labels[q] == -1:
                    labels[q] = cluster
                    stack.append(q)
        cluster += 1
    return labels


def estimate_bandwidth(points, quantile=0.3):
    """Mean of each point's max distance to its ``quantile * N`` nearest
    neighbours (sklearn-compatible heuristic)."""
    points = np.asarray(points, float)
    n = len(points)
    k = max(1, int(n * quantile))
    d = np.sqrt(np.asarray(pairwise_dist2(points)))
    part = np.sort(d, axis=1)[:, :k + 1]          # includes self at 0
    return float(np.mean(part[:, -1]))


def mean_shift(points, bandwidth=None, max_iter=300):
    """Flat-kernel mean shift; returns (modes, labels).

    Used to pick the number of mixture components for the ray-shape models
    (`region_growing.py:381-386,530-537`).
    """
    points = np.asarray(points, float)
    if bandwidth is None or bandwidth <= 0:
        bandwidth = estimate_bandwidth(points)
        if bandwidth <= 0:
            bandwidth = 1.0
    x = jnp.asarray(points, jnp.float32)

    def step(seeds):
        d2 = pairwise_dist2(seeds, x)
        w = (d2 <= bandwidth * bandwidth).astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
        return (w @ x) / cnt

    seeds = x
    for _ in range(max_iter):
        new = step(seeds)
        if float(jnp.max(jnp.abs(new - seeds))) < 1e-3 * bandwidth:
            seeds = new
            break
        seeds = new
    seeds = np.asarray(seeds)

    # merge modes closer than bandwidth, larger basin wins
    order = np.argsort(-np.ones(len(seeds)))      # stable original order
    modes = []
    for i in order:
        s = seeds[i]
        if not any(np.sum((s - m) ** 2) <= bandwidth * bandwidth for m in modes):
            modes.append(s)
    modes = np.asarray(modes)
    d2 = np.asarray(pairwise_dist2(points, modes))
    labels = np.argmin(d2, axis=1)
    # relabel by frequency order (densest cluster = 0) like sklearn
    counts = np.bincount(labels, minlength=len(modes))
    remap = np.argsort(np.argsort(-counts))
    return modes[np.argsort(-counts)], remap[labels]


def spectral_clustering(points, n_clusters, gamma=1.0, seed=0):
    """Normalised spectral clustering with an RBF affinity
    (`region_growing.py:473-510` uses sklearn SpectralClustering).

    Affinity eigen-decomposition and k-means both run on device.
    """
    from pyimsegm_tpu.models.gmm import kmeans_fit

    points = np.asarray(points, float)
    d2 = pairwise_dist2(points)
    # sklearn default gamma = 1 / n_features
    gamma = gamma / points.shape[1]
    aff = jnp.exp(-gamma * d2)
    deg = jnp.sum(aff, axis=1)
    d_inv = 1.0 / jnp.sqrt(jnp.maximum(deg, 1e-12))
    lap = jnp.eye(len(points)) - d_inv[:, None] * aff * d_inv[None, :]
    _, vecs = jnp.linalg.eigh(lap)
    emb = vecs[:, :n_clusters]
    emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    _, labels = kmeans_fit(jax.random.PRNGKey(seed), emb.astype(jnp.float32),
                           jnp.ones(len(points), jnp.float32), n_clusters)
    return np.asarray(labels)
