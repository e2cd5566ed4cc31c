"""Measure how much of the CIMA default-path gap is absorb-TARGET choice.

Compares three static-K connectivity enforcements of the SAME raw device
SLIC labels against the reference's skimage tessellation
(`tools/refrun/out/unsup_histology_CIMA.npz` must exist):

  a) current device semantics (anchor reach + nearest-donor absorb +
     most-contact min-size merge) — `ops.grid.enforce_grid_connectivity`
  b) prototype: whole-fragment most-contact absorption (every non-anchor
     component merges to the adjacent label it touches most; no new labels)
     + the same min-size merge
  c) skimage dynamic-K (native.enforce_connectivity) as the ceiling

Run on CPU:  JAX_PLATFORMS=cpu python tools/absorb_experiment.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp


def _components(labels):
    """4-connected component ids of a label map (numpy BFS-free two-pass
    union-find, small images)."""
    h, w = labels.shape
    parent = np.arange(h * w)

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    idx = np.arange(h * w).reshape(h, w)
    for (sl_a, sl_b) in (((slice(None), slice(1, None)),
                          (slice(None), slice(None, -1))),
                         ((slice(1, None), slice(None)),
                          (slice(None, -1), slice(None)))):
        same = labels[sl_a] == labels[sl_b]
        for a, b in zip(idx[sl_a][same].ravel(), idx[sl_b][same].ravel()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(i) for i in range(h * w)])
    _, comp = np.unique(roots, return_inverse=True)
    return comp.reshape(h, w)


def most_contact_absorb(labels, centers):
    """Whole-fragment most-contact absorption, static K."""
    h, w = labels.shape
    comp = _components(labels)
    n_comp = comp.max() + 1
    # anchor component per label: the component containing the pixel nearest
    # the label centroid (same anchor semantics as the device kernel)
    yy, xx = np.mgrid[0:h, 0:w]
    d2 = ((yy - centers[labels][..., 0]) ** 2
          + (xx - centers[labels][..., 1]) ** 2)
    k = labels.max() + 1
    anchor_comp = np.full(k, -1)
    order = np.argsort(d2.ravel(), kind='stable')
    lab_flat, comp_flat = labels.ravel()[order], comp.ravel()[order]
    seen = np.zeros(k, bool)
    for lb, cp in zip(lab_flat, comp_flat):
        if not seen[lb]:
            seen[lb] = True
            anchor_comp[lb] = cp
    is_anchor = anchor_comp[labels] == comp

    out = labels.copy()
    for _ in range(8):                       # chains of fragments
        comp = _components(out)
        d2a = ((yy - centers[out][..., 0]) ** 2
               + (xx - centers[out][..., 1]) ** 2)
        anchor_comp = np.full(k, -1)
        order = np.argsort(d2a.ravel(), kind='stable')
        lab_flat, comp_flat = out.ravel()[order], comp.ravel()[order]
        seen[:] = False
        for lb, cp in zip(lab_flat, comp_flat):
            if not seen[lb]:
                seen[lb] = True
                anchor_comp[lb] = cp
        frag = anchor_comp[out] != comp
        if not frag.any():
            break
        # contact counts (fragment component -> neighbouring label)
        pairs = {}
        for (sa, sb) in (((slice(None), slice(1, None)),
                          (slice(None), slice(None, -1))),
                         ((slice(1, None), slice(None)),
                          (slice(None, -1), slice(None)))):
            la, lb_ = out[sa], out[sb]
            ca, fa = comp[sa], frag[sa]
            cb, fb = comp[sb], frag[sb]
            diff = la != lb_
            for c_src, l_dst, m in ((ca, lb_, diff & fa & ~fb),
                                    (cb, la, diff & fb & ~fa)):
                for c, l in zip(c_src[m].ravel(), l_dst[m].ravel()):
                    pairs[(c, l)] = pairs.get((c, l), 0) + 1
        if not pairs:
            break
        best = {}
        for (c, l), n in sorted(pairs.items()):
            cur = best.get(c)
            if cur is None or n > cur[0]:
                best[c] = (n, l)
        target = np.full(comp.max() + 1, -1)
        for c, (n, l) in best.items():
            target[c] = l
        t_px = target[comp]
        take = frag & (t_px >= 0)
        out[take] = t_px[take]
    return out


def main():
    from pyimsegm_tpu.ops import grid as grid_ops
    from pyimsegm_tpu.ops import slic as slic_ops
    from pyimsegm_tpu.utils.metrics import adjusted_rand_score
    from PIL import Image

    ref = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'refrun', 'out', 'unsup_histology_CIMA.npz'))
    ref_slic = ref['slic']
    img = np.asarray(Image.open(
        '/root/reference/data-images/histology_CIMA/'
        '29-041-Izd2-w35-CD31-3-les1.jpg'))

    cfg = slic_ops.slic_config(img.shape[0], img.shape[1], 35)
    m = slic_ops.compactness_from_regul(35, 0.2)
    raw = np.asarray(slic_ops.slic_segment(jnp.asarray(img), cfg, m))
    min_size = int(0.5 * cfg.step * cfg.step)

    cur = np.asarray(grid_ops.enforce_grid_connectivity(
        jnp.asarray(raw), cfg, min_size=min_size))
    print('a) current device semantics vs ref slic: ARS %.4f'
          % adjusted_rand_score(cur, ref_slic), flush=True)

    # centroids of raw labels for the anchor definition
    counts, centers = slic_ops._labels_geometry(jnp.asarray(raw), cfg)
    centers = np.asarray(centers)
    proto = most_contact_absorb(raw, centers)
    proto_m = np.asarray(grid_ops.min_size_merge(jnp.asarray(proto), cfg,
                                                 min_size))
    print('b) whole-fragment most-contact (static K): ARS %.4f'
          % adjusted_rand_score(proto_m, ref_slic), flush=True)

    from pyimsegm_tpu import native
    sk = native.enforce_connectivity(raw, min_size=min_size)
    print('c) skimage dynamic-K ceiling: ARS %.4f'
          % adjusted_rand_score(sk, ref_slic), flush=True)


if __name__ == '__main__':
    main()
