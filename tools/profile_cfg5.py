"""Per-iteration attribution for BASELINE config 5 (RG2Sp GraphCut).

Reproduces bench_all's cfg5 setup and times the pieces of one iteration:
shape-cost update (batched prior lookup), clamped MRF solve, candidate
masks, plus the full solver loop divided by converged iterations.
Run:  python tools/profile_cfg5.py   (TPU; CPU with JAX_PLATFORMS=cpu)
"""

import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = os.environ.get('PYIMSEGM_DATA_PATH', '/root/reference/data-images')


def _imread(path):
    from PIL import Image
    return np.asarray(Image.open(path))


def main():
    from bench import _enable_compile_cache
    _enable_compile_cache()
    import jax.numpy as jnp

    from pyimsegm_tpu import region_growing as rg
    from pyimsegm_tpu import superpixels
    from pyimsegm_tpu.ops import graph as graph_ops

    base = os.path.join(DATA, 'drosophila_ovary_slice')
    img = _imread(os.path.join(base, 'image', 'insitu7545.jpg'))
    seg = _imread(os.path.join(base, 'segm', 'insitu7545.png'))
    annot = _imread(os.path.join(base, 'annot_eggs', 'insitu7545.png'))
    centres = np.array([np.mean(np.argwhere(annot == lb), axis=0)
                        for lb in range(1, annot.max() + 1)])
    ann_paths = sorted(glob.glob(os.path.join(base, 'annot_eggs', '*.png')))
    annots = [_imread(p) for p in ann_paths]
    list_rays, _ = rg.compute_object_shapes(annots, ray_step=25,
                                            smooth_coef=1,
                                            interp_order='spline')
    model, cdfs = rg.transform_rays_model_cdf_mixture(list_rays)
    slic = superpixels.segment_slic_img2d(img, sp_size=15,
                                          relative_compact=0.2)
    from pyimsegm_tpu.ops.slic import slic_config
    grid_cfg = slic_config(img.shape[0], img.shape[1], 15)
    prob_fg = rg.compute_segm_prob_fg(slic, seg, [0.1, 0.9, 0.75, 0.9, 0.9])

    k, edges, evalid, centers_np, slic_weights = rg._graph_setup(slic)
    slic_points = np.round(centers_np).astype(int)
    init_centres = np.round(np.asarray(centres)).astype(int)
    nb_obj = len(init_centres)
    print('K=%d  E=%d  objects=%d' % (k, len(edges), nb_obj), flush=True)

    # --- stage: batched prior-cost lookup for all objects
    cdf = np.asarray(cdfs, float)
    tables = np.broadcast_to(cdf, (nb_obj,) + cdf.shape)
    t0 = time.perf_counter()
    for _ in range(5):
        rg._eval_prior_costs_all(slic_points, tables, init_centres,
                                 np.zeros(nb_obj))
    print('prior-costs all-objects:  %8.2f ms'
          % ((time.perf_counter() - t0) / 5 * 1e3), flush=True)

    # --- stage: one clamped solve (mirror _solve_clamped internals)
    from pyimsegm_tpu.ops.graphcut import solve_mrf
    labels = np.zeros(k, dtype=int)
    lut_data_cost, labels = rg.compute_data_costs_points(
        slic, prob_fg, init_centres, labels)
    edges_j = jnp.asarray(edges)
    evalid_j = jnp.asarray(evalid)
    spatial = np.asarray(graph_ops.compute_spatial_dist(
        jnp.asarray(centers_np, jnp.float32), edges_j, evalid_j,
        relative=True))
    edge_w = np.where(evalid, 1.0 / np.maximum(spatial, 1e-12), 0.0)
    pairwise = rg._penalty_matrix(nb_obj + 1, [0.1, 0.03]) * 15.0
    unary = np.random.default_rng(0).random((k, nb_obj + 1)).astype(np.float32)

    def solve():
        out = solve_mrf(jnp.asarray(unary, jnp.float32), edges_j,
                        jnp.asarray(edge_w, jnp.float32),
                        jnp.asarray(pairwise, jnp.float32),
                        n_expand_rounds=3, n_chains=2)
        return np.asarray(out)

    solve()
    t0 = time.perf_counter()
    for _ in range(5):
        solve()
    print('clamped solve_mrf:        %8.2f ms'
          % ((time.perf_counter() - t0) / 5 * 1e3), flush=True)

    # --- stage: candidate masks (host numpy)
    t0 = time.perf_counter()
    for _ in range(5):
        cand = rg._candidate_masks(edges, evalid, labels, nb_obj, True)
        rg._neighbor_class_mask(edges, evalid, labels, nb_obj + 1)
    print('candidate masks (host):   %8.2f ms'
          % ((time.perf_counter() - t0) / 5 * 1e3), flush=True)

    # --- full loop
    history = {}
    t0 = time.perf_counter()
    rg.region_growing_shape_slic_graphcut(
        slic, prob_fg, centres, (model, cdfs), 'cdf', coef_shape=5.,
        coef_pairwise=15., prob_label_trans=[0.1, 0.03], optim_global=True,
        nb_iter=100, debug_history=history, grid_cfg=grid_cfg)
    dt = time.perf_counter() - t0
    n = max(len(history.get('labels', ())), 1)
    print('FULL: %.2f s / %d iters = %7.2f ms/iter' % (dt, n, dt / n * 1e3),
          flush=True)


if __name__ == '__main__':
    main()
