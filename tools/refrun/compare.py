"""Score the TPU framework directly against the ACTUAL reference outputs
produced by ``run_reference.py`` (VERDICT r1 item 4).

For each exported reference run this computes:

* ``shared_model`` ARS — the reference's fitted sklearn scaler+GMM is
  replayed through the TPU pipeline (converted to a
  :class:`pyimsegm_tpu.models.class_model.ClassModel`), so the score
  isolates the re-implemented SLIC / features / edge-weights / MRF solver
  against the reference's, given the identical class model.
* ``independent_fit`` ARS — the TPU pipeline fits its own model; unsup EM
  is multistable so this is informational (the reference does not agree
  with itself across seeds either; see tools/check_parity.py docstring).

Usage::

    python tools/refrun/compare.py [--out DIR] [--json PATH]

Runs on whatever jax backend is available (CPU is fine: TPU-vs-CPU
agreement of this framework is covered by tools/check_parity.py; this
tool covers framework-vs-reference).
"""

import argparse
import glob
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
sys.path.insert(0, _REPO)

import numpy as np


def _load_image(path):
    from PIL import Image
    return np.asarray(Image.open(path))


FEATS = {'color': ['mean', 'std', 'energy']}
SP_SIZE, SP_REGUL, GC_REGUL = 35, 0.2, 2.0


def _ref_model_to_class_model(npz, jnp):
    from pyimsegm_tpu.models.class_model import ClassModel
    from pyimsegm_tpu.models.gmm import GMMParams
    scaler_mean = scaler_scale = None
    if 'scaler_mean' in npz:
        scaler_mean = jnp.asarray(npz['scaler_mean'], jnp.float32)
        scaler_scale = jnp.asarray(npz['scaler_scale'], jnp.float32)
    gmm = GMMParams(weights=jnp.asarray(npz['gmm_weights'], jnp.float32),
                    means=jnp.asarray(npz['gmm_means'], jnp.float32),
                    covs=jnp.asarray(npz['gmm_covs'], jnp.float32))
    return ClassModel(scaler_mean, scaler_scale, None, None, None, gmm)


def compare_unsup(out_dir):
    import jax.numpy as jnp

    from pyimsegm_tpu import pipelines
    from pyimsegm_tpu.utils.metrics import adjusted_rand_score

    rows = []
    for path in sorted(glob.glob(os.path.join(out_dir, 'unsup_*.npz'))):
        npz = np.load(path, allow_pickle=False)
        image = _load_image(str(npz['image_path']))
        ref_segm = npz['segm']

        model = _ref_model_to_class_model(npz, jnp)
        ours_shared, _ = pipelines.segment_color2d_slic_features_model_graphcut(
            image, model, FEATS, sp_size=SP_SIZE, sp_regul=SP_REGUL,
            gc_regul=GC_REGUL, gc_edge_type='model')
        ars_shared = float(adjusted_rand_score(
            jnp.asarray(ref_segm).ravel(), jnp.asarray(ours_shared).ravel()))

        ours_indep, _ = pipelines.pipe_color2d_slic_features_model_graphcut(
            image, nb_classes=int(npz['gmm_weights'].shape[0]),
            dict_features=FEATS, sp_size=SP_SIZE, sp_regul=SP_REGUL,
            gc_regul=GC_REGUL, gc_edge_type='model')
        ars_indep = float(adjusted_rand_score(
            jnp.asarray(ref_segm).ravel(), jnp.asarray(ours_indep).ravel()))

        name = os.path.basename(path)[len('unsup_'):-len('.npz')]
        rows.append(dict(config='unsup', image=name,
                         ars_shared_model=round(ars_shared, 4),
                         ars_independent_fit=round(ars_indep, 4)))
        print('unsup %-24s shared-model ARS %.4f   independent ARS %.4f'
              % (name, ars_shared, ars_indep), flush=True)
    return rows


def compare_unsup_compat(out_dir):
    """Shared-model e2e score of the skimage-compat mode (``sp_compat=True``:
    5x5-window f32 SLIC + split-relabel-merge connectivity + generic feature
    and graph ops) against the actual reference outputs — the VERDICT r3
    item-6 acceptance run (target: CIMA ARS >= 0.9)."""
    import jax.numpy as jnp

    from pyimsegm_tpu import pipelines
    from pyimsegm_tpu.utils.metrics import adjusted_rand_score

    rows = []
    for path in sorted(glob.glob(os.path.join(out_dir, 'unsup_*.npz'))):
        npz = np.load(path, allow_pickle=False)
        image = _load_image(str(npz['image_path']))
        ref_segm = npz['segm']

        model = _ref_model_to_class_model(npz, jnp)
        ours, _ = pipelines.segment_color2d_slic_features_model_graphcut(
            image, model, FEATS, sp_size=SP_SIZE, sp_regul=SP_REGUL,
            gc_regul=GC_REGUL, gc_edge_type='model', sp_compat=True)
        ars = float(adjusted_rand_score(
            jnp.asarray(ref_segm).ravel(), jnp.asarray(ours).ravel()))

        # tessellation-level agreement, for attribution
        from sklearn.metrics import adjusted_rand_score as _sk_ars
        labels_np = None
        try:
            from pyimsegm_tpu.ops.slic import segment_slic_img2d
            labels_np = segment_slic_img2d(
                np.asarray(image), sp_size=SP_SIZE,
                relative_compact=SP_REGUL, compat=True)
            ars_slic = float(_sk_ars(npz['slic'].ravel(), labels_np.ravel()))
        except Exception:
            ars_slic = float('nan')

        name = os.path.basename(path)[len('unsup_'):-len('.npz')]
        rows.append(dict(config='unsup_compat', image=name,
                         ars_shared_model=round(ars, 4),
                         ars_slic_tessellation=round(ars_slic, 4)))
        print('compat %-24s shared-model ARS %.4f   slic ARS %.4f'
              % (name, ars, ars_slic), flush=True)
    return rows


def diagnose_unsup(out_dir):
    """Per-stage attribution of any unsup disagreement:

    * feature parity on the REFERENCE superpixels (same segments, so the
      comparison is exact, isolating the descriptors stack);
    * argmax-label ARS given the shared model (isolates SLIC tessellation +
      features + model predict, no MRF);
    * final ARS (adds the MRF solve).
    """
    import jax.numpy as jnp

    from pyimsegm_tpu import descriptors
    from pyimsegm_tpu.utils.metrics import adjusted_rand_score
    from pyimsegm_tpu.models.gmm import gmm_predict_proba

    for path in sorted(glob.glob(os.path.join(out_dir, 'unsup_*.npz'))):
        npz = np.load(path, allow_pickle=False)
        if 'features' not in npz:
            continue
        name = os.path.basename(path)[len('unsup_'):-len('.npz')]
        image = _load_image(str(npz['image_path'])).astype(np.float32)
        ref_slic = npz['slic']
        ref_feats = npz['features']

        ours_feats, _names = descriptors.compute_selected_features_img2d(
            image, jnp.asarray(ref_slic.ravel(), jnp.int32),
            int(ref_slic.max()) + 1, FEATS)
        ours_feats = np.nan_to_num(np.asarray(ours_feats))[:ref_feats.shape[0]]
        denom = np.maximum(np.abs(ref_feats), 1e-6)
        rel = np.abs(ours_feats - ref_feats) / denom
        print('diag  %-24s feature max-rel-diff %.2e (median %.2e)'
              % (name, rel.max(), np.median(rel)), flush=True)

        model = _ref_model_to_class_model(npz, jnp)
        proba_ref_slic = np.asarray(model.predict_proba(ours_feats))
        ours_argmax = proba_ref_slic.argmax(1)[ref_slic]
        ars_argmax_same_slic = float(adjusted_rand_score(
            jnp.asarray(npz['segm_argmax']).ravel(),
            jnp.asarray(ours_argmax).ravel()))
        print('diag  %-24s argmax-on-ref-slic agreement ARS %.4f'
              % (name, ars_argmax_same_slic), flush=True)

        # solver-vs-solver on the IDENTICAL graph: our device MRF given the
        # reference's superpixels/proba/features vs the reference's exact
        # alpha-expansion labels
        from pyimsegm_tpu.ops import graphcut as gc_ops
        gl = gc_ops.segment_graph_cut_general(
            jnp.asarray(ref_slic, jnp.int32), jnp.asarray(proba_ref_slic),
            int(ref_slic.max()) + 1, image=jnp.asarray(image),
            features=jnp.asarray(ours_feats), gc_regul=GC_REGUL,
            edge_type='model')
        ours_gc_ref_slic = np.asarray(gl)[ref_slic]
        ars_solver = float(adjusted_rand_score(
            jnp.asarray(npz['segm']).ravel(),
            jnp.asarray(ours_gc_ref_slic).ravel()))
        print('diag  %-24s solver-on-ref-graph agreement ARS %.4f'
              % (name, ars_solver), flush=True)


def compare_sup(out_dir):
    """Supervised: reference-trained classifier's label maps vs ours.

    Ours trains its own classifier on the same image/annotation pairs
    (classifier stacks differ — sklearn RandForest vs on-device forest —
    so this is a method-level comparison, not a kernel-parity one)."""
    import jax.numpy as jnp

    from pyimsegm_tpu import pipelines
    from pyimsegm_tpu.utils.metrics import adjusted_rand_score

    paths = sorted(glob.glob(os.path.join(out_dir, 'sup_*.npz')))
    if not paths:
        return []
    data = os.environ.get('PYIMSEGM_DATA_PATH', '/root/reference/data-images')
    base = os.path.join(data, 'drosophila_ovary_slice')
    names = [os.path.basename(p)[len('sup_'):-len('.npz')] for p in paths]
    images = [_load_image(os.path.join(base, 'image', n + '.jpg'))
              for n in names]
    annots = [_load_image(os.path.join(base, 'annot_struct', n + '.png'))
              for n in names]

    classif, _, _, _ = pipelines.train_classif_color2d_slic_features(
        images, annots, FEATS, sp_size=SP_SIZE, sp_regul=SP_REGUL)
    rows = []
    for name, image, path in zip(names, images, paths):
        ref_segm = np.load(path)['segm']
        ours, _ = pipelines.segment_color2d_slic_features_model_graphcut(
            image, classif, FEATS, sp_size=SP_SIZE, sp_regul=SP_REGUL,
            gc_regul=GC_REGUL, gc_edge_type='model')
        ars = float(adjusted_rand_score(
            jnp.asarray(ref_segm).ravel(), jnp.asarray(ours).ravel()))
        rows.append(dict(config='sup', image=name, ars_vs_reference=round(ars, 4)))
        print('sup   %-24s ARS vs reference %.4f' % (name, ars), flush=True)
    return rows


def compare_rg2sp(out_dir):
    """RG2Sp: our solvers vs the reference's on the same image, same shape
    model family and parameters (the reference's own test recipe), plus
    both sides vs the human per-egg annotation."""
    import jax.numpy as jnp

    from pyimsegm_tpu import region_growing as rg
    from pyimsegm_tpu import superpixels
    from pyimsegm_tpu.utils.metrics import adjusted_rand_score

    path = os.path.join(out_dir, 'rg2sp_insitu7545.npz')
    if not os.path.isfile(path):
        return []
    npz = np.load(path)
    annot = npz['annot']

    data = os.environ.get('PYIMSEGM_DATA_PATH', '/root/reference/data-images')
    base = os.path.join(data, 'drosophila_ovary_slice')
    img = _load_image(os.path.join(base, 'image', 'insitu7545.jpg'))
    seg = _load_image(os.path.join(base, 'segm', 'insitu7545.png'))
    centres = np.array([np.mean(np.argwhere(annot == lb), axis=0)
                        for lb in range(1, annot.max() + 1)])
    import glob as _glob
    annots = [_load_image(p) for p in sorted(_glob.glob(
        os.path.join(base, 'annot_eggs', '*.png')))]
    list_rays, _ = rg.compute_object_shapes(annots, ray_step=25,
                                            smooth_coef=1,
                                            interp_order='spline')
    model, list_mean_cdf = rg.transform_rays_model_sets_mean_cdf_mixture(
        list_rays, 2)
    slic = superpixels.segment_slic_img2d(img, sp_size=15,
                                          relative_compact=0.2)
    prob_fg = rg.compute_segm_prob_fg(slic, seg, [0.1, 0.9, 0.75, 0.9, 0.9])

    ours = {}
    ours['greedy'] = np.asarray(rg.region_growing_shape_slic_greedy(
        slic, prob_fg, centres, (model, list_mean_cdf), 'set_cdfs',
        coef_shape=5., coef_pairwise=15., prob_label_trans=[0.1, 0.03],
        greedy_tol=3e-1, allow_obj_swap=False, nb_iter=250))[slic]
    ours['gc'] = np.asarray(rg.region_growing_shape_slic_graphcut(
        slic, prob_fg, centres, (model, list_mean_cdf), 'set_cdfs',
        coef_shape=5., coef_pairwise=15., prob_label_trans=[0.1, 0.03],
        optim_global=False, allow_obj_swap=False, nb_iter=65))[slic]

    rows = []
    for solver in ('greedy', 'gc'):
        ref = npz['segm_%s' % solver]
        ars_ref_annot = float(adjusted_rand_score(
            jnp.asarray(annot).ravel(), jnp.asarray(ref).ravel()))
        ars_ours_annot = float(adjusted_rand_score(
            jnp.asarray(annot).ravel(), jnp.asarray(ours[solver]).ravel()))
        ars_cross = float(adjusted_rand_score(
            jnp.asarray(ref).ravel(), jnp.asarray(ours[solver]).ravel()))
        rows.append(dict(config='rg2sp_%s' % solver, image='insitu7545',
                         reference_ars_vs_annot=round(ars_ref_annot, 4),
                         ours_ars_vs_annot=round(ars_ours_annot, 4),
                         ars_ours_vs_reference=round(ars_cross, 4)))
        print('rg2sp %-8s ref-vs-annot %.4f   ours-vs-annot %.4f   '
              'ours-vs-ref %.4f'
              % (solver, ars_ref_annot, ars_ours_annot, ars_cross),
              flush=True)
    return rows


def compare_centers(out_dir):
    """Centre detection: our chain trained on the same two images, detected
    on the same held-out images; F1 at the 50 px tolerance for both sides."""
    from apps.run_center_candidate_training import load_center_annotation
    from pyimsegm_tpu import centers as ctr

    paths = sorted(glob.glob(os.path.join(out_dir, 'centers_*.npz')))
    if not paths:
        return []
    data = os.environ.get('PYIMSEGM_DATA_PATH', '/root/reference/data-images')
    base = os.path.join(data, 'drosophila_ovary_slice')

    def _load(name):
        img = _load_image(os.path.join(base, 'image', name + '.jpg'))
        segm = _load_image(os.path.join(base, 'segm', name + '.png')).astype(int)
        cents = load_center_annotation(
            os.path.join(base, 'center_levels', name + '.png'))
        return img, segm, cents

    train_names = ['insitu4174', 'insitu4358']
    imgs, segms, cents = zip(*[_load(n) for n in train_names])
    classif, _ = ctr.train_center_classifier(list(segms), list(imgs),
                                             list(cents))
    rows = []
    for path in paths:
        name = os.path.basename(path)[len('centers_'):-len('.npz')]
        npz = np.load(path)
        img, segm, centers_gt = _load(name)
        res = ctr.load_compute_detect_centers(img, segm, classif)
        ours_det = np.asarray(res['centers'])
        stat_ref = ctr.evaluate_detected_centers(
            npz['centers_detected'], centers_gt, dist_thr=50)
        stat_ours = ctr.evaluate_detected_centers(ours_det, centers_gt,
                                                  dist_thr=50)
        rows.append(dict(config='centers', image=name,
                         reference_f1=round(stat_ref['f1'], 4),
                         ours_f1=round(stat_ours['f1'], 4)))
        print('ctr   %-12s reference P %.2f R %.2f F1 %.3f | ours P %.2f '
              'R %.2f F1 %.3f'
              % (name, stat_ref['precision'], stat_ref['recall'],
                 stat_ref['f1'], stat_ours['precision'], stat_ours['recall'],
                 stat_ours['f1']), flush=True)
    return rows


def compare_gray3d(out_dir):
    """3D gray pipeline on the same synthetic volume (independent fits;
    the volume is cleanly separable so EM multistability is not a factor)."""
    import jax.numpy as jnp

    from pyimsegm_tpu import pipelines
    from pyimsegm_tpu.utils.metrics import adjusted_rand_score

    path = os.path.join(out_dir, 'gray3d_synthetic.npz')
    if not os.path.isfile(path):
        return []
    npz = np.load(path)
    ours = pipelines.pipe_gray3d_slic_features_model_graphcut(
        npz['vol'], 2, {'color': ['mean', 'std', 'energy']}, spacing=(4, 1, 1),
        sp_size=15, sp_regul=0.2, gc_regul=0.1)
    ars = float(adjusted_rand_score(jnp.asarray(npz['segm']).ravel(),
                                    jnp.asarray(ours).ravel()))
    print('gray3d synthetic               ARS vs reference %.4f' % ars,
          flush=True)
    return [dict(config='gray3d', image='synthetic',
                 ars_vs_reference=round(ars, 4))]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--out', default=os.path.join(_HERE, 'out'))
    ap.add_argument('--json', default=os.path.join(_HERE, 'out', 'compare.json'))
    ap.add_argument('--configs', default='unsup,sup,rg2sp,centers,gray3d')
    args = ap.parse_args()
    rows = []
    cfgs = args.configs.split(',')
    if 'diag' in cfgs:
        diagnose_unsup(args.out)
    if 'unsup' in cfgs:
        rows += compare_unsup(args.out)
    if 'compat' in cfgs:
        rows += compare_unsup_compat(args.out)
    if 'sup' in cfgs:
        rows += compare_sup(args.out)
    if 'rg2sp' in cfgs:
        rows += compare_rg2sp(args.out)
    if 'centers' in cfgs:
        rows += compare_centers(args.out)
    if 'gray3d' in cfgs:
        rows += compare_gray3d(args.out)
    with open(args.json, 'w') as fh:
        json.dump(rows, fh, indent=1)
    print('wrote %s' % args.json)


if __name__ == '__main__':
    main()
