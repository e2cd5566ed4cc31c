"""Wall-clock benchmarks for ALL BASELINE.json configs on one chip.

`bench.py` remains the driver's single-line headline (config 3, batched
throughput).  This harness adds the other four reference workloads
(BASELINE.json `configs`), printing one JSON line per config plus a
markdown summary to stderr:

1. unsupervised single drosophila_ovary_slice image
   (`run_segm_slic_model_graphcut` semantics)
2. supervised drosophila_disc with color + Gabor + LBP texture features
   (`run_segm_slic_classif_graphcut` semantics)
3. batched unsupervised throughput (delegates to bench.py's measurement)
4. egg-center detection chain per image (`run_center_prediction` semantics)
5. RG2Sp GraphCut region growing per iteration
   (`run_ovary_egg-segmentation` semantics)
6. 3D gray pipeline + supervoxel kernel at 23.6 MVox bench scale
   (`pipe_gray3d_slic_features_model_graphcut` semantics)

Usage: ``python bench_all.py [--configs 1,2,4,5,6]``
"""

import glob
import json
import os
import sys
import time

import numpy as np

DATA = os.environ.get('PYIMSEGM_DATA_PATH', '/root/reference/data-images')
FEATS_COLOR = {'color': ['mean', 'std', 'energy']}
SP_SIZE, SP_REGUL, GC_REGUL, NB_CLASSES = 35, 0.2, 2.0, 3


def _imread(path):
    from PIL import Image
    return np.asarray(Image.open(path))


def _emit(name, value, unit, extra=None):
    row = {'metric': name, 'value': round(float(value), 3), 'unit': unit}
    if extra:
        row.update(extra)
    print(json.dumps(row), flush=True)


def bench_unsup_single():
    """Config 1: one 1024x647 ovary slice, per-image GMM, model edges."""
    import jax
    import jax.numpy as jnp

    from pyimsegm_tpu import pipelines
    from pyimsegm_tpu.ops import slic as slic_ops

    img = _imread(os.path.join(DATA, 'drosophila_ovary_slice', 'image',
                               'insitu7545.jpg'))

    def run():
        segm, soft = pipelines.pipe_color2d_slic_features_model_graphcut(
            img, NB_CLASSES, FEATS_COLOR, sp_size=SP_SIZE, sp_regul=SP_REGUL,
            gc_regul=GC_REGUL, gc_edge_type='model')
        return segm

    run()                                        # compile
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run()
    dt = (time.perf_counter() - t0) / reps
    mpix = img.shape[0] * img.shape[1] / 1e6
    _emit('cfg1_unsup_single_image', mpix / dt, 'MPix/s',
          {'wall_ms': round(dt * 1e3, 2), 'note': 'incl. per-image GMM fit'})
    del out

    # Device-side latency of the SAME program (image resident, outputs
    # blocked on-device): isolates compute from the dev-rig tunnel, whose
    # ~30 MB/s / ~25 ms RTT floor dominates wall_ms above (QUALITY.md
    # "single-image latency" section).  On a production TPU host the
    # PCIe transfers are <1 ms, so this is the deployable per-image figure.
    imgj = jnp.asarray(img)
    cfg = slic_ops.slic_config(img.shape[0], img.shape[1], SP_SIZE)
    m = slic_ops.compactness_from_regul(SP_SIZE, SP_REGUL)
    spec = pipelines._features_spec(FEATS_COLOR)

    def run_dev():
        out = pipelines._pipe_unsup_core(
            imgj, cfg=cfg, feats_spec=spec, nb_classes=NB_CLASSES,
            estim_model='GMM', pca_coef=None, use_scaler=True,
            gc_regul=float(GC_REGUL), gc_edge_type='model', compactness=m)
        jax.block_until_ready(out[:2])

    run_dev()
    t0 = time.perf_counter()
    for _ in range(reps):
        run_dev()
    dt = (time.perf_counter() - t0) / reps
    _emit('cfg1_unsup_core_device', dt * 1e3, 'ms/image',
          {'note': 'jitted core, on-device in/out (excl. host link)'})


def bench_supervised():
    """Config 2: drosophila_disc, color + Gabor + LBP texture, RandForest."""
    from pyimsegm_tpu import pipelines

    img_dir = os.path.join(DATA, 'drosophila_disc')
    paths_img = sorted(glob.glob(os.path.join(img_dir, 'image', 'img_*.jpg')))
    imgs, annots = [], []
    for p in paths_img[:4]:
        name = os.path.splitext(os.path.basename(p))[0]
        ap = os.path.join(img_dir, 'annot', name + '.png')
        if os.path.isfile(ap):
            imgs.append(_imread(p))
            annot = _imread(ap)
            if annot.ndim == 3:                  # RGB-coded annotation
                from pyimsegm_tpu.annotation import image_color_2_labels
                annot = image_color_2_labels(annot)
            annots.append(annot)
    feats = {'color': ['mean', 'std', 'energy'],
             'tGabor': ['mean', 'energy'], 'tLBP': ['mean']}

    t0 = time.perf_counter()
    classif, _, _, _ = pipelines.train_classif_color2d_slic_features(
        imgs, annots, feats, sp_size=SP_SIZE, sp_regul=SP_REGUL,
        nb_classif_search=3)
    t_train = time.perf_counter() - t0

    def run():
        return pipelines.segment_color2d_slic_features_model_graphcut(
            imgs[0], classif, feats, sp_size=SP_SIZE, sp_regul=SP_REGUL,
            gc_regul=5.0, gc_edge_type='model')[0]

    run()
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps
    mpix = imgs[0].shape[0] * imgs[0].shape[1] / 1e6
    _emit('cfg2_supervised_predict', mpix / dt, 'MPix/s',
          {'wall_ms': round(dt * 1e3, 2),
           'train_s': round(t_train, 2),
           'features': 'color+Gabor+LBP'})

    # device-side latency of the same fused program (image resident, outputs
    # blocked on device) — the deployable figure; the wall above includes the
    # dev-rig tunnel (see QUALITY.md "single-image latency")
    import jax
    import jax.numpy as jnp
    from pyimsegm_tpu.ops import slic as slic_ops
    imgj = jnp.asarray(imgs[0])
    cfg = slic_ops.slic_config(imgs[0].shape[0], imgs[0].shape[1], SP_SIZE)
    m = slic_ops.compactness_from_regul(SP_SIZE, SP_REGUL)
    clf_apply, clf_arrays = classif.device_predict_fn()
    spec = pipelines._features_spec(feats)

    def run_dev():
        out = pipelines._segment_with_classif_core(
            imgj, clf_arrays, clf_apply=clf_apply, cfg=cfg, feats_spec=spec,
            gc_regul=5.0, gc_edge_type='model', compactness=m)
        np.asarray(out[2].ravel()[0])          # force queue drain (tunnel)

    run_dev()
    t0 = time.perf_counter()
    for _ in range(reps):
        run_dev()
    dt = (time.perf_counter() - t0) / reps
    _emit('cfg2_supervised_core_device', dt * 1e3, 'ms/image',
          {'mpix_s': round(mpix / dt, 2),
           'note': 'jitted core, on-device in/out (excl. host link)'})

    # reference-matching feature family (the reference has no Gabor/LBP):
    # color + tLM mean/std/energy, comparable with
    # tools/refrun/time_reference.py ref_cfg2 row
    feats_tlm = {'color': ['mean', 'std', 'energy'],
                 'tLM': ['mean', 'std', 'energy']}
    spec_tlm = pipelines._features_spec(feats_tlm)

    def run_tlm():
        out = pipelines._slic_features_core(imgj, cfg, spec_tlm, m)
        np.asarray(out[1].ravel()[0])

    run_tlm()
    t0 = time.perf_counter()
    for _ in range(reps):
        run_tlm()
    dt = (time.perf_counter() - t0) / reps
    _emit('cfg2_tlm_features_device', dt * 1e3, 'ms/image',
          {'mpix_s': round(mpix / dt, 2),
           'features': 'color+tLM (reference-matching family)'})


def bench_headline():
    """Config 3: delegate to bench.py (the driver's single-line metric)."""
    import subprocess
    out = subprocess.run([sys.executable, 'bench.py'], capture_output=True,
                         text=True, cwd=os.path.dirname(os.path.abspath(__file__)))
    line = [ln for ln in out.stdout.splitlines() if ln.startswith('{')]
    if line:
        row = json.loads(line[-1])
        row['metric'] = 'cfg3_' + row['metric']
        print(json.dumps(row), flush=True)
    else:
        print(out.stderr[-500:], file=sys.stderr)


def bench_centers():
    """Config 4: center detection predict path per ovary image.

    The benched metric is the per-image *detection* chain (BASELINE
    configs[3]); training is setup, so the hyper-parameter search is cut to
    the default fit (one compile) — classifier quality does not affect the
    detection chain's wall clock.
    """
    from pyimsegm_tpu import centers as ctr
    from pyimsegm_tpu import superpixels

    base = os.path.join(DATA, 'drosophila_ovary_slice')
    names = ['insitu4174', 'insitu4358']
    imgs = [_imread(os.path.join(base, 'image', n + '.jpg')) for n in names]
    segms = [_imread(os.path.join(base, 'segm', n + '.png')) for n in names]
    cents = [np.argwhere(_imread(os.path.join(
        base, 'center_levels', n + '.png')) > 0)[::50] for n in names]

    t0 = time.perf_counter()
    classif, _ = ctr.train_center_classifier(
        segms, imgs, cents, params={'nb_classif_search': 1})
    print('# cfg4 train setup %.1f s' % (time.perf_counter() - t0),
          file=sys.stderr, flush=True)

    def run():
        return ctr.load_compute_detect_centers(imgs[0], segms[0], classif)

    run()
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps
    _emit('cfg4_center_detection_per_image', dt * 1e3, 'ms/image',
          {'note': 'SLIC grid points + annuli hists + rays + forest + DBSCAN'})


def bench_rg2sp():
    """Config 5: RG2Sp GraphCut per-iteration cost on insitu7545."""
    from pyimsegm_tpu import region_growing as rg
    from pyimsegm_tpu import superpixels

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

    def run(nb_iter, history=None):
        return rg.region_growing_shape_slic_graphcut(
            slic, prob_fg, centres, (model, cdfs), 'cdf',
            coef_shape=5., coef_pairwise=15., prob_label_trans=[0.1, 0.03],
            optim_global=True, nb_iter=nb_iter, debug_history=history,
            grid_cfg=grid_cfg)

    run(2)                                        # compile
    # the solver stops when labels converge; time a full run and divide by
    # the actual iteration count from debug_history (same methodology as
    # tools/refrun/time_reference.py)
    history = {}
    t0 = time.perf_counter()
    run(100, history)
    dt = time.perf_counter() - t0
    n_iters = max(len(history.get('labels', ())), 1)
    _emit('cfg5_rg2sp_gc_per_iteration', dt / n_iters * 1e3, 'ms/iteration',
          {'objects': int(len(centres)), 'superpixels': int(slic.max() + 1),
           'iterations': int(n_iters), 'total_s': round(dt, 2)})


def bench_gray3d():
    """3D gray pipeline (`/root/reference/imsegm/pipelines.py:382-431`):
    supervoxel kernel throughput + XLA-vs-Pallas parity at bench scale, and
    the end-to-end unsupervised 3D pipe wall."""
    import jax.numpy as jnp

    from pyimsegm_tpu import pipelines
    from pyimsegm_tpu.ops import slic3d
    from pyimsegm_tpu.ops.slic import compactness_from_regul

    rng = np.random.default_rng(0)
    z, h, w = 48, 640, 768                           # 23.6 MVox
    vol = (rng.random((z, h, w), dtype=np.float32) / 2.0)
    vol[:, :, :w // 2] += 0.5
    volj = jnp.asarray(vol)
    cfg = slic3d.slic3d_config(vol.shape, 15, (4, 1, 1))
    m = compactness_from_regul(15, 0.2)

    def run_kernel(force):
        os.environ['PYIMSEGM_SLIC3D_PALLAS'] = force
        out = slic3d.slic3d_segment(volj, cfg, m)
        return np.asarray(out)

    lab_p = run_kernel('1')                          # compile pallas
    t0 = time.perf_counter()
    for _ in range(3):
        lab_p = run_kernel('1')
    dt_p = (time.perf_counter() - t0) / 3
    lab_x = run_kernel('0')                          # compile xla
    t0 = time.perf_counter()
    lab_x = run_kernel('0')
    dt_x = time.perf_counter() - t0
    os.environ.pop('PYIMSEGM_SLIC3D_PALLAS', None)
    agree = float(np.mean(lab_p == lab_x))
    mvox = vol.size / 1e6
    _emit('cfg6_slic3d_kernel', mvox / dt_p, 'MVox/s',
          {'xla_mvox_s': round(mvox / dt_x, 2),
           'pallas_vs_xla_agreement': round(agree, 5),
           'shape': list(vol.shape)})

    def run_pipe():
        return pipelines.pipe_gray3d_slic_features_model_graphcut(
            vol, 2, {'color': ['mean', 'std', 'energy']}, spacing=(4, 1, 1),
            sp_size=15, sp_regul=0.2, gc_regul=0.1)

    run_pipe()
    t0 = time.perf_counter()
    for _ in range(3):
        run_pipe()
    dt = (time.perf_counter() - t0) / 3
    _emit('cfg6_gray3d_pipe', mvox / dt, 'MVox/s',
          {'wall_ms': round(dt * 1e3, 2),
           'note': 'end-to-end unsup 3D pipe incl. GMM fit + MRF'})

    # device-side wall of the same jitted core (volume resident, output
    # blocked on device): the wall above moves ~170 MB through the dev-rig
    # tunnel (see QUALITY.md "single-image latency")
    spec = pipelines._features_spec({'color': ['mean', 'std', 'energy']})

    def run_core():
        out = pipelines._pipe_gray3d_core(
            volj, cfg=cfg, feats_spec=spec, nb_classes=2,
            estim_model='GMM', gc_regul=0.1, compactness=m)
        np.asarray(out.ravel()[0])

    run_core()
    t0 = time.perf_counter()
    for _ in range(3):
        run_core()
    dt = (time.perf_counter() - t0) / 3
    _emit('cfg6_gray3d_core_device', mvox / dt, 'MVox/s',
          {'wall_ms': round(dt * 1e3, 2),
           'note': 'jitted core, on-device in/out (excl. host link)'})


def main():
    from bench import _enable_compile_cache
    _enable_compile_cache()
    cfgs = '1,2,3,4,5,6'
    for i, a in enumerate(sys.argv):
        if a == '--configs':
            cfgs = sys.argv[i + 1]
    cfgs = set(cfgs.split(','))
    if '1' in cfgs:
        bench_unsup_single()
    if '2' in cfgs:
        bench_supervised()
    if '3' in cfgs:
        bench_headline()
    if '4' in cfgs:
        bench_centers()
    if '5' in cfgs:
        bench_rg2sp()
    if '6' in cfgs:
        bench_gray3d()


if __name__ == '__main__':
    main()
