"""TPU-vs-CPU end-to-end parity check (BASELINE.json acceptance: ARS >= 0.98).

Runs the identical unsupervised pipeline on the default backend (TPU: Pallas
kernels + MXU reductions) and forced to CPU (portable XLA formulations —
validated against the reference's doctest numerics in `tests/`), on the
bundled sample images, and reports per-image label agreement and ARS between
the two runs.

Two comparisons are reported:

* ``shared_model`` — the acceptance metric: the class model fitted by the
  CPU run is reused by the device run, so the score isolates the
  accelerated implementation (SLIC kernel, feature reductions, MRF solver)
  exactly.  This mirrors how implementation parity is meaningful: given the
  same model, do both backends produce the same labels?
* ``independent_fit`` — informational: each backend also fits its own model
  from its own features.  Unsupervised EM is multistable — the reference's
  own sklearn pipeline scores far below 0.98 against itself across seeds
  (``n_init`` restarts pick near-tied optima) — so small cross-backend
  rounding can legitimately select a different (equally good) mixture, and
  this number fluctuates with image content.

Usage: ``python tools/check_parity.py`` (spawns its own CPU subprocess).
"""

import glob
import json
import os
import pickle
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA = os.environ.get('PYIMSEGM_DATA_PATH', '/root/reference/data-images')
SP_SIZE, SP_REGUL, GC_REGUL, NB_CLASSES = 35, 0.2, 2.0, 3
FEATS = {'color': ['mean', 'std', 'energy']}


def _image_paths():
    pats = [
        os.path.join(DATA, 'drosophila_ovary_slice', 'image', 'insitu7545.jpg'),
        os.path.join(DATA, 'langerhans_islets', 'image', 'Lh05-04.jpg'),
        os.path.join(DATA, 'histology_CIMA', '29-041-Izd2-w35-CD31-3-les1.jpg'),
    ]
    paths = [p for p in pats if os.path.isfile(p)] or sorted(
        glob.glob(os.path.join(DATA, '*', 'image', '*.jpg')))[:3]
    if not paths:
        raise FileNotFoundError('no sample images under %r '
                                '(set PYIMSEGM_DATA_PATH)' % DATA)
    return paths


def _check_platform(force_cpu, allow_cpu):
    import jax
    if force_cpu:
        jax.config.update('jax_platforms', 'cpu')
    platform = jax.devices()[0].platform
    if force_cpu and platform != 'cpu':
        raise RuntimeError('cpu worker resolved to %r — run it with '
                           'JAX_PLATFORMS=cpu in the environment' % platform)
    if not force_cpu and platform == 'cpu' and not allow_cpu:
        raise RuntimeError(
            'device run resolved to the CPU backend — the check would '
            'degenerate to CPU-vs-CPU; attach an accelerator or pass '
            '--allow-cpu to acknowledge')
    print('[check_parity] %s run on platform: %s'
          % ('cpu' if force_cpu else 'device', platform), flush=True)


def run_cpu_worker(out_npz, models_pkl):
    """CPU pass: per-image independent fit + segmentation; export models."""
    import jax
    from PIL import Image

    from pyimsegm_tpu import pipelines

    _check_platform(force_cpu=True, allow_cpu=False)
    segms, models = {}, {}
    for path in _image_paths():
        img = np.asarray(Image.open(path), np.float32) / 255.0
        name = os.path.basename(path)
        dbg = {}
        segm, _soft = pipelines.pipe_color2d_slic_features_model_graphcut(
            img, NB_CLASSES, FEATS, sp_size=SP_SIZE, sp_regul=SP_REGUL,
            gc_regul=GC_REGUL, gc_edge_type='model', seed=0,
            debug_visual=dbg)
        segms[name] = np.asarray(segm)
        models[name] = jax.tree_util.tree_map(np.asarray, dbg['model']) \
            if 'model' in dbg else None
    if any(m is None for m in models.values()):
        # fall back: refit from features via the public group-model entry
        from pyimsegm_tpu.models.class_model import estim_class_model
        import jax.numpy as jnp
        for path in _image_paths():
            name = os.path.basename(path)
            if models[name] is not None:
                continue
            img = np.asarray(Image.open(path), np.float32) / 255.0
            model, _ = pipelines.estim_model_classes_group(
                [img], NB_CLASSES, FEATS, sp_size=SP_SIZE,
                sp_regul=SP_REGUL, seed=0)
            models[name] = jax.tree_util.tree_map(np.asarray, model)
    np.savez_compressed(out_npz, **segms)
    with open(models_pkl, 'wb') as fp:
        pickle.dump(models, fp)


def run_device(out_indep_npz, out_shared_npz, models_pkl, allow_cpu):
    """Device pass: independent fit AND segmentation with the CPU models."""
    from PIL import Image

    from pyimsegm_tpu import pipelines

    _check_platform(force_cpu=False, allow_cpu=allow_cpu)
    with open(models_pkl, 'rb') as fp:
        cpu_models = pickle.load(fp)

    indep, shared = {}, {}
    for path in _image_paths():
        img = np.asarray(Image.open(path), np.float32) / 255.0
        name = os.path.basename(path)
        segm, _ = pipelines.pipe_color2d_slic_features_model_graphcut(
            img, NB_CLASSES, FEATS, sp_size=SP_SIZE, sp_regul=SP_REGUL,
            gc_regul=GC_REGUL, gc_edge_type='model', seed=0)
        indep[name] = np.asarray(segm)
        segm2, _ = pipelines.segment_color2d_slic_features_model_graphcut(
            img, cpu_models[name], FEATS, sp_size=SP_SIZE,
            sp_regul=SP_REGUL, gc_regul=GC_REGUL, gc_edge_type='model')
        shared[name] = np.asarray(segm2)
    np.savez_compressed(out_indep_npz, **indep)
    np.savez_compressed(out_shared_npz, **shared)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == '--worker-cpu':
        run_cpu_worker(sys.argv[2], sys.argv[3])
        return

    from sklearn.metrics import adjusted_rand_score

    with tempfile.TemporaryDirectory() as td:
        cpu_npz = os.path.join(td, 'cpu.npz')
        models_pkl = os.path.join(td, 'models.pkl')
        indep_npz = os.path.join(td, 'tpu_indep.npz')
        shared_npz = os.path.join(td, 'tpu_shared.npz')

        # CPU run in a fresh subprocess (backends cannot switch in-process).
        # The env var is load-bearing: a bare jax.config.update does not
        # reliably beat the host sitecustomize's platform plugin, but
        # pyimsegm_tpu re-applies JAX_PLATFORMS at import.
        env = dict(os.environ, JAX_PLATFORMS='cpu')
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        '--worker-cpu', cpu_npz, models_pkl],
                       check=True, env=env)
        run_device(indep_npz, shared_npz, models_pkl,
                   allow_cpu='--allow-cpu' in sys.argv)

        cpu = np.load(cpu_npz)
        tpu_i = np.load(indep_npz)
        tpu_s = np.load(shared_npz)
        results = {}
        for name in cpu.files:
            sc = cpu[name]
            results[name] = {
                'shared_model': {
                    'agreement': float((tpu_s[name] == sc).mean()),
                    'ars': float(adjusted_rand_score(
                        tpu_s[name].ravel(), sc.ravel())),
                },
                'independent_fit': {
                    'agreement': float((tpu_i[name] == sc).mean()),
                    'ars': float(adjusted_rand_score(
                        tpu_i[name].ravel(), sc.ravel())),
                },
            }
        worst = min(r['shared_model']['ars'] for r in results.values())
        worst_i = min(r['independent_fit']['ars'] for r in results.values())
        print(json.dumps({
            'per_image': results,
            'worst_shared_model_ars': round(worst, 4),
            'worst_independent_fit_ars': round(worst_i, 4),
            'pass_0.98': worst >= 0.98,
        }, indent=2))


if __name__ == '__main__':
    main()
