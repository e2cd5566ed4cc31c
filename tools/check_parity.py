"""TPU-vs-CPU end-to-end parity check (BASELINE.json acceptance: ARS >= 0.98).

Runs the identical unsupervised pipeline twice — once on the default backend
(TPU: Pallas kernels + MXU reductions) and once forced to CPU (portable XLA
formulations) — on the bundled sample images, and reports per-image label
agreement and ARS between the two runs.  The CPU run is the reference-faithful
implementation (validated against the reference's doctest numerics in
`tests/`), so this measures exactly the accelerated-path deviation.

Usage: ``python tools/check_parity.py`` (spawns its own CPU subprocess).
"""

import glob
import json
import os
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


def run_pipeline(out_npz, force_cpu, allow_cpu=False):
    import jax
    if force_cpu:
        jax.config.update('jax_platforms', 'cpu')
    from PIL import Image

    from pyimsegm_tpu import pipelines

    platform = jax.devices()[0].platform
    if not force_cpu and platform == 'cpu' and not allow_cpu:
        raise RuntimeError(
            'device run resolved to the CPU backend — the check would '
            'degenerate to CPU-vs-CPU; attach an accelerator or pass '
            '--allow-cpu to acknowledge')
    print('[check_parity] %s run on platform: %s'
          % ('cpu' if force_cpu else 'device', platform), flush=True)

    segms = {}
    for path in _image_paths():
        img = np.asarray(Image.open(path), np.float32) / 255.0
        # keep one fixed seed so both backends fit from the same init
        segm, _soft = pipelines.pipe_color2d_slic_features_model_graphcut(
            img, NB_CLASSES, FEATS, sp_size=SP_SIZE, sp_regul=SP_REGUL,
            gc_regul=GC_REGUL, gc_edge_type='model', seed=0)
        segms[os.path.basename(path)] = np.asarray(segm)
    np.savez_compressed(out_npz, **segms)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == '--worker-cpu':
        run_pipeline(sys.argv[2], force_cpu=True)
        return


    from sklearn.metrics import adjusted_rand_score

    with tempfile.TemporaryDirectory() as td:
        tpu_npz = os.path.join(td, 'tpu.npz')
        cpu_npz = os.path.join(td, 'cpu.npz')
        # device run in-process (default backend)
        run_pipeline(tpu_npz, force_cpu=False,
                     allow_cpu='--allow-cpu' in sys.argv)
        # CPU run in a fresh subprocess (backends cannot switch in-process)
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        '--worker-cpu', cpu_npz], check=True)

        a, b = np.load(tpu_npz), np.load(cpu_npz)
        results = {}
        for name in a.files:
            sa, sb = a[name], b[name]
            results[name] = {
                'agreement': float((sa == sb).mean()),
                'ars': float(adjusted_rand_score(sa.ravel(), sb.ravel())),
            }
        worst = min(r['ars'] for r in results.values())
        print(json.dumps({'per_image': results, 'worst_ars': round(worst, 4),
                          'pass_0.98': worst >= 0.98}, indent=2))


if __name__ == '__main__':
    main()
