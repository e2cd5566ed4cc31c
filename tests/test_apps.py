"""Experiment-app smoke tests on tiny synthetic data (fast CI analog of the
reference's e2e experiment shell scripts, `.github/workflows/ci-experiment.yml`).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from PIL import Image  # noqa: E402

# compile-heavy end-to-end tier (see `make test-fast`)
pytestmark = pytest.mark.slow


@pytest.fixture(scope='module')
def tiny_dataset(tmp_path_factory):
    """Two tiny images + annotations with 3 vertical bands."""
    root = tmp_path_factory.mktemp('data')
    (root / 'image').mkdir()
    (root / 'annot').mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        annot = np.zeros((60, 90), np.uint8)
        annot[:, 30:60] = 1
        annot[:, 60:] = 2
        img = (np.stack([annot * 100 + 20] * 3, -1)
               + rng.normal(0, 6, (60, 90, 3))).clip(0, 255).astype(np.uint8)
        Image.fromarray(img).save(root / 'image' / ('img_%i.jpg' % i))
        Image.fromarray(annot).save(root / 'annot' / ('img_%i.png' % i))
    return root


def test_app_unsup_segm(tiny_dataset, tmp_path):
    from apps import run_segm_slic_model_graphcut as app
    params = dict(app.SEGM_PARAMS)
    params.update({
        'path_predict_imgs': str(tiny_dataset / 'image' / '*.jpg'),
        'path_out': str(tmp_path), 'nb_classes': 3, 'slic_size': 10,
        'slic_regul': 0.3, 'run_groupGMM': True,
        'features': {'color': ['mean', 'std']},
    })
    app.main(params)
    out = tmp_path / ('experiment_segm-unSupervised_imgDisk')
    assert (out / 'segm_single' / 'img_0.png').exists()
    assert (out / 'segm_group' / 'img_1.png').exists()
    assert (out / 'metric_ARS.csv').exists()


def test_app_stat_annot_segm(tiny_dataset, tmp_path):
    from apps import run_compute_stat_annot_segm as app
    df = app.stat_annot_segm({
        'path_annot': str(tiny_dataset / 'annot' / '*.png'),
        'path_segm': str(tiny_dataset / 'annot' / '*.png'),
        'path_out': str(tmp_path), 'drop_labels': [],
    })
    assert len(df) == 2
    assert np.allclose(df['ARS'], 1.0)


def test_app_eval_superpixels(tiny_dataset, tmp_path):
    from apps import run_eval_superpixels as app
    df = app.compute_boundary_distance({
        'path_images': str(tiny_dataset / 'image' / '*.jpg'),
        'path_segms': str(tiny_dataset / 'annot' / '*.png'),
        'path_out': str(tmp_path), 'img_type': '2d_rgb',
        'slic_size': 10, 'slic_regul': 0.3,
    })
    assert len(df) == 2
    assert (df['mean'] < 10).all()


def test_app_relabel_and_convert(tiny_dataset, tmp_path):
    from apps.handling_annotations import run_segm_annot_relabel as relab
    from apps.handling_annotations import run_image_convert_label_color as conv
    out1 = tmp_path / 'relab'
    relab.relabel_folder({
        'path_images': str(tiny_dataset / 'annot' / '*.png'),
        'path_out': str(out1), 'label_old': [2], 'label_new': [1]})
    seg = np.asarray(Image.open(out1 / 'img_0.png'))
    assert set(np.unique(seg)) == {0, 1}
    out2 = tmp_path / 'color'
    conv.convert_folder_images({
        'path_images': str(tiny_dataset / 'annot' / '*.png'),
        'path_out': str(out2), 'direction': 'auto', 'path_colors': ''})
    rgb = np.asarray(Image.open(out2 / 'img_0.png'))
    assert rgb.ndim == 3


def test_app_create_annotation_and_cut(tiny_dataset, tmp_path):
    from apps import run_create_annotation as ann
    from apps import run_cut_segmented_objects as cut
    (tmp_path / 'ctr').mkdir()
    ann.main({'path_annots': str(tiny_dataset / 'annot' / 'img_0.png'),
              'path_out': str(tmp_path / 'ctr'), 'radius_center': 3,
              'radius_ring': 6})
    assert (tmp_path / 'ctr' / 'img_0.png').exists()
    assert (tmp_path / 'ctr' / 'img_0.csv').exists()
    cut.main({'path_annot': str(tiny_dataset / 'annot' / '*.png'),
              'path_image': str(tiny_dataset / 'image' / '*.jpg'),
              'path_out': str(tmp_path / 'cut'), 'padding': 2,
              'mask': False, 'no_rotate': True})
    assert len(list((tmp_path / 'cut').glob('*.png'))) >= 2


def test_app_supervised_classif(tiny_dataset, tmp_path):
    """Supervised CLI end-to-end, incl. RGB-coded annotations and the
    YAML-over-CLI config merge order (reference contract)."""
    import yaml

    from apps import run_segm_slic_classif_graphcut as app

    # private copy of the dataset (the fixture is module-scoped and other
    # tests must keep seeing 2D annotations)
    import shutil
    data = tmp_path / 'data'
    shutil.copytree(tiny_dataset, data)
    tiny_dataset = data
    # re-save one annotation RGB-coded: loader must take channel 0
    annot_dir = tiny_dataset / 'annot'
    a = np.asarray(Image.open(annot_dir / 'img_0.png'))
    Image.fromarray(np.stack([a, a * 0, a * 0], -1)).save(
        annot_dir / 'img_0.png')

    cfg = {'name': 'cfgwins', 'img_type': '2d_rgb', 'slic_size': 8,
           'slic_regul': 0.3, 'features': {'color': ['mean', 'std']},
           'nb_classif_search': 1, 'gc_regul': 1.0, 'run_LPO': True}
    path_cfg = tmp_path / 'cfg.yml'
    path_cfg.write_text(yaml.safe_dump(cfg))

    import argparse
    from apps import common
    params = dict(app.SEGM_PARAMS)
    parser = argparse.ArgumentParser()
    common.add_path_arg(parser, 'path_images', str(tiny_dataset / 'image' / '*.jpg'),
                        'imgs')
    common.add_path_arg(parser, 'path_annots', str(tiny_dataset / 'annot' / '*.png'),
                        'annots')
    common.add_path_arg(parser, 'path_config', str(path_cfg), 'cfg')
    common.add_path_arg(parser, 'path_out', str(tmp_path), 'out')
    parser.add_argument('--slic_size', type=int, default=params['slic_size'])
    old_argv = sys.argv
    sys.argv = ['app']
    try:
        merged = common.parse_arg_params(parser, params)
    finally:
        sys.argv = old_argv
    # YAML must override the CLI default (the reference merge order)
    assert merged['slic_size'] == 8
    assert merged['name'] == 'cfgwins'

    app.main(merged)
    out = tmp_path / 'experiment_segm-Supervised_cfgwins'
    assert (out / 'stat_segm_graphcut.csv').exists()
    assert (out / 'stat_LPO.csv').exists()
    import csv
    rows = list(csv.DictReader(open(out / 'stat_LPO.csv')))
    assert len(rows) == 2
    # trivial 3-band scene: held-out accuracy should be near-perfect
    assert all(float(r['GC_accuracy']) > 0.9 for r in rows)


def test_webapp_form_and_error_paths():
    """The stdlib web UI (counterpart of the reference's streamlit page):
    the form renders the bundled image list, rejects non-bundled paths, and
    the segmentation handler is exercised end-to-end in the slow tier via
    its compute function."""
    from apps import webapp_segmentation as web

    imgs = web._bundled_images()
    page = web.PAGE.format(
        options=''.join('<option>%s</option>' % p for p in imgs[:2]),
        body='', nb_classes=3, sp_size=30, sp_regul=0.5, gc_regul=0.4)
    assert '<form' in page and 'sp_regul' in page


@pytest.mark.slow
def test_webapp_run_segmentation(tiny_dataset):
    from apps import webapp_segmentation as web

    path_img = tiny_dataset / 'image' / 'img_0.jpg'
    figs = web.run_segmentation(str(path_img), nb_classes=3, sp_size=12,
                                sp_regul=0.4, gc_regul=0.5)
    assert [n for n, _ in figs] == ['superpixels', 'segmentation']
    import base64
    for _name, b64 in figs:
        assert base64.b64decode(b64)[:4] == b'\x89PNG'
