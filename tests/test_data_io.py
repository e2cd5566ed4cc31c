"""IO utilities, annotation handling, ZVI reader."""

import os

import numpy as np
import pytest

from pyimsegm_tpu import annotation as annot
from pyimsegm_tpu.utils import data_io

REF_DATA = '/root/reference/data-images'


def test_swap_coord_x_y():
    assert data_io.swap_coord_x_y(np.array([[1, 2], [2, 4], [5, 6]])) == \
        [[2, 1], [4, 2], [6, 5]]


def test_landmarks_roundtrip(tmp_path):
    lnds = np.array([[1, 2], [2, 4], [5, 6]])
    fp = data_io.save_landmarks_txt(str(tmp_path / 'lnds.test'), lnds)
    assert fp.endswith('.txt')
    assert np.array_equal(data_io.load_landmarks_txt(fp), lnds)
    fp = data_io.save_landmarks_csv(str(tmp_path / 'lnds.test'), lnds)
    assert fp.endswith('.csv')
    assert np.array_equal(data_io.load_landmarks_csv(fp), lnds)


def test_scale_image_intensity():
    rng = np.random.default_rng(0)
    img = rng.integers(10, 255, (25, 30))
    im = data_io.scale_image_intensity(img)
    assert im.min() == 0.0 and im.max() == 1.0
    im255 = data_io.scale_image_intensity(img, im_range=255)
    assert im255.dtype == np.uint8 and im255.max() == 255


def test_export_load_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(20, 20, 3)).astype(np.uint8)
    path = data_io.export_image(str(tmp_path / 'img'), img,
                                stretch_range=False)
    assert path.endswith('.png')
    img2, name = data_io.load_image_2d(path)
    assert name == 'img'
    assert np.array_equal(img, img2)
    # volume -> tiff
    vol = rng.integers(0, 255, size=(5, 20, 20)).astype(np.uint8)
    path = data_io.export_image(str(tmp_path / 'vol'), vol,
                                stretch_range=False)
    assert path.endswith('.tiff')
    vol2, _ = data_io.load_image_2d(path)
    assert vol2.shape == (5, 20, 20)


def test_merge_image_channels():
    rng = np.random.default_rng(0)
    out = data_io.merge_image_channels(rng.random((15, 12)),
                                       rng.random((15, 12)))
    assert out.shape == (15, 12, 3)


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason='no sample data')
def test_find_files_match_names_across_dirs():
    base = os.path.join(REF_DATA, 'drosophila_ovary_slice')
    df = data_io.find_files_match_names_across_dirs([
        os.path.join(base, 'image', '*.jpg'),
        os.path.join(base, 'segm', '*.png'),
        os.path.join(base, 'center_levels', '*.csv')])
    assert len(df) > 0
    assert df.columns.tolist() == ['path_1', 'path_2', 'path_3']


def test_get_image2d_boundary_color():
    img = np.zeros((5, 15), dtype=int)
    img[:4, 3:9] = 1
    assert data_io.get_image2d_boundary_color(img) == 0
    out = data_io.get_image2d_boundary_color(np.ones((5, 15, 3), dtype=int),
                                             size=2)
    assert np.array_equal(out, [1, 1, 1])


def test_cut_object():
    img = np.ones((10, 20), dtype=int)
    img[3:7, 4:16] = 2
    mask = np.zeros((10, 20), dtype=int)
    mask[4:6, 5:15] = 1
    cut = data_io.cut_object(img, mask, 2)
    assert cut.shape == (6, 14)
    assert cut[0, 0] == 1 and cut[2, 7] == 2
    cut2 = data_io.cut_object(img, mask, 2, use_mask=True, allow_rotate=False)
    assert cut2.shape == (6, 14)
    assert cut2[0, 0] == 1


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason='no sample data')
def test_load_img_double_band_split():
    p = os.path.join(REF_DATA, 'drosophila_ovary_slice', 'image',
                     'insitu7545.jpg')
    b1, b2 = data_io.load_img_double_band_split(p)
    assert b1.shape == (647, 1024)
    assert b2.shape == (647, 1024)
    assert 0 <= b1.min() and b1.max() <= 1.0


@pytest.mark.skipif(not os.path.isfile(os.path.join(
    REF_DATA, 'others', 'sample.zvi')), reason='no zvi sample')
def test_zvi_reader():
    from pyimsegm_tpu.utils import read_zvi
    p = os.path.join(REF_DATA, 'others', 'sample.zvi')
    assert read_zvi.get_layer_count(p) == 4
    img = read_zvi.load_image(p)
    assert img.shape == (4, 488, 648)
    assert img.dtype == np.uint16
    b1, b2 = data_io.load_zvi_volume_double_band_split(p)
    assert b1.shape == (2, 488, 648)


# ------------------------------------------------------------- annotation ---

def test_convert_colors_labels_roundtrip():
    seg = np.array([[0, 1, 1], [1, 0, 2]])
    lut = {0: (0, 0, 255), 1: (255, 0, 0), 2: (0, 255, 0)}
    img = annot.convert_img_labels_to_colors(seg, lut)
    assert img.shape == (2, 3, 3)
    seg2 = annot.convert_img_colors_to_labels(img, lut)
    assert np.array_equal(seg, seg2)


def test_unique_and_frequent_colors():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 2, (50, 50, 3)).astype(np.uint8)
    uq = annot.unique_image_colors(img)
    assert len(uq) == 8
    freq = annot.image_frequent_colors(img)
    assert sorted(freq.keys()) == sorted(uq)
    assert sum(freq.values()) == 2500


def test_quantize_nearest_color():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 2, (5, 7, 3)).astype(np.uint8)
    im = annot.quantize_image_nearest_color(img, [(0, 0, 0), (1, 1, 1)])
    assert im.shape == img.shape
    assert set(np.unique(im)) <= {0, 1}
    for i in (1, 2):
        assert np.array_equal(im[:, :, 0], im[:, :, i])


def test_image_inpaint_pixels():
    img = np.zeros((6, 6))
    img[0, 0] = 5.0
    img[5, 5] = 9.0
    valid = np.zeros((6, 6), bool)
    valid[0, 0] = valid[5, 5] = True
    out = annot.image_inpaint_pixels(img, valid)
    assert out[0, 1] == 5.0
    assert out[5, 4] == 9.0


def test_quantize_nearest_pixel():
    img = np.zeros((6, 8, 3), dtype=np.uint8)
    img[:, 4:] = 255
    img[3, 4] = 120  # off-palette pixel -> inpainted from neighbours
    out = annot.quantize_image_nearest_pixel(
        img, [(0, 0, 0), (255, 255, 255)])
    assert set(np.unique(out)) <= {0, 255}
    assert out[3, 4, 0] in (0, 255)


def test_color_conversion_inverses():
    import jax.numpy as jnp
    from pyimsegm_tpu.ops import color as color_ops
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.random((8, 9, 3)), jnp.float32)
    for space in ('hsv', 'lab', 'luv', 'xyz', 'hed'):
        conv = color_ops.convert_img_color_from_rgb(rgb, space)
        back = np.asarray(color_ops.convert_img_color_to_rgb(conv, space))
        err = np.abs(back - np.asarray(rgb))
        assert err.mean() < 5e-3, space
        assert err.max() < 6e-2, space
