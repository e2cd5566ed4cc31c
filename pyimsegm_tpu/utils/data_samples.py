"""Sample data registry + synthetic generators.

Mirrors `/root/reference/imsegm/utilities/data_samples.py`: bundled microscopy
samples (read at runtime from the reference checkout's ``data-images`` if
present — we do not vendor the binaries) and synthetic images for tests.
"""

import os

import numpy as np

#: root of the bundled sample images (override with PYIMSEGM_DATA_PATH)
PATH_DATA_IMAGES = os.environ.get(
    'PYIMSEGM_DATA_PATH', '/root/reference/data-images')

IMAGE_DROSOPHILA_OVARY_2D = os.path.join(
    PATH_DATA_IMAGES, 'drosophila_ovary_slice', 'image', 'insitu7545.jpg')
ANNOT_DROSOPHILA_OVARY_2D = os.path.join(
    PATH_DATA_IMAGES, 'drosophila_ovary_slice', 'segm', 'insitu7545.png')
IMAGE_DROSOPHILA_DISC = os.path.join(
    PATH_DATA_IMAGES, 'drosophila_disc', 'image', 'img_6.jpg')
IMAGE_LANGER_ISLET = os.path.join(
    PATH_DATA_IMAGES, 'langerhans_islets', 'image', 'gtExoIsl_21.jpg')
IMAGE_HISTOL_CIMA = os.path.join(
    PATH_DATA_IMAGES, 'histology_CIMA', '29-041-Izd2-w35-CD31-3-les1.jpg')
IMAGE_STAR = os.path.join(PATH_DATA_IMAGES, 'others', 'sea_starfish-2.jpg')
IMAGE_LENNA = os.path.join(PATH_DATA_IMAGES, 'others', 'lena.png')


def has_sample_data():
    return os.path.isfile(IMAGE_DROSOPHILA_OVARY_2D)


def load_sample_image(path=IMAGE_DROSOPHILA_OVARY_2D):
    """Load a sample image as float32 in [0, 1]."""
    from PIL import Image
    img = np.asarray(Image.open(path))
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    return img


def load_sample_labels(path=ANNOT_DROSOPHILA_OVARY_2D):
    """Load an annotation label map as int array."""
    from PIL import Image
    annot = np.asarray(Image.open(path))
    if annot.ndim == 3:
        annot = annot[..., 0]
    # annotations may be stored with scaled gray levels; densify to 0..C-1
    _, dense = np.unique(annot, return_inverse=True)
    return dense.reshape(annot.shape).astype(np.int32)


def sample_segment_vertical_2d(seg_size=(20, 10), nb_labels=3):
    """Vertical-strip synthetic segmentation
    (`data_samples.py:73-93`)."""
    cls_vals = []
    cls_size = int(seg_size[0] / nb_labels)
    for lb in range(nb_labels):
        cls_vals += [lb] * cls_size
    seg = np.tile(np.asarray(cls_vals, dtype=np.int32), (seg_size[1], 1))
    return seg


def sample_segment_vertical_3d(seg_size=(10, 5, 6), nb_labels=3, levels=2):
    """3D striped segmentation (`data_samples.py:96-119`)."""
    seg = []
    for lv in range(int(levels)):
        seg_2d = sample_segment_vertical_2d(seg_size[:2], nb_labels)
        for _ in range(int(seg_size[2] / levels)):
            seg.append(seg_2d.copy() + lv * nb_labels)
    return np.array(seg, dtype=np.int32)


def sample_color_image_rand_segment(im_size=(150, 100), nb_classes=3,
                                    rand_seed=None):
    """Random blocky color image + its segmentation
    (`data_samples.py:122-169` spirit): per-class distinct mean colors with
    noise; returns (image float32 [0,1], segm int32)."""
    rng = np.random.default_rng(rand_seed)
    h, w = im_size
    seg = np.zeros((h, w), dtype=np.int32)
    strip = w // nb_classes
    means = rng.uniform(0.1, 0.9, size=(nb_classes, 3))
    img = np.zeros((h, w, 3), dtype=np.float32)
    for c in range(nb_classes):
        x0 = c * strip
        x1 = w if c == nb_classes - 1 else (c + 1) * strip
        seg[:, x0:x1] = c
        img[:, x0:x1] = means[c]
    img += rng.normal(scale=0.05, size=img.shape).astype(np.float32)
    return np.clip(img, 0, 1), seg


def get_image_path(name_img, path_base=PATH_DATA_IMAGES):
    """Anchor a sample image name to the bundled data folder
    (`data_samples.py:154-168`)."""
    return name_img if os.path.isabs(name_img) \
        else os.path.join(path_base, name_img)
