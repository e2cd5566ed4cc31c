"""Interactive unsupervised segmentation demo.

Counterpart of the reference's `streamlit-app.py` (`/root/reference/
streamlit-app.py:41-47`, streamlit is not bundled here): fits a group model
with ``estim_model_classes_group`` and segments the chosen image with
``segment_color2d_slic_features_model_graphcut``, showing/saving the result
sheet.  Run headless with --path_out or interactively with --show.

Example::

    python apps/demo_interactive_segmentation.py \
        --path_image '/root/reference/data-images/drosophila_disc/image/img_5.jpg' \
        --nb_classes 3 --path_out ./demo_out
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apps import common  # noqa: E402
from pyimsegm_tpu import pipelines  # noqa: E402
from pyimsegm_tpu.utils import drawing  # noqa: E402


def arg_parse_params():
    parser = argparse.ArgumentParser()
    common.add_path_arg(parser, 'path_image', '', 'input image',
                        required=True)
    common.add_path_arg(parser, 'path_out', './demo_out', 'output folder')
    parser.add_argument('--nb_classes', type=int, default=3)
    parser.add_argument('--sp_size', type=int, default=25)
    parser.add_argument('--sp_regul', type=float, default=0.2)
    parser.add_argument('--gc_regul', type=float, default=1.0)
    parser.add_argument('--show', action='store_true', default=False)
    return common.parse_arg_params(parser, {})


def main(params):
    img, name = common.load_image_by_type(params['path_image'])
    model, _ = pipelines.estim_model_classes_group(
        [img], params['nb_classes'], {'color': ['mean', 'std', 'energy']},
        sp_size=params['sp_size'], sp_regul=params['sp_regul'])
    segm, _soft = pipelines.segment_color2d_slic_features_model_graphcut(
        img, model, {'color': ['mean', 'std', 'energy']},
        sp_size=params['sp_size'], sp_regul=params['sp_regul'],
        gc_regul=params['gc_regul'])
    fig = drawing.figure_image_segm_results(img, segm)
    os.makedirs(params['path_out'], exist_ok=True)
    path_fig = os.path.join(params['path_out'], name + '_demo.png')
    fig.savefig(path_fig)
    logging.info('saved %s', path_fig)
    if params['show']:
        import matplotlib.pyplot as plt
        plt.show()
    return segm


if __name__ == '__main__':
    logging.basicConfig(level=logging.INFO)
    main(arg_parse_params())
