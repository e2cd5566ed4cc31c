"""Evaluate detected centres against annotated egg centres.

Counterpart of
`/root/reference/experiments_ovary_centres/run_center_evaluation.py`:
matches per-image detected-centre CSVs with annotation (center CSVs or egg
annotation masks), computes TP/FP/FN + precision/recall/F1 within a distance
tolerance, and writes the summary CSV.

Example::

    python apps/run_center_evaluation.py \
        --path_centers 'results/detect-centers-predict_ovary/centres/*.csv' \
        --path_annots '.../center_levels/*.csv' --path_out ./results
"""

import argparse
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apps import common  # noqa: E402
from apps.run_center_candidate_training import load_center_annotation  # noqa: E402
from pyimsegm_tpu.centers import evaluate_detected_centers  # noqa: E402

NAME_CSV = 'statistic_center_detection.csv'


def arg_parse_params():
    parser = argparse.ArgumentParser()
    common.add_path_arg(parser, 'path_centers', '', 'detected centre CSVs',
                        required=True)
    common.add_path_arg(parser, 'path_annots', '', 'annotation pattern',
                        required=True)
    common.add_path_arg(parser, 'path_out', './results', 'output directory')
    parser.add_argument('--dist_thr', type=float, default=50.0)
    return common.parse_arg_params(parser, {})


def main(params):
    import pandas as pd
    from pyimsegm_tpu.utils.data_io import find_files_match_names_across_dirs
    df_paths = find_files_match_names_across_dirs(
        [params['path_centers'], params['path_annots']])
    os.makedirs(params['path_out'], exist_ok=True)
    rows = {}
    for _, row in df_paths.iterrows():
        name = os.path.splitext(os.path.basename(row['path_1']))[0]
        df = pd.read_csv(row['path_1'], index_col=0)
        detected = df[['Y', 'X']].values if len(df) else np.zeros((0, 2))
        annotated = load_center_annotation(row['path_2'])
        rows[name] = evaluate_detected_centers(detected, annotated,
                                               dist_thr=params['dist_thr'])
    df = pd.DataFrame.from_dict(rows, orient='index')
    df.to_csv(os.path.join(params['path_out'], NAME_CSV))
    logging.info('detection stats:\n%s', df.mean())
    return df


if __name__ == '__main__':
    logging.basicConfig(level=logging.INFO)
    main(arg_parse_params())
