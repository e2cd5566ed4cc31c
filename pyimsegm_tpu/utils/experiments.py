"""Experiment harness: configs, folders, logging, parallel map, timing.

Counterpart of `/root/reference/imsegm/utilities/experiments.py`.  The
reference's sole parallel engine is a fork-based ``multiprocessing.Pool``
(`experiments.py:354-414`); on TPU the device does the heavy lifting inside
one process, so :class:`WrapExecuteSequence` here is a thin sequential/thread
mapper kept for API compatibility (device work should instead batch through
``pyimsegm_tpu.parallel``), and a :class:`StageTimer` provides the per-stage
profiling the reference lacked (SURVEY.md §5 'tracing').
"""

import contextlib
import logging
import multiprocessing
import os
import time
from concurrent.futures import ThreadPoolExecutor

import yaml

CONFIG_YAML = 'config.yml'
FILE_LOGS = 'logging.txt'
RESULTS_TXT = 'resultStat.txt'


def get_nb_workers(ratio=0.9):
    """Fraction of available CPUs (`experiments.py:34-43`)."""
    return max(1, int(multiprocessing.cpu_count() * ratio))


class Experiment:
    """Base experiment: load data -> perform -> evaluate -> summarise
    (`experiments.py:46-122`)."""

    def __init__(self, params, time_stamp=True):
        self.params = dict(params)
        self.params.setdefault('path_out', '.')
        if not os.path.isdir(self.params['path_out']):
            raise FileNotFoundError('no output path: %r' % self.params['path_out'])
        name = self.params.get('name', self.__class__.__name__)
        self.params['path_exp'] = create_experiment_folder(
            self.params['path_out'], name, stamp_unique=time_stamp)
        set_experiment_logger(self.params['path_exp'])
        save_config_yaml(os.path.join(self.params['path_exp'], CONFIG_YAML),
                         self.params)
        self._main_thread = True
        self.t_start = time.time()

    def run(self, gt=True):
        self._load_data(gt)
        self._perform()
        self._evaluate()
        self._summarise()

    def _load_data(self, gt=True):
        pass

    def _perform(self):
        pass

    def _evaluate(self):
        pass

    def _summarise(self):
        append_final_stat(self.params['path_exp'], self.params,
                          {}, self.t_start)


def create_experiment_folder(path_out, dir_name, stamp_unique=True):
    """Timestamped experiment folder + config dump (`experiments.py:139-195`)."""
    if not os.path.isdir(path_out):
        raise FileNotFoundError('missing base folder: %r' % path_out)
    name = dir_name
    if stamp_unique:
        name += '_' + time.strftime('%Y%m%d-%H%M%S')
    path_exp = os.path.join(path_out, name)
    counter = 0
    while stamp_unique and os.path.exists(path_exp):
        counter += 1
        path_exp = os.path.join(path_out, '%s-%i' % (name, counter))
    os.makedirs(path_exp, exist_ok=True)
    return path_exp


def set_experiment_logger(path_out, file_name=FILE_LOGS, reset=True):
    """Attach a FileHandler writing into the experiment folder
    (`experiments.py:198-207`)."""
    logger = logging.getLogger()
    if reset:
        for handler in list(logger.handlers):
            if isinstance(handler, logging.FileHandler):
                logger.removeHandler(handler)
    handler = logging.FileHandler(os.path.join(path_out, file_name))
    handler.setLevel(logging.DEBUG)
    handler.setFormatter(logging.Formatter(
        '%(asctime)s:%(levelname)s@%(filename)s:%(processName)s - %(message)s'))
    logger.addHandler(handler)
    return logger


def string_dict(d, headline='DICTIONARY:', offset=25):
    """Pretty one-per-line dict dump (`experiments.py:210-225`)."""
    template = '{:%is} {}' % offset
    rows = [template.format('"{}":'.format(n), d[n]) for n in sorted(d)]
    return headline + '\n' + '\n'.join(rows)


def append_final_stat(path_exp, params, stats, time_start,
                      file_name=RESULTS_TXT):
    """Write final stats incl. total elapsed minutes
    (`experiments.py:228-257`)."""
    t_total = time.time() - time_start
    lines = [string_dict(params, 'PARAMETERS:'), '',
             string_dict(stats, 'STATISTICS:'), '',
             'total time (min): %.2f' % (t_total / 60.0)]
    path = os.path.join(path_exp, file_name)
    with open(path, 'a') as fp:
        fp.write('\n'.join(lines) + '\n')
    return path


def extend_list_params(list_params, name_param, list_options):
    """Grid-expand parameter dicts (`experiments.py:276-307`)."""
    if not isinstance(list_options, (list, tuple)):
        list_options = [list_options]
    out = []
    for params in list_params:
        if name_param not in params:
            out.append(params)
            continue
        for option in list_options:
            p = dict(params)
            p[name_param] = option
            p['name'] = p.get('name', '') + '_%s-%s' % (name_param, option)
            out.append(p)
    return out if out else list(list_params)


def try_decorator(func):
    """Swallow-and-log wrapper (`experiments.py:310-324`)."""
    import functools

    @functools.wraps(func)
    def wrap(*args, **kwargs):
        try:
            return func(*args, **kwargs)
        except Exception:
            logging.exception('failed: %s', func.__name__)
            return None
    return wrap


def create_subfolders(path_out, folders):
    """(`experiments.py:327-351`)"""
    count = 0
    for folder in folders:
        path = os.path.join(path_out, folder)
        try:
            os.makedirs(path, exist_ok=True)
            count += 1
        except Exception:
            logging.exception('cannot create %r', path)
    return count


class WrapExecuteSequence:
    """Map a function over an iterable with optional thread workers.

    API-compatible with the reference's pool wrapper
    (`experiments.py:354-414`); the default is sequential because the heavy
    work already saturates the device — prefer
    ``pyimsegm_tpu.parallel.segment_images_batch`` for real batching.
    """

    def __init__(self, wrap_func, iterate_vals, nb_workers=1, desc='',
                 ordered=True):
        self.wrap_func = wrap_func
        self.iterate_vals = list(iterate_vals)
        self.nb_workers = max(1, int(nb_workers or 1))
        self.desc = desc
        self.ordered = ordered

    def __iter__(self):
        if self.nb_workers == 1:
            for val in self.iterate_vals:
                yield self.wrap_func(val)
        else:
            with ThreadPoolExecutor(max_workers=self.nb_workers) as ex:
                if self.ordered:
                    yield from ex.map(self.wrap_func, self.iterate_vals)
                else:
                    from concurrent.futures import as_completed
                    futures = [ex.submit(self.wrap_func, v)
                               for v in self.iterate_vals]
                    for fut in as_completed(futures):
                        yield fut.result()

    def __len__(self):
        return len(self.iterate_vals)


def load_config_yaml(path_config):
    """(`experiments.py:446-460`)"""
    with open(path_config) as fp:
        return yaml.safe_load(fp)


def save_config_yaml(path_config, config):
    """(`experiments.py:463-470`)"""
    clean = {k: (v.tolist() if hasattr(v, 'tolist') else v)
             for k, v in config.items()}
    with open(path_config, 'w') as fp:
        yaml.safe_dump(clean, fp, default_flow_style=False)


class StageTimer:
    """Per-stage wall-clock accounting (new vs the reference, which only had
    tqdm progress bars; SURVEY.md §5)."""

    def __init__(self):
        self.stages = {}

    @contextlib.contextmanager
    def stage(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + (
                time.perf_counter() - t0)

    def report(self):
        total = sum(self.stages.values())
        lines = ['%-20s %8.1f ms (%4.1f%%)' % (k, v * 1e3, 100 * v / total)
                 for k, v in sorted(self.stages.items(), key=lambda kv: -kv[1])]
        return '\n'.join(lines + ['%-20s %8.1f ms' % ('TOTAL', total * 1e3)])


def is_iterable(var):
    """True for list/tuple/ndarray-like (not strings)
    (`experiments.py:260-273`).

    >>> is_iterable('abc')
    False
    >>> is_iterable([0])
    True
    >>> is_iterable((1, ))
    True
    """
    return hasattr(var, '__iter__') and not isinstance(var, (str, bytes))
