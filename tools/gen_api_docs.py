"""Generate the markdown API reference from docstrings.

The reference ships sphinx docs (`/root/reference/docs/source/`); this image
has no sphinx, so this walker emits the equivalent per-module reference into
``docs/api/`` directly from the live package: module docstring, then every
public class/function signature + docstring (sources of truth — the
docstrings carry the reference `file:line` parity citations).

Run:  JAX_PLATFORMS=cpu python tools/gen_api_docs.py
"""

import importlib
import inspect
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

MODULES = [
    'pyimsegm_tpu.pipelines',
    'pyimsegm_tpu.superpixels',
    'pyimsegm_tpu.descriptors',
    'pyimsegm_tpu.graph_cuts',
    'pyimsegm_tpu.classification',
    'pyimsegm_tpu.labeling',
    'pyimsegm_tpu.region_growing',
    'pyimsegm_tpu.ellipse_fitting',
    'pyimsegm_tpu.centers',
    'pyimsegm_tpu.annotation',
    'pyimsegm_tpu.ops.slic',
    'pyimsegm_tpu.ops.slic3d',
    'pyimsegm_tpu.ops.slic_pallas',
    'pyimsegm_tpu.ops.grid',
    'pyimsegm_tpu.ops.grid_pallas',
    'pyimsegm_tpu.ops.enforce_pallas',
    'pyimsegm_tpu.ops.connectivity_pallas',
    'pyimsegm_tpu.ops.graphcut',
    'pyimsegm_tpu.ops.graph',
    'pyimsegm_tpu.ops.segment_stats',
    'pyimsegm_tpu.ops.filters',
    'pyimsegm_tpu.ops.color',
    'pyimsegm_tpu.ops.histogram',
    'pyimsegm_tpu.ops.ray',
    'pyimsegm_tpu.ops.morphology',
    'pyimsegm_tpu.ops.shape_prior',
    'pyimsegm_tpu.models.gmm',
    'pyimsegm_tpu.models.bgm',
    'pyimsegm_tpu.models.forest',
    'pyimsegm_tpu.models.gbt',
    'pyimsegm_tpu.models.adaboost',
    'pyimsegm_tpu.models.linear',
    'pyimsegm_tpu.models.clustering',
    'pyimsegm_tpu.models.class_model',
    'pyimsegm_tpu.models.otsu',
    'pyimsegm_tpu.parallel.batch',
    'pyimsegm_tpu.parallel.tiled',
    'pyimsegm_tpu.native',
    'pyimsegm_tpu.utils.data_io',
    'pyimsegm_tpu.utils.experiments',
    'pyimsegm_tpu.utils.drawing',
    'pyimsegm_tpu.utils.metrics',
    'pyimsegm_tpu.utils.data_samples',
    'pyimsegm_tpu.utils.read_zvi',
    'pyimsegm_tpu.utils.nifti',
    'pyimsegm_tpu.utils.profiling',
]


def _clean_doc(doc, indent='  '):
    if not doc:
        return indent + '*(undocumented)*\n'
    lines = inspect.cleandoc(doc).splitlines()
    return '\n'.join(indent + ln if ln.strip() else '' for ln in lines) + '\n'


def _signature(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return '(...)'


def render_module(name):
    mod = importlib.import_module(name)
    out = ['# `%s`\n' % name]
    out.append(_clean_doc(mod.__doc__, indent=''))
    out.append('')

    members = []
    for attr, obj in sorted(vars(mod).items()):
        if attr.startswith('_'):
            continue
        if getattr(obj, '__module__', None) != name:
            continue          # re-exports documented at their home module
        if inspect.isclass(obj) or inspect.isfunction(obj):
            members.append((attr, obj))

    for attr, obj in members:
        if inspect.isclass(obj):
            out.append('## class `%s%s`\n' % (attr, _signature(obj)))
            out.append(_clean_doc(obj.__doc__))
            for m_name, meth in sorted(vars(obj).items()):
                if m_name.startswith('_') or not callable(meth):
                    continue
                fn = meth.__func__ if isinstance(meth, (classmethod,
                                                        staticmethod)) else meth
                if not (inspect.isfunction(fn) or inspect.ismethod(fn)):
                    continue
                out.append('### `%s.%s%s`\n' % (attr, m_name, _signature(fn)))
                out.append(_clean_doc(fn.__doc__, indent='  '))
        else:
            out.append('## `%s%s`\n' % (attr, _signature(obj)))
            out.append(_clean_doc(obj.__doc__))
    return '\n'.join(out)


def main():
    out_dir = os.path.join(_REPO, 'docs', 'api')
    os.makedirs(out_dir, exist_ok=True)
    index = ['# API reference\n',
             'Generated from docstrings by `tools/gen_api_docs.py` '
             '(`make docs`).  Docstrings carry `file:line` citations into '
             'the reference implementation for parity checking.\n']
    for name in MODULES:
        try:
            text = render_module(name)
        except Exception as exc:  # noqa: BLE001
            print('SKIP %s: %s' % (name, exc), file=sys.stderr)
            continue
        fname = name.replace('pyimsegm_tpu.', '').replace('.', '_') + '.md'
        with open(os.path.join(out_dir, fname), 'w') as fh:
            fh.write(text)
        index.append('- [`%s`](%s)' % (name, fname))
        print('wrote docs/api/%s' % fname)
    with open(os.path.join(out_dir, 'index.md'), 'w') as fh:
        fh.write('\n'.join(index) + '\n')
    print('wrote docs/api/index.md (%d modules)' % (len(index) - 2))


if __name__ == '__main__':
    main()
