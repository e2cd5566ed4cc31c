"""Measure LM/Gabor bank convolution formulations on the TPU.

The direct ``conv_general_dilated`` with C_in=1 runs at ~2.5% of MXU peak
(the 1089-tap contraction degenerates — nothing fills the lane dimension).
Candidates:

  a) direct NCHW (current baseline)
  b) direct NHWC
  c) rows-to-channels: stack the 33 vertical shifts as input channels, so
     the conv becomes (C_in=33, kh=1, kw=33) — a real MXU contraction
  d) rows-to-channels + bf16 patches (f32 accumulation)

Each is checked against (a) for numerical agreement.
Run:  python tools/conv_variants.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps * 1e3, out


def main():
    from bench import _enable_compile_cache
    _enable_compile_cache()
    from pyimsegm_tpu.descriptors import _get_gabor_bank

    bank = _get_gabor_bank()
    kern = jnp.asarray(bank.kernels[:, ::-1, ::-1])      # (F, s, s) pre-flip
    f, s, _ = kern.shape
    pad = s // 2
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((900, 1200, 3), np.float32) * 255.0)
    h, w, c = img.shape

    xp = jnp.moveaxis(img, -1, 0)[:, None]               # (C, 1, H, W)
    xp = jnp.pad(xp, [(0, 0), (0, 0), (pad, pad), (pad, pad)],
                 mode='symmetric')

    @jax.jit
    def direct_nchw(x):
        return jax.lax.conv_general_dilated(
            x, kern[:, None], (1, 1), 'VALID',
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
            preferred_element_type=jnp.float32)

    @jax.jit
    def direct_nhwc(x):
        xh = jnp.transpose(x, (0, 2, 3, 1))              # (C, H+, W+, 1)
        kk = jnp.transpose(kern[:, None], (2, 3, 1, 0))  # (s, s, 1, F)
        out = jax.lax.conv_general_dilated(
            xh, kk, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)
        return jnp.transpose(out, (0, 3, 1, 2))

    def _rows_stack(x, dtype):
        # (C, s, H, W+2p): channel j = rows shifted by j
        return jnp.stack([x[:, 0, dy:dy + h, :] for dy in range(s)],
                         axis=1).astype(dtype)

    @jax.jit
    def rows_chan(x):
        xs = _rows_stack(x, jnp.float32)
        kk = kern.reshape(f, s, 1, s)                    # OIHW, I=s, kh=1
        return jax.lax.conv_general_dilated(
            xs, kk, (1, 1), 'VALID',
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
            preferred_element_type=jnp.float32)

    @jax.jit
    def rows_chan_bf16(x):
        xs = _rows_stack(x, jnp.bfloat16)
        kk = kern.reshape(f, s, 1, s).astype(jnp.bfloat16)
        return jax.lax.conv_general_dilated(
            xs, kk, (1, 1), 'VALID',
            dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
            preferred_element_type=jnp.float32)

    ms_a, ref = timeit(direct_nchw, xp)
    ref_np = np.asarray(ref)
    scale = np.abs(ref_np).max()
    print('a) direct NCHW:        %9.2f ms' % ms_a, flush=True)
    for name, fn in (('b) direct NHWC', direct_nhwc),
                     ('c) rows->channels', rows_chan),
                     ('d) rows->chan bf16', rows_chan_bf16)):
        try:
            ms, out = timeit(fn, xp)
            err = np.abs(np.asarray(out) - ref_np).max() / scale
            print('%s: %9.2f ms   max rel err %.2e' % (name, ms, err),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print('%s: FAILED %s' % (name, str(e)[:200]), flush=True)


if __name__ == '__main__':
    main()
