"""Leung-Malik texture filter bank, evaluated as one batched TPU convolution.

The reference builds the LM bank in numpy and convolves each filter
separately on the host with ``scipy.ndimage.convolve``
(`/root/reference/imsegm/descriptors.py:903-978`) — ~49 33x33 convolutions
per channel.  Here the whole bank is stacked into a single
``lax.conv_general_dilated`` call with the image channels folded into the
batch dimension, so XLA tiles one big convolution onto the MXU; orientation
maxima and the per-battery response normalisation
(`descriptors.py:1021-1027,1088-1094`) are fused elementwise epilogues.

Bank composition per sigma in ``(sqrt(2), 2, 2*sqrt(2), 4)``
(`descriptors.py:38,903-948`): oriented edge + bar batteries (max over
``nb_orient`` rotations), isotropic Gaussian, Laplacian-of-Gaussian at sigma
and sigma**2 — i.e. 5 named batteries per sigma.
"""

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

#: sigmas of the full and short LM banks (`descriptors.py:38-40`)
DEFAULT_FILTERS_SIGMAS = (math.sqrt(2), 2.0, 2 * math.sqrt(2), 4.0)
SHORT_FILTERS_SIGMAS = (math.sqrt(2), 2.0, 4.0)

#: response clamp preventing overflow (`descriptors.py:55`)
MAX_SIGNAL_RESPONSE = 1.0e6


def _gaussian_1d(vals, sigma, order=0):
    response = np.exp(-vals ** 2 / (2.0 * sigma ** 2))
    if order == 1:
        response = -response * vals
    elif order == 2:
        response = response * (vals ** 2 - sigma ** 2)
    return response / np.abs(response).sum()


def _edge_filter_2d(sigma, phase, points, support):
    gx = _gaussian_1d(points[0, :], sigma=3 * sigma)
    gy = _gaussian_1d(points[1, :], sigma=sigma, order=phase)
    ft = (gx * gy).reshape(support, support)
    return ft / np.abs(ft).sum()


def _gaussian_2d(support, sigma, laplace=False):
    radius = support // 2
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g1 = np.exp(-0.5 * (x / sigma) ** 2)
    g1 /= g1.sum()
    g2d = np.outer(g1, g1)
    if not laplace:
        return g2d
    # Laplacian of Gaussian via second-derivative separable components,
    # matching scipy.ndimage.gaussian_laplace on a unit impulse.
    gdd = (x ** 2 / sigma ** 4 - 1.0 / sigma ** 2) * g1
    return np.outer(gdd, g1) + np.outer(g1, gdd)


class FilterBank(NamedTuple):
    """Static LM bank: stacked kernels + battery slicing metadata."""
    kernels: np.ndarray        # (n_filters, support, support) float32
    battery_slices: tuple      # per battery: (start, stop) into n_filters
    names: tuple               # per battery name, e.g. 'sigma1.4-edge'


def create_filter_bank_lm_2d(radius=16, sigmas=DEFAULT_FILTERS_SIGMAS, nb_orient=8) -> FilterBank:
    """Build the LM bank with the reference's exact filter definitions
    (`descriptors.py:903-948`)."""
    support = 2 * radius + 1
    x, y = np.mgrid[-radius:radius + 1, radius:-radius - 1:-1]
    org_pts = np.vstack([x.ravel(), y.ravel()])

    kernels, slices, names = [], [], []
    pos = 0

    def push(battery, name):
        nonlocal pos
        kernels.extend(battery)
        slices.append((pos, pos + len(battery)))
        names.append(name)
        pos += len(battery)

    for sigma in sigmas:
        edges, bars = [], []
        for orient in range(nb_orient):
            angle = np.pi * orient / nb_orient
            c, s = np.cos(angle), np.sin(angle)
            pts = np.dot(np.array([[c, -s], [s, c]]), org_pts)
            edges.append(_edge_filter_2d(sigma, 1, pts, support))
            bars.append(_edge_filter_2d(sigma, 2, pts, support))
        tag = 'sigma%.1f' % sigma
        push(edges, '%s-edge' % tag)
        push(bars, '%s-bar' % tag)
        push([_gaussian_2d(support, sigma)], '%s-Gauss' % tag)
        push([_gaussian_2d(support, sigma, laplace=True)], '%s-GaussLap' % tag)
        push([_gaussian_2d(support, sigma ** 2, laplace=True)], '%s-GaussLap2' % tag)

    stack = np.stack(kernels).astype(np.float32)
    return FilterBank(stack, tuple(slices), tuple(names))


def filter_bank_raw(image, bank: FilterBank):
    """Convolve all bank filters with every channel in one MXU pass and take
    the per-battery orientation maxima — WITHOUT the response normalisation.

    :param image: (H, W, C) float32 (already background-subtracted)
    :param bank: static bank
    :returns: (n_batteries, H, W, C) clamped orientation-max responses

    The reference normalisation ``r * log(1+||r||)/0.03/||r||``
    (`descriptors.py:1088-1094`) is *linear per battery*, so every
    superpixel statistic of the normalised response equals the raw statistic
    post-scaled (mean/std/median/meanGrad by ``s``, energy by ``s**2``) and
    ``||r||**2`` itself falls out of the segment energy sums — see
    :func:`pyimsegm_tpu.descriptors._texture_battery_stats`.  Skipping the
    normalisation here avoids B extra full-resolution reductions and a full
    normalised-response round-trip through HBM.
    """
    h, w, c = image.shape
    n_f, support, _ = bank.kernels.shape
    # scipy.ndimage.convolve flips the kernel relative to correlation and uses
    # reflect-style padding; lax conv computes correlation, so pre-flip.
    pad = support // 2
    x = jnp.moveaxis(image, -1, 0)[:, None]                  # (C, 1, H, W)
    # scipy's default boundary mode 'reflect' duplicates the edge sample,
    # which is numpy/jnp 'symmetric'
    x = jnp.pad(x, [(0, 0), (0, 0), (pad, pad), (pad, pad)], mode='symmetric')
    # direct conv: a rows->channels reformulation (stack the `support`
    # vertical shifts as input channels) measures ~20% faster in isolation
    # (tools/conv_variants.py) but the 33-slice stack makes XLA's layout
    # assignment explode to 170x-padded per-slice copies in some surrounding
    # programs (observed: 36 GB HBM at compile on the standalone texture
    # feature jit) — the direct form is robust in every context
    k = jnp.asarray(bank.kernels[:, ::-1, ::-1])[:, None]    # (F, 1, s, s)
    resp = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
        preferred_element_type=jnp.float32)                  # (C, F, H, W)

    outs = []
    for (start, stop), _name in zip(bank.battery_slices, bank.names):
        battery = resp[:, start:stop]                        # (C, nb, H, W)
        r = jnp.max(battery, axis=1) if stop - start > 1 else battery[:, 0]
        r = jnp.minimum(r, MAX_SIGNAL_RESPONSE)
        outs.append(jnp.moveaxis(r, 0, -1))                  # (H, W, C)
    return jnp.stack(outs)


def battery_norm_scales(energy_totals):
    """Per-battery normalisation scale from the raw response energy totals.

    :param energy_totals: (B,) ``sum(r*r)`` over all pixels and channels of
        each battery's raw response
    :returns: (B,) scales ``log(1+||r||)/0.03/||r||`` (0 for an all-zero
        battery), exactly `descriptors.py:1088-1094`.
    """
    norm = jnp.sqrt(jnp.maximum(energy_totals, 0.0))
    return jnp.where(norm > 0,
                     jnp.log1p(norm) / 0.03 / jnp.maximum(norm, 1e-30), 0.0)


def filter_bank_response(image, bank: FilterBank):
    """Normalised bank responses (`descriptors.py:1021-1027,1088-1094`).

    :returns: (n_batteries, H, W, C) responses with orientation-max and the
        reference normalisation ``r * log(1+||r||)/0.03/||r||`` applied per
        battery (norm over all channels jointly).

    Kept for the full-resolution consumers (gray-3D texture path, response
    visualisation); the per-superpixel feature path uses
    :func:`filter_bank_raw` + post-scaled statistics instead.
    """
    raw = filter_bank_raw(image, bank)                       # (B, H, W, C)
    scales = battery_norm_scales(jnp.sum(raw * raw, axis=(1, 2, 3)))
    return raw * scales[:, None, None, None]


def subtract_background(image, sigma=150.0, downsample=8):
    """``img - gaussian_filter(img, 150)`` (`descriptors.py:1078`).

    A sigma=150 blur is near-global; we compute it at 1/``downsample``
    resolution and bilinearly upsample — numerically indistinguishable at this
    sigma and ~60x cheaper.  scipy's nd filter also blurs across the channel
    axis; with sigma=150 over 3 taps that kernel is uniform to ~1e-5, so we
    use the exact channel mean.
    """
    h, w, c = image.shape
    # the blurred background is identical across channels (channel-mean in,
    # uniform channel kernel): compute it once at 1 channel and broadcast
    chan_mixed = jnp.mean(image, axis=-1, keepdims=True)
    ds = downsample
    ph, pw = (-h) % ds, (-w) % ds
    x = jnp.pad(chan_mixed, [(0, ph), (0, pw), (0, 0)], mode='edge')
    hs, ws = x.shape[0] // ds, x.shape[1] // ds
    small = x.reshape(hs, ds, ws, ds, 1).mean(axis=(1, 3))
    from pyimsegm_tpu.ops.slic import gaussian_blur
    small = gaussian_blur(small, sigma / ds)
    big = jax.image.resize(small, (hs * ds, ws * ds, 1), method='linear')
    return image - big[:h, :w]


# --------------------------------------------------------------- Gabor ------

def _gabor_kernel(sigma, theta, frequency, support):
    """Real Gabor kernel (cosine carrier, normalised)."""
    radius = support // 2
    y, x = np.mgrid[-radius:radius + 1, -radius:radius + 1].astype(np.float64)
    xr = x * np.cos(theta) + y * np.sin(theta)
    yr = -x * np.sin(theta) + y * np.cos(theta)
    env = np.exp(-(xr ** 2 + yr ** 2) / (2.0 * sigma ** 2))
    g = env * np.cos(2 * np.pi * frequency * xr)
    g -= g.sum() * env / max(env.sum(), 1e-12)       # zero-DC within envelope
    n = np.abs(g).sum()
    return g / max(n, 1e-12)


def create_filter_bank_gabor_2d(radius=16, sigmas=(2.0, 4.0),
                                frequencies=(0.1, 0.2, 0.3),
                                nb_orient=6) -> FilterBank:
    """Gabor bank as an optional extra texture family ('tGabor'); same
    FilterBank layout as the LM bank — orientation max per
    (sigma, frequency) battery."""
    support = 2 * radius + 1
    kernels, slices, names = [], [], []
    pos = 0
    for sigma in sigmas:
        for freq in frequencies:
            battery = [_gabor_kernel(sigma, np.pi * o / nb_orient, freq,
                                     support) for o in range(nb_orient)]
            kernels.extend(battery)
            slices.append((pos, pos + nb_orient))
            names.append('sigma%.1f-freq%.2f-gabor' % (sigma, freq))
            pos += nb_orient
    stack = np.stack(kernels).astype(np.float32)
    return FilterBank(stack, tuple(slices), tuple(names))


# ----------------------------------------------------------------- LBP ------

#: uniform-LBP code LUT: 8-neighbour patterns with <=2 transitions map to
#: their number of set bits (0..8), everything else to bin 9
_LBP_UNIFORM_LUT = None


def _lbp_uniform_lut():
    global _LBP_UNIFORM_LUT
    if _LBP_UNIFORM_LUT is None:
        lut = np.full(256, 9, np.int32)
        for code in range(256):
            bits = [(code >> i) & 1 for i in range(8)]
            transitions = sum(bits[i] != bits[(i + 1) % 8] for i in range(8))
            if transitions <= 2:
                lut[code] = sum(bits)
        _LBP_UNIFORM_LUT = lut
    return _LBP_UNIFORM_LUT


def lbp_codes(channel, uniform=True):
    """Per-pixel 8-neighbour local binary pattern codes, fully vectorized
    (8 shifted comparisons; edge-replicated borders).

    :param channel: (H, W) float
    :returns: (H, W) int32 codes in [0, 256) or uniform bins [0, 10)

    The uniform binning is computed arithmetically (circular transition
    count + popcount over the 8 comparison planes) rather than through the
    256-entry LUT gather — identical result by the uniform-LBP definition,
    no gather op on the TPU hot path (the LUT variant remains the oracle in
    ``tests/test_texture_extra.py``).
    """
    x = jnp.asarray(channel, jnp.float32)
    xp = jnp.pad(x, 1, mode='edge')
    h, w = x.shape
    # neighbours in circular order starting east, counter-clockwise
    offs = [(0, 1), (-1, 1), (-1, 0), (-1, -1), (0, -1), (1, -1), (1, 0),
            (1, 1)]
    bits = []
    for dy, dx in offs:
        nb = xp[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
        bits.append((nb >= x).astype(jnp.int32))
    if not uniform:
        code = jnp.zeros((h, w), jnp.int32)
        for bit, b in enumerate(bits):
            code = code + (b << bit)
        return code
    nset = sum(bits)
    trans = sum(jnp.abs(bits[i] - bits[(i + 1) % 8]) for i in range(8))
    return jnp.where(trans <= 2, nset, 9)


def lbp_histogram_features(image, seg_ids, num_segments, uniform=True,
                           grid_ctx=None):
    """Per-superpixel normalised LBP histograms ('tLBP' feature family).

    :param image: (H, W, C) float
    :returns: ((num_segments, C * n_bins) features, names)

    Uniform mode stacks all ``C * 10`` one-hot planes (bf16 — exact for 0/1,
    accumulated in f32 by the reduction) into ONE segment reduction instead
    of C separate full-image passes.
    """
    from pyimsegm_tpu.ops.segment_stats import _reduce_sums
    image = jnp.asarray(image, jnp.float32)
    h, w, c = image.shape
    n_bins = 10 if uniform else 256
    names = ['tLBP-ch%i_bin%i' % (ch + 1, b)
             for ch in range(c) for b in range(n_bins)]
    if uniform:
        onehot = jnp.concatenate(
            [jax.nn.one_hot(lbp_codes(image[..., ch], uniform=True),
                            n_bins, dtype=jnp.bfloat16) for ch in range(c)],
            axis=-1)                                     # (H, W, C*10)
        sums = _reduce_sums(onehot, seg_ids, num_segments, grid_ctx)
        sums = sums.reshape(num_segments, c, n_bins)
        total = jnp.maximum(jnp.sum(sums, axis=2, keepdims=True), 1.0)
        return (sums / total).reshape(num_segments, c * n_bins), names
    feats = []
    for ch in range(c):
        codes = lbp_codes(image[..., ch], uniform=uniform)
        onehot = jax.nn.one_hot(codes, n_bins, dtype=jnp.float32)
        sums = _reduce_sums(onehot, seg_ids, num_segments, grid_ctx)
        total = jnp.maximum(jnp.sum(sums, axis=1, keepdims=True), 1.0)
        feats.append(sums / total)
    return jnp.concatenate(feats, axis=1), names
