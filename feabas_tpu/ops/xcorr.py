"""Batched FFT cross-correlation on device — the matcher's hot kernel.

Computes per-pair displacement peaks with optional quadratic subpixel
refinement, overlap normalization, and a mirror-correlation confidence
score (behavioral parity with reference ``feabas/matcher.py:22-137``;
redesigned as a single fused XLA program over an (N, H, W) stack).

Shapes are static per call: the host rounds FFT sizes up to TPU-friendly
values and buckets batches, so jit caches stay small.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from feabas_tpu import constant as const

_FFT_SIZES = None


def good_fft_size(n, pow2=False):
    """Smallest size >= n that factors into 2,3,5 (or a power of two)."""
    n = int(n)
    if n <= 1:
        return 1
    if pow2:
        return 1 << (n - 1).bit_length()
    global _FFT_SIZES
    if _FFT_SIZES is None:
        sizes = set()
        p2 = 1
        while p2 <= (1 << 17):
            p3 = p2
            while p3 <= (1 << 17):
                p5 = p3
                while p5 <= (1 << 17):
                    sizes.add(p5)
                    p5 *= 5
                p3 *= 3
            p2 *= 2
        _FFT_SIZES = np.array(sorted(sizes))
    return int(_FFT_SIZES[np.searchsorted(_FFT_SIZES, n)])


def _peak_and_subpixel(C, fftshp, subpixel):
    """argmax of (N, fy, fx) correlation surfaces + optional 3x3 quadratic
    fit. Returns (dx, dy, peak_val) with integer peak coordinates."""
    n = C.shape[0]
    fy, fx = fftshp
    Cf = C.reshape(n, fy * fx)
    idx = jnp.argmax(Cf, axis=-1)
    peak = jnp.take_along_axis(Cf, idx[:, None], axis=-1)[:, 0]
    dy = (idx // fx).astype(jnp.float32)
    dx = (idx % fx).astype(jnp.float32)
    if subpixel:
        iy = (idx // fx)[:, None] + jnp.array([-1, 0, 1])[None, :]
        ix = (idx % fx)[:, None] + jnp.array([-1, 0, 1])[None, :]
        iy = jnp.mod(iy, fy)
        ix = jnp.mod(ix, fx)
        flat = (iy[:, :, None] * fx + ix[:, None, :]).reshape(n, 9)
        Ct = jnp.take_along_axis(Cf, flat, axis=-1)  # row-major 3x3: [yy, xx]
        tx = (Ct[:, 5] - Ct[:, 3]) / 2
        ty = (Ct[:, 7] - Ct[:, 1]) / 2
        txx = Ct[:, 3] + Ct[:, 5] - 2 * Ct[:, 4]
        tyy = Ct[:, 7] + Ct[:, 1] - 2 * Ct[:, 4]
        txy = (Ct[:, 0] + Ct[:, 8] - Ct[:, 2] - Ct[:, 6]) / 4
        det = txx * tyy - txy * txy
        safe = det > 0
        det = jnp.where(safe, det, 1.0)
        ox = jnp.where(safe, -(tyy * tx - txy * ty) / det, 0.0)
        oy = jnp.where(safe, -(-txy * tx + txx * ty) / det, 0.0)
        dx = dx + jnp.clip(ox, -0.5, 0.5)
        dy = dy + jnp.clip(oy, -0.5, 0.5)
    return dx, dy, peak


def _normalizer(M0, M1, fftshp, conj0):
    fy, fx = fftshp
    F = (jnp.conj(M0) if conj0 else M0) * M1
    NC = jnp.fft.irfft2(F, s=fftshp).reshape(-1, fy * fx)
    NC = NC / jnp.clip(NC.max(axis=-1, keepdims=True), 1.0, None)
    return jnp.clip(NC, 0.1, None)


@functools.partial(
    jax.jit,
    static_argnames=('fftshp', 'shp0', 'shp1', 'conf_mode', 'subpixel', 'normalize'))
def _xcorr_core(img0, img1, mask0, mask1, fftshp, shp0, shp1,
                conf_mode, subpixel, normalize):
    """img0: (N,H0,W0), img1: (N,H1,W1) float32, pre-filtered.
    Returns (dx, dy, conf): center of img1 + (dx,dy) matches center of img0."""
    fy, fx = fftshp
    n = img0.shape[0]
    img0 = img0.astype(jnp.float32)
    img1 = img1.astype(jnp.float32)
    F0 = jnp.fft.rfft2(img0, s=fftshp)
    F1 = jnp.fft.rfft2(img1, s=fftshp)
    C = jnp.fft.irfft2(jnp.conj(F0) * F1, s=fftshp)
    Cf = C.reshape(n, fy * fx)
    if normalize:
        M0 = jnp.fft.rfft2(mask0, s=fftshp)
        M1 = jnp.fft.rfft2(mask1, s=fftshp)
        Cf = Cf / _normalizer(M0, M1, fftshp, conj0=True)
    dx, dy, peak = _peak_and_subpixel(Cf.reshape(n, fy, fx), fftshp, subpixel)
    # recenter: displacement between image centers, wrapped to the FFT torus
    dy = dy + (shp0[0] - shp1[0]) / 2
    dx = dx + (shp0[1] - shp1[1]) / 2
    dy = dy - jnp.round(dy / fy) * fy
    dx = dx - jnp.round(dx / fx) * fx
    if conf_mode == const.FFT_CONF_NONE:
        conf = jnp.ones_like(dx)
    elif conf_mode == const.FFT_CONF_MIRROR:
        # correlation against the point-mirrored partner: a texture that
        # matches itself mirrored as well as it matches the partner is
        # periodic/degenerate -> low confidence
        Cm = jnp.abs(jnp.fft.irfft2(F0 * F1, s=fftshp)).reshape(n, fy * fx)
        if normalize:
            Cm = Cm / _normalizer(M0, M1, fftshp, conj0=False)
        mx_rl = Cf.max(axis=-1)
        mx_mr = Cm.max(axis=-1)
        conf = jnp.where(mx_rl > 0, 1.0 - mx_mr / jnp.where(mx_rl > 0, mx_rl, 1.0), 0.0)
        conf = jnp.clip(conf, 0.0, 1.0)
    elif conf_mode == const.FFT_CONF_STD:
        c_std = Cf.std(axis=-1)
        conf = (1.0 - jnp.exp(-Cf.max(axis=-1) / c_std)) ** (fy * fx)
        conf = jnp.clip(conf, 0.0, 1.0)
    else:
        raise ValueError(f'unknown conf mode {conf_mode}')
    return dx, dy, conf


def xcorr_fft(img0, img1, conf_mode=const.FFT_CONF_MIRROR, **kwargs):
    """Batched displacement from FFT cross-correlation.

    Args:
        img0: (N,H0,W0) or (H0,W0) array (device or host).
        img1: (N,H1,W1) or (H1,W1).
    Kwargs:
        sigma: if >0, apply masked DoG filtering first (device).
        mask0, mask1: valid-data masks, (H,W) or (N,H,W).
        normalize: divide by overlap-area correlation of the masks.
        subpixel: 3x3 quadratic peak refinement.
        pad: zero-pad to H0+H1-1 so displacements are unambiguous.
        pow2: round FFT sizes to powers of two (fastest on TPU MXU/VPU).
    Returns:
        (dx, dy, conf) numpy arrays of shape (N,).
    """
    sigma = kwargs.get('sigma', 0)
    mask0 = kwargs.get('mask0', None)
    mask1 = kwargs.get('mask1', None)
    normalize = bool(kwargs.get('normalize', False))
    subpixel = bool(kwargs.get('subpixel', False))
    pad = kwargs.get('pad', True)
    pow2 = kwargs.get('pow2', True)
    # keep integer images in their narrow dtype across the host->device
    # transfer (4x fewer tunnel bytes); cast to f32 on device
    img0 = jnp.asarray(img0)
    img1 = jnp.asarray(img1)
    squeeze = img0.ndim == 2
    if squeeze:
        img0, img1 = img0[None], img1[None]
    if sigma > 0:
        from feabas_tpu.ops.filters import masked_dog_filter
        img0 = masked_dog_filter(img0, sigma, mask=mask0)
        img1 = masked_dog_filter(img1, sigma, mask=mask1)
    shp0 = tuple(int(s) for s in img0.shape[-2:])
    shp1 = tuple(int(s) for s in img1.shape[-2:])
    if pad:
        fftshp = tuple(good_fft_size(s0 + s1 - 1, pow2=pow2) for s0, s1 in zip(shp0, shp1))
    else:
        fftshp = tuple(good_fft_size(max(s0, s1), pow2=pow2) for s0, s1 in zip(shp0, shp1))

    def _expand_mask(m, shp, nbatch):
        if m is None:
            return jnp.ones((1,) + shp, jnp.float32)
        m = jnp.asarray(m, dtype=jnp.float32)
        if m.ndim == 2:
            m = m[None]
        return m

    m0 = _expand_mask(mask0, shp0, img0.shape[0])
    m1 = _expand_mask(mask1, shp1, img1.shape[0])
    dx, dy, conf = _xcorr_core(img0, img1, m0, m1, fftshp, shp0, shp1,
                               int(conf_mode), subpixel, normalize)
    # ONE device->host fetch for all three outputs: each fetch pays a full
    # host<->device round trip (dominant cost on tunneled links)
    stacked = jnp.stack([dx.astype(jnp.float32),
                         dy.astype(jnp.float32), conf])
    if kwargs.get('return_device', False):
        return stacked  # (3, N) device array; caller batches the fetch
    out = np.asarray(stacked)
    dx, dy, conf = out[0], out[1], out[2]
    if squeeze:
        return dx[0], dy[0], conf[0]
    return dx, dy, conf
