"""Separable image filters on device.

Device counterparts of the host filters in ``feabas_tpu.common``; numerics
match scipy's ``gaussian_filter1d`` (truncate=4.0, 'nearest' boundary) so
host/device paths are interchangeable in the match pipeline
(reference behavior: feabas/common.py:353).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(sigma, radius=None, dtype=np.float32):
    if radius is None:
        radius = int(round(4.0 * float(sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / float(sigma)) ** 2)
    k /= k.sum()
    return k.astype(dtype)


def _sep_conv(img, kernel, axis):
    """Correlate (..., H, W) with a 1D kernel along `axis` (-1 or -2),
     'nearest' edge padding. Kernel is a static numpy array."""
    k = jnp.asarray(kernel)
    r = (k.shape[0] - 1) // 2
    pad = [(0, 0)] * img.ndim
    pad[axis] = (r, r)
    x = jnp.pad(img, pad, mode='edge')
    # move target axis last, flatten the rest, 1D conv via dot with rolled windows
    x = jnp.moveaxis(x, axis, -1)
    lead_shape = x.shape[:-1]
    n = x.shape[-1]
    x2 = x.reshape(int(np.prod(lead_shape)), 1, n)  # (N, C=1, W)
    rhs = k[::-1].reshape(1, 1, k.shape[0])         # (O=1, I=1, K)
    out = jax.lax.conv_general_dilated(
        x2, rhs, window_strides=(1,), padding='VALID',
        feature_group_count=1,
        dimension_numbers=('NCW', 'OIW', 'NCW'),
    )
    out = out.reshape(lead_shape + (n - 2 * r,))
    return jnp.moveaxis(out, -1, axis)


def gaussian_blur(img, sigma):
    """Separable Gaussian blur over the trailing two axes."""
    k = gaussian_kernel1d(sigma)
    return _sep_conv(_sep_conv(img, k, -1), k, -2)


@functools.partial(jax.jit, static_argnames=('sigma', 'signed', 'has_mask'))
def _masked_dog(img, mask, sigma, signed, has_mask):
    s = float(sigma)
    f0 = gaussian_blur(img, s)
    f1 = gaussian_blur(f0, s)
    imgf = f0 - f1
    if has_mask:
        ptp = jnp.max(img) - jnp.min(img)
        mask_img = ptp * (mask == 0).astype(img.dtype)
        sc = math.sqrt(2.0) * s
        maskf = gaussian_blur(mask_img, sc) * (sc ** 2) / (s ** 2)
        mag = jnp.clip(jnp.abs(imgf) - maskf, 0, None)
        imgf = mag * jnp.sign(imgf)
    if not signed:
        imgf = jnp.abs(imgf)
    return imgf


def masked_dog_filter(img, sigma, mask=None, signed=True):
    """Device masked DoG band-pass; img (..., H, W) float.

    Mask-boundary blur leakage is estimated from the blurred mask
    complement and subtracted from the response magnitude so texture
    outside the mask cannot fake correlation peaks.
    """
    img = jnp.asarray(img)
    if img.dtype != jnp.float32:
        img = img.astype(jnp.float32)  # cast on device, transfer narrow
    has_mask = mask is not None
    m = jnp.asarray(mask) if has_mask else jnp.ones(img.shape[-2:], jnp.float32)
    return _masked_dog(img, m, float(sigma), bool(signed), has_mask)
