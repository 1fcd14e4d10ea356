"""Hand-written Pallas TPU kernels.

`dog_filter` fuses the matcher's band-pass prefilter — uint8 cast, two
separable Gaussian blurs, and the DoG difference — into one kernel: each
grid program holds a whole match block in VMEM and touches HBM exactly
twice (read block, write result), replacing four conv dispatches and their
HBM-resident intermediates. Numerics match ``ops.filters.gaussian_blur``
(scipy ``gaussian_filter1d``, truncate=4, 'nearest' boundary).

Kernels are validated in interpreter mode on CPU (tests) and enabled on
TPU via ``filters.masked_dog_filter(..., use_pallas=True)``.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from feabas_tpu.ops.filters import gaussian_kernel1d


def _blur1d(x, taps, axis):
    """Separable correlation with 'nearest' edge padding, unrolled into
    static shifted slices (VPU-friendly; no gather, no jnp.pad — Mosaic
    rejects some pad lowerings)."""
    r = (len(taps) - 1) // 2
    if axis == 0:
        lo = jnp.broadcast_to(x[:1, :], (r,) + x.shape[1:])
        hi = jnp.broadcast_to(x[-1:, :], (r,) + x.shape[1:])
    else:
        lo = jnp.broadcast_to(x[:, :1], (x.shape[0], r))
        hi = jnp.broadcast_to(x[:, -1:], (x.shape[0], r))
    xp = jnp.concatenate([lo, x, hi], axis=axis)
    n = x.shape[axis]
    acc = None
    for k, w in enumerate(taps):
        if axis == 0:
            sl = xp[k:k + n, :]
        else:
            sl = xp[:, k:k + n]
        acc = sl * w if acc is None else acc + sl * w
    return acc


def _dog_kernel(taps, x_ref, out_ref):
    x = x_ref[0]                           # (H, W) block in VMEM
    if x.dtype != jnp.float32:
        # Mosaic lacks direct u8->f32 casts; widen through int32
        x = x.astype(jnp.int32).astype(jnp.float32)
    f0 = _blur1d(_blur1d(x, taps, 1), taps, 0)
    f1 = _blur1d(_blur1d(f0, taps, 1), taps, 0)
    out_ref[0] = f0 - f1


@functools.partial(jax.jit, static_argnames=('sigma', 'interpret'))
def dog_filter(stack, sigma=2.5, interpret=False):
    """Fused DoG band-pass over an (N, H, W) block stack (any dtype).

    One grid program per block; the block lives in VMEM for the whole
    filter chain. Returns float32 (N, H, W).
    """
    taps = tuple(float(v) for v in gaussian_kernel1d(sigma))
    n, h, w = stack.shape
    kernel = functools.partial(_dog_kernel, taps)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        interpret=interpret,
    )(stack)
