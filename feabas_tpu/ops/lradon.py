"""Device thumbnail feature pipeline: DoG keypoint detection, local-Radon
descriptor extraction, and rotation-exhaustive descriptor matching as three
jitted programs (reference host pipeline: feabas/thumbnail.py:605-760).

Design notes (tpu-first):
- detection returns a STATIC top-k keypoint table (xy, response, valid) —
  data-dependent counts become a validity mask so one compiled program
  serves every section;
- LRadon extraction samples each keypoint's rotated beam window directly
  (one bilinear gather per sample): the rotate-the-canvas + box-blur
  formulation is linear, so the blur commutes with the sampling and the
  whole thing collapses to K*P*B*(D*wd) gathers independent of image
  size (see ``_lradon_core``); descriptors agree with the host path
  (feabas_tpu/thumbnail.py:125) to float tolerance;
- matching reduces on device: similarity over all 2P rotation variants,
  best-rotation selection, mutual-nearest check and ratio-test confidence
  all happen in-program, so the fetch is O(K) vectors, never the
  (R, N1, N0) similarity volume (192 MB at 2k keypoints through a
  54 MB/s link -- the old host reduction's hidden cost).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from feabas_tpu.ops.filters import gaussian_blur
from feabas_tpu.ops.warp import bilinear_sample


# ------------------------- detection ------------------------- #

@functools.partial(jax.jit,
                   static_argnames=('sigma', 'size', 'k', 'has_mask'))
def _detect_core(img, mask, sigma, size, k, has_mask):
    import math
    s = float(sigma)
    f0 = gaussian_blur(img, s)
    f1 = gaussian_blur(f0, s)
    f = f0 - f1
    if has_mask:
        ptp = jnp.max(img) - jnp.min(img)
        mask_img = ptp * (mask == 0).astype(img.dtype)
        sc = math.sqrt(2.0) * s
        maskf = gaussian_blur(mask_img, sc) * (sc ** 2) / (s ** 2)
        f = jnp.clip(jnp.abs(f) - maskf, 0, None) * jnp.sign(f)
    f = jnp.abs(f)                      # both polarities, like the host path
    # local maxima: max-pool with -inf padding == maximum_filter with
    # replicate padding (the replicated values are copies of in-window
    # pixels, so both reduce over the window's valid intersection)
    # rectangular max filter is separable: two 1D passes cost 2*size
    # comparisons/px instead of size^2 (size is 10-16 in production)
    mx = jax.lax.reduce_window(f, -jnp.inf, jax.lax.max,
                               (size, 1), (1, 1), 'SAME')
    mx = jax.lax.reduce_window(mx, -jnp.inf, jax.lax.max,
                               (1, size), (1, 1), 'SAME')
    peaks = (f >= mx) & (f > 0)
    if has_mask:
        peaks = peaks & (mask > 0)
    h, w = f.shape
    resp = jnp.where(peaks, f, -jnp.inf).ravel()
    vals, idx = jax.lax.top_k(resp, k)
    yy = idx // w
    xx = idx % w
    valid = jnp.isfinite(vals)
    # subpixel: 1D quadratic fit along each axis at interior peaks
    inner = (yy > 0) & (yy < h - 1) & (xx > 0) & (xx < w - 1) & valid
    yc = jnp.clip(yy, 1, h - 2)
    xc = jnp.clip(xx, 1, w - 2)
    c0 = f[yc, xc]
    cxx = f[yc, xc - 1] + f[yc, xc + 1] - 2 * c0
    cyy = f[yc - 1, xc] + f[yc + 1, xc] - 2 * c0
    ox = jnp.where(cxx < 0, (f[yc, xc - 1] - f[yc, xc + 1]) / (2 * cxx), 0.0)
    oy = jnp.where(cyy < 0, (f[yc - 1, xc] - f[yc + 1, xc]) / (2 * cyy), 0.0)
    xs = xx.astype(jnp.float32) + jnp.where(
        inner, jnp.clip(ox, -0.5, 0.5), 0.0)
    ys = yy.astype(jnp.float32) + jnp.where(
        inner, jnp.clip(oy, -0.5, 0.5), 0.0)
    return (jnp.stack([xs, ys], -1), jnp.where(valid, vals, 0.0), valid,
            yy, xx)


def detect_log_device(img, mask=None, sigma=3.5, min_spacing=10,
                      num_features=5000):
    """Device DoG + local-max detection. Returns host arrays
    (xy (n, 2) f64, resp (n,), iyx (n, 2) int — integer peak locations for
    mask/class lookups), n <= num_features, response-sorted descending."""
    img = jnp.asarray(np.asarray(img, np.float32))
    has_mask = mask is not None
    m = jnp.asarray(np.asarray(mask, np.float32)) if has_mask \
        else jnp.zeros((1, 1), jnp.float32)
    size = max(int(round(min_spacing)), 3)
    k = int(num_features) if num_features and num_features > 0 else 5000
    k = min(k, img.shape[0] * img.shape[1])
    xy, resp, valid, yy, xx = _detect_core(img, m, float(sigma), size, k,
                                           has_mask)
    valid = np.asarray(valid)
    n = int(valid.sum())
    return (np.asarray(xy, np.float64)[:n], np.asarray(resp)[:n],
            np.stack([np.asarray(yy)[:n], np.asarray(xx)[:n]], -1))


# ------------------------- LRadon descriptors ------------------------- #

@functools.partial(jax.jit, static_argnames=('proj_num', 'beam_num',
                                             'beam_wd', 'D'))
def _lradon_core(img, xy, offs, proj_num, beam_num, beam_wd, D):
    """Direct per-keypoint LRadon sampling.

    The canvas formulation (rotate the whole image per angle, box-blur,
    sample) algebraically reduces to: descriptor(k, t, b) = mean of
    image samples at ``xy_k + R(t) @ (a, offs_b + v)`` over the beam
    window (a in -r..r along the beam, v over the beam width) — bilinear
    interpolation and the box filter are both linear, so the blur
    commutes with the sampling and the rotation collapses into the
    per-sample coordinates. Cost is K*P*B*(D*wd) gathers, INDEPENDENT of
    image size (the canvas path rotated + cumsummed a pow2 diagonal
    canvas per angle: ~100M canvas px at 2048^2, measured 2.8 s/fetch).
    Measured 2.44 s hot at 8k keypoints on TPU — gather-bound, which is
    why production routes through ``_lradon_patch_core`` (MXU path);
    this single-interpolation form is kept as the exactness reference
    the patch path is tested against.
    """
    h, w = img.shape
    t = jnp.arange(proj_num) * (np.pi / proj_num)
    c = jnp.cos(t)
    s = jnp.sin(t)
    r = (D - 1) // 2
    a = jnp.arange(D, dtype=jnp.float32) - r              # along beam
    v = jnp.arange(beam_wd, dtype=jnp.float32) - (beam_wd - 1) / 2.0
    bp = offs[:, None] + v[None, :]                       # (B, wd)

    def one_angle(ci, si):
        # window offsets in image coords: R @ (a, b')
        dx = a[:, None, None] * ci + bp[None, :, :] * si  # (D, B, wd)
        dy = -a[:, None, None] * si + bp[None, :, :] * ci
        px = xy[:, 0][:, None, None, None] + dx[None]     # (K, D, B, wd)
        py = xy[:, 1][:, None, None, None] + dy[None]
        # replicate border, as the canvas rotate did
        px = jnp.clip(px, 0.0, w - 1.0)
        py = jnp.clip(py, 0.0, h - 1.0)
        return bilinear_sample(img, px, py, 0.0).mean(axis=(1, 3))

    des = jax.vmap(one_angle)(c, s)            # (P, K, B)
    des = jnp.transpose(des, (1, 0, 2))        # (K, P, B)
    des = des - des.mean(axis=(1, 2), keepdims=True)
    nrm = jnp.linalg.norm(des.reshape(des.shape[0], -1), axis=-1)
    return des / jnp.clip(nrm, 1e-6, None)[:, None, None]


_STENCIL_CACHE = {}


def _stencil_table(proj_num, beam_num, beam_wd, D, offs, Rp):
    """(4, P*B, Dp*Dp) f32 sampling-stencil matrix, host-precomputed.

    Row (t*B + b) of corner plane c = (cy, cx) holds the mean bilinear
    stencil of the beam window's D*wd taps at patch positions
    ``(Rp, Rp) + R(t) @ (a, offs_b + v) + (cx, cy)`` — i.e. the LRadon
    bin evaluated on the integer-corner-shifted patch. The descriptor at
    a fractional keypoint offset is the bilinear blend of the four
    corner evaluations (same double-interpolation class as the host
    path's rotate-canvas-then-sample)."""
    key = (proj_num, beam_num, beam_wd, D, Rp, offs.tobytes())
    if key in _STENCIL_CACHE:
        return _STENCIL_CACHE[key]
    Dp = 2 * Rp + 1
    r = (D - 1) // 2
    a = np.arange(D, dtype=np.float64) - r
    v = np.arange(beam_wd, dtype=np.float64) - (beam_wd - 1) / 2.0
    bp = offs[:, None].astype(np.float64) + v[None, :]        # (B, wd)
    W = np.zeros((2, 2, proj_num * beam_num, Dp * Dp), np.float64)
    for it in range(proj_num):
        th = it * (np.pi / proj_num)
        ci, si = np.cos(th), np.sin(th)
        dx = a[:, None, None] * ci + bp[None] * si            # (D, B, wd)
        dy = -a[:, None, None] * si + bp[None] * ci
        for cy in (0, 1):
            for cx in (0, 1):
                px = dx + Rp + cx
                py = dy + Rp + cy
                x0 = np.floor(px).astype(np.int64)
                y0 = np.floor(py).astype(np.int64)
                fx = px - x0
                fy = py - y0
                assert x0.min() >= 0 and y0.min() >= 0 \
                    and x0.max() + 1 < Dp and y0.max() + 1 < Dp
                for xx, yy, ww in ((x0, y0, (1 - fx) * (1 - fy)),
                                   (x0 + 1, y0, fx * (1 - fy)),
                                   (x0, y0 + 1, (1 - fx) * fy),
                                   (x0 + 1, y0 + 1, fx * fy)):
                    flat = yy * Dp + xx                       # (D, B, wd)
                    for b in range(beam_num):
                        np.add.at(W[cy, cx, it * beam_num + b],
                                  flat[:, b, :].ravel(),
                                  ww[:, b, :].ravel() / (D * beam_wd))
    W = jnp.asarray(W.reshape(4, proj_num * beam_num, Dp * Dp), jnp.float32)
    _STENCIL_CACHE[key] = W
    return W


@functools.partial(jax.jit, static_argnames=('proj_num', 'Rp'))
def _lradon_patch_core(imgp, z, f, W, proj_num, Rp):
    """Patch + stencil-matmul LRadon evaluation (MXU path).

    The direct formulation (``_lradon_core``) costs K*P*B*D*wd bilinear
    gathers — gather-bound at ~100M reads/s (2.4 s at 8k keypoints).
    Every tap lives within a fixed (Dp, Dp) window of the keypoint, so:
    slice one patch per keypoint (contiguous dynamic_slice rows, not
    element gathers), then evaluate ALL P*B bins of all 4 integer-corner
    shifts as ONE matmul against the precomputed stencil matrix and
    blend the corners with the keypoint's fractional offset. The
    sampling moves from the gather unit to the MXU: (K, Dp^2) @ (Dp^2,
    4*P*B) ~ 7 GFLOP at 8k keypoints."""
    Dp = 2 * Rp + 1
    patches = jax.vmap(
        lambda zk: jax.lax.dynamic_slice(imgp, (zk[1], zk[0]), (Dp, Dp)))(z)
    Pm = patches.reshape(patches.shape[0], -1)                # (K, Dp^2)
    M = jnp.einsum('kp,cqp->kcq', Pm, W,
                   precision=jax.lax.Precision.HIGHEST)       # (K, 4, PB)
    fx, fy = f[:, 0], f[:, 1]
    wc = jnp.stack([(1 - fx) * (1 - fy), fx * (1 - fy),
                    (1 - fx) * fy, fx * fy], axis=1)          # (K, 4)
    des = jnp.einsum('kc,kcq->kq', wc, M)
    des = des.reshape(des.shape[0], proj_num, -1)             # (K, P, B)
    des = des - des.mean(axis=(1, 2), keepdims=True)
    nrm = jnp.linalg.norm(des.reshape(des.shape[0], -1), axis=-1)
    return des / jnp.clip(nrm, 1e-6, None)[:, None, None]


def lradon_descriptors_device(img, xy, proj_num=6, beam_num=8, beam_wd=3,
                              beam_radius=15):
    """Device LRadon descriptors for keypoints ``xy`` (n, 2).
    Returns a device (n_pad, P, B) f32 array and n (callers slice)."""
    imgh = np.asarray(img, np.float32)
    h, w = imgh.shape
    r = float(beam_radius)
    D = 2 * int(round(r)) + 1
    ax = np.linspace(-r, r, D)
    idx = np.linspace(0, D - 1, beam_num).round().astype(np.int64)
    offs = np.asarray(ax[idx], np.float32)
    wd_half = (beam_wd - 1) / 2.0
    Rp = int(np.ceil(np.hypot(r, np.abs(ax[idx]).max() + wd_half))) + 2
    n = int(np.asarray(xy).shape[0])
    # pad the keypoint count to pow2 buckets so compiled signatures are
    # shared across sections
    n_pad = max(64, 1 << (n - 1).bit_length()) if n else 64
    xyp = np.zeros((n_pad, 2), np.float32)
    if n:
        # clamp into the image like the direct sampler's coordinate clip
        xyp[:n] = np.clip(np.asarray(xy, np.float32),
                          0.0, [w - 1.0, h - 1.0])
    # replicate-pad so every patch slice is in-bounds; edge padding
    # reproduces the direct sampler's clip-into-image border rule
    pad = Rp + 1
    imgp = np.pad(imgh, pad, mode='edge')
    z0 = np.floor(xyp)
    f = jnp.asarray(xyp - z0, jnp.float32)
    z = jnp.asarray(z0.astype(np.int32) + (pad - Rp), jnp.int32)
    W = _stencil_table(int(proj_num), int(beam_num), int(beam_wd), D,
                       offs, Rp)
    des = _lradon_patch_core(jnp.asarray(imgp), z, f, W, int(proj_num), Rp)
    return des, n


# ------------------------- matching ------------------------- #

def _variants(des, proj_num):
    """(2P, K, P*B) rotation variants on device: rotating the image by
    k*pi/P cyclically shifts projections (flipping the offset axis past
    the wrap); the second P variants add a half-turn (full flip)."""
    k0 = des.shape[0]
    base = [des, des[:, :, ::-1]]
    out = []
    for b in base:
        for k in range(proj_num):
            rolled = jnp.roll(b, -k, axis=1)
            if k > 0:
                rolled = jnp.concatenate(
                    [rolled[:, :proj_num - k],
                     rolled[:, proj_num - k:, ::-1]], axis=1)
            out.append(rolled.reshape(k0, -1))
    return jnp.stack(out)


@functools.partial(jax.jit, static_argnames=('proj_num', 'exhaustive'))
def _match_core(d0, n0, d1, n1, proj_num, exhaustive):
    k0 = d0.shape[0]
    k1 = d1.shape[0]
    v0 = jnp.arange(k0) < n0
    v1 = jnp.arange(k1) < n1
    a0 = d0.reshape(k0, -1)
    if exhaustive:
        variants = _variants(d1, proj_num)          # (R, K1, PB)
        sims = jnp.einsum('rnd,md->rnm', variants, a0,
                          precision=jax.lax.Precision.HIGHEST)
        vmask = v1[None, :, None] & v0[None, None, :]
        sims = jnp.where(vmask, sims, -jnp.inf)
        best_rot = jnp.argmax(jnp.max(sims, axis=(1, 2)))
        S = sims[best_rot]                           # (K1, K0)
    else:
        S = jnp.einsum('nd,md->nm', d1.reshape(k1, -1), a0,
                       precision=jax.lax.Precision.HIGHEST)
        S = jnp.where(v1[:, None] & v0[None, :], S, -jnp.inf)
        best_rot = jnp.int32(0)
    i0 = jnp.argmax(S, axis=1)                       # (K1,)
    top = jnp.max(S, axis=1)
    S2 = jnp.where(jax.nn.one_hot(i0, k0, dtype=bool), -jnp.inf, S)
    second = jnp.max(S2, axis=1)
    back = jnp.argmax(S, axis=0)                     # (K0,)
    mutual = back[i0] == jnp.arange(k1)
    conf = jnp.where(top > 0,
                     1 - jnp.clip(second, 0, None)
                     / jnp.clip(top, 1e-6, None), 0.0)
    return i0, top, conf, mutual & v1, best_rot


def match_lradon_device(des0, n0, des1, n1, exhaustive=True,
                        conf_thresh=0.5):
    """Mutual-nearest descriptor matching with the reduction on device.
    des0/des1: (K_pad, P, B) device arrays from
    ``lradon_descriptors_device``. Returns (idx0, idx1, conf, best_rot)
    exactly like the host ``match_LRadon_feature``."""
    if n0 == 0 or n1 == 0:
        return (np.zeros(0, int), np.zeros(0, int), np.zeros(0), 0)
    proj_num = int(des0.shape[1])
    i0, top, conf, mutual, best_rot = _match_core(
        des0, np.int32(n0), des1, np.int32(n1), proj_num, bool(exhaustive))
    i0 = np.asarray(i0)[:n1]
    top = np.asarray(top)[:n1]
    conf = np.asarray(conf)[:n1]
    mutual = np.asarray(mutual)[:n1]
    keep = mutual & (conf > conf_thresh) & (top > 0.1)
    i1 = np.arange(n1)
    return i0[keep], i1[keep], conf[keep], int(best_rot)
