"""Device image warping: bilinear gather sampling and per-block affine
warps.

The matcher's hot loop renders thousands of small blocks through deforming
meshes. On device this becomes: per-block affine maps (from the triangle
under each block center — the reference's RENDER_LOCAL_AFFINE
approximation, ``feabas/renderer.py:94-109``) + one batched bilinear
gather from the device-resident source image. Combined with the xcorr
kernel, a whole match round is a single XLA program; only block centers
and peak results cross the host boundary.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_sample(img, xs, ys, fillval=0.0):
    """Sample img (H, W) at float coords (broadcastable arrays);
    out-of-range -> fillval."""
    H, W = img.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    fx = xs - x0
    fy = ys - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    valid = (xs >= 0) & (ys >= 0) & (xs <= W - 1) & (ys <= H - 1)
    x0c = jnp.clip(x0i, 0, W - 2)
    y0c = jnp.clip(y0i, 0, H - 2)
    Ia = img[y0c, x0c]
    Ib = img[y0c, x0c + 1]
    Ic = img[y0c + 1, x0c]
    Id = img[y0c + 1, x0c + 1]
    out = (Ia * (1 - fx) * (1 - fy) + Ib * fx * (1 - fy)
           + Ic * (1 - fx) * fy + Id * fx * fy)
    return jnp.where(valid, out, fillval)


@functools.partial(jax.jit, static_argnames=('block_h', 'block_w'))
def affine_warp_blocks(img, origins, A, b, block_h, block_w, fillval=0.0):
    """Render N blocks of (block_h, block_w) output pixels.

    Output pixel (y, x) of block n sits at world p = origins[n] + (x, y);
    its source coordinate is p @ A[n] + b[n] (row-vector affine). Returns
    (N, block_h, block_w) float32.
    """
    img = img.astype(jnp.float32)
    gx, gy = jnp.meshgrid(jnp.arange(block_w, dtype=jnp.float32),
                          jnp.arange(block_h, dtype=jnp.float32))

    def one(origin, An, bn):
        px = gx + origin[0]
        py = gy + origin[1]
        sx = px * An[0, 0] + py * An[1, 0] + bn[0]
        sy = px * An[0, 1] + py * An[1, 1] + bn[1]
        return bilinear_sample(img, sx, sy, fillval)

    return jax.vmap(one)(origins.astype(jnp.float32),
                         A.astype(jnp.float32), b.astype(jnp.float32))


def mesh_blocks_device(mesh, image, centers, block_size, gear=None,
                       fillval=0.0, src_offset=(0.0, 0.0)):
    """Render equal-size blocks centered at world points through a mesh's
    deformation, on device, using the local-affine approximation.

    Args:
        mesh: feabas_tpu Mesh (MOVING = output frame, INITIAL = source).
        image: source image as a device or host array (INITIAL frame).
        centers: (N, 2) world coordinates of block centers.
    Returns:
        (stack (N, h, w) jnp.float32 device array, kept indices (M,)).
    Blocks whose center lies outside the mesh are dropped.
    """
    from feabas_tpu import constant as const
    if gear is None:
        gear = (const.MESH_GEAR_MOVING, const.MESH_GEAR_INITIAL)
    centers = np.asarray(centers, np.float64).reshape(-1, 2)
    tid = mesh.tri_finder(centers, gear=gear[0], extrapolate=False)
    kept = np.nonzero(tid >= 0)[0]
    if kept.size == 0:
        h = w = int(round(block_size))
        return jnp.zeros((0, h, w), jnp.float32), kept
    A_all, b_all = mesh.triangle_affine_tform(gear0=gear[0], gear1=gear[1])
    A = A_all[tid[kept]]
    # source coords index `image`, whose pixel (0,0) sits at world
    # src_offset in the source gear frame
    b = b_all[tid[kept]] - np.asarray(src_offset, np.float64)
    h = w = int(round(block_size))
    origins = np.round(centers[kept] - [w / 2, h / 2])
    # pad the batch to a power of two so compiled shapes are reused
    n = kept.size
    nb = max(8, 1 << (int(n - 1).bit_length()))
    if nb > n:
        pad = nb - n
        A = np.concatenate([A, np.repeat(A[:1], pad, axis=0)])
        b = np.concatenate([b, np.repeat(b[:1], pad, axis=0)])
        origins = np.concatenate([origins, np.repeat(origins[:1], pad, axis=0)])
    stack = affine_warp_blocks(jnp.asarray(image), jnp.asarray(origins),
                               jnp.asarray(A), jnp.asarray(b), h, w,
                               fillval=float(fillval))
    return stack[:n], kept
