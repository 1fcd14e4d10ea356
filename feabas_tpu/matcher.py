"""Dense template matching between image pairs through deforming meshes.

Pipeline (behavioral parity with reference ``feabas/matcher.py``):
`global_translation_matcher` seeds a whole-image displacement; then
`iterative_xcorr_matcher_w_mesh` runs a coarse-to-fine spacing schedule —
distribute block pairs over the mesh overlap, render both meshes' current
MOVING state, batch-FFT-xcorr the stacks on device, convert peaks to links,
elastically relax, damp residue outliers — and returns INITIAL-gear (source
image frame) correspondences. `stitching_matcher` wraps the schedule for a
tile pair; `section_matcher` for whole sections.
"""

import numpy as np

from feabas_tpu import common, config
from feabas_tpu import constant as const
from feabas_tpu.dal import StreamLoader
from feabas_tpu.mesh import Mesh
from feabas_tpu.optimizer import SLM
from feabas_tpu.renderer import MeshRenderer
from feabas_tpu.ops.xcorr import xcorr_fft


def global_translation_matcher(img0, img1, **kwargs):
    """Whole-image translation via FFT xcorr; falls back to divided blocks
    when confidence is low (reference: matcher.py:138)."""
    sigma = kwargs.get('sigma', 0.0)
    mask0 = kwargs.get('mask0', None)
    mask1 = kwargs.get('mask1', None)
    conf_mode = kwargs.get('conf_mode', const.FFT_CONF_MIRROR)
    conf_thresh = kwargs.get('conf_thresh', 0.3)
    divide_factor = kwargs.get('divide_factor', 6)
    dx, dy, conf = xcorr_fft(img0, img1, conf_mode=conf_mode, sigma=sigma,
                             mask0=mask0, mask1=mask1, pad=True, subpixel=False)
    dx, dy, conf = float(dx), float(dy), float(conf)
    if conf >= conf_thresh:
        return dx, dy, conf
    # low confidence: divide the larger image into blocks (the reference
    # divides the bigger tile by aspect ratio, matcher.py:138-223) and
    # let the highest-confidence block vote the translation
    shp0, shp1 = img0.shape[-2:], img1.shape[-2:]
    swap = shp1[0] * shp1[1] > shp0[0] * shp0[1] * 1.5
    if swap:
        img0, img1 = img1, img0
        shp0, shp1 = shp1, shp0
    # (dx, dy, conf) below are the full-image seed, computed BEFORE any
    # swap — return them unmodified on every fall-through path
    if min(shp0[0], shp0[1]) // divide_factor < 32:
        return dx, dy, conf
    bx = max(shp0[1] // divide_factor, 32)
    by = max(shp0[0] // divide_factor, 32)
    x0s, y0s, x1s, y1s = common.divide_bbox((0, 0, shp0[1], shp0[0]),
                                            block_size=(by, bx))
    blocks0, origins = [], []
    for xa, ya, xb, yb in zip(x0s, y0s, x1s, y1s):
        blocks0.append(img0[ya:yb, xa:xb])
        origins.append((xa, ya))
    hmin = min(b.shape[0] for b in blocks0)
    wmin = min(b.shape[1] for b in blocks0)
    stack0 = np.stack([b[:hmin, :wmin] for b in blocks0])
    dxs, dys, confs = xcorr_fft(stack0, np.broadcast_to(img1, (len(blocks0),) + tuple(shp1)),
                                conf_mode=conf_mode, sigma=sigma, pad=True)
    best = int(np.argmax(confs))
    if confs[best] <= conf:
        return dx, dy, conf
    # xcorr convention: d = world position of block0's content center minus
    # img1's. The block's content center sits (cx, cy) from img0's origin,
    # i.e. (cx - W0/2, cy - H0/2) from img0's center — measured from the
    # TRIMMED block (blocks are cropped to hmin x wmin). Shifting the
    # reference point from the block center to img0's center subtracts that
    # offset from the measured displacement.
    xa, ya = origins[best]
    cx = xa + wmin / 2
    cy = ya + hmin / 2
    dx_adj = float(dxs[best]) + (shp0[1] / 2 - cx)
    dy_adj = float(dys[best]) + (shp0[0] / 2 - cy)
    if swap:
        return -dx_adj, -dy_adj, float(confs[best])
    return dx_adj, dy_adj, float(confs[best])


def distributor_cartesian_bbox(bbox, spacing, block_size,
                               min_boundary_distance=0):
    """Block centers on a cartesian grid covering bbox
    (reference: matcher.py:865). Returns (N,2) centers."""
    x0, y0, x1, y1 = bbox
    x0 += min_boundary_distance
    y0 += min_boundary_distance
    x1 -= min_boundary_distance
    y1 -= min_boundary_distance
    if x1 <= x0 or y1 <= y0:
        return np.zeros((0, 2))
    nx = max(int(np.round((x1 - x0) / spacing)), 1)
    ny = max(int(np.round((y1 - y0) / spacing)), 1)
    xs = np.linspace(x0 + (x1 - x0) / (2 * nx), x1 - (x1 - x0) / (2 * nx), nx)
    ys = np.linspace(y0 + (y1 - y0) / (2 * ny), y1 - (y1 - y0) / (2 * ny), ny)
    gx, gy = np.meshgrid(xs, ys)
    return np.stack([gx.ravel(), gy.ravel()], axis=-1)


_BLOCK_SIZES = np.array([16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512])


def _quantize_block(size):
    """Round block sizes up to a small set so jit caches stay bounded."""
    size = int(round(size))
    i = int(np.searchsorted(_BLOCK_SIZES, size))
    return int(_BLOCK_SIZES[min(i, len(_BLOCK_SIZES) - 1)])


def _pad_pow2(n, lo=8):
    k = max(lo, 1 << (int(n - 1).bit_length()))
    return k


def _render_blocks(renderer, centers, block_size):
    """Render equal-size blocks centered at world points. Returns
    (stack (N,h,w) float32, kept_indices)."""
    h = w = int(round(block_size))
    out, kept = [], []
    for i, (cx, cy) in enumerate(centers):
        bbox = (int(round(cx - w / 2)), int(round(cy - h / 2)),
                int(round(cx - w / 2)) + w, int(round(cy - h / 2)) + h)
        blk = renderer.crop(bbox, return_empty=True)
        if blk is None:
            continue
        out.append(np.asarray(blk, dtype=np.float32))
        kept.append(i)
    if not out:
        return np.zeros((0, h, w), np.float32), np.zeros(0, np.int64)
    return np.stack(out), np.asarray(kept, np.int64)


def iterative_xcorr_matcher_w_mesh(mesh0, mesh1, loader0, loader1, spacings,
                                   **kwargs):
    """Coarse-to-fine mesh-deforming block matcher
    (reference: matcher.py:430).

    mesh0 is treated as the rigid reference (locked); mesh1 deforms. Both
    meshes' MOVING gears should hold the best current placement. Returns
    a ``common.Match`` in INITIAL-gear (source image) coordinates, or None.
    """
    sigma = kwargs.get('sigma', 2.5)
    conf_mode = kwargs.get('conf_mode', const.FFT_CONF_MIRROR)
    conf_thresh = kwargs.get('conf_thresh', 0.3)
    shrink_factor = kwargs.get('shrink_factor', 1.0)
    pad = kwargs.get('pad', True)
    batch_size = kwargs.get('batch_size', 128)
    residue_mode = kwargs.get('residue_mode', 'huber')
    residue_len = kwargs.get('residue_len', 3)
    min_boundary_distance = kwargs.get('min_boundary_distance', 0)
    stiffness_lambda = kwargs.get('stiffness_lambda', -0.35)
    refine_mode = kwargs.get('refine_mode', True)
    compute_strain = kwargs.get('compute_strain', True)
    min_num_blocks = kwargs.get('min_num_blocks', 2)

    mesh0.locked = True
    slm = SLM([mesh0, mesh1])
    spacings = sorted(np.atleast_1d(spacings).astype(np.float64), reverse=True)
    render0 = None
    link = None
    # device render path: when sources are in-memory images, ship them to
    # HBM once and render match blocks with the batched local-affine warp
    # kernel — the whole round (warp -> DoG -> xcorr) is then device-only
    use_device = (kwargs.get('device_render', True)
                  and isinstance(loader0, StreamLoader)
                  and isinstance(loader1, StreamLoader))
    if use_device:
        import jax.numpy as jnp
        from feabas_tpu.ops import warp as warp_ops
        src0 = jnp.asarray(np.asarray(loader0.preprocess(loader0._img)))
        src1 = jnp.asarray(np.asarray(loader1.preprocess(loader1._img)))
        src_off0 = np.asarray(loader0._offset, np.float64)
        src_off1 = np.asarray(loader1._offset, np.float64)
    for i_s, spacing in enumerate(spacings):
        block_size = max(int(round(spacing * shrink_factor)), 16)
        if use_device:
            block_size = _quantize_block(block_size)
        bbox0 = mesh0.bbox(gear=const.MESH_GEAR_MOVING)
        bbox1 = mesh1.bbox(gear=const.MESH_GEAR_MOVING)
        ovl, valid = common.intersect_bbox(bbox0, bbox1)
        if not valid:
            return None
        centers = distributor_cartesian_bbox(
            ovl, spacing, block_size,
            min_boundary_distance=min_boundary_distance)
        if centers.shape[0] < min_num_blocks and i_s < len(spacings) - 1:
            continue
        if centers.shape[0] == 0:
            return None
        if use_device:
            stack0, kept0 = warp_ops.mesh_blocks_device(
                mesh0, src0, centers, block_size, src_offset=src_off0)
            stack1, kept1 = warp_ops.mesh_blocks_device(
                mesh1, src1, centers, block_size, src_offset=src_off1)
        else:
            render0 = MeshRenderer.from_mesh(mesh0, image_loader=loader0)
            render1 = MeshRenderer.from_mesh(mesh1, image_loader=loader1)
            stack0, kept0 = _render_blocks(render0, centers, block_size)
            stack1, kept1 = _render_blocks(render1, centers, block_size)
        keep = np.intersect1d(kept0, kept1)
        if keep.size == 0:
            return None
        s0 = stack0[np.searchsorted(kept0, keep)]
        s1 = stack1[np.searchsorted(kept1, keep)]
        centers_k = centers[keep]
        n_real = int(s0.shape[0])
        if use_device:
            # pad the batch to a power of two so compiled shapes are reused
            import jax.numpy as jnp
            nb = _pad_pow2(n_real)
            if nb > n_real:
                s0 = jnp.concatenate(
                    [s0, jnp.broadcast_to(s0[:1], (nb - n_real,) + s0.shape[1:])])
                s1 = jnp.concatenate(
                    [s1, jnp.broadcast_to(s1[:1], (nb - n_real,) + s1.shape[1:])])
        dxs, dys, confs = [], [], []
        for b0 in range(0, int(s0.shape[0]), batch_size):
            dx, dy, cf = xcorr_fft(s0[b0:b0 + batch_size], s1[b0:b0 + batch_size],
                                   conf_mode=conf_mode, sigma=sigma, pad=pad,
                                   subpixel=(i_s == len(spacings) - 1))
            dxs.append(np.atleast_1d(dx))
            dys.append(np.atleast_1d(dy))
            confs.append(np.atleast_1d(cf))
        dx = np.concatenate(dxs)[:n_real]
        dy = np.concatenate(dys)[:n_real]
        conf = np.concatenate(confs)[:n_real]
        ok = conf >= conf_thresh
        if not ok.any():
            if i_s == len(spacings) - 1:
                break
            continue
        # xcorr convention: d = world position of block0 content center
        # minus block1 content center, so mesh1's world point c shows the
        # content that sits at c - d in mesh0's world
        xy1 = centers_k[ok]
        xy0 = xy1 - np.stack([dx[ok], dy[ok]], axis=-1)
        slm.links = []
        link = slm.add_link_from_coordinates(
            mesh0.uid, mesh1.uid, xy0, xy1, weight=conf[ok],
            gear=(const.MESH_GEAR_MOVING, const.MESH_GEAR_MOVING))
        # relax mesh1 onto the new evidence
        if i_s == 0:
            slm.optimize_translation()
        rlen = residue_len if residue_len > 0 else max(spacing * 0.1, 2.0)
        slm.optimize_elastic(stiffness_lambda=stiffness_lambda,
                             crosslink_lambda=-1.0,
                             residue_mode=residue_mode, residue_len=rlen,
                             tol=1e-8)
        # adapt: if displacements were near the block ambiguity limit,
        # re-run the same spacing once with enlarged blocks
        disp = np.hypot(dx[ok], dy[ok])
        if refine_mode and disp.max() > block_size / 4 and i_s == 0:
            kwargs2 = dict(kwargs)
            kwargs2['refine_mode'] = False
            kwargs2['shrink_factor'] = shrink_factor * 1.5
            return iterative_xcorr_matcher_w_mesh(
                mesh0, mesh1, loader0, loader1, spacings, **kwargs2)
    if link is None or link.num_matches == 0:
        return None
    w = link.weight()
    keep = w > 0
    if not keep.any():
        return None
    xy0 = link.xy0(gear=const.MESH_GEAR_INITIAL)[keep]
    xy1 = link.xy1(gear=const.MESH_GEAR_INITIAL)[keep]
    if compute_strain:
        strain = float(np.mean(mesh1.svds_to_deform(
            gear1=const.MESH_GEAR_MOVING)))
        strain = max(strain, 1e-4)
    else:
        strain = config.DEFAULT_AVG_DEFORM
    return common.Match(xy0, xy1, w[keep], strain)


def stitching_matcher(img0, img1, **kwargs):
    """Match two overlapping tiles (reference: matcher.py:224).

    Tiles are first coarsely aligned by whole-image translation at
    ``coarse_downsample`` scale, then block-matched through deforming
    meshes at ``fine_downsample``. Returns a ``common.Match`` in full-
    resolution tile coordinates (xy0 in img0's frame, xy1 in img1's), or
    None when matching fails.
    """
    sigma = kwargs.get('sigma', 2.5)
    conf_thresh = kwargs.get('conf_thresh', 0.3)
    coarse_downsample = kwargs.get('coarse_downsample', 1.0)
    fine_downsample = kwargs.get('fine_downsample', 1.0)
    spacings = kwargs.get('spacings', None)
    mask0 = kwargs.get('mask0', None)
    mask1 = kwargs.get('mask1', None)
    err_thresh = kwargs.get('coarse_error_thresh', None)
    import cv2
    img0 = np.asarray(img0)
    img1 = np.asarray(img1)

    def _scaled(img, scale):
        # keep the native (usually uint8) dtype: device kernels cast after
        # the transfer, quartering tunnel bytes
        if scale == 1.0:
            return np.asarray(img)
        return cv2.resize(np.asarray(img), None, fx=scale, fy=scale,
                          interpolation=cv2.INTER_AREA)

    c0 = _scaled(img0, coarse_downsample)
    c1 = _scaled(img1, coarse_downsample)
    dx, dy, conf = global_translation_matcher(
        c0, c1, sigma=sigma * coarse_downsample, conf_thresh=conf_thresh,
        mask0=mask0, mask1=mask1)
    if conf < conf_thresh:
        return None
    dx /= coarse_downsample
    dy /= coarse_downsample
    # fine stage at fine_downsample scale
    f0 = _scaled(img0, fine_downsample)
    f1 = _scaled(img1, fine_downsample)
    fs = fine_downsample
    mesh_size = max(np.hypot(*f0.shape) / 8, 50)
    mesh0 = Mesh.from_bbox((0, 0, f0.shape[1], f0.shape[0]), cartesian=True,
                           mesh_size=mesh_size, uid=0, locked=True)
    mesh1 = Mesh.from_bbox((0, 0, f1.shape[1], f1.shape[0]), cartesian=True,
                           mesh_size=mesh_size, uid=1,
                           soft_factor=1.0 / config.MATCH_SOFTFACTOR_DOMINANCE)
    # (dx, dy) = world position of img0's center minus img1's center, so
    # placing mesh1 in img0's frame needs t = c0 - c1 - (dx, dy)
    t = (np.array([f0.shape[1], f0.shape[0]]) / 2
         - np.array([f1.shape[1], f1.shape[0]]) / 2
         - np.array([dx, dy]) * fs)
    mesh1.set_translation(t)
    if spacings is None:
        # size grid spacing to the overlap so borders get dense coverage
        # (reference sizes spacings dynamically, matcher.py:265)
        ovl, valid = common.intersect_bbox(
            (0, 0, f0.shape[1], f0.shape[0]),
            (t[0], t[1], t[0] + f1.shape[1], t[1] + f1.shape[0]))
        if not valid:
            return None
        short = min(ovl[2] - ovl[0], ovl[3] - ovl[1])
        s0 = float(np.clip(short / 3.0, 25.0, 200.0))
        spacings = [s0] if s0 <= 60 else [s0, max(s0 / 2, 50.0)]
        spacings = np.asarray(spacings) / fs
    match = iterative_xcorr_matcher_w_mesh(
        mesh0, mesh1, StreamLoader(f0), StreamLoader(f1),
        np.asarray(spacings, np.float64) * fs,
        sigma=sigma * fs, conf_thresh=conf_thresh,
        **{k: v for k, v in kwargs.items()
           if k in ('residue_mode', 'residue_len', 'pad', 'batch_size',
                    'shrink_factor', 'min_boundary_distance',
                    'stiffness_lambda', 'conf_mode')})
    if match is None:
        return None
    return common.Match(match.xy0 / fs, match.xy1 / fs, match.weight,
                        match.strain)


def section_matcher(mesh0, mesh1, loader0, loader1, **kwargs):
    """Match two sections through their (already roughly aligned) meshes
    (reference: matcher.py:370). Thin wrapper that runs the iterative
    matcher per connected component group."""
    spacings = kwargs.pop('spacings', [400, 100])
    match = iterative_xcorr_matcher_w_mesh(mesh0, mesh1, loader0, loader1,
                                           spacings, **kwargs)
    return match
