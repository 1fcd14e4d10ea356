"""Device render path (ops/render.py): on-device rasterize+warp parity
against the host cv2 path (reference workload: feabas/renderer.py:566-683).
"""

import numpy as np
import pytest


def _smooth_mesh(N=512, mesh_size=64, amp=4.0):
    from feabas_tpu.mesh import Mesh
    m = Mesh.from_bbox((0, 0, N, N), cartesian=True, mesh_size=mesh_size,
                       resolution=4)
    v = m.vertices(1)
    m.set_vertices(v + np.stack([amp * np.sin(v[:, 1] / 97),
                                 amp * np.cos(v[:, 0] / 83)], -1), 1,
                   offset=m.offset(1))
    return m


def _world(N=512, seed=3, pad=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter
    w = gaussian_filter(rng.normal(0, 1, (N + pad, N + pad)), 1.5)
    return (w / w.std() * 40 + 128).clip(0, 255).astype(np.uint8)


def _compare(host, dev, max_mismatch_frac=2e-3, lsb=1):
    """Device vs host blocks: identical shape/dtype; all but a thin
    rasterization-edge band within ``lsb``; the band itself tiny."""
    assert host.shape == dev.shape and host.dtype == dev.dtype
    diff = np.abs(host.astype(np.int32) - dev.astype(np.int32))
    bad = diff > lsb
    frac = bad.mean()
    assert frac <= max_mismatch_frac, (frac, diff.max())


def test_device_crop_matches_host_smooth(workdir):
    from feabas_tpu.renderer import MeshRenderer
    from feabas_tpu.dal import StreamLoader
    m = _smooth_mesh()
    loader = StreamLoader(_world())
    r = MeshRenderer.from_mesh(m, image_loader=loader)
    bbox = (-16, -16, 300, 280)   # includes uncovered margin
    host = r.crop(bbox, device_render=False)
    dev = r.crop(bbox, device_render=True)
    _compare(host, dev)
    # uncovered margin is fillval on both
    assert (dev[:8, :8] == host[:8, :8]).all()


def test_device_crop_multiple_and_pipelining(workdir):
    from feabas_tpu.renderer import MeshRenderer
    from feabas_tpu.dal import StreamLoader
    m = _smooth_mesh()
    r = MeshRenderer.from_mesh(m, image_loader=StreamLoader(_world()))
    bboxes = [(0, 0, 256, 256), (256, 0, 512, 256), (0, 256, 256, 512)]
    host = r.crop_multiple(bboxes, device_render=False)
    dev = r.crop_multiple(bboxes, device_render=True)
    for hb, db in zip(host, dev):
        _compare(hb, db)


def test_device_crop_nonstream_loader_blockwise_source(workdir, tmp_path):
    """Non-StreamLoader sources exercise the per-block source-crop upload
    path."""
    from feabas_tpu.renderer import MeshRenderer
    from feabas_tpu.dal import StaticImageLoader
    from feabas_tpu import common
    img = _world(N=400)
    fn = str(tmp_path / 'tile.png')
    common.imwrite(fn, img)
    loader = StaticImageLoader([fn], bboxes=[(0, 0, 400, 400)])
    m = _smooth_mesh(N=400)
    r = MeshRenderer.from_mesh(m, image_loader=loader)
    bbox = (0, 0, 400, 400)
    host = r.crop(bbox, device_render=False, fileid=0)
    dev = r.crop(bbox, device_render=True, fileid=0)
    _compare(host, dev)


def test_device_crop_folded_mesh_least_deform(workdir):
    """Folded mesh with LEAST_DEFORM arbitration + geodesic masking: the
    fold-ambiguous zone masks identically and values match off the fold."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.renderer import MeshRenderer
    from feabas_tpu.dal import StreamLoader
    img = _world(N=128)[:60, :]
    m = Mesh.from_bbox((0, 0, 120, 60), cartesian=True, mesh_size=20)
    v = m.vertices('FIXED').copy()
    sel = v[:, 0] > 80
    v[sel, 0] = 160 - v[sel, 0]
    m.set_vertices(v, 'MOVING')
    loader = StreamLoader(img[:, :120])
    for kw in ({'mode': 'LEAST_DEFORM'},
               {'mode': 'LEAST_DEFORM', 'geodesic_mask': True}):
        r = MeshRenderer.from_mesh(m, image_loader=loader, **kw)
        host = r.crop((0, 0, 120, 60), device_render=False)
        dev = r.crop((0, 0, 120, 60), device_render=True)
        _compare(host, dev, max_mismatch_frac=0.02)


def test_device_crop_weight_threshold_and_empty(workdir):
    from feabas_tpu.renderer import MeshRenderer
    from feabas_tpu.dal import StreamLoader
    m = _smooth_mesh(N=256)
    loader = StreamLoader(_world(N=256))
    r = MeshRenderer.from_mesh(m, image_loader=loader)
    # a threshold above every weight masks everything -> empty
    blk = r.crop((0, 0, 128, 128), device_render=True, return_empty=True,
                 render_weight_threshold=10.0)
    assert blk is None
    # bbox fully outside the mesh -> empty
    blk = r.crop((5000, 5000, 5128, 5128), device_render=True,
                 return_empty=True)
    assert blk is None
    # without return_empty: fillval block
    blk = r.crop((5000, 5000, 5128, 5128), device_render=True, fillval=7)
    assert blk.shape == (128, 128) and (blk == 7).all()


def test_device_render_fallbacks(workdir):
    """log_sigma / non-LINEAR interp fall back to the host path (results
    still correct)."""
    import cv2
    from feabas_tpu.renderer import MeshRenderer
    from feabas_tpu.dal import StreamLoader
    m = _smooth_mesh(N=256)
    r = MeshRenderer.from_mesh(m, image_loader=StreamLoader(_world(N=256)))
    a = r.crop((0, 0, 128, 128), device_render=True, log_sigma=2.5)
    b = r.crop((0, 0, 128, 128), device_render=False, log_sigma=2.5)
    assert np.allclose(a, b)
    a = r.crop((0, 0, 128, 128), device_render=True,
               interpolation=cv2.INTER_NEAREST)
    b = r.crop((0, 0, 128, 128), device_render=False,
               interpolation=cv2.INTER_NEAREST)
    assert (a == b).all()


def test_device_render_config_default(workdir):
    """general_configs device.render drives the default routing."""
    from feabas_tpu import config
    assert config.device_render() in (False, True)
