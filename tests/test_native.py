"""Native rasterizer: parity with the numpy path + speedup."""

import time

import numpy as np
import pytest


def _numpy_rasterize(mesh, bbox, gear, tri_weights=None):
    """The pure-numpy reference path (pre-native implementation)."""
    x0, y0, x1, y1 = [int(np.floor(bbox[0])), int(np.floor(bbox[1])),
                      int(np.ceil(bbox[2])), int(np.ceil(bbox[3]))]
    H, W = y1 - y0, x1 - x0
    tid = np.full((H, W), -1, dtype=np.int32)
    vw = mesh.vertices_w_offset(gear)
    T = mesh.triangles
    use_w = tri_weights is not None
    if use_w:
        wmap = np.full((H, W), -np.inf, dtype=np.float32)
    eps = 1e-9
    for t in range(len(T)):
        p = vw[T[t]]
        tx0 = max(int(np.floor(p[:, 0].min())) - x0, 0)
        tx1 = min(int(np.ceil(p[:, 0].max())) - x0 + 1, W)
        ty0 = max(int(np.floor(p[:, 1].min())) - y0, 0)
        ty1 = min(int(np.ceil(p[:, 1].max())) - y0 + 1, H)
        if tx0 >= tx1 or ty0 >= ty1:
            continue
        xs = np.arange(tx0, tx1) + x0
        ys = np.arange(ty0, ty1) + y0
        gx, gy = np.meshgrid(xs, ys)
        v0 = p[1] - p[0]
        v1 = p[2] - p[0]
        den = v0[0] * v1[1] - v0[1] * v1[0]
        if abs(den) < 1e-12:
            continue
        dx = gx - p[0, 0]
        dy = gy - p[0, 1]
        l1 = (dx * v1[1] - dy * v1[0]) / den
        l2 = (v0[0] * dy - v0[1] * dx) / den
        inside = (l1 >= -eps) & (l2 >= -eps) & (l1 + l2 <= 1 + eps)
        if use_w:
            better = inside & (tri_weights[t] > wmap[ty0:ty1, tx0:tx1])
            wmap[ty0:ty1, tx0:tx1][better] = tri_weights[t]
            tid[ty0:ty1, tx0:tx1][better] = t
        else:
            tid[ty0:ty1, tx0:tx1][inside] = t
    return tid


@pytest.fixture()
def deformed_mesh(workdir):
    from feabas_tpu.mesh import Mesh
    from feabas_tpu import constant as const
    m = Mesh.from_bbox((0, 0, 400, 300), cartesian=True, mesh_size=40)
    T = np.eye(3)
    T[:2, :2] = [[1.03, 0.05], [-0.04, 0.97]]
    T[2, :2] = [7, -3]
    m.apply_affine(T, gear=(const.MESH_GEAR_FIXED, const.MESH_GEAR_MOVING))
    return m


def test_native_available():
    from feabas_tpu import native
    assert native.available(), 'g++ build of librasterize.so failed'


def test_native_rasterize_parity(deformed_mesh):
    from feabas_tpu import native
    if not native.available():
        pytest.skip('native unavailable')
    m = deformed_mesh
    bbox = (-10, -10, 420, 320)
    ref = _numpy_rasterize(m, bbox, 'MOVING')
    vw = m.vertices_w_offset('MOVING')
    got = native.rasterize_triangles(vw, m.triangles,
                                     ref.shape[0], ref.shape[1], -10, -10)
    # coverage must be identical; at shared edges either neighbor is valid,
    # so compare coverage + interior equality
    assert np.array_equal(got >= 0, ref >= 0)
    both = (got >= 0)
    agree = (got == ref)[both].mean()
    assert agree > 0.97, agree  # ties at shared edges differ only


def test_native_weighted_parity(deformed_mesh, rng):
    from feabas_tpu import native
    if not native.available():
        pytest.skip('native unavailable')
    m = deformed_mesh
    w = rng.random(m.num_triangles).astype(np.float32)
    ref = _numpy_rasterize(m, (0, 0, 300, 250), 'MOVING', tri_weights=w)
    got = native.rasterize_triangles(m.vertices_w_offset('MOVING'),
                                     m.triangles, 250, 300, 0, 0, weights=w)
    assert np.array_equal(got >= 0, ref >= 0)
    both = got >= 0
    assert (got == ref)[both].mean() > 0.97


def test_field_from_tids_parity(deformed_mesh):
    from feabas_tpu import native
    from feabas_tpu.renderer import MeshRenderer
    if not native.available():
        pytest.skip('native unavailable')
    r = MeshRenderer.from_mesh(deformed_mesh)
    map_x, map_y, mask = r.crop_field((20, 20, 220, 170))
    # cross-check against direct affine evaluation at a few pixels
    tidmap = _numpy_rasterize(deformed_mesh, (20, 20, 220, 170), 'MOVING')
    ys, xs = np.nonzero(tidmap >= 0)
    sel = slice(0, None, 197)
    for y, x in zip(ys[sel], xs[sel]):
        t = tidmap[y, x]
        p = np.array([x + 20, y + 20], float)
        want = p @ r._A[t] + r._b[t]
        if mask[y, x]:
            assert np.allclose([map_x[y, x], map_y[y, x]], want, atol=1e-3)


def test_native_speedup(deformed_mesh):
    from feabas_tpu import native
    if not native.available():
        pytest.skip('native unavailable')
    m = deformed_mesh
    bbox = (0, 0, 400, 300)
    t0 = time.perf_counter()
    for _ in range(3):
        _numpy_rasterize(m, bbox, 'MOVING')
    t_np = time.perf_counter() - t0
    vw = m.vertices_w_offset('MOVING')
    t0 = time.perf_counter()
    for _ in range(3):
        native.rasterize_triangles(vw, m.triangles, 300, 400, 0, 0)
    t_cc = time.perf_counter() - t0
    assert t_cc < t_np, (t_cc, t_np)
