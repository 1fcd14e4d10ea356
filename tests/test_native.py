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


def test_cdt_constraint_recovery(rng):
    """Native CDT: every requested segment becomes a triangulation edge;
    convex-hull coverage is exact (no holes, no overlaps)."""
    from feabas_tpu import native
    if not native.cdt_available():
        import pytest
        pytest.skip('no native toolchain')
    from scipy.spatial import ConvexHull
    pts = rng.uniform(0, 500, (400, 2))
    order = np.argsort(pts[:, 0])
    segs = np.stack([order[:80:2], order[1:81:2]], -1)
    tris, ok = native.cdt_triangulate(pts, segments=segs)
    assert ok == len(segs)
    E = np.concatenate((tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]))
    for a, b in segs:
        assert (((E[:, 0] == a) & (E[:, 1] == b))
                | ((E[:, 0] == b) & (E[:, 1] == a))).any()
    p = pts[tris]
    area = np.abs((p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
                  - (p[:, 1, 1] - p[:, 0, 1]) * (p[:, 2, 0] - p[:, 0, 0])).sum() / 2
    hull = ConvexHull(pts).volume
    assert abs(area - hull) < 1e-6 * hull


def test_cdt_concave_region_conforms(workdir, rng):
    """triangulate_mask with the CDT: a deeply concave (C-shaped) region
    meshes with NO triangle crossing the concavity mouth."""
    from feabas_tpu import native
    if not native.cdt_available():
        import pytest
        pytest.skip('no native toolchain')
    from feabas_tpu.triangulation import triangulate_mask
    # C-shape: 100x100 square minus a 60x34 notch on the right
    ring = np.array([[0, 0], [100, 0], [100, 33], [40, 33], [40, 67],
                     [100, 67], [100, 100], [0, 100]], float)

    def inside(p):
        p = np.asarray(p)
        in_sq = (p[:, 0] >= 0) & (p[:, 0] <= 100) & (p[:, 1] >= 0) & (p[:, 1] <= 100)
        in_notch = (p[:, 0] > 40) & (p[:, 1] > 33) & (p[:, 1] < 67)
        return in_sq & ~in_notch

    verts, tris = triangulate_mask(inside, [ring], mesh_size=12)
    # no triangle may have its centroid in the notch and none may cross
    # the notch mouth (x=100 gap between y 33..67)
    cent = verts[tris].mean(axis=1)
    assert inside(cent).all()
    # segment conformity: every edge crossing y in (33, 67) at x>40 would
    # bridge the notch — there must be none
    p = verts[tris]
    for k in range(3):
        a = p[:, k]
        b = p[:, (k + 1) % 3]
        mid = (a + b) / 2
        bridge = (mid[:, 0] > 42) & (mid[:, 1] > 35) & (mid[:, 1] < 65)
        assert not bridge.any()
