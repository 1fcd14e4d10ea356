"""Mesh construction, queries, gears, H5 round-trip, triangulation."""

import numpy as np
import pytest


@pytest.fixture()
def disk_geometry(workdir):
    """A disk-with-hole label mask wrapped in a Geometry."""
    from feabas_tpu.spatial import Geometry
    from feabas_tpu.material import MaterialTable
    h = w = 200
    yy, xx = np.mgrid[:h, :w]
    r = np.hypot(yy - h / 2, xx - w / 2)
    mask = np.full((h, w), 255, np.uint8)   # exclude
    mask[r < 80] = 0                        # default material
    mask[r < 15] = 255                      # hole
    return Geometry(mask, material_table=MaterialTable(), scale=2.0,
                    offset=(100.0, 50.0))


def test_grid_index():
    from feabas_tpu.utils.spatial_index import GridIndex
    boxes = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], float)
    gi = GridIndex(boxes)
    assert set(gi.query((8, 8, 9, 9))) == {0, 1}
    assert set(gi.query((25, 25, 26, 26))) == {2}
    assert gi.query((100, 100, 101, 101)).size == 0
    pairs = gi.all_pairs()
    assert pairs.tolist() == [[0, 1]]


def test_fit_affine_recovers_transform(rng):
    from feabas_tpu.spatial import fit_affine, apply_affine
    pts1 = rng.normal(0, 10, (30, 2))
    T_true = np.eye(3)
    theta = 0.3
    T_true[:2, :2] = [[np.cos(theta), np.sin(theta)], [-np.sin(theta), np.cos(theta)]]
    T_true[:2, :2] @= np.diag([1.1, 0.95])
    T_true[2, :2] = [5.0, -3.0]
    pts0 = apply_affine(pts1, T_true)
    T, T_rigid = fit_affine(pts0, pts1, return_rigid=True)
    assert np.allclose(T, T_true, atol=1e-8)
    # rigid has unit singular values
    s = np.linalg.svd(T_rigid[:2, :2], compute_uv=False)
    assert np.allclose(s, 1.0, atol=1e-8)


def test_cartesian_mesh_covers_bbox(workdir):
    from feabas_tpu.mesh import Mesh
    m = Mesh.from_bbox((0, 0, 300, 200), cartesian=True, mesh_size=50)
    assert m.num_triangles > 0
    bb = m.bbox(gear='INITIAL')
    assert np.allclose(bb, [0, 0, 300, 200], atol=1e-6)
    # total area preserved by triangulation
    assert abs(np.abs(m.triangle_areas('INITIAL')).sum() - 300 * 200) < 1e-6
    # all triangles positively oriented after construction
    assert (np.abs(m.triangle_areas('INITIAL')) > 1).all()


def test_border_refined_mesh(workdir):
    from feabas_tpu.triangulation import border_refined_mesh
    v, t = border_refined_mesh((0, 0, 1000, 800), mesh_size=50, bd_width=120)
    assert len(v) > 50
    areas = np.abs(np.cross(v[t[:, 1]] - v[t[:, 0]], v[t[:, 2]] - v[t[:, 0]])) / 2
    assert areas.sum() > 0.98 * 1000 * 800
    # interior triangles coarser than border ones
    cent = v[t].mean(1)
    interior = ((cent[:, 0] > 200) & (cent[:, 0] < 800) &
                (cent[:, 1] > 200) & (cent[:, 1] < 600))
    assert areas[interior].mean() > 2.5 * areas[~interior].mean()


def test_geometry_meshing(disk_geometry):
    from feabas_tpu.mesh import Mesh
    m = Mesh.from_geometry(disk_geometry, mesh_size=30)
    assert m.num_triangles > 20
    # mesh area ~ annulus area (2x scale): pi*(160^2-30^2)
    want = np.pi * (160 ** 2 - 30 ** 2)
    got = np.abs(m.triangle_areas('INITIAL')).sum()
    assert abs(got - want) / want < 0.12, (got, want)
    # centers inside the annulus
    c = m.triangle_centers('INITIAL')
    r = np.hypot(c[:, 0] - (100 + 200), c[:, 1] - (50 + 200))
    assert (r < 165).all() and (r > 25).all()


def test_tri_finder_and_barycentric(workdir, rng):
    from feabas_tpu.mesh import Mesh
    m = Mesh.from_bbox((0, 0, 100, 100), cartesian=True, mesh_size=20)
    pts = rng.uniform(5, 95, (50, 2))
    tid = m.tri_finder(pts, gear='INITIAL')
    assert (tid >= 0).all()
    bary = m.cart2bary(pts, tid, gear='INITIAL')
    assert (bary > -1e-9).all()
    back = m.bary2cart(tid, bary, gear='INITIAL')
    assert np.allclose(back, pts, atol=1e-9)
    # outside points
    tid_out = m.tri_finder(np.array([[500.0, 500.0]]), gear='INITIAL')
    assert tid_out[0] == -1
    tid_ex = m.tri_finder(np.array([[500.0, 500.0]]), gear='INITIAL', extrapolate=True)
    assert tid_ex[0] >= 0


def test_gears_and_transforms(workdir):
    from feabas_tpu.mesh import Mesh
    from feabas_tpu import constant as const
    m = Mesh.from_bbox((0, 0, 60, 40), cartesian=True, mesh_size=20)
    assert np.allclose(m.vertices('MOVING'), m.vertices('FIXED'))  # fallback
    m.set_translation((10, -5))
    assert np.allclose(m.vertices_w_offset('MOVING'),
                       m.vertices_w_offset('FIXED') + [10, -5])
    T = np.eye(3)
    T[2, :2] = [3, 4]
    m.apply_affine(T, gear=(const.MESH_GEAR_FIXED, const.MESH_GEAR_MOVING))
    assert np.allclose(m.vertices_w_offset('MOVING'),
                       m.vertices_w_offset('FIXED') + [3, 4])
    # anneal copies MOVING into FIXED
    m.anneal(gear=(const.MESH_GEAR_MOVING, const.MESH_GEAR_FIXED),
             mode=const.ANNEAL_COPY_EXACT)
    assert np.allclose(m.vertices_w_offset('FIXED'), m.vertices_w_offset('MOVING'))


def test_mesh_h5_roundtrip(workdir, tmp_path):
    from feabas_tpu.mesh import Mesh
    m = Mesh.from_bbox((0, 0, 100, 80), cartesian=True, mesh_size=25,
                       name='sec42', locked=True, soft_factor=0.5)
    m.set_translation((7, 8))
    p = str(tmp_path / 'mesh.h5')
    m.save_to_h5(p)
    m2 = Mesh.from_h5(p)
    assert m2.name == 'sec42'
    assert m2.locked and m2.soft_factor == 0.5
    assert np.allclose(m2.vertices_w_offset('MOVING'), m.vertices_w_offset('MOVING'))
    assert np.array_equal(m2.triangles, m.triangles)
    assert m2.material_table['default'].uid == 0


def test_submesh_and_connectivity(workdir):
    from feabas_tpu.mesh import Mesh
    import feabas_tpu.triangulation as T
    v1, t1 = T.cartesian_mesh((0, 0, 50, 50), 25)
    v2, t2 = T.cartesian_mesh((200, 200, 250, 250), 25)
    v = np.concatenate([v1, v2])
    t = np.concatenate([t1, t2 + len(v1)])
    m = Mesh(v, t)
    assert m.num_connected == 2
    parts = m.divide_disconnected_mesh()
    assert len(parts) == 2
    assert sum(p.num_triangles for p in parts) == m.num_triangles
    sub = m.submesh(np.arange(len(t1)))
    assert sub.num_triangles == len(t1)
    assert sub.num_vertices == len(v1)


def test_flipped_triangles_detection(workdir):
    from feabas_tpu.mesh import Mesh
    m = Mesh.from_bbox((0, 0, 40, 40), cartesian=True, mesh_size=20)
    assert m.flipped_triangles().size == 0
    v = m.vertices('FIXED').copy()
    # collapse+cross one vertex far past its neighbors
    v[0] = [35, 35]
    m.set_vertices(v, 'MOVING')
    assert m.flipped_triangles('MOVING').size > 0


def test_transform_mesh_resampling(workdir):
    from feabas_tpu.mesh import Mesh, transform_mesh
    from feabas_tpu import constant as const
    carrier = Mesh.from_bbox((0, 0, 100, 100), cartesian=True, mesh_size=10)
    T = np.eye(3)
    T[:2, :2] = [[1.2, 0.1], [-0.05, 0.9]]
    T[2, :2] = [4, -2]
    carrier.apply_affine(T, gear=(const.MESH_GEAR_FIXED, const.MESH_GEAR_MOVING))
    probe = Mesh.from_bbox((10, 10, 90, 90), cartesian=True, mesh_size=40)
    out = transform_mesh(probe, carrier)
    from feabas_tpu.spatial import apply_affine
    want = apply_affine(probe.vertices_w_offset('FIXED'), T)
    assert np.allclose(out.vertices_w_offset('MOVING'), want, atol=1e-6)


def test_deformation_svd(workdir):
    from feabas_tpu.mesh import Mesh
    from feabas_tpu import constant as const
    m = Mesh.from_bbox((0, 0, 60, 60), cartesian=True, mesh_size=20)
    T = np.eye(3)
    T[:2, :2] = np.diag([1.5, 0.8])
    m.apply_affine(T, gear=(const.MESH_GEAR_INITIAL, const.MESH_GEAR_MOVING))
    s = m.tform_svd(const.MESH_GEAR_INITIAL, const.MESH_GEAR_MOVING)
    assert np.allclose(np.sort(s, axis=-1), [0.8, 1.5], atol=1e-9)
    d = m.svds_to_deform(s)
    assert np.allclose(d, np.log(1.5), atol=1e-6)
