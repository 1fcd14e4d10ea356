"""SLM solver cascade: translation, affine cascade, elastic relaxation."""

import numpy as np
import pytest


def _tile_mesh(bbox, uid, locked=False, mesh_size=25, name=''):
    from feabas_tpu.mesh import Mesh
    return Mesh.from_bbox(bbox, cartesian=True, mesh_size=mesh_size,
                          uid=uid, locked=locked, name=name)


def _grid_pts(bbox, n=5, margin=2.0):
    xs = np.linspace(bbox[0] + margin, bbox[2] - margin, n)
    ys = np.linspace(bbox[1] + margin, bbox[3] - margin, n)
    xx, yy = np.meshgrid(xs, ys)
    return np.stack([xx.ravel(), yy.ravel()], -1)


def test_translation_solve_recovers_offsets(workdir):
    from feabas_tpu.optimizer import SLM
    # three tiles in a row, overlapping 20px; stage positions perfect for
    # tile0 (locked); tiles 1,2 are off by known amounts
    slm = SLM([
        _tile_mesh((0, 0, 100, 80), 0, locked=True),
        _tile_mesh((80, 0, 180, 80), 1),
        _tile_mesh((160, 0, 260, 80), 2),
    ])
    true_off = {1: np.array([3.0, -2.0]), 2: np.array([-1.5, 4.0])}
    # links in overlap regions: xy on each mesh such that after correcting
    # by true_off the points coincide
    for (ua, ub), ovl in (((0, 1), (80, 0, 100, 80)), ((1, 2), (160, 0, 180, 80))):
        pts = _grid_pts(ovl)
        xa = pts if ua == 0 else pts - true_off[ua]
        xb = pts - true_off[ub]
        slm.add_link_from_coordinates(ua, ub, xa, xb)
    slm.optimize_translation()
    for uid, off in true_off.items():
        m = slm.mesh_by_uid(uid)
        got = m.offset('MOVING') - m.offset('FIXED')
        assert np.allclose(got.ravel(), off, atol=1e-6), (uid, got, off)
    assert slm.match_residues(gear='MOVING').max() < 1e-6


def test_affine_cascade_recovers_affine(workdir):
    from feabas_tpu.optimizer import SLM
    from feabas_tpu.spatial import apply_affine
    slm = SLM([
        _tile_mesh((0, 0, 100, 100), 0, locked=True),
        _tile_mesh((80, 0, 180, 100), 1),
    ])
    T = np.eye(3)
    T[:2, :2] = [[1.02, 0.03], [-0.02, 0.99]]
    T[2, :2] = [5.0, -3.0]
    pts = _grid_pts((80, 0, 100, 100))
    # mesh1's points must be mapped by T to land on mesh0's points
    xy1 = pts
    xy0 = apply_affine(pts, T)
    slm.add_link_from_coordinates(0, 1, xy0, xy1)
    slm.optimize_affine_cascade()
    assert slm.match_residues(gear='MOVING').max() < 1e-6


def test_elastic_solve_pulls_matches_together(workdir):
    from feabas_tpu.optimizer import SLM
    slm = SLM([
        _tile_mesh((0, 0, 100, 100), 0, locked=True, mesh_size=20),
        _tile_mesh((80, 0, 180, 100), 1, mesh_size=20),
    ])
    # smooth non-affine target displacement for mesh1 in the overlap
    pts = _grid_pts((80, 0, 100, 100), n=7)
    disp = np.stack([2.0 * np.sin(pts[:, 1] / 30.0), 0.5 + 0.01 * pts[:, 1]], -1)
    slm.add_link_from_coordinates(0, 1, pts, pts - disp)
    r_before = slm.match_residues(gear='MOVING')
    c0, c1 = slm.optimize_elastic(tol=1e-10, stiffness_lambda=-0.001,
                                  crosslink_lambda=-1)
    r_after = slm.match_residues(gear='MOVING')
    assert r_before.max() > 1.0
    assert r_after.max() < 0.35 * r_before.max()
    assert c1 < c0
    # locked mesh untouched
    m0 = slm.mesh_by_uid(0)
    assert np.allclose(m0.vertices_w_offset('MOVING'), m0.vertices_w_offset('FIXED'))
    # no flipped triangles
    assert slm.mesh_by_uid(1).flipped_triangles('MOVING').size == 0


def test_huber_damps_outliers(workdir):
    from feabas_tpu.optimizer import SLM
    slm = SLM([
        _tile_mesh((0, 0, 100, 100), 0, locked=True, mesh_size=25),
        _tile_mesh((80, 0, 180, 100), 1, mesh_size=25),
    ])
    pts = _grid_pts((80, 0, 100, 100), n=6)
    xy1 = pts - np.array([2.0, 0.0])     # true shift 2px
    xy1[0] += np.array([40.0, -35.0])    # one gross outlier
    link = slm.add_link_from_coordinates(0, 1, pts, xy1)
    slm.optimize_elastic(tol=1e-10, stiffness_lambda=-0.5, crosslink_lambda=-1,
                         residue_mode='huber', residue_len=2)
    r = link.residues(gear='MOVING')
    inliers = np.ones(len(r), bool)
    inliers[0] = False
    assert r[inliers].max() < 1.0          # inliers pulled together
    assert r[0] > 20                        # outlier left behind
    assert link.weight()[0] < 0.2 * link.weight()[inliers].mean()


def test_relax_mesh_restores_perturbed_vertex(workdir):
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.optimizer import relax_mesh
    m = Mesh.from_bbox((0, 0, 100, 100), cartesian=True, mesh_size=25)
    v = m.vertices('FIXED').copy()
    k = m.num_vertices // 2
    v0 = v[k].copy()
    v[k] += [7.0, -6.0]
    m.set_vertices(v, 'MOVING')
    free = np.zeros(m.num_vertices, bool)
    free[k] = True
    relax_mesh(m, free_vertices=free)
    got = m.vertices_w_offset('MOVING')[k]
    assert np.linalg.norm(got - v0) < 0.2


def test_relax_most_deformed(workdir):
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.optimizer import relax_mesh_most_deformed
    m = Mesh.from_bbox((0, 0, 120, 120), cartesian=True, mesh_size=20)
    v = m.vertices('FIXED').copy()
    k = m.num_vertices // 2
    v[k] += [9.0, 9.0]
    m.set_vertices(v, 'MOVING')
    d_before = m.svds_to_deform(gear1='MOVING').max()
    _, did = relax_mesh_most_deformed(m)
    assert did
    d_after = m.svds_to_deform(gear1='MOVING').max()
    assert d_after < 0.5 * d_before


def test_link_from_coordinates_residues(workdir):
    from feabas_tpu.optimizer import Link
    m0 = _tile_mesh((0, 0, 50, 50), 10, mesh_size=25)
    m1 = _tile_mesh((0, 0, 50, 50), 11, mesh_size=25)
    pts = _grid_pts((5, 5, 45, 45), n=4)
    link = Link.from_coordinates(m0, m1, pts, pts)
    assert link.num_matches == 16
    assert np.allclose(link.residues(gear='INITIAL'), 0, atol=1e-9)
    m1.set_translation((3, 4))
    r = link.residues(gear='MOVING')
    assert np.allclose(r, 5.0, atol=1e-9)


def test_newton_raphson_nonlinear_material(workdir):
    """SVK-material meshes solve through the Newton loop and converge."""
    from feabas_tpu.optimizer import SLM
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.material import MaterialTable, Material
    from feabas_tpu import constant as const
    import feabas_tpu.triangulation as T
    mt = MaterialTable()
    mt.add('svk', Material(type=const.MATERIAL_MODEL_SVK, mask_label=10,
                           poisson_ratio=0.2))
    svk_uid = mt['svk'].uid

    def make(bbox, uid, locked):
        v, t = T.cartesian_mesh(bbox, 25)
        return Mesh(v, t, material_ids=np.full(len(t), svk_uid, np.int16),
                    material_table=mt, uid=uid, locked=locked)

    slm = SLM([make((0, 0, 100, 100), 0, True),
               make((80, 0, 180, 100), 1, False)])
    assert not slm.is_linear
    pts = _grid_pts((82, 5, 98, 95), n=5)
    disp = np.stack([1.5 * np.sin(pts[:, 1] / 25.0),
                     np.full(len(pts), 2.0)], -1)
    slm.add_link_from_coordinates(0, 1, pts, pts - disp)
    r0 = slm.match_residues(gear='MOVING').max()
    c0, c1 = slm.optimize_elastic(stiffness_lambda=-0.05, crosslink_lambda=-1,
                                  tol=1e-9, max_newtonstep=4)
    r1 = slm.match_residues(gear='MOVING').max()
    assert r0 > 1.5 and r1 < 0.4 * r0, (r0, r1)
    assert slm.mesh_by_uid(1).flipped_triangles('MOVING').size == 0


def test_soft_top_mesh_multiplier(workdir, rng):
    from feabas_tpu.stitcher import Stitcher
    st = Stitcher(['a.png', 'b.png'], [(0, 0, 100, 200), (90, 0, 190, 200)])
    from feabas_tpu.common import Match
    st.matches[(0, 1)] = Match(np.array([[95.0, 50.0]]), np.array([[5.0, 50.0]]),
                               np.ones(1), 0.01)
    st.initialize_meshes(mesh_sizes=[50], soft_top=0.2, soft_top_width=0.3)
    m = st.meshes[0]
    mult = m._stiffness_multiplier
    assert mult is not None
    cy = m.vertices('INITIAL')[m.triangles].mean(1)[:, 1]
    assert mult[np.argmin(cy)] < 0.5       # top rows soft
    assert mult[np.argmax(cy)] > 0.9       # bottom full stiffness


def test_fused_linear_path_executes(workdir):
    """The fused single-dispatch ENG solve must engage for the common
    locked+moving two-mesh case with auto-balanced lambdas (round-1
    advisor finding: the fast path was unreachable and would KeyError)."""
    from feabas_tpu.optimizer import SLM
    slm = SLM([
        _tile_mesh((0, 0, 100, 100), 0, locked=True, mesh_size=20),
        _tile_mesh((80, 0, 180, 100), 1, mesh_size=20),
    ])
    pts = _grid_pts((80, 0, 100, 100), n=7)
    disp = np.stack([2.0 * np.sin(pts[:, 1] / 30.0), 0.5 + 0.01 * pts[:, 1]], -1)
    slm.add_link_from_coordinates(0, 1, pts, pts - disp)
    r_before = slm.match_residues(gear='MOVING')
    c0, c1 = slm.optimize_linear(tol=1e-10, stiffness_lambda=-0.001,
                                 crosslink_lambda=-1)
    assert slm._last_solve_fused is True
    r_after = slm.match_residues(gear='MOVING')
    assert r_after.max() < 0.35 * r_before.max()
    assert c1 < c0


def test_divergence_refusal_no_commit(workdir):
    """A solve that cannot make progress (maxiter=0 starves CG) must NOT
    move any vertex and must flag last_solve_converged=False (reference
    refusal: optimizer.py:1420-1421)."""
    from feabas_tpu.optimizer import SLM
    slm = SLM([
        _tile_mesh((0, 0, 100, 100), 0, locked=True, mesh_size=20),
        _tile_mesh((80, 0, 180, 100), 1, mesh_size=20),
    ])
    pts = _grid_pts((80, 0, 100, 100), n=5)
    slm.add_link_from_coordinates(0, 1, pts, pts - [4.0, 2.0])
    m1 = slm.mesh_by_uid(1)
    before = m1.vertices_w_offset('MOVING').copy()
    c0, c1 = slm.optimize_linear(tol=1e-12, stiffness_lambda=-0.01,
                                 crosslink_lambda=-1, maxiter=0)
    assert slm.last_solve_converged is False
    assert c1 == c0
    assert np.allclose(m1.vertices_w_offset('MOVING'), before)
    # the same system converges (and commits) with a real budget
    c0, c1 = slm.optimize_linear(tol=1e-10, stiffness_lambda=-0.01,
                                 crosslink_lambda=-1)
    assert slm.last_solve_converged is True
    assert c1 < c0
    assert not np.allclose(m1.vertices_w_offset('MOVING'), before)


def test_grouped_elastic_shares_deformation(workdir):
    """Meshes in one grouping share one deformation field via DOF
    projection (reference: optimizer.py:1378-1415): the ungrouped member
    follows the evidence; its group twin (with no links of its own) moves
    identically."""
    from feabas_tpu.optimizer import SLM
    from feabas_tpu import constant as const
    m0 = _tile_mesh((0, 0, 100, 100), 0, locked=True, mesh_size=20)
    m1 = _tile_mesh((80, 0, 180, 100), 1, mesh_size=20)
    m2 = _tile_mesh((80, 0, 180, 100), 2, mesh_size=20)
    slm = SLM([m0, m1, m2])
    pts = _grid_pts((80, 0, 100, 100), n=5)
    disp = np.stack([1.5 * np.sin(pts[:, 1] / 25.0),
                     0.5 + 0.02 * pts[:, 1]], -1)
    slm.add_link_from_coordinates(0, 1, pts, pts - disp)
    c0, c1 = slm.optimize_linear(tol=1e-10, stiffness_lambda=-0.01,
                                 crosslink_lambda=-1,
                                 groupings=np.array([0, 1, 1]))
    assert c1 < c0
    u1 = m1.vertices_w_offset('MOVING') - m1.vertices_w_offset('FIXED')
    u2 = m2.vertices_w_offset('MOVING') - m2.vertices_w_offset('FIXED')
    assert np.abs(u1).max() > 0.3          # it moved
    assert np.allclose(u1, u2, atol=1e-6)  # twin moved identically
    # locked mesh untouched
    assert np.allclose(m0.vertices_w_offset('MOVING'),
                       m0.vertices_w_offset('FIXED'))


def test_grouped_lock_discipline(workdir):
    """A group containing a locked mesh is fully locked."""
    from feabas_tpu.optimizer import SLM
    m0 = _tile_mesh((0, 0, 100, 100), 0, locked=True, mesh_size=20)
    m1 = _tile_mesh((0, 0, 100, 100), 1, mesh_size=20)
    m2 = _tile_mesh((80, 0, 180, 100), 2, mesh_size=20)
    slm = SLM([m0, m1, m2])
    pts = _grid_pts((80, 0, 100, 100), n=5)
    slm.add_link_from_coordinates(1, 2, pts, pts - [3.0, 0.0])
    slm.optimize_linear(tol=1e-10, stiffness_lambda=-0.01,
                        crosslink_lambda=-1,
                        groupings=np.array([0, 0, 1]))
    # m1 grouped with locked m0 -> must not move
    assert np.allclose(m1.vertices_w_offset('MOVING'),
                       m1.vertices_w_offset('FIXED'))
    # m2 free: absorbed the displacement
    u2 = m2.vertices_w_offset('MOVING') - m2.vertices_w_offset('FIXED')
    assert np.abs(u2).max() > 1.0


def test_newton_flip_guard(workdir):
    """An adversarial far-pull must not leave flipped triangles: the
    flip guard rolls back and re-steps with a shrunk crosslink term."""
    from feabas_tpu.optimizer import SLM
    from feabas_tpu.material import Material, MaterialTable
    mt = MaterialTable()
    mt.add('svk', Material(type='SVK', mask_label=77))
    m0 = _tile_mesh((0, 0, 100, 100), 0, locked=True, mesh_size=20)
    from feabas_tpu.mesh import Mesh
    m1 = Mesh.from_bbox((80, 0, 180, 100), cartesian=True, mesh_size=20,
                        uid=1, material_table=mt)
    m1._material_ids[:] = mt['svk'].uid
    slm = SLM([m0, m1])
    pts = _grid_pts((80, 0, 100, 100), n=5)
    # one massive outlier pull on a corner + mild consistent field
    tgt = pts - [1.0, 0.5]
    tgt[0] = pts[0] + [70.0, 60.0]
    slm.add_link_from_coordinates(0, 1, pts, tgt)
    slm.optimize_Newton_Raphson(tol=1e-8, stiffness_lambda=-0.5,
                                crosslink_lambda=-1, max_newtonstep=4,
                                residue_mode='huber', residue_len=2)
    assert m1.flipped_triangles('MOVING').size == 0


def test_divide_disconnected_submeshes_redistributes_links(workdir):
    """A disconnected mesh splits into components; its links distribute to
    the component actually containing each match; pieces relax
    independently and sync back (reference: optimizer.py:738,1818)."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.optimizer import SLM
    anchor = _tile_mesh((0, 0, 300, 100), 0, locked=True, mesh_size=25)
    broken = Mesh.from_bbox((0, 0, 300, 100), cartesian=True, mesh_size=25,
                            uid=1)
    cent = broken.triangle_centers('INITIAL')
    broken = broken.submesh(np.abs(cent[:, 0] - 150) > 20)
    broken.uid = 1.0
    assert broken.num_connected == 2
    slm = SLM([anchor, broken])
    # left piece needs (+4, 0); right piece needs (-3, +2)
    ptsL = _grid_pts((10, 10, 120, 90), n=4)
    ptsR = _grid_pts((180, 10, 290, 90), n=4)
    slm.add_link_from_coordinates(0, 1, ptsL, ptsL - [4.0, 0.0])
    slm.add_link_from_coordinates(0, 1, ptsR, ptsR - [-3.0, 2.0])
    n_split = slm.divide_disconnected_submeshes()
    assert n_split == 1
    assert len(slm.meshes) == 3  # anchor + 2 components
    # each distributed link couples the anchor to ONE component
    assert len(slm.links) == 2
    slm.optimize_linear(tol=1e-10, stiffness_lambda=-0.01, crosslink_lambda=-1)
    slm.sync_component_positions()
    mv = broken.vertices_w_offset('MOVING')
    fx = broken.vertices_w_offset('FIXED')
    d = mv - fx
    left = fx[:, 0] < 140
    right = fx[:, 0] > 160
    assert np.allclose(np.median(d[left], axis=0), [4.0, 0.0], atol=0.05)
    assert np.allclose(np.median(d[right], axis=0), [-3.0, 2.0], atol=0.05)


def test_flat_two_level_preconditioner_chain(rng):
    """A mixed-topology z-chain through SLM.optimize_linear (the flat
    solver) converges with the coarse translation correction and reaches
    the same solution quality as ever."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.optimizer import SLM
    from feabas_tpu import constant as const
    S = 24
    meshes = []
    for z in range(S):
        # alternate mesh sizes so the window is NOT bucketable and the
        # FLAT fused path (with the new preconditioner) must run
        ms = 50 if z % 2 else 40
        m = Mesh.from_bbox((0, 0, 200, 200), cartesian=True, mesh_size=ms,
                           uid=z, name=f'z{z}')
        m.set_translation((0, 0))
        meshes.append(m)
    meshes[0].locked = True
    slm = SLM(meshes)
    xs, ys = np.meshgrid(np.linspace(20, 180, 4), np.linspace(20, 180, 4))
    pts = np.stack([xs.ravel(), ys.ravel()], -1)
    drift = np.cumsum(rng.normal(0, 1.0, (S, 2)), axis=0)
    for z in range(S - 1):
        # links demand each section sit at its drifted position
        slm.add_link_from_coordinates(
            z, z + 1, pts + drift[z], pts + drift[z + 1] - (
                drift[z + 1] - drift[z]),
            gear=(const.MESH_GEAR_INITIAL, const.MESH_GEAR_INITIAL))
    c0, c1 = slm.optimize_linear(stiffness_lambda=-0.5,
                                 crosslink_lambda=-1.0, tol=1e-8,
                                 maxiter=3000)
    assert slm._last_solve_fused and not slm._last_solve_sharded
    assert slm.last_solve_converged
    assert c1 < 1e-3 * max(c0, 1.0), (c0, c1)


def test_link_residue_smoothing_and_autocorrelation(workdir):
    """huber_smooth keeps spatially COHERENT offset clusters (real
    deformation) while damping incoherent outliers; plain huber damps
    both (reference dxy_smoothen/spatial_autocorrelation:
    optimizer.py:320-366)."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.optimizer import Link
    from feabas_tpu import constant as const
    rng = np.random.default_rng(0)
    m0 = Mesh.from_bbox((0, 0, 200, 200), cartesian=True, mesh_size=50,
                        uid=0)
    m1 = Mesh.from_bbox((0, 0, 200, 200), cartesian=True, mesh_size=50,
                        uid=1)
    xs, ys = np.meshgrid(np.linspace(10, 190, 8), np.linspace(10, 190, 8))
    pts = np.stack([xs.ravel(), ys.ravel()], -1)
    # coherent smooth offset field (~6 px) + one wild outlier
    off = np.stack([6 * np.sin(pts[:, 1] / 60), 5 * np.cos(pts[:, 0] / 70)],
                   -1)
    off[17] += (40.0, -35.0)
    link = Link.from_coordinates(m0, m1, pts, pts + off,
                                 gear=(const.MESH_GEAR_INITIAL,) * 2)
    for m in (m0, m1):
        m.set_vertices(m.vertices(const.MESH_GEAR_INITIAL),
                       const.MESH_GEAR_MOVING,
                       offset=m.offset(const.MESH_GEAR_INITIAL))

    # the residue field is smooth -> high spatial autocorrelation
    assert link.spatial_autocorrelation() > 0.7
    sm = link.dxy_smoothen()
    assert np.isfinite(sm).all()

    link.adjust_weight_from_residue(residue_len=3, residue_mode='huber_smooth')
    w_smooth = link.residue_weight.copy()
    link.reset_residue_weight()
    link.adjust_weight_from_residue(residue_len=3, residue_mode='huber')
    w_plain = link.residue_weight.copy()
    inlier = np.ones(len(pts), bool)
    inlier[17] = False
    # coherent matches survive far better under the smoothed mode
    assert w_smooth[inlier].mean() > w_plain[inlier].mean() + 0.2
    # the incoherent outlier is damped hard in both
    assert w_smooth[17] < 0.35 and w_plain[17] < 0.2

    # incoherent (random) residues -> low autocorrelation
    noise = rng.normal(0, 5.0, pts.shape)
    link2 = Link.from_coordinates(m0, m1, pts, pts + noise,
                                  gear=(const.MESH_GEAR_INITIAL,) * 2)
    assert link2.spatial_autocorrelation() < 0.45


def _rigid_fit_angle(q, u):
    """Least-squares infinitesimal rotation angle of displacement u over
    centered reference coords q."""
    q = q - q.mean(axis=0)
    u = u - u.mean(axis=0)
    num = float(np.sum(q[:, 0] * u[:, 1] - q[:, 1] * u[:, 0]))
    den = float(np.sum(q ** 2))
    return num / max(den, 1e-12)


@pytest.mark.parametrize('path', ['fused', 'general'])
def test_fully_free_solve_deflates_rigid_modes(workdir, rng, path):
    """A montage with NO locked mesh must not buy residue reduction with
    a whole-section rotation: the rotation direction has near-zero
    curvature (only the FIXED-frame anchor mismatches resist it) but a
    noise-driven gradient, so without deflation the linearized solve
    rotates the section by degrees (reference guard: extra-DOF removal
    for unlocked components, optimizer.py:1362-1377)."""
    from feabas_tpu.optimizer import SLM
    from feabas_tpu import constant as const

    def build():
        slm = SLM([
            _tile_mesh((0, 0, 200, 180), 0, mesh_size=90),
            _tile_mesh((140, 0, 340, 180), 1, mesh_size=90),
        ])
        # true placement of tile1 differs from its stage frame by
        # (-1.0, +1.5); links carry 0.3 px measurement noise -- the
        # correlated-noise regime where the spurious-rotation gradient
        # is strongest
        pts = _grid_pts((140, 0, 199, 180), n=6)
        noise = rng.normal(0, 0.3, pts.shape)
        slm.add_link_from_coordinates(
            0, 1, pts + noise, pts + [1.0, -1.5],
            gear=(const.MESH_GEAR_INITIAL, const.MESH_GEAR_INITIAL))
        return slm

    slm = build()
    if path == 'fused':
        c0, c1 = slm.optimize_linear(stiffness_lambda=-1.0,
                                     crosslink_lambda=-1.0, tol=1e-10)
        assert slm._last_solve_fused
    else:
        c0, c1 = slm.optimize_linear(stiffness_lambda=0.25,
                                     crosslink_lambda=1.0, tol=1e-10)
        assert not slm._last_solve_fused
    assert c1 <= c0 + 1e-9
    disps = []
    for m in slm.meshes:
        q = m.vertices_w_offset('FIXED')
        u = m.vertices_w_offset('MOVING') - q
        # no per-tile rotation/dilation: displacement is a translation
        # to sub-noise accuracy
        # pre-fix the solve rotated the section by ~0.08 rad
        # (>10 px ptp); post-fix only the noise-scale elastic
        # response remains
        assert np.ptp(u, axis=0).max() < 2.0, u
        assert abs(_rigid_fit_angle(q, u)) < 5e-3
        disps.append(u.mean(axis=0))
    # relative placement recovered (stage error was (-1.0, +1.5))
    rel = disps[1] - disps[0]
    assert np.allclose(rel, [-1.0, 1.5], atol=0.5), rel
    # deflation pins the free component: no net drift of the section
    assert np.abs(np.concatenate(
        [m.vertices_w_offset('MOVING') - m.vertices_w_offset('FIXED')
         for m in slm.meshes]).mean(axis=0)).max() < 0.75


def test_flag_outcasts_clears_and_idempotent(workdir):
    """A prior is_outcast flag must clear once a path to an anchor exists,
    and repeated calls on a lock-free system must be stable (majority
    rule), not escalate to all-outcast."""
    from feabas_tpu.optimizer import SLM
    from feabas_tpu import constant as const

    def chain(n, locked0=True):
        ms = [_tile_mesh((120 * i, 0, 120 * i + 100, 100), i, mesh_size=60)
              for i in range(n)]
        ms[0].locked = locked0
        slm = SLM(ms)
        pts = _grid_pts((0, 0, 100, 100), n=3)
        for i in range(n - 1):
            slm.add_link_from_coordinates(
                i, i + 1, pts, pts,
                gear=(const.MESH_GEAR_INITIAL,) * 2)
        return slm

    # previously flagged mesh connected to an anchor -> flag clears
    slm = chain(3, locked0=True)
    slm.meshes[2].is_outcast = True
    out = slm.flag_outcasts()
    assert out.tolist() == [False, False, False]
    assert not slm.meshes[2].is_outcast

    # lock-free with prior flags: majority rule, idempotent
    slm2 = chain(3, locked0=False)
    iso = _tile_mesh((1000, 0, 1100, 100), 9, mesh_size=60)
    slm2.add_meshes([iso]) if hasattr(slm2, 'add_meshes') else \
        slm2.meshes.append(iso)
    first = slm2.flag_outcasts()
    second = slm2.flag_outcasts()
    assert first.tolist() == [False, False, False, True]
    assert second.tolist() == first.tolist()
