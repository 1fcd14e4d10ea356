"""Collision-aware point location (reference trifinder arbitration:
feabas/mesh.py:2080-2190): folded meshes resolve queries per mode, and
link building near a fold anchors to the correct sheet."""

import numpy as np


def _folded_mesh():
    """Base sheet x in (0, 80) stays rigid; the flap (x > 80) reflects
    over it with a 1.5x stretch, covering x in (-20, 40)."""
    from feabas_tpu.mesh import Mesh
    m = Mesh.from_bbox((0, 0, 120, 60), cartesian=True, mesh_size=20)
    v = m.vertices('FIXED').copy()
    sel = v[:, 0] > 80
    v[sel, 0] = 160 - 1.5 * v[sel, 0]
    m.set_vertices(v, 'MOVING')
    cent = m.vertices_w_offset('INITIAL')[m.triangles].mean(axis=1)
    flap = np.nonzero(cent[:, 0] > 80)[0]
    return m, set(flap.tolist())


def test_tri_finder_least_deform_picks_rigid_sheet(workdir):
    m, flap = _folded_mesh()
    pts = np.stack([np.linspace(5, 35, 7), np.full(7, 30.0)], -1)
    tid = m.tri_finder(pts, gear='MOVING', mode='LEAST_DEFORM')
    assert (tid >= 0).all()
    assert not any(int(t) in flap for t in tid), tid


def test_tri_finder_innermost_prefers_interior(workdir):
    m, flap = _folded_mesh()
    # INNERMOST weights by INITIAL boundary distance: interior triangles
    # beat boundary ones; all queried points must still resolve
    pts = np.stack([np.linspace(5, 35, 7), np.full(7, 30.0)], -1)
    tid_i = m.tri_finder(pts, gear='MOVING', mode='INNERMOST')
    assert (tid_i >= 0).all()
    w = m.trifinder_weights('INNERMOST', gear='MOVING')
    tid_w = m.tri_finder(pts, gear='MOVING')   # WHATEVER: first hit
    # the arbitrated pick never has lower weight than the default pick
    assert (w[tid_i] >= w[tid_w] - 1e-12).all()


def test_likely_collisions_fast_indicator(workdir):
    from feabas_tpu.mesh import Mesh
    m, _ = _folded_mesh()
    assert m.likely_collisions('MOVING')
    assert not m.likely_collisions('INITIAL')
    smooth = Mesh.from_bbox((0, 0, 100, 100), cartesian=True, mesh_size=20)
    assert not smooth.likely_collisions('MOVING')


def test_link_building_near_fold_picks_correct_sheet(workdir):
    """Link.from_coordinates auto-arbitrates on folded meshes: match
    points in the two-sheet zone anchor to the rigid base sheet, so
    back-mapping through the link lands at the point's true INITIAL
    location (the flap would send it to x > 80)."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.optimizer import Link
    m0, flap = _folded_mesh()
    m1 = Mesh.from_bbox((0, 0, 120, 60), cartesian=True, mesh_size=20)
    pts = np.stack([np.linspace(5, 35, 7), np.full(7, 30.0)], -1)
    link = Link.from_coordinates(m0, m1, pts, pts,
                                 gear=('MOVING', 'MOVING'))
    assert not any(int(t) in flap for t in link._tid0)
    # anchored in the base sheet, the INITIAL-frame location equals the
    # MOVING query (base sheet is rigid)
    xy_init = m0.bary2cart(link._tid0, link._bary0, gear='INITIAL')
    assert np.abs(xy_init - pts).max() < 1e-6
