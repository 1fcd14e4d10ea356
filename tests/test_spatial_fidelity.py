"""Raster-geometry fidelity property suite (round-3 VERDICT #9).

Analytic shapes — a disk, a sharp wedge, a thin wrinkle sliver —
rasterized at production mask scales (thumbnail masks are 500-4000 px
for whole sections), pushed through Geometry -> shared-arc boundary
extraction -> conforming mesh, with quantitative bounds:

- boundary Hausdorff error vs the analytic shape bounded by
  simplify_tol + 1 mask px (pixel quantization allowance), BOTH
  directions, across tolerance settings;
- per-material area error bounded by 0.5 mask px of systematic
  boundary shift (|A_poly - A_true| <= 0.5 * perimeter) — zigzag noise
  cancels in area, a systematic half-pixel bias does not;
- the same bounds survive the world transform (scale=64: 1 mask px is
  ~100 nm x 64 at production thumbnail resolution).

Reference fidelity role: feabas/spatial.py:900-1260 keeps shapely
polygons exact and simplifies with topology sharing; this suite pins
the raster-backed equivalent to sub-pixel behavior so mask-grid
quantization regressions fail loudly.
"""

import numpy as np
import pytest

from feabas_tpu import material
from feabas_tpu.spatial import Geometry

H, W = 1200, 1600                     # production-scale thumbnail mask
CENTER = np.array([790.7, 598.3])     # deliberately off-lattice
RADIUS = 510.4
CAP_A = np.array([420.6, 860.2])      # wrinkle sliver: capsule axis
CAP_B = np.array([1180.3, 330.8])
CAP_W = 5.0                           # full width in mask px (thin)
WEDGE_APEX = np.array([300.2, 600.6])
WEDGE_ANG = np.deg2rad(30.0)          # full opening angle
WEDGE_LEN = 900.0


def _pixel_centers():
    yy, xx = np.mgrid[0:H, 0:W]
    return xx.astype(np.float64), yy.astype(np.float64)


def _seg_dist(pts, a, b):
    """Distance from (N,2) points to segment a-b."""
    ab = b - a
    t = np.clip(((pts - a) @ ab) / (ab @ ab), 0.0, 1.0)
    proj = a + t[:, None] * ab
    return np.linalg.norm(pts - proj, axis=1)


def _poly_dist(pts, poly, closed=True):
    """Distance from (N,2) points to a polyline's segments (chunked)."""
    segs = np.stack([poly, np.roll(poly, -1, axis=0)], axis=1) if closed \
        else np.stack([poly[:-1], poly[1:]], axis=1)
    out = np.full(pts.shape[0], np.inf)
    for k in range(0, segs.shape[0], 512):
        a = segs[k:k + 512, 0][None]          # (1,S,2)
        b = segs[k:k + 512, 1][None]
        ab = b - a
        denom = (ab * ab).sum(-1)
        denom = np.where(denom > 0, denom, 1.0)
        t = np.clip(((pts[:, None] - a) * ab).sum(-1) / denom, 0.0, 1.0)
        proj = a + t[..., None] * ab
        d = np.linalg.norm(pts[:, None] - proj, axis=-1).min(axis=1)
        out = np.minimum(out, d)
    return out


def _densify(poly, closed=True, spacing=0.75):
    """Sample points along a polyline at <= spacing intervals."""
    p = np.vstack([poly, poly[:1]]) if closed else poly
    out = []
    for i in range(len(p) - 1):
        a, b = p[i], p[i + 1]
        n = max(int(np.ceil(np.linalg.norm(b - a) / spacing)), 1)
        t = np.arange(n) / n
        out.append(a + t[:, None] * (b - a))
    out.append(p[-1:])
    return np.concatenate(out, axis=0)


def _shoelace(poly):
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _make_table():
    t = material.MaterialTable()
    t.add('wrinkle', material.Material(uid=2, mask_label=50))
    return t


def _disk_sliver_mask():
    """Disk ROI (label 0) with a thin capsule wrinkle (label 50)."""
    xx, yy = _pixel_centers()
    pts = np.stack([xx.ravel(), yy.ravel()], -1)
    mask = np.full((H, W), 255, np.uint8)
    inside = np.linalg.norm(pts - CENTER, axis=1) <= RADIUS
    mask.ravel()[inside] = 0
    slv = _seg_dist(pts, CAP_A, CAP_B) <= CAP_W / 2
    mask.ravel()[slv & inside] = 50
    return mask


def _wedge_mask():
    """Sharp wedge (isoceles triangle, 30 deg apex) pointing -x."""
    d = np.array([np.cos(WEDGE_ANG / 2), np.sin(WEDGE_ANG / 2)])
    p1 = WEDGE_APEX + WEDGE_LEN * np.array([d[0], d[1]])
    p2 = WEDGE_APEX + WEDGE_LEN * np.array([d[0], -d[1]])
    tri = np.array([WEDGE_APEX, p1, p2])
    xx, yy = _pixel_centers()
    pts = np.stack([xx.ravel(), yy.ravel()], -1)
    inside = np.ones(pts.shape[0], bool)
    for i in range(3):
        a, b = tri[i], tri[(i + 1) % 3]
        n = np.array([-(b - a)[1], (b - a)[0]])
        inside &= ((pts - a) @ n) <= 1e-9
    mask = np.full((H, W), 255, np.uint8)
    mask.ravel()[inside] = 0
    return mask, tri


def _roi_rings(geom, tol):
    from feabas_tpu.spatial import mask_to_contours
    rings = mask_to_contours(geom.roi_mask(), simplify_tol=tol)
    return [r * geom.scale + geom.offset for r, _hole in rings]


@pytest.mark.parametrize('tol', [0.5, 2.0])
@pytest.mark.parametrize('scale', [1.0, 64.0])
def test_disk_boundary_hausdorff(tol, scale):
    geom = Geometry(_disk_sliver_mask(), material_table=_make_table(),
                    scale=scale, offset=(37.0, -12.0))
    rings = _roi_rings(geom, tol)
    assert len(rings) == 1
    # back to mask-pixel units so the bound is resolution-independent
    ring = (rings[0] - geom.offset) / geom.scale
    bound = tol + 1.0
    # polygon -> analytic circle
    samp = _densify(ring)
    d_pa = np.abs(np.linalg.norm(samp - CENTER, axis=1) - RADIUS)
    assert d_pa.max() <= bound, d_pa.max()
    # analytic circle -> polygon
    th = np.linspace(0, 2 * np.pi, 4096, endpoint=False)
    circ = CENTER + RADIUS * np.stack([np.cos(th), np.sin(th)], -1)
    d_ap = _poly_dist(circ, ring)
    assert d_ap.max() <= bound, d_ap.max()
    # area: rasterization bias under 0.5 px of boundary shift, plus the
    # intrinsic chordal bias of simplifying a CONVEX curve — a chord at
    # max deviation tol sits (2/3) tol inside the arc on average
    a_err = abs(_shoelace(ring) - np.pi * RADIUS ** 2)
    assert a_err <= (0.5 + 2 * tol / 3) * (2 * np.pi * RADIUS), a_err


@pytest.mark.parametrize('tol', [0.5, 2.0])
def test_wedge_boundary_hausdorff(tol):
    mask, tri = _wedge_mask()
    geom = Geometry(mask, material_table=_make_table())
    rings = _roi_rings(geom, tol)
    assert len(rings) == 1
    ring = rings[0]
    bound = tol + 1.0
    samp = _densify(ring)
    d_pa = _poly_dist(samp, tri)
    assert d_pa.max() <= bound, d_pa.max()
    # analytic -> polygon: the rasterized tip legitimately stops where
    # the wedge thins below one pixel (no centers inside); points closer
    # to the apex than that attrition length are exempt
    tip_allow = 0.5 / np.tan(WEDGE_ANG / 2) + bound
    edge = _densify(tri, spacing=0.5)
    d_ap = _poly_dist(edge, ring)
    near_tip = np.linalg.norm(edge - WEDGE_APEX, axis=1) <= tip_allow
    assert d_ap[~near_tip].max() <= bound, d_ap[~near_tip].max()
    # even at the tip the error is bounded by the attrition length
    assert d_ap.max() <= tip_allow + 1.0, d_ap.max()
    a_err = abs(_shoelace(ring) - _shoelace(tri))
    perim = np.linalg.norm(np.roll(tri, -1, 0) - tri, axis=1).sum()
    # tip attrition removes ~tip_allow^2*tan(half) of area on top of the
    # 0.5 px boundary-shift budget
    assert a_err <= 0.5 * perim + tip_allow ** 2 * np.tan(WEDGE_ANG / 2)


@pytest.mark.parametrize('wr_tol', [0.1, 0.5])
def test_sliver_arcs_and_per_material_tolerance(wr_tol):
    """The thin wrinkle capsule keeps a tight boundary under a
    per-material tolerance dict even when the ROI simplifies coarsely."""
    geom = Geometry(_disk_sliver_mask(), material_table=_make_table())
    arcs = geom.boundary_arcs(simplify_tol={'default': 2.0,
                                            'wrinkle': wr_tol})
    wl = 50
    wr_arcs = [a for a in arcs if wl in a['labels'] and
               255 not in a['labels'] and -1 not in a['labels']]
    assert wr_arcs, 'sliver boundary arcs must exist'
    bound = wr_tol + 1.0
    for a in wr_arcs:
        samp = _densify(a['pts'], closed=a.get('closed', False))
        d = np.abs(_seg_dist(samp, CAP_A, CAP_B) - CAP_W / 2)
        assert d.max() <= bound, d.max()
    # full capsule covered: analytic boundary within bound of the arcs
    t = np.linspace(0, 1, 2048)
    axis = CAP_A + t[:, None] * (CAP_B - CAP_A)
    nrm = (CAP_B - CAP_A) / np.linalg.norm(CAP_B - CAP_A)
    perp = np.array([-nrm[1], nrm[0]])
    cap_pts = np.concatenate([axis + perp * CAP_W / 2,
                              axis - perp * CAP_W / 2])
    allpts = np.concatenate([_densify(a['pts'],
                                      closed=a.get('closed', False))
                             for a in wr_arcs])
    d_cap = np.array([np.linalg.norm(allpts - p, axis=1).min()
                      for p in cap_pts[::8]])
    assert d_cap.max() <= bound + 1.0, d_cap.max()


def test_mesh_per_material_areas():
    """Geometry -> shared-arc PSLG -> conforming CDT mesh: per-material
    triangle-area sums match the analytic areas to a 0.5 px boundary
    shift."""
    from feabas_tpu import native
    if not native.cdt_available():
        pytest.skip('native CDT unavailable')
    from feabas_tpu.triangulation import triangulate_geometry
    geom = Geometry(_disk_sliver_mask(), material_table=_make_table())
    v, t, uids = triangulate_geometry(
        geom, mesh_size=60.0, simplify_tol={'default': 1.0,
                                            'wrinkle': 0.25})
    p = v[t]
    areas = 0.5 * np.abs(
        (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
        - (p[:, 2, 0] - p[:, 0, 0]) * (p[:, 1, 1] - p[:, 0, 1]))
    wr_uid = geom.material_table['wrinkle'].uid
    a_wr = areas[uids == wr_uid].sum()
    a_all = areas.sum()
    cap_len = np.linalg.norm(CAP_B - CAP_A)
    # capsule clipped to the disk: both endpoints are interior here, so
    # the analytic area is the full capsule
    a_wr_true = CAP_W * cap_len + np.pi * (CAP_W / 2) ** 2
    cap_perim = 2 * cap_len + np.pi * CAP_W
    assert abs(a_wr - a_wr_true) <= 0.5 * cap_perim, \
        (a_wr, a_wr_true, 0.5 * cap_perim)
    a_disk_true = np.pi * RADIUS ** 2
    assert abs(a_all - a_disk_true) <= 0.5 * (2 * np.pi * RADIUS), \
        (a_all, a_disk_true)
