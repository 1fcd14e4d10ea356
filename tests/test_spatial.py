"""Geometry mutation / persistence / comparison API (mask-backed
equivalents of reference feabas/spatial.py:642-863)."""

import numpy as np
import pytest

from feabas_tpu import material
from feabas_tpu.spatial import Geometry


def make_table():
    t = material.MaterialTable()
    t.add('wrinkle', material.Material(uid=2, mask_label=50))
    t.add('hole', material.Material(uid=3, mask_label=100, enable_mesh=False))
    return t


def base_geometry(scale=1.0, offset=(0, 0)):
    mask = np.zeros((64, 64), np.uint8)
    mask[:4, :] = 255          # exclude band at the top
    mask[20:30, 20:30] = 50    # a wrinkle region
    return Geometry(mask, material_table=make_table(), offset=offset,
                    scale=scale)


def test_h5_roundtrip(tmp_path):
    g = base_geometry(scale=2.0, offset=(10.0, -5.0))
    g.resolution = 16.0
    path = str(tmp_path / 'geom.h5')
    g.save_to_h5(path)
    g2 = Geometry.from_h5(path, material_table=make_table())
    assert np.array_equal(g.label_mask, g2.label_mask)
    assert g2.scale == 2.0
    assert np.allclose(g2.offset, (10.0, -5.0))
    assert g2.resolution == 16.0
    # reconstructed geometry answers the same membership queries
    pts = np.array([[50.0, 45.0], [12.0, 0.0]])
    assert np.array_equal(g.label_at(pts), g2.label_at(pts))


def test_add_regions_union_and_replace():
    g = base_geometry()
    m = np.zeros((64, 64), bool)
    m[40:50, 40:50] = True
    g.add_regions({'wrinkle': m}, mode='u')
    assert (g.label_mask[45, 45] == 50) and (g.label_mask[25, 25] == 50)
    g.add_regions({'wrinkle': m}, mode='r')
    assert g.label_mask[25, 25] == 0       # old pixels reverted to default
    assert g.label_mask[45, 45] == 50
    # painting by raw label and z-order: later paint trumps
    g.add_regions({100: m}, mode='u')
    assert g.label_mask[45, 45] == 100


def test_add_regions_from_image_with_dilate():
    g = base_geometry()
    img = np.zeros((64, 64), np.uint8)
    img[10:12, 40:42] = 100
    g.add_regions_from_image(img, dilate=2.0)
    assert g.label_mask[11, 41] == 100
    assert g.label_mask[13, 41] == 100     # grown by ~2 px
    assert g.label_mask[25, 25] == 50      # existing region untouched


def test_modify_roi_modes():
    g = base_geometry()
    roi = np.zeros((64, 64), bool)
    roi[:, :32] = True
    g.modify_roi(roi, mode='i')
    assert g.label_mask[25, 25] == 50      # inside kept
    assert g.label_mask[25, 40] == 255     # right half excluded
    assert g.label_mask[2, 10] == 255      # old exclude stays out (intersect)
    g2 = base_geometry()
    g2.modify_roi(roi, mode='r')
    assert g2.label_mask[2, 10] == 0       # replace: newly in-ROI -> default
    g3 = base_geometry()
    g3.modify_roi(roi, mode='u')
    assert g3.label_mask[2, 40] == 255     # union keeps old exclusions outside
    assert g3.label_mask[2, 10] == 0       # but includes the new half


def test_commit_drops_small_components():
    g = base_geometry()
    g.label_mask[50, 50] = 50              # 1-px region speck
    g.label_mask[40:42, 5:7] = 50          # 4-px region blob
    # a 2-px ROI island disconnected from the main body
    g.label_mask[:6, :] = 255
    g.label_mask[1:3, 10] = 0
    g.commit(area_thresh=3.0)
    assert g.label_mask[50, 50] == 0       # speck absorbed into default
    assert (g.label_mask[40:42, 5:7] == 50).all()  # 4 px >= thresh stays
    assert (g.label_mask[1:3, 10] == 255).all()  # ROI island excluded
    assert g.label_mask[25, 25] == 50      # main region intact


def test_compare_iou():
    g0 = base_geometry()
    g1 = base_geometry()
    assert g0.compare(g1)['wrinkle'] == pytest.approx(1.0)
    # shift the region 5 px: 10x10 squares overlapping 5x10
    g1.label_mask[20:30, 20:30] = 0
    g1.label_mask[20:30, 25:35] = 50
    iou = g0.compare(g1)
    assert iou['wrinkle'] == pytest.approx(50.0 / 150.0)
    # different grid resamples: half-scale copy of g0 compares clean
    half = Geometry(g0.label_mask[::2, ::2], material_table=make_table(),
                    scale=2.0)
    iou2 = half.compare(g0)
    assert iou2['wrinkle'] > 0.8


def test_roi_erosion_and_dilate_kwargs():
    mask = np.full((32, 32), 255, np.uint8)
    mask[4:28, 4:28] = 0
    mask[14:18, 14:18] = 50
    g = Geometry(mask, material_table=make_table(), roi_erosion=2.0,
                 dilate=1.0)
    assert g.label_mask[5, 16] == 255      # ROI shrank inward
    assert g.label_mask[8, 16] == 0
    assert g.label_mask[13, 16] == 50      # region grew by 1 px
    # oor_label folds a sentinel label into exclude
    mask2 = np.zeros((16, 16), np.uint8)
    mask2[:, :4] = 7
    g2 = Geometry(mask2, material_table=make_table(), oor_label=7)
    assert (g2.label_mask[:, :4] == 255).all()


def test_collect_region_markers():
    g = base_geometry()
    g.label_mask[40:44, 50:54] = 50        # second wrinkle component
    markers = g.collect_region_markers()
    assert markers['wrinkle'].shape == (2, 2)
    assert g.label_at(markers['wrinkle'].reshape(-1, 2)).tolist() == [50, 50]
    assert 'default' in markers


def test_from_h5_stored_lut_is_authoritative(tmp_path):
    # a geometry saved under a CUSTOM material table reloads with the
    # stored name->label mapping even when the caller does not re-supply
    # the table (the file's LUT patches the default table)
    t = material.MaterialTable()
    t.add('wrinkle', material.Material(uid=2, mask_label=7))
    mask = np.zeros((16, 16), np.uint8)
    mask[4:8, 4:8] = 7
    g = Geometry(mask, material_table=t)
    path = str(tmp_path / 'custom.h5')
    g.save_to_h5(path)
    g2 = Geometry.from_h5(path)                 # no table passed
    assert g2.material_table['wrinkle'].mask_label == 7
    assert (g2.material_mask('wrinkle') == (mask == 7)).all()
    assert 'wrinkle' in g2.region_areas()


def test_roi_tol_override_loosens(tmp_path):
    # an EXPLICIT roi_tol must be able to LOOSEN the ROI simplification
    # even when the material tolerances are tight (min-of-both-sides
    # would otherwise veto it)
    rng = np.random.default_rng(0)
    mask = np.full((96, 96), 255, np.uint8)
    yy, xx = np.mgrid[:96, :96]
    r = 36 + 3 * np.sin(np.arctan2(yy - 48, xx - 48) * 7)
    mask[(xx - 48) ** 2 + (yy - 48) ** 2 < r ** 2] = 0
    g = Geometry(mask, material_table=make_table())

    def n_roi_pts(**kw):
        return sum(a['pts'].shape[0] for a in g.boundary_arcs(**kw)
                   if 255 in a['labels'] or -1 in a['labels'])

    tight = n_roi_pts(simplify_tol={'default': 0.1}, roi_tol=0.1)
    loose = n_roi_pts(simplify_tol={'default': 0.1}, roi_tol=8.0)
    assert loose < 0.5 * tight, (tight, loose)


def test_compare_mismatched_grid_matches_label_at():
    # the separable index resample must agree with the brute-force
    # label_at meshgrid route
    g0 = base_geometry(scale=1.0, offset=(0, 0))
    g1 = base_geometry(scale=2.0, offset=(3.0, -2.0))
    h, w = g0.label_mask.shape
    cc, rr = np.meshgrid(np.arange(w), np.arange(h))
    pts = np.stack([cc.ravel(), rr.ravel()], -1) * g0.scale + g0.offset
    om_ref = g1.label_at(pts).reshape(h, w)
    iou = g0.compare(g1)
    a = g0.label_mask == 50
    b = om_ref == 50
    expect = (a & b).sum() / max((a | b).sum(), 1)
    assert iou['wrinkle'] == pytest.approx(expect)
