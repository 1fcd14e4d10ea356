"""Matcher pipeline against synthetic ground truth."""

import numpy as np
import pytest

from synthutil import texture, tile_grid, warped_pair


def test_global_translation_matcher(rng, workdir):
    from feabas_tpu.matcher import global_translation_matcher
    img = texture(rng, 200, 240).astype(np.float32)
    img1 = np.roll(img, (8, -5), axis=(0, 1))
    dx, dy, conf = global_translation_matcher(img, img1, sigma=2.0)
    assert abs(dx - (-5)) <= 0.51 and abs(dy - 8) <= 0.51
    assert conf > 0.2


def test_stitching_matcher_translation_pair(rng, workdir):
    """Two tiles cut from one texture with a known offset: matches must
    map points to the same world location within a fraction of a pixel."""
    from feabas_tpu.matcher import stitching_matcher
    world = texture(rng, 300, 420)
    # tile0 at (0,0), tile1 at (180, 7) with 120px horizontal overlap
    t0 = world[0:280, 0:300]
    off1 = np.array([180, 7])
    t1 = world[7:287, 180:480 - 60]
    match = stitching_matcher(t0, t1, sigma=2.5, conf_thresh=0.25)
    assert match is not None
    assert match.xy0.shape[0] >= 4
    # xy0 (in t0 frame) should equal xy1 (in t1 frame) + off1
    err = match.xy0 - (match.xy1 + off1)
    med = np.median(np.abs(err), axis=0)
    assert (med < 0.6).all(), (med, err)


def test_stitching_matcher_rejects_unrelated(rng, workdir):
    from feabas_tpu.matcher import stitching_matcher
    a = texture(rng, 200, 200)
    b = texture(np.random.default_rng(999), 200, 200)
    match = stitching_matcher(a, b, sigma=2.5, conf_thresh=0.4)
    assert match is None or match.xy0.shape[0] < 4


def test_iterative_matcher_recovers_smooth_warp(rng, workdir):
    """img1 is a smoothly warped copy of img0: recovered correspondences
    must satisfy the analytic displacement field."""
    from feabas_tpu.matcher import iterative_xcorr_matcher_w_mesh
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import StreamLoader
    from feabas_tpu import config
    h = w = 320
    img0, img1, disp_fn = warped_pair(rng, h, w, amp=3.0, period=120.0)
    mesh0 = Mesh.from_bbox((0, 0, w, h), cartesian=True, mesh_size=60,
                           uid=0, locked=True)
    mesh1 = Mesh.from_bbox((0, 0, w, h), cartesian=True, mesh_size=60, uid=1,
                           soft_factor=1.0 / config.MATCH_SOFTFACTOR_DOMINANCE)
    match = iterative_xcorr_matcher_w_mesh(
        mesh0, mesh1, StreamLoader(img0), StreamLoader(img1),
        spacings=[100, 50, 25], sigma=2.5, conf_thresh=0.25,
        min_boundary_distance=30)
    assert match is not None and match.xy0.shape[0] >= 9
    # ground truth: point p in img1 shows img0 content at p + disp(p),
    # so xy0 ~ xy1 + disp(xy1)
    want = match.xy1 + disp_fn(match.xy1)
    err = np.linalg.norm(match.xy0 - want, axis=-1)
    assert np.median(err) < 0.8, (np.median(err), np.quantile(err, 0.9))
    assert match.strain < 0.2


def test_distributor_cartesian():
    from feabas_tpu.matcher import distributor_cartesian_bbox
    pts = distributor_cartesian_bbox((0, 0, 400, 200), 100, 100)
    assert pts.shape == (8, 2)
    assert (pts[:, 0] > 0).all() and (pts[:, 0] < 400).all()
    pts2 = distributor_cartesian_bbox((0, 0, 400, 200), 100, 100,
                                      min_boundary_distance=90)
    assert pts2.shape[0] < pts.shape[0]
    assert distributor_cartesian_bbox((0, 0, 10, 10), 100, 100,
                                      min_boundary_distance=20).shape[0] == 0


def test_block_vote_fallback_off_center(rng, workdir):
    """Regression: when the divided-block fallback wins with an off-center
    block, the block-center correction must use (img_center - block_center),
    not the reverse sign (round-1 advisor finding)."""
    from feabas_tpu.matcher import global_translation_matcher
    # content concentrated in one corner so the winning block is off-center,
    # with flat noise elsewhere so the whole-image xcorr is low-confidence
    h, w = 256, 320
    img0 = rng.normal(0, 0.05, (h, w)).astype(np.float32)
    patch = texture(rng, 64, 64).astype(np.float32)
    img0[176:240, 232:296] = patch  # bottom-right corner block
    gt = (-9, 11)  # (dx, dy) ground truth; img1 = roll(img0, (dy, dx))
    img1 = np.roll(np.roll(img0, gt[1], axis=0), gt[0], axis=1)
    dx, dy, conf = global_translation_matcher(
        img0, img1, sigma=2.0, conf_thresh=2.0, divide_factor=4)
    assert abs(dx - gt[0]) <= 1.0 and abs(dy - gt[1]) <= 1.0, (dx, dy, conf)
