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


def test_distribute_matching_blocks_region_aware(rng, workdir):
    """Centers land only where BOTH meshes have coverage: with an L-shaped
    mesh1 (top-right quadrant removed), no block centers fall in the
    missing quadrant even though it is inside the bbox intersection."""
    from feabas_tpu.matcher import distribute_matching_blocks
    from feabas_tpu.mesh import Mesh
    m0 = Mesh.from_bbox((0, 0, 200, 200), cartesian=True, mesh_size=25, uid=0)
    m1 = Mesh.from_bbox((0, 0, 200, 200), cartesian=True, mesh_size=25, uid=1)
    cent = m1.triangle_centers('INITIAL')
    keep = ~((cent[:, 0] > 100) & (cent[:, 1] > 100))
    m1 = m1.submesh(keep)
    for m in (m0, m1):
        m.set_translation((0, 0))
    centers, factors = distribute_matching_blocks(m0, m1, 30,
                                                  distributor='cartesian_region')
    assert centers.shape[0] > 10
    in_hole = (centers[:, 0] > 110) & (centers[:, 1] > 110)
    assert not in_hole.any(), centers[in_hole]
    # triangulation distributor also works and stays out of the hole
    c2, _ = distribute_matching_blocks(m0, m1, 30,
                                       distributor='intersect_triangulation')
    assert c2.shape[0] > 10
    assert not ((c2[:, 0] > 110) & (c2[:, 1] > 110)).any()


def test_distribute_matching_blocks_refine_material(rng, workdir):
    """Materials with area_constraint < 1 get denser, smaller blocks."""
    from feabas_tpu.matcher import distribute_matching_blocks
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.material import Material, MaterialTable
    mt = MaterialTable()
    mt.add('refine_wrinkle', Material(area_constraint=0.25, mask_label=50))
    m0 = Mesh.from_bbox((0, 0, 200, 200), cartesian=True, mesh_size=25,
                        uid=0, material_table=mt)
    m1 = Mesh.from_bbox((0, 0, 200, 200), cartesian=True, mesh_size=25,
                        uid=1, material_table=mt)
    # left half of m0 is the refine material
    cent = m0.triangle_centers('INITIAL')
    ids = m0.material_ids.copy()
    ids[cent[:, 0] < 100] = mt['refine_wrinkle'].uid
    m0._material_ids = ids
    for m in (m0, m1):
        m.set_translation((0, 0))
    centers, factors = distribute_matching_blocks(m0, m1, 40)
    left = centers[:, 0] < 90
    right = centers[:, 0] > 110
    assert left.sum() > 2 * right.sum(), (left.sum(), right.sum())
    # refined blocks are smaller (factor = af**refine_box_exp = 0.5)
    assert factors[left].min() < 0.75
    assert np.allclose(factors[right], 1.0)


def test_spacing_schedule_enlarges_for_large_offset(rng, workdir):
    """When the true displacement exceeds what the coarsest spacing can
    measure, the schedule runs an enlarged-block round first and still
    converges (reference enlarge logic, matcher.py:690-699)."""
    from feabas_tpu.matcher import iterative_xcorr_matcher_w_mesh
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import StreamLoader
    from feabas_tpu import config
    h = w = 256
    img0 = texture(rng, h, w)
    shift = (30, -22)
    img1 = np.roll(np.roll(img0, shift[1], axis=0), shift[0], axis=1)
    mesh0 = Mesh.from_bbox((0, 0, w, h), cartesian=True, mesh_size=60,
                           uid=0, locked=True)
    mesh1 = Mesh.from_bbox((0, 0, w, h), cartesian=True, mesh_size=60, uid=1,
                           soft_factor=1.0 / config.MATCH_SOFTFACTOR_DOMINANCE)
    # spacings far too small for a 37px offset; rely on enlarge + dwell
    match = iterative_xcorr_matcher_w_mesh(
        mesh0, mesh1, StreamLoader(img0), StreamLoader(img1),
        spacings=[60, 40], sigma=2.5, conf_thresh=0.25, allow_dwell=1,
        min_boundary_distance=45)
    assert match is not None and match.xy0.shape[0] >= 4
    err = (match.xy1 - match.xy0) - np.asarray(shift)
    med = np.median(np.abs(err), axis=0)
    assert (med < 0.75).all(), med


def test_section_matcher_splits_disconnected_pieces(rng, workdir):
    """Two disconnected pieces moving differently: each piece's matches
    must recover its own translation (reference matcher.py:370-430)."""
    from feabas_tpu.matcher import section_matcher
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import StreamLoader
    from feabas_tpu import config
    h, w = 200, 420
    img0 = texture(rng, h, w)
    img1 = np.empty_like(img0)
    # left piece shifts (+6, +3); right piece shifts (-5, +7); 20px gap
    img1[:, :200] = np.roll(np.roll(img0[:, :200], 3, axis=0), 6, axis=1)
    img1[:, 220:] = np.roll(np.roll(img0[:, 220:], 7, axis=0), -5, axis=1)
    img1[:, 200:220] = 0
    def two_piece_mesh(uid, **kw):
        m = Mesh.from_bbox((0, 0, w, h), cartesian=True, mesh_size=30,
                           uid=uid, **kw)
        cent = m.triangle_centers('INITIAL')
        m2 = m.submesh(np.abs(cent[:, 0] - 210) > 25)
        m2.set_translation((0, 0))
        return m2
    mesh0 = two_piece_mesh(0, locked=True)
    mesh1 = two_piece_mesh(1, soft_factor=1.0 / config.MATCH_SOFTFACTOR_DOMINANCE)
    assert mesh0.num_connected == 2
    match = section_matcher(mesh0, mesh1, StreamLoader(img0), StreamLoader(img1),
                            spacings=[50, 25], sigma=2.5, conf_thresh=0.25,
                            min_boundary_distance=12,
                            distributor='cartesian_region')
    assert match is not None
    d = match.xy1 - match.xy0
    left = match.xy0[:, 0] < 200
    right = ~left
    assert left.sum() >= 3 and right.sum() >= 3
    err_l = np.median(np.abs(d[left] - [6, 3]), axis=0)
    err_r = np.median(np.abs(d[right] - [-5, 7]), axis=0)
    assert (err_l < 0.75).all(), err_l
    assert (err_r < 0.75).all(), err_r


def test_distributor_excludes_soft_materials(rng, workdir):
    """stiffness_multiplier_threshold / render_weight_threshold keep block
    centers off wrinkle/split materials (reference: matcher.py:938-944)."""
    from feabas_tpu.matcher import distribute_matching_blocks
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.material import Material, MaterialTable
    mt = MaterialTable()
    mt.add('wrinkle', Material(stiffness_multiplier=0.01, mask_label=40))
    m0 = Mesh.from_bbox((0, 0, 200, 200), cartesian=True, mesh_size=25,
                        uid=0, material_table=mt)
    m1 = Mesh.from_bbox((0, 0, 200, 200), cartesian=True, mesh_size=25,
                        uid=1, material_table=mt)
    cent = m0.triangle_centers('INITIAL')
    ids = m0.material_ids.copy()
    ids[(cent[:, 0] > 80) & (cent[:, 0] < 120)] = mt['wrinkle'].uid
    m0._material_ids = ids
    for m in (m0, m1):
        m.set_translation((0, 0))
    c_all, _ = distribute_matching_blocks(m0, m1, 25, refine_mode=0)
    c_thr, _ = distribute_matching_blocks(
        m0, m1, 25, refine_mode=0, stiffness_multiplier_threshold=0.1)
    in_band = lambda c: ((c[:, 0] > 85) & (c[:, 0] < 115)).sum()
    assert in_band(c_all) > 0
    assert in_band(c_thr) == 0
    assert c_thr.shape[0] > 10


def test_fused_fine_matcher_parity(rng, workdir):
    """The one-dispatch fused fine loop (ops/match_loop) engages for the
    stitching case and agrees with the classic per-round path on a warped
    pair and exactly on a pure translation."""
    from feabas_tpu.matcher import iterative_xcorr_matcher_w_mesh
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import StreamLoader
    from feabas_tpu import config
    from synthutil import texture, warped_pair

    h = w = 320
    img0 = texture(rng, h, w)
    sh = (4, -3)
    img1 = np.roll(np.roll(img0, -sh[1], axis=0), -sh[0], axis=1)

    def run(i0, i1, fused):
        m0 = Mesh.from_bbox((0, 0, w, h), cartesian=True, mesh_size=60,
                            uid=0, locked=True)
        m1 = Mesh.from_bbox((0, 0, w, h), cartesian=True, mesh_size=60,
                            uid=1,
                            soft_factor=1.0 / config.MATCH_SOFTFACTOR_DOMINANCE)
        return iterative_xcorr_matcher_w_mesh(
            m0, m1, StreamLoader(i0), StreamLoader(i1),
            spacings=[100, 50, 25], sigma=2.5, conf_thresh=0.25,
            min_boundary_distance=30, fused_rounds=fused)

    m_f = run(img0, img1, True)
    err = np.linalg.norm(m_f.xy0 - (m_f.xy1 + sh), axis=-1)
    assert m_f.xy0.shape[0] >= 25
    assert np.median(err) < 0.05, np.median(err)

    img0w, img1w, disp_fn = warped_pair(rng, h, w, amp=3.0, period=120.0)
    m_c = run(img0w, img1w, False)
    m_f = run(img0w, img1w, True)
    for m in (m_c, m_f):
        e = np.linalg.norm(m.xy0 - (m.xy1 + disp_fn(m.xy1)), axis=-1)
        assert np.median(e) < 0.8, np.median(e)
    # the two paths must land on comparable match sets and strains
    assert abs(m_f.xy0.shape[0] - m_c.xy0.shape[0]) <= 0.25 * m_c.xy0.shape[0]
    assert m_f.strain == pytest.approx(m_c.strain, rel=0.3)


def test_stage_prior_one_dispatch_path(rng, workdir):
    """stage_prior skips the host coarse stage: the residual is measured
    and applied inside the fused program; matches recover the truth."""
    from feabas_tpu.matcher import stitching_matcher
    from synthutil import texture

    h, w = 384, 420
    img0 = texture(rng, h, w)
    sh = (9, -6)
    img1 = np.roll(np.roll(img0, -sh[1], axis=0), -sh[0], axis=1)
    # truth: xy0 = xy1 + sh; give a prior off by a few px (stage jitter)
    m = stitching_matcher(img0, img1, stage_prior=(sh[0] + 2.0, sh[1] - 3.0),
                          conf_thresh=0.25, coarse_downsample=0.5,
                          spacings=[100, 50], min_boundary_distance=20)
    assert m is not None and m.xy0.shape[0] >= 9
    err = np.linalg.norm(m.xy0 - (m.xy1 + sh), axis=-1)
    assert np.median(err) < 0.1, np.median(err)

    # a hopeless prior (content off-screen) must fall back to the classic
    # host-coarse path and still succeed
    m2 = stitching_matcher(img0, img1, stage_prior=(500.0, 500.0),
                           conf_thresh=0.25, coarse_downsample=0.5,
                           spacings=[100, 50], min_boundary_distance=20)
    assert m2 is not None and m2.xy0.shape[0] >= 9
    err2 = np.linalg.norm(m2.xy0 - (m2.xy1 + sh), axis=-1)
    assert np.median(err2) < 0.1, np.median(err2)


def test_match_pairs_batched_parity(rng, workdir):
    """Batched one-dispatch matching returns results identical to the
    serial path; odd pairs fall back automatically."""
    from feabas_tpu.matcher import stitching_matcher, match_pairs_batched
    from synthutil import texture

    h, w = 384, 420
    jobs = []
    truths = []
    for k in range(4):
        img0 = texture(np.random.default_rng(k), h, w)
        sh = (5 + k, -3 - k)
        img1 = np.roll(np.roll(img0, -sh[1], axis=0), -sh[0], axis=1)
        kw = dict(stage_prior=(sh[0] + 2.0, sh[1] - 1.5), conf_thresh=0.25,
                  coarse_downsample=0.5, spacings=[100, 50],
                  min_boundary_distance=20)
        jobs.append((img0, img1, kw))
        truths.append(sh)
    # one job without a prior exercises the fallback leg
    img0 = texture(np.random.default_rng(9), h, w)
    sh = (4, 6)
    img1 = np.roll(np.roll(img0, -sh[1], axis=0), -sh[0], axis=1)
    jobs.append((img0, img1, dict(conf_thresh=0.25, coarse_downsample=0.5,
                                  spacings=[100, 50],
                                  min_boundary_distance=20)))
    truths.append(sh)

    res_b = match_pairs_batched(jobs, max_batch=3)
    for (i0, i1, kw), mb, sh in zip(jobs, res_b, truths):
        ms = stitching_matcher(i0, i1, **kw)
        assert mb is not None and ms is not None
        assert mb.xy0.shape == ms.xy0.shape
        np.testing.assert_allclose(np.sort(mb.xy0, axis=0),
                                   np.sort(ms.xy0, axis=0), atol=1e-5)
        err = np.median(np.linalg.norm(mb.xy0 - (mb.xy1 + sh), axis=-1))
        assert err < 0.1, err


def test_env_interior_flags():
    """_env_interior marks exactly the blocks whose whole source read
    window (affine corners +- K+4) sits inside the valid extents."""
    from feabas_tpu.matcher import _env_interior
    bs, K = 64, 8
    A = np.tile(np.eye(2), (3, 1, 1))
    b = np.zeros((3, 2))
    # valid region 256x256; margin needed = K+4 = 12
    origins = np.array([[100.0, 100.0],    # interior
                        [5.0, 100.0],      # too close to x=0
                        [100.0, 256 - bs - 5.0]])  # too close to y=H
    ok = _env_interior(origins, bs, K, A, b, (256, 256))
    assert ok.tolist() == [True, False, False]
    # a 2x-scale affine doubles the source footprint
    A2 = np.tile(2 * np.eye(2), (1, 1, 1))
    ok2 = _env_interior(np.array([[60.0, 60.0]]), bs, K, A2,
                        np.zeros((1, 2)), (256, 256))
    ok3 = _env_interior(np.array([[60.0, 60.0]]), bs, K, A2,
                        np.zeros((1, 2)), (300, 300))
    assert ok2.tolist() == [False] and ok3.tolist() == [True]


def test_match_pairs_batched_shards_over_devices(workdir, monkeypatch):
    """On a multi-device host the batched dispatch's pair axis lands
    sharded across the mesh (data-parallel stitch matching)."""
    import jax
    from feabas_tpu import matcher
    from feabas_tpu.ops import match_loop
    from synthutil import texture
    assert jax.device_count() >= 8  # conftest provides 8 virtual devices
    captured = {}
    orig = match_loop.fused_rounds_batched

    def spy(src0, *a, **k):
        captured['ndev'] = len(src0.sharding.device_set)
        return orig(src0, *a, **k)

    monkeypatch.setattr(match_loop, 'fused_rounds_batched', spy)
    h, w = 384, 420
    jobs = []
    for k in range(8):
        img0 = texture(np.random.default_rng(k), h, w)
        sh = (5 + (k % 3), -3 - (k % 2))
        img1 = np.roll(np.roll(img0, -sh[1], axis=0), -sh[0], axis=1)
        jobs.append((img0, img1,
                     dict(stage_prior=(sh[0] + 1.0, sh[1] - 1.0),
                          conf_thresh=0.25, coarse_downsample=0.5,
                          spacings=[100, 50], min_boundary_distance=20)))
    res = matcher.match_pairs_batched(jobs)
    assert all(m is not None for m in res)
    assert captured.get('ndev') == 8, captured
