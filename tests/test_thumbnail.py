"""Thumbnail keypoint/feature pipeline against synthetic transforms."""

import numpy as np
import pytest

from synthutil import texture


def _rotate(img, deg, scale=1.0):
    import cv2
    h, w = img.shape
    M = cv2.getRotationMatrix2D((w / 2, h / 2), deg, scale)
    return cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_REFLECT), M


def test_detect_extrema(rng, workdir):
    from feabas_tpu.thumbnail import detect_extrema_log
    img = texture(rng, 200, 200, blur=3)
    kp = detect_extrema_log(img, sigma=3.0, min_spacing=8, num_features=300)
    assert 50 < kp.num_points <= 300
    # respect mask
    mask = np.zeros((200, 200), bool)
    mask[:100] = True
    kp2 = detect_extrema_log(img, mask=mask, sigma=3.0, min_spacing=8)
    assert (kp2.xy[:, 1] < 104).all()


def test_lradon_matching_translation(rng, workdir):
    from feabas_tpu.thumbnail import match_two_thumbnails_LRadon
    img0 = texture(rng, 240, 240, blur=3)
    shift = (12, -7)
    img1 = np.roll(img0, (shift[1], shift[0]), axis=(0, 1))
    m = match_two_thumbnails_LRadon(img0, img1)
    assert m is not None and m.xy0.shape[0] >= 10
    d = m.xy0 - m.xy1
    # xy1 + d = xy0; content moved by +shift: feature at p in img0 is at
    # p + shift in img1 -> xy0 = xy1 - shift
    med = np.median(d, axis=0)
    assert np.allclose(med, [-shift[0], -shift[1]], atol=1.0), med


def test_lradon_matching_rotation(rng, workdir):
    from feabas_tpu.thumbnail import match_two_thumbnails_LRadon
    from feabas_tpu.spatial import fit_affine, apply_affine
    img0 = texture(rng, 260, 260, blur=3)
    img1, M = _rotate(img0, 30)
    m = match_two_thumbnails_LRadon(img0, img1)
    assert m is not None and m.xy0.shape[0] >= 8
    # matched pairs must satisfy the known rotation: img1(p1) == img0(p0)
    # with p0 = M @ [p1... actually warpAffine: dst(x,y)=src(M^-1 (x,y))
    A = np.vstack([M, [0, 0, 1]])
    Ainv = np.linalg.inv(A)
    p0_want = (np.c_[m.xy1, np.ones(len(m.xy1))] @ Ainv.T)[:, :2]
    err = np.linalg.norm(m.xy0 - p0_want, axis=-1)
    assert np.median(err) < 2.0, np.median(err)


def test_ransac_rejects_outliers(rng, workdir):
    from feabas_tpu.thumbnail import filter_match_global_ransac
    n = 60
    xy1 = rng.uniform(0, 200, (n, 2))
    T = np.eye(3)
    T[:2, :2] = [[0.98, 0.05], [-0.05, 1.01]]
    T[2, :2] = [10, -4]
    from feabas_tpu.spatial import apply_affine
    xy0 = apply_affine(xy1, T)
    xy0[:15] += rng.uniform(20, 60, (15, 2))  # outliers
    mask, T_est = filter_match_global_ransac(xy0, xy1, dis_tol=3)
    assert mask[15:].all() and not mask[:15].any()
    assert np.allclose(T_est, T, atol=0.05)


def test_pairwise_strain_filter(rng, workdir):
    from feabas_tpu.thumbnail import filter_match_pairwise_strain
    n = 50
    xy1 = rng.uniform(0, 300, (n, 2))
    xy0 = xy1 + [5, 3]
    bad = rng.choice(n, 8, replace=False)
    xy0 = xy0.copy()
    xy0[bad] += rng.uniform(-80, 80, (8, 2))
    keep = filter_match_pairwise_strain(xy0, xy1, strain_limit=0.1)
    good = np.setdiff1d(np.arange(n), bad)
    assert keep[good].mean() > 0.9
    assert keep[bad].mean() < 0.3


def test_align_two_thumbnails_full(rng, workdir):
    from feabas_tpu.thumbnail import align_two_thumbnails
    img0 = texture(rng, 240, 240, blur=2)
    img1 = np.roll(img0, (6, 9), axis=(0, 1))
    m = align_two_thumbnails(img0, img1,
                             block_matching={'spacings': [60, 30],
                                             'conf_thresh': 0.25})
    assert m is not None and m.xy0.shape[0] >= 6
    d = np.median(m.xy0 - m.xy1, axis=0)
    assert np.allclose(d, [-9, -6], atol=0.5), d


def test_template_mode(rng, workdir):
    from feabas_tpu.thumbnail import align_two_thumbnails
    img0 = texture(rng, 200, 200, blur=2)
    img1 = np.roll(img0, (-4, 11), axis=(0, 1))
    m = align_two_thumbnails(img0, img1, match_mode='template',
                             block_matching={'spacings': [60, 30],
                                             'conf_thresh': 0.25})
    assert m is not None
    d = np.median(m.xy0 - m.xy1, axis=0)
    assert np.allclose(d, [-11, 4], atol=0.5), d


def test_sequential_ransac_two_models(rng, workdir):
    """Two affine models in one match set: sequential RANSAC recovers
    both groups (reference: thumbnail.py:914)."""
    from feabas_tpu.thumbnail import filter_match_sequential_ransac
    n = 60
    xy1a = rng.uniform(0, 100, (n, 2))
    xy1b = rng.uniform(150, 250, (n, 2))
    Ta = np.array([[1.0, 0.05], [-0.05, 1.0]])
    xy0a = xy1a @ Ta + [8, -5]
    xy0b = xy1b + [-20, 14]
    xy0 = np.concatenate([xy0a, xy0b]) + rng.normal(0, 0.3, (2 * n, 2))
    xy1 = np.concatenate([xy1a, xy1b])
    groups = filter_match_sequential_ransac(xy0, xy1, dis_tol=1.5)
    assert len(groups) == 2
    sizes = sorted(g.size for g in groups)
    assert sizes[0] > 0.8 * n and sizes[1] > 0.8 * n
    # each group is model-pure
    for g in groups:
        assert (g < n).all() or (g >= n).all()


def test_two_piece_section_independent_affines(rng, workdir):
    """A section broken into two pieces that moved independently: the
    robustness loop must recover a correct match set on EACH piece
    (VERDICT round-1 done-criterion for the thumbnail loop)."""
    from feabas_tpu.thumbnail import match_two_thumbnails_LRadon
    from synthutil import texture
    h, w = 200, 420
    img0 = texture(rng, h, w).astype(np.float32)
    img1 = np.zeros_like(img0)
    # piece A: left half shifted (+7, +4); piece B: right half rotated
    # slightly and shifted (-6, +9)
    img1[:, :200] = np.roll(np.roll(img0[:, :200], 4, axis=0), 7, axis=1)
    import cv2
    M = cv2.getRotationMatrix2D((310, 100), 3.0, 1.0)
    M[:, 2] += [-6, 9]
    img1[:, 210:] = cv2.warpAffine(img0, M, (w, h),
                                   borderMode=cv2.BORDER_REFLECT)[:, 210:]
    mask = np.zeros((h, w), np.uint8)
    mask[:, :200] = 1
    mask[:, 210:] = 2
    match = match_two_thumbnails_LRadon(img0, img1, mask0=mask, mask1=mask)
    assert match is not None
    d = match.xy1 - match.xy0
    left = match.xy1[:, 0] < 200
    right = match.xy1[:, 0] >= 210
    assert left.sum() >= 5 and right.sum() >= 5, (left.sum(), right.sum())
    # piece A: pure translation (+7, +4) -> xy1 - xy0 = -(7, 4)... check
    # convention: img1(p) contains img0 content at p - t  =>  xy0 = xy1 - t
    err_l = np.median(np.abs(d[left] - [7, 4]), axis=0)
    assert (err_l < 1.5).all(), err_l
    # piece B: rotation by 3 deg about (310, 100) + shift; verify against
    # the analytic affine
    th = np.deg2rad(3.0)
    R = np.array([[np.cos(th), np.sin(th)], [-np.sin(th), np.cos(th)]])
    c = np.array([310, 100.0])
    want_xy1 = (match.xy0[right] - c) @ R.T + c + [-6, 9]
    err_r = np.median(np.abs(match.xy1[right] - want_xy1), axis=0)
    assert (err_r < 2.0).all(), err_r


def test_keypoint_matches_container(rng, workdir):
    from feabas_tpu.thumbnail import KeyPoints, KeyPointMatches
    kp0 = KeyPoints(rng.uniform(0, 100, (10, 2)), class_id=np.arange(10) % 2)
    kp1 = KeyPoints(rng.uniform(0, 100, (12, 2)), class_id=np.arange(12) % 3)
    km = KeyPointMatches.from_keypoints(kp0, kp1, [0, 2, 4], [1, 3, 5],
                                        conf=[0.9, 0.8, 0.7])
    assert km.num_points == 3
    assert np.array_equal(km.class_id0, [0, 0, 0])
    assert np.array_equal(km.class_id1, [1, 0, 2])
    km2 = km.filter_match(np.array([True, False, True]), inplace=False)
    assert km2.num_points == 2 and km.num_points == 3
    m = km2.to_match()
    assert m.xy0.shape == (2, 2) and m.weight.shape == (2,)


def test_keypoint_subpixel_localization(rng):
    """DoG extrema carry subpixel offsets: a blob centered off-grid must
    be localized to well under the 0.5 px integer-quantization floor."""
    from feabas_tpu.thumbnail import detect_extrema_log
    img = np.full((96, 96), 128.0, np.float32)
    gy, gx = np.mgrid[0:96, 0:96]
    for cx, cy in [(30.3, 40.7), (70.6, 20.2), (50.5, 72.4)]:
        img += 80.0 * np.exp(-(((gx - cx) ** 2 + (gy - cy) ** 2)
                               / (2 * 3.0 ** 2)))
    kp = detect_extrema_log(img, sigma=3.0, min_spacing=12)
    got = kp.xy[np.argsort(kp.response)[::-1][:3]]
    want = np.array([[30.3, 40.7], [70.6, 20.2], [50.5, 72.4]])
    # match each truth point to its nearest detection
    for wpt in want:
        d = np.linalg.norm(got - wpt, axis=-1).min()
        assert d < 0.25, (wpt, got)


def test_refine_matches_subpixel_recovers_fraction():
    """LK refinement measures the true subpixel displacement regardless
    of detector noise and fractional anchors (round-4 VERDICT: thumbnail
    match parity must meet the 0.1 px north star the other parity
    metrics respect)."""
    import cv2
    from scipy.ndimage import gaussian_filter
    from feabas_tpu.thumbnail import refine_matches_subpixel
    rng = np.random.default_rng(6)
    n = 512
    world = gaussian_filter(rng.normal(0, 1, (n + 128, n + 128)), 3)
    world = (world / world.std() * 40 + 128).clip(0, 255).astype(np.float32)
    t = np.array([17.3, -9.6])
    img0 = world[32:32 + n, 32:32 + n]
    M = np.float32([[1, 0, -t[0]], [0, 1, -t[1]]])
    img1 = cv2.warpAffine(world, M, world.shape[::-1],
                          flags=cv2.INTER_LINEAR)[32:32 + n, 32:32 + n]
    xs, ys = np.meshgrid(np.linspace(60, 450, 6), np.linspace(60.5, 450, 6))
    xy1 = np.stack([xs.ravel(), ys.ravel()], -1)   # fractional anchors too
    for noise in (0.0, 1.5):
        xy0 = xy1 + t + rng.normal(0, noise, xy1.shape)
        ref = refine_matches_subpixel(img0, img1, xy0, xy1, sigma=3.5)
        err = np.linalg.norm(ref - (xy1 + t), axis=-1)
        assert np.median(err) < 0.08, (noise, np.median(err))
