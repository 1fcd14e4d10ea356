"""Device thumbnail feature pipeline (ops/lradon.py) parity against the
host path (reference pipeline: feabas/thumbnail.py:605-760)."""

import numpy as np
import pytest


def _section(seed=5, n=384):
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(seed)
    w = gaussian_filter(rng.normal(0, 1, (n + 64, n + 64)), 3)
    return (w / w.std() * 40 + 128).clip(0, 255).astype(np.float32)


def test_detect_device_matches_host(workdir):
    from feabas_tpu.thumbnail import detect_extrema_log
    img = _section()[:384, :384]
    kh = detect_extrema_log(img, sigma=3.0, min_spacing=8,
                            num_features=300, use_device=False)
    kd = detect_extrema_log(img, sigma=3.0, min_spacing=8,
                            num_features=300, use_device=True)
    assert kd.num_points == kh.num_points
    # same keypoint SET (order differs: device is response-sorted)
    sh = {tuple(np.round(p, 3)) for p in kh.xy}
    sd = {tuple(np.round(p, 3)) for p in kd.xy}
    inter = len(sh & sd) / max(len(sh), 1)
    assert inter >= 0.97, inter


def test_detect_device_mask_and_class(workdir):
    from feabas_tpu.thumbnail import detect_extrema_log
    img = _section(seed=7)[:384, :384]
    mask = np.zeros(img.shape, np.int32)
    mask[:, :190] = 1
    mask[:, 200:] = 2
    kd = detect_extrema_log(img, mask=mask, sigma=3.0, min_spacing=8,
                            use_device=True)
    assert kd.num_points > 20
    assert set(np.unique(kd.class_id)) <= {1, 2}
    ix = np.round(kd.xy[:, 0]).astype(int)
    assert ((ix < 195) | (ix >= 198)).all()   # none in the masked gap


def test_descriptors_device_match_host(workdir):
    from feabas_tpu.thumbnail import (detect_extrema_log,
                                      extract_LRadon_feature)
    img = _section(seed=9)[:384, :384]
    kp = detect_extrema_log(img, sigma=3.0, min_spacing=10,
                            num_features=200, use_device=False)
    kh = extract_LRadon_feature(img, kp, use_device=False)
    des_h = kh.des.copy()
    kd = extract_LRadon_feature(img, kp, use_device=True)
    # cv2 warpAffine quantizes to 1/32 px; device is full f32 — unit
    # descriptors agree to ~1e-2
    dot = (des_h.reshape(len(des_h), -1)
           * kd.des.reshape(len(kd.des), -1)).sum(-1)
    assert np.median(dot) > 0.999, np.median(dot)
    assert dot.min() > 0.99, dot.min()


def test_match_reduction_device(workdir):
    """End-to-end device pipeline recovers a known translation+rotation."""
    import cv2
    from feabas_tpu.thumbnail import match_two_thumbnails_LRadon
    world = _section(seed=13)
    n = 384
    img0 = world[32:32 + n, 32:32 + n]
    t = np.array([9.4, -5.2])
    M = np.float32([[1, 0, -t[0]], [0, 1, -t[1]]])
    img1 = cv2.warpAffine(world, M, world.shape[::-1],
                          flags=cv2.INTER_LINEAR)[32:32 + n, 32:32 + n]
    m = match_two_thumbnails_LRadon(
        img0, img1, detect_settings={'min_spacing': 12}, max_rounds=2)
    assert m is not None and m.xy0.shape[0] >= 8
    err = np.linalg.norm((m.xy0 - m.xy1) - t, axis=-1)
    assert np.median(err) < 1.0, np.median(err)


def test_match_rotation_exhaustive_device(workdir):
    """A half-turn-rotated pair still matches through the rotation
    variants (exercises the device variant construction)."""
    from feabas_tpu.thumbnail import (detect_extrema_log,
                                      extract_LRadon_feature,
                                      match_LRadon_feature)
    img = _section(seed=21)[:384, :384]
    rot = img[::-1, ::-1].copy()        # 180-degree rotation
    k0 = extract_LRadon_feature(
        img, detect_extrema_log(img, min_spacing=12, use_device=True),
        use_device=True)
    k1 = extract_LRadon_feature(
        rot, detect_extrema_log(rot, min_spacing=12, use_device=True),
        use_device=True)
    i0, i1, conf, rk = match_LRadon_feature(k0, k1, conf_thresh=0.3)
    assert i0.size >= 8
    # matched points map through the 180-deg flip
    h, w = img.shape
    pred = np.stack([w - 1 - k0.xy[i0, 0], h - 1 - k0.xy[i0, 1]], -1)
    err = np.linalg.norm(pred - k1.xy[i1], axis=-1)
    assert np.median(err) < 1.5, np.median(err)


def test_patch_core_matches_direct_core(workdir):
    """The MXU patch+stencil-matmul formulation agrees with the direct
    per-keypoint sampling formulation (its exactness reference) up to
    the corner-blend double interpolation."""
    import jax.numpy as jnp
    from feabas_tpu.ops import lradon
    img = _section(seed=33)[:300, :300]
    rng = np.random.default_rng(3)
    xy = rng.uniform(5, 295, (200, 2)).astype(np.float32)
    des_p, n = lradon.lradon_descriptors_device(img, xy)
    # direct formulation on the same padded keypoint table
    D = 2 * 15 + 1
    ax = np.linspace(-15, 15, D)
    idx = np.linspace(0, D - 1, 8).round().astype(np.int64)
    offs = jnp.asarray(ax[idx], jnp.float32)
    xyp = np.zeros((des_p.shape[0], 2), np.float32)
    xyp[:n] = xy
    des_d = lradon._lradon_core(jnp.asarray(img, jnp.float32),
                                jnp.asarray(xyp), offs, 6, 8, 3, D)
    a = np.asarray(des_p)[:n].reshape(n, -1)
    b = np.asarray(des_d)[:n].reshape(n, -1)
    dot = (a * b).sum(-1)
    assert np.median(dot) > 0.999, np.median(dot)
    assert dot.min() > 0.995, dot.min()

def test_fused_features_match_staged(workdir):
    """The one-dispatch fused feature program (features_device) produces
    exactly the staged detect->fetch->describe chain's outputs (same
    traced cores, same shapes)."""
    from feabas_tpu.ops import lradon
    from feabas_tpu.thumbnail import detect_extrema_log, \
        extract_LRadon_feature
    img = _section(seed=41)[:384, :384]
    mask = np.zeros(img.shape, np.int32)
    mask[:, :190] = 1
    mask[:, 200:] = 2
    feat = lradon.features_device(img, mask=mask, sigma=3.0,
                                  min_spacing=8, num_features=400)
    kp = detect_extrema_log(img, mask=mask, sigma=3.0, min_spacing=8,
                            num_features=400, use_device=True)
    kp = extract_LRadon_feature(img, kp, use_device=True)
    assert feat['n'] == kp.num_points
    np.testing.assert_allclose(feat['xy'], kp.xy, atol=1e-5)
    np.testing.assert_array_equal(feat['cls'], kp.class_id)
    np.testing.assert_allclose(feat['des'], kp.des, atol=1e-5)
    assert feat['des_dev'].shape[0] >= feat['n']


def test_fused_prepare_image_sets_device_handle(workdir):
    from feabas_tpu.thumbnail import prepare_image
    img = _section(seed=43)[:256, :256]
    kp = prepare_image(img, detect_settings={'min_spacing': 10,
                                             'use_device': True},
                       extract_settings={'use_device': True})
    assert kp.des_dev is not None
    assert kp.des.shape[0] == kp.num_points
    # pickling drops the per-process device handle
    import pickle
    kp2 = pickle.loads(pickle.dumps(kp))
    assert kp2.des_dev is None and kp2.des.shape == kp.des.shape


def test_masked_match_equals_compacted(workdir):
    """Masked device-resident matching == re-padded compacted matching
    on an arbitrary active subset."""
    from feabas_tpu.ops import lradon
    from feabas_tpu.thumbnail import (prepare_image, match_LRadon_feature)
    img0 = _section(seed=45)[:320, :320]
    img1 = np.ascontiguousarray(_section(seed=45)[24:344, 16:336])
    s = {'detect_settings': {'min_spacing': 10, 'use_device': True},
         'extract_settings': {'use_device': True}}
    kp0 = prepare_image(img0, **s)
    kp1 = prepare_image(img1, **s)
    rng = np.random.default_rng(0)
    act0 = rng.random(kp0.num_points) > 0.3
    act1 = rng.random(kp1.num_points) > 0.3
    m0 = np.zeros(kp0.des_dev.shape[0], bool)
    m0[:kp0.num_points] = act0
    m1 = np.zeros(kp1.des_dev.shape[0], bool)
    m1[:kp1.num_points] = act1
    gi0, gi1, conf_m, rot_m = lradon.match_lradon_device_masked(
        kp0.des_dev, m0, kp1.des_dev, m1, conf_thresh=0.3)
    c0 = kp0.filter_by_mask(act0)
    c1 = kp1.filter_by_mask(act1)
    i0, i1, conf_c, rot_c = match_LRadon_feature(c0, c1, conf_thresh=0.3)
    assert rot_m == rot_c
    # compacted indices map back to the same global keypoints
    g0 = np.nonzero(act0)[0]
    g1 = np.nonzero(act1)[0]
    np.testing.assert_array_equal(gi0, g0[i0])
    np.testing.assert_array_equal(gi1, g1[i1])
    np.testing.assert_allclose(conf_m, conf_c, atol=1e-5)


def test_pair_program_one_dispatch_same_result(workdir):
    """match_two_thumbnails_LRadon routed through the fused pair program
    returns the same matches as with staged (pre-supplied) keypoints,
    and calls the pair program exactly once."""
    import cv2
    import feabas_tpu.ops.lradon as lradon
    import feabas_tpu.thumbnail as th
    world = _section(seed=47)
    n = 384
    img0 = world[32:32 + n, 32:32 + n]
    t = np.array([11.0, -7.5])
    M = np.float32([[1, 0, -t[0]], [0, 1, -t[1]]])
    img1 = cv2.warpAffine(world, M, world.shape[::-1],
                          flags=cv2.INTER_LINEAR)[32:32 + n, 32:32 + n]
    s = {'detect_settings': {'min_spacing': 12, 'use_device': True},
         'extract_settings': {'use_device': True}, 'max_rounds': 2}
    kp0 = th.prepare_image(img0, **s)
    kp1 = th.prepare_image(img1, **s)
    m_staged = th.match_two_thumbnails_LRadon(img0, img1, kps0=kp0,
                                              kps1=kp1, **s)
    calls = []
    orig = lradon.pair_features_device

    def counted(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    th_pair_backup = lradon.pair_features_device
    lradon.pair_features_device = counted
    try:
        m_fused = th.match_two_thumbnails_LRadon(img0, img1, **s)
    finally:
        lradon.pair_features_device = th_pair_backup
    assert len(calls) == 1
    assert m_fused is not None and m_staged is not None
    np.testing.assert_allclose(np.sort(m_fused.xy0, axis=0),
                               np.sort(m_staged.xy0, axis=0), atol=1e-5)
    err = np.linalg.norm((m_fused.xy0 - m_fused.xy1) - t, axis=-1)
    assert np.median(err) < 1.0, np.median(err)
