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
