"""Device warp kernel: bilinear sampling + block affine warps + matcher
device/host path equivalence."""

import numpy as np
import pytest

from synthutil import texture, warped_pair


def test_bilinear_matches_cv2(rng, workdir):
    import cv2
    import jax.numpy as jnp
    from feabas_tpu.ops.warp import bilinear_sample
    img = texture(rng, 100, 120).astype(np.float32)
    xs = rng.uniform(1, 118, (50,)).astype(np.float32)
    ys = rng.uniform(1, 98, (50,)).astype(np.float32)
    got = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(xs),
                                     jnp.asarray(ys)))
    want = cv2.remap(img, xs[None], ys[None], cv2.INTER_LINEAR)[0]
    assert np.allclose(got, want, atol=1e-3)
    # out of range -> fillval
    out = np.asarray(bilinear_sample(jnp.asarray(img),
                                     jnp.asarray([-5.0, 200.0]),
                                     jnp.asarray([10.0, 10.0]), fillval=7.0))
    assert (out == 7.0).all()


def test_affine_warp_blocks_identity(rng, workdir):
    import jax.numpy as jnp
    from feabas_tpu.ops.warp import affine_warp_blocks
    img = texture(rng, 128, 128).astype(np.float32)
    origins = np.array([[10, 20], [40, 5]], np.float32)
    A = np.tile(np.eye(2, dtype=np.float32), (2, 1, 1))
    b = np.zeros((2, 2), np.float32)
    out = np.asarray(affine_warp_blocks(jnp.asarray(img), jnp.asarray(origins),
                                        jnp.asarray(A), jnp.asarray(b), 32, 32))
    assert np.allclose(out[0], img[20:52, 10:42], atol=1e-4)
    assert np.allclose(out[1], img[5:37, 40:72], atol=1e-4)


def test_mesh_blocks_device_matches_host(rng, workdir):
    """Device local-affine block rendering must agree with the exact host
    rasterizing renderer for an affinely deformed mesh."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import StreamLoader
    from feabas_tpu.renderer import MeshRenderer
    from feabas_tpu.matcher import _render_blocks
    from feabas_tpu.ops.warp import mesh_blocks_device
    from feabas_tpu import constant as const
    img = texture(rng, 200, 200).astype(np.float32)
    mesh = Mesh.from_bbox((0, 0, 200, 200), cartesian=True, mesh_size=50)
    T = np.eye(3)
    T[:2, :2] = [[1.04, 0.02], [-0.03, 0.98]]
    T[2, :2] = [3, -2]
    mesh.apply_affine(T, gear=(const.MESH_GEAR_FIXED, const.MESH_GEAR_MOVING))
    centers = np.array([[60, 60], [120, 80], [90, 140]], float)
    dev, kept_d = mesh_blocks_device(mesh, img, centers, 32)
    host, kept_h = _render_blocks(
        MeshRenderer.from_mesh(mesh, image_loader=StreamLoader(img)),
        centers, 32)
    assert np.array_equal(kept_d, np.arange(3)) and np.array_equal(kept_h, kept_d)
    diff = np.abs(np.asarray(dev) - host)
    # interiors must agree to interpolation tolerance
    assert np.median(diff) < 1.0, np.median(diff)


def test_matcher_device_vs_host_equivalence(rng, workdir):
    from feabas_tpu.matcher import iterative_xcorr_matcher_w_mesh
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import StreamLoader
    h = w = 256
    img0, img1, disp_fn = warped_pair(rng, h, w, amp=2.0, period=150.0)
    results = {}
    for device in (True, False):
        mesh0 = Mesh.from_bbox((0, 0, w, h), cartesian=True, mesh_size=60,
                               uid=0, locked=True)
        mesh1 = Mesh.from_bbox((0, 0, w, h), cartesian=True, mesh_size=60,
                               uid=1)
        m = iterative_xcorr_matcher_w_mesh(
            mesh0, mesh1, StreamLoader(img0), StreamLoader(img1),
            spacings=[80, 40], sigma=2.5, conf_thresh=0.25,
            min_boundary_distance=25, device_render=device)
        assert m is not None
        want = m.xy1 + disp_fn(m.xy1)
        err = np.linalg.norm(m.xy0 - want, axis=-1)
        results[device] = np.median(err)
    assert results[True] < 1.0, results
    assert abs(results[True] - results[False]) < 0.5, results


def test_shifted_warp_matches_gather(rng):
    """Gather-free shifted-window warp agrees with the bilinear-gather
    reference for small-strain affines, including image borders."""
    import jax.numpy as jnp
    from feabas_tpu.ops.warp import (affine_warp_blocks,
                                     affine_warp_blocks_shifted,
                                     warp_blocks_auto, shift_bound_K)
    H, W = 300, 260
    img = jnp.asarray(rng.normal(0, 40, (H, W)).astype(np.float32) + 128)
    B, h = 32, 48
    A = (np.tile(np.eye(2, dtype=np.float32), (B, 1, 1))
         + rng.normal(0, 5e-3, (B, 2, 2)).astype(np.float32))
    b = rng.uniform(-4, 4, (B, 2)).astype(np.float32)
    # include blocks hanging off every border
    origins = np.round(np.stack([rng.uniform(-20, W - 30, B),
                                 rng.uniform(-20, H - 30, B)], -1)
                       ).astype(np.float32)
    ref = np.asarray(affine_warp_blocks(img, jnp.asarray(origins),
                                        jnp.asarray(A), jnp.asarray(b),
                                        h, h))
    K = shift_bound_K(A, h, h)
    got = np.asarray(affine_warp_blocks_shifted(
        img, jnp.asarray(origins), jnp.asarray(A), jnp.asarray(b), h, h, K))
    np.testing.assert_allclose(got, ref, atol=0.1)
    auto = np.asarray(warp_blocks_auto(img, jnp.asarray(origins),
                                       jnp.asarray(A), jnp.asarray(b), h, h))
    np.testing.assert_allclose(auto, ref, atol=0.1)


def test_shifted_warp_K_bound_fallback(rng):
    """Deformations beyond every K bucket route to the gather path."""
    from feabas_tpu.ops.warp import shift_bound_K
    A = np.tile(np.eye(2, dtype=np.float32), (4, 1, 1))
    assert shift_bound_K(A, 64, 64) == 2
    A_rot = A.copy()
    th = 0.5  # ~29 deg: deviation >> 8 px over a 64 px block
    A_rot[:, 0, 0] = A_rot[:, 1, 1] = np.cos(th)
    A_rot[:, 0, 1] = np.sin(th)
    A_rot[:, 1, 0] = -np.sin(th)
    assert shift_bound_K(A_rot, 64, 64) is None


def test_remap_device_matches_cv2(rng):
    """The device bilinear remap (render path device option) agrees with
    cv2.remap INTER_LINEAR within rounding."""
    import cv2
    from feabas_tpu.ops.warp import remap_device
    src = rng.integers(0, 255, (150, 200)).astype(np.uint8)
    gx, gy = np.meshgrid(np.arange(90, dtype=np.float32),
                         np.arange(70, dtype=np.float32))
    mxs = gx * 1.7 + 3.2 + 5 * np.sin(gy / 9)
    mys = gy * 1.9 + 1.1 + 4 * np.cos(gx / 7)
    want = cv2.remap(src, mxs.astype(np.float32), mys.astype(np.float32),
                     cv2.INTER_LINEAR, borderMode=cv2.BORDER_CONSTANT,
                     borderValue=0)
    got = remap_device(src, mxs.astype(np.float32), mys.astype(np.float32))
    valid = (mxs >= 0) & (mys >= 0) & (mxs <= 199) & (mys <= 149)
    diff = np.abs(got - want.astype(np.float32))[valid]
    assert diff.max() <= 1.0, diff.max()


def test_render_by_subregions_device_option(rng, workdir):
    """MeshRenderer.crop(device_remap=True) matches the host path."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import StreamLoader
    from feabas_tpu.renderer import MeshRenderer
    from synthutil import texture
    world = texture(rng, 260, 260)
    loader = StreamLoader(world)
    m = Mesh.from_bbox((0, 0, 260, 260), cartesian=True, mesh_size=60)
    v = m.vertices(1)
    m.set_vertices(v + np.stack([3 * np.sin(v[:, 1] / 40),
                                 2 * np.cos(v[:, 0] / 30)], -1), 1,
                   offset=m.offset(1))
    r = MeshRenderer.from_mesh(m, image_loader=loader)
    host = r.crop((20, 20, 220, 220))
    dev = r.crop((20, 20, 220, 220), device_remap=True)
    assert host.shape == dev.shape
    diff = np.abs(host.astype(int) - dev.astype(int))
    assert (diff <= 1).mean() > 0.995, (diff.mean(), diff.max())
