"""MeshRenderer affine short-circuit (reference: feabas/renderer.py:94-109,
453-510): when the deformation over a block is affine within tolerance and
the block is fully covered, rendering skips rasterization and evaluates one
affine — output must stay within tolerance of the exact path and interior
blocks must actually take the fast path."""

import numpy as np


def _mesh_affine(N=512, mesh_size=64):
    """Mesh whose MOVING gear is an exact global affine of INITIAL."""
    from feabas_tpu.mesh import Mesh
    m = Mesh.from_bbox((0, 0, N, N), cartesian=True, mesh_size=mesh_size,
                       resolution=4)
    v = m.vertices(1)
    A = np.array([[1.01, 0.004], [-0.006, 0.995]])
    m.set_vertices(v @ A + np.array([3.0, -2.0]), 1, offset=m.offset(1))
    return m


def _mesh_bent(N=512, mesh_size=64, amp=6.0):
    """Globally non-affine (sinusoidal) deformation."""
    from feabas_tpu.mesh import Mesh
    m = Mesh.from_bbox((0, 0, N, N), cartesian=True, mesh_size=mesh_size,
                       resolution=4)
    v = m.vertices(1)
    m.set_vertices(v + np.stack([amp * np.sin(v[:, 1] / 90),
                                 amp * np.cos(v[:, 0] / 80)], -1), 1,
                   offset=m.offset(1))
    return m


def _world(N=512, seed=11):
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(seed)
    w = gaussian_filter(rng.normal(0, 1, (N, N)), 1.5)
    return (w / w.std() * 40 + 128).clip(0, 255).astype(np.uint8)


def test_global_affine_shortcircuit_fires_and_matches(workdir):
    from feabas_tpu.renderer import MeshRenderer
    from feabas_tpu.dal import StreamLoader
    m = _mesh_affine()
    r = MeshRenderer.from_mesh(m, image_loader=StreamLoader(_world()),
                               affine_approx_tol=0.1)
    bbox = (100, 100, 228, 228)      # interior block
    assert r._affine_shortcircuit(bbox) is not None
    exact = r.crop(bbox, affine_approx_tol=0)
    fast = r.crop(bbox)
    diff = np.abs(exact.astype(np.int32) - fast.astype(np.int32))
    # tolerance-bounded coords -> at most a few LSB of image difference
    assert np.quantile(diff, 0.99) <= 2, diff.max()


def test_shortcircuit_declines_near_boundary_and_bent_mesh(workdir):
    from feabas_tpu.renderer import MeshRenderer
    from feabas_tpu.dal import StreamLoader
    m = _mesh_affine()
    r = MeshRenderer.from_mesh(m, image_loader=StreamLoader(_world()),
                               affine_approx_tol=0.1)
    # block sticking out of the mesh: not fully covered -> exact path
    assert r._affine_shortcircuit((-32, -32, 96, 96)) is None
    # a bent mesh fails both global and local fits at tight tolerance
    rb = MeshRenderer.from_mesh(_mesh_bent(),
                                image_loader=StreamLoader(_world()),
                                affine_approx_tol=0.05)
    assert rb._affine_shortcircuit((100, 100, 400, 400)) is None


def test_local_affine_shortcircuit_on_locally_flat_region(workdir):
    """Deformation concentrated in one corner: blocks far from it pass the
    LOCAL affine fit even though the global fit fails."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.renderer import MeshRenderer
    from feabas_tpu.dal import StreamLoader
    N = 512
    m = Mesh.from_bbox((0, 0, N, N), cartesian=True, mesh_size=64,
                       resolution=4)
    v = m.vertices(1)
    r2 = ((v[:, 0] - 480) ** 2 + (v[:, 1] - 480) ** 2) / 80.0 ** 2
    bump = 12.0 * np.exp(-r2)
    m.set_vertices(v + np.stack([bump, -bump], -1), 1, offset=m.offset(1))
    r = MeshRenderer.from_mesh(m, image_loader=StreamLoader(_world()),
                               affine_approx_tol=0.2)
    _, _, gres = r._global_affine_fit()
    assert gres > 0.2                        # global fit must NOT pass
    assert r._affine_shortcircuit((64, 64, 192, 192)) is not None
    assert r._affine_shortcircuit((384, 384, 506, 506)) is None
    exact = r.crop((64, 64, 192, 192), affine_approx_tol=0)
    fast = r.crop((64, 64, 192, 192))
    diff = np.abs(exact.astype(np.int32) - fast.astype(np.int32))
    assert np.quantile(diff, 0.99) <= 2


def test_shortcircuit_disabled_by_default_and_on_folds(workdir):
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.renderer import MeshRenderer
    from feabas_tpu.dal import StreamLoader
    m = _mesh_affine()
    r = MeshRenderer.from_mesh(m, image_loader=StreamLoader(_world()))
    assert r._affine_shortcircuit((100, 100, 228, 228)) is None  # tol=0
    # folded mesh: likely_collisions gates the short-circuit off
    mf = Mesh.from_bbox((0, 0, 120, 60), cartesian=True, mesh_size=20)
    v = mf.vertices('FIXED').copy()
    sel = v[:, 0] > 80
    v[sel, 0] = 160 - v[sel, 0]
    mf.set_vertices(v, 'MOVING')
    rf = MeshRenderer.from_mesh(mf, image_loader=StreamLoader(
        _world(N=128)[:60, :120]), affine_approx_tol=5.0)
    assert rf._affine_shortcircuit((10, 10, 50, 50)) is None


def test_device_path_uses_shortcircuit_table(workdir):
    """Device render with the short-circuit active matches the device
    exact path (1-row always-inside table vs full triangle table)."""
    from feabas_tpu.renderer import MeshRenderer
    from feabas_tpu.dal import StreamLoader
    m = _mesh_affine(N=256)
    loader = StreamLoader(_world(N=256))
    r = MeshRenderer.from_mesh(m, image_loader=loader,
                               affine_approx_tol=0.1)
    bbox = (64, 64, 192, 192)
    dev_fast = r.crop(bbox, device_render=True)
    dev_exact = r.crop(bbox, device_render=True, affine_approx_tol=0)
    diff = np.abs(dev_fast.astype(np.int32) - dev_exact.astype(np.int32))
    assert np.quantile(diff, 0.99) <= 2
