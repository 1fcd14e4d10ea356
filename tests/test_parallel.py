"""Sharded z-stack window solve on a virtual 8-device mesh."""

import numpy as np
import pytest


def _make_stack(S=8, n=6, jitter=2.0, rng=None):
    """S sections with identical grid meshes; neighbor links derived from a
    known smooth drift so ground truth is available."""
    import jax
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.parallel.window import build_stack_system
    rng = rng or np.random.default_rng(0)
    meshes = []
    for z in range(S):
        m = Mesh.from_bbox((0, 0, 100, 100), cartesian=True, mesh_size=25,
                           uid=z, name=f'z{z}')
        m.set_translation((0, 0))
        meshes.append(m)
    meshes[0].locked = True
    # true drift: each section displaced by cumulative smooth offset
    drift = np.cumsum(rng.normal(0, jitter, (S, 2)), axis=0)
    drift -= drift[0]
    # links: grid points, connecting z to z+1 with the *measured* relation:
    # a feature at p in section z sits at p + (drift[z+1]-drift[z]) in z+1's
    # acquired frame -> link anchors at p (z) and p + delta (z+1)
    xs, ys = np.meshgrid(np.linspace(15, 85, 4), np.linspace(15, 85, 4))
    pts = np.stack([xs.ravel(), ys.ravel()], -1)
    links = []
    for z in range(S - 1):
        delta = drift[z + 1] - drift[z]
        tid0 = meshes[z].tri_finder(pts, gear='INITIAL')
        tid1 = meshes[z + 1].tri_finder(pts + delta, gear='INITIAL')
        links.append({
            'idx0': meshes[z].triangles[tid0],
            'bary0': meshes[z].cart2bary(pts, tid0, gear='INITIAL'),
            'idx1': meshes[z + 1].triangles[tid1],
            'bary1': meshes[z + 1].cart2bary(pts + delta, tid1, gear='INITIAL'),
            'weight': np.ones(len(pts)),
        })
    system = build_stack_system(meshes, links)
    return system, drift


def _solve_args(system):
    import jax.numpy as jnp
    keys = ('verts0', 'u', 'tris', 'multiplier', 'poisson')
    a = [jnp.asarray(system[k]) for k in keys]
    a.append(tuple(jnp.asarray(x) for x in system['links']))
    a.append(jnp.asarray(system['r_rest']))
    a.append(jnp.asarray(system['free']))
    return a


def test_stack_solve_single_device(workdir):
    from feabas_tpu.parallel.window import stack_solve
    system, drift = _make_stack()
    u_new, n_it, res = stack_solve(*_solve_args(system), lam_s=0.01,
                                   maxiter=800)
    # solved sections must counteract the drift: section z's vertices move
    # by -drift[z] (relative to locked section 0); padded vertices
    # (free=0) stay at u=0 and are excluded
    got = np.asarray(u_new)
    for z, nv in enumerate(system['num_vertices']):
        err = got[z, :nv] - (-drift[z])
        assert np.abs(err).max() < 0.15, (z, np.abs(err).max())


def test_stack_solve_sharded_8dev(workdir):
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh as JMesh, NamedSharding, PartitionSpec as P
    from feabas_tpu.parallel.window import stack_solve, shard_stack_system
    devices = np.array(jax.devices())
    assert devices.size == 8, 'conftest must provide 8 virtual devices'
    jmesh = JMesh(devices, ('z',))
    system, drift = _make_stack(S=8)
    sharded = shard_stack_system(system, jmesh)
    u_new, n_it, res = stack_solve(
        sharded['verts0'], sharded['u'], sharded['tris'],
        sharded['multiplier'], sharded['poisson'], sharded['links'],
        sharded['r_rest'], sharded['free'], lam_s=0.01, maxiter=800)
    # result stays sharded along z
    assert len(u_new.sharding.device_set) == 8
    got = np.asarray(u_new)
    for z, nv in enumerate(system['num_vertices']):
        assert np.abs(got[z, :nv] - (-drift[z])).max() < 0.15, z


def test_two_level_preconditioner_converges_fast(rng):
    """The z-chain coarse correction kills the long-wavelength modes: a
    long drift-y chain converges in far fewer CG iterations than the
    chain length would force on pure Jacobi."""
    import jax.numpy as jnp
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.parallel.window import build_stack_system, stack_solve
    S = 48
    meshes = []
    for z in range(S):
        m = Mesh.from_bbox((0, 0, 200, 200), cartesian=True, mesh_size=50,
                           uid=z, name=f'z{z}')
        m.set_translation((0, 0))
        meshes.append(m)
    meshes[0].locked = True
    xs, ys = np.meshgrid(np.linspace(20, 180, 4), np.linspace(20, 180, 4))
    pts = np.stack([xs.ravel(), ys.ravel()], -1)
    links = []
    for z in range(S - 1):
        d = rng.normal(0, 1.0, 2)
        tid0 = meshes[z].tri_finder(pts, gear='INITIAL', extrapolate=True)
        tid1 = meshes[z + 1].tri_finder(pts + d, gear='INITIAL',
                                        extrapolate=True)
        links.append({
            'idx0': meshes[z].triangles[tid0],
            'bary0': meshes[z].cart2bary(pts, tid0, gear='INITIAL'),
            'idx1': meshes[z + 1].triangles[tid1],
            'bary1': meshes[z + 1].cart2bary(pts + d, tid1, gear='INITIAL'),
            'weight': np.ones(len(pts), np.float32),
        })
    system = build_stack_system(meshes, links)
    u_new, n_it, res = stack_solve(*_solve_args(system), lam_s=0.1,
                                   tol=1e-7, maxiter=1000)
    assert np.isfinite(np.asarray(u_new)).all()
    # pure Jacobi needs ~176 iterations on this chain (measured) — the
    # coarse space propagates the long-wavelength drift exactly
    assert int(n_it) < 110, int(n_it)


def test_ragged_topology_sharded_window(workdir, rng):
    """Round-2 VERDICT #3 done-criterion: sections with DISTINCT
    topologies (production PSLG-style meshes) solve through the z-sharded
    stacked system on 8 devices and match the single-device general solve
    to 1e-3 px."""
    import jax
    from feabas_tpu.aligner import Stack
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.common import Match
    from feabas_tpu import constant as const

    assert jax.device_count() == 8
    S = 8
    xs, ys = np.meshgrid(np.linspace(10, 110, 4), np.linspace(10, 110, 4))
    pts = np.stack([xs.ravel(), ys.ravel()], -1)
    drift = np.cumsum(rng.normal(0, 1.5, (S, 2)), axis=0)
    drift -= drift[0]
    sizes = [28, 35, 40, 31, 26, 44, 37, 30]   # every topology distinct

    def _build():
        meshes, names = {}, []
        for z in range(S):
            n = f's{z}'
            names.append(n)
            m = Mesh.from_bbox((0, 0, 120, 120), cartesian=True,
                               mesh_size=sizes[z], name=n, resolution=4)
            meshes[n] = m
        matches = {}
        for z in range(S - 1):
            delta = drift[z + 1] - drift[z]
            matches[(names[z], names[z + 1])] = Match(
                pts, pts + delta, np.ones(len(pts)), 0.01)
        return Stack(meshes=meshes, matches=matches, resolution=4), names

    stack_a, names = _build()
    # distinct V per section -> this window can only shard via padding
    Vs = {stack_a.get_mesh(n).num_vertices for n in names}
    assert len(Vs) >= 3, Vs

    slm_a = stack_a.optimize_section_list(
        names, use_sharded_solve=True,
        elastic_params={'tol': 1e-10, 'maxiter': 3000})
    assert getattr(stack_a, 'last_window_sharded', False), \
        'ragged window must route through the sharded stack solve'

    stack_b, _ = _build()
    slm_b = stack_b.optimize_section_list(
        names, use_sharded_solve=False,
        elastic_params={'tol': 1e-10, 'maxiter': 3000})

    offs = []
    for n in names:
        va = stack_a.get_mesh(n).vertices_w_offset(const.MESH_GEAR_MOVING)
        vb = stack_b.get_mesh(n).vertices_w_offset(const.MESH_GEAR_MOVING)
        np.testing.assert_allclose(va, vb, atol=1e-3)
        m0 = stack_a.get_mesh(n)
        d = va - m0.vertices_w_offset(const.MESH_GEAR_INITIAL)
        assert np.ptp(d, axis=0).max() < 0.2, 'should be near-rigid'
        offs.append(d.mean(axis=0))
    # both solves recover the injected drift (up to the free global shift)
    offs = np.asarray(offs) - offs[0]
    err = offs - (-(drift - drift[0]))
    assert np.abs(err).max() < 0.5, np.abs(err).max()


def test_stack_rigid_modes_deflate_free_window(workdir):
    """A window with NO locked section must not absorb a whole-window
    rigid drift/rotation: stack_rigid_modes yields an orthonormal basis
    and stack_solve keeps the solution orthogonal to it (reference role:
    extra-DOF removal for unlocked components, optimizer.py:1362-1377)."""
    import jax.numpy as jnp
    from feabas_tpu.parallel.window import (build_stack_system, stack_solve,
                                            stack_rigid_modes)
    from feabas_tpu.mesh import Mesh
    rng = np.random.default_rng(5)
    system, drift = _make_stack(S=8, rng=rng)
    # unlock everything -> one fully-free chain component
    system['free'] = np.ones_like(system['free'])
    modes = stack_rigid_modes(system)
    assert modes is not None and modes.shape[0] == 3
    flat = modes.reshape(modes.shape[0], -1)
    np.testing.assert_allclose(flat @ flat.T, np.eye(3), atol=1e-9)
    args = _solve_args(system)
    u_new, n_it, res = stack_solve(*args, lam_s=0.01, tol=1e-10,
                                   maxiter=400,
                                   modes=jnp.asarray(modes))
    dx = np.asarray(u_new) - system['u']
    coef = np.einsum('ksvc,svc->k', modes, dx)
    assert np.abs(coef).max() < 1e-5, coef
    # the drift is still counteracted RELATIVELY (section z moves by
    # -drift[z] up to the deflated global rigid mode)
    off = np.asarray(u_new).mean(axis=1)
    for z in range(1, len(off)):
        got = off[z] - off[z - 1]
        want = -(drift[z] - drift[z - 1])
        np.testing.assert_allclose(got, want, atol=0.05)


def test_non_divisible_window_spans_all_devices(workdir, rng):
    """A window whose section count does NOT divide the device count
    (5 sections, 8 devices) pads with inert sections and still routes
    through the sharded solve, matching the single-device general solve
    to 1e-3 px."""
    import jax
    from feabas_tpu.aligner import Stack
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.common import Match
    from feabas_tpu import constant as const

    assert jax.device_count() == 8
    S = 5
    xs, ys = np.meshgrid(np.linspace(10, 110, 4), np.linspace(10, 110, 4))
    pts = np.stack([xs.ravel(), ys.ravel()], -1)
    drift = np.cumsum(rng.normal(0, 1.5, (S, 2)), axis=0)
    drift -= drift[0]
    sizes = [28, 35, 40, 31, 26]

    def _build():
        meshes, names = {}, []
        for z in range(S):
            n = f's{z}'
            names.append(n)
            meshes[n] = Mesh.from_bbox((0, 0, 120, 120), cartesian=True,
                                       mesh_size=sizes[z], name=n,
                                       resolution=4)
        matches = {}
        for z in range(S - 1):
            delta = drift[z + 1] - drift[z]
            matches[(names[z], names[z + 1])] = Match(
                pts, pts + delta, np.ones(len(pts)), 0.01)
        return Stack(meshes=meshes, matches=matches, resolution=4), names

    stack_a, names = _build()
    stack_a.optimize_section_list(names, use_sharded_solve=True,
                                  elastic_params={'tol': 1e-10,
                                                  'maxiter': 3000})
    assert getattr(stack_a, 'last_window_sharded', False)
    stack_b, _ = _build()
    stack_b.optimize_section_list(names, use_sharded_solve=False,
                                  elastic_params={'tol': 1e-10,
                                                  'maxiter': 3000})
    for n in names:
        va = stack_a.get_mesh(n).vertices_w_offset(const.MESH_GEAR_MOVING)
        vb = stack_b.get_mesh(n).vertices_w_offset(const.MESH_GEAR_MOVING)
        np.testing.assert_allclose(va, vb, atol=1e-3)


def test_stack_solve_stencil_matches_gather(workdir):
    """The lattice-stencil solve (grid_shape static arg) returns the
    gather solve's displacements on both lattice families, and the
    de-permuting ``stack_positions`` recovers drift in ORIGINAL mesh
    vertex order (staggered lattices pack with boundary holes)."""
    import jax.numpy as jnp
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.parallel.window import (build_stack_system, stack_solve,
                                            stack_positions)
    rng = np.random.default_rng(3)
    for cartesian in (True, False):
        S = 6
        meshes = []
        for z in range(S):
            m = Mesh.from_bbox((0, 0, 300, 240), cartesian=cartesian,
                               mesh_size=40, uid=z, name=f'z{z}')
            m.set_translation((0, 0))
            meshes.append(m)
        meshes[0].locked = True
        drift = np.cumsum(rng.normal(0, 1.5, (S, 2)), axis=0)
        drift -= drift[0]
        xs, ys = np.meshgrid(np.linspace(25, 275, 4),
                             np.linspace(25, 215, 4))
        pts = np.stack([xs.ravel(), ys.ravel()], -1)
        links = []
        for z in range(S - 1):
            d = drift[z + 1] - drift[z]
            tid0 = meshes[z].tri_finder(pts, gear='INITIAL')
            tid1 = meshes[z + 1].tri_finder(pts + d, gear='INITIAL')
            links.append({
                'idx0': meshes[z].triangles[tid0],
                'bary0': meshes[z].cart2bary(pts, tid0, gear='INITIAL'),
                'idx1': meshes[z + 1].triangles[tid1],
                'bary1': meshes[z + 1].cart2bary(pts + d, tid1,
                                                 gear='INITIAL'),
                'weight': np.ones(len(pts), np.float32)})
        system = build_stack_system(meshes, links)
        assert system.get('grid_shape') is not None, cartesian
        from feabas_tpu.parallel.window import build_link_transpose
        lt = build_link_transpose(system['links'], S, system['u'].shape[1])
        assert lt is not None
        args = _solve_args(system)
        u_g, it_g, _ = stack_solve(*args, lam_s=0.05, maxiter=800)
        u_s, it_s, _ = stack_solve(*args, lam_s=0.05, maxiter=800,
                                   grid_shape=system['grid_shape'],
                                   linc=tuple(jnp.asarray(a) for a in lt))
        du = np.abs(np.asarray(u_g) - np.asarray(u_s)).max()
        assert du < 1e-4, (cartesian, du)
        # gather-table assembly (no-scatter path) must match as well
        assert system.get('sten') is not None
        u_t, it_t, _ = stack_solve(*args, lam_s=0.05, maxiter=800,
                                   grid_shape=system['grid_shape'],
                                   linc=tuple(jnp.asarray(a) for a in lt),
                                   sten=jnp.asarray(system['sten']))
        dt_ = np.abs(np.asarray(u_t) - np.asarray(u_s)).max()
        assert dt_ < 1e-5, (cartesian, dt_)
        pos = stack_positions(system, np.asarray(u_s))
        for z, m in enumerate(meshes):
            v0 = m.vertices_w_offset(1)
            assert pos[z].shape == v0.shape
            err = (pos[z] - v0) - (-drift[z])
            assert np.abs(err).max() < 0.25, (cartesian, z,
                                              np.abs(err).max())


def test_stack_solve_stencil_sharded_8dev(workdir):
    """Stencil solve under the 8-device z-sharding: stays sharded and
    matches the drift like the gather path."""
    import jax
    from feabas_tpu.parallel.window import (stack_solve,
                                            shard_stack_system, JMesh)
    from feabas_tpu.parallel.window import build_link_transpose
    jmesh = JMesh(np.array(jax.devices()), ('z',))
    system, drift = _make_stack(S=8)
    assert system.get('grid_shape') is not None
    system['linc'] = build_link_transpose(system['links'], 8,
                                          system['u'].shape[1])
    sharded = shard_stack_system(system, jmesh)
    u_new, n_it, res = stack_solve(
        sharded['verts0'], sharded['u'], sharded['tris'],
        sharded['multiplier'], sharded['poisson'], sharded['links'],
        sharded['r_rest'], sharded['free'], lam_s=0.01, maxiter=800,
        grid_shape=system['grid_shape'], linc=sharded.get('linc'),
        sten=sharded.get('sten'))
    assert len(u_new.sharding.device_set) == 8
    got = np.asarray(u_new)
    rm = system.get('real_mask')
    for z in range(len(drift)):
        rows = got[z][rm] if rm is not None else got[z]
        assert np.abs(rows - (-drift[z])).max() < 0.15, z
