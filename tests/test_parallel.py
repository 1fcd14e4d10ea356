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


def test_stack_solve_single_device(workdir):
    import jax.numpy as jnp
    from feabas_tpu.parallel.window import stack_solve
    system, drift = _make_stack()
    pos, n_it, res = stack_solve(
        jnp.asarray(system['verts0']), jnp.asarray(system['pos']),
        jnp.asarray(system['tris']), jnp.asarray(system['multiplier']),
        jnp.asarray(system['poisson']),
        tuple(jnp.asarray(a) for a in system['links']),
        jnp.asarray(system['free']), lam_s=0.01, maxiter=800)
    pos = np.asarray(pos)
    # solved sections must counteract the drift: section z's vertices move
    # by -drift[z] (relative to locked section 0)
    got = pos - system['verts0']
    for z in range(len(got)):
        err = got[z] - (-drift[z])
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
    pos, n_it, res = stack_solve(
        sharded['verts0'], sharded['pos'], sharded['tris'],
        sharded['multiplier'], sharded['poisson'], sharded['links'],
        sharded['free'], lam_s=0.01, maxiter=800)
    # result stays sharded along z
    assert len(pos.sharding.device_set) == 8
    got = np.asarray(pos) - system['verts0']
    for z in range(len(got)):
        assert np.abs(got[z] - (-drift[z])).max() < 0.15, z


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
    args = {k: (jnp.asarray(v) if not isinstance(v, tuple) else
                tuple(jnp.asarray(a) for a in v)) for k, v in system.items()}
    pos, n_it, res = stack_solve(
        args['verts0'], args['pos'], args['tris'], args['multiplier'],
        args['poisson'], args['links'], args['free'], lam_s=0.1,
        tol=1e-7, maxiter=1000)
    assert np.isfinite(np.asarray(pos)).all()
    # pure Jacobi needs ~176 iterations on this chain (measured) — the
    # coarse space propagates the long-wavelength drift exactly
    assert int(n_it) < 110, int(n_it)
