"""FEM element math & matrix-free solver correctness."""

import numpy as np
import pytest


def _ref_eng_stiffness(tripts, nu=0.0, mult=1.0):
    """Independent textbook CST stiffness: K = 2A * B^T D B with B from
    shape-function gradients (scaled to the framework's area2 convention)."""
    p = np.asarray(tripts, dtype=np.float64)
    e = np.roll(p, -1, axis=0) - np.roll(p, 1, axis=0)
    area2 = abs(e[0, 0] * e[1, 1] - e[0, 1] * e[1, 0])
    gx = e[:, 1] / area2
    gy = -e[:, 0] / area2
    B = np.zeros((3, 6))
    B[0, 0::2] = gx
    B[1, 1::2] = gy
    B[2, 0::2] = gy
    B[2, 1::2] = gx
    D = np.array([[1, nu, 0], [nu, 1, 0], [0, 0, (1 - nu) / 2]], dtype=np.float64)
    return mult * area2 * B.T @ D @ B


def test_eng_stiffness_matches_textbook(rng):
    from feabas_tpu.ops import fem
    import jax.numpy as jnp
    tripts = rng.normal(0, 10, (5, 3, 2)).astype(np.float64)
    B, area2 = fem.shape_matrices(jnp.asarray(tripts))
    for nu in (0.0, 0.3):
        Ke = np.asarray(fem.eng_element_stiffness(
            B, area2, jnp.ones(5), jnp.full(5, nu)))
        for n in range(5):
            K_ref = _ref_eng_stiffness(tripts[n], nu=nu)
            assert np.allclose(Ke[n], K_ref, atol=1e-6), (n, nu)


def test_eng_rigid_modes_nullspace(rng):
    from feabas_tpu.ops import fem
    import jax.numpy as jnp
    tripts = rng.normal(0, 5, (4, 3, 2))
    B, area2 = fem.shape_matrices(jnp.asarray(tripts))
    Ke = np.asarray(fem.eng_element_stiffness(B, area2, jnp.ones(4), jnp.zeros(4)))
    tx = np.tile([1, 0], 3)
    ty = np.tile([0, 1], 3)
    for n in range(4):
        assert np.abs(Ke[n] @ tx).max() < 1e-5
        assert np.abs(Ke[n] @ ty).max() < 1e-5
        # infinitesimal rotation: u = (-y, x)
        rot = np.stack([-tripts[n, :, 1], tripts[n, :, 0]], -1).ravel()
        assert np.abs(Ke[n] @ rot).max() < 1e-4
        w = np.linalg.eigvalsh(Ke[n])
        assert w.min() > -1e-5  # PSD


def test_svk_linearizes_to_eng(rng):
    from feabas_tpu.ops import fem
    import jax.numpy as jnp
    tripts = rng.normal(0, 3, (3, 3, 2))
    B, area2 = fem.shape_matrices(jnp.asarray(tripts))
    mult, nu = jnp.ones(3), jnp.full(3, 0.2)
    K_eng = np.asarray(fem.eng_element_stiffness(B, area2, mult, nu))
    K_svk, P_svk = fem.svk_element(B, area2, jnp.zeros((3, 6)), mult, nu)
    assert np.allclose(np.asarray(K_svk), K_eng, atol=1e-5)
    assert np.abs(np.asarray(P_svk)).max() < 1e-6


@pytest.mark.parametrize('model', ['svk', 'nhk'])
def test_tangent_is_force_jacobian(model, rng):
    """K must equal dP/duv (finite differences) at a deformed state."""
    from feabas_tpu.ops import fem
    import jax.numpy as jnp
    tripts = rng.normal(0, 2, (1, 3, 2))
    B, area2 = fem.shape_matrices(jnp.asarray(tripts))
    uv0 = 0.05 * rng.normal(0, 1, (1, 6))
    mult = jnp.ones(1)

    def force(uv):
        uv = jnp.asarray(uv.reshape(1, 6))
        if model == 'svk':
            _, P = fem.svk_element(B, area2, uv, mult, jnp.full(1, 0.3))
        else:
            _, P = fem.nhk_element(B, area2, uv, mult)
        return np.asarray(P)[0]

    if model == 'svk':
        K, _ = fem.svk_element(B, area2, jnp.asarray(uv0), mult, jnp.full(1, 0.3))
    else:
        K, _ = fem.nhk_element(B, area2, jnp.asarray(uv0), mult)
    K = np.asarray(K)[0]
    eps = 1e-5
    K_fd = np.zeros((6, 6))
    for j in range(6):
        d = np.zeros(6)
        d[j] = eps
        K_fd[:, j] = (force(uv0[0] + d) - force(uv0[0] - d)) / (2 * eps)
    assert np.allclose(K, K_fd, atol=2e-3), np.abs(K - K_fd).max()


def test_nhk_zero_at_rest(rng):
    from feabas_tpu.ops import fem
    import jax.numpy as jnp
    tripts = rng.normal(0, 2, (2, 3, 2))
    B, area2 = fem.shape_matrices(jnp.asarray(tripts))
    _, P = fem.nhk_element(B, area2, jnp.zeros((2, 6)), jnp.ones(2))
    assert np.abs(np.asarray(P)).max() < 1e-6


def _grid_mesh(nx, ny, spacing=1.0):
    """Simple right-triangle grid: vertices (N,2), triangles (M,3)."""
    xs, ys = np.meshgrid(np.arange(nx), np.arange(ny))
    verts = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float64) * spacing
    tris = []
    for j in range(ny - 1):
        for i in range(nx - 1):
            v0 = j * nx + i
            tris.append([v0, v0 + 1, v0 + nx])
            tris.append([v0 + 1, v0 + nx + 1, v0 + nx])
    return verts, np.asarray(tris, dtype=np.int32)


def _dense_system(verts, tris, links, lam=1.0):
    """Dense numpy assembly of lam*K + C^T W C for cross-checking."""
    nv = len(verts)
    A = np.zeros((2 * nv, 2 * nv))
    for t in tris:
        Ke = _ref_eng_stiffness(verts[t])
        dof = np.stack([2 * t, 2 * t + 1], -1).ravel()
        A[np.ix_(dof, dof)] += lam * Ke
    idx0, bary0, idx1, bary1, w = links
    for l in range(len(w)):
        row = np.zeros(2 * nv)
        for i in range(3):
            row[2 * idx1[l, i]] += bary1[l, i]
            row[2 * idx0[l, i]] -= bary0[l, i]
        for c in range(2):
            rc = np.roll(row, c)  # x-row then y-row (interleaved dofs)
            A += w[l] ** 2 * np.outer(rc, rc)
    return A


def test_matvec_and_diag_match_dense(rng):
    from feabas_tpu.ops import fem
    import jax.numpy as jnp
    verts, tris = _grid_mesh(4, 3)
    nv = len(verts)
    B, area2 = fem.shape_matrices(jnp.asarray(verts[tris]))
    Ke = fem.eng_element_stiffness(B, area2, jnp.ones(len(tris)), jnp.zeros(len(tris)))
    # realistic links: each side is one triangle's (distinct) corners, and
    # the two sides come from disjoint index ranges (two meshes)
    L = 6
    half = nv // 2
    idx0 = np.stack([rng.permutation(half)[:3] for _ in range(L)]).astype(np.int32)
    idx1 = np.stack([half + rng.permutation(nv - half)[:3] for _ in range(L)]).astype(np.int32)
    b0 = rng.random((L, 3))
    b0 /= b0.sum(1, keepdims=True)
    b1 = rng.random((L, 3))
    b1 /= b1.sum(1, keepdims=True)
    w = rng.random(L) + 0.5
    A = _dense_system(verts, tris, (idx0, b0, idx1, b1, w), lam=1.0)

    x = rng.normal(0, 1, (nv, 2))
    xj = jnp.asarray(x)
    y = (np.asarray(fem.stiffness_matvec(xj, Ke, jnp.asarray(tris)))
         + np.asarray(fem.crosslink_matvec(xj, jnp.asarray(idx0), jnp.asarray(b0),
                                           jnp.asarray(idx1), jnp.asarray(b1),
                                           jnp.asarray(w))))
    y_ref = (A @ x.ravel()).reshape(nv, 2)
    assert np.allclose(y, y_ref, atol=1e-5), np.abs(y - y_ref).max()

    d = (np.asarray(fem.stiffness_diag(Ke, jnp.asarray(tris), nv))
         + np.asarray(fem.crosslink_diag(nv, jnp.asarray(idx0), jnp.asarray(b0),
                                         jnp.asarray(idx1), jnp.asarray(b1),
                                         jnp.asarray(w))))
    assert np.allclose(d.ravel(), np.diag(A), atol=1e-5)


def test_cg_matches_direct_solve(rng):
    from feabas_tpu.ops import fem
    import jax.numpy as jnp
    verts, tris = _grid_mesh(5, 4)
    nv = len(verts)
    B, area2 = fem.shape_matrices(jnp.asarray(verts[tris]))
    Ke = fem.eng_element_stiffness(B, area2, jnp.ones(len(tris)), jnp.zeros(len(tris)))
    # anchor springs on two corner vertices remove rigid modes
    L = 2
    idx0 = np.array([[0, 0, 0], [nv - 1, nv - 1, nv - 1]], dtype=np.int32)
    bary0 = np.array([[1.0, 0, 0], [1.0, 0, 0]])
    idx1 = idx0
    bary1 = np.zeros((L, 3))
    w = np.array([3.0, 3.0])
    A = _dense_system(verts, tris, (idx0, bary0, idx1, bary1, w), lam=1.0)
    b = rng.normal(0, 1, (nv, 2))

    tj = jnp.asarray(tris)

    def matvec(x):
        return (fem.stiffness_matvec(x, Ke, tj)
                + fem.crosslink_matvec(x, jnp.asarray(idx0), jnp.asarray(bary0),
                                       jnp.asarray(idx1), jnp.asarray(bary1),
                                       jnp.asarray(w)))

    diag = (fem.stiffness_diag(Ke, tj, nv)
            + fem.crosslink_diag(nv, jnp.asarray(idx0), jnp.asarray(bary0),
                                 jnp.asarray(idx1), jnp.asarray(bary1),
                                 jnp.asarray(w)))
    x, it, res = fem.cg_solve(matvec, jnp.asarray(b), diag=diag, tol=1e-10, maxiter=2000)
    x_ref = np.linalg.solve(A, b.ravel()).reshape(nv, 2)
    assert np.allclose(np.asarray(x), x_ref, atol=1e-3), np.abs(np.asarray(x) - x_ref).max()
    assert int(it) < 2000


def test_stiffness_curve_interp():
    from feabas_tpu.ops import fem
    from feabas_tpu.material import asymmetrical_elasticity, Material
    import jax.numpy as jnp
    f = asymmetrical_elasticity()
    mat = Material(stiffness_func_factory='feabas_tpu.material.asymmetrical_elasticity')
    kx, ky = mat.stiffness_curve_knots()
    J = jnp.asarray([0.2, 0.9, 1.0, 2.0])
    got = np.asarray(fem.stiffness_curve_multiplier(J, jnp.asarray(kx), jnp.asarray(ky)))
    want = f(np.asarray(J))
    assert np.allclose(got, want, atol=0.05)


def test_gather_matvec_matches_scatter(rng):
    from feabas_tpu.ops import fem
    import jax.numpy as jnp
    verts, tris = _grid_mesh(6, 5)
    nv = len(verts)
    B, area2 = fem.shape_matrices(jnp.asarray(verts[tris]))
    Ke = fem.eng_element_stiffness(B, area2, jnp.ones(len(tris)),
                                   jnp.full(len(tris), 0.2))
    inc, mask = fem.build_incidence(tris, nv)
    x = jnp.asarray(rng.normal(0, 1, (nv, 2)))
    y_scatter = fem.stiffness_matvec(x, Ke, jnp.asarray(tris))
    y_gather = fem.stiffness_matvec_gather(x, Ke, jnp.asarray(tris),
                                           jnp.asarray(inc), jnp.asarray(mask))
    assert np.allclose(np.asarray(y_scatter), np.asarray(y_gather), atol=1e-10)


def test_lattice_embedding_families(rng):
    """Embedding detection: cartesian grids and the structured staggered
    bbox lattice embed; border-banded tile meshes and PSLG meshes do not
    (they fall back to the gather matvec)."""
    from feabas_tpu.ops import fem
    from feabas_tpu.triangulation import (cartesian_mesh,
                                          equilateral_bbox_mesh,
                                          border_refined_mesh)
    v, t = cartesian_mesh((0, 0, 500, 400), 50)
    cell_of, (ny, nx) = fem.lattice_embedding(v, t)
    assert ny * nx == v.shape[0]                     # full bijection
    assert np.unique(cell_of).size == v.shape[0]
    v, t = equilateral_bbox_mesh((0, 0, 500, 400), 50)
    out = fem.lattice_embedding(v, t)
    assert out is not None
    cell_of, (ny, nx) = out
    assert np.unique(cell_of).size == v.shape[0]
    assert v.shape[0] >= 0.9 * ny * nx               # few boundary holes
    pos = np.stack([cell_of % nx, cell_of // nx], -1)
    for a, b in ((0, 1), (1, 2), (2, 0)):
        assert np.abs(pos[t[:, a]] - pos[t[:, b]]).max() <= 1
    v, t = border_refined_mesh((0, 0, 900, 900), 40, bd_width=120)
    assert fem.lattice_embedding(v, t) is None


def test_stencil_matvec_matches_scatter(rng):
    """The 9-plane lattice stencil matvec equals the element
    gather/scatter matvec on both lattice families, including
    heterogeneous multipliers (zeros = inert elements)."""
    from feabas_tpu.ops import fem
    from feabas_tpu.triangulation import (cartesian_mesh,
                                          equilateral_bbox_mesh)
    import jax.numpy as jnp
    for gen in (cartesian_mesh, equilateral_bbox_mesh):
        verts, tris = gen((0, 0, 400, 300), 35)
        nv = len(verts)
        B, area2 = fem.shape_matrices(jnp.asarray(verts[tris]))
        mult = jnp.asarray(rng.uniform(0, 2, len(tris)))
        mult = mult * (rng.uniform(size=len(tris)) > 0.1)
        Ke = fem.eng_element_stiffness(B, area2, mult,
                                       jnp.full(len(tris), 0.2))
        x = rng.normal(0, 1, (nv, 2))
        y_ref = np.asarray(fem.stiffness_matvec(jnp.asarray(x), Ke,
                                                jnp.asarray(tris)))
        d_ref = np.asarray(fem.stiffness_diag(Ke, jnp.asarray(tris), nv))
        cell_of, (ny, nx) = fem.lattice_embedding(verts, tris)
        Vg = ny * nx
        tris_p = cell_of[tris]
        xp = np.zeros((Vg, 2))
        xp[cell_of] = x
        tgt = fem.stencil_targets(tris_p, nx, Vg)
        C = fem.stencil_assemble(Ke, jnp.asarray(tgt), Vg)
        # gather-table assembly (no-scatter path) is exact vs the scatter
        rows = fem.build_stencil_assembly(tris_p, nx, Vg)
        C_g = fem.stencil_assemble_gather(Ke, jnp.asarray(rows))
        assert np.allclose(np.asarray(C_g), np.asarray(C),
                           atol=1e-6), gen.__name__
        y_p = np.asarray(fem.stiffness_matvec_stencil(jnp.asarray(xp), C,
                                                      ny, nx))
        d_p = np.asarray(fem.stencil_diag(C, Vg))
        assert np.allclose(y_p[cell_of], y_ref, atol=1e-8), gen.__name__
        assert np.allclose(d_p[cell_of], d_ref, atol=1e-10), gen.__name__
        hole = np.ones(Vg, bool)
        hole[cell_of] = False
        if hole.any():                                # holes stay silent
            assert np.abs(y_p[hole]).max() == 0.0
