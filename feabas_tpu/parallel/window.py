"""Multi-chip sliding-window elastic solve.

The 3D alignment relaxation couples consecutive sections with crosslinks
while each section carries its own stiffness — a block-tridiagonal system
along z. Here sections shard across devices on a 1-D ``jax.sharding.Mesh``
('z' axis): intra-section element stiffness matvecs are fully local
(vmapped over the section axis), and the z-neighbor crosslink coupling
slices across the section axis, which XLA lowers to ICI halo exchanges.
CG dot products become global ``psum``-style reductions automatically.

This is the TPU replacement for the reference's buffer-overlap sliding
window (``feabas/aligner.py:538-675``): instead of re-solving overlapping
windows sequentially on one host, one window spans all chips with exact
coupling. Sections are bucketed to one topology (same V, T) by padding —
EM alignment meshes come from the same meshing config, so bucket counts
stay small.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as JMesh, NamedSharding, PartitionSpec as P

from feabas_tpu.ops import fem


def build_stack_system(meshes, links_per_pair, dtype=jnp.float32):
    """Pack S same-topology meshes + neighbor links into batched arrays.

    Args:
        meshes: list of S Mesh objects with IDENTICAL triangles (topology);
            vertices may differ per section.
        links_per_pair: list of S-1 dicts with keys idx0, bary0, idx1,
            bary1, weight — section-local vertex indices linking z to z+1,
            padded to a common length L (weight 0 rows are inert).
    Returns dict of batched numpy arrays ready for sharding.
    """
    S = len(meshes)
    T = meshes[0].triangles
    verts0 = np.stack([m.vertices_w_offset(-1) for m in meshes])  # INITIAL
    pos = np.stack([m.vertices_w_offset(1) for m in meshes])      # MOVING
    mult = []
    poisson = []
    for m in meshes:
        groups = m.element_arrays(gear=-1)
        mm = np.concatenate([g['multiplier'] for g in groups])
        pp = np.concatenate([g['poisson'] for g in groups])
        mult.append(mm)
        poisson.append(pp)
    L = max((l['weight'].shape[0] for l in links_per_pair), default=0)
    idx0 = np.zeros((max(S - 1, 1), L, 3), np.int32)
    bary0 = np.zeros((max(S - 1, 1), L, 3), np.float32)
    idx1 = np.zeros((max(S - 1, 1), L, 3), np.int32)
    bary1 = np.zeros((max(S - 1, 1), L, 3), np.float32)
    weight = np.zeros((max(S - 1, 1), L), np.float32)
    for k, l in enumerate(links_per_pair):
        n = l['weight'].shape[0]
        idx0[k, :n] = l['idx0']
        bary0[k, :n] = l['bary0']
        idx1[k, :n] = l['idx1']
        bary1[k, :n] = l['bary1']
        weight[k, :n] = l['weight']
    locked = np.asarray([m.locked for m in meshes], np.float32)
    return {
        'tris': np.asarray(T, np.int32),
        'verts0': verts0.astype(np.float32),
        'pos': pos.astype(np.float32),
        'multiplier': np.stack(mult).astype(np.float32),
        'poisson': np.stack(poisson).astype(np.float32),
        'links': (idx0, bary0, idx1, bary1, weight),
        'free': (1.0 - locked)[:, None, None].astype(np.float32),
    }


def _stack_matvec(x, Ke, tris, links, free, lam_s, inc=None, imask=None):
    """A @ x for the stacked system; x: (S, V, 2). With an incidence table
    the FEM transpose uses gathers instead of scatter-adds (TPU scatters
    serialize on duplicates)."""
    x = x * free
    if inc is not None:
        y = jax.vmap(lambda xi, Ki: fem.stiffness_matvec_gather(
            xi, Ki, tris, inc, imask))(x, Ke) * lam_s
    else:
        y = jax.vmap(lambda xi, Ki: fem.stiffness_matvec(xi, Ki, tris))(x, Ke) * lam_s
    idx0, bary0, idx1, bary1, weight = links
    # link k couples section k (side0) and k+1 (side1); slicing x across the
    # sharded z axis produces the halo exchange
    x0 = x[:-1]
    x1 = x[1:]
    p0 = jax.vmap(fem.link_eval)(x0, idx0, bary0)
    p1 = jax.vmap(fem.link_eval)(x1, idx1, bary1)
    r = (p1 - p0) * (weight ** 2)[..., None]

    def scatter(xi, idx, b, rr, sign):
        return jnp.zeros_like(xi).at[idx].add(sign * b[:, :, None] * rr[:, None, :])

    y0 = jax.vmap(lambda xi, idx, b, rr: scatter(xi, idx, b, rr, -1.0))(
        x0, idx0, bary0, r)
    y1 = jax.vmap(lambda xi, idx, b, rr: scatter(xi, idx, b, rr, 1.0))(
        x1, idx1, bary1, r)
    y = y.at[:-1].add(y0)
    y = y.at[1:].add(y1)
    return y * free


@functools.partial(jax.jit, static_argnames=('maxiter',))
def stack_solve(verts0, pos, tris, multiplier, poisson, links, free,
                lam_s=1.0, tol=1e-7, maxiter=500, inc=None, imask=None):
    """One window relaxation: returns updated positions (S, V, 2).

    Minimizes lam_s/2 u'Ku + 1/2 |W C p|^2 over free sections, CG under
    while_loop; all arrays may be sharded along the leading z axis.
    """
    # per-section element matrices (local work)
    def per_section(v0):
        B, area2 = fem.shape_matrices(v0[tris])
        return B, area2
    B, area2 = jax.vmap(per_section)(verts0)
    Ke = jax.vmap(fem.eng_element_stiffness)(B, area2, multiplier, poisson)
    u = pos - verts0

    def matvec(x):
        return _stack_matvec(x, Ke, tris, links, free, lam_s, inc=inc,
                             imask=imask)

    # rhs = -(lam_s K u + C^T W r(pos))
    idx0, bary0, idx1, bary1, weight = links
    b = -jax.vmap(lambda ui, Ki: fem.stiffness_matvec(ui, Ki, tris))(u, Ke) * lam_s
    p0 = jax.vmap(fem.link_eval)(pos[:-1], idx0, bary0)
    p1 = jax.vmap(fem.link_eval)(pos[1:], idx1, bary1)
    r0 = (p1 - p0) * (weight ** 2)[..., None]
    b = b.at[:-1].add(jax.vmap(
        lambda xi, idx, bb, rr: jnp.zeros_like(xi).at[idx].add(
            bb[:, :, None] * rr[:, None, :]))(pos[:-1], idx0, bary0, r0))
    b = b.at[1:].add(jax.vmap(
        lambda xi, idx, bb, rr: jnp.zeros_like(xi).at[idx].add(
            -bb[:, :, None] * rr[:, None, :]))(pos[1:], idx1, bary1, r0))
    b = b * free

    diag = jax.vmap(lambda Ki: fem.stiffness_diag(Ki, tris, verts0.shape[1]))(Ke) * lam_s
    dC0 = jax.vmap(lambda idx, bb, w: jnp.zeros((verts0.shape[1], 2), verts0.dtype)
                   .at[idx].add((bb ** 2 * (w ** 2)[:, None])[:, :, None]
                                * jnp.ones((1, 1, 2), verts0.dtype)))(idx0, bary0, weight)
    dC1 = jax.vmap(lambda idx, bb, w: jnp.zeros((verts0.shape[1], 2), verts0.dtype)
                   .at[idx].add((bb ** 2 * (w ** 2)[:, None])[:, :, None]
                                * jnp.ones((1, 1, 2), verts0.dtype)))(idx1, bary1, weight)
    diag = diag.at[:-1].add(dC0).at[1:].add(dC1)
    diag = jnp.where(free > 0, diag, 1.0)

    # two-level preconditioner: the stiffness annihilates uniform
    # per-section translations exactly, so the chain's slow long-
    # wavelength modes live in an (S,S) tridiagonal coarse space built
    # from the crosslink weights alone — solve it exactly (dense inverse,
    # S is tiny) and add the correction to the Jacobi preconditioner
    # (the reference reaches for pyAMG here: feabas/optimizer.py:1969)
    S = pos.shape[0]
    minv = jnp.where(diag > 1e-12, 1.0 / jnp.where(diag > 1e-12, diag, 1.0),
                     1.0)
    freed = free[:, 0, 0]
    Wp = (weight ** 2).sum(axis=1)                      # (S-1,)
    cdiag = jnp.zeros(S, verts0.dtype).at[:-1].add(Wp).at[1:].add(Wp)
    Acm = (jnp.diag(cdiag) + jnp.diag(-Wp, 1) + jnp.diag(-Wp, -1))
    mask2 = freed[:, None] * freed[None, :]
    Acm = jnp.where(mask2 > 0, Acm, 0.0)
    reg = jnp.maximum(cdiag.max(), 1.0)
    Acm = Acm + jnp.diag(jnp.where(freed > 0, 1e-6 * reg, reg))
    Acinv = jnp.linalg.inv(Acm)

    def precond(r):
        rc = r.sum(axis=1)                              # (S, 2)
        cc = jnp.einsum('st,tc->sc', Acinv, rc,
                        precision=jax.lax.Precision.HIGHEST)
        cc = cc * freed[:, None]
        return r * minv + cc[:, None, :] * free

    dx, n_it, res = fem.cg_solve(matvec, b, diag=diag, tol=tol,
                                 maxiter=maxiter, precond=precond)
    return pos + dx * free, n_it, res


def _put_global(arr, sharding):
    """Place a host array on a (possibly multi-host) sharding. Every
    process holds the full numpy system (host metadata is tiny relative to
    device work), so each process materializes exactly its addressable
    shards — the multi-host generalization of ``jax.device_put``."""
    arr = np.asarray(arr)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def shard_stack_system(system, device_mesh):
    """Place the batched arrays on a 1-D device mesh along z.

    Works for a single-process mesh AND a multi-process
    ``jax.distributed`` mesh spanning hosts (DCN x ICI): arrays are built
    with ``make_array_from_callback`` so only addressable shards
    materialize locally; the z-neighbor crosslink slicing in
    ``_stack_matvec`` then lowers to ICI/DCN halo collectives.
    """
    z = NamedSharding(device_mesh, P('z'))
    rep = NamedSharding(device_mesh, P())
    out = dict(system)
    for k in ('verts0', 'pos', 'multiplier', 'poisson', 'free'):
        out[k] = _put_global(system[k], z)
    out['tris'] = _put_global(system['tris'], rep)
    # links live on the left-neighbor shard; S-1 entries shard like z when
    # divisible, else replicate (tiny)
    links = system['links']
    if links[4].shape[0] % device_mesh.devices.size == 0:
        out['links'] = tuple(_put_global(a, z) for a in links)
    else:
        out['links'] = tuple(_put_global(a, rep) for a in links)
    return out


def initialize_multihost(coordinator_address, num_processes, process_id,
                         **kwargs):
    """Join a multi-process JAX cluster (DCN coordination). The TPU-pod
    replacement for the reference's dask/SLURM scale-out of window solves
    (reference: feabas/concurrent.py:147, aligner.py:909): one window's
    block-tridiagonal system spans every chip of every host."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kwargs)


def global_stack_mesh():
    """1-D 'z' mesh over ALL devices of the cluster (all hosts)."""
    return JMesh(np.array(jax.devices()), ('z',))


def gather_stack_result(pos):
    """Full (S, V, 2) numpy result on every process."""
    if jax.process_count() == 1:
        return np.asarray(pos)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(
        pos, tiled=True))


def slm_window_to_stack(slm, shape_gear=None):
    """Bucket an SLM window into the stacked z-chain form, or None.

    Bucketable when every mesh shares one topology, every material is
    linear ENG with no stiffness curve, and every link couples
    z-neighbors — the standard case for serial-section alignment windows
    meshed by one config. Returns (system dict, free_mesh_flags) built at
    ``shape_gear`` (default FIXED, matching optimize_linear semantics).
    """
    from feabas_tpu import constant as const
    shape_gear = const.MESH_GEAR_FIXED if shape_gear is None else shape_gear
    meshes = slm.meshes
    if len(meshes) < 2 or not slm.is_linear:
        return None
    T0 = meshes[0].triangles
    for m in meshes:
        if (m.triangles.shape != T0.shape
                or not np.array_equal(m.triangles, T0)):
            return None
        for g in m.element_arrays(gear=shape_gear):
            if g['knots'] is not None:
                return None
    uid2idx = {m.uid: i for i, m in enumerate(meshes)}
    S = len(meshes)
    pair_links = {}
    for l in slm.active_links():
        i0, i1 = uid2idx[l.uids[0]], uid2idx[l.uids[1]]
        if abs(i0 - i1) != 1:
            return None  # long-range anchor: not a pure z-chain
        k = min(i0, i1)
        flip = i0 > i1
        tid0, bary0 = l._tid0, l._bary0
        tid1, bary1 = l._tid1, l._bary1
        if flip:
            tid0, bary0, tid1, bary1 = tid1, bary1, tid0, bary0
            m_lo, m_hi = meshes[i1], meshes[i0]
        else:
            m_lo, m_hi = meshes[i0], meshes[i1]
        ent = pair_links.setdefault(k, {'idx0': [], 'bary0': [], 'idx1': [],
                                        'bary1': [], 'weight': []})
        ent['idx0'].append(m_lo.triangles[tid0])
        ent['bary0'].append(bary0)
        ent['idx1'].append(m_hi.triangles[tid1])
        ent['bary1'].append(bary1)
        ent['weight'].append(l.weight())
    links_per_pair = []
    for k in range(S - 1):
        ent = pair_links.get(k)
        if ent is None:
            links_per_pair.append({
                'idx0': np.zeros((0, 3), np.int32),
                'bary0': np.zeros((0, 3), np.float32),
                'idx1': np.zeros((0, 3), np.int32),
                'bary1': np.zeros((0, 3), np.float32),
                'weight': np.zeros(0, np.float32)})
        else:
            links_per_pair.append(
                {kk: np.concatenate(vv) for kk, vv in ent.items()})
    verts0 = np.stack([m.vertices_w_offset(shape_gear) for m in meshes])
    pos = np.stack([m.vertices_w_offset(const.MESH_GEAR_MOVING)
                    for m in meshes])
    mult, poisson = [], []
    for m in meshes:
        groups = m.element_arrays(gear=shape_gear)
        mult.append(np.concatenate([g['multiplier'] for g in groups]))
        poisson.append(np.concatenate([g['poisson'] for g in groups]))
    L = max((l['weight'].shape[0] for l in links_per_pair), default=0)
    # pow2 bucket so the jitted solve recompiles per size class, not per
    # window (zero-weight padding rows are inert)
    L = max(8, 1 << (int(max(L, 1)) - 1).bit_length())
    idx0 = np.zeros((S - 1, L, 3), np.int32)
    bary0 = np.zeros((S - 1, L, 3), np.float32)
    idx1 = np.zeros((S - 1, L, 3), np.int32)
    bary1 = np.zeros((S - 1, L, 3), np.float32)
    weight = np.zeros((S - 1, L), np.float32)
    for k, l in enumerate(links_per_pair):
        n = l['weight'].shape[0]
        idx0[k, :n] = l['idx0']
        bary0[k, :n] = l['bary0']
        idx1[k, :n] = l['idx1']
        bary1[k, :n] = l['bary1']
        weight[k, :n] = l['weight']
    locked = np.asarray([m.locked for m in meshes], np.float32)
    system = {
        'tris': np.asarray(T0, np.int32),
        'verts0': verts0.astype(np.float32),
        'pos': pos.astype(np.float32),
        'multiplier': np.stack(mult).astype(np.float32),
        'poisson': np.stack(poisson).astype(np.float32),
        'links': (idx0, bary0, idx1, bary1, weight),
        'free': (1.0 - locked)[:, None, None].astype(np.float32),
    }
    return system


@functools.partial(jax.jit)
def _stack_lambda_balance(verts0, tris, multiplier, poisson, links, ratio):
    """Trace-ratio stiffness balance for the stacked system (matches
    SLM._balance_lambdas semantics)."""
    def per_section(v0):
        return fem.shape_matrices(v0[tris])
    B, area2 = jax.vmap(per_section)(verts0)
    Ke = jax.vmap(fem.eng_element_stiffness)(B, area2, multiplier, poisson)
    dK = jax.vmap(lambda Ki: fem.stiffness_diag(Ki, tris, verts0.shape[1]))(Ke)
    idx0, bary0, idx1, bary1, weight = links
    nv = verts0.shape[1]
    dC = jnp.zeros_like(dK)
    dC0 = jax.vmap(lambda idx, bb, w: jnp.zeros((nv, 2), verts0.dtype)
                   .at[idx].add((bb ** 2 * (w ** 2)[:, None])[:, :, None]
                                * jnp.ones((1, 1, 2), verts0.dtype)))(
        idx0, bary0, weight)
    dC1 = jax.vmap(lambda idx, bb, w: jnp.zeros((nv, 2), verts0.dtype)
                   .at[idx].add((bb ** 2 * (w ** 2)[:, None])[:, :, None]
                                * jnp.ones((1, 1, 2), verts0.dtype)))(
        idx1, bary1, weight)
    dC = dC.at[:-1].add(dC0).at[1:].add(dC1)
    tr_c = jnp.sum(dC)
    tr_k = jnp.sum(jnp.where(dC != 0, dK, 0.0))
    ok = (tr_c > 0) & (tr_k > 0)
    return jnp.where(ok, ratio * tr_c / jnp.where(tr_k > 0, tr_k, 1.0), 1.0)


def multihost_window_solve(meshes, links_per_pair, lam_s=1.0, tol=1e-7,
                           maxiter=500):
    """Solve one window across every device of a (multi-host) cluster.

    Builds the stacked system on host, shards it over the global 'z'
    mesh, runs the jitted CG (collectives ride ICI within a host and DCN
    across hosts), and returns the full solution on every process.
    """
    system = build_stack_system(meshes, links_per_pair)
    jmesh = global_stack_mesh()
    sharded = shard_stack_system(system, jmesh)
    pos, n_it, res = stack_solve(
        sharded['verts0'], sharded['pos'], sharded['tris'],
        sharded['multiplier'], sharded['poisson'], sharded['links'],
        sharded['free'], lam_s=lam_s, tol=tol, maxiter=maxiter)
    return gather_stack_result(pos), int(n_it), float(res)
