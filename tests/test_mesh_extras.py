"""Coarse surrogates, region incision, fold detection, coarse-SLM stage."""

import numpy as np
import pytest


def test_coarse_mesh_surrogate(workdir):
    from feabas_tpu.mesh import Mesh
    m = Mesh.from_bbox((0, 0, 200, 200), cartesian=True, mesh_size=20)
    cm = m.coarse_mesh(0.1)
    assert 0 < cm.num_triangles < m.num_triangles * 0.3
    # coarse mesh covers the fine mesh: every fine vertex locatable
    tid = cm.tri_finder(m.vertices_w_offset('INITIAL'), gear='INITIAL',
                        extrapolate=True)
    assert (tid >= 0).all()
    # affine surrogate (reduction 0): one triangle
    ca = m.coarse_mesh(0.0)
    assert ca.num_triangles == 1


def test_incise_region(workdir):
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.material import MaterialTable
    import feabas_tpu.triangulation as T
    v, t = T.cartesian_mesh((0, 0, 200, 100), 10)
    mt = MaterialTable()
    uids = np.zeros(len(t), np.int16)
    cent = v[t].mean(axis=1)
    split_uid = mt['split'].uid if 'split' in mt else None
    mt.add('split', {'mask_label': 200, 'stiffness_multiplier': 1e-2,
                     'area_constraint': 0})
    uids[(cent[:, 0] > 90) & (cent[:, 0] < 110)] = mt['split'].uid
    m = Mesh(v, t, material_ids=uids, material_table=mt)
    assert m.num_connected == 1
    cut = m.incise_region('split')
    assert cut.num_triangles < m.num_triangles
    assert cut.num_connected == 2  # the band is severed


def test_overlapping_triangles(workdir):
    from feabas_tpu.mesh import Mesh
    m = Mesh.from_bbox((0, 0, 60, 60), cartesian=True, mesh_size=20)
    assert m.is_valid('INITIAL')
    v = m.vertices('FIXED').copy()
    # fold one corner over its neighbors (no flip of its own triangle set,
    # just overlap): push a corner vertex deep inside
    k = 0
    v[k] = [30, 30]
    m.set_vertices(v, 'MOVING')
    assert (m.flipped_triangles('MOVING').size > 0
            or m.overlapping_triangles('MOVING').shape[0] > 0)
    assert not m.is_valid('MOVING')


def test_coarse_mesh_slm_stage(workdir, rng):
    """Coarse surrogate relaxation moves a displaced mesh near its target
    at a fraction of the DOF."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.optimizer import SLM, coarse_mesh_SLM
    m0 = Mesh.from_bbox((0, 0, 100, 100), cartesian=True, mesh_size=10,
                        uid=0, locked=True)
    m1 = Mesh.from_bbox((80, 0, 180, 100), cartesian=True, mesh_size=10,
                        uid=1)
    slm = SLM([m0, m1])
    pts = np.stack(np.meshgrid(np.linspace(82, 98, 3),
                               np.linspace(5, 95, 5)), -1).reshape(-1, 2)
    d = np.array([5.0, -7.0])
    slm.add_link_from_coordinates(0, 1, pts, pts - d)
    r0 = slm.match_residues(gear='MOVING').max()
    coarse_mesh_SLM(slm, mesh_reduction_factor=0.0)
    r1 = slm.match_residues(gear='MOVING').max()
    assert r0 > 5 and r1 < 0.5, (r0, r1)
