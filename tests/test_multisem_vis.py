"""MultiSEM beam-pattern machinery and visualization smoke tests."""

import numpy as np
import pytest


def test_beam_layout():
    from feabas_tpu.multisem import (beam_coordinate_vectors, beam_neighbors,
                                     mfovids_beamids_from_filenames)
    c61 = beam_coordinate_vectors(61)
    assert len(np.unique(c61, axis=0)) == 61
    nbs = beam_neighbors(61)
    # center beam (0) has 6 neighbors
    deg = np.zeros(61)
    for a, b in nbs:
        deg[a] += 1
        deg[b] += 1
    assert deg[0] == 6
    mf, bm = mfovids_beamids_from_filenames(
        ['001_000012_005_2022-04-26T13.bmp', '001_000012_001_x.bmp'])
    assert mf.tolist() == [12, 12] and bm.tolist() == [4, 0]


def test_estimate_beam_pattern(rng):
    from feabas_tpu.multisem import (beam_coordinate_vectors, beam_neighbors,
                                     estimate_beam_pattern)
    e0 = np.array([100.0, 2.0])
    e1 = np.array([48.0, 86.0])
    nbs = beam_neighbors(61)
    obs = []
    pairs = list(nbs.items())
    for (pair, base) in pairs[::2]:  # observe only half the pairs
        true = base[0] * e0 + base[1] * e1
        for _ in range(3):
            obs.append((pair, (true + rng.normal(0, 0.3, 2), 1.0)))
    pattern = estimate_beam_pattern(obs, beam_num=61)
    assert pattern is not None
    for pair, base in pairs:
        want = base[0] * e0 + base[1] * e1
        assert np.linalg.norm(pattern[pair] - want) < 1.5, pair


def test_filter_links_from_pattern(workdir, rng):
    """Bad intra-mFoV links get disabled; missing neighbors get pseudo
    links."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.optimizer import SLM
    from feabas_tpu.multisem import (filter_links_from_sfov_pattern,
                                     beam_coordinate_vectors, beam_neighbors)
    e0 = np.array([90.0, 0.0])
    e1 = np.array([45.0, 78.0])
    coords = beam_coordinate_vectors(61)
    n_tiles = 10
    meshes = []
    offsets = []
    for i in range(n_tiles):
        off = coords[i, 0] * e0 + coords[i, 1] * e1
        m = Mesh.from_bbox((0, 0, 100, 90), cartesian=True, mesh_size=50,
                           uid=i)
        m.set_translation(off, gear=(-1, 0))
        meshes.append(m)
        offsets.append(off)
    slm = SLM(meshes)
    nbs = beam_neighbors(61)
    links = []
    bad_link = None
    for (b0, b1) in nbs:
        if b0 >= n_tiles or b1 >= n_tiles:
            continue
        d = offsets[b1] - offsets[b0]
        pts0 = np.array([[50, 45]]) + d / 2
        pts1 = pts0 - d
        link = slm.add_link_from_coordinates(b0, b1, pts0, pts1,
                                             weight=np.ones(1))
        links.append(((b0, b1), link))
    # corrupt one link by 20px
    (bb, bad_link) = links[0]
    bad_link._bary0 = bad_link._bary0  # anchors unchanged...
    # rebuild corrupted: replace with shifted coordinates
    slm.links.remove(bad_link)
    d = offsets[bb[1]] - offsets[bb[0]]
    pts0 = np.array([[50, 45]]) + d / 2 + np.array([20.0, -15.0])
    pts1 = np.array([[50, 45]]) - d / 2
    bad_link = slm.add_link_from_coordinates(bb[0], bb[1], pts0, pts1,
                                             weight=np.ones(1))
    # drop one good link entirely so a pseudo link gets created
    dropped = links[1][1]
    slm.links.remove(dropped)
    mfovs = np.zeros(n_tiles, int)
    beams = np.arange(n_tiles)
    n_disabled, n_pseudo = filter_links_from_sfov_pattern(
        slm, mfovs, beams, deviation_thresh=5.0)
    assert n_disabled == 1 and bad_link.disabled
    assert n_pseudo >= 1


def test_visualization_smoke(workdir, tmp_path):
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.optimizer import SLM, Link
    from feabas_tpu import visualization as vis
    m0 = Mesh.from_bbox((0, 0, 100, 100), cartesian=True, mesh_size=25, uid=0)
    m1 = Mesh.from_bbox((80, 0, 180, 100), cartesian=True, mesh_size=25, uid=1)
    ax = vis.plot_mesh(m0)
    vis.save_figure(ax, str(tmp_path / 'mesh.png'))
    ax = vis.plot_montage([m0, m1])
    vis.save_figure(ax, str(tmp_path / 'montage.png'))
    pts = np.array([[85, 20], [95, 60]], float)
    link = Link.from_coordinates(m0, m1, pts, pts)
    ax = vis.plot_link(link)
    vis.save_figure(ax, str(tmp_path / 'link.png'))
    ax = vis.plot_match_coverage(m0, pts)
    vis.save_figure(ax, str(tmp_path / 'cover.png'))
    for f in ('mesh.png', 'montage.png', 'link.png', 'cover.png'):
        assert (tmp_path / f).stat().st_size > 1000


def test_generic_plotting_helpers(tmp_path):
    """Color helpers round-trip; point/line/polygon/geometry plots render
    without error (reference: visualization.py:23-44,155-212)."""
    import numpy as np
    from feabas_tpu.visualization import (rgb2hex, hex2rgb, random_color,
                                          plot_points, plot_lines,
                                          plot_polygons, plot_geometry,
                                          save_figure)
    assert rgb2hex((1.0, 0, 0)) == '#ff0000'
    assert hex2rgb('#00ff00') == (0.0, 1.0, 0.0)
    assert np.allclose(hex2rgb(rgb2hex((0.2, 0.4, 0.6))), (0.2, 0.4, 0.6),
                       atol=1 / 255)
    c = random_color(seed=0)
    assert len(c) == 3 and all(0 <= v <= 1 for v in c)
    ax = plot_points(np.random.default_rng(0).random((20, 2)) * 100)
    plot_lines([np.array([[0, 0], [50, 50], [100, 0]])], ax=ax)
    plot_polygons(np.array([[10, 10], [90, 10], [50, 80]]), ax=ax)
    # geometry arcs from a 2-material label mask
    from feabas_tpu.spatial import Geometry
    mask = np.ones((60, 60), np.uint8) * 100
    mask[20:40, 20:40] = 200
    geom = Geometry(mask)
    ax2 = plot_geometry(geom)
    out = str(tmp_path / 'plot.png')
    save_figure(ax, out)
    import os
    assert os.path.exists(out)
