"""Diagnostic plotting of meshes, links, and match coverage.

matplotlib-based QC utilities (capability parity with reference
``feabas/visualization.py``). All functions accept an optional ``ax`` and
return it, so they compose into report figures; ``show=False`` everywhere
for headless use.
"""

import numpy as np

from feabas_tpu import constant as const


def _get_ax(ax=None, figsize=(10, 10)):
    import matplotlib
    matplotlib.use('Agg', force=False)
    import matplotlib.pyplot as plt
    if ax is None:
        _, ax = plt.subplots(figsize=figsize)
    return ax


def plot_mesh(mesh, gear=const.MESH_GEAR_MOVING, ax=None, color_by='material',
              show_index=False, **kwargs):
    """Triangulation plot colored by material / connected component / group
    (reference: visualization.py:50)."""
    ax = _get_ax(ax)
    v = mesh.vertices_w_offset(gear)
    T = mesh.triangles
    if color_by == 'material':
        labels = mesh.material_ids
    elif color_by == 'connected':
        labels = mesh.connected_triangles()
    else:
        labels = np.zeros(mesh.num_triangles, int)
    import matplotlib.cm as cm
    uniq = np.unique(labels)
    for k, lbl in enumerate(uniq):
        sel = labels == lbl
        ax.triplot(v[:, 0], v[:, 1], T[sel],
                   color=cm.tab10(k % 10), lw=kwargs.get('lw', 0.5),
                   alpha=kwargs.get('alpha', 0.8))
    if show_index:
        c = v[T].mean(axis=1)
        for t, (x, y) in enumerate(c):
            ax.text(x, y, str(t), fontsize=5)
    ax.set_aspect('equal')
    ax.invert_yaxis()
    return ax


def plot_montage(meshes, gear=const.MESH_GEAR_MOVING, ax=None, **kwargs):
    """Outline every tile mesh of a section (reference: visualization.py:98)."""
    ax = _get_ax(ax)
    for m in meshes:
        bb = m.bbox(gear=gear)
        ax.plot([bb[0], bb[2], bb[2], bb[0], bb[0]],
                [bb[1], bb[1], bb[3], bb[3], bb[1]],
                lw=kwargs.get('lw', 0.8))
        c = m.vertices_w_offset(gear).mean(axis=0)
        ax.text(c[0], c[1], m.name or str(int(m.uid)), fontsize=6,
                ha='center')
    ax.set_aspect('equal')
    ax.invert_yaxis()
    return ax


def plot_link(link, gear=const.MESH_GEAR_MOVING, ax=None, arrow_scale=1.0,
              **kwargs):
    """Match points with residue arrows (reference: visualization.py:127)."""
    ax = _get_ax(ax)
    p0 = link.xy0(gear=gear)
    d = link.dxy(gear=gear)
    w = link.weight()
    ax.quiver(p0[:, 0], p0[:, 1], d[:, 0], d[:, 1], w,
              angles='xy', scale_units='xy',
              scale=1.0 / max(arrow_scale, 1e-6), cmap='coolwarm',
              width=kwargs.get('width', 0.003))
    ax.set_aspect('equal')
    ax.invert_yaxis()
    return ax


def plot_match_coverage(mesh, matches_xy, ax=None, radius=None, **kwargs):
    """Red/green overlay of match coverage over a section mesh
    (reference tool: tools/visualize_align_match_coverage.py). Areas of the
    mesh within ``radius`` of a match point plot green, uncovered parts
    red."""
    ax = _get_ax(ax)
    v = mesh.vertices_w_offset(const.MESH_GEAR_MOVING)
    T = mesh.triangles
    centers = v[T].mean(axis=1)
    if radius is None:
        bb = mesh.bbox()
        radius = 0.05 * max(bb[2] - bb[0], bb[3] - bb[1])
    if len(matches_xy):
        from scipy.spatial import cKDTree
        d, _ = cKDTree(np.asarray(matches_xy)).query(centers, k=1)
        covered = d < radius
    else:
        covered = np.zeros(len(centers), bool)
    for sel, color in ((covered, 'tab:green'), (~covered, 'tab:red')):
        if sel.any():
            ax.triplot(v[:, 0], v[:, 1], T[sel], color=color, lw=0.4,
                       alpha=0.7)
    if len(matches_xy):
        m = np.asarray(matches_xy)
        ax.plot(m[:, 0], m[:, 1], '.', ms=2, color='k')
    ax.set_aspect('equal')
    ax.invert_yaxis()
    return ax


def save_figure(ax, path, dpi=150):
    fig = ax.get_figure()
    fig.savefig(path, dpi=dpi, bbox_inches='tight')
    import matplotlib.pyplot as plt
    plt.close(fig)
    return path
