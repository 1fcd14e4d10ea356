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


# ---------------- generic plotting helpers (reference: :155-212) -------- #

def rgb2hex(rgb):
    """(r, g, b) in 0..1 or 0..255 -> '#rrggbb' (reference:
    visualization.py:23)."""
    rgb = np.asarray(rgb, np.float64).ravel()[:3]
    if rgb.max() <= 1.0:
        rgb = rgb * 255.0
    r, g, b = (int(round(v)) for v in rgb)
    return f'#{r:02x}{g:02x}{b:02x}'


def hex2rgb(hx):
    """'#rrggbb' -> (r, g, b) floats in 0..1 (reference:
    visualization.py:29)."""
    hx = hx.lstrip('#')
    return tuple(int(hx[i:i + 2], 16) / 255.0 for i in (0, 2, 4))


def random_color(seed=None, lightness=None):
    """A random saturated color (reference: visualization.py:35)."""
    rng = np.random.default_rng(seed)
    c = rng.random(3)
    if lightness is not None:
        c = c * (1 - lightness) + lightness
    return tuple(c)


def plot_points(xy, ax=None, **kwargs):
    """Scatter a (N, 2) point set (reference: visualization.py:155)."""
    ax = _get_ax(ax)
    xy = np.asarray(xy, np.float64).reshape(-1, 2)
    kwargs.setdefault('s', 4)
    ax.scatter(xy[:, 0], xy[:, 1], **kwargs)
    ax.set_aspect('equal')
    return ax


def _as_ring_list(obj):
    """Coerce one (N, 2) point array (ndarray OR plain nested list) or a
    list of such arrays into a list of (N, 2) arrays."""
    try:
        arr = np.asarray(obj, np.float64)
        if arr.ndim == 2 and arr.shape[1] == 2:
            return [arr]
    except (ValueError, TypeError):
        pass  # ragged list of rings
    return [np.asarray(r, np.float64).reshape(-1, 2) for r in obj]


def plot_lines(lines, ax=None, **kwargs):
    """Plot polylines: one (N, 2) array or a list of them (reference:
    visualization.py:168)."""
    ax = _get_ax(ax)
    lines = _as_ring_list(lines)
    from matplotlib.collections import LineCollection
    segs = [np.asarray(ln, np.float64).reshape(-1, 2) for ln in lines]
    ax.add_collection(LineCollection(segs, **kwargs))
    ax.autoscale_view()
    ax.set_aspect('equal')
    return ax


def plot_polygons(rings, ax=None, facecolor=None, edgecolor='k', alpha=0.5,
                  **kwargs):
    """Fill closed rings: one (N, 2) ring or a list (reference PolygonPatch
    role: visualization.py:185-212)."""
    ax = _get_ax(ax)
    rings = _as_ring_list(rings)
    from matplotlib.patches import Polygon as MplPolygon
    for k, r in enumerate(rings):
        r = np.asarray(r, np.float64).reshape(-1, 2)
        fc = facecolor if facecolor is not None else random_color(k)
        ax.add_patch(MplPolygon(r, closed=True, facecolor=fc,
                                edgecolor=edgecolor, alpha=alpha, **kwargs))
    ax.autoscale_view()
    ax.set_aspect('equal')
    return ax


def plot_geometry(geom, ax=None, simplify_tol=2.0, **kwargs):
    """Plot a :class:`feabas_tpu.spatial.Geometry`: every material
    region's shared boundary arcs, colored by the material label on the
    arc's interior side (reference plot_geometries role:
    visualization.py:200)."""
    ax = _get_ax(ax)
    arcs = geom.boundary_arcs(simplify_tol=simplify_tol)
    # each arc separates exactly two labels; color by the pair
    pairs = sorted({tuple(np.sort(a['labels'])) for a in arcs})
    import matplotlib.pyplot as plt
    cmap = plt.get_cmap('tab10')
    for a in arcs:
        key = tuple(np.sort(a['labels']))
        c = cmap(pairs.index(key) % 10)
        p = a['pts']
        ax.plot(p[:, 0], p[:, 1], color=c, **kwargs)
    ax.set_aspect('equal')
    return ax
