"""Synthetic section/tile fixtures with analytic ground truth."""

import numpy as np
from scipy.ndimage import gaussian_filter


def texture(rng, h, w, blur=2.0, contrast=40.0):
    from feabas_tpu.utils.synthetic import texture as _texture
    return _texture(rng, h, w, blur=blur, contrast=contrast)


def tile_grid(rng, rows, cols, tile_h, tile_w, overlap, jitter=3.0,
              world_margin=50):
    """Procedural world texture cut into overlapping tiles with jittered
    stage positions. Returns (world, tiles, true_bboxes, stage_bboxes).

    stage_bboxes simulate imperfect stage coordinates (what a coordinate
    file would contain); true_bboxes are the exact crop locations.
    """
    H = world_margin * 2 + rows * tile_h - (rows - 1) * overlap
    W = world_margin * 2 + cols * tile_w - (cols - 1) * overlap
    world = texture(rng, H, W)
    tiles, true_bboxes, stage_bboxes = [], [], []
    for r in range(rows):
        for c in range(cols):
            x0 = world_margin + c * (tile_w - overlap)
            y0 = world_margin + r * (tile_h - overlap)
            jx, jy = rng.normal(0, jitter, 2) if (r, c) != (0, 0) else (0.0, 0.0)
            x0t, y0t = int(round(x0 + jx)), int(round(y0 + jy))
            tiles.append(world[y0t:y0t + tile_h, x0t:x0t + tile_w].copy())
            true_bboxes.append((x0t, y0t, x0t + tile_w, y0t + tile_h))
            stage_bboxes.append((x0, y0, x0 + tile_w, y0 + tile_h))
    return world, tiles, np.asarray(true_bboxes, float), np.asarray(stage_bboxes, float)


def warped_pair(rng, h, w, amp=4.0, period=80.0):
    """A texture and a smoothly warped copy; returns (img0, img1, disp_fn)
    where disp_fn(xy) gives the displacement of img1 content relative to
    img0: img1(p) = img0(p + disp(p))."""
    import cv2
    img0 = texture(rng, h, w)

    def disp(xy):
        xy = np.asarray(xy, np.float64).reshape(-1, 2)
        return np.stack([
            amp * np.sin(2 * np.pi * xy[:, 1] / period),
            amp * np.cos(2 * np.pi * xy[:, 0] / period),
        ], axis=-1)

    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    d = disp(np.stack([gx.ravel(), gy.ravel()], -1)).astype(np.float32)
    map_x = gx + d[:, 0].reshape(h, w)
    map_y = gy + d[:, 1].reshape(h, w)
    img1 = cv2.remap(img0, map_x, map_y, cv2.INTER_LINEAR,
                     borderMode=cv2.BORDER_REFLECT)
    return img0, img1, disp
