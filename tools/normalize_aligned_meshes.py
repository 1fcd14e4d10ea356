"""Apply one rigid normalization to all aligned transforms so the stack's
bounding box corner sits at a fixed offset and net rotation is removed
(reference: tools/normalize_aligned_meshes.py).

Usage: python normalize_aligned_meshes.py [--offset X Y] [--derotate]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feabas_tpu import config, storage
from feabas_tpu.storage import join_paths


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--offset', type=float, nargs=2, default=(0.0, 0.0))
    p.add_argument('--derotate', action='store_true')
    args = p.parse_args()
    from feabas_tpu.mesh import Mesh
    from feabas_tpu import constant as const
    from feabas_tpu.spatial import find_rotation_for_minimum_rectangle
    work_dir = config.get_work_dir()
    tform_dir = join_paths(work_dir, 'align', 'tform')
    files = storage.list_folder_content(join_paths(tform_dir, '*.h5'))
    meshes = [Mesh.from_h5(f) for f in files]
    if not meshes:
        print('no tforms found')
        return
    pts = np.concatenate([m.vertices_w_offset(const.MESH_GEAR_MOVING)
                          for m in meshes])
    T = np.eye(3)
    if args.derotate:
        theta = find_rotation_for_minimum_rectangle(pts.astype(np.float32))
        T[:2, :2] = [[np.cos(theta), np.sin(theta)],
                     [-np.sin(theta), np.cos(theta)]]
        pts = pts @ T[:2, :2]
    corner = pts.min(axis=0)
    T[2, :2] = np.asarray(args.offset) - corner
    for f, m in zip(files, meshes):
        m.apply_affine(T, gear=(const.MESH_GEAR_MOVING, const.MESH_GEAR_MOVING))
        m.save_to_h5(f)
        print(f)


if __name__ == '__main__':
    main()
