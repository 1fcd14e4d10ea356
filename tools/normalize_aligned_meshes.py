"""Apply one rigid normalization to all aligned transforms so the stack's
bounding box corner sits at a fixed offset and net rotation is removed
(reference: tools/normalize_aligned_meshes.py).

Usage: python normalize_aligned_meshes.py [--offset X Y] [--derotate]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feabas_tpu import config, storage
from feabas_tpu.storage import join_paths


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--offset', type=float, nargs=2, default=(0.0, 0.0))
    p.add_argument('--derotate', action='store_true')
    args = p.parse_args()
    from feabas_tpu.aligner import normalize_transforms
    work_dir = config.get_work_dir()
    tform_dir = join_paths(work_dir, 'align', 'tform')
    files = storage.list_folder_content(join_paths(tform_dir, '*.h5'))
    if not files:
        print('no tforms found')
        return
    bbox = normalize_transforms(files,
                                angle=None if args.derotate else 0.0,
                                offset=tuple(args.offset))
    print(f'normalized {len(files)} tforms; canvas bbox {bbox}')


if __name__ == '__main__':
    main()
