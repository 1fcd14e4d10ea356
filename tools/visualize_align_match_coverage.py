"""QC overlays: match coverage per aligned section pair
(reference: tools/visualize_align_match_coverage.py).

Usage: python visualize_align_match_coverage.py [--out DIR]
Reads align/{mesh,matches} from the working directory, writes one PNG per
match file with covered mesh areas green and uncovered red.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feabas_tpu import config, storage
from feabas_tpu.storage import join_paths


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', default=None)
    args = p.parse_args()
    work_dir = config.get_work_dir()
    out_dir = args.out or join_paths(work_dir, 'align', 'match_cover')
    mesh_dir = join_paths(work_dir, 'align', 'mesh')
    match_dir = join_paths(work_dir, 'align', 'matches')
    from feabas_tpu.aligner import read_matches_from_h5, parse_match_name
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.visualization import plot_match_coverage, save_figure
    for f in storage.list_folder_content(join_paths(match_dir, '*.h5')):
        sec0, sec1 = parse_match_name(f)
        out = join_paths(out_dir, storage.base_name(f).replace('.h5', '.png'))
        if storage.file_exists(out):
            continue
        m = read_matches_from_h5(f)
        mesh = Mesh.from_h5(join_paths(mesh_dir, sec0 + '.h5'))
        ax = plot_match_coverage(mesh, m.xy0)
        ax.set_title(storage.base_name(f))
        save_figure(ax, out)
        print(out)


if __name__ == '__main__':
    main()
