"""Convert BigWarp landmark CSV exports into thumbnail match H5 files
(reference: tools/convert_manual_thumbnail_matches.py).

BigWarp CSV rows: name, active, moving_x, moving_y, fixed_x, fixed_y.
The CSV filename must be '{sec0}__to__{sec1}.csv'.

Usage: python convert_manual_thumbnail_matches.py CSV [CSV...]
       [--resolution R] [--out-dir DIR] [--weight W]
"""

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feabas_tpu import config, storage
from feabas_tpu.storage import join_paths


def read_bigwarp_csv(path):
    xy_moving, xy_fixed = [], []
    with storage.File(path, 'r') as f:
        for row in csv.reader(f):
            if len(row) < 6 or str(row[1]).strip().lower() == 'false':
                continue
            try:
                xy_moving.append((float(row[2]), float(row[3])))
                xy_fixed.append((float(row[4]), float(row[5])))
            except ValueError:
                continue
    return np.asarray(xy_fixed), np.asarray(xy_moving)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('csvs', nargs='+')
    p.add_argument('--resolution', type=float, default=None)
    p.add_argument('--out-dir', default=None)
    p.add_argument('--weight', type=float, default=1.0)
    args = p.parse_args()
    from feabas_tpu.aligner import save_matches_to_h5
    from feabas_tpu.common import Match
    res = args.resolution or config.thumbnail_resolution()
    out_dir = args.out_dir or join_paths(config.get_work_dir(),
                                         'thumbnail_align', 'matches')
    for path in args.csvs:
        xy0, xy1 = read_bigwarp_csv(path)
        if xy0.size == 0:
            print(f'{path}: no active landmarks, skipped')
            continue
        stem = storage.base_name(path).rsplit('.', 1)[0]
        out = join_paths(out_dir, stem + '.h5')
        save_matches_to_h5(out, Match(xy0, xy1,
                                      np.full(len(xy0), args.weight), 0.0), res)
        print(out)


if __name__ == '__main__':
    main()
