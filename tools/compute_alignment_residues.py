"""Weighted residues of every alignment match pair through the solved
transforms (reference: tools/compute_alignment_residues.py).

Usage: python compute_alignment_residues.py [--out residues.csv]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feabas_tpu import config
from feabas_tpu.storage import join_paths


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--out', default=None)
    args = p.parse_args()
    work_dir = config.get_work_dir()
    out = args.out or join_paths(work_dir, 'align', 'residues.csv')
    from feabas_tpu.aligner import Aligner
    al = Aligner(join_paths(work_dir, 'align', 'mesh'),
                 join_paths(work_dir, 'align', 'tform'),
                 join_paths(work_dir, 'align', 'matches'))
    print(al.write_residue_file(out))


if __name__ == '__main__':
    main()
