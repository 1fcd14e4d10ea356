"""Merge manual matches into automatic ones with a clearance radius:
automatic matches within the clearance of a manual point are dropped so
the manual correction dominates locally
(reference: tools/merge_manual_match.py).

Usage: python merge_manual_match.py AUTO_H5 MANUAL_H5 [--out OUT_H5]
       [--clearance PX] [--manual-weight W]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('auto_h5')
    p.add_argument('manual_h5')
    p.add_argument('--out', default=None)
    p.add_argument('--clearance', type=float, default=100.0)
    p.add_argument('--manual-weight', type=float, default=2.0)
    args = p.parse_args()
    from feabas_tpu.aligner import read_matches_from_h5, save_matches_to_h5
    from feabas_tpu.common import Match
    from feabas_tpu import config
    auto = read_matches_from_h5(args.auto_h5)
    manual = read_matches_from_h5(args.manual_h5)
    keep = np.ones(len(auto.weight), bool)
    if len(manual.weight):
        from scipy.spatial import cKDTree
        d, _ = cKDTree(manual.xy0).query(auto.xy0, k=1)
        keep = d > args.clearance
    merged = Match(
        np.concatenate([auto.xy0[keep], manual.xy0]),
        np.concatenate([auto.xy1[keep], manual.xy1]),
        np.concatenate([auto.weight[keep],
                        np.full(len(manual.weight), args.manual_weight)]),
        auto.strain)
    out = args.out or args.auto_h5
    save_matches_to_h5(out, merged, config.montage_resolution())
    print(f'{out}: kept {keep.sum()}/{len(keep)} auto + {len(manual.weight)} manual')


if __name__ == '__main__':
    main()
