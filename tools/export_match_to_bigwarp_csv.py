"""Export match H5 files as BigWarp landmark CSVs for manual editing
(reference: tools/export_match_to_bigwarp_csv.py).

Usage: python export_match_to_bigwarp_csv.py H5 [H5...] [--out-dir DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feabas_tpu import storage


def main():
    p = argparse.ArgumentParser()
    p.add_argument('h5s', nargs='+')
    p.add_argument('--out-dir', default='.')
    args = p.parse_args()
    from feabas_tpu.aligner import read_matches_from_h5
    for path in args.h5s:
        m = read_matches_from_h5(path)
        stem = storage.base_name(path).rsplit('.', 1)[0]
        out = storage.join_paths(args.out_dir, stem + '.csv')
        with storage.File(out, 'w') as f:
            for k, (p0, p1) in enumerate(zip(m.xy0, m.xy1)):
                f.write(f'"Pt-{k}","true",{p1[0]},{p1[1]},{p0[0]},{p0[1]}\n')
        print(out)


if __name__ == '__main__':
    main()
