"""Mask label surgery: relabel thin high-deformation structures (wrinkles /
folds) in material masks so they mesh as the 'split'/'wrinkle' material
(reference: tools/split_wrinkles.py).

Usage: python split_wrinkles.py MASK_PNG [MASK_PNG...]
       [--label-from 0] [--label-to 50] [--min-len 50] [--max-width 6]
"""

import argparse
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feabas_tpu.common import imread, imwrite


def detect_thin_dark_ridges(img, max_width=6, min_len=50):
    """Thin dark structures: morphological black-hat + skeleton-ish
    filtering by component elongation."""
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE,
                                  (2 * max_width + 1, 2 * max_width + 1))
    bh = cv2.morphologyEx(img, cv2.MORPH_BLACKHAT, k)
    thr = np.quantile(bh[bh > 0], 0.9) if (bh > 0).any() else 1
    cand = (bh >= thr).astype(np.uint8)
    n, lbl, stats, _ = cv2.connectedComponentsWithStats(cand)
    out = np.zeros_like(cand)
    for i in range(1, n):
        w, h, area = stats[i, 2], stats[i, 3], stats[i, 4]
        length = max(w, h)
        if length >= min_len and area / max(length, 1) <= 2 * max_width:
            out[lbl == i] = 1
    return out > 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument('masks', nargs='+')
    p.add_argument('--image-dir', default=None,
                   help='matching image per mask for ridge detection; '
                        'defaults to treating the mask itself as intensity')
    p.add_argument('--label-from', type=int, default=0)
    p.add_argument('--label-to', type=int, default=50)
    p.add_argument('--min-len', type=int, default=50)
    p.add_argument('--max-width', type=int, default=6)
    args = p.parse_args()
    for path in args.masks:
        mask = imread(path, flag=cv2.IMREAD_GRAYSCALE)
        if args.image_dir:
            from feabas_tpu import storage
            img = imread(storage.join_paths(
                args.image_dir, storage.base_name(path)),
                flag=cv2.IMREAD_GRAYSCALE)
        else:
            img = mask
        ridges = detect_thin_dark_ridges(img, max_width=args.max_width,
                                         min_len=args.min_len)
        sel = ridges & (mask == args.label_from)
        mask = mask.copy()
        mask[sel] = args.label_to
        imwrite(path, mask)
        print(f'{path}: relabeled {int(sel.sum())} px')


if __name__ == '__main__':
    main()
