"""Synthetic fixtures shared by tests, the benchmark, the multichip
dryrun, and the rehearsal tools — one texture recipe so their image
statistics cannot drift apart."""

import numpy as np


def texture(rng, h, w, blur=2.0, contrast=40.0):
    """Band-limited random texture in uint8 (mean 128, std ``contrast``)."""
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(rng.normal(0, 1, (h, w)), blur)
    img = img / max(img.std(), 1e-6) * contrast + 128.0
    return np.clip(img, 0, 255).astype(np.uint8)
