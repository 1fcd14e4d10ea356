"""Device xcorr / filter kernels: ground-truth displacement recovery."""

import numpy as np
import pytest


def _textured(rng, h, w, blur=3):
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(rng.normal(0, 1, (h, w)), blur)
    return (img - img.mean()).astype(np.float32)


def test_xcorr_known_shift(rng):
    from feabas_tpu.ops.xcorr import xcorr_fft
    base = _textured(rng, 256, 256)
    shifts = [(5, -7), (0, 0), (-12, 3), (20, 18)]
    img0, img1 = [], []
    for dy, dx in shifts:
        img0.append(base)
        # rolling by +(dy,dx) puts img1's physical center at img0 center
        # - (dy,dx): xcorr reports center0 - center1 = +(dx,dy)
        img1.append(np.roll(base, (dy, dx), axis=(0, 1)))
    dx, dy, conf = xcorr_fft(np.stack(img0), np.stack(img1), pad=True)
    for i, (sy, sx) in enumerate(shifts):
        assert abs(dx[i] - sx) <= 0.51, (i, dx[i], sx)
        assert abs(dy[i] - sy) <= 0.51, (i, dy[i], sy)
    assert (conf > 0.15).all()


def test_xcorr_subpixel(rng):
    from feabas_tpu.ops.xcorr import xcorr_fft
    from scipy.ndimage import shift as ndshift
    base = _textured(rng, 200, 180, blur=2)
    true = (3.3, -2.7)
    img1 = ndshift(base, (true[1], true[0]), order=3, mode='nearest')
    dx, dy, conf = xcorr_fft(base, img1, subpixel=True)
    assert abs(dx - true[0]) < 0.3
    assert abs(dy - true[1]) < 0.3


def test_xcorr_different_sizes(rng):
    """img0/img1 of different sizes: displacement measured center-to-center."""
    from feabas_tpu.ops.xcorr import xcorr_fft
    big = _textured(rng, 300, 300)
    # crop a window whose center sits at (+10, +6) from big's center
    cy, cx = 150 + 10, 150 + 6
    small = big[cy - 64:cy + 64, cx - 64:cx + 64]
    dx, dy, _ = xcorr_fft(big, small)
    assert abs(dx - (-6)) <= 0.51 and abs(dy - (-10)) <= 0.51


def test_xcorr_mirror_confidence(rng):
    from feabas_tpu.ops.xcorr import xcorr_fft
    a = _textured(rng, 128, 128)
    b = np.roll(a, (4, 4), axis=(0, 1))
    unrelated = _textured(np.random.default_rng(777), 128, 128)
    _, _, conf_good = xcorr_fft(a, b)
    _, _, conf_bad = xcorr_fft(a, unrelated)
    assert conf_good > conf_bad + 0.1


def test_xcorr_sigma_prefilter_handles_brightness_gradient(rng):
    """DoG prefilter removes a low-frequency brightness ramp that would
    otherwise dominate the correlation."""
    from feabas_tpu.ops.xcorr import xcorr_fft
    base = _textured(rng, 256, 256, blur=2)
    ramp = np.linspace(0, 50, 256)[None, :].astype(np.float32)
    img0 = base + ramp
    img1 = np.roll(base, (6, 9), axis=(0, 1)) + ramp.T
    dx, dy, conf = xcorr_fft(img0, img1, sigma=2.5)
    assert abs(dx - 9) <= 0.51 and abs(dy - 6) <= 0.51


def test_masked_dog_matches_host(rng):
    from feabas_tpu.ops.filters import masked_dog_filter as dev_dog
    from feabas_tpu.common import masked_dog_filter as host_dog
    img = rng.normal(0, 10, (96, 80)).astype(np.float32)
    mask = np.zeros((96, 80), bool)
    mask[10:70, 5:60] = True
    out_dev = np.asarray(dev_dog(img, 2.0, mask=mask))
    out_host = host_dog(img, 2.0, mask=mask)
    assert np.allclose(out_dev, out_host, atol=5e-3), np.abs(out_dev - out_host).max()


def test_good_fft_size():
    from feabas_tpu.ops.xcorr import good_fft_size
    assert good_fft_size(100, pow2=True) == 128
    assert good_fft_size(128, pow2=True) == 128
    assert good_fft_size(7) == 8
    assert good_fft_size(243) == 243  # 3^5
    assert good_fft_size(101) == 108  # 2^2*27


def test_xcorr_normalize_partial_overlap(rng):
    """With masks + normalize, a shift recoverable only in the overlapped
    region still wins."""
    from feabas_tpu.ops.xcorr import xcorr_fft
    base = _textured(rng, 200, 200)
    img0 = base.copy()
    img1 = np.roll(base, (15, 0), axis=(0, 1))
    m0 = np.zeros_like(base, dtype=bool)
    m0[:120] = True
    img0[~m0] = 0
    dx, dy, conf = xcorr_fft(img0, img1, mask0=m0, normalize=True)
    assert abs(dy - 15) <= 0.51 and abs(dx) <= 0.51


def test_envelope_normalized_peak_accuracy():
    """The windowed-correlation envelope biases raw peaks toward zero
    displacement; normalize='peak' must remove it WITHOUT changing the
    confidence (tuned thresholds), and the int-subpixel DFT upsampler
    must agree with the quadratic fit at the fine scale."""
    from feabas_tpu.ops.xcorr import xcorr_fft
    rng = np.random.default_rng(7)
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(rng.normal(0, 1, (512, 512)), 2.0)
    base = (base / base.std() * 40 + 128).astype(np.float64)
    F = np.fft.fft2(base)
    ky = np.fft.fftfreq(512)[:, None]
    kx = np.fft.fftfreq(512)[None, :]
    errs = {False: [], 'peak': [], 'dft': []}
    confs = {False: [], 'peak': []}
    for sx, sy in [(0.3, 0.0), (0.5, 0.25), (0.75, 0.5), (0.25, 0.75)]:
        img1 = np.real(np.fft.ifft2(F * np.exp(-2j * np.pi * (ky * sy + kx * sx))))
        a = base[128:256, 128:256].astype(np.float32)
        b = img1[128:256, 128:256].astype(np.float32)
        for key, kw in ((False, dict(subpixel=True)),
                        ('peak', dict(subpixel=True, normalize='peak')),
                        ('dft', dict(subpixel=16, normalize='peak'))):
            dx, dy, conf = xcorr_fft(a, b, sigma=2.5, **kw)
            errs[key].append(np.hypot(abs(float(dx)) - sx, abs(float(dy)) - sy))
            if key in confs:
                confs[key].append(float(conf))
    # peak-mode confidence identical to raw
    np.testing.assert_allclose(confs['peak'], confs[False], atol=1e-5)
    # normalization removes most of the envelope bias
    assert np.mean(errs['peak']) < 0.6 * np.mean(errs[False]), errs
    assert np.mean(errs['peak']) < 0.04
    # the DFT upsampler lands in the same (normalized) regime
    assert np.mean(errs['dft']) < 0.06, errs['dft']
