"""Headline benchmark: stitch-matching throughput (block pairs/sec).

Runs the device xcorr matching step (masked DoG + rfft2 conj-product +
peak + mirror confidence + subpixel) end-to-end on batches of 128x128
block pairs — the hot loop of stitching/alignment matching (BASELINE.json
metric "matches/sec"). The baseline is the same computation through
scipy.fft on the host CPU (the reference's compute path,
``feabas/matcher.py:22``), all cores.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def _make_batch(n, h, w, seed=0):
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(seed)
    base = gaussian_filter(rng.normal(0, 1, (h + 64, w + 64)), 2)
    base = (base / base.std() * 40 + 128).clip(0, 255).astype(np.uint8)
    shifts = rng.integers(-10, 10, (n, 2))
    img0 = np.empty((n, h, w), np.uint8)
    img1 = np.empty((n, h, w), np.uint8)
    for i, (dy, dx) in enumerate(shifts):
        img0[i] = base[32:32 + h, 32:32 + w]
        img1[i] = base[32 + dy:32 + dy + h, 32 + dx:32 + dx + w]
    return img0, img1, shifts


def _cpu_reference(img0, img1, sigma=2.5):
    """The reference's xcorr hot loop: scipy rfft2 path (multithreaded)."""
    from scipy import fft
    from scipy.ndimage import gaussian_filter1d

    def dog(x):
        f0 = gaussian_filter1d(gaussian_filter1d(
            x.astype(np.float32), sigma, axis=-1, mode='nearest'),
            sigma, axis=-2, mode='nearest')
        f1 = gaussian_filter1d(gaussian_filter1d(
            f0, sigma, axis=-1, mode='nearest'), sigma, axis=-2, mode='nearest')
        return f0 - f1

    a, b = dog(img0), dog(img1)
    fftshp = (256, 256)
    with fft.set_workers(-1):
        F0 = fft.rfft2(a, s=fftshp)
        F1 = fft.rfft2(b, s=fftshp)
        C = fft.irfft2(np.conj(F0) * F1, s=fftshp)
        Cm = np.abs(fft.irfft2(F0 * F1, s=fftshp))
    Cf = C.reshape(C.shape[0], -1)
    idx = np.argmax(Cf, axis=-1)
    conf = 1 - Cm.reshape(C.shape[0], -1).max(-1) / np.maximum(Cf.max(-1), 1e-9)
    return idx, conf


def main():
    import jax
    try:
        jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from feabas_tpu.ops import xcorr
    from feabas_tpu.ops.filters import masked_dog_filter
    from feabas_tpu import constant as const

    N, H, W = 256, 128, 128
    fftshp = (256, 256)
    img0_u8, img1_u8, shifts = _make_batch(N, H, W)

    mask = jnp.ones((1, H, W), jnp.float32)

    @jax.jit
    def match_step(a_u8, b_u8):
        a = masked_dog_filter(a_u8.astype(jnp.float32), 2.5)
        b = masked_dog_filter(b_u8.astype(jnp.float32), 2.5)
        return xcorr._xcorr_core(a, b, mask, mask, fftshp, (H, W), (H, W),
                                 const.FFT_CONF_MIRROR, True, False)

    # warm up / compile; uint8 transfer (4x fewer tunnel bytes than f32)
    d0 = jnp.asarray(img0_u8)
    d1 = jnp.asarray(img1_u8)
    out = match_step(d0, d1)
    jax.block_until_ready(out)
    # sanity: recovered shifts match ground truth
    dx, dy, conf = (np.asarray(o) for o in out)
    err = np.abs(np.stack([dx, dy], -1) - (-shifts[:, ::-1]))
    assert np.median(err) <= 1.0, ('bench sanity', np.median(err))

    # production keeps match blocks device-resident (the warp kernel renders
    # them in HBM from sources staged once per tile pair), so the
    # representative number times the device-resident step; chain the
    # dependent steps so timing can't hide behind async dispatch
    def _time_tpu():
        a, b = d0, d1
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(4):
            out = match_step(a, b)
            acc = acc + out[0]  # data dependency chains the steps
        _ = float(np.asarray(acc).sum())
        return (time.perf_counter() - t0) / 4

    dt = min(_time_tpu() for _ in range(5))
    tpu_rate = N / dt

    cpu_dt = []
    for _ in range(3):
        t0 = time.perf_counter()
        _cpu_reference(img0_u8, img1_u8)
        cpu_dt.append(time.perf_counter() - t0)
    cpu_rate = N / min(cpu_dt)

    print(json.dumps({
        'metric': 'stitch_match_throughput',
        'value': round(tpu_rate, 1),
        'unit': 'block_pairs/sec (128x128 device-resident, DoG+rfft2+peak+conf+subpixel)',
        'vs_baseline': round(tpu_rate / cpu_rate, 2),
    }))


if __name__ == '__main__':
    main()
