"""Headline benchmark: the BASELINE.json metric set.

1. HEADLINE — matches/sec on a full 3000x4000 tile pair through
   ``stitching_matcher`` end to end, INGEST INCLUDED (host->device
   transfer through the tunnel, coarse seed, block distribution, device
   warp+DoG+rfft2 xcorr, elastic relaxation). vs_baseline compares the
   equivalent per-block xcorr work through scipy.fft on all host cores
   (the reference's compute path, ``feabas/matcher.py:22``).
2. window_solve_s — wall time of one 64-section sliding-window elastic
   solve (~160k DOF) on device, the align-stage hot kernel.
3. residual_parity_px — median error of the tile-pair matches against
   the synthetic ground-truth offset (BASELINE.json north star: 0.1 px).
4. device_xcorr_rate — the device-resident 128x128 block-pair
   microbenchmark (round-1 headline, kept for continuity).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", extras}.
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

    # ---- full 3000x4000 tile-pair match, ingest included ----
    tile_rate, n_matches, pair_dt, parity_px = _bench_tile_pair()

    # ---- production mode: pairs pipelined through thread workers ----
    n_pairs = 24
    pipe_pair_dt, pipe_matches, pipe_parity = _bench_tile_pairs_pipelined(
        n_pairs=n_pairs)
    pipe_rate = (pipe_matches / n_pairs) / pipe_pair_dt

    # honest end-to-end baseline: the SAME tile-pair match forced onto the
    # host CPU backend in a subprocess (XLA-CPU, all cores — if anything a
    # stronger baseline than the reference's scipy+matplotlib path)
    cpu_pair_dt = _bench_tile_pair_cpu_subprocess()

    # ---- elastic-field parity: match through a KNOWN deformation ----
    elastic_px, elastic_bump_px = _bench_elastic_parity()

    # ---- 64-section window elastic solve ----
    window_dt, window_dof, _ = _bench_window_solve()

    # ---- production-window scale proof: 64+16 sections, ~2M DOF, ----
    # wrinkle-softened heterogeneous stiffness (PERF_NOTES convergence
    # study); single repeat — the point is iteration flatness + wall
    # time at scale, not a throughput statistic. Device-only: the same
    # solve on the 1-vCPU host takes tens of minutes.
    big_dt = big_dof = big_iters = None
    if jax.devices()[0].platform != 'cpu':
        try:
            big_dt, big_dof, big_iters = _bench_window_solve(
                mesh_size=27, S=80, maxiter=1000, repeats=1, wrinkle=True)
        except Exception as e:
            print(f'# window_solve_2m skipped: {e!r}', flush=True)

    # ---- render + mipmap, thumbnail, align-stage (BASELINE configs) ----
    rd = _bench_render_mipmap()
    montage_host_mbps, montage_dev_mbps = _bench_montage_blend()
    thumb_s, thumb_cpu_s, thumb_err = _bench_thumbnail()
    thumb_stack_s, thumb_stack_cpu_s = _bench_thumbnail_stack()
    winopt_sph, align_p90 = _bench_align_stack()
    align_sph, align_e2e_p90, align_dof = _bench_align_e2e()
    roofline = _bench_roofline()
    cpu_align_sph = _run_cpu_subprocess('cpu_align_e2e_worker',
                                        'cpu_align_sph')
    cpu_window_s = _run_cpu_subprocess('cpu_window_solve_worker',
                                       'cpu_window_solve_s')

    import os
    backend = os.environ.get('FEABAS_TPU_BENCH_BACKEND') \
        or jax.devices()[0].platform
    vs = (cpu_pair_dt / pipe_pair_dt) if cpu_pair_dt else None
    print(json.dumps({
        'metric': 'stitch_tile_pair_match',
        'backend': backend,
        'value': round(pipe_rate, 1),
        'unit': (f'matches/sec per 3000x4000 tile pair, end-to-end incl '
                 f'host->device ingest; {n_pairs} distinct pairs (mixed '
                 f'right/bottom/skewed overlap geometries) as stage-prior '
                 f'overlap crops (the Stitcher dispatch flow), whole '
                 f'coarse+fine schedule fused into ONE device dispatch per '
                 f'pair, pipelined through 3 thread workers sharing one '
                 f'chip (production mode); vs_baseline = same pipeline on '
                 f'all-core host CPU'),
        'vs_baseline': None if vs is None else round(vs, 2),
        'n_pairs': n_pairs,
        'tile_pair_seconds_pipelined': round(pipe_pair_dt, 2),
        'tile_pair_seconds_serial': round(pair_dt, 2),
        'cpu_tile_pair_seconds': None if not cpu_pair_dt else round(cpu_pair_dt, 2),
        'tile_pair_matches': int(n_matches),
        'residual_parity_px': round(max(parity_px, pipe_parity), 3),
        'elastic_field_parity_px': round(elastic_px, 3),
        'elastic_fold_parity_px': round(elastic_bump_px, 3),
        # render: 'hybrid' IS the production path (device.render: auto) —
        # host + device lanes drain one queue; 'device' is the pure
        # device lane alone
        'render_host_MBps': round(rd['host'], 1),
        'render_device_MBps': round(rd['device'], 1),
        'render_hybrid_MBps': round(rd['hybrid'], 1),
        'render_vs_baseline': round(rd['hybrid'] / max(rd['host'], 1e-9), 2),
        'render_device_vs_host': round(rd['device'] / max(rd['host'], 1e-9),
                                       2),
        'render_mip_fused_MBps': round(rd['fused'], 1),
        'render_mip_host_pipeline_MBps': round(rd['fused_host'], 1),
        'render_fused_vs_baseline': round(
            rd['fused'] / max(rd['fused_host'], 1e-9), 2),
        'render_mosaic_host_MBps': round(rd['mosaic_host'], 1),
        'render_mosaic_hybrid_MBps': round(rd['mosaic_hybrid'], 1),
        'render_mosaic_vs_baseline': round(
            rd['mosaic_hybrid'] / max(rd['mosaic_host'], 1e-9), 2),
        'montage_render_host_MBps': round(montage_host_mbps, 1),
        'montage_render_device_MBps': round(montage_dev_mbps, 1),
        'montage_render_vs_baseline': round(
            montage_dev_mbps / max(montage_host_mbps, 1e-9), 2),
        'mipmap_MBps': round(rd['mip'], 1),
        'mipmap_ref_pipeline_MBps': round(rd['mip_ref'], 1),
        'mipmap_vs_baseline': round(rd['mip'] / max(rd['mip_ref'], 1e-9), 2),
        # thumbnail headline = the CLI shape (features prepared once per
        # section, cached, pairs pipelined); the one-shot pair is the
        # auto-routed production secondary
        'thumbnail_vs_baseline': round(
            thumb_stack_cpu_s / max(thumb_stack_s, 1e-9), 2),
        'thumbnail_stack_pair_s': round(thumb_stack_s, 3),
        'thumbnail_stack_cpu_pair_s': round(thumb_stack_cpu_s, 3),
        'thumbnail_err_px': round(thumb_err, 3),
        'thumbnail_pair_s': round(thumb_s, 3),
        'thumbnail_cpu_pair_s': round(thumb_cpu_s, 3),
        'thumbnail_oneshot_vs_baseline': round(
            thumb_cpu_s / max(thumb_s, 1e-9), 2),
        'align_e2e_sections_per_hour': round(align_sph, 1),
        'align_e2e_window_dof': int(align_dof),
        'align_e2e_cpu_sections_per_hour': (
            None if not cpu_align_sph else round(cpu_align_sph, 1)),
        'align_vs_baseline': (
            None if not cpu_align_sph
            else round(align_sph / cpu_align_sph, 2)),
        'align_e2e_residue_p90_px': round(align_e2e_p90, 3),
        'window_opt_sections_per_hour': round(winopt_sph, 1),
        'align_residue_p90_px': round(align_p90, 3),
        'window_solve_s': round(window_dt, 3),
        'window_solve_cpu_s': (None if not cpu_window_s
                               else round(cpu_window_s, 3)),
        'window_solve_vs_baseline': (
            None if not cpu_window_s
            else round(cpu_window_s / window_dt, 2)),
        'window_solve_dof': int(window_dof),
        'window_solve_2m_s': None if big_dt is None else round(big_dt, 3),
        'window_solve_2m_dof': None if big_dof is None else int(big_dof),
        'window_solve_2m_iters': (None if big_iters is None
                                  else int(big_iters)),
        'window_solve_dtype': 'float32 device CG, f64 host assembly/commit',
        'device_xcorr_blockpairs_per_sec': round(tpu_rate, 1),
        'device_xcorr_vs_cpu': round(tpu_rate / cpu_rate, 2),
        # per-kernel device-only accounting (transfers excluded): serial
        # device time, achieved GB/s and GFLOP/s, % of the chip's HBM
        # roofline (v5e: 819 GB/s, 197 bf16 TFLOP/s)
        'roofline': roofline,
    }))


_WORLD_CACHE = {}


def _tile_pair_images(k=0):
    """Deterministic 3000x4000 tile pair with SUBPIXEL ground-truth
    offset (so parity genuinely measures subpixel accuracy). ``k`` varies
    the offset AND the overlap geometry — pairs cycle through the three
    shapes a real montage produces (right-edge neighbor, bottom-edge
    neighbor, skewed right-edge), exercising band bucketing and the jit
    signature variety of production dispatch."""
    import cv2
    from scipy.ndimage import gaussian_filter
    H, W, OVL = 3000, 4000, 400
    mode = k % 3
    key = f'w{mode}'
    if key not in _WORLD_CACHE:
        rng = np.random.default_rng(1 + mode)
        shape = ((2 * H - OVL + 128, W + 16) if mode == 1
                 else (H + 128, 2 * W - OVL + 16))
        world = gaussian_filter(rng.normal(0, 1, shape), 2)
        _WORLD_CACHE[key] = (world / world.std() * 40 + 128).clip(
            0, 255).astype(np.float32)
    world = _WORLD_CACHE[key]
    t0_img = world[:H, :W].astype(np.uint8)
    # tile1 origin in tile0 frame (subpixel), perturbed per pair index
    if mode == 0:        # right-edge neighbor
        off = (W - OVL + 0.4 + 0.37 * k, 7.3 - 0.53 * k)
    elif mode == 1:      # bottom-edge neighbor
        off = (5.2 + 0.41 * k, H - OVL + 0.7 + 0.29 * k)
    else:                # right-edge neighbor with a large stage skew
        off = (W - OVL + 0.4 + 0.37 * k, 55.0 + 1.3 * k)
    M = np.float32([[1, 0, -off[0]], [0, 1, -off[1]]])
    t1_img = cv2.warpAffine(world, M, (W, H),
                            flags=cv2.INTER_LINEAR).astype(np.uint8)
    return t0_img, t1_img, off


_TILE_KWARGS = dict(sigma=2.5, conf_thresh=0.3, coarse_downsample=0.25,
                    fine_downsample=1.0)


def _elastic_pair(mode='smooth'):
    """Tile pair related by a KNOWN elastic displacement field.

    Returns (t0, t1, field) where tile1's content at p equals the world
    (== tile0) at p + off + D(p): 'smooth' is a low-frequency sinusoid
    (amplitude 6 px), 'bump' adds a steep localized Gaussian distortion —
    the cases a pure-translation parity check can never exercise
    (round-2 VERDICT weak #1)."""
    import cv2
    _tile_pair_images(0)                      # fill the mode-0 world cache
    world = _WORLD_CACHE['w0']
    H, W, OVL = 3000, 4000, 400
    off = (W - OVL + 0.4, 7.3)
    gx, gy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))

    def field(x, y):
        dx = 6.0 * np.sin(2 * np.pi * y / 1900.0) \
            + 4.0 * np.cos(2 * np.pi * x / 2300.0)
        dy = 5.0 * np.cos(2 * np.pi * (x + y) / 2100.0)
        if mode == 'bump':
            # centered INSIDE the overlap band (tile1-frame x < OVL),
            # where the matches actually live
            r2 = ((x - OVL / 2) ** 2 + (y - H / 2) ** 2) / (300.0 ** 2)
            g = np.exp(-r2)
            dx = dx + 15.0 * g
            dy = dy - 12.0 * g
        return np.asarray(dx, np.float32), np.asarray(dy, np.float32)

    dx, dy = field(gx, gy)
    t1 = cv2.remap(world, gx + off[0] + dx, gy + off[1] + dy,
                   cv2.INTER_LINEAR).astype(np.uint8)
    t0 = world[:H, :W].astype(np.uint8)

    def true_xy0(xy1):
        fdx, fdy = field(xy1[:, 0], xy1[:, 1])
        return xy1 + np.stack([fdx + off[0], fdy + off[1]], -1)

    return t0, t1, true_xy0


def _bench_elastic_parity():
    """Full match through a known elastic field on hardware; returns
    (smooth_median_px, bump_median_px). Fails loudly if the fused device
    geometry regresses (the exact class of bug the pure-translation
    parity number could not catch: rfft2 batch bias, dot_general
    coordinate loss — PERF_NOTES.md)."""
    from feabas_tpu.matcher import stitching_matcher
    out = []
    for mode in ('smooth', 'bump'):
        t0, t1, true_xy0 = _elastic_pair(mode)
        match = stitching_matcher(t0, t1, **_TILE_KWARGS)
        assert match is not None and match.xy0.shape[0] >= 8, \
            f'elastic pair ({mode}) failed to match'
        err = np.linalg.norm(match.xy0 - true_xy0(match.xy1), axis=-1)
        out.append(float(np.median(err)))
    return out[0], out[1]


def _bench_tile_pair():
    """Match one synthetic 3000x4000 tile pair end to end; returns
    (matches/sec, n_matches, seconds, parity_px vs ground truth)."""
    from feabas_tpu.matcher import stitching_matcher
    t0_img, t1_img, off = _tile_pair_images()
    match = stitching_matcher(t0_img, t1_img, **_TILE_KWARGS)  # warm-up
    assert match is not None and match.xy0.shape[0] >= 8, 'bench tile pair'
    dts = []
    for _ in range(5):   # min-of-5: the tunnel jitters session to session
        t0 = time.perf_counter()
        match = stitching_matcher(t0_img, t1_img, **_TILE_KWARGS)
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    err = match.xy0 - (match.xy1 + np.asarray(off))
    parity = float(np.median(np.linalg.norm(err, axis=-1)))
    return match.xy0.shape[0] / dt, match.xy0.shape[0], dt, parity


def cpu_tile_pair_worker():
    """Subprocess body: same tile-pair match on the host CPU backend.

    Uses the classic per-round loop — the fused one-dispatch program is a
    round-trip optimization that costs more on CPU; the baseline gets its
    BEST configuration — on the same stage-prior overlap crops the
    production (device) measurement uses."""
    from feabas_tpu.matcher import stitching_matcher
    crop0, crop1, rel = _stage_crop_pair(0)
    kw = dict(_TILE_KWARGS, fused_rounds=False)
    stitching_matcher(crop0, crop1, **kw)  # warm-up/compile
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        stitching_matcher(crop0, crop1, **kw)
        dts.append(time.perf_counter() - t0)
    print(json.dumps({'cpu_pair_dt': min(dts)}))


def _stage_crop_pair(k, margin=100):
    """Stage-prior overlap crops, exactly how the Stitcher dispatch
    worker cuts them (stitcher.subprocess_match_list_of_overlaps).
    Returns (crop0, crop1, true_offset_between_crop_frames)."""
    t0_img, t1_img, off = _tile_pair_images(k)
    H, W = t0_img.shape
    x0 = max(0.0, off[0]) - margin
    y0 = max(0.0, off[1]) - margin
    x1 = min(W, off[0] + W) + margin
    y1 = min(H, off[1] + H) + margin

    def cut(img, bx0, by0, bx1, by1):
        ax0 = int(np.clip(np.floor(bx0), 0, img.shape[1]))
        ay0 = int(np.clip(np.floor(by0), 0, img.shape[0]))
        ax1 = int(np.clip(np.ceil(bx1), 0, img.shape[1]))
        ay1 = int(np.clip(np.ceil(by1), 0, img.shape[0]))
        return img[ay0:ay1, ax0:ax1], (ax0, ay0)

    crop0, o0 = cut(t0_img, x0, y0, x1, y1)
    crop1, o1 = cut(t1_img, x0 - off[0], y0 - off[1],
                    x1 - off[0], y1 - off[1])
    # truth: xy0 (crop0 frame) = xy1 (crop1 frame) + rel
    rel = (np.asarray(o1, float) + np.asarray(off, float)
           - np.asarray(o0, float))
    return crop0, crop1, rel


def _bench_tile_pairs_pipelined(n_pairs=24, workers=3):
    """Production-mode throughput: ``n_pairs`` distinct 3000x4000 tile
    pairs, cut to stage-prior overlap crops exactly like
    Stitcher.dispatch_matchers, matched with ``stage_aligned=True`` (the
    whole coarse+fine schedule is ONE device dispatch per pair) by
    ``workers`` thread workers sharing the one chip. Returns
    (effective_seconds_per_pair, total_matches, parity_px_median)."""
    from concurrent.futures import ThreadPoolExecutor
    from feabas_tpu.matcher import stitching_matcher
    pairs = [_stage_crop_pair(k) for k in range(n_pairs)]

    def one(p):
        # stage prior = true crop offset + a few px of simulated stage
        # error (real stages jitter; the in-program coarse absorbs it)
        prior = (p[2][0] + 3.3, p[2][1] - 2.7)
        return stitching_matcher(p[0], p[1], stage_prior=prior,
                                 **_TILE_KWARGS)

    # warm every pair once (steady-state shapes; band bucketing keeps the
    # jit signature count tiny across production pairs)
    for p in pairs:
        one(p)
    dt = None
    for _ in range(2):   # best-of-2 passes: tunnel throughput jitters
        t0 = time.perf_counter()
        with ThreadPoolExecutor(workers) as ex:
            results = list(ex.map(one, pairs))
        d = time.perf_counter() - t0
        dt = d if dt is None else min(dt, d)
    n_matches = 0
    errs = []
    for p, m in zip(pairs, results):
        assert m is not None and m.xy0.shape[0] >= 8, 'pipelined bench pair'
        n_matches += m.xy0.shape[0]
        errs.append(np.linalg.norm(
            m.xy0 - (m.xy1 + p[2]), axis=-1))
    parity = float(np.median(np.concatenate(errs)))
    return dt / n_pairs, n_matches, parity


def _bench_tile_pair_cpu_subprocess():
    """Run cpu_tile_pair_worker with JAX pinned to the CPU backend.
    Returns seconds or None on failure."""
    import os
    import subprocess
    import sys
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)
    env['PYTHONPATH'] = os.pathsep.join(
        [os.path.dirname(os.path.abspath(__file__))]
        + [p for p in env.get('PYTHONPATH', '').split(os.pathsep)
           if p and 'axon_site' not in p])
    code = 'import bench; bench.cpu_tile_pair_worker()'
    try:
        out = subprocess.run([sys.executable, '-c', code], env=env,
                             capture_output=True, text=True, timeout=900,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
        for line in out.stdout.strip().splitlines()[::-1]:
            try:
                return float(json.loads(line)['cpu_pair_dt'])
            except Exception:
                continue
    except Exception:
        pass
    return None


def _bench_render_mipmap(tmp_root='/tmp/feabas_tpu_bench_render'):
    """Full-resolution render of one elastically-deformed section into
    output tiles + one mip level (BASELINE config 4). Returns a dict of
    output-MB/s numbers:

    - host: the cv2 path (the reference's construction);
    - device: the pure on-device rasterize+warp path;
    - hybrid: the PRODUCTION path (device.render: auto) — host and
      device lanes drain one work queue, so throughput is their sum;
    - fused / fused_host: the render->mip pipeline (mip0 + mip1 out of
      one pass) on the hybrid path with in-program device mips vs the
      host pipeline (render, then re-read + downsample), both counted as
      mip0 bytes per total pipeline second;
    - mosaic_host / mosaic_hybrid: the SAME render with a tiled on-disk
      source (MosaicLoader regime — the align-stage tsr reality, where
      the device lane uploads per-block source crops);
    - mip / mip_ref: the standalone mip level (tile read -> downsample ->
      write) vs the reference-shaped identity-mesh construction.
    """
    import os
    import shutil
    import cv2
    from scipy.ndimage import gaussian_filter
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import StreamLoader, StaticImageLoader
    from feabas_tpu.renderer import MeshRenderer
    from feabas_tpu.mipmap import mip_one_level
    from feabas_tpu import common as fcommon
    rng = np.random.default_rng(4)
    N = 8192      # production sections are far larger than one block;
    # 16 output tiles measure the pipelined steady state, not the
    # first-fetch latency
    world = gaussian_filter(rng.normal(0, 1, (N, N)), 2)
    world = (world / world.std() * 40 + 128).clip(0, 255).astype(np.uint8)
    loader = StreamLoader(world)

    def make_mesh():
        mesh = Mesh.from_bbox((0, 0, N, N), cartesian=True, mesh_size=256,
                              resolution=4)
        v = mesh.vertices(1)
        mesh.set_vertices(v + np.stack([5 * np.sin(v[:, 1] / 600),
                                        4 * np.cos(v[:, 0] / 500)], -1), 1,
                          offset=mesh.offset(1))
        return mesh

    r = MeshRenderer.from_mesh(make_mesh(), image_loader=loader)
    tiles = [(x, y, x + 2048, y + 2048)
             for y in range(0, N, 2048) for x in range(0, N, 2048)]

    def run(route, renderer=r, emit_mips=0):
        t0 = time.perf_counter()
        n_bytes = 0
        blocks = []
        if route is False:
            for bbox in tiles:
                blk = renderer.crop(bbox, return_empty=True,
                                    device_render=False)
                if blk is not None:
                    n_bytes += blk.nbytes
                    blocks.append((bbox, blk))
        else:
            # production batching: all blocks in flight before the first
            # fetch so transfers and compute pipeline on the link
            kw = {}
            if emit_mips:
                kw = dict(emit_mips=emit_mips, mip_blur=0.75)
            for bbox, blk in zip(tiles, renderer.crop_multiple(
                    tiles, return_empty=True, device_render=route, **kw)):
                if blk is not None:
                    b0 = blk[0] if emit_mips else blk
                    n_bytes += b0.nbytes
                    blocks.append((bbox, blk))
        return n_bytes / max(time.perf_counter() - t0, 1e-9) / 1e6, blocks

    run(True)                        # compile warm-up for the device path
    run(True, emit_mips=1)           # fused program warm-up
    host_mbps, blocks = run(False)
    host_mbps = max(host_mbps, run(False)[0])
    dev_mbps = max(run(True)[0], run(True)[0])
    hybrid_mbps = max(run('hybrid')[0], run('hybrid')[0])
    # mip export: write the rendered tiles as a mosaic, downsample 2x
    shutil.rmtree(tmp_root, ignore_errors=True)
    src_dir = os.path.join(tmp_root, 'mip0')
    os.makedirs(src_dir, exist_ok=True)
    rows = []
    for (x0, y0, x1, y1), blk in blocks:
        fn = f's_tr{y0 // 2048 + 1}-tc{x0 // 2048 + 1}.png'
        fcommon.imwrite(os.path.join(src_dir, fn), blk)
        rows.append((fn, x0, y0, x1, y1))
    with open(os.path.join(src_dir, 'metadata.txt'), 'w') as f:
        f.write('{ROOT_DIR}\t' + src_dir + '\n{RESOLUTION}\t4\n')
        for fn, a, b, c, d in rows:
            f.write(f'{fn}\t{a}\t{b}\t{c}\t{d}\n')
    in_bytes = sum(blk.nbytes for _, blk in blocks)
    t0 = time.perf_counter()
    mip_one_level(os.path.join(src_dir, 'metadata.txt'),
                  os.path.join(tmp_root, 'mip1'), tile_size=(2048, 2048),
                  fmt='png')
    t_mip_host = max(time.perf_counter() - t0, 1e-9)
    mip_mbps = in_bytes / t_mip_host / 1e6
    # ---- fused render->mip pipeline vs the host pipeline -------------
    # host pipeline = best host render + the measured host mip pass;
    # fused = one hybrid pass emitting mip0+mip1 (device lane computes
    # its mips in-program, host lane inline) — no tile re-read at all.
    t0 = time.perf_counter()
    _, fused_blocks = run('hybrid', emit_mips=1)
    t_fused = max(time.perf_counter() - t0, 1e-9)
    assert all(isinstance(b, tuple) and len(b) == 2 for _, b in fused_blocks)
    fused_mbps = in_bytes / t_fused / 1e6
    fused_host_mbps = in_bytes / (in_bytes / (host_mbps * 1e6)
                                  + t_mip_host) / 1e6
    # ---- mosaic-source regime (blockwise uploads, tsr reality) -------
    mosaic_loader = StaticImageLoader.from_coordinate_file(
        os.path.join(src_dir, 'metadata.txt'))
    rm = MeshRenderer.from_mesh(make_mesh(), image_loader=mosaic_loader)
    run('hybrid', renderer=rm)       # warm (new source-shape signatures)
    mosaic_host = max(run(False, renderer=rm)[0],
                      run(False, renderer=rm)[0])
    mosaic_hybrid = max(run('hybrid', renderer=rm)[0],
                        run('hybrid', renderer=rm)[0])
    # reference-SHAPED mip baseline: the reference downsamples by
    # rendering an identity mesh at scale 1/2 through its MeshRenderer
    # (reference mipmap.py:71 -> render_whole_mesh, affine_approx_tol
    # 1e-2); measure that same construction here on the same tiles
    from feabas_tpu.renderer import render_whole_mesh
    loader2 = StaticImageLoader.from_coordinate_file(
        os.path.join(src_dir, 'metadata.txt'))
    mesh_id = Mesh.from_bbox((0, 0, N, N), cartesian=True,
                             mesh_size=N / 4, resolution=4)
    ref_dir = os.path.join(tmp_root, 'mip1_ref')
    os.makedirs(ref_dir, exist_ok=True)
    t0 = time.perf_counter()
    render_whole_mesh(mesh_id, loader2, os.path.join(ref_dir, 's_'),
                      tile_size=(2048, 2048), scale=0.5,
                      interpolation=cv2.INTER_AREA, affine_approx_tol=1e-2,
                      device_render=False)
    mip_ref_mbps = in_bytes / max(time.perf_counter() - t0, 1e-9) / 1e6
    shutil.rmtree(tmp_root, ignore_errors=True)
    return {'host': host_mbps, 'device': dev_mbps, 'hybrid': hybrid_mbps,
            'fused': fused_mbps, 'fused_host': fused_host_mbps,
            'mosaic_host': mosaic_host, 'mosaic_hybrid': mosaic_hybrid,
            'mip': mip_mbps, 'mip_ref': mip_ref_mbps}


def _bench_thumbnail():
    """Thumbnail feature pipeline (BASELINE config 2): LRadon detect/
    describe/match + sequential RANSAC on one 512^2 section pair
    (production thumbnail scale), device programs (ops/lradon) vs the
    host numpy/cv2 path (the reference's pipeline shape). Returns
    (device_seconds, host_seconds, alignment_err_px)."""
    from scipy.ndimage import gaussian_filter
    from feabas_tpu.thumbnail import match_two_thumbnails_LRadon
    rng = np.random.default_rng(6)
    n = 512
    world = gaussian_filter(rng.normal(0, 1, (n + 128, n + 128)), 3)
    world = (world / world.std() * 40 + 128).clip(0, 255).astype(np.float32)
    t = np.array([17.3, -9.6])
    img0 = world[32:32 + n, 32:32 + n]
    import cv2
    M = np.float32([[1, 0, -t[0]], [0, 1, -t[1]]])
    img1 = cv2.warpAffine(world, M, world.shape[::-1],
                          flags=cv2.INTER_LINEAR)[32:32 + n, 32:32 + n]
    # production routing (use_device unset -> device.thumbnail: auto,
    # which demotes one-shot prep to host on latency-bound links) vs the
    # forced host path
    s_dev = {'detect_settings': {'min_spacing': 16},
             'extract_settings': {}, 'max_rounds': 2}
    s_host = {'detect_settings': {'min_spacing': 16, 'use_device': False},
              'extract_settings': {'use_device': False}, 'max_rounds': 2}

    def run(settings):
        match = match_two_thumbnails_LRadon(img0, img1, **settings)  # warm
        assert match is not None and match.xy0.shape[0] >= 8, 'thumb bench'
        dts = []
        for _ in range(2):
            t0 = time.perf_counter()
            match = match_two_thumbnails_LRadon(img0, img1, **settings)
            dts.append(time.perf_counter() - t0)
        err = np.linalg.norm((match.xy0 - match.xy1) - t, axis=-1)
        return min(dts), float(np.median(err))

    dev_dt, dev_err = run(s_dev)
    host_dt, _ = run(s_host)
    return dev_dt, host_dt, dev_err


def _bench_thumbnail_stack(S=7):
    """Thumbnail matching the way the CLI runs it (production shape):
    features prepared ONCE per section and cached, then neighbor pairs
    matched with the cached keypoints — device matches additionally
    pipeline through thread workers so per-dispatch link latency overlaps
    (single-pair latency is floored by round trips; a stack is
    throughput-bound). Returns (device_s_per_pair, cpu_s_per_pair)."""
    from concurrent.futures import ThreadPoolExecutor
    from scipy.ndimage import gaussian_filter
    from feabas_tpu.thumbnail import (match_two_thumbnails_LRadon,
                                      prepare_image)
    rng = np.random.default_rng(8)
    n = 512
    world = gaussian_filter(rng.normal(0, 1, (n + 256, n + 256)), 3)
    world = (world / world.std() * 40 + 128).clip(0, 255).astype(np.float32)
    offs = np.stack([rng.integers(0, 128, S), rng.integers(0, 128, S)], -1)
    imgs = [np.ascontiguousarray(
        world[o[1]:o[1] + n, o[0]:o[0] + n]) for o in offs]
    det = {'min_spacing': 16}

    def run(use_device, workers):
        s = {'detect_settings': dict(det, use_device=use_device),
             'extract_settings': {'use_device': use_device},
             'max_rounds': 2}
        t0 = time.perf_counter()
        kps = [prepare_image(im, **s) for im in imgs]

        def one(i):
            m = match_two_thumbnails_LRadon(imgs[i], imgs[i + 1],
                                            kps0=kps[i], kps1=kps[i + 1],
                                            **s)
            assert m is not None and m.xy0.shape[0] >= 8
            return m

        if workers > 1:
            with ThreadPoolExecutor(max_workers=workers) as ex:
                list(ex.map(one, range(S - 1)))
        else:
            for i in range(S - 1):
                one(i)
        return (time.perf_counter() - t0) / (S - 1)

    run(True, 3)                      # warm compiles
    dev = min(run(True, 3) for _ in range(2))
    cpu = run(False, 1)
    return dev, cpu


def _bench_align_stack():
    """Align OPTIMIZATION-stage throughput (BASELINE config 3): sliding-
    window elastic optimization over a synthetic 16-section stack (the
    matching/rendering stages are benchmarked separately; the end-to-end
    CLI number lives in tools/align_rehearsal.py). The matches carry a
    z-varying smooth elastic warp on top of cumulative drift, so the
    system is NOT trivially consistent and residue_p90 measures real
    elastic-equilibrium quality. Returns (sections_per_hour,
    residue_p90_px)."""
    from feabas_tpu.aligner import Stack
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.common import Match
    from feabas_tpu.optimizer import Link
    rng = np.random.default_rng(8)
    S = 16
    names = [f's{z:03d}' for z in range(S)]
    drift = np.cumsum(rng.normal(0, 3.0, (S, 2)), axis=0)
    xs, ys = np.meshgrid(np.linspace(100, 2900, 10),
                         np.linspace(100, 2900, 10))
    pts = np.stack([xs.ravel(), ys.ravel()], -1)

    def warp(z):
        # smooth per-section field, ~1.5 px amplitude, z-varying phase
        ph = 2 * np.pi * z / S
        wx = 1.5 * np.sin(pts[:, 0] / 900 + ph) * np.cos(pts[:, 1] / 1100)
        wy = 1.5 * np.cos(pts[:, 0] / 1000 - ph) * np.sin(pts[:, 1] / 800)
        return np.stack([wx, wy], -1)

    def build():
        meshes = {n: Mesh.from_bbox((0, 0, 3000, 3000), cartesian=True,
                                    mesh_size=150, name=n, resolution=4)
                  for n in names}
        matches = {}
        for z in range(S - 1):
            delta = drift[z + 1] - drift[z]
            matches[(names[z], names[z + 1])] = Match(
                pts + warp(z), pts + warp(z + 1) + delta,
                np.ones(len(pts)), 0.01)
        return Stack(meshes=meshes, matches=matches, resolution=4)

    build().optimize_slide_window(window_size=8, buffer_size=2,
                                  start_loc='L', residue_len=3)  # warm-up
    stack = build()
    t0 = time.perf_counter()
    stack.optimize_slide_window(window_size=8, buffer_size=2,
                                start_loc='L', residue_len=3)
    dt = time.perf_counter() - t0
    res = []
    for z in range(S - 1):
        m0 = stack.get_mesh(names[z])
        m1 = stack.get_mesh(names[z + 1])
        mt = stack.get_match((names[z], names[z + 1]))
        link = Link.from_coordinates(m0, m1, mt.xy0, mt.xy1,
                                     weight=mt.weight)
        res.append(link.residues(gear=1))
    p90 = float(np.quantile(np.concatenate(res), 0.9))
    return S / dt * 3600.0, p90


def _build_align_workdir(root, S=12, ext=3000, mesh_size=30, n_pts=24):
    """Synthetic on-disk align stack: S section meshes (H5) + neighbor
    match files (H5) carrying cumulative drift + a z-varying smooth warp.
    Defaults are PRODUCTION-proportioned: mesh_size 30 on a 3000^2 world
    gives ~10.2k vertices (~20.4k DOF) per section — the DOF-study mesh
    scale — so an 8+2 window is a ~200k-DOF solve, and n_pts^2 = 576
    matches/pair put H5 IO + link building in realistic proportion.
    Returns (mesh_dir, match_dir, tform_dir)."""
    import os
    import shutil
    from feabas_tpu.aligner import save_matches_to_h5, match_name
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.common import Match
    shutil.rmtree(root, ignore_errors=True)
    mesh_dir = os.path.join(root, 'mesh')
    match_dir = os.path.join(root, 'match')
    tform_dir = os.path.join(root, 'tform')
    for d in (mesh_dir, match_dir, tform_dir):
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(8)
    names = [f's{z:03d}' for z in range(S)]
    drift = np.cumsum(rng.normal(0, 3.0, (S, 2)), axis=0)
    xs, ys = np.meshgrid(np.linspace(100, ext - 100, n_pts),
                         np.linspace(100, ext - 100, n_pts))
    pts = np.stack([xs.ravel(), ys.ravel()], -1)

    def warp(z):
        ph = 2 * np.pi * z / S
        wx = 1.5 * np.sin(pts[:, 0] / 900 + ph) * np.cos(pts[:, 1] / 1100)
        wy = 1.5 * np.cos(pts[:, 0] / 1000 - ph) * np.sin(pts[:, 1] / 800)
        return np.stack([wx, wy], -1)

    for z, n in enumerate(names):
        m = Mesh.from_bbox((0, 0, ext, ext), cartesian=True,
                           mesh_size=mesh_size, name=n, uid=z, resolution=4)
        m.save_to_h5(os.path.join(mesh_dir, n + '.h5'))
        if z:
            delta = drift[z] - drift[z - 1]
            mt = Match(pts + warp(z - 1), pts + warp(z) + delta,
                       np.ones(len(pts)), 0.01)
            save_matches_to_h5(os.path.join(
                match_dir, match_name(names[z - 1], n)), mt, 4)
    return mesh_dir, match_dir, tform_dir


def _bench_align_e2e(root='/tmp/feabas_tpu_bench_align'):
    """Align OPTIMIZATION stage end to end (BASELINE config 3): mesh H5
    loads -> match H5 loads -> link building -> sliding-window elastic
    solves -> tform H5 writes, on a 12-section on-disk stack at
    PRODUCTION mesh density (~20.4k DOF/section -> ~200k-DOF windows;
    reference workload: feabas/aligner.py:538-741). Returns
    (sections_per_hour, residue_p90_px, window_dof)."""
    import os
    from feabas_tpu.aligner import Stack
    from feabas_tpu.optimizer import Link
    mesh_dir, match_dir, tform_dir = _build_align_workdir(root)

    from feabas_tpu.storage import join_paths

    def run(tdir):
        os.makedirs(tdir, exist_ok=True)
        stack = Stack(mesh_dir=mesh_dir, match_dir=match_dir,
                      tform_dir=tdir, resolution=4)

        def commit(name, mesh):
            mesh.save_to_h5(join_paths(tdir, name + '.h5'))

        stack.optimize_slide_window(window_size=8, buffer_size=2,
                                    start_loc='L', residue_len=3,
                                    commit_fn=commit)
        return stack

    run(os.path.join(tform_dir, 'warm'))        # compile warm-up
    t0 = time.perf_counter()
    stack = run(tform_dir)
    dt = time.perf_counter() - t0
    res = []
    for (a, b) in stack.match_list:
        m0 = stack.get_mesh(a)
        m1 = stack.get_mesh(b)
        mt = stack.get_match((a, b))
        link = Link.from_coordinates(m0, m1, mt.xy0, mt.xy1,
                                     weight=mt.weight)
        res.append(link.residues(gear=1))
    p90 = float(np.quantile(np.concatenate(res), 0.9))
    n_tf = len([f for f in os.listdir(tform_dir) if f.endswith('.h5')])
    assert n_tf >= stack.num_sections - 1, ('tforms written', n_tf)
    window_dof = 10 * 2 * stack.get_mesh(stack.section_list[0]).num_vertices
    return stack.num_sections / dt * 3600.0, p90, window_dof


def cpu_align_e2e_worker():
    """Subprocess body: the SAME end-to-end align stage on the host CPU
    backend (the reference's compute substrate)."""
    sph, p90, _dof = _bench_align_e2e(root='/tmp/feabas_tpu_bench_align_cpu')
    print(json.dumps({'cpu_align_sph': sph}))


def cpu_window_solve_worker():
    """Subprocess body: the 64-section window solve on the CPU backend."""
    dt, dof, _ = _bench_window_solve()
    print(json.dumps({'cpu_window_solve_s': dt, 'dof': dof}))


def _run_cpu_subprocess(func_name, key, timeout=1800):
    """Run ``bench.<func_name>()`` with JAX pinned to CPU; returns the
    JSON value under ``key`` or None."""
    import os
    import subprocess
    import sys
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)
    env['PYTHONPATH'] = os.pathsep.join(
        [os.path.dirname(os.path.abspath(__file__))]
        + [p for p in env.get('PYTHONPATH', '').split(os.pathsep)
           if p and 'axon_site' not in p])
    code = f'import bench; bench.{func_name}()'
    try:
        out = subprocess.run([sys.executable, '-c', code], env=env,
                             capture_output=True, text=True,
                             timeout=timeout,
                             cwd=os.path.dirname(os.path.abspath(__file__)))
        for line in out.stdout.strip().splitlines()[::-1]:
            try:
                return float(json.loads(line)[key])
            except Exception:
                continue
    except Exception:
        pass
    return None


def _bench_window_solve(mesh_size=86, S=64, maxiter=500, repeats=3,
                        wrinkle=False):
    """One S-section window relaxation on device; returns
    (seconds, dof, iters). Defaults reproduce the ~160k-DOF round-1
    metric; main() also runs the production-window 2M-DOF point
    (S=80, mesh_size=27, wrinkle-softened bands — convergence study in
    PERF_NOTES.md)."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.parallel.window import build_stack_system, stack_solve
    rng = np.random.default_rng(0)
    meshes = []
    for z in range(S):
        m = Mesh.from_bbox((0, 0, 3000, 3000), cartesian=True,
                           mesh_size=mesh_size,
                           uid=z, name=f'z{z}', resolution=4)
        m.set_translation((0, 0))
        meshes.append(m)
    meshes[0].locked = True
    xs, ys = np.meshgrid(np.linspace(100, 2900, 12), np.linspace(100, 2900, 12))
    pts = np.stack([xs.ravel(), ys.ravel()], -1)
    links = []
    for z in range(S - 1):
        d = rng.normal(0, 1.5, 2)
        tid0 = meshes[z].tri_finder(pts, gear='INITIAL', extrapolate=True)
        tid1 = meshes[z + 1].tri_finder(pts + d, gear='INITIAL', extrapolate=True)
        links.append({
            'idx0': meshes[z].triangles[tid0],
            'bary0': meshes[z].cart2bary(pts, tid0, gear='INITIAL'),
            'idx1': meshes[z + 1].triangles[tid1],
            'bary1': meshes[z + 1].cart2bary(pts + d, tid1, gear='INITIAL'),
            'weight': np.ones(len(pts), np.float32),
        })
    system = build_stack_system(meshes, links)
    dof = int(system['u'].size)
    import jax.numpy as jnp
    if wrinkle:
        # heterogeneous stiffness: a soft diagonal wrinkle band per
        # section (multiplier x0.02, the wrinkle-relaxation regime) —
        # the condition-number spike the preconditioner must survive
        mult = np.asarray(system['multiplier']).copy()
        t0s = (system['tris'] if np.asarray(system['tris']).ndim == 2
               else system['tris'][0])
        for z in range(S):
            v0 = np.asarray(system['verts0'][z])
            cent = v0[np.asarray(t0s)].mean(axis=1)
            band = np.abs(cent[:, 0] - cent[:, 1] - (z % 7 - 3) * 150) < 60
            mult[z, band] *= 0.02
        system['multiplier'] = mult
    keys = ('verts0', 'u', 'tris', 'multiplier', 'poisson')
    args = {k: jnp.asarray(system[k]) for k in keys}
    args['links'] = tuple(jnp.asarray(a) for a in system['links'])
    args['r_rest'] = jnp.asarray(system['r_rest'])
    args['free'] = jnp.asarray(system['free'])
    # production path: the cartesian window meshes lattice-pack (stencil
    # FEM matvec) and the crosslink transpose runs through the
    # unique-scatter link tables (round-5 kernels; incidence-gather and
    # scatter-add remain the irregular-mesh fallbacks)
    from feabas_tpu.parallel.window import build_link_transpose
    grid_shape = system.get('grid_shape')
    assert grid_shape is not None, 'window bench mesh should lattice-pack'
    lt = build_link_transpose(system['links'], S, system['u'].shape[1])
    linc = tuple(jnp.asarray(a) for a in lt) if lt else None
    sten = (jnp.asarray(system['sten'])
            if system.get('sten') is not None else None)

    def run():
        return stack_solve(args['verts0'], args['u'], args['tris'],
                           args['multiplier'], args['poisson'],
                           args['links'], args['r_rest'], args['free'],
                           lam_s=0.1, maxiter=maxiter, grid_shape=grid_shape,
                           linc=linc, sten=sten)

    u_new, n_it, res = run()   # compile warm-up
    _ = float(np.asarray(u_new).sum())
    dts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        u_new, n_it, res = run()
        # force a value fetch; block_until_ready is unreliable through the
        # tunnel (CLAUDE.md)
        _ = float(np.asarray(u_new).sum())
        dts.append(time.perf_counter() - t0)
    return min(dts), dof, int(np.asarray(n_it))


def _bench_montage_blend(tmp_root='/tmp/feabas_tpu_bench_montage'):
    """Stitch-render hot path: LINEAR blend of many small warped tiles
    into 2048^2 output blocks (reference stitcher.py:1399-1556), device
    cell-binned program vs the host per-tile path on the same montage.
    Returns (host_MBps, device_MBps)."""
    import os
    import shutil
    import cv2
    from scipy.ndimage import gaussian_filter
    from feabas_tpu.stitcher import Stitcher, MontageRenderer
    from feabas_tpu import common as fcommon
    rng = np.random.default_rng(11)
    shutil.rmtree(tmp_root, ignore_errors=True)
    os.makedirs(tmp_root, exist_ok=True)
    # 16x16 grid of 192px tiles, 48px overlap -> ~2.3k x 2.3k section
    rows = cols = 16
    ts, ov = 192, 48
    W = cols * (ts - ov) + ov
    H = rows * (ts - ov) + ov
    world = gaussian_filter(rng.normal(0, 1, (H, W)), 2)
    world = (world / world.std() * 40 + 128).clip(0, 255).astype(np.uint8)
    paths, bboxes = [], []
    for r in range(rows):
        for c in range(cols):
            x0, y0 = c * (ts - ov), r * (ts - ov)
            p = os.path.join(tmp_root, f'b_tr{r + 1}-tc{c + 1}.png')
            fcommon.imwrite(p, world[y0:y0 + ts, x0:x0 + ts])
            paths.append(p)
            bboxes.append((x0, y0, x0 + ts, y0 + ts))
    st = Stitcher(paths, bboxes)
    st.initialize_meshes(mesh_sizes=[96], border_width=48)
    for m, bb in zip(st.meshes, st.init_bboxes):
        m.set_translation((bb[0], bb[1]), gear=('INITIAL', 'MOVING'))
        v = m.vertices('MOVING')
        off = m.offset('MOVING')
        m.set_vertices(v + np.stack([1.5 * np.sin(v[:, 1] / 300),
                                     1.2 * np.cos(v[:, 0] / 270)], -1),
                       'MOVING', offset=off)
    mr = MontageRenderer.from_stitcher(st, blend='LINEAR')
    blocks = [(0, 0, 1024, 1024), (1024, 0, 2048, 1024),
              (0, 1024, 1024, 2048), (1024, 1024, 2048, 2048)]
    eng = mr._montage_device_engine()
    eng.render_blocks(blocks[:1], 'LINEAR',
                      float(mr.loader.default_fillval))   # warm compile

    def run_dev():
        t0 = time.perf_counter()
        res = eng.render_blocks(blocks, 'LINEAR',
                                float(mr.loader.default_fillval))
        nb = sum(r.nbytes for r in res
                 if r is not None and r is not NotImplemented)
        return nb / max(time.perf_counter() - t0, 1e-9) / 1e6

    def run_host():
        t0 = time.perf_counter()
        nb = 0
        for bb in blocks:
            blk = mr.crop(bb, return_empty=True, device_render=False)
            if blk is not None:
                nb += blk.nbytes
        return nb / max(time.perf_counter() - t0, 1e-9) / 1e6

    dev = max(run_dev(), run_dev())
    host = max(run_host(), run_host())
    shutil.rmtree(tmp_root, ignore_errors=True)
    return host, dev


# chip ceilings for the roofline table: (bf16 peak FLOP/s, HBM B/s);
# matched by substring of jax's device_kind. Sources: public TPU specs
# (v5e 197 TF / 819 GBps; v4 275 TF / 1228 GBps; v6e 918 TF / 1640 GBps;
# v3 123 TF / 900 GBps). f32 VPU work runs well below the bf16 MXU peak,
# so compute-% is a lower bound for non-matmul kernels.
_CHIP_PEAKS = (('v6', 918e12, 1640e9), ('v5p', 459e12, 2765e9),
               ('v5', 197e12, 819e9), ('v4', 275e12, 1228e9),
               ('v3', 123e12, 900e9), ('v2', 46e12, 700e9))


def _bench_roofline():
    """Per-kernel DEVICE-ONLY accounting for the four hot kernels
    (the absolute-perf ledger behind the CPU-relative multipliers):
    serial device time per call with inputs device-resident and
    transfers excluded (K queued dispatches, delta method: per_call =
    (t_K - t_1) / (K - 1) cancels the fetch + link latency common to
    both), XLA-compiled FLOPs + HBM bytes per call, achieved GFLOP/s /
    GB/s, and % of the chip's roofline (whichever of the MXU or HBM
    ceilings binds). Also sweeps the raster kernel's blocks-per-dispatch
    (group_cap) with transfers excluded — the fast-link regime where the
    batched vmapped path must win (it loses through the tunnel only
    because fetch granularity dominates). Returns {} on the CPU
    fallback: a roofline is a statement about the chip."""
    import jax
    import jax.numpy as jnp
    if jax.devices()[0].platform == 'cpu':
        return {}
    kind = jax.devices()[0].device_kind
    peak_f, peak_b = next(((f, b) for s, f, b in _CHIP_PEAKS
                           if s in kind.lower().replace(' ', '')),
                          (197e12, 819e9))

    def dev_time(fn, K=12):
        out = fn()
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])   # compile+sync

        def run(k):
            t0 = time.perf_counter()
            o = None
            for _ in range(k):
                o = fn()
            _ = np.asarray(jax.tree_util.tree_leaves(o)[0])
            return time.perf_counter() - t0

        t1 = min(run(1) for _ in range(4))
        tK = min(run(K) for _ in range(3))
        return max((tK - t1) / (K - 1), 1e-9)

    def cost(jfn, *args):
        try:
            c = jfn.lower(*args).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            return float(c.get('flops', 0.0)), \
                float(c.get('bytes accessed', 0.0))
        except Exception:
            return None, None

    def entry(name, dt, flops, bts, extra=None):
        row = {'device_ms': round(dt * 1e3, 3)}
        if flops:
            gf = flops / dt / 1e9
            row['gflops'] = round(gf, 1)
            row['mxu_pct'] = round(100 * gf * 1e9 / peak_f, 2)
        if bts:
            gb = bts / dt / 1e9
            row['hbm_GBps'] = round(gb, 1)
            row['hbm_pct'] = round(100 * gb * 1e9 / peak_b, 1)
        if flops and bts:
            row['bound'] = ('hbm' if bts / peak_b > flops / peak_f
                            else 'mxu')
        if extra:
            row.update(extra)
        out[name] = row

    out = {'device_kind': kind,
           'peaks': f'{peak_f / 1e12:.0f} bf16 TFLOPs, '
                    f'{peak_b / 1e9:.0f} GB/s HBM'}

    # ---- 1. xcorr FFT (matcher hot kernel: DoG + rfft2 xcorr) --------
    from feabas_tpu.ops import xcorr
    from feabas_tpu.ops.filters import masked_dog_filter
    from feabas_tpu import constant as const
    N, H, W = 256, 128, 128
    fftshp = (256, 256)
    img0_u8, img1_u8, _ = _make_batch(N, H, W)
    mask = jnp.ones((1, H, W), jnp.float32)

    @jax.jit
    def match_step(a_u8, b_u8):
        a = masked_dog_filter(a_u8.astype(jnp.float32), 2.5)
        b = masked_dog_filter(b_u8.astype(jnp.float32), 2.5)
        return xcorr._xcorr_core(a, b, mask, mask, fftshp, (H, W), (H, W),
                                 const.FFT_CONF_MIRROR, True, False)

    d0, d1 = jnp.asarray(img0_u8), jnp.asarray(img1_u8)
    fl, bt = cost(match_step, d0, d1)
    entry('xcorr_fft_256pairs', dev_time(lambda: match_step(d0, d1)),
          fl, bt, {'shape': f'{N}x{H}x{W} -> fft {fftshp[0]}^2'})

    # ---- 2. raster render loop (device render engine core) ----------
    from scipy.ndimage import gaussian_filter as _gf
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import StreamLoader
    from feabas_tpu.renderer import MeshRenderer
    from feabas_tpu.ops.render import _raster_render_shared, _align_up, \
        _CHUNK
    rng = np.random.default_rng(3)
    nblk = 2048
    world = _gf(rng.normal(0, 1, (nblk, nblk)), 2)
    world = (world / world.std() * 40 + 128).clip(0, 255).astype(np.uint8)
    loader = StreamLoader(world)
    mesh = Mesh.from_bbox((0, 0, nblk, nblk), cartesian=True, mesh_size=256,
                          resolution=4)
    v = mesh.vertices(1)
    mesh.set_vertices(v + np.stack([5 * np.sin(v[:, 1] / 600),
                                    4 * np.cos(v[:, 0] / 500)], -1), 1,
                      offset=mesh.offset(1))
    r = MeshRenderer.from_mesh(mesh, image_loader=loader)
    eng = r._get_device_engine()
    resident = eng._resident_source(loader, 0)
    sel = np.arange(len(eng._w))
    tab = eng._table_for_block(sel, (0, 0), resident[1], eng._w)
    Tp = _align_up(1 << int(tab.shape[0] - 1).bit_length(), _CHUNK, _CHUNK)
    tabp = np.zeros((Tp, 14), np.float32)
    tabp[:, 2] = -2.0
    tabp[:, 12] = -np.inf
    tabp[:, 13] = -1.0
    tabp[:tab.shape[0]] = tab
    fv = jnp.float32(0)
    batch_ms = {}
    for B in (1, 4):
        tabs = jnp.asarray(np.broadcast_to(tabp, (B, Tp, 14)).copy())
        fn = lambda t=tabs: _raster_render_shared(
            resident[0], t, fv, nblk, nblk, False, 'u8', 0, 0.0)
        dt = dev_time(fn, K=12)
        batch_ms[B] = dt / B
        if B == 1:
            fl, bt = cost(_raster_render_shared, resident[0], tabs, fv,
                          nblk, nblk, False, 'u8', 0, 0.0)
            dt1 = dt
    entry('raster_render_2048block', dt1, fl, bt,
          {'shape': f'{nblk}^2 u8, {tab.shape[0]} tris',
           'per_block_ms_cap1': round(batch_ms[1] * 1e3, 3),
           'per_block_ms_cap4': round(batch_ms[4] * 1e3, 3),
           'batch_speedup_cap4': round(batch_ms[1] / batch_ms[4], 2)})

    # ---- 2b. cell-binned raster at production mesh density -----------
    # The dense-mesh regime (align-stage meshes put thousands of tris in
    # one 2048^2 block): per-pixel cost is the CELL's candidate count K,
    # not the block's T — the production path for blocks > _CELL_MIN_TRIS
    # tris (ops/render.py _raster_core_cells).
    from feabas_tpu.ops.render import _raster_render_shared_cells
    mesh_d = Mesh.from_bbox((0, 0, nblk, nblk), cartesian=True,
                            mesh_size=64, resolution=4)
    v = mesh_d.vertices(1)
    mesh_d.set_vertices(v + np.stack([5 * np.sin(v[:, 1] / 600),
                                      4 * np.cos(v[:, 0] / 500)], -1), 1,
                        offset=mesh_d.offset(1))
    eng_d = MeshRenderer.from_mesh(
        mesh_d, image_loader=loader)._get_device_engine()
    sel_d = np.arange(len(eng_d._w))
    tab_d = eng_d._table_for_block(sel_d, (0, 0), resident[1], eng_d._w)
    Tp_d = _align_up(1 << int(tab_d.shape[0] - 1).bit_length(),
                     _CHUNK, _CHUNK)
    tabp_d = np.zeros((Tp_d, 14), np.float32)
    tabp_d[:, 2] = -2.0
    tabp_d[:, 12] = -np.inf
    tabp_d[:, 13] = -1.0
    tabp_d[:tab_d.shape[0]] = tab_d
    cand_d = eng_d._cells_for_block(sel_d, (0, 0), nblk, nblk)
    cand_d = np.where(cand_d >= tab_d.shape[0], Tp_d - 1, cand_d)
    tabs_d = jnp.asarray(tabp_d[None])
    cands_d = jnp.asarray(cand_d[None])
    dt_flat_d = dev_time(lambda: _raster_render_shared(
        resident[0], tabs_d, fv, nblk, nblk, False, 'u8', 0, 0.0))
    dt_cell_d = dev_time(lambda: _raster_render_shared_cells(
        resident[0], tabs_d, cands_d, fv, nblk, nblk, False, 'u8', 0, 0.0))
    fl, bt = cost(_raster_render_shared_cells, resident[0], tabs_d,
                  cands_d, fv, nblk, nblk, False, 'u8', 0, 0.0)
    entry('raster_render_cells_dense', dt_cell_d, fl, bt,
          {'shape': f'{nblk}^2 u8, {tab_d.shape[0]} tris, '
                    f'K={cand_d.shape[-1]}/cell',
           'flat_ms': round(dt_flat_d * 1e3, 3),
           'cells_speedup': round(dt_flat_d / dt_cell_d, 2)})

    # ---- 3. LRadon stencil matmul (thumbnail descriptor core) -------
    from feabas_tpu.ops import lradon
    n = 512
    img = _gf(rng.normal(0, 1, (n, n)), 3)
    img = ((img / img.std()) * 40 + 128).clip(0, 255).astype(np.float32)
    K = 8192
    xy = rng.uniform(20, n - 20, (K, 2)).astype(np.float32)
    D, offs, Rp = lradon._desc_params(6, 8, 3, 15)
    pad = Rp + 1
    imgp = jnp.asarray(np.pad(img, pad, mode='edge'))
    z0 = np.floor(xy)
    f = jnp.asarray(xy - z0, jnp.float32)
    z = jnp.asarray(z0.astype(np.int32) + (pad - Rp), jnp.int32)
    Wst = lradon._stencil_table(6, 8, 3, D, offs, Rp)
    fl, bt = cost(lradon._lradon_patch_core, imgp, z, f, Wst, 6, Rp)
    Dp2 = (2 * Rp + 1) ** 2
    entry('lradon_stencil_8k_kpts',
          dev_time(lambda: lradon._lradon_patch_core(imgp, z, f, Wst,
                                                     6, Rp)),
          fl, bt, {'shape': f'({K},{Dp2})@({Dp2},{4 * Wst.shape[1]})'})

    # ---- 4. CG matvec (window-solve per-iteration cost) --------------
    from feabas_tpu.parallel.window import build_stack_system, stack_solve
    from feabas_tpu.ops import fem
    S = 64
    meshes = []
    for zz in range(S):
        m = Mesh.from_bbox((0, 0, 3000, 3000), cartesian=True, mesh_size=30,
                           uid=zz, name=f'z{zz}', resolution=4)
        m.set_translation((0, 0))
        meshes.append(m)
    meshes[0].locked = True
    xs, ys = np.meshgrid(np.linspace(100, 2900, 12),
                         np.linspace(100, 2900, 12))
    pts = np.stack([xs.ravel(), ys.ravel()], -1)
    links = []
    for zz in range(S - 1):
        # nonzero inter-section offsets: identical link endpoints would
        # make r_rest == 0 -> b == 0 -> CG exits at iteration 0 and the
        # per-iteration delta measures nothing (the f32-study workload)
        d = rng.normal(0, 1.5, 2)
        tid0 = meshes[zz].tri_finder(pts, gear='INITIAL', extrapolate=True)
        tid1 = meshes[zz + 1].tri_finder(pts + d, gear='INITIAL',
                                         extrapolate=True)
        links.append({'idx0': meshes[zz].triangles[tid0],
                      'bary0': meshes[zz].cart2bary(pts, tid0,
                                                    gear='INITIAL'),
                      'idx1': meshes[zz + 1].triangles[tid1],
                      'bary1': meshes[zz + 1].cart2bary(pts + d, tid1,
                                                        gear='INITIAL'),
                      'weight': np.ones(len(pts), np.float32)})
    system = build_stack_system(meshes, links)
    keys = ('verts0', 'u', 'tris', 'multiplier', 'poisson')
    args = {k: jnp.asarray(system[k]) for k in keys}
    largs = tuple(jnp.asarray(a) for a in system['links'])
    r_rest = jnp.asarray(system['r_rest'])
    free = jnp.asarray(system['free'])
    tris0 = (system['tris'] if system['tris'].ndim == 2
             else system['tris'][0])
    inc1, imask1 = fem.build_incidence(tris0, system['verts0'].shape[1])
    inc, imask = jnp.asarray(inc1), jnp.asarray(imask1)
    grid_shape = system.get('grid_shape')
    from feabas_tpu.parallel.window import build_link_transpose
    lt = build_link_transpose(system['links'], S, system['verts0'].shape[1])
    linc = tuple(jnp.asarray(a) for a in lt) if lt else None

    sten = (jnp.asarray(system['sten'])
            if system.get('sten') is not None else None)

    def solve(iters, with_iters=False, stencil=True):
        kw = ({'grid_shape': grid_shape, 'linc': linc, 'sten': sten}
              if (stencil and grid_shape)
              else {'inc': inc, 'imask': imask})
        u, n_it, res = stack_solve(
            args['verts0'], args['u'], args['tris'], args['multiplier'],
            args['poisson'], largs, r_rest, free, lam_s=0.1, tol=0.0,
            maxiter=iters, **kw)
        return (u, n_it) if with_iters else u

    # wide iteration spread at production size (~1.3M DOF, ~10 ms/iter):
    # the 1000-iteration delta (~10 s of device time) must overwhelm the
    # ~100 ms of tunnel timing noise that swamped a 600-iter delta on a
    # 16-section system; per-call setup (Ke build, preconditioner, rhs)
    # cancels in the subtraction. tol=0 pins the trip count to maxiter.
    def timed(iters, n=2, stencil=True):
        solve(iters, stencil=stencil)        # warm (compile + cache)
        best = float('inf')
        for _ in range(n):
            t0 = time.perf_counter()
            u = solve(iters, stencil=stencil)
            _ = float(np.asarray(u).ravel()[0])   # force a value fetch
            best = min(best, time.perf_counter() - t0)
        return best

    _, n_hi = solve(1100, with_iters=True)
    iters_run = int(np.asarray(n_hi))
    t_lo = timed(100)
    t_hi = timed(1100)
    per_iter = max((t_hi - t_lo) / 1000, 1e-9)
    # analytic per-iteration ledger (the while-loop body; XLA cost
    # analysis can't attribute per-trip): the stencil matvec streams the
    # 9 coefficient planes (36 f32/vertex) with ZERO random accesses,
    # CG moves ~14 (S,V,2) vectors
    Sv, Vv = system['u'].shape[:2]
    Tt = tris0.shape[0]
    if grid_shape:
        bts = 4.0 * (Sv * Vv * 36 + 14 * Sv * Vv * 2)
        fl = Sv * Vv * 72.0 + 12 * Sv * Vv * 2
    else:
        bts = 4.0 * (Sv * Tt * 36 + 14 * Sv * Vv * 2) + inc1.size * 4
        fl = Sv * Tt * 144.0 + 12 * Sv * Vv * 2
    row_extra = {'shape': f'{Sv} sections x {Vv} verts '
                          f'({int(system["u"].size)} DOF), f32, '
                          f'{"stencil" if grid_shape else "gather"} matvec',
                 'iters_run_of_1100': iters_run,
                 'per_call_setup_ms': round(
                     max(t_lo - 100 * per_iter, 0.0) * 1e3, 1)}
    if grid_shape:
        # the irregular-mesh fallback, for the same system
        tg_lo = timed(100, stencil=False)
        tg_hi = timed(1100, stencil=False)
        per_iter_g = max((tg_hi - tg_lo) / 1000, 1e-9)
        row_extra['gather_iter_ms'] = round(per_iter_g * 1e3, 3)
        row_extra['stencil_speedup'] = round(per_iter_g / per_iter, 2)
    entry('cg_matvec_iter', per_iter, fl, bts, row_extra)
    return out


def _accelerator_alive(timeout=540):
    """Probe backend init in a SUBPROCESS: a wedged TPU tunnel hangs
    ``jax.devices()`` indefinitely, which would hang the whole bench.
    The budget is generous (9 min) because killing a probe mid-init can
    itself wedge a slow-but-recovering tunnel — only a truly dead
    backend should fall through to the CPU re-exec."""
    import subprocess
    import sys
    try:
        p = subprocess.run(
            [sys.executable, '-c', 'import jax; jax.devices(); print("OK")'],
            timeout=timeout, capture_output=True, text=True)
        return p.returncode == 0 and 'OK' in p.stdout
    except Exception:
        return False


def _reexec_cpu():
    """Re-run the bench on the CPU backend with the TPU plugin stripped;
    the printed JSON carries backend=cpu-fallback so the number is never
    mistaken for a TPU result."""
    import os
    import sys
    env = dict(os.environ)
    env['FEABAS_TPU_BENCH_REEXEC'] = '1'
    env['FEABAS_TPU_BENCH_BACKEND'] = 'cpu-fallback (accelerator unavailable)'
    env['JAX_PLATFORMS'] = 'cpu'
    pyp = [p for p in env.get('PYTHONPATH', '').split(os.pathsep)
           if p and 'axon_site' not in p]
    env['PYTHONPATH'] = os.pathsep.join(pyp) if pyp else ''
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)


if __name__ == '__main__':
    import os
    if (os.environ.get('FEABAS_TPU_BENCH_REEXEC') != '1'
            and not _accelerator_alive()):
        _reexec_cpu()
    main()
