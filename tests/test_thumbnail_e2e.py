"""Thumbnail pipeline end-to-end: downsample -> match -> optimize -> render."""

import numpy as np
import pytest

from synthutil import texture


@pytest.fixture()
def thumb_workdir(workdir, rng):
    """Three fake stitched sections (single-tile mosaics) with drift."""
    import cv2
    from feabas_tpu import storage, config
    from feabas_tpu.common import imwrite
    h = w = 512
    base = texture(rng, h + 60, w + 60, blur=4)
    drift = np.array([[0.0, 0.0], [18.0, -12.0], [-10.0, 22.0]])
    names = [f'sec{z:04d}' for z in range(3)]
    root = storage.join_paths(str(workdir), 'stitched_sections', 'mip0')
    for z, name in enumerate(names):
        cum = drift[:z + 1].sum(axis=0)
        gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        img = cv2.remap(base, (gx + 30 + cum[0]).astype(np.float32),
                        (gy + 30 + cum[1]).astype(np.float32),
                        cv2.INTER_LINEAR)
        d = storage.join_paths(root, name)
        imwrite(storage.join_paths(d, name + '_tr1-tc1.png'), img)
        with storage.File(storage.join_paths(d, 'metadata.txt'), 'w') as f:
            f.write('{ROOT_DIR}\t' + d + '\n{RESOLUTION}\t4\n')
            f.write(f'{name}_tr1-tc1.png\t0\t0\t{w}\t{h}\n')
    storage.save_yaml(
        storage.join_paths(str(workdir), 'configs', 'thumbnail_configs.yaml'),
        {'thumbnail_mip_level': 2,
         'downsample': {'max_mip': 2, 'thumbnail_highpass': False},
         'alignment': {
             'compare_distance': 1,
             'feature_matching': {'detect_settings': {'sigma': 2.5,
                                                      'min_spacing': 6,
                                                      'num_features': 1500}},
             'block_matching': {'spacings': [40, 20], 'conf_thresh': 0.25,
                                'sigma': 2.5},
             'optimization': {
                 'meshing_config': {'mesh_size': 40},
                 'slide_window': {'window_size': 3, 'buffer_size': 1,
                                  'start_loc': 'L', 'residue_len': 2}}}})
    config.clear_config_caches()
    return workdir, names, drift


def test_thumbnail_pipeline(thumb_workdir):
    workdir, names, drift = thumb_workdir
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts'))
    import thumbnail_main
    from feabas_tpu import storage
    from feabas_tpu.common import imread

    thumbnail_main.main(['--mode', 'downsample'])
    for n in names:
        assert storage.file_exists(storage.join_paths(
            str(workdir), 'thumbnail_align', 'thumbnails', n + '.png'))
        # mip chain exists
        assert storage.file_exists(storage.join_paths(
            str(workdir), 'stitched_sections', 'mip2', n, 'metadata.txt'))
    # thumbnail is 4x downsampled
    t0 = imread(storage.join_paths(str(workdir), 'thumbnail_align',
                                   'thumbnails', names[0] + '.png'))
    assert abs(t0.shape[0] - 128) <= 2

    # 'alignment' chains matching -> optimization -> render in one run
    # (reference: thumbnail_main.py:398); assertions below check each
    # stage's artifacts
    thumbnail_main.main(['--mode', 'alignment'])
    from feabas_tpu.aligner import read_matches_from_h5, match_name
    scale = 4.0  # mip2
    m = read_matches_from_h5(storage.join_paths(
        str(workdir), 'thumbnail_align', 'matches',
        match_name(names[0], names[1])), target_resolution=4)
    # match coords come back at mip0 resolution; drift must be recovered
    # img1(p) = img0(p + drift1): a feature at p in sec1 sits at p + drift1
    # in sec0, so xy0 = xy1 + drift1
    d = np.median(m.xy0 - m.xy1, axis=0)
    assert np.allclose(d, drift[1], atol=scale), (d, drift[1])

    for n in names:
        assert storage.file_exists(storage.join_paths(
            str(workdir), 'thumbnail_align', 'tform', n + '.h5'))

    imgs = []
    for n in names:
        p = storage.join_paths(str(workdir), 'thumbnail_align', 'aligned',
                               n + '.png')
        assert storage.file_exists(p)
        imgs.append(imread(p))
    inner = (slice(20, -20), slice(20, -20))
    for z in (1, 2):
        a = imgs[0][inner].astype(float).ravel()
        b = imgs[z][inner].astype(float).ravel()
        ok = (a > 0) & (b > 0)
        cc = np.corrcoef(a[ok], b[ok])[0, 1]
        assert cc > 0.9, (z, cc)


def test_match_name_anchor_pairs(workdir):
    """thumbnail_align/match_name.txt adds long-range anchor pairs to the
    neighbor pair list (reference: README:305-311,
    thumbnail_main.py:533-546)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts'))
    import thumbnail_main
    from feabas_tpu import storage
    names = [f's{z:02d}' for z in range(6)]
    with storage.File(storage.join_paths(
            str(workdir), 'thumbnail_align', 'match_name.txt'), 'w') as f:
        f.write('s00 s05\n')        # long-range anchor
        f.write('s00 s01\n')        # duplicate of a neighbor pair: ignored
    pairs = thumbnail_main._pair_list(names, 1, str(workdir))
    assert ('s00', 's05') in pairs
    assert pairs.count(('s00', 's01')) == 1
    assert len(pairs) == 6  # 5 distance-1 neighbors + 1 anchor
