"""Tensorstore section flow across all three CLIs: stitch sections are
rendered into per-section zarr volumes (no PNG tiles, no metadata.txt),
then the thumbnail and align drivers must pick the volumes up as
first-class sources — thumbnails via stacked downsample drivers, fine
matching/rendering via TensorStoreLoaders (reference equivalents:
thumbnail_main.py:446-506, align_main.py:102, renderer.py:753-817)."""

import numpy as np
import pytest

from synthutil import texture


# per-section drift steps (world px); cumsum gives each section's view
# origin inside the shared base texture
DRIFT = np.array([[0.0, 0.0], [9.0, -6.0], [-5.0, 8.0]])
TILE_H, TILE_W, OVERLAP = 180, 200, 60
SEC_H, SEC_W = TILE_H, 2 * TILE_W - OVERLAP


@pytest.fixture()
def ts_workdir(workdir, rng):
    """Three sections, each a 1x2 jittered tile grid cut from a drifted
    view of one base texture."""
    from feabas_tpu import storage, config
    from feabas_tpu.common import imwrite
    margin = 40
    base = texture(rng, SEC_H + 2 * margin, SEC_W + 2 * margin, blur=3)
    names = [f's{z:04d}' for z in range(3)]
    cums = np.cumsum(DRIFT, axis=0)
    for z, name in enumerate(names):
        oy = margin + int(cums[z][1])
        ox = margin + int(cums[z][0])
        view = base[oy:oy + SEC_H, ox:ox + SEC_W]
        tdir = workdir / 'raw' / name
        lines = ['{ROOT_DIR}\t' + str(tdir), '{RESOLUTION}\t4']
        for c in range(2):
            x0 = c * (TILE_W - OVERLAP)
            jx, jy = (0, 0) if c == 0 else \
                np.round(rng.normal(0, 2.0, 2)).astype(int)
            xt = int(np.clip(x0 + jx, 0, SEC_W - TILE_W))
            yt = int(np.clip(jy, 0, SEC_H - TILE_H))
            tile = view[yt:yt + TILE_H, xt:xt + TILE_W]
            fn = f'{name}_tr1-tc{c + 1}.png'
            imwrite(str(tdir / fn), tile)
            lines.append(f'{fn}\t{x0}\t0\t{x0 + TILE_W}\t{TILE_H}')
        coord = storage.join_paths(str(workdir), 'stitch', 'stitch_coord',
                                   name + '.txt')
        with storage.File(coord, 'w') as f:
            f.write('\n'.join(lines) + '\n')
    storage.save_yaml(
        storage.join_paths(str(workdir), 'configs', 'stitching_configs.yaml'),
        {'matching': {'matcher_config': {'coarse_downsample': 1.0,
                                         'conf_thresh': 0.25}},
         'rendering': {'driver': 'zarr', 'read_chunk_size': [128, 128],
                       'loader_settings': {'apply_CLAHE': False,
                                           'inverse': False}}})
    storage.save_yaml(
        storage.join_paths(str(workdir), 'configs', 'thumbnail_configs.yaml'),
        {'thumbnail_mip_level': 1,
         'downsample': {'thumbnail_highpass': True,
                        'highpass_inter_mip_lvl': 0},
         'alignment': {
             'compare_distance': 1,
             'feature_matching': {'detect_settings': {'sigma': 2.5,
                                                      'min_spacing': 4,
                                                      'num_features': 2000}},
             'block_matching': {'spacings': [40, 20], 'conf_thresh': 0.25,
                                'sigma': 2.5},
             'optimization': {
                 'meshing_config': {'mesh_size': 40},
                 'slide_window': {'window_size': 3, 'buffer_size': 1,
                                  'start_loc': 'L', 'residue_len': 2}}}})
    storage.save_yaml(
        storage.join_paths(str(workdir), 'configs', 'alignment_configs.yaml'),
        {'meshing': {'mesh_size': 40},
         'matching': {'working_mip_level': 0,
                      'matcher_config': {'spacings': [80, 40],
                                         'conf_thresh': 0.25, 'sigma': 2.5,
                                         'min_boundary_distance': 15,
                                         'residue_len': 3}},
         'optimization': {'slide_window': {'window_size': 3, 'buffer_size': 1,
                                           'start_loc': 'L',
                                           'residue_len': 3}},
         'rendering': {'tile_size': [512, 512],
                       'loader_config': {'apply_CLAHE': False,
                                         'inverse': False}}})
    config.clear_config_caches()
    return workdir, names


def test_tensorstore_section_flow(ts_workdir):
    workdir, names = ts_workdir
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts'))
    import stitch_main, thumbnail_main, align_main
    from feabas_tpu import storage
    from feabas_tpu.common import imread

    # --- stitch: match + optimize + render to per-section zarr volumes ---
    stitch_main.main(['--mode', 'matching'])
    stitch_main.main(['--mode', 'optimization'])
    stitch_main.main(['--mode', 'rendering'])
    sec_root = storage.join_paths(str(workdir), 'stitched_sections', 'mip0')
    for n in names:
        d = storage.join_paths(sec_root, n)
        assert storage.file_exists(storage.join_paths(d, '.zarray')), n
        assert not storage.file_exists(storage.join_paths(d, 'metadata.txt'))
    # the volume holds the stitched section (spot-check extent)
    import tensorstore as ts
    vol = ts.open({'driver': 'zarr', 'kvstore': {
        'driver': 'file',
        'path': storage.join_paths(sec_root, names[0])}}).result()
    assert vol.shape[0] >= SEC_W - 4 and vol.shape[1] >= SEC_H - 4

    # --- thumbnails straight from the volumes (downsample drivers) ---
    thumbnail_main.main(['--mode', 'downsample'])
    for n in names:
        p = storage.join_paths(str(workdir), 'thumbnail_align', 'thumbnails',
                               n + '.png')
        assert storage.file_exists(p), n
    t0 = imread(storage.join_paths(str(workdir), 'thumbnail_align',
                                   'thumbnails', names[0] + '.png'))
    # the default pad_to_tile_size pads the volume canvas to whole
    # 128px chunks (reference default config stitching:71), so the
    # mip1 thumbnail is half the PADDED extent
    pad_w = int(np.ceil(SEC_W / 128)) * 128
    assert abs(t0.shape[1] - pad_w // 2) <= 3, t0.shape
    # no PNG mip pyramid was materialized for TS sections
    assert not storage.file_exists(storage.join_paths(
        str(workdir), 'stitched_sections', 'mip1', names[0], 'metadata.txt'))

    # --- thumbnail matching recovers the coarse drift ---
    thumbnail_main.main(['--mode', 'matching'])
    from feabas_tpu.aligner import read_matches_from_h5, match_name
    for z in (1, 2):
        m = read_matches_from_h5(
            storage.join_paths(str(workdir), 'thumbnail_align', 'matches',
                               match_name(names[z - 1], names[z])),
            target_resolution=4)
        d = np.median(m.xy0 - m.xy1, axis=0)
        assert np.allclose(d, DRIFT[z], atol=2.5), (z, d, DRIFT[z])
    thumbnail_main.main(['--mode', 'optimization'])

    # --- align: mesh/match/optimize/render off the TS loaders ---
    align_main.main(['--mode', 'meshing'])
    align_main.main(['--mode', 'matching'])
    m01 = read_matches_from_h5(storage.join_paths(
        str(workdir), 'align', 'matches', match_name(names[0], names[1])))
    assert m01.xy0.shape[0] >= 6
    err = np.linalg.norm(m01.xy0 - (m01.xy1 + DRIFT[1]), axis=-1)
    assert np.median(err) < 1.0, np.median(err)

    align_main.main(['--mode', 'optimization'])
    for n in names:
        assert storage.file_exists(
            storage.join_paths(str(workdir), 'align', 'tform', n + '.h5'))

    align_main.main(['--mode', 'rendering'])
    from feabas_tpu.dal import StaticImageLoader
    rendered = []
    out_root = storage.join_paths(str(workdir), 'aligned_stack', 'mip0')
    for z, n in enumerate(names):
        meta = storage.join_paths(out_root, f'{z:05d}_{n}', 'metadata.txt')
        assert storage.file_exists(meta), n
        ld = StaticImageLoader.from_coordinate_file(meta)
        rendered.append(ld.crop((0, 0, SEC_W, SEC_H)))
    inner = (slice(40, SEC_H - 40), slice(40, SEC_W - 40))
    for z in (1, 2):
        a = rendered[0][inner].astype(np.float64).ravel()
        b = rendered[z][inner].astype(np.float64).ravel()
        ok = (a > 0) & (b > 0)
        cc = np.corrcoef(a[ok], b[ok])[0, 1]
        assert cc > 0.85, (z, cc)
