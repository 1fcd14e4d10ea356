"""End-to-end stitching: coordinate file -> match -> optimize -> render,
with analytic ground truth from a synthetic tile grid."""

import numpy as np
import pytest

from synthutil import tile_grid


@pytest.fixture()
def stitch_workdir(workdir, rng):
    """Populate the work dir with a 2x3 synthetic section."""
    from feabas_tpu import storage
    from feabas_tpu.common import imwrite
    world, tiles, true_bboxes, stage_bboxes = tile_grid(
        rng, rows=2, cols=3, tile_h=160, tile_w=200, overlap=40, jitter=3.0)
    tdir = workdir / 'raw' / 's0001'
    coord_lines = ['{ROOT_DIR}\t' + str(tdir), '{RESOLUTION}\t4']
    for k, (tile, sb) in enumerate(zip(tiles, stage_bboxes)):
        fn = f'tile_{k:03d}.png'
        imwrite(str(tdir / fn), tile)
        coord_lines.append(f'{fn}\t{sb[0]:.0f}\t{sb[1]:.0f}\t{sb[2]:.0f}\t{sb[3]:.0f}')
    coord = storage.join_paths(str(workdir), 'stitch', 'stitch_coord', 's0001.txt')
    with storage.File(coord, 'w') as f:
        f.write('\n'.join(coord_lines) + '\n')
    # project-level config override: tiles here are tiny compared to real
    # EM tiles, so skip the coarse 2x downsample stage
    from feabas_tpu import config
    storage.save_yaml(
        storage.join_paths(str(workdir), 'configs', 'stitching_configs.yaml'),
        {'matching': {'matcher_config': {'coarse_downsample': 1.0,
                                         'conf_thresh': 0.25}},
         'rendering': {'loader_settings': {'apply_CLAHE': False,
                                           'inverse': False}}})
    config.clear_config_caches()
    return workdir, world, tiles, true_bboxes, stage_bboxes


def test_stitch_pipeline_end_to_end(stitch_workdir):
    workdir, world, tiles, true_bboxes, stage_bboxes = stitch_workdir
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts'))
    import stitch_main
    from feabas_tpu import storage, config

    # --- matching ---
    stitch_main.main(['--mode', 'matching'])
    match_file = storage.join_paths(str(workdir), 'stitch', 'match_h5', 's0001.h5')
    assert storage.file_exists(match_file)
    from feabas_tpu.stitcher import Stitcher
    st = Stitcher.from_h5(match_file)
    assert len(st.matches) == 7  # 2x3 grid: 4 horizontal + 3 vertical... -> 7
    # every match must agree with the true tile displacement within ~0.5px
    for (i, j), m in st.matches.items():
        true_d = true_bboxes[j][:2] - true_bboxes[i][:2]
        err = (m.xy0 + true_d) - (m.xy1 + true_bboxes[j][:2] - true_bboxes[j][:2] * 0 + 0)
        # world position parity: xy0 + origin_i == xy1 + origin_j
        err = (m.xy0 + true_bboxes[i][:2]) - (m.xy1 + true_bboxes[j][:2])
        med = np.median(np.abs(err), axis=0)
        assert (med < 0.5).all(), ((i, j), med)

    # --- optimization ---
    stitch_main.main(['--mode', 'optimization'])
    tform_file = storage.join_paths(str(workdir), 'stitch', 'tform', 's0001.h5')
    assert storage.file_exists(tform_file)
    st2 = Stitcher.from_h5(tform_file)
    assert st2.meshes is not None and len(st2.meshes) == 6
    # relative placements must match ground truth: the difference between
    # solved offsets of tiles i and j equals the true bbox offset diff
    moving = [m.vertices_w_offset('MOVING').mean(axis=0) for m in st2.meshes]
    initial = [m.vertices_w_offset('INITIAL').mean(axis=0) for m in st2.meshes]
    sol_origin = [mv - iv for mv, iv in zip(moving, initial)]
    for j in range(1, 6):
        want = true_bboxes[j][:2] - true_bboxes[0][:2]
        got = sol_origin[j] - sol_origin[0]
        assert np.allclose(got, want, atol=0.5), (j, got, want)

    # --- rendering ---
    stitch_main.main(['--mode', 'rendering'])
    out_dir = storage.join_paths(str(workdir), 'stitched_sections', 'mip0', 's0001')
    meta = storage.join_paths(out_dir, 'metadata.txt')
    assert storage.file_exists(meta)
    # rebuild the stitched section and compare against the source world
    from feabas_tpu.dal import StaticImageLoader
    from feabas_tpu.common import imread
    loader = StaticImageLoader.from_coordinate_file(meta)
    canvas = loader.crop((0, 0, 560, 330))
    # a central world patch must appear in the canvas nearly verbatim, at
    # the position implied by the solved placements (corner normalized to
    # (1,1), stage-anchored absolute frame -> few px slack)
    import cv2
    patch = world[120:280, 150:450].astype(np.float32)
    res = cv2.matchTemplate(canvas.astype(np.float32), patch,
                            cv2.TM_CCOEFF_NORMED)
    cc = float(res.max())
    loc = np.unravel_index(int(res.argmax()), res.shape)
    assert cc > 0.9, cc
    expected = np.array([120 - true_bboxes[:, 1].min() + 1,
                         150 - true_bboxes[:, 0].min() + 1])
    assert np.abs(np.asarray(loc) - expected).max() < 6, (loc, expected)

    # --- idempotency: re-running skips everything quickly ---
    stitch_main.main(['--mode', 'matching'])
    stitch_main.main(['--mode', 'optimization'])
