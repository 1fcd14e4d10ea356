"""End-to-end 3D alignment: stitched sections -> mesh -> match -> optimize
-> render, with warped synthetic sections."""

import numpy as np
import pytest

from synthutil import texture


@pytest.fixture()
def align_workdir(workdir, rng):
    """Three 'stitched' sections: cumulatively drifted + warped copies of a
    base texture, written in the stitched_sections layout."""
    import cv2
    from feabas_tpu import storage
    from feabas_tpu.common import imwrite
    h = w = 320
    base = texture(rng, h + 80, w + 80)
    drift = np.array([[0.0, 0.0], [6.0, -4.0], [-3.0, 8.0]])
    amp, period = 2.0, 150.0
    sections = []
    for z in range(3):
        gx, gy = np.meshgrid(np.arange(w, dtype=np.float32),
                             np.arange(h, dtype=np.float32))
        cum = drift[:z + 1].sum(axis=0)
        dx = cum[0] + z * amp * np.sin(2 * np.pi * gy / period)
        dy = cum[1] + z * amp * np.cos(2 * np.pi * gx / period)
        img = cv2.remap(base, (gx + 40 + dx).astype(np.float32),
                        (gy + 40 + dy).astype(np.float32), cv2.INTER_LINEAR)
        sections.append(img)
    root = storage.join_paths(str(workdir), 'stitched_sections', 'mip0')
    names = [f'sec{z:04d}' for z in range(3)]
    for name, img in zip(names, sections):
        d = storage.join_paths(root, name)
        imwrite(storage.join_paths(d, name + '_tr1-tc1.png'), img)
        with storage.File(storage.join_paths(d, 'metadata.txt'), 'w') as f:
            f.write('{ROOT_DIR}\t' + d + '\n')
            f.write('{RESOLUTION}\t4\n')
            f.write(f'{name}_tr1-tc1.png\t0\t0\t{w}\t{h}\n')
    # project overrides sized for the small synthetic sections
    storage.save_yaml(
        storage.join_paths(str(workdir), 'configs', 'alignment_configs.yaml'),
        {'meshing': {'mesh_size': 30},
         'matching': {'working_mip_level': 0,
                      'matcher_config': {'spacings': [100, 50, 25],
                                         'conf_thresh': 0.25, 'sigma': 2.5,
                                         'min_boundary_distance': 20,
                                         'residue_len': 3}},
         'optimization': {'slide_window': {'window_size': 3, 'buffer_size': 1,
                                           'start_loc': 'L',
                                           'residue_len': 3}},
         'rendering': {'tile_size': [512, 512],
                       'loader_config': {'apply_CLAHE': False,
                                         'inverse': False}}})
    from feabas_tpu import config
    config.clear_config_caches()
    return workdir, names, sections, drift


def test_align_pipeline_end_to_end(align_workdir):
    workdir, names, sections, drift = align_workdir
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts'))
    import align_main
    from feabas_tpu import storage

    align_main.main(['--mode', 'meshing'])
    for n in names:
        assert storage.file_exists(
            storage.join_paths(str(workdir), 'align', 'mesh', n + '.h5'))

    align_main.main(['--mode', 'matching'])
    from feabas_tpu.aligner import read_matches_from_h5, match_name
    m01 = read_matches_from_h5(storage.join_paths(
        str(workdir), 'align', 'matches', match_name(names[0], names[1])))
    assert m01.xy0.shape[0] >= 6
    # ground truth: content at p in sec1 equals content at p + delta in
    # sec0 where delta = disp1(p) - disp0(p); for z=0 disp0=0, so
    # xy0 ~ xy1 + drift[1] + warp1(xy1)
    amp, period = 2.0, 150.0
    w1 = np.stack([
        1 * amp * np.sin(2 * np.pi * m01.xy1[:, 1] / period),
        1 * amp * np.cos(2 * np.pi * m01.xy1[:, 0] / period)], -1)
    want = m01.xy1 + drift[1] + w1
    err = np.linalg.norm(m01.xy0 - want, axis=-1)
    assert np.median(err) < 1.0, np.median(err)

    align_main.main(['--mode', 'optimization'])
    for n in names:
        assert storage.file_exists(
            storage.join_paths(str(workdir), 'align', 'tform', n + '.h5'))
    assert storage.file_exists(
        storage.join_paths(str(workdir), 'align', 'residues.csv'))

    align_main.main(['--mode', 'rendering'])
    from feabas_tpu.dal import StaticImageLoader
    rendered = []
    out_root = storage.join_paths(str(workdir), 'aligned_stack', 'mip0')
    for z, n in enumerate(names):
        meta = storage.join_paths(out_root, f'{z:05d}_{n}', 'metadata.txt')
        assert storage.file_exists(meta), n
        ld = StaticImageLoader.from_coordinate_file(meta)
        rendered.append(ld.crop((0, 0, 320, 320)))
    # aligned sections must overlay: high correlation in the shared interior
    inner = (slice(60, 260), slice(60, 260))
    for z in range(1, 3):
        a = rendered[0][inner].astype(np.float64).ravel()
        b = rendered[z][inner].astype(np.float64).ravel()
        ok = (a > 0) & (b > 0)
        cc = np.corrcoef(a[ok], b[ok])[0, 1]
        assert cc > 0.85, (z, cc)


def test_align_tsr_tsd_modes(align_workdir):
    """Volume export (tsr) + 3D downsample (tsd) through the CLI driver."""
    workdir, names, sections, drift = align_workdir
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts'))
    import align_main
    from feabas_tpu import storage, config
    # prerequisite stages
    for mode in ('meshing', 'matching', 'optimization'):
        align_main.main(['--mode', mode])
    storage.save_yaml(
        storage.join_paths(str(workdir), 'configs', 'alignment_configs.yaml'),
        {**storage.load_yaml(storage.join_paths(
            str(workdir), 'configs', 'alignment_configs.yaml')),
         'tensorstore_rendering': {'chunk_shape': [128, 128, 2],
                                   'driver': 'neuroglancer_precomputed'},
         'tensorstore_downsample': {'mip_levels': [1], 'downsample_z': 1}})
    config.clear_config_caches()
    align_main.main(['--mode', 'tsr'])
    out = storage.join_paths(str(workdir), 'aligned_tensorstore')
    import tensorstore as ts
    import numpy as np
    d = ts.open({'driver': 'neuroglancer_precomputed',
                 'kvstore': {'driver': 'file', 'path': out}}).result()
    assert d.shape[2] >= 3
    # aligned content overlays across z in the volume
    a = np.asarray(d[80:240, 80:240, 0, 0].read().result()).astype(float)
    b = np.asarray(d[80:240, 80:240, 2, 0].read().result()).astype(float)
    ok = (a > 0) & (b > 0)
    cc = np.corrcoef(a[ok].ravel(), b[ok].ravel())[0, 1]
    assert cc > 0.8, cc
    align_main.main(['--mode', 'tsd'])
    # a second scale exists now; keep_chunk_layout reuses the full-res
    # chunk shape (clipped to the scale size)
    import json
    with open(os.path.join(out, 'info')) as f:
        info = json.load(f)
    assert len(info['scales']) >= 2
    s1 = info['scales'][1]
    want = [min(128, s) for s in s1['size'][:2]] + [min(2, s1['size'][2])]
    assert list(s1['chunk_sizes'][0]) == want, (s1['chunk_sizes'], want)
    # --filter: isolated sub-volume of the filtered sections, z renumbered
    # from 0 (reference: align_main.py:419-423,497-500)
    align_main.main(['--mode', 'tsr', '--filter', names[2]])
    sub = storage.join_paths(out, names[2])
    d2 = ts.open({'driver': 'neuroglancer_precomputed',
                  'kvstore': {'driver': 'file', 'path': sub}}).result()
    assert d2.shape[2] == 1
    full = np.asarray(d[80:240, 80:240, 2, 0].read().result())
    filt = np.asarray(d2[80:240, 80:240, 0, 0].read().result())
    assert np.array_equal(full, filt)


def test_align_downsample_mode(align_workdir):
    """--mode downsample builds mip pyramids of the rendered aligned stack
    (reference generate_aligned_mipmaps: align_main.py:276-300,470)."""
    workdir, names, sections, drift = align_workdir
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts'))
    import align_main
    from feabas_tpu import storage, config
    for mode in ('meshing', 'matching', 'optimization', 'rendering'):
        align_main.main(['--mode', mode])
    aconf = storage.load_yaml(storage.join_paths(
        str(workdir), 'configs', 'alignment_configs.yaml'))
    aconf['downsample'] = {'max_mip': 2, 'format': 'png',
                           'parallel_within_section': True}
    storage.save_yaml(storage.join_paths(
        str(workdir), 'configs', 'alignment_configs.yaml'), aconf)
    config.clear_config_caches()
    align_main.main(['--mode', 'downsample'])
    from feabas_tpu.common import imread
    root = storage.join_paths(str(workdir), 'aligned_stack')
    for z, n in enumerate(names):
        sec = f'{z:05d}_{n}'
        for mip in (1, 2):
            meta = storage.join_paths(root, f'mip{mip}', sec, 'metadata.txt')
            assert storage.file_exists(meta), (sec, mip)
        # mip2 is 4x smaller than the 320px mip0 render
        from feabas_tpu.dal import StaticImageLoader
        ld = StaticImageLoader.from_coordinate_file(
            storage.join_paths(root, 'mip2', sec, 'metadata.txt'))
        blk = ld.crop((0, 0, 80, 80))
        assert blk is not None and blk.shape == (80, 80)


def test_tensorstore_writer_sharded_read_chunks(tmp_path):
    """read_chunk_shape != chunk_shape engages the sharded neuroglancer
    format: big write shards, small read chunks (reference schema:
    stitcher.py:1680-1686)."""
    from feabas_tpu.dal import TensorStoreWriter
    out = str(tmp_path / 'vol')
    w = TensorStoreWriter.create(out, (0, 0, 512, 512), 4,
                                 chunk_shape=[256, 256, 2],
                                 read_chunk_shape=[64, 64, 1])
    assert list(w.dataset.chunk_layout.write_chunk.shape[:3]) == [256, 256, 2]
    assert list(w.dataset.chunk_layout.read_chunk.shape[:3]) == [64, 64, 1]
    img = (np.arange(256 * 256) % 251).astype(np.uint8).reshape(256, 256)
    w.write_single_chunk((0, 0, 256, 256), 0, img)
    import tensorstore as ts
    d = ts.open({'driver': 'neuroglancer_precomputed',
                 'kvstore': {'driver': 'file', 'path': out}}).result()
    back = np.asarray(d[0:256, 0:256, 0, 0].read().result())
    assert np.array_equal(back.T, img)


def test_cli_filter_and_slurm_config(workdir, tmp_path, monkeypatch):
    """--filter subsets section lists by substring; --slurm_config routes
    optimization windows to the slurm backend with the YAML's settings
    (reference: stitch_main.py:222,275-296; align_main.py:330-336)."""
    import sys, os, logging
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts'))
    import stitch_main
    import align_main
    from feabas_tpu import storage
    for n in ('s0001', 's0002', 't0003'):
        with storage.File(storage.join_paths(
                str(workdir), 'stitch', 'stitch_coord', n + '.txt'), 'w') as f:
            f.write('{ROOT_DIR}\t/x\n')
    args = stitch_main.parse_args(['--filter', 's000'])
    names = [n for n, _ in stitch_main.section_list(str(workdir), args)]
    assert names == ['s0001', 's0002']
    # --slurm_config lands in slide_window dispatch settings
    scfg = str(tmp_path / 'slurm.yaml')
    storage.save_yaml(scfg, {'sbatch_cmd': 'xbatch',
                             'slurm_options': ['--partition=cpu']})
    captured = {}

    class FakeAligner:
        def __init__(self, *a, **k):
            pass

        def run(self, **kw):
            captured.update(kw)
            return []

        def write_residue_file(self, path):
            pass

    import feabas_tpu.aligner as alig
    monkeypatch.setattr(alig, 'Aligner', FakeAligner)
    align_main.optimize_main(
        align_main.parse_args(['--mode', 'optimization',
                               '--slurm_config', scfg]),
        {'optimization': {'slide_window': {'window_size': 4}}},
        logging.getLogger('test'))
    sw = captured['slide_window']
    assert sw['parallel_framework'] == 'slurm'
    assert sw['window_size'] == 4
    assert sw['dispatch_settings']['sbatch_cmd'] == 'xbatch'
    # a missing config file is a hard error, not a silent local run
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        align_main.optimize_main(
            align_main.parse_args(['--mode', 'optimization',
                                   '--slurm_config', scfg + '.nope']),
            {'optimization': {}}, logging.getLogger('test'))


def test_cli_mode_prefix_parsing():
    """Drivers accept unique mode prefixes like the reference (e.g.
    --mode opt); ambiguous prefixes are rejected."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts'))
    import pytest
    import stitch_main
    import align_main
    import thumbnail_main
    assert stitch_main.parse_args(['--mode', 'opt']).mode == 'optimization'
    assert align_main.parse_args(['--mode', 'me']).mode == 'meshing'
    assert thumbnail_main.parse_args(['--mode', 'a']).mode == 'alignment'
    with pytest.raises(SystemExit):
        align_main.parse_args(['--mode', 'm'])   # meshing vs matching
    with pytest.raises(SystemExit):
        align_main.parse_args(['--mode', 'ts'])  # tsr vs tsd


def test_section_order_file(align_workdir):
    """section_order.txt (z<TAB>name lines) reorders/renumbers sections in
    the rendering and tsr paths (reference: align_main.py:398,465,499;
    common.rearrange_section_order:814)."""
    workdir, names, sections, drift = align_workdir
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts'))
    import align_main
    from feabas_tpu import storage
    for mode in ('meshing', 'matching', 'optimization'):
        align_main.main(['--mode', mode])
    # explicit z assignment, reversed relative to name order
    with storage.File(storage.join_paths(str(workdir),
                                         'section_order.txt'), 'w') as f:
        f.write(f'2\t{names[0]}\n1\t{names[1]}\n0\t{names[2]}\n')
    align_main.main(['--mode', 'rendering'])
    root = storage.join_paths(str(workdir), 'aligned_stack', 'mip0')
    assert storage.file_exists(storage.join_paths(
        root, f'00002_{names[0]}', 'metadata.txt'))
    assert storage.file_exists(storage.join_paths(
        root, f'00000_{names[2]}', 'metadata.txt'))
    assert not storage.file_exists(storage.join_paths(
        root, f'00000_{names[0]}', 'metadata.txt'))


def test_canvas_freeze_warns_on_outlying_tforms(workdir, tmp_path):
    """canvas.json freezes the render grid; tforms committed later that
    fall outside must trigger a loud warning, not silent clipping."""
    import sys, os, logging
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts'))
    import align_main
    from feabas_tpu.mesh import Mesh
    tdir = str(tmp_path / 'tform')
    m = Mesh.from_bbox((0, 0, 100, 100), cartesian=True, mesh_size=50)
    m.set_translation((0, 0))
    m.save_to_h5(os.path.join(tdir, 'a.h5'))
    logger = logging.getLogger('canvas-test')
    bbox = align_main.get_or_make_canvas(tdir, logger)
    assert bbox is not None and bbox[2] >= 100
    # a later tform outside the frozen canvas
    m2 = Mesh.from_bbox((0, 0, 100, 100), cartesian=True, mesh_size=50)
    m2.set_translation((500, 500))
    m2.save_to_h5(os.path.join(tdir, 'b.h5'))
    from feabas_tpu import storage
    storage.clear_exists_cache()
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logger.addHandler(Capture())
    logger.setLevel(logging.WARNING)
    bbox2 = align_main.get_or_make_canvas(tdir, logger)
    assert bbox2 == bbox  # frozen
    assert any('extends beyond' in r for r in records), records


def test_align_matching_includes_anchor_pairs(align_workdir):
    """A long-range thumbnail match (e.g. from match_name.txt anchors)
    defines a fine-matching pair beyond compare_distance — the anchor
    route that bounds the drift random walk (reference:
    align_main.py:72,102; README:305-311)."""
    workdir, names, sections, drift = align_workdir
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts'))
    import align_main
    from feabas_tpu import storage
    from feabas_tpu.aligner import save_matches_to_h5, match_name
    from feabas_tpu.common import Match
    align_main.main(['--mode', 'meshing'])
    # fabricate the sec0 <-> sec2 coarse anchor (drift-only seed; the
    # fine matcher refines the warp residual)
    cum = drift[:3].sum(axis=0)
    xs, ys = np.meshgrid(np.linspace(60, 260, 4), np.linspace(60, 260, 4))
    xy1 = np.stack([xs.ravel(), ys.ravel()], -1)
    anchor = Match(xy1 + cum, xy1, np.ones(len(xy1)), 0.01)
    save_matches_to_h5(
        storage.join_paths(str(workdir), 'thumbnail_align', 'matches',
                           match_name(names[0], names[2])), anchor, 4)
    align_main.main(['--mode', 'matching'])
    out = storage.join_paths(str(workdir), 'align', 'matches',
                             match_name(names[0], names[2]))
    assert storage.file_exists(out), 'anchor pair was not fine-matched'
    from feabas_tpu.aligner import read_matches_from_h5
    m = read_matches_from_h5(out)
    assert m.xy0.shape[0] >= 6
    # recovered displacement must reflect the cumulative drift
    d = np.median(m.xy0 - m.xy1, axis=0)
    assert np.linalg.norm(d - cum) < 3.0, (d, cum)
