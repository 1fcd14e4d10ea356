"""Loaders and mesh-warped rendering against analytic ground truth."""

import numpy as np
import pytest


@pytest.fixture()
def tile_set(tmp_path, rng):
    """2x2 tiles of a procedural texture saved to disk, 10px overlap."""
    from feabas_tpu.common import imwrite
    from scipy.ndimage import gaussian_filter
    world = (gaussian_filter(rng.normal(0, 1, (220, 220)), 2) * 40 + 128).astype(np.uint8)
    paths, bboxes = [], []
    for r in range(2):
        for c in range(2):
            x0, y0 = c * 100, r * 100
            tile = world[y0:y0 + 120, x0:x0 + 120]
            p = str(tmp_path / f'tile_r{r}c{c}.png')
            imwrite(p, tile)
            paths.append(p)
            bboxes.append((x0, y0, x0 + 120, y0 + 120))
    return world, paths, bboxes


def test_static_loader_mosaic(tile_set, workdir):
    from feabas_tpu.dal import StaticImageLoader
    world, paths, bboxes = tile_set
    loader = StaticImageLoader(paths, bboxes, cache_size=10)
    blk = loader.crop((50, 40, 180, 150))
    assert blk.shape == (110, 130)
    assert np.array_equal(blk, world[40:150, 50:180])
    # out-of-range crop fills
    blk2 = loader.crop((-20, -20, 10, 10))
    assert blk2[0, 0] == 0 and np.array_equal(blk2[20:, 20:], world[:10, :10])
    assert loader.crop((1000, 1000, 1100, 1100), return_empty=True) is None


def test_loader_json_roundtrip(tile_set, workdir):
    from feabas_tpu.dal import StaticImageLoader, get_loader_from_json
    world, paths, bboxes = tile_set
    loader = StaticImageLoader(paths, bboxes, cache_size=5, fillval=7)
    spec = loader.to_json()
    loader2 = get_loader_from_json(spec)
    assert np.array_equal(loader2.crop((0, 0, 50, 50)), world[:50, :50])
    assert loader2.default_fillval == 7


def test_float_bbox_crop_consistent_with_canvas(tile_set, workdir):
    """Float crop bboxes where round(edge) disagrees with round(extent)
    by 1 px (e.g. y0=10.5, y1=139.0) must not overrun the canvas — the
    10k-tile MultiSEM rehearsal crashed here (tile bboxes carry float
    stage positions; the render stage crops at float mesh coords)."""
    from feabas_tpu.dal import StaticImageLoader
    world, paths, bboxes = tile_set
    # float tile bboxes as MultiSEM stage coordinates produce
    fb = [(x0 + 0.5, y0 + 0.5, x1 + 0.5, y1 + 0.5)
          for x0, y0, x1, y1 in bboxes]
    loader = StaticImageLoader(paths, fb)
    blk = loader.crop((0.0, 10.5, 128.0, 139.0))
    assert blk.shape == (128, 128)
    blk2 = loader.crop((0.5, 10.0, 128.0, 138.6))
    assert blk2.shape == (129, 128)
    # integer-bbox behavior unchanged
    li = StaticImageLoader(paths, bboxes)
    assert np.array_equal(li.crop((50, 40, 180, 150)),
                          world[40:150, 50:180])


def test_stream_loader(rng, workdir):
    from feabas_tpu.dal import StreamLoader
    img = rng.integers(0, 255, (64, 64)).astype(np.uint8)
    ld = StreamLoader(img, offset=(10, 20))
    blk = ld.crop((10, 20, 30, 40))
    assert np.array_equal(blk, img[:20, :20])


def test_coordinate_file_loader(tile_set, tmp_path, workdir):
    from feabas_tpu.dal import StaticImageLoader
    world, paths, bboxes = tile_set
    coord = tmp_path / 'coords.txt'
    lines = ['{RESOLUTION}\t4']
    for p, b in zip(paths, bboxes):
        lines.append(f'{p}\t{b[0]}\t{b[1]}\t{b[2]}\t{b[3]}')
    coord.write_text('\n'.join(lines) + '\n')
    loader = StaticImageLoader.from_coordinate_file(str(coord))
    assert loader.resolution == 4
    assert np.array_equal(loader.crop((0, 0, 220, 220)), world[:220, :220])


def test_rasterize_mesh_covers_interior(workdir):
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.renderer import rasterize_mesh
    m = Mesh.from_bbox((0, 0, 60, 40), cartesian=True, mesh_size=20)
    tid = rasterize_mesh(m, (-10, -10, 70, 50), gear='INITIAL')
    assert tid.shape == (60, 80)
    assert (tid[:10] == -1).all() and (tid[:, :10] == -1).all()
    inner = tid[12:48, 12:68]
    assert (inner >= 0).all()


def test_identity_render_reproduces_source(tile_set, workdir):
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import StaticImageLoader
    from feabas_tpu.renderer import MeshRenderer
    world, paths, bboxes = tile_set
    loader = StaticImageLoader(paths, bboxes)
    m = Mesh.from_bbox((0, 0, 220, 220), cartesian=True, mesh_size=50)
    r = MeshRenderer.from_mesh(m, image_loader=loader)
    blk = r.crop((20, 30, 120, 130))
    inner = blk[2:-2, 2:-2]
    want = world[32:128, 22:118]
    assert np.mean(np.abs(inner.astype(int) - want.astype(int))) < 1.0


def test_translated_render(tile_set, workdir):
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import StaticImageLoader
    from feabas_tpu.renderer import MeshRenderer
    world, paths, bboxes = tile_set
    loader = StaticImageLoader(paths, bboxes)
    m = Mesh.from_bbox((0, 0, 220, 220), cartesian=True, mesh_size=50)
    m.set_translation((15, -10))   # content moves by (+15, -10) in output
    r = MeshRenderer.from_mesh(m, image_loader=loader)
    blk = r.crop((50, 30, 150, 130))
    want = world[30 + 10:130 + 10, 50 - 15:150 - 15]
    inner = slice(2, -2)
    assert np.mean(np.abs(blk[inner, inner].astype(int)
                          - want[inner, inner].astype(int))) < 1.0


def test_affine_render_matches_cv2(tile_set, workdir):
    import cv2
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import StaticImageLoader
    from feabas_tpu.renderer import MeshRenderer
    from feabas_tpu import constant as const
    world, paths, bboxes = tile_set
    loader = StaticImageLoader(paths, bboxes)
    m = Mesh.from_bbox((0, 0, 220, 220), cartesian=True, mesh_size=40)
    T = np.eye(3)
    T[:2, :2] = [[1.05, 0.04], [-0.03, 0.97]]
    T[2, :2] = [6.0, -4.0]
    m.apply_affine(T, gear=(const.MESH_GEAR_FIXED, const.MESH_GEAR_MOVING))
    r = MeshRenderer.from_mesh(m, image_loader=loader)
    bbox = (40, 40, 160, 160)
    blk = r.cropping if False else r.crop(bbox)
    # ground truth: inverse-affine sample of world
    Tinv = np.linalg.inv(T)
    gx, gy = np.meshgrid(np.arange(40, 160), np.arange(40, 160))
    sx = gx * Tinv[0, 0] + gy * Tinv[1, 0] + Tinv[2, 0]
    sy = gx * Tinv[0, 1] + gy * Tinv[1, 1] + Tinv[2, 1]
    want = cv2.remap(world, sx.astype(np.float32), sy.astype(np.float32),
                     cv2.INTER_LINEAR)
    valid = (sx > 1) & (sx < 218) & (sy > 1) & (sy < 218)
    diff = np.abs(blk.astype(int) - want.astype(int))[valid]
    assert np.mean(diff) < 1.0, np.mean(diff)


def test_render_whole_mesh_tiles(tile_set, tmp_path, workdir):
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import StaticImageLoader
    from feabas_tpu.renderer import render_whole_mesh
    from feabas_tpu.common import imread
    world, paths, bboxes = tile_set
    loader = StaticImageLoader(paths, bboxes)
    m = Mesh.from_bbox((0, 0, 220, 220), cartesian=True, mesh_size=50)
    out = render_whole_mesh(m, loader, str(tmp_path / 'out' / 'sec0'),
                            tile_size=(128, 128))
    assert len(out) == 4
    for fname, bbox in out.items():
        img = imread(fname)
        assert img.shape == (128, 128)


def test_tensorstore_retry_reconnect(tmp_path, workdir, rng):
    """Transient tensorstore failures trigger reconnect + retry instead of
    surfacing (reference: dal.py:1207-1241)."""
    from feabas_tpu.dal import TensorStoreWriter, TensorStoreLoader

    class _FlakyFuture:
        def __init__(self, fails):
            self.fails = fails
        def result(self, timeout=None):
            raise TimeoutError('injected')

    class _Dim:
        def __init__(self, lo, hi):
            self.inclusive_min = lo
            self.exclusive_max = hi

    class _FlakyIndex:
        def __init__(self, fails):
            self.fails = fails
            self.rank = 3
            self.domain = [_Dim(0, 128), _Dim(0, 128), _Dim(0, 2)]
        def __getitem__(self, idx):
            return self
        def read(self):
            return _FlakyFuture(self.fails)
        def write(self, blk):
            return _FlakyFuture(self.fails)

    w = TensorStoreWriter.create(str(tmp_path / 'vol'), (0, 0, 128, 128), 2,
                                 driver='zarr', chunk_shape=[64, 64, 1])
    img = rng.integers(0, 255, (64, 64)).astype(np.uint8)
    # inject a dead handle: first write attempt times out, reconnect
    # reopens the real store and the retry succeeds
    w._dataset = _FlakyIndex(1)
    w.write_single_chunk((0, 0, 64, 64), 0, img)
    assert np.array_equal(w.read_chunk((0, 0, 64, 64), 0), img)
    # loader path: same injection (dead handle -> reconnect -> real read)
    spec = dict(w._spec)
    spec.pop('create', None)
    spec['open'] = True
    ld = TensorStoreLoader(spec, z=0)
    ld._dataset = _FlakyIndex(1)
    blk = ld.crop((0, 0, 64, 64))
    assert np.array_equal(blk, img)
    # transactional multi-chunk write round-trips
    imgs = [rng.integers(0, 255, (64, 64)).astype(np.uint8) for _ in range(2)]
    w.write_chunks_w_transaction([(0, 0, 64, 64), (64, 0, 128, 64)], 1, imgs)
    assert np.array_equal(w.read_chunk((0, 0, 64, 64), 1), imgs[0])
    assert np.array_equal(w.read_chunk((64, 0, 128, 64), 1), imgs[1])


def test_border_block_caching(tmp_path, workdir, rng, monkeypatch):
    """With cache_border_margin set, border crops are served from the
    cached bands without re-reading the file, and the cache never holds
    the full tile (reference tile dividers: dal.py:33-62)."""
    from feabas_tpu import common as fcommon
    from feabas_tpu.dal import StaticImageLoader
    from feabas_tpu.common import imwrite
    img = rng.integers(0, 255, (200, 300)).astype(np.uint8)
    imwrite(str(tmp_path / 'tile.png'), img)
    reads = {'n': 0}
    orig = fcommon.imread
    def counting_imread(path, **kw):
        reads['n'] += 1
        return orig(path, **kw)
    monkeypatch.setattr(fcommon, 'imread', counting_imread)
    ld = StaticImageLoader(['tile.png'], [(0, 0, 300, 200)],
                           root_dir=str(tmp_path), cache_size=32,
                           cache_border_margin=30)
    # first border crop: one file read, bands cached
    a = ld.crop((0, 0, 100, 20))
    n_after_first = reads['n']
    assert np.array_equal(a, img[0:20, 0:100])
    # second border crop (different band region): served from cache
    b = ld.crop((280, 50, 300, 150))
    assert reads['n'] == n_after_first
    assert np.array_equal(b, img[50:150, 280:300])
    # interior crop: must re-read (interior is not cached)
    c = ld.crop((100, 80, 200, 120))
    assert reads['n'] == n_after_first + 1
    assert np.array_equal(c, img[80:120, 100:200])
    # cache holds only the four bands, not the full image
    assert len(ld._cache) <= 4


def test_tf_lut_loader_and_montage(tmp_path, workdir, rng):
    """Intensity-transfer LUTs: per-image correction applied at load time
    and per-tile gain/offset hooked into MontageRenderer (reference:
    dal.py:492, stitcher.py:1376)."""
    import json
    from feabas_tpu.dal import StaticImageLoader
    img = np.full((50, 60), 100, np.uint8)
    from feabas_tpu.common import imwrite
    imwrite(str(tmp_path / 'a.png'), img)
    lut = {'__TYPE__': 'BRIGHTNESS_CONTRAST_ADJUST', 'a.png': [10.0, 1.5]}
    (tmp_path / 'lut.json').write_text(json.dumps(lut))
    ld = StaticImageLoader(['a.png'], [(0, 0, 60, 50)],
                           root_dir=str(tmp_path),
                           tf_lut=str(tmp_path / 'lut.json'))
    out = ld.crop((0, 0, 60, 50))
    assert (out == 160).all()  # 100 * 1.5 + 10
    # INTERP1D variant
    lut2 = {'__TYPE__': 'INTERP1D', 'a.png': [[0, 200], [0, 100]]}
    ld2 = StaticImageLoader(['a.png'], [(0, 0, 60, 50)],
                            root_dir=str(tmp_path), tf_lut=lut2)
    assert (ld2.crop((0, 0, 60, 50)) == 50).all()


def test_montage_add_transfer_functions(tmp_path, workdir, rng):
    import json
    from feabas_tpu.stitcher import Stitcher, MontageRenderer
    from feabas_tpu.common import imwrite
    base = (rng.random((100, 100)) * 100 + 50).astype(np.uint8)
    # tile B is tile A's right neighbor with brightness halved
    imwrite(str(tmp_path / 'a.png'), base)
    imwrite(str(tmp_path / 'b.png'), (base // 2).astype(np.uint8))
    st = Stitcher(['a.png', 'b.png'], [(0, 0, 100, 100), (100, 0, 200, 100)],
                  root_dir=str(tmp_path), name='s')
    st.initialize_meshes()
    mr = MontageRenderer.from_stitcher(
        st, loader_config={'apply_CLAHE': False, 'inverse': False})
    lut = {'__TYPE__': 'BRIGHTNESS_CONTRAST_ADJUST',
           'b.png': [0.0, 2.0]}   # gain 2 restores tile B
    mr.add_transfer_functions(lut)
    out = mr.crop((0, 0, 200, 100))
    # after the transfer, both halves match the source brightness
    assert abs(float(out[:, :100].mean()) - float(base.mean())) < 2.0
    assert abs(float(out[:, 100:].mean()) - float(base.mean())) < 3.0


def test_montage_maskout_distance_damping(tmp_path, workdir, rng):
    """A tile defect marked in a maskout fades out (weights damp with
    distance) and the overlapping neighbor fills it in."""
    from feabas_tpu.stitcher import Stitcher, MontageRenderer
    from feabas_tpu.common import imwrite
    base = (rng.random((100, 160)) * 100 + 50).astype(np.uint8)
    a = base[:, :100].copy()
    b = base[:, 60:].copy()
    # corrupt tile A inside the overlap (world x 70..90)
    a[40:60, 70:90] = 255
    imwrite(str(tmp_path / 'a.png'), a)
    imwrite(str(tmp_path / 'b.png'), b)
    st = Stitcher(['a.png', 'b.png'], [(0, 0, 100, 100), (60, 0, 160, 100)],
                  root_dir=str(tmp_path), name='s')
    st.initialize_meshes()
    lc = {'apply_CLAHE': False, 'inverse': False}
    mo = np.zeros((100, 100), bool)
    mo[40:60, 70:90] = True   # defect in tile A's pixel frame
    mr_plain = MontageRenderer.from_stitcher(st, loader_config=lc)
    mr_mask = MontageRenderer.from_stitcher(st, loader_config=lc,
                                            tile_maskouts={0: mo},
                                            maskout_margin=8.0)
    out_p = mr_plain.crop((0, 0, 160, 100)).astype(float)
    out_m = mr_mask.crop((0, 0, 160, 100)).astype(float)
    want = base.astype(float)
    err_p = np.abs(out_p[42:58, 72:88] - want[42:58, 72:88]).mean()
    err_m = np.abs(out_m[42:58, 72:88] - want[42:58, 72:88]).mean()
    assert err_m < 3.0, err_m            # neighbor fills the defect
    assert err_p > 10 * max(err_m, 0.1)  # without maskout the defect shows


def test_triangulate_geometry_per_material_density(workdir):
    """Materials with area_constraint < 1 are meshed denser."""
    from feabas_tpu.spatial import Geometry
    from feabas_tpu.triangulation import triangulate_geometry
    from feabas_tpu.material import Material, MaterialTable
    mt = MaterialTable()
    mt.add('soft_fine', Material(area_constraint=0.2, mask_label=7))
    label = np.full((120, 120), 1, np.uint8)
    label[:, 60:] = 7
    geom = Geometry(label, material_table=mt)
    verts, tris, uids = triangulate_geometry(geom, mesh_size=25)
    cent = verts[tris].mean(axis=1)
    import numpy as _np
    area = _np.abs(_np.cross(verts[tris[:, 1]] - verts[tris[:, 0]],
                             verts[tris[:, 2]] - verts[tris[:, 0]])) / 2
    left = cent[:, 0] < 55
    right = cent[:, 0] > 65
    assert left.sum() > 4 and right.sum() > 4
    # refined side triangles are substantially smaller on average
    assert area[right].mean() < 0.5 * area[left].mean(), \
        (area[right].mean(), area[left].mean())


def test_crop_multiple_stacked_fields(tile_set, workdir):
    """crop_multiple (one stacked IO pass) matches per-bbox crop()."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import StaticImageLoader
    from feabas_tpu.renderer import MeshRenderer
    world, paths, bboxes = tile_set
    loader = StaticImageLoader(paths, bboxes)
    m = Mesh.from_bbox((0, 0, 220, 220), cartesian=True, mesh_size=50)
    m.set_translation((5, -3))
    r = MeshRenderer.from_mesh(m, image_loader=loader)
    out_bboxes = [(10, 10, 110, 90), (100, 60, 220, 200), (-40, -40, 0, 0),
                  (150, 0, 200, 220)]
    singles = [r.crop(b, return_empty=True) for b in out_bboxes]
    multi = r.crop_multiple(out_bboxes, return_empty=True)
    assert len(multi) == len(singles)
    for s, g in zip(singles, multi):
        if s is None:
            assert g is None
        else:
            assert np.array_equal(s, g)


def test_render_whole_mesh_scale(tile_set, tmp_path, workdir):
    """scale=0.5 renders the same content at half output resolution."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import StaticImageLoader
    from feabas_tpu.renderer import render_whole_mesh
    from feabas_tpu.common import imread
    import cv2
    world, paths, bboxes = tile_set
    loader = StaticImageLoader(paths, bboxes)
    m = Mesh.from_bbox((0, 0, 220, 220), cartesian=True, mesh_size=50)
    out = render_whole_mesh(m, loader, str(tmp_path / 'half' / 's'),
                            tile_size=(128, 128), scale=0.5)
    assert len(out) == 1
    img = imread(list(out)[0])
    want = cv2.resize(world[:220, :220], (110, 110),
                      interpolation=cv2.INTER_AREA).astype(float)
    got = img[:110, :110].astype(float)
    cc = np.corrcoef(want[2:-2, 2:-2].ravel(), got[2:-2, 2:-2].ravel())[0, 1]
    assert cc > 0.95, cc


def test_numpy_rasterize_matches_native(rng):
    """The vectorized numpy fallback must agree with the native C++
    rasterizer (same weight-arbitration winners, same coverage)."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu import native
    from feabas_tpu.renderer import rasterize_mesh, _rasterize_tris_numpy
    if not native.available():
        pytest.skip('native lib absent; nothing to compare against')
    m = Mesh.from_bbox((0, 0, 90, 70), cartesian=True, mesh_size=18,
                       resolution=4)
    # deform so triangles move off the lattice (incl. a fold-ish squeeze)
    v = m.vertices(1)
    v = v + np.stack([4 * np.sin(v[:, 1] / 9.0), 3 * np.cos(v[:, 0] / 7.0)],
                     -1)
    m.set_vertices(v, 1, offset=m.offset(1))
    wts = rng.permutation(m.num_triangles).astype(np.float32) + 1
    bbox = (-5, -5, 95, 75)
    ref = rasterize_mesh(m, bbox, gear=1, tri_weights=wts)
    tid = np.full(ref.shape, -1, np.int32)
    x0, y0 = int(np.floor(bbox[0])), int(np.floor(bbox[1]))
    _rasterize_tris_numpy(m.vertices_w_offset(1), m.triangles,
                          np.arange(m.num_triangles), tid, x0, y0,
                          tri_weights=wts)
    # same coverage everywhere; same winner away from shared edges (the
    # native path and numpy path may pick either triangle exactly ON an
    # edge, where both barycentric tests pass within eps)
    assert np.array_equal(tid >= 0, ref >= 0)
    diff = (tid != ref) & (ref >= 0)
    assert diff.mean() < 0.02, diff.mean()
    # unweighted coverage agrees too
    ref_u = rasterize_mesh(m, bbox, gear=1)
    tid_u = np.full(ref.shape, -1, np.int32)
    _rasterize_tris_numpy(m.vertices_w_offset(1), m.triangles,
                          np.arange(m.num_triangles), tid_u, x0, y0)
    assert np.array_equal(tid_u >= 0, ref_u >= 0)


def test_render_whole_mesh_parallel_matches_serial(tile_set, tmp_path,
                                                   workdir):
    """Per-section tile fan-out (round-2 VERDICT missing #8): worker
    batches produce byte-identical tiles to the serial path."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import StaticImageLoader
    from feabas_tpu.renderer import render_whole_mesh
    from feabas_tpu.common import imread
    world, paths, bboxes = tile_set
    loader = StaticImageLoader(paths, bboxes)
    m = Mesh.from_bbox((0, 0, 220, 220), cartesian=True, mesh_size=50)
    out_s = render_whole_mesh(m, loader, str(tmp_path / 'ser' / 's'),
                              tile_size=(128, 128))
    m2 = Mesh.from_bbox((0, 0, 220, 220), cartesian=True, mesh_size=50)
    out_p = render_whole_mesh(m2, loader, str(tmp_path / 'par' / 's'),
                              tile_size=(128, 128), num_workers=2,
                              tiles_per_job=2)
    assert len(out_p) == len(out_s) == 4
    for (fs, bs), (fp, bp) in zip(sorted(out_s.items()),
                                  sorted(out_p.items())):
        assert bs == bp
        assert np.array_equal(imread(fs), imread(fp)), (fs, fp)


def test_parse_pattern_filename():
    from feabas_tpu.dal import parse_pattern_filename
    ts = (100, 150)
    assert parse_pattern_filename(
        's_tr2-tc3.png', r'_tr({ROW_IND}\d+)-tc({COL_IND}\d+)', ts) \
        == (450, 200, 600, 300)
    assert parse_pattern_filename(
        'x0000128_y0000256.png', r'x({X_MIN}\d+)_y({Y_MIN}\d+)', ts) \
        == (128, 256, 278, 356)
    assert parse_pattern_filename(
        'xmax300_ymax400.png', r'xmax({X_MAX}\d+)_ymax({Y_MAX}\d+)', ts) \
        == (150, 300, 300, 400)
    with pytest.raises(RuntimeError):
        parse_pattern_filename('nope.png',
                               r'_tr({ROW_IND}\d+)-tc({COL_IND}\d+)', ts)


def test_loader_from_filepath_bare_folder(tmp_path, workdir, rng):
    """Filename-pattern mosaic ingestion: a bare folder of *_tr{r}-tc{c}
    tiles loads without any coordinate file (reference
    MosaicLoader.from_filepath: dal.py:868-1006)."""
    from synthutil import texture
    from feabas_tpu.dal import StaticImageLoader
    from feabas_tpu.common import imwrite
    world = texture(rng, 200, 300)
    tdir = tmp_path / 'bare'
    for r in range(2):
        for c in range(3):
            imwrite(str(tdir / f'm_tr{r}-tc{c}.png'),
                    world[r * 100:(r + 1) * 100, c * 100:(c + 1) * 100])
    loader = StaticImageLoader.from_filepath(str(tdir))
    assert loader.bboxes.shape == (6, 4)
    got = loader.crop((50, 30, 250, 170))
    assert np.array_equal(got, world[30:170, 50:250])


def test_tile_folder_directive_stitches(tmp_path, workdir, rng):
    """Round-2 VERDICT #9 done-criterion: a bare tile folder stitches
    end-to-end (through the {TILE_FOLDER} coordinate directive)."""
    from synthutil import tile_grid
    from feabas_tpu.stitcher import Stitcher
    from feabas_tpu.common import imwrite
    world, tiles, true_bboxes, stage_bboxes = tile_grid(
        rng, rows=2, cols=2, tile_h=300, tile_w=300, overlap=80, jitter=0.0)
    tdir = tmp_path / 'tiles'
    for k, t in enumerate(tiles):
        r, c = divmod(k, 2)
        imwrite(str(tdir / f'sec_tr{r + 1}-tc{c + 1}.png'), t)
    coord = tmp_path / 'sec0.txt'
    # step = tile minus overlap; extent read from the images themselves
    coord.write_text('{TILE_FOLDER}\t' + str(tdir) + '\n'
                     '{TILE_SIZE}\t220\t220\n'
                     '{RESOLUTION}\t4\n')
    st = Stitcher.from_coordinate_file(str(coord))
    assert st.num_tiles == 4
    np.testing.assert_allclose(st.init_bboxes[:, 2] - st.init_bboxes[:, 0],
                               300)
    n = st.dispatch_matchers(matcher_config={'conf_thresh': 0.2})
    assert n >= 3
    st.initialize_meshes(mesh_sizes=[100])
    st.optimize_translation()
    st.optimize_elastic()
    # recovered layout matches the generator's true offsets
    offs = np.asarray([m.vertices_w_offset('MOVING').mean(0)
                       for m in st.meshes])
    offs -= offs[0]
    want = true_bboxes[:, :2] - true_bboxes[0, :2]
    err = offs - want
    err -= err.mean(0)
    assert np.abs(err).max() < 1.0, err


def test_mipmap_get_image_loader_bare(tmp_path, workdir, rng):
    from synthutil import texture
    from feabas_tpu.mipmap import get_image_loader
    from feabas_tpu.common import imwrite
    world = texture(rng, 128, 128)
    tdir = tmp_path / 'mos'
    imwrite(str(tdir / 's_tr1-tc1.png'), world[:64, :64])
    imwrite(str(tdir / 's_tr1-tc2.png'), world[:64, 64:])
    loader = get_image_loader(str(tdir))
    assert np.array_equal(loader.crop((0, 0, 128, 64)), world[:64])


def test_crop_log_sigma_filters_block(tile_set, workdir):
    """crop(log_sigma=s) returns the masked-DoG-filtered float block
    (reference: renderer.py:568-588); crop_multiple agrees per block."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import StaticImageLoader
    from feabas_tpu.renderer import MeshRenderer
    from feabas_tpu.common import masked_dog_filter
    world, paths, bboxes = tile_set
    loader = StaticImageLoader(paths, bboxes)
    m = Mesh.from_bbox((0, 0, 220, 220), cartesian=True, mesh_size=50)
    r = MeshRenderer.from_mesh(m, image_loader=loader)
    bbox = (20, 30, 120, 130)
    raw = r.crop(bbox)
    filt = r.crop(bbox, log_sigma=2.5)
    assert np.issubdtype(filt.dtype, np.floating)
    _, _, mask = r.crop_field(bbox)
    want = masked_dog_filter(raw, 2.5, mask=mask)
    assert np.allclose(filt, want)
    # bandpass actually engaged: mean removed, edges preserved
    assert abs(filt.mean()) < abs(raw.astype(np.float64).mean()) * 0.1
    multi = r.crop_multiple([bbox, (40, 40, 160, 160)], log_sigma=2.5)
    assert np.allclose(multi[0], filt)


def test_crop_log_sigma_multichannel_and_empty(tile_set, workdir, tmp_path,
                                               rng):
    """log_sigma crops filter (H,W,C) renders per channel, and blocks with
    no mesh coverage come back as float32 zeros (a filtered constant block)
    rather than raw uint8 fillval mixed into a zero-mean batch."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import StaticImageLoader
    from feabas_tpu.renderer import MeshRenderer
    from feabas_tpu.common import masked_dog_filter, imwrite
    # ---- multichannel: 1 RGB tile
    world = (rng.normal(0, 1, (120, 120, 3)) * 30 + 128).astype(np.uint8)
    p = str(tmp_path / 'rgb.png')
    imwrite(p, world)
    loader = StaticImageLoader([p], [(0, 0, 120, 120)],
                               number_of_channels=3)
    m = Mesh.from_bbox((0, 0, 120, 120), cartesian=True, mesh_size=40)
    r = MeshRenderer.from_mesh(m, image_loader=loader)
    bbox = (10, 10, 90, 90)
    raw = r.crop(bbox)
    assert raw.ndim == 3 and raw.shape[-1] == 3
    filt = r.crop(bbox, log_sigma=2.0)
    assert filt.shape == raw.shape
    _, _, mask = r.crop_field(bbox)
    want = np.moveaxis(masked_dog_filter(np.moveaxis(raw, -1, 0), 2.0,
                                         mask=mask), 0, -1)
    assert np.allclose(filt, want)
    # ---- empty coverage: filtered fill is float32 zeros, consistent
    # between crop() and crop_multiple()
    far = (500, 500, 560, 560)
    blk = r.crop(far, log_sigma=2.0, fillval=255)
    assert blk.dtype == np.float32 and not blk.any()
    multi = r.crop_multiple([far, bbox], log_sigma=2.0, fillval=255)
    assert multi[0].dtype == np.float32 and not multi[0].any()
    assert np.allclose(multi[1], want)
