"""TensorStoreWriter + VolumeRenderer + 3D downsampling."""

import numpy as np
import pytest

from synthutil import texture


def test_tensorstore_writer_roundtrip(tmp_path, workdir, rng):
    from feabas_tpu.dal import TensorStoreWriter
    w = TensorStoreWriter.create(str(tmp_path / 'vol'), (10, 20, 200, 180), 3,
                                 driver='zarr', chunk_shape=[64, 64, 1])
    img = rng.integers(0, 255, (80, 90)).astype(np.uint8)
    w.write_single_chunk((30, 40, 120, 120), 1, img)
    back = w.read_chunk((30, 40, 120, 120), 1)
    assert np.array_equal(back, img)
    # chunk planning covers the canvas in Morton order
    chunks = w.plan_chunks()
    assert len(chunks) == 3 * 3  # 190x160 canvas / 64 chunks
    assert all(c[2] <= 200 and c[3] <= 180 for c in chunks)
    # spec round-trip
    w2 = TensorStoreWriter.from_dict(w.to_dict())
    assert np.array_equal(w2.read_chunk((30, 40, 120, 120), 1), img)


def test_volume_render_and_downsample(tmp_path, workdir, rng):
    """Render 4 translated sections into a neuroglancer volume; verify
    alignment in-volume, then generate a mip."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import TensorStoreWriter, StreamLoader
    from feabas_tpu.renderer import VolumeRenderer
    from feabas_tpu.mipmap import mip_one_level_tensorstore_3d
    h = w = 160
    base = texture(rng, h + 40, w + 40)
    drift = np.array([[0, 0], [5, -3], [-2, 7], [4, 4]], float)
    tform_list = []
    loaders = {}
    for z in range(4):
        img = base[20 + int(drift[z][1]):20 + int(drift[z][1]) + h,
                   20 + int(drift[z][0]):20 + int(drift[z][0]) + w]
        name = f's{z}'
        loaders[name] = StreamLoader(img)
        mesh = Mesh.from_bbox((0, 0, w, h), cartesian=True, mesh_size=40,
                              name=name, uid=z)
        # aligned transform: shift content back by the known drift
        mesh.set_translation(drift[z])
        tform_list.append((z, name, mesh))
    out = str(tmp_path / 'ngvol')
    writer = TensorStoreWriter.create(out, (0, 0, w + 20, h + 20), 4,
                                      driver='neuroglancer_precomputed',
                                      chunk_shape=[64, 64, 2])
    vr = VolumeRenderer(tform_list, loaders, writer,
                        flag_dir=str(tmp_path / 'flags'))
    n = vr.render_volume()
    assert n > 0
    # all sections must align in the volume frame
    ref = writer.read_chunk((40, 40, 120, 120), 0).astype(float)
    for z in range(1, 4):
        blk = writer.read_chunk((40, 40, 120, 120), z).astype(float)
        cc = np.corrcoef(ref.ravel(), blk.ravel())[0, 1]
        assert cc > 0.98, (z, cc)
    # resume: rerun writes nothing new
    n2 = vr.render_volume()
    assert n2 == 0
    # 3D downsample to mip1
    out2 = str(tmp_path / 'ngvol_ds')
    k = mip_one_level_tensorstore_3d(out, out2, mip_levels=[1],
                                     downsample_z=1)
    assert k == 1
    import tensorstore as ts
    d = ts.open({'driver': 'neuroglancer_precomputed',
                 'kvstore': {'driver': 'file', 'path': out2}}).result()
    assert d.shape[0] == (w + 20) // 2


@pytest.fixture()
def tile_volume(tmp_path, workdir, rng):
    """4 sections on disk as tiled images + meshes, loadable by workers."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.common import imwrite
    h = w = 160
    base = texture(rng, h + 40, w + 40)
    drift = np.array([[0, 0], [5, -3], [-2, 7], [4, 4]], float)
    tform_list, loaders = [], {}
    for z in range(4):
        img = base[20 + int(drift[z][1]):20 + int(drift[z][1]) + h,
                   20 + int(drift[z][0]):20 + int(drift[z][0]) + w]
        name = f's{z}'
        sec_dir = tmp_path / name
        imwrite(str(sec_dir / 'tile.png'), img.astype(np.uint8))
        coord = sec_dir / 'metadata.txt'
        coord.write_text('{ROOT_DIR}\t' + str(sec_dir) + '\n'
                         + f'tile.png\t0\t0\t{w}\t{h}\n')
        loaders[name] = str(coord)
        mesh = Mesh.from_bbox((0, 0, w, h), cartesian=True, mesh_size=40,
                              name=name, uid=z)
        mesh.set_translation(drift[z])
        mesh_path = tmp_path / f'{name}_tform.h5'
        mesh.save_to_h5(str(mesh_path))
        tform_list.append((z, name, str(mesh_path)))
    return tform_list, loaders, (w, h), drift


def test_volume_render_parallel_workers_resume(tile_volume, tmp_path):
    """Multi-worker volume render: chunks fan out to process workers;
    pre-marked (finished) chunks are never rewritten on resume
    (VERDICT round-1 done-criterion for parallel rendering)."""
    import json
    from feabas_tpu.dal import TensorStoreWriter
    from feabas_tpu.renderer import VolumeRenderer
    from feabas_tpu import storage
    tform_list, loaders, (w, h), drift = tile_volume
    out = str(tmp_path / 'ngvol_par')
    writer = TensorStoreWriter.create(out, (0, 0, w + 20, h + 20), 4,
                                      driver='neuroglancer_precomputed',
                                      chunk_shape=[64, 64, 2])
    flag_dir = tmp_path / 'flags'
    flag_dir.mkdir()
    # simulate an interrupted run: mark slab z0=0 chunk (0, 0) as done
    # (slab mode: chunk depth 2 -> z 0..1 grouped, one flag file per slab)
    (flag_dir / 'slab00000_flags.json').write_text(
        json.dumps({'done': [[0, 0]]}))
    vr = VolumeRenderer(tform_list, loaders, writer, flag_dir=str(flag_dir))
    n = vr.render_volume(num_workers=2, chunks_per_job=2)
    assert n > 0
    # the pre-marked chunk was skipped: still all zeros
    blk = writer.read_chunk((0, 0, 64, 64), 0)
    assert (np.asarray(blk) == 0).all()
    # neighbors were rendered
    blk2 = writer.read_chunk((64, 0, 128, 64), 0)
    assert (np.asarray(blk2) > 0).any()
    # sections align in the volume frame (window away from the skipped
    # chunk AND inside every translated mesh's coverage)
    ref = writer.read_chunk((64, 64, 144, 144), 0).astype(float)
    for z in range(1, 4):
        b = writer.read_chunk((64, 64, 144, 144), z).astype(float)
        cc = np.corrcoef(ref.ravel(), b.ravel())[0, 1]
        assert cc > 0.98, (z, cc)
    # full resume: nothing left to write
    n2 = vr.render_volume(num_workers=2, chunks_per_job=2)
    assert n2 == 0


def test_montage_parallel_render_matches_serial(workdir, tmp_path, rng):
    """MontageRenderer worker fan-out produces the same tiles as serial."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tests'))
    from synthutil import tile_grid
    from feabas_tpu.stitcher import Stitcher, MontageRenderer
    from feabas_tpu import storage
    from feabas_tpu.common import imwrite
    world, tiles, true_bboxes, stage_bboxes = tile_grid(
        rng, rows=2, cols=2, tile_h=150, tile_w=180, overlap=40, jitter=0.0)
    tdir = tmp_path / 'tiles'
    coord_lines = ['{ROOT_DIR}\t' + str(tdir), '{RESOLUTION}\t4']
    for k, (tile, sb) in enumerate(zip(tiles, stage_bboxes)):
        fn = f'tile_{k:03d}.png'
        imwrite(str(tdir / fn), tile)
        coord_lines.append(f'{fn}\t{sb[0]:.0f}\t{sb[1]:.0f}\t{sb[2]:.0f}\t{sb[3]:.0f}')
    coord = tmp_path / 's.txt'
    coord.write_text('\n'.join(coord_lines) + '\n')
    st = Stitcher.from_coordinate_file(str(coord))
    st.initialize_meshes()
    h5 = tmp_path / 'tform.h5'
    st.save_to_h5(str(h5), save_matches=False, save_meshes=True)
    lc = {'apply_CLAHE': False, 'inverse': False}
    mr_s = MontageRenderer.from_h5(str(h5), loader_config=lc)
    mr_p = MontageRenderer.from_h5(str(h5), loader_config=lc)
    out_s = tmp_path / 'out_serial'
    out_p = tmp_path / 'out_par'
    r_s = mr_s.render_series_to_file(str(out_s), tile_size=(128, 128))
    r_p = mr_p.render_series_to_file(str(out_p), tile_size=(128, 128),
                                     num_workers=2)
    assert sorted(f for f, _ in r_s) == sorted(f for f, _ in r_p)
    import cv2
    for fname, _ in r_s:
        a = cv2.imread(str(out_s / fname), 0)
        b = cv2.imread(str(out_p / fname), 0)
        assert a is not None and b is not None and np.array_equal(a, b), fname


def test_volume_nearest_interp_preserves_labels(tmp_path, workdir):
    """remap_interp='NEAREST' must reach the resampler: rendering a label
    image through a sub-pixel shift yields only source label values (a
    bilinear path would blend new intermediate ids)."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import TensorStoreWriter, StreamLoader
    from feabas_tpu.renderer import VolumeRenderer
    h = w = 96
    labels = np.zeros((h, w), np.uint8)
    labels[:, w // 3:2 * w // 3] = 100
    labels[:, 2 * w // 3:] = 200
    mesh = Mesh.from_bbox((0, 0, w, h), cartesian=True, mesh_size=32,
                          name='lab', uid=0)
    mesh.set_translation((0.5, 0.5))  # forces fractional source coords
    out = str(tmp_path / 'labvol')
    writer = TensorStoreWriter.create(out, (0, 0, w, h), 1,
                                      driver='zarr', chunk_shape=[64, 64, 1])
    vr = VolumeRenderer([(0, 'lab', mesh)], {'lab': StreamLoader(labels)},
                        writer, remap_interp='NEAREST')
    assert vr.render_volume() > 0
    vals = np.unique(np.asarray(writer.read_chunk((0, 0, w, h), 0)))
    assert set(vals.tolist()) <= {0, 100, 200}, vals


def test_volume_slab_single_write_per_chunk(tile_volume, tmp_path,
                                            monkeypatch):
    """Done-criterion (round-2 VERDICT #7): on a chunk-depth-deep volume
    every storage chunk is written exactly once — not read-modify-written
    per section (reference plan_one_slab: renderer.py:1009-1103)."""
    from feabas_tpu.dal import TensorStoreWriter
    from feabas_tpu.renderer import VolumeRenderer
    tform_list, loaders, (w, h), drift = tile_volume
    out = str(tmp_path / 'ngvol_slab')
    writer = TensorStoreWriter.create(out, (0, 0, w + 20, h + 20), 4,
                                      driver='neuroglancer_precomputed',
                                      chunk_shape=[64, 64, 4])
    calls = {'slab': 0, 'single': 0}
    orig = TensorStoreWriter.write_slab
    monkeypatch.setattr(TensorStoreWriter, 'write_slab',
                        lambda self, *a, **k: (calls.__setitem__(
                            'slab', calls['slab'] + 1), orig(self, *a, **k))[1])
    monkeypatch.setattr(TensorStoreWriter, 'write_single_chunk',
                        lambda self, *a, **k: (_ for _ in ()).throw(
                            AssertionError('per-z write in slab mode')))
    vr = VolumeRenderer(tform_list, loaders, writer)
    n = vr.render_volume()
    n_chunks = len(writer.plan_chunks())
    # all 4 sections fall in one slab; every covered chunk written once
    assert calls['slab'] == n == n_chunks == 9
    # content is intact across the slab
    ref = writer.read_chunk((40, 40, 120, 120), 0).astype(float)
    for z in range(1, 4):
        blk = writer.read_chunk((40, 40, 120, 120), z).astype(float)
        cc = np.corrcoef(ref.ravel(), blk.ravel())[0, 1]
        assert cc > 0.98, (z, cc)


def test_create_thumbnail_tensorstore(tmp_path, workdir, rng):
    """Thumbnails straight from a tensorstore volume via stacked
    downsample drivers (reference create_thumbnail_tensorstore:
    mipmap.py:252): no mip tiles on disk; highpass output keeps texture
    contrast while canceling a large-scale shading gradient."""
    from synthutil import texture
    from feabas_tpu.dal import TensorStoreWriter
    from feabas_tpu.mipmap import (create_thumbnail_tensorstore,
                                   tensorstore_spec_for_dir)
    from feabas_tpu.common import imread
    h = w = 512
    img = texture(rng, h, w).astype(np.float32)
    # strong left-right shading gradient that highpass must suppress
    shade = np.linspace(0.2, 1.0, w)[None, :]
    img = np.clip(img * shade, 0, 255).astype(np.uint8)
    out = str(tmp_path / 'vol')
    wtr = TensorStoreWriter.create(out, (0, 0, w, h), 1, driver='zarr',
                                   chunk_shape=[128, 128, 1])
    wtr.write_single_chunk((0, 0, w, h), 0, img)
    spec = tensorstore_spec_for_dir(out)
    assert spec is not None and spec['driver'] == 'zarr'
    # plain (no-highpass) thumbnail at mip2: 4x downsampled
    p0 = str(tmp_path / 'plain.png')
    create_thumbnail_tensorstore(out, p0, thumbnail_mip=2, highpass=False)
    t0 = imread(p0)
    assert t0.shape == (h // 4, w // 4)
    # highpass thumbnail: shading gradient mostly removed -> left and
    # right halves have similar mean, unlike the plain thumbnail
    p1 = str(tmp_path / 'hp.png')
    create_thumbnail_tensorstore(out, p1, thumbnail_mip=2, highpass=True,
                                 highpass_inter_mip=0)
    t1 = imread(p1)
    assert t1.shape == (h // 4, w // 4)

    def lr_ratio(t):
        m = t.astype(float)
        L = m[:, : m.shape[1] // 2].mean()
        R = m[:, m.shape[1] // 2:].mean()
        return min(L, R) / max(L, R)

    assert lr_ratio(t1) > lr_ratio(t0) + 0.1, (lr_ratio(t0), lr_ratio(t1))


def test_volume_render_from_tensorstore_source(tmp_path, workdir, rng):
    """A tensorstore-rendered section can feed the next pipeline stage:
    string loaders that point at a TS volume dir resolve to a
    TensorStoreLoader in both serial and worker volume paths (reference
    loads TS specs in align rendering: align_main.py:102,477)."""
    from feabas_tpu.mesh import Mesh
    from feabas_tpu.dal import TensorStoreWriter
    from feabas_tpu.renderer import VolumeRenderer, resolve_section_source
    from feabas_tpu.dal import TensorStoreLoader
    h = w = 128
    img = texture(rng, h, w).astype(np.uint8)
    src_dir = str(tmp_path / 'src_vol')
    sw = TensorStoreWriter.create(src_dir, (0, 0, w, h), 1, driver='zarr',
                                  chunk_shape=[64, 64, 1])
    sw.write_single_chunk((0, 0, w, h), 0, img)
    assert isinstance(resolve_section_source(src_dir), TensorStoreLoader)
    mesh = Mesh.from_bbox((0, 0, w, h), cartesian=True, mesh_size=40,
                          name='sec', uid=0)
    mesh_path = str(tmp_path / 'sec.h5')
    mesh.save_to_h5(mesh_path)
    out = str(tmp_path / 'out_vol')
    writer = TensorStoreWriter.create(out, (0, 0, w, h), 1, driver='zarr',
                                      chunk_shape=[64, 64, 1])
    vr = VolumeRenderer([(0, 'sec', mesh_path)], {'sec': src_dir}, writer)
    n = vr.render_volume(num_workers=2, chunks_per_job=1)
    assert n > 0
    back = np.asarray(writer.read_chunk((0, 0, w, h), 0))
    assert np.array_equal(back, img)
