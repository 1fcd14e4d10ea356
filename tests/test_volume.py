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
