"""gs:// code paths exercised end to end against the fake-GCS shim
(FEABAS_TPU_FAKE_GCS_ROOT): File round trips, exists caching, globbing,
H5 cloud staging, yaml IO — the storage surface BASELINE config 5's
cloud-backed working directory rides on."""

import os

import numpy as np
import pytest


@pytest.fixture
def gcs(tmp_path, monkeypatch):
    from feabas_tpu import storage
    monkeypatch.setenv('FEABAS_TPU_FAKE_GCS_ROOT', str(tmp_path))
    storage._gcs_client.cache_clear()
    storage.clear_exists_cache()
    yield 'gs://bench-bucket/work'
    storage._gcs_client.cache_clear()
    storage.clear_exists_cache()


def test_file_roundtrip_text_and_binary(gcs, workdir):
    from feabas_tpu import storage
    p = storage.join_paths(gcs, 'a/b.txt')
    with storage.File(p, 'w') as f:
        f.write('hello\tworld\n')
    assert storage.file_exists(p)
    with storage.File(p, 'r') as f:
        assert f.read() == 'hello\tworld\n'
    pb = storage.join_paths(gcs, 'blob.bin')
    with storage.File(pb, 'wb') as f:
        f.write(b'\x00\x01\x02')
    with storage.File(pb, 'rb') as f:
        assert f.read() == b'\x00\x01\x02'


def test_exists_cache_and_remove(gcs, workdir):
    from feabas_tpu import storage
    p = storage.join_paths(gcs, 'flags/done.json')
    assert not storage.file_exists(p, use_cache=True)
    with storage.File(p, 'w') as f:
        f.write('{}')
    assert storage.file_exists(p, use_cache=True)
    storage.remove_file(p)
    assert not storage.file_exists(p)
    # removing a missing blob is a no-op, matching the local ENOENT
    # tolerance (stitch_main clears .h5_err unconditionally)
    storage.remove_file(p)


def test_glob_listing(gcs, workdir):
    from feabas_tpu import storage
    for i in range(3):
        with storage.File(storage.join_paths(gcs, f'm/s{i}.h5'), 'w') as f:
            f.write('x')
    with storage.File(storage.join_paths(gcs, 'm/other.txt'), 'w') as f:
        f.write('x')
    got = storage.list_folder_content(storage.join_paths(gcs, 'm/*.h5'))
    assert [storage.base_name(g) for g in got] == ['s0.h5', 's1.h5', 's2.h5']
    assert all(g.startswith('gs://') for g in got)


def test_h5_cloud_staging_roundtrip(gcs, workdir):
    """H5File stages cloud files through a local temp copy on both legs."""
    from feabas_tpu import storage
    p = storage.join_paths(gcs, 'tform/sec0.h5')
    arr = np.arange(12.0).reshape(3, 4)
    with storage.H5File(p, 'w') as f:
        f.create_dataset('d', data=arr)
    assert storage.file_exists(p)
    with storage.H5File(p, 'r') as f:
        np.testing.assert_array_equal(f['d'][...], arr)
    # append mode stages down, modifies, stages back up
    with storage.H5File(p, 'a') as f:
        f.create_dataset('e', data=[1, 2])
    with storage.H5File(p, 'r') as f:
        assert set(f.keys()) == {'d', 'e'}


def test_mesh_h5_on_gcs(gcs, workdir):
    """A real Mesh H5 round trip over the gs:// driver (the align/stitch
    tform persistence path)."""
    from feabas_tpu import storage
    from feabas_tpu.mesh import Mesh
    m = Mesh.from_bbox((0, 0, 200, 150), cartesian=True, mesh_size=50,
                       name='sec7', resolution=4)
    p = storage.join_paths(gcs, 'align/tform/sec7.h5')
    m.save_to_h5(p)
    m2 = Mesh.from_h5(p)
    np.testing.assert_allclose(m2.vertices_w_offset(0),
                               m.vertices_w_offset(0))


def test_yaml_and_rename(gcs, workdir):
    from feabas_tpu import storage
    p = storage.join_paths(gcs, 'configs/general_configs.yaml')
    storage.save_yaml(p, {'working_directory': gcs, 'k': 3})
    assert storage.load_yaml(p)['k'] == 3
    q = storage.join_paths(gcs, 'configs/renamed.yaml')
    storage.rename_file(p, q)
    assert storage.file_exists(q) and not storage.file_exists(p)
