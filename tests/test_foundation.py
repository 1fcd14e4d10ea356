"""L0 foundation tests: config stack, storage, caching, concurrency, common."""

import numpy as np
import pytest


def test_config_merge():
    from feabas_tpu.config import merge_config
    base = {'a': 1, 'b': {'c': 2, 'd': 3}}
    merge_config(base, {'b': {'c': 9}, 'e': 5})
    assert base == {'a': 1, 'b': {'c': 9, 'd': 3}, 'e': 5}


def test_config_stack(workdir):
    from feabas_tpu import config, storage
    conf = config.stitch_configs()
    assert conf['matching']['num_workers'] == 15
    # work-dir override wins
    storage.save_yaml(storage.join_paths(str(workdir), 'configs', 'stitching_configs.yaml'),
                      {'matching': {'num_workers': 2}})
    config.clear_config_caches()
    conf = config.stitch_configs()
    assert conf['matching']['num_workers'] == 2
    assert conf['matching']['margin'] == 100  # default preserved
    assert config.section_thickness() == 30
    assert config.data_resolution() == 4


def test_storage_roundtrip(tmp_path):
    from feabas_tpu import storage
    p = str(tmp_path / 'sub' / 'x.txt')
    with storage.File(p, 'w') as f:
        f.write('hello')
    assert storage.file_exists(p)
    with storage.File(p, 'r') as f:
        assert f.read() == 'hello'
    assert storage.join_paths('gs://bucket/a', 'b', 'c') == 'gs://bucket/a/b/c'
    assert storage.list_folder_content(str(tmp_path / 'sub' / '*.txt')) == [p]


def test_h5file(tmp_path):
    from feabas_tpu.storage import H5File
    p = str(tmp_path / 'd' / 'test.h5')
    with H5File(p, 'w') as f:
        f.create_dataset('x', data=np.arange(5))
    with H5File(p, 'r') as f:
        assert np.array_equal(f['x'][()], np.arange(5))


@pytest.mark.parametrize('policy', ['fifo', 'lru', 'lfu', 'mfu'])
def test_caches_evict_by_len(policy):
    from feabas_tpu.caching import generate_cache
    c = generate_cache(policy, maxlen=3)
    for i in range(5):
        c[i] = np.zeros(4)
    assert len(c) == 3


def test_cache_lru_order():
    from feabas_tpu.caching import generate_cache
    c = generate_cache('lru', maxlen=2)
    c['a'] = 1
    c['b'] = 2
    _ = c['a']
    c['c'] = 3
    assert 'a' in c and 'c' in c and 'b' not in c


def test_cache_bytes_eviction():
    from feabas_tpu.caching import generate_cache
    c = generate_cache('fifo', maxbytes=1000)
    c['a'] = np.zeros(100, dtype=np.float64)  # 800 bytes
    c['b'] = np.zeros(100, dtype=np.float64)
    assert 'a' not in c and 'b' in c


def test_null_cache():
    from feabas_tpu.caching import generate_cache
    c = generate_cache('none')
    c['a'] = 1
    assert 'a' not in c and c.get('a', 7) == 7


def _sq(x):
    return x * x


@pytest.mark.parametrize('framework', ['serial', 'thread', 'process'])
def test_submit_to_workers(framework):
    from feabas_tpu.concurrent import submit_to_workers
    args = [(i,) for i in range(7)]
    out = sorted(submit_to_workers(_sq, args, num_workers=3, parallel_framework=framework))
    assert out == [i * i for i in range(7)]


def test_bbox_ops():
    from feabas_tpu import common
    b, valid = common.intersect_bbox((0, 0, 10, 10), (5, 5, 20, 20))
    assert valid and b == (5, 5, 10, 10)
    _, valid = common.intersect_bbox((0, 0, 1, 1), (5, 5, 6, 6))
    assert not valid
    u = common.bbox_union([(0, 0, 1, 1), (-2, 3, 5, 4)])
    assert np.array_equal(u, [-2, 0, 5, 4])
    x0, y0, x1, y1 = common.divide_bbox((0, 0, 100, 50), block_size=30)
    assert len(x0) == 4 * 2
    assert (x1 - x0 > 0).all() and x1.max() >= 100 and y1.max() >= 50


def test_z_order():
    from feabas_tpu.common import z_order
    ij = np.array([[0, 0], [1, 1], [0, 1], [1, 0], [2, 2]])
    order = z_order(ij)
    assert set(order.tolist()) == set(range(5))
    assert order[0] == 0  # origin first


def test_masked_dog_filter_no_bleed():
    from feabas_tpu.common import masked_dog_filter
    rng = np.random.default_rng(0)
    img = np.zeros((64, 64), dtype=np.float32)
    img[:, 32:] = 200.0 + rng.normal(0, 5, (64, 32))
    mask = np.zeros((64, 64), dtype=bool)
    mask[:, :32] = True  # only keep the flat (dark) half
    f = masked_dog_filter(img, 2.0, mask=mask)
    # response inside the masked (flat) region must not leak edge energy
    assert np.abs(f[:, :28]).max() < 1.0


def test_coordinate_file_roundtrip(tmp_path):
    from feabas_tpu.common import parse_coordinate_files
    p = tmp_path / 'coord.txt'
    p.write_text('{ROOT_DIR}\t/data/sec0\n{RESOLUTION}\t4\n'
                 'a.png\t0\t0\t100\t80\nb.png\t90\t0\t190\t80\n')
    paths, bboxes, root, res = parse_coordinate_files(str(p))
    assert paths == ['a.png', 'b.png']
    assert bboxes[1] == (90.0, 0.0, 190.0, 80.0)
    assert root == '/data/sec0' and res == 4


def test_func_str_roundtrip():
    from feabas_tpu.common import func_to_str, str_to_func
    s = func_to_str(np.linalg.norm)
    f = str_to_func(s)
    assert f([3, 4]) == 5.0
    g = str_to_func(func_to_str(lambda x: x + 1))
    assert g(2) == 3


def test_find_elements_in_array():
    from feabas_tpu.common import find_elements_in_array
    arr = np.array([5, 3, 9, 1])
    out = find_elements_in_array(arr, np.array([3, 9, 7]))
    assert out[0] == 1 and out[1] == 2 and out[2] == -1


def test_imread_imwrite(tmp_path):
    from feabas_tpu.common import imread, imwrite
    img = (np.arange(64 * 48, dtype=np.uint32).reshape(48, 64) % 255).astype(np.uint8)
    p = str(tmp_path / 'img' / 't.png')
    imwrite(p, img)
    back = imread(p)
    assert np.array_equal(img, back)


def test_chain_segment_rings():
    from feabas_tpu.common import chain_segment_rings
    # two separate loops: 0-1-2-3 and 10-11-12
    segs = np.array([[0, 1], [1, 2], [2, 3], [3, 0],
                     [11, 12], [10, 11], [12, 10]])
    rings = chain_segment_rings(segs)
    assert len(rings) == 2
    ring_sets = sorted(tuple(sorted(r)) for r in rings)
    assert ring_sets == [(0, 1, 2, 3), (10, 11, 12)]
    # traversal order is a valid cycle
    r = [list(x) for x in rings if len(x) == 4][0]
    edges = {tuple(sorted(e)) for e in segs[:4].tolist()}
    for a, b in zip(r, r[1:] + r[:1]):
        assert tuple(sorted((a, b))) in edges


def test_cache_thread_safety():
    """Caches are shared by threaded consumers (loader block caches under
    the threaded mip fan-out): concurrent get/set/evict must not corrupt
    the byte accounting or raise."""
    import threading
    import numpy as np
    from feabas_tpu.caching import generate_cache
    for policy in ('fifo', 'lru', 'lfu', 'mfu'):
        cache = generate_cache(policy, maxlen=16)
        errs = []

        def worker(seed):
            rng = np.random.default_rng(seed)
            try:
                for _ in range(300):
                    k = int(rng.integers(0, 40))
                    if rng.random() < 0.5:
                        cache[k] = np.zeros(int(rng.integers(1, 64)))
                    else:
                        cache.get(k)
                        cache.pop(k)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=worker, args=(s,))
                   for s in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs, (policy, errs)
        assert len(cache) <= 16
        assert cache._bytes >= 0


def test_reference_default_configs_drop_in(workdir):
    """The reference's OWN default YAMLs drop into a work dir as project
    overrides and every driver-facing key resolves with the expected
    type — config interchange, not just schema similarity."""
    import os
    import shutil
    import pytest
    ref = '/root/reference/configs'
    if not os.path.isdir(ref):
        pytest.skip('reference tree not available')
    from feabas_tpu import config, storage
    pairs = {'default_stitching_configs.yaml': 'stitching_configs.yaml',
             'default_alignment_configs.yaml': 'alignment_configs.yaml',
             'default_thumbnail_configs.yaml': 'thumbnail_configs.yaml'}
    os.makedirs(os.path.join(str(workdir), 'configs'), exist_ok=True)
    for src, dst in pairs.items():
        shutil.copy(os.path.join(ref, src),
                    os.path.join(str(workdir), 'configs', dst))
    config.clear_config_caches()
    s = config.stitch_configs()
    mc = s['matching']['matcher_config']
    assert mc['spacings'] is None or isinstance(mc['spacings'], list)
    assert mc['conf_thresh'] > 0
    r = s['rendering']
    assert isinstance(r['tile_size'], list) and isinstance(
        r['pad_to_tile_size'], bool)
    assert isinstance(r['loader_settings'], dict)
    a = config.align_configs()
    assert a['meshing']['mesh_size'] > 0
    assert isinstance(a['matching']['matcher_config']['spacings'], list)
    sw = a['optimization']['slide_window']
    assert sw['window_size'] > 0 and sw['buffer_size'] >= 0
    tsr = a['tensorstore_rendering']
    assert isinstance(tsr['chunk_shape'], list)
    assert isinstance(tsr['read_chunk_shape'], list)
    tsd = a['tensorstore_downsample']
    assert isinstance(tsd['mip_levels'], list)
    assert isinstance(tsd['keep_chunk_layout'], bool)
    t = config.thumbnail_configs()
    assert t['thumbnail_mip_level'] >= 0
    d = t['downsample']
    assert isinstance(d['parallel_within_section'], bool)
    al = t['alignment']
    assert isinstance(al['render']['bbox_offset'], list)
    assert 'rotation_angle' in al['render']
    config.clear_config_caches()


def test_get_canvas_bbox_mip_scaling(tmp_path):
    """{'mipN': bbox} canvas files rescale from the nearest stored mip
    (reference: common.py:799)."""
    import json
    from feabas_tpu.common import get_canvas_bbox
    p = str(tmp_path / 'canvas.json')
    with open(p, 'w') as f:
        json.dump({'mip2': [10, 20, 110, 220]}, f)
    assert get_canvas_bbox(p, target_mip=2) == [10, 20, 110, 220]
    assert get_canvas_bbox(p, target_mip=0) == [40, 80, 440, 880]
    assert get_canvas_bbox(p, target_mip=3) == [5, 10, 55, 110]
    assert get_canvas_bbox({'mip0': [0, 0, 100, 100]}, 1) == [0, 0, 50, 50]
    assert get_canvas_bbox({'notes': 1}) is None
