"""Test fixtures. Tests run on CPU with 8 virtual devices so sharding logic
is exercised without TPU hardware; the bench runs on the real chip."""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
prev = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in prev:
    os.environ['XLA_FLAGS'] = (prev + ' --xla_force_host_platform_device_count=8').strip()

import numpy as np
import pytest


@pytest.fixture()
def workdir(tmp_path, monkeypatch):
    """Point the config system at an isolated working directory."""
    from feabas_tpu import config, storage
    cfg_dir = tmp_path / 'configs'
    cfg_dir.mkdir()
    import shutil
    repo_cfg = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'configs')
    for name in os.listdir(repo_cfg):
        shutil.copy(os.path.join(repo_cfg, name), cfg_dir / name)
    storage.save_yaml(str(cfg_dir / 'general_configs.yaml'), {
        'working_directory': str(tmp_path / 'work_dir'),
        'parallel_framework': 'serial',
        'full_resolution': 4,
        'section_thickness': 30,
        'logfile_level': 'NONE',
        'archive_level': 'NONE',
        'console_level': 'WARNING',
        'cpu_budget': 2,
    })
    monkeypatch.setenv('FEABAS_TPU_CONFIG_DIR', str(cfg_dir))
    config.clear_config_caches()
    yield tmp_path / 'work_dir'
    config.clear_config_caches()


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
