"""Test fixtures. Tests run on CPU with 8 virtual devices so sharding logic
is exercised without TPU hardware; the bench runs on the real chip."""

import os
import sys

# The machine's sitecustomize (PYTHONPATH=.../axon_site) pre-imports JAX with
# the axon TPU backend in every interpreter, so setting JAX_PLATFORMS at
# conftest time is too late. Re-exec pytest once with a clean CPU environment
# (8 virtual devices so sharding logic is exercised without TPU hardware).
# The re-exec lives in pytest_configure so global capture can be released
# first (otherwise the child writes into the dead capture file).


def pytest_configure(config):
    if os.environ.get('FEABAS_TPU_TEST_REEXEC') == '1':
        return
    env = dict(os.environ)
    env['FEABAS_TPU_TEST_REEXEC'] = '1'
    env['JAX_PLATFORMS'] = 'cpu'
    env['JAX_ENABLE_X64'] = 'True'  # validate solver math in f64 on CPU
    flags = env.get('XLA_FLAGS', '')
    if 'xla_force_host_platform_device_count' not in flags:
        env['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
    pyp = [p for p in env.get('PYTHONPATH', '').split(os.pathsep)
           if p and 'axon_site' not in p]
    if pyp:
        env['PYTHONPATH'] = os.pathsep.join(pyp)
    else:
        env.pop('PYTHONPATH', None)
    capman = config.pluginmanager.getplugin('capturemanager')
    if capman is not None:
        capman.stop_global_capturing()
    args = list(config.invocation_params.args)
    os.execve(sys.executable, [sys.executable, '-m', 'pytest'] + args, env)

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
