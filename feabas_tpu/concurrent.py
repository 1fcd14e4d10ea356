"""Host-side work distribution.

One entry point, :func:`submit_to_workers`, yields results as they complete
from interchangeable backends (reference: ``feabas/concurrent.py:30-182``):

- ``process``: spawned ``ProcessPoolExecutor`` (default; isolates native
  library state and keeps the TPU runtime out of workers),
- ``thread``: ``ThreadPoolExecutor`` (for IO-bound fan-out that must share
  the in-process JAX device),
- ``serial``: in-line execution (num_workers<=1, tests, nested pools).

Backends are swappable so every parallel path can also run serially —
this property is load-bearing for the test suite.
"""

import multiprocessing as mp
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor, as_completed

from feabas_tpu import config


def _in_daemon_process():
    return mp.current_process().daemon


def _normalize_jobs(args_list, kwargs_list):
    if args_list is None and kwargs_list is None:
        raise ValueError('at least one of args_list / kwargs_list required')
    if args_list is None:
        args_list = [()] * len(kwargs_list)
    if kwargs_list is None:
        kwargs_list = [{}] * len(args_list)
    if len(args_list) != len(kwargs_list):
        raise ValueError('args_list and kwargs_list length mismatch')
    return list(args_list), list(kwargs_list)


def submit_to_workers(func, args_list=None, kwargs_list=None, **settings):
    """Run ``func(*args, **kwargs)`` for each job; yield results as completed.

    Settings:
        num_workers: parallel width (<=1 → serial).
        parallel_framework: 'process' | 'thread' | 'serial'
            (default from general_configs.yaml).
        max_tasks_per_child: recycle worker processes after this many jobs.
    """
    args_list, kwargs_list = _normalize_jobs(args_list, kwargs_list)
    if not args_list:
        return
    num_workers = settings.get('num_workers', 1) or 1
    framework = settings.get('parallel_framework', None) or config.parallel_framework()
    max_tasks_per_child = settings.get('max_tasks_per_child', None)
    if (num_workers <= 1) or (len(args_list) <= 1) or _in_daemon_process():
        framework = 'serial'
    num_workers = min(num_workers, len(args_list))
    if framework == 'serial':
        for args, kwargs in zip(args_list, kwargs_list):
            yield func(*args, **kwargs)
    elif framework == 'thread':
        with ThreadPoolExecutor(max_workers=num_workers) as executor:
            futures = [executor.submit(func, *args, **kwargs)
                       for args, kwargs in zip(args_list, kwargs_list)]
            for fut in as_completed(futures):
                yield fut.result()
    elif framework == 'process':
        ctx = mp.get_context('spawn')
        pool_kwargs = {'max_workers': num_workers, 'mp_context': ctx}
        if max_tasks_per_child is not None:
            pool_kwargs['max_tasks_per_child'] = int(max_tasks_per_child)
        with ProcessPoolExecutor(**pool_kwargs) as executor:
            futures = [executor.submit(func, *args, **kwargs)
                       for args, kwargs in zip(args_list, kwargs_list)]
            for fut in as_completed(futures):
                yield fut.result()
    else:
        raise ValueError(f'unknown parallel framework: {framework}')
