'''Misc host utilities (reference: utilities/captioning_utils.py).'''
from __future__ import annotations

import hashlib
import json
import os
import re
import sys
from functools import partial
from time import localtime, mktime, strptime


def enable_compile_cache(cache_dir: str = None):
    '''Enable JAX's persistent compilation cache (compiles on this host's
    device tunnel are slow and occasionally flaky; cached executables make
    reruns resume instantly).'''
    import jax
    if cache_dir is None:
        # repo checkout: .jax_cache next to the package; pip-installed:
        # the package's parent (site-packages/..) is usually unwritable,
        # so fall back to the user cache dir rather than silently losing
        # the persistent cache
        repo_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))), '.jax_cache')
        try:
            os.makedirs(repo_dir, exist_ok=True)
            probe = os.path.join(repo_dir, '.writable')
            with open(probe, 'w'):
                pass
            os.remove(probe)
            cache_dir = repo_dir
        except OSError:
            cache_dir = os.path.join(
                os.path.expanduser('~'), '.cache', 'bmt_tpu', 'jax_cache')
            os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)


def average_metrics_in_two_dicts(val_1_metrics: dict, val_2_metrics: dict) -> dict:
    '''Average two metric dicts with the same nested keys
    (reference: captioning_utils.py:12-26).'''
    avg = {}
    for key in val_1_metrics:
        avg[key] = {}
        for name in val_1_metrics[key]:
            avg[key][name] = (val_1_metrics[key][name]
                              + val_2_metrics[key][name]) / 2
    return avg


def timer(timer_started_at: str) -> float:
    '''Hours elapsed since a %y%m%d%H%M%S timestamp
    (reference: captioning_utils.py:33-42).'''
    started = mktime(strptime(timer_started_at, '%y%m%d%H%M%S'))
    return round((mktime(localtime()) - started) / 3600, 2)


def md5sum(filename: str) -> str:
    with open(filename, 'rb') as f:
        d = hashlib.md5()
        for buf in iter(partial(f.read, 128), b''):
            d.update(buf)
    return d.hexdigest()


AVAILABLE_MP4_FILE_HASH = 'bd38fb7d72b5d3ebff7d201e2938616a'


def make_metafile(available_mp4s_path: str, json_path: str,
                  save_meta_path: str):
    '''ActivityNet JSON -> tab-separated meta with caption cleanup, filtered
    to available videos; gated on the md5 of available_mp4.txt
    (reference: captioning_utils.py:54-124).'''
    if md5sum(available_mp4s_path) != AVAILABLE_MP4_FILE_HASH:
        raise Exception('available_mp4.txt hash does not match the expected')
    with open(available_mp4s_path) as f:
        available = {line.strip() for line in f}

    with open(json_path) as f:
        data = json.load(f)

    replace_patterns = [
        ('’', "'"),
        (r'\.(?!\d)', ''),
        (r'\n', ' '),
        (r'\s{2,}', ' '),
    ]

    phase = os.path.split(json_path)[1].replace('.json', '')
    rows = []
    idx = 0
    for video_id, info in data.items():
        if video_id not in available:
            continue
        duration = info['duration']
        for caption, (start, end) in zip(info['sentences'],
                                         info['timestamps']):
            for pat, val in replace_patterns:
                caption = re.sub(pat, val, caption)
            caption = caption.strip()
            # floats formatted as pandas does (0 -> 0.0) for bit-identical
            # metafiles vs the reference's shipped CSVs
            rows.append((video_id, caption, float(start), float(end),
                         float(duration), phase, idx))
            idx += 1

    import csv
    with open(save_meta_path, 'w', newline='') as f:
        w = csv.writer(f, delimiter='\t', quoting=csv.QUOTE_MINIMAL,
                       quotechar='"', lineterminator='\n')
        w.writerow(['video_id', 'caption', 'start', 'end', 'duration',
                    'phase', 'idx'])
        w.writerows(rows)


class HiddenPrints:
    '''Suppress stdout inside a with-block
    (reference: captioning_utils.py:127-138).'''

    def __enter__(self):
        self._original_stdout = sys.stdout
        sys.stdout = open(os.devnull, 'w')

    def __exit__(self, exc_type, exc_val, exc_tb):
        sys.stdout.close()
        sys.stdout = self._original_stdout
