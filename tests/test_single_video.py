'''End-to-end single-video inference app test: train tiny cap+prop models,
then drive sample/single_video_prediction.py as a real subprocess CLI.'''
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.test_drivers import mini_data, _mini_cfg, D_VID, D_AUD  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_single_video_prediction_cli(mini_data, tmp_path):  # noqa: F811
    from bmt_tpu.train.cap_trainer import train_cap
    from bmt_tpu.train.prop_trainer import train_prop

    os.chdir(tmp_path)
    cap_cfg = _mini_cfg(mini_data, tmp_path, 'train_cap')
    train_cap(cap_cfg)
    prop_cfg = _mini_cfg(mini_data, tmp_path, 'train_prop')
    train_prop(prop_cfg)

    # one 'new video' with matching feature dims
    rng = np.random.default_rng(7)
    vdir = tmp_path / 'one_video'
    vdir.mkdir()
    np.save(vdir / 'vid_rgb.npy', rng.normal(size=(11, D_VID)).astype(np.float32))
    np.save(vdir / 'vid_flow.npy', rng.normal(size=(11, D_VID)).astype(np.float32))
    np.save(vdir / 'vid_vggish.npy', rng.normal(size=(13, D_AUD)).astype(np.float32))

    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PYTHONPATH'] = REPO
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'

    cmd = [
        sys.executable, os.path.join(REPO, 'sample',
                                     'single_video_prediction.py'),
        '--prop_generator_model_path', prop_cfg.log_path,
        '--pretrained_cap_model_path', cap_cfg.model_checkpoint_path,
        '--vggish_features_path', str(vdir / 'vid_vggish.npy'),
        '--rgb_features_path', str(vdir / 'vid_rgb.npy'),
        '--flow_features_path', str(vdir / 'vid_flow.npy'),
        '--duration_in_secs', '21.5',
        '--max_prop_per_vid', '3',
        '--train_meta_path', str(mini_data / 'train.csv'),
    ]
    result = subprocess.run(cmd, capture_output=True, text=True, env=env,
                            timeout=560)
    assert result.returncode == 0, result.stderr[-3000:]
    # output: a printed list of {start, end, sentence} dicts
    out = result.stdout.strip().splitlines()[-1]
    captions = eval(out)  # the app prints a python list (reference behavior)
    assert isinstance(captions, list) and len(captions) >= 1
    for c in captions:
        assert set(c) == {'start', 'end', 'sentence'}
        assert 0 <= c['start'] <= c['end'] <= 21.5 + 1e-6


@pytest.mark.slow
@pytest.mark.parametrize('ckpt_format', ['npz', 'orbax', 'orbax-async'])
def test_train_cap_resume(mini_data, tmp_path, ckpt_format):  # noqa: F811
    '''Interrupted training resumes from the rolling checkpoint
    ('orbax-async' = --ckpt_format orbax --async_ckpt, the AsyncOrbaxWriter
    path: the run must drain its background commits so the follow-up run
    sees a complete checkpoint).'''
    from bmt_tpu.train.cap_trainer import train_cap

    from bmt_tpu.train.checkpoint import read_checkpoint_meta
    fmt, use_async = (('orbax', True) if ckpt_format == 'orbax-async'
                      else (ckpt_format, False))
    cfg = _mini_cfg(mini_data, tmp_path, 'train_cap')
    cfg.ckpt_format = fmt
    cfg.async_ckpt = use_async
    train_cap(cfg)  # epoch 0 completes, last_cap_model written

    ckpt_dir = cfg.model_checkpoint_path
    assert read_checkpoint_meta(ckpt_dir, 'last_cap_model')['epoch'] == 0

    # second run with more epochs reuses the same log dir -> resumes at 1
    cfg2 = _mini_cfg(mini_data, tmp_path, 'train_cap')
    cfg2.ckpt_format = fmt
    cfg2.async_ckpt = use_async
    cfg2.log_path = cfg.log_path
    cfg2.model_checkpoint_path = cfg.model_checkpoint_path
    cfg2.epoch_num = 2
    train_cap(cfg2)
    assert read_checkpoint_meta(ckpt_dir, 'last_cap_model')['epoch'] == 1


@pytest.mark.slow
def test_train_cap_resume_before_1by1(mini_data, tmp_path):  # noqa: F811
    '''The rolling checkpoint is written every epoch even before the first
    1-by-1 validation, so a crash in the early epochs resumes cleanly.'''
    from bmt_tpu.train.cap_trainer import train_cap

    cfg = _mini_cfg(mini_data, tmp_path, 'train_cap')
    cfg.one_by_one_starts_at = 100   # 1by1 never runs in this test
    train_cap(cfg)

    meta_path = os.path.join(cfg.model_checkpoint_path,
                             'last_cap_model.meta.json')
    with open(meta_path) as f:
        meta = json.load(f)
    assert meta['epoch'] == 0
    assert meta['val_1_metrics'] is None   # saved without any 1by1 pass

    cfg2 = _mini_cfg(mini_data, tmp_path, 'train_cap')
    cfg2.log_path = cfg.log_path
    cfg2.model_checkpoint_path = cfg.model_checkpoint_path
    cfg2.one_by_one_starts_at = 100
    cfg2.epoch_num = 2
    train_cap(cfg2)
    with open(meta_path) as f:
        assert json.load(f)['epoch'] == 1
