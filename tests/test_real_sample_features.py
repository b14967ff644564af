'''Tests on the REAL bundled sample-video features
(/root/reference/sample/women_long_jump_*.npy: (36,128) vggish,
(14,1024) rgb/flow from the true extraction pipeline) — the crop/stride
geometry, mask construction and the full CLI run are exercised on real
extraction shapes, de-risking the golden-caption acceptance
(reference: README.md:152-185) down to "drop in the checkpoints".'''
import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

SAMPLE = '/root/reference/sample'
DURATION = 35.155          # reference README.md:167
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.exists(f'{SAMPLE}/women_long_jump_rgb.npy'),
    reason='reference sample mount not available')


@pytest.fixture(scope='module')
def feats():
    return {k: np.load(f'{SAMPLE}/women_long_jump_{n}.npy')
            for k, n in (('audio', 'vggish'), ('rgb', 'rgb'),
                         ('flow', 'flow'))}


def test_real_extraction_geometry(feats):
    '''The true extraction shapes: 36 vggish frames (~0.96s hop) and 14
    I3D frames (64-frame stacks @ 25fps -> 2.56s stride) for a 35.155s
    video; rgb/flow ride in lockstep.'''
    assert feats['audio'].shape == (36, 128)
    assert feats['rgb'].shape == (14, 1024)
    assert feats['flow'].shape == (14, 1024)
    # I3D stride ~= duration / 14 = 2.51s; vggish hop ~= 0.98s — both
    # within 10% of their nominal extractor strides
    assert abs(DURATION / 14 - 2.56) < 0.26
    assert abs(DURATION / 36 - 0.96) < 0.10


def test_crop_geometry_on_real_features(feats):
    '''Proportional crop indices on the real frame counts, for the
    timestamps the reference README's expected output contains.'''
    from bmt_tpu.data.features import crop_a_segment

    # README proposal [19.6, 33.3]: video idx 7..13, audio idx 20..34
    v = crop_a_segment(feats['rgb'], 19.6, 33.3, DURATION)
    a = crop_a_segment(feats['audio'], 19.6, 33.3, DURATION)
    assert v.shape == (int(14 * 33.3 / DURATION) - int(14 * 19.6 / DURATION),
                       1024)
    assert a.shape == (int(36 * 33.3 / DURATION) - int(36 * 19.6 / DURATION),
                       128)
    np.testing.assert_array_equal(
        v, feats['rgb'][int(14 * 19.6 / DURATION):int(14 * 33.3 / DURATION)])

    # full-range crop returns every frame
    full = crop_a_segment(feats['rgb'], 0.0, DURATION, DURATION)
    np.testing.assert_array_equal(full, feats['rgb'])

    # a short segment [0.1, 2.0] maps to <1 I3D frame -> 1-frame fallback
    short = crop_a_segment(feats['rgb'], 0.1, 2.0, DURATION)
    assert short.shape[0] >= 1
    # degenerate start==end at the very end of the video
    tail = crop_a_segment(feats['audio'], DURATION, DURATION, DURATION)
    assert tail.shape == (1, 128)
    np.testing.assert_array_equal(tail[0], feats['audio'][-1])


def test_pad_and_masks_on_real_features(feats):
    '''Reference pad geometry (800 audio / 300 video rows) + the
    channel-0 pad-detection quirk on the true value distributions: no
    real frame in these files collides with pad_idx=1 on channel 0, so
    the masks keep exactly the real frames.'''
    from bmt_tpu.data.features import pad_segment
    from bmt_tpu.ops.masks import make_masks

    pad_idx = 1
    stacks = {
        'audio': jnp.asarray(pad_segment(feats['audio'], 800, pad_idx))[None],
        'rgb': jnp.asarray(pad_segment(feats['rgb'], 300, pad_idx))[None],
        'flow': jnp.asarray(pad_segment(feats['flow'], 300, 0.0))[None],
    }
    assert stacks['audio'].shape == (1, 800, 128)
    assert stacks['rgb'].shape == (1, 300, 1024)

    masks = make_masks(stacks, None, 'audio_video', pad_idx)
    a_mask = np.asarray(masks['A_mask'])[0, 0]      # (1,1,800) -> (800,)
    v_mask = np.asarray(masks['V_mask'])[0, 0]
    assert a_mask[:36].all() and not a_mask[36:].any()
    assert v_mask[:14].all() and not v_mask[14:].any()


def _tiny_real_dim_checkpoints(tmp_path):
    '''Small-width cap+prop checkpoints at the REAL feature dims
    (d_vid=1024, d_aud=128) so the app consumes the true arrays.'''
    from bmt_tpu.config import Config, build_parser
    from bmt_tpu.data.vocab import Vocab
    from bmt_tpu.models import (CapModelDims, PropModelDims,
                                init_bimodal_transformer,
                                init_multimodal_proposal_generator)
    from bmt_tpu.train.checkpoint import save_checkpoint

    itos = ['<unk>', '<blank>', '<s>', '</s>', 'woman', 'jumps', 'runs',
            'track', 'sand', 'a', 'the']
    vocab = Vocab(itos)

    cap_argv = ['--procedure', 'train_cap', '--d_vid', '1024',
                '--d_aud', '128', '--use_linear_embedder',
                '--d_model_video', '16', '--d_model_audio', '12',
                '--d_model', '24', '--d_model_caps', '10', '--H', '2',
                '--N', '1', '--max_len', '8', '--dont_log']
    cap_cfg = Config(build_parser().parse_args(cap_argv))
    cap_dims = CapModelDims.from_config(cap_cfg, len(vocab))
    cap_params = init_bimodal_transformer(jax.random.PRNGKey(0), cap_dims)
    cap_dir = tmp_path / 'cap'
    save_checkpoint(str(cap_dir), cap_params,
                    {'config': cap_cfg.to_dict(), 'epoch': 0,
                     'vocab_itos': vocab.itos})

    prop_argv = ['--procedure', 'train_prop', '--d_vid', '1024',
                 '--d_aud', '128', '--use_linear_embedder',
                 '--d_model_video', '16', '--d_model_audio', '12',
                 '--d_model', '24', '--H', '2', '--N', '1',
                 '--anchors_num_audio', '3', '--anchors_num_video', '3',
                 '--kernel_sizes_audio', '3', '5',
                 '--kernel_sizes_video', '3', '5',
                 '--conv_layers_audio', '16', '--conv_layers_video', '16',
                 # the REFERENCE pad geometry: full features pad to
                 # 800 audio / 300 video rows
                 '--pad_audio_feats_up_to', '800',
                 '--pad_video_feats_up_to', '300',
                 '--max_prop_per_vid', '4', '--dont_log']
    prop_cfg = Config(build_parser().parse_args(prop_argv))
    prop_dims = PropModelDims.from_config(prop_cfg)
    prop_params = init_multimodal_proposal_generator(jax.random.PRNGKey(1),
                                                     prop_dims)
    prop_params['anchors_A'] = jnp.asarray([2.0, 6.0, 12.0])
    prop_params['anchors_V'] = jnp.asarray([3.0, 9.0, 20.0])
    prop_dir = tmp_path / 'prop'
    save_checkpoint(str(prop_dir), prop_params,
                    {'config': prop_cfg.to_dict(), 'epoch': 0},
                    name='best_prop_model')
    return str(cap_dir), str(prop_dir)


@pytest.mark.slow
def test_single_video_cli_on_real_features(tmp_path):
    '''The full app subprocess on the true women_long_jump features and
    the real duration: proposal generation over (800,128)/(300,1024)
    padded stacks, crop geometry per proposal, batched decode — the
    exact pipeline of the reference acceptance run, minus the trained
    weights.'''
    cap_dir, prop_dir = _tiny_real_dim_checkpoints(tmp_path)

    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['PYTHONPATH'] = REPO

    cmd = [
        sys.executable,
        os.path.join(REPO, 'sample', 'single_video_prediction.py'),
        '--prop_generator_model_path', prop_dir,
        '--pretrained_cap_model_path', cap_dir,
        '--vggish_features_path', f'{SAMPLE}/women_long_jump_vggish.npy',
        '--rgb_features_path', f'{SAMPLE}/women_long_jump_rgb.npy',
        '--flow_features_path', f'{SAMPLE}/women_long_jump_flow.npy',
        '--duration_in_secs', str(DURATION),
        '--max_prop_per_vid', '4',
    ]
    result = subprocess.run(cmd, capture_output=True, text=True, env=env,
                            timeout=560)
    assert result.returncode == 0, result.stderr[-3000:]
    captions = eval(result.stdout.strip().splitlines()[-1])
    assert isinstance(captions, list) and 1 <= len(captions) <= 4
    for c in captions:
        assert set(c) == {'start', 'end', 'sentence'}
        # the app prints 1-decimal-rounded times (reference behavior),
        # so a proposal trimmed to 35.155 appears as 35.2
        assert 0 <= c['start'] <= c['end'] <= DURATION + 0.05
        assert isinstance(c['sentence'], str)


@pytest.mark.skipif(not shutil.which('ffprobe'),
                    reason='ffprobe not on PATH')
def test_ffprobe_duration_of_real_mp4():
    from sample.single_video_prediction import get_video_duration
    d = get_video_duration(f'{SAMPLE}/women_long_jump.mp4')
    assert abs(d - DURATION) < 0.2


def test_mvhd_duration_of_real_mp4():
    '''The pure-Python moov/mvhd parse recovers the real sample video's
    duration (README.md:167 cites ≈35.155 s) — the ffprobe-less fallback
    for /root/reference/sample/single_video_prediction.py:259-277.'''
    from sample.single_video_prediction import mp4_duration_mvhd
    d = mp4_duration_mvhd(f'{SAMPLE}/women_long_jump.mp4')
    assert abs(d - DURATION) < 0.2


def test_get_video_duration_falls_back_without_ffprobe(monkeypatch, capsys):
    '''get_video_duration uses the mvhd parse when ffprobe is absent, and
    exits with a helpful message when the file is not an mp4 either.'''
    import sample.single_video_prediction as svp
    monkeypatch.setattr(svp, 'which_ffprobe', lambda: '')
    d = svp.get_video_duration(f'{SAMPLE}/women_long_jump.mp4')
    assert abs(d - DURATION) < 0.2
    assert 'Video Duration:' in capsys.readouterr().out
    with pytest.raises(SystemExit, match='duration_in_secs'):
        svp.get_video_duration(f'{SAMPLE}/women_long_jump_rgb.npy')


def test_ffprobe_subprocess_path_with_scripted_fake(tmp_path, monkeypatch,
                                                    capsys):
    '''Drives the ffprobe subprocess branch of get_video_duration against
    a scripted stand-in (same technique as the fake-java METEOR jar
    protocol test): command construction, stdout float parse, and the
    failure branch all execute even on ffprobe-less hosts.'''
    import sample.single_video_prediction as svp
    fake = tmp_path / 'ffprobe'
    fake.write_text('#!/bin/sh\n'
                    'case "$*" in *missing.mp4*)'
                    ' echo "missing.mp4: No such file" >&2; exit 1;;'
                    ' *) echo 35.155000;; esac\n')
    fake.chmod(0o755)
    monkeypatch.setattr(svp, 'which_ffprobe', lambda: str(fake))
    d = svp.get_video_duration(f'{SAMPLE}/women_long_jump.mp4')
    assert abs(d - DURATION) < 0.2
    assert 'Video Duration:' in capsys.readouterr().out
    with pytest.raises(SystemExit, match='No such file'):
        svp.get_video_duration('missing.mp4')


def test_mvhd_parser_synthetic_v1_and_errors(tmp_path):
    '''Version-1 mvhd (64-bit times) parses; a moov without mvhd raises.'''
    import struct
    from sample.single_video_prediction import mp4_duration_mvhd

    def box(typ, payload):
        return struct.pack('>I4s', 8 + len(payload), typ) + payload

    # v1: version/flags, creation(8), modification(8), timescale, duration(8)
    mvhd_v1 = (b'\x01\x00\x00\x00' + b'\x00' * 16 +
               struct.pack('>IQ', 1000, 35155))
    p = tmp_path / 'v1.mp4'
    p.write_bytes(box(b'ftyp', b'isom' * 2) + box(b'moov', box(b'mvhd', mvhd_v1)))
    assert abs(mp4_duration_mvhd(p) - 35.155) < 1e-9

    q = tmp_path / 'nomvhd.mp4'
    q.write_bytes(box(b'moov', box(b'trak', b'')))
    with pytest.raises(ValueError, match='mvhd'):
        mp4_duration_mvhd(q)
