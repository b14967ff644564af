'''End-to-end driver integration tests on a tiny synthetic dataset:
train_cap -> checkpoint; train_prop -> proposal json + checkpoint;
eval_on_learned_props on the produced proposals.'''
import json
import os

import numpy as np
import pytest

from bmt_tpu.config import Config, build_parser

# >= train_batch_size (B=4 x dp_devices=2): the proposal loader drops the
# last partial batch like the reference, so fewer videos than one batch
# would silently train the prop model for ZERO steps
N_VIDEOS = 8
D_VID, D_AUD = 12, 8


@pytest.fixture(scope='module')
def mini_data(tmp_path_factory):
    '''Synthetic ActivityNet-like data tree.'''
    root = tmp_path_factory.mktemp('mini_data')
    vid_dir = root / 'video_npy'
    aud_dir = root / 'audio_npy'
    vid_dir.mkdir()
    aud_dir.mkdir()

    rng = np.random.default_rng(0)
    words = ['man', 'woman', 'dog', 'runs', 'jumps', 'plays', 'guitar',
             'beach', 'park', 'fast']
    meta_rows = {'train': [], 'val_1': [], 'val_2': []}
    json_data = {'train': {}, 'val_1': {}, 'val_2': {}}

    idx = {p: 0 for p in meta_rows}
    for v in range(N_VIDEOS):
        vid = f'v_test{v:04d}'
        Sv, Sa = 10 + v, 12 + v
        np.save(vid_dir / f'{vid}_rgb.npy',
                rng.normal(size=(Sv, D_VID)).astype(np.float32))
        np.save(vid_dir / f'{vid}_flow.npy',
                rng.normal(size=(Sv, D_VID)).astype(np.float32))
        np.save(aud_dir / f'{vid}.npy',
                rng.normal(size=(Sa, D_AUD)).astype(np.float32))

        duration = 20.0 + v
        for phase in meta_rows:
            sentences, timestamps = [], []
            for e in range(2):
                start = 1.0 + 7 * e
                end = start + 5.0 + e
                cap = ' '.join(rng.choice(words, size=5))
                meta_rows[phase].append(
                    (vid, cap, start, end, duration, phase, idx[phase]))
                idx[phase] += 1
                sentences.append(cap)
                timestamps.append([start, end])
            json_data[phase][vid] = {'duration': duration,
                                     'sentences': sentences,
                                     'timestamps': timestamps}

    for phase, rows in meta_rows.items():
        with open(root / f'{phase}.csv', 'w') as f:
            f.write('video_id\tcaption\tstart\tend\tduration\tphase\tidx\n')
            for r in rows:
                f.write('\t'.join(str(x) for x in r) + '\n')
    for phase, d in json_data.items():
        with open(root / f'{phase}.json', 'w') as f:
            json.dump(d, f)
        with open(root / f'{phase}_no_missings.json', 'w') as f:
            json.dump(d, f)
    with open(root / 'available_mp4.txt', 'w') as f:
        for v in range(N_VIDEOS):
            f.write(f'v_test{v:04d}.mp4\n')
    return root


def _mini_cfg(mini_data, tmp_path, procedure, **overrides):
    argv = [
        '--procedure', procedure,
        '--train_meta_path', str(mini_data / 'train.csv'),
        '--val_1_meta_path', str(mini_data / 'val_1.csv'),
        '--val_2_meta_path', str(mini_data / 'val_2.csv'),
        '--video_features_path', str(mini_data / 'video_npy'),
        '--audio_features_path', str(mini_data / 'audio_npy'),
        '--train_json_path', str(mini_data / 'train.json'),
        '--reference_paths', str(mini_data / 'val_1_no_missings.json'),
        str(mini_data / 'val_2_no_missings.json'),
        '--avail_mp4_path', str(mini_data / 'available_mp4.txt'),
        '--d_vid', str(D_VID), '--d_aud', str(D_AUD),
        '--d_model', '16', '--d_model_caps', '10', '--H', '2', '--N', '1',
        '--B', '4', '--epoch_num', '1', '--one_by_one_starts_at', '0',
        '--anchors_num_audio', '3', '--anchors_num_video', '4',
        '--kernel_sizes_audio', '3', '5', '--kernel_sizes_video', '1', '3',
        '--conv_layers_audio', '8', '--conv_layers_video', '8',
        '--pad_audio_feats_up_to', '24', '--pad_video_feats_up_to', '24',
        '--compute_dtype', 'float32',
        '--log_dir', str(tmp_path / 'log'),
        '--max_prop_per_vid', '10',
        '--dp_devices', '2',
    ]
    for k, v in overrides.items():
        argv += [f'--{k}'] + ([str(v)] if v is not None else [])
    args = build_parser().parse_args(argv)
    return Config(args)


@pytest.mark.slow
def test_train_cap_end_to_end(mini_data, tmp_path):
    from bmt_tpu.train.cap_trainer import train_cap
    # kv_cache_int8 exercises the quantized-KV plumbing through the full
    # driver (validation 1-by-1 decode path)
    cfg = _mini_cfg(mini_data, tmp_path, 'train_cap', kv_cache_int8=None)
    best = train_cap(cfg)
    # a full epoch ran: metrics computed and checkpoints written
    assert best >= 0
    files = os.listdir(cfg.model_checkpoint_path)
    assert 'last_cap_model.params.npz' in files
    assert 'best_cap_model.params.npz' in files
    assert any(f.startswith('captioning_results_val_1') for f in files)


@pytest.mark.slow
def test_train_prop_with_pretrained_frozen_cap_encoder(mini_data, tmp_path):
    '''Stage-2 transfer: proposal generator seeded from a (reference-format
    .pt) captioning checkpoint, encoder frozen during training
    (reference: proposal_generator.py:234-249).'''
    import jax
    import numpy as np
    from bmt_tpu.models import CapModelDims, init_bimodal_transformer
    from bmt_tpu.train.checkpoint import (load_pytree_npz,
                                          save_torch_checkpoint)
    from bmt_tpu.train.prop_trainer import train_prop

    os.chdir(tmp_path)
    dims = CapModelDims(voc_size=23, d_model_A=8, d_model_V=12,
                        d_model_C=10, d_model=16, H=2, N=1, d_ff_A=32,
                        d_ff_V=48, d_ff_C=40)
    cap_params = init_bimodal_transformer(jax.random.PRNGKey(5), dims)
    pt_path = os.path.join(tmp_path, 'best_cap_model.pt')
    save_torch_checkpoint(pt_path, cap_params, {'config': {}, 'epoch': 1})

    cfg = _mini_cfg(mini_data, tmp_path, 'train_prop',
                    pretrained_cap_model_path=pt_path)
    train_prop(cfg)

    # reload the trained prop model; its encoder must equal the cap
    # checkpoint's encoder exactly (frozen)
    from bmt_tpu.models import PropModelDims, init_multimodal_proposal_generator
    import jax.numpy as jnp
    pdims = PropModelDims.from_config(cfg)
    template = init_multimodal_proposal_generator(jax.random.PRNGKey(0), pdims)
    template['anchors_A'] = jnp.zeros((3,), jnp.float32)
    template['anchors_V'] = jnp.zeros((4,), jnp.float32)
    trained = load_pytree_npz(
        os.path.join(cfg.log_path, 'best_prop_model.params.npz'), template)
    for a, b in zip(jax.tree.leaves(cap_params['encoder']),
                    jax.tree.leaves(trained['encoder'])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=0)


@pytest.mark.slow
def test_native_two_stage_cap_to_prop(mini_data, tmp_path):
    '''The reference's headline recipe with ZERO torch involvement:
    train_cap writes a native npz checkpoint, train_prop seeds its encoder
    from it (frozen), and the trained prop model's encoder is bit-equal to
    the cap checkpoint's (reference: scripts/train_proposal_generator.py:15,
    model/proposal_generator.py:235-249).'''
    import jax
    from bmt_tpu.train.cap_trainer import train_cap
    from bmt_tpu.train.prop_trainer import train_prop
    from bmt_tpu.train.checkpoint import load_subtree_npz

    os.chdir(tmp_path)
    cap_cfg = _mini_cfg(mini_data, tmp_path, 'train_cap')
    train_cap(cap_cfg)
    cap_npz = os.path.join(cap_cfg.model_checkpoint_path,
                           'best_cap_model.params.npz')
    assert os.path.exists(cap_npz)

    # directory form of --pretrained_cap_model_path
    prop_cfg = _mini_cfg(
        mini_data, tmp_path, 'train_prop',
        pretrained_cap_model_path=cap_cfg.model_checkpoint_path)
    train_prop(prop_cfg)

    from bmt_tpu.models import (PropModelDims,
                                init_multimodal_proposal_generator)
    import jax.numpy as jnp
    pdims = PropModelDims.from_config(prop_cfg)
    enc_tpl = init_multimodal_proposal_generator(
        jax.random.PRNGKey(0), pdims)['encoder']
    cap_enc = load_subtree_npz(cap_npz, enc_tpl)
    trained_enc = load_subtree_npz(
        os.path.join(prop_cfg.log_path, 'best_prop_model.params.npz'),
        enc_tpl)
    for a, b in zip(jax.tree.leaves(cap_enc), jax.tree.leaves(trained_enc)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))

    # bare-file form resolves identically
    prop_cfg2 = _mini_cfg(mini_data, tmp_path, 'train_prop',
                          pretrained_cap_model_path=cap_npz, epoch_num=0)
    train_prop(prop_cfg2)


@pytest.mark.slow
def test_native_two_stage_prop_to_cap(mini_data, tmp_path):
    '''Reverse (ablation) direction: train_cap seeded from a native
    proposal checkpoint's encoder, frozen during training (reference:
    model/captioning_module.py:147-162).'''
    import jax
    from bmt_tpu.train.cap_trainer import train_cap
    from bmt_tpu.train.prop_trainer import train_prop
    from bmt_tpu.train.checkpoint import load_subtree_npz

    os.chdir(tmp_path)
    prop_cfg = _mini_cfg(mini_data, tmp_path, 'train_prop')
    train_prop(prop_cfg)
    prop_npz = os.path.join(prop_cfg.log_path, 'best_prop_model.params.npz')
    assert os.path.exists(prop_npz)

    cap_cfg = _mini_cfg(mini_data, tmp_path, 'train_cap',
                        pretrained_prop_model_path=prop_cfg.log_path)
    train_cap(cap_cfg)

    from bmt_tpu.models import CapModelDims, init_bimodal_transformer
    cdims = CapModelDims.from_config(cap_cfg, 23)
    enc_tpl = init_bimodal_transformer(jax.random.PRNGKey(0),
                                       cdims)['encoder']
    prop_enc = load_subtree_npz(prop_npz, enc_tpl)
    trained_enc = load_subtree_npz(
        os.path.join(cap_cfg.model_checkpoint_path,
                     'best_cap_model.params.npz'), enc_tpl)
    for a, b in zip(jax.tree.leaves(prop_enc),
                    jax.tree.leaves(trained_enc)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))


@pytest.mark.slow
def test_train_prop_unimodal_video(mini_data, tmp_path):
    '''Uni-modal (video-only) proposal generator: train_loop variant +
    ProposalGenerator equivalent (reference: proposal_generator.py:50-212).'''
    from bmt_tpu.train.prop_trainer import train_prop
    os.chdir(tmp_path)
    cfg = _mini_cfg(mini_data, tmp_path, 'train_prop', modality='video')
    best_f1 = train_prop(cfg)
    assert np.isfinite(best_f1)
    assert 'best_prop_model.params.npz' in os.listdir(cfg.log_path)


@pytest.mark.slow
def test_train_prop_and_eval_end_to_end(mini_data, tmp_path):
    from bmt_tpu.train.prop_trainer import train_prop
    from bmt_tpu.scripts.eval_on_learned_props import eval_on_learned_props

    os.chdir(tmp_path)  # ./tmp caches land here
    cfg = _mini_cfg(mini_data, tmp_path, 'train_prop')
    best_f1 = train_prop(cfg)
    assert np.isfinite(best_f1)

    files = os.listdir(cfg.log_path)
    assert 'best_prop_model.params.npz' in files
    subs = os.listdir(os.path.join(cfg.log_path, 'submissions'))
    assert any(f.startswith('prop_results_val_1') for f in subs)

    # now train a captioner and evaluate it on the learned proposals
    cap_cfg = _mini_cfg(mini_data, tmp_path, 'train_cap')
    from bmt_tpu.train.cap_trainer import train_cap
    train_cap(cap_cfg)

    eval_cfg = _mini_cfg(
        mini_data, tmp_path, 'evaluate',
        pretrained_cap_model_path=cap_cfg.model_checkpoint_path,
        prop_pred_path=os.path.join(cfg.log_path, 'submissions', subs[0]))
    metrics = eval_on_learned_props(eval_cfg)
    assert metrics is not None
    assert 'Average across tIoUs' in metrics


@pytest.mark.slow
def test_train_prop_resume(mini_data, tmp_path):
    '''Interrupted proposal training resumes from the rolling checkpoint
    (symmetric with train_cap: epoch counter, best metric, optimizer state
    and RNG step all restored).'''
    import json as _json
    from bmt_tpu.train.prop_trainer import train_prop

    os.chdir(tmp_path)
    cfg = _mini_cfg(mini_data, tmp_path, 'train_prop')
    train_prop(cfg)      # epoch 0 completes, last_prop_model written

    meta_path = os.path.join(cfg.log_path, 'last_prop_model.meta.json')
    with open(meta_path) as f:
        assert _json.load(f)['epoch'] == 0

    cfg2 = _mini_cfg(mini_data, tmp_path, 'train_prop')
    cfg2.log_path = cfg.log_path
    cfg2.epoch_num = 2
    train_prop(cfg2)
    with open(meta_path) as f:
        meta = _json.load(f)
    assert meta['epoch'] == 1
    assert meta['step'] > 0


@pytest.mark.slow
def test_eval_on_learned_props_unimodal(mini_data, tmp_path):
    '''The headline eval accepts uni-modal ablation checkpoints: greedy
    decode dispatches to the uni-modal loop and the npz restore template
    matches the checkpoint layout.'''
    from bmt_tpu.train.cap_trainer import train_cap
    from bmt_tpu.train.prop_trainer import train_prop
    from bmt_tpu.scripts.eval_on_learned_props import eval_on_learned_props

    os.chdir(tmp_path)
    prop_cfg = _mini_cfg(mini_data, tmp_path, 'train_prop',
                         modality='video')
    train_prop(prop_cfg)
    subs = os.listdir(os.path.join(prop_cfg.log_path, 'submissions'))

    cap_cfg = _mini_cfg(mini_data, tmp_path, 'train_cap', modality='video')
    train_cap(cap_cfg)

    eval_cfg = _mini_cfg(
        mini_data, tmp_path, 'evaluate',
        pretrained_cap_model_path=cap_cfg.model_checkpoint_path,
        prop_pred_path=os.path.join(prop_cfg.log_path, 'submissions',
                                    subs[0]))
    metrics = eval_on_learned_props(eval_cfg)
    assert metrics is not None and 'Average across tIoUs' in metrics


@pytest.mark.slow
def test_train_cap_fsdp_end_to_end(mini_data, tmp_path):
    '''--fsdp through the full captioning driver: params + Adam moments
    dp-sharded (fsdp_min_elems=0 so the tiny test model really shards),
    one epoch trains, checkpoints write (save gathers the global arrays),
    and a resume re-places the loaded host arrays onto the fsdp shardings
    (parallel/mesh.py:place_like) instead of silently replicating.'''
    import json as _json
    from bmt_tpu.train.cap_trainer import train_cap

    os.chdir(tmp_path)
    cfg = _mini_cfg(mini_data, tmp_path, 'train_cap', fsdp=None,
                    fsdp_min_elems=0)
    best = train_cap(cfg)
    assert best >= 0
    files = os.listdir(cfg.model_checkpoint_path)
    assert 'last_cap_model.params.npz' in files

    meta_path = os.path.join(cfg.model_checkpoint_path,
                             'last_cap_model.meta.json')
    with open(meta_path) as f:
        assert _json.load(f)['epoch'] == 0

    # resume for a second epoch under fsdp
    cfg2 = _mini_cfg(mini_data, tmp_path, 'train_cap', fsdp=None,
                     fsdp_min_elems=0)
    cfg2.log_path = cfg.log_path
    cfg2.model_checkpoint_path = cfg.model_checkpoint_path
    cfg2.epoch_num = 2
    train_cap(cfg2)
    with open(meta_path) as f:
        meta = _json.load(f)
    assert meta['epoch'] == 1
    assert meta['step'] > 0


@pytest.mark.slow
def test_train_prop_fsdp(mini_data, tmp_path):
    '''--fsdp through the proposal driver: conv-head weights dp-sharded,
    one epoch trains and the rolling checkpoint writes.'''
    from bmt_tpu.train.prop_trainer import train_prop

    os.chdir(tmp_path)
    cfg = _mini_cfg(mini_data, tmp_path, 'train_prop', fsdp=None,
                    fsdp_min_elems=0)
    train_prop(cfg)
    files = os.listdir(cfg.log_path)
    assert 'last_prop_model.params.npz' in files


@pytest.mark.slow
def test_train_cap_async_ckpt(mini_data, tmp_path):
    '''--async_ckpt through the captioning driver: the rolling + best
    checkpoints are durably on disk when train_cap returns (the trainer
    drains the background writer before exiting), and a resume from the
    async-written checkpoint works.'''
    import json as _json
    from bmt_tpu.train.cap_trainer import train_cap

    os.chdir(tmp_path)
    cfg = _mini_cfg(mini_data, tmp_path, 'train_cap', async_ckpt=None)
    train_cap(cfg)
    files = os.listdir(cfg.model_checkpoint_path)
    assert 'last_cap_model.params.npz' in files
    assert 'best_cap_model.params.npz' in files

    cfg2 = _mini_cfg(mini_data, tmp_path, 'train_cap', async_ckpt=None)
    cfg2.log_path = cfg.log_path
    cfg2.model_checkpoint_path = cfg.model_checkpoint_path
    cfg2.epoch_num = 2
    train_cap(cfg2)
    meta_path = os.path.join(cfg.model_checkpoint_path,
                             'last_cap_model.meta.json')
    with open(meta_path) as f:
        assert _json.load(f)['epoch'] == 1


@pytest.mark.slow
def test_train_cap_ema(mini_data, tmp_path):
    '''--ema_decay through the captioning driver: the rolling last_*
    keeps raw weights + an .ema sidecar, best_* holds the EMA weights
    that actually scored, and a resume restores the sidecar.'''
    import numpy as _np
    from bmt_tpu.train.cap_trainer import train_cap

    os.chdir(tmp_path)
    cfg = _mini_cfg(mini_data, tmp_path, 'train_cap', ema_decay=0.9)
    train_cap(cfg)
    d = cfg.model_checkpoint_path
    files = os.listdir(d)
    assert 'last_cap_model.ema.params.npz' in files
    assert 'best_cap_model.params.npz' in files

    raw = dict(_np.load(os.path.join(d, 'last_cap_model.params.npz')))
    ema = dict(_np.load(os.path.join(d, 'last_cap_model.ema.params.npz')))
    best = dict(_np.load(os.path.join(d, 'best_cap_model.params.npz')))
    assert set(raw) == set(ema) == set(best)
    # best == ema (the weights that scored), and ema != raw after training
    some_diff = False
    for k in raw:
        _np.testing.assert_array_equal(best[k], ema[k])
        if not _np.array_equal(ema[k], raw[k]):
            some_diff = True
    assert some_diff

    # resume: the sidecar is restored (second epoch trains on)
    cfg2 = _mini_cfg(mini_data, tmp_path, 'train_cap', ema_decay=0.9)
    cfg2.log_path = cfg.log_path
    cfg2.model_checkpoint_path = cfg.model_checkpoint_path
    cfg2.epoch_num = 2
    train_cap(cfg2)


@pytest.mark.slow
def test_train_cap_feature_matrix_combined(mini_data, tmp_path):
    '''Interaction smoke: fsdp + EMA + grad accumulation + warmup_cosine +
    nonfinite guard + async checkpointing in ONE captioning run, then a
    resume. Each feature is pinned individually elsewhere; this guards the
    cross-feature seams (donation aliasing, sharding inheritance through
    the EMA tree, schedule count through the async-written checkpoint).'''
    import json as _json
    from bmt_tpu.train.cap_trainer import train_cap

    os.chdir(tmp_path)
    kw = dict(fsdp=None, fsdp_min_elems=0, ema_decay=0.9,
              grad_accum_steps=2, scheduler='warmup_cosine',
              warmup_steps=2, skip_nonfinite_grads=2, async_ckpt=None)
    cfg = _mini_cfg(mini_data, tmp_path, 'train_cap', **kw)
    best = train_cap(cfg)
    assert best >= 0
    d = cfg.model_checkpoint_path
    files = os.listdir(d)
    assert 'last_cap_model.params.npz' in files
    assert 'last_cap_model.ema.params.npz' in files

    cfg2 = _mini_cfg(mini_data, tmp_path, 'train_cap', **kw)
    cfg2.log_path = cfg.log_path
    cfg2.model_checkpoint_path = cfg.model_checkpoint_path
    cfg2.epoch_num = 2
    train_cap(cfg2)
    with open(os.path.join(d, 'last_cap_model.meta.json')) as f:
        meta = _json.load(f)
    assert meta['epoch'] == 1 and meta['step'] > 0
