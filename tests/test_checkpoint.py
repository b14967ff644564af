'''Checkpoint tests: native npz round-trip with resume, and reference-keyed
torch .pt import (round-trip through export_cap_state_dict + torch.save).'''
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from bmt_tpu.models import CapModelDims, init_bimodal_transformer
from bmt_tpu.train.checkpoint import (export_cap_state_dict, import_cap_model,
                                      load_checkpoint, load_torch_checkpoint,
                                      save_checkpoint, import_prop_model)

SMALL = CapModelDims(voc_size=23, d_model_A=8, d_model_V=12, d_model_C=10,
                     d_model=16, H=2, N=2, d_ff_A=16, d_ff_V=24, d_ff_C=20)


class FakeCfg:
    '''Pickle-able stand-in for the reference's Config object.'''
    pass


def _trees_equal(a, b):
    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=0)


def test_native_checkpoint_roundtrip(tmp_path):
    params = init_bimodal_transformer(jax.random.PRNGKey(0), SMALL)
    meta = {'epoch': 7, 'val_1_metrics': {'METEOR': 0.1},
            'config': {'d_model': 16}, 'trg_voc_size': 23}
    import optax
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    save_checkpoint(str(tmp_path), params, meta, opt_state)
    params2, meta2, opt2 = load_checkpoint(str(tmp_path), params, opt_state)
    _trees_equal(params, params2)
    _trees_equal(opt_state, opt2)
    assert meta2['epoch'] == 7


def test_orbax_checkpoint_roundtrip(tmp_path):
    '''The orbax backend (--ckpt_format orbax) restores params, optax
    NamedTuple opt_state, and the JSON meta identically to npz.'''
    from bmt_tpu.train.checkpoint import (checkpoint_exists,
                                          get_checkpoint_io)
    params = init_bimodal_transformer(jax.random.PRNGKey(0), SMALL)
    meta = {'epoch': 3, 'best_metric': 0.2, 'config': {'d_model': 16}}
    import optax
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    save_fn, load_fn = get_checkpoint_io('orbax')
    assert not checkpoint_exists(str(tmp_path), 'last_cap_model', 'orbax')
    save_fn(str(tmp_path), params, meta, opt_state, 'last_cap_model')
    assert checkpoint_exists(str(tmp_path), 'last_cap_model', 'orbax')
    # force=True: overwriting the rolling checkpoint must work
    save_fn(str(tmp_path), params, meta, opt_state, 'last_cap_model')

    params2, meta2, opt2 = load_fn(str(tmp_path), params, opt_state,
                                   'last_cap_model')
    _trees_equal(params, params2)
    _trees_equal(opt_state, opt2)
    assert meta2['epoch'] == 3

    # eval/serving consumers read either format through one entry point,
    # and a changed --ckpt_format still finds the on-disk checkpoint
    from bmt_tpu.train.checkpoint import (detect_checkpoint_format,
                                          load_model_params)
    _trees_equal(params, load_model_params(str(tmp_path), 'last_cap_model',
                                           params))
    assert detect_checkpoint_format(str(tmp_path), 'last_cap_model',
                                    preferred='npz') == 'orbax'
    assert detect_checkpoint_format(str(tmp_path), 'missing') is None


def test_torch_cap_checkpoint_import_roundtrip(tmp_path):
    '''params -> reference-keyed state_dict -> torch.save -> load -> import
    reproduces the original pytree, exercising the DataParallel 'module.'
    prefix strip and (out,in) -> (in,out) weight transposes.'''
    params = init_bimodal_transformer(jax.random.PRNGKey(1), SMALL)
    sd_np = export_cap_state_dict(params, data_parallel=True)
    sd_torch = {k: torch.from_numpy(np.asarray(v).copy())
                for k, v in sd_np.items()}

    # a pickled Config-like object, as the reference stores
    cfg = FakeCfg()
    cfg.d_model = 16
    cfg.modality = 'audio_video'

    path = os.path.join(tmp_path, 'best_cap_model.pt')
    torch.save({'config': cfg, 'epoch': 3, 'model_state_dict': sd_torch,
                'trg_voc_size': 23, 'val_1_metrics': {}}, path)

    cpt = load_torch_checkpoint(path)
    assert cpt['epoch'] == 3
    assert cpt['config']['d_model'] == 16
    imported, cfg_dict = import_cap_model(cpt)
    _trees_equal(params, imported)


def test_torch_prop_checkpoint_import(tmp_path):
    '''Synthetic reference-keyed proposal checkpoint: conv heads classified
    by tensor rank, anchors imported into params.'''
    sd = {}
    # one bimodal encoder layer, tiny dims
    rng = np.random.default_rng(0)

    def lin(base, din, dout):
        sd[f'{base}.weight'] = torch.from_numpy(
            rng.normal(size=(dout, din)).astype(np.float32))
        sd[f'{base}.bias'] = torch.from_numpy(
            rng.normal(size=(dout,)).astype(np.float32))

    def ln(base, d):
        sd[f'{base}.weight'] = torch.ones(d)
        sd[f'{base}.bias'] = torch.zeros(d)

    b = 'module.encoder.encoder_AV.layers.0'
    for att in ['self_att_M1', 'self_att_M2', 'bi_modal_att_M1',
                'bi_modal_att_M2']:
        din = 8 if 'M1' in att and 'bi' not in att else 8
        for name, (i, o) in {'linear_Q2d': (8, 16), 'linear_K2d': (8, 16),
                             'linear_V2d': (8, 16), 'linear_d2Q': (16, 8)}.items():
            lin(f'{b}.{att}.{name}', i, o)
    for ff in ['feed_forward_M1', 'feed_forward_M2']:
        lin(f'{b}.{ff}.fc1', 8, 32)
        lin(f'{b}.{ff}.fc2', 32, 8)
    for j in range(3):
        ln(f'{b}.res_layers_M1.{j}.norm', 8)
        ln(f'{b}.res_layers_M2.{j}.norm', 8)

    # detection heads: Sequential [Conv1d(k), Dropout, ReLU, Conv1d(1)]
    # -> indices 0 and 3
    for mod, A in (('A', 4), ('V', 6)):
        sd[f'module.detection_layers_{mod}.0.conv_layers.0.weight'] = \
            torch.from_numpy(rng.normal(size=(16, 8, 3)).astype(np.float32))
        sd[f'module.detection_layers_{mod}.0.conv_layers.0.bias'] = \
            torch.zeros(16)
        sd[f'module.detection_layers_{mod}.0.conv_layers.3.weight'] = \
            torch.from_numpy(
                rng.normal(size=(3 * A, 16, 1)).astype(np.float32))
        sd[f'module.detection_layers_{mod}.0.conv_layers.3.bias'] = \
            torch.zeros(3 * A)

    path = os.path.join(tmp_path, 'best_prop_model.pt')
    torch.save({'model_state_dict': sd,
                'anchors': {'audio': [1.0, 2.0, 4.0, 8.0],
                            'video': [1, 2, 3, 4, 5, 6]},
                'epoch': 17}, path)

    cpt = load_torch_checkpoint(path)
    params, _cfg = import_prop_model(cpt)
    assert len(params['encoder']['layers']) == 1
    assert len(params['heads_A']) == 1 and len(params['heads_V']) == 1
    assert params['heads_A'][0]['convs'][0]['w'].shape == (3, 8, 16)
    assert params['heads_A'][0]['convs'][1]['w'].shape == (1, 16, 12)
    np.testing.assert_allclose(params['anchors_A'], [1, 2, 4, 8])
    assert params['anchors_V'].shape == (6,)


def test_load_glove_multiword_tokens(tmp_path):
    '''glove.840B.300d.txt contains tokens with embedded spaces; the
    parser must split from the right and skip malformed lines.'''
    from bmt_tpu.data.vocab import Vocab, load_glove
    dim = 4
    glove = tmp_path / 'glove.6B.4d.txt'
    glove.write_text(
        'cat 1 2 3 4\n'
        '. . . 9 9 9 9\n'            # multi-word token '. . .'
        'at name@domain.com 5 6 7 8\n'
        'short 1 2\n'                # malformed: too few fields
        'dog 4 3 2 1\n')
    vocab = Vocab(['<unk>', '<blank>', '<s>', '</s>', 'cat', 'dog', '.'])
    mat = load_glove(str(glove), vocab, dim=dim)
    assert mat.shape == (7, dim)
    np.testing.assert_array_equal(mat[vocab['cat']], [1, 2, 3, 4])
    np.testing.assert_array_equal(mat[vocab['dog']], [4, 3, 2, 1])
    # '.' only appears inside the multi-word token '. . .' -> stays zero
    np.testing.assert_array_equal(mat[vocab['.']], [0, 0, 0, 0])


def test_load_cap_checkpoint_unimodal_native(tmp_path):
    '''The shared loader must dispatch on modality for native dirs
    (uni-modal trees have trg_emb, not emb_C).'''
    import json as _json
    from bmt_tpu.config import Config, build_parser
    from bmt_tpu.models import CapModelDims, init_unimodal_transformer
    from bmt_tpu.train.checkpoint import load_cap_checkpoint, save_checkpoint

    argv = ['--procedure', 'train_cap', '--modality', 'audio',
            '--d_model', '16', '--d_model_caps', '10', '--H', '2',
            '--N', '1', '--dont_log']
    cfg = Config(build_parser().parse_args(argv))
    itos = ['<unk>', '<blank>', '<s>', '</s>', 'w']
    dims = CapModelDims.from_config(cfg, len(itos))
    params = init_unimodal_transformer(jax.random.PRNGKey(0), dims)
    save_checkpoint(str(tmp_path), params,
                    {'config': cfg.to_dict(), 'epoch': 0,
                     'vocab_itos': itos})

    cfg2, dims2, params2, vocab2 = load_cap_checkpoint(str(tmp_path))
    assert cfg2.modality == 'audio'
    assert 'trg_emb' in params2 and 'emb_C' not in params2
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(params2)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_load_prop_checkpoint_unimodal_native(tmp_path):
    from bmt_tpu.config import Config, build_parser
    from bmt_tpu.models import (PropModelDims,
                                init_unimodal_proposal_generator)
    from bmt_tpu.train.checkpoint import (load_prop_checkpoint,
                                          save_checkpoint)
    import jax.numpy as jnp

    argv = ['--procedure', 'train_prop', '--modality', 'audio',
            '--d_model', '16', '--H', '2', '--N', '1',
            '--anchors_num_audio', '3', '--kernel_sizes_audio', '3',
            '--conv_layers_audio', '8', '--pad_audio_feats_up_to', '16',
            '--dont_log']
    cfg = Config(build_parser().parse_args(argv))
    dims = PropModelDims.from_config(cfg)
    params = init_unimodal_proposal_generator(jax.random.PRNGKey(0), dims)
    params['anchors'] = jnp.asarray([1.0, 3.0, 9.0])
    save_checkpoint(str(tmp_path), params,
                    {'config': cfg.to_dict(), 'epoch': 0},
                    name='best_prop_model')

    cfg2, dims2, params2 = load_prop_checkpoint(str(tmp_path))
    assert cfg2.modality == 'audio'
    np.testing.assert_array_equal(np.asarray(params2['anchors']),
                                  [1.0, 3.0, 9.0])


def test_meta_save_rejects_unserializable():
    '''Non-JSON meta values fail at SAVE time (default=str used to
    stringify them into unrecoverable reprs).'''
    import pytest
    from bmt_tpu.train.checkpoint import _json_meta_default
    import numpy as _np
    assert _json_meta_default(_np.arange(3)) == [0, 1, 2]
    assert _json_meta_default(_np.float32(1.5)) == 1.5
    with pytest.raises(TypeError):
        _json_meta_default(object())


def test_load_pytree_npz_rejects_leftover_keys(tmp_path):
    import pytest
    from bmt_tpu.train.checkpoint import load_pytree_npz, save_pytree_npz
    full = {'a': np.ones((2,)), 'b': {'c': np.zeros((3,))}}
    p = str(tmp_path / 't.npz')
    save_pytree_npz(p, full)
    with pytest.raises(KeyError):
        load_pytree_npz(p, {'a': np.zeros((2,))})   # template misses b/c


def test_load_cap_checkpoint_glove_adapter_roundtrip(tmp_path):
    '''A checkpoint trained with a GloVe adapter (vectors narrower than
    d_model_C) must restore the adapter through the shared loader.'''
    from bmt_tpu.config import Config, build_parser
    from bmt_tpu.models import CapModelDims, init_bimodal_transformer
    from bmt_tpu.train.checkpoint import load_cap_checkpoint, save_checkpoint

    argv = ['--procedure', 'train_cap', '--d_model', '16',
            '--d_model_caps', '10', '--H', '2', '--N', '1', '--dont_log']
    cfg = Config(build_parser().parse_args(argv))
    itos = ['<unk>', '<blank>', '<s>', '</s>', 'w']
    dims = CapModelDims.from_config(cfg, len(itos))
    glove = np.random.default_rng(0).normal(
        size=(len(itos), 6)).astype(np.float32)     # width 6 != 10
    params = init_bimodal_transformer(jax.random.PRNGKey(0), dims,
                                      glove=glove)
    assert 'adapter' in params['emb_C']
    save_checkpoint(str(tmp_path), params,
                    {'config': cfg.to_dict(), 'epoch': 0,
                     'vocab_itos': itos})

    _, _, params2, _ = load_cap_checkpoint(str(tmp_path))
    assert 'adapter' in params2['emb_C']
    np.testing.assert_array_equal(
        np.asarray(params2['emb_C']['adapter']['w']),
        np.asarray(params['emb_C']['adapter']['w']))


def test_load_subtree_npz_encoder_filter(tmp_path):
    '''Encoder-only restore from a FULL cap archive: keys outside the
    subtree are ignored (the reference's 'encoder' in k filter), template
    keys missing from the archive raise, shapes are validated.'''
    from bmt_tpu.train.checkpoint import load_subtree_npz, save_pytree_npz
    params = init_bimodal_transformer(jax.random.PRNGKey(3), SMALL)
    p = str(tmp_path / 'full.npz')
    save_pytree_npz(p, params)

    enc = load_subtree_npz(p, params['encoder'])
    _trees_equal(enc, params['encoder'])

    # a non-existent subtree names the actual top-level keys in the error
    with pytest.raises(KeyError, match='no arrays under'):
        load_subtree_npz(p, params['encoder'], subtree='nonexistent')

    # a template for a different architecture (wrong shape) fails loudly
    bad = jax.tree.map(lambda x: np.zeros((1, 1), np.float32),
                       params['encoder'])
    with pytest.raises(ValueError, match='different architecture'):
        load_subtree_npz(p, bad)


def test_load_pretrained_encoder_native_forms(tmp_path):
    '''The shared two-stage encoder loader accepts a bare params.npz and a
    native checkpoint directory, for both stages.'''
    from bmt_tpu.train.checkpoint import (load_pretrained_encoder_native,
                                          save_checkpoint)
    params = init_bimodal_transformer(jax.random.PRNGKey(7), SMALL)
    cap_dir = tmp_path / 'cap_ckpt'
    save_checkpoint(str(cap_dir), params, {'config': {}, 'epoch': 0})

    tpl = jax.tree.map(np.zeros_like, params['encoder'])
    # directory form
    enc = load_pretrained_encoder_native(str(cap_dir), tpl, 'cap')
    _trees_equal(enc, params['encoder'])
    # bare-file form
    enc2 = load_pretrained_encoder_native(
        str(cap_dir / 'best_cap_model.params.npz'), tpl, 'cap')
    _trees_equal(enc2, params['encoder'])
    # prop-stage naming
    save_checkpoint(str(cap_dir), params, {'config': {}, 'epoch': 0},
                    name='best_prop_model')
    enc3 = load_pretrained_encoder_native(str(cap_dir), tpl, 'prop')
    _trees_equal(enc3, params['encoder'])


def test_load_pytree_npz_shape_validation(tmp_path):
    '''A shape-drifted archive fails at load time with the leaf named,
    not later inside XLA.'''
    from bmt_tpu.train.checkpoint import load_pytree_npz, save_pytree_npz
    p = str(tmp_path / 's.npz')
    save_pytree_npz(p, {'w': np.ones((4, 3), np.float32)})
    with pytest.raises(ValueError, match="'w'"):
        load_pytree_npz(p, {'w': np.zeros((3, 4), np.float32)})


def test_load_cap_checkpoint_vocab_drift_fatal(tmp_path):
    '''A .pt checkpoint whose trg_voc_size disagrees with the vocabulary
    rebuilt from train_meta_path must RAISE (garbled decode otherwise);
    allow_vocab_drift downgrades it to a warning.'''
    from bmt_tpu.config import Config, build_parser
    from bmt_tpu.data.vocab import build_vocab_from_meta
    from bmt_tpu.train.checkpoint import (load_cap_checkpoint,
                                          save_torch_checkpoint)

    meta_path = str(tmp_path / 'train.csv')
    with open(meta_path, 'w') as f:
        f.write('video_id\tcaption\tstart\tend\tduration\tphase\tidx\n')
        f.write('v_x\tman runs fast\t0.0\t5.0\t10.0\ttrain\t0\n')

    argv = ['--procedure', 'train_cap', '--d_model', '16',
            '--d_model_caps', '10', '--H', '2', '--N', '1',
            '--min_freq_caps', '1', '--dont_log']
    cfg = Config(build_parser().parse_args(argv))
    vocab = build_vocab_from_meta(meta_path, cfg.start_token, cfg.end_token,
                                  cfg.pad_token, cfg.min_freq_caps)

    drifted = CapModelDims.from_config(cfg, len(vocab) + 3)
    params = init_bimodal_transformer(jax.random.PRNGKey(0), drifted)
    pt = str(tmp_path / 'best_cap_model.pt')
    save_torch_checkpoint(pt, params, {'config': cfg.to_dict(),
                                       'trg_voc_size': len(vocab) + 3})

    with pytest.raises(ValueError, match='allow_vocab_drift'):
        load_cap_checkpoint(pt, meta_path)
    # explicit override: loads, warns, keeps the checkpoint's table size
    _, dims, _, _ = load_cap_checkpoint(pt, meta_path,
                                        allow_vocab_drift=True)
    assert dims.voc_size == len(vocab) + 3

    # matching sizes load cleanly with no override
    ok = CapModelDims.from_config(cfg, len(vocab))
    params_ok = init_bimodal_transformer(jax.random.PRNGKey(0), ok)
    pt_ok = str(tmp_path / 'ok_cap_model.pt')
    save_torch_checkpoint(pt_ok, params_ok, {'config': cfg.to_dict(),
                                             'trg_voc_size': len(vocab)})
    _, dims2, _, _ = load_cap_checkpoint(pt_ok, meta_path)
    assert dims2.voc_size == len(vocab)


def test_orbax_glove_adapter_roundtrip(tmp_path):
    '''An orbax checkpoint whose embedder carries a GloVe adapter must be
    loadable by the shared eval/serving loader (the adapter probe reads
    the orbax structure metadata, since there is no npz to peek).'''
    from bmt_tpu.config import Config, build_parser
    from bmt_tpu.train.checkpoint import (load_cap_checkpoint,
                                          save_checkpoint_orbax)

    argv = ['--procedure', 'train_cap', '--d_model', '16',
            '--d_model_caps', '10', '--H', '2', '--N', '1', '--dont_log']
    cfg = Config(build_parser().parse_args(argv))
    cfg.ckpt_format = 'orbax'
    itos = ['<unk>', '<blank>', '<s>', '</s>', 'w']
    dims = CapModelDims.from_config(cfg, len(itos))
    glove = np.random.default_rng(0).normal(
        size=(len(itos), 6)).astype(np.float32)     # width 6 != 10
    params = init_bimodal_transformer(jax.random.PRNGKey(0), dims,
                                      glove=glove)
    assert 'adapter' in params['emb_C']
    save_checkpoint_orbax(str(tmp_path), params,
                          {'config': cfg.to_dict(), 'epoch': 0,
                           'vocab_itos': itos})

    _, _, params2, _ = load_cap_checkpoint(str(tmp_path))
    assert 'adapter' in params2['emb_C']
    np.testing.assert_array_equal(
        np.asarray(params2['emb_C']['adapter']['w']),
        np.asarray(params['emb_C']['adapter']['w']))


def test_orbax_meta_rejects_unserializable(tmp_path):
    '''The orbax meta sidecar uses the same strict serialization as the
    npz path: a non-JSON value fails AT SAVE TIME instead of being
    silently stringified.'''
    from bmt_tpu.train.checkpoint import save_checkpoint_orbax
    params = {'w': np.ones((2,), np.float32)}
    with pytest.raises(TypeError):
        save_checkpoint_orbax(str(tmp_path), params,
                              {'config': {}, 'bad': object()})


def test_bf16_leaf_npz_roundtrip_bit_exact(tmp_path):
    '''bf16 leaves (e.g. Adam mu under --optim_mu_dtype bfloat16) survive
    the npz round trip bit-exactly: np.savez cannot hold
    ml_dtypes.bfloat16, so _flatten upcasts to f32 (lossless) and
    _restore_into casts back to the template's bf16 (lossless).'''
    import jax.numpy as jnp
    from bmt_tpu.train.checkpoint import load_pytree_npz, save_pytree_npz
    rng = np.random.default_rng(7)
    mu = jnp.asarray(rng.normal(size=(16, 8)), jnp.bfloat16)
    tree = {'mu': mu, 'nu': np.abs(rng.normal(size=(16, 8))
                                   ).astype(np.float32)}
    p = str(tmp_path / 'opt.npz')
    save_pytree_npz(p, tree)
    got = load_pytree_npz(p, jax.tree.map(np.zeros_like, tree))
    assert got['mu'].dtype == jnp.bfloat16
    assert got['nu'].dtype == np.float32
    np.testing.assert_array_equal(
        np.asarray(got['mu']).view(np.uint16),
        np.asarray(mu).view(np.uint16))        # bit-exact
    np.testing.assert_array_equal(got['nu'], tree['nu'])


# ---------------------------------------------------------------------------
# async checkpoint writer (--async_ckpt)
# ---------------------------------------------------------------------------

def test_async_writer_matches_sync(tmp_path):
    '''The background writer produces byte-identical restore results to the
    synchronous save (the snapshot is taken at submit time, so mutating
    the live state afterwards must not leak into the file).'''
    from bmt_tpu.train.checkpoint import AsyncCheckpointWriter

    params = init_bimodal_transformer(jax.random.PRNGKey(0), SMALL)
    meta = {'epoch': 3, 'step': 77}

    save_checkpoint(str(tmp_path / 'sync'), params, meta,
                    name='last_cap_model')

    w = AsyncCheckpointWriter()
    w.save(str(tmp_path / 'async'), params, meta, name='last_cap_model')
    # mutate the live tree AFTER submit: the file must hold the snapshot
    params2 = jax.tree.map(lambda x: x * 0, params)
    del params2
    w.close()

    ps, ms, _ = load_checkpoint(str(tmp_path / 'sync'), params,
                                name='last_cap_model')
    pa, ma, _ = load_checkpoint(str(tmp_path / 'async'), params,
                                name='last_cap_model')
    _trees_equal(ps, pa)
    assert ms == ma == meta


def test_async_writer_orders_saves(tmp_path):
    '''Two queued saves of the same rolling name land in submit order —
    the newer one wins on disk (single worker thread).'''
    from bmt_tpu.train.checkpoint import AsyncCheckpointWriter

    w = AsyncCheckpointWriter()
    tree_a = {'w': jnp.ones((4, 4))}
    tree_b = {'w': jnp.full((4, 4), 2.0)}
    for i, tree in enumerate([tree_a, tree_b]):
        w.save(str(tmp_path), tree, {'epoch': i}, name='last_cap_model')
    w.close()
    p, m, _ = load_checkpoint(str(tmp_path), tree_a, name='last_cap_model')
    np.testing.assert_array_equal(np.asarray(p['w']), np.asarray(tree_b['w']))
    assert m['epoch'] == 1


def test_async_writer_propagates_errors(tmp_path):
    '''A failing write surfaces on wait()/close() (and on later save()),
    not silently — a full disk must not discard epochs and exit 0.'''
    from bmt_tpu.train.checkpoint import AsyncCheckpointWriter

    def broken_save(*a, **k):
        raise OSError('disk full')

    w = AsyncCheckpointWriter(broken_save)
    w.save(str(tmp_path), {'w': jnp.ones(3)}, {}, name='x')
    with pytest.raises(OSError, match='disk full'):
        w.wait()


# ---------------------------------------------------------------------------
# async orbax writer (--async_ckpt --ckpt_format orbax)
# ---------------------------------------------------------------------------

def test_async_orbax_matches_sync(tmp_path):
    '''AsyncOrbaxWriter restores byte-identically to the synchronous orbax
    save, including the opt_state directory and the meta sidecar.'''
    from bmt_tpu.train.checkpoint import (AsyncOrbaxWriter,
                                          load_checkpoint_orbax,
                                          save_checkpoint_orbax)

    params = init_bimodal_transformer(jax.random.PRNGKey(0), SMALL)
    opt = {'mu': jax.tree.map(jnp.zeros_like, params)}
    meta = {'epoch': 3, 'step': 77}

    save_checkpoint_orbax(str(tmp_path / 'sync'), params, meta, opt,
                          name='last_cap_model')
    w = AsyncOrbaxWriter()
    w.save(str(tmp_path / 'async'), params, meta, opt,
           name='last_cap_model')
    w.close()

    ps, ms, os_ = load_checkpoint_orbax(str(tmp_path / 'sync'), params,
                                        opt, name='last_cap_model')
    pa, ma, oa = load_checkpoint_orbax(str(tmp_path / 'async'), params,
                                       opt, name='last_cap_model')
    _trees_equal(ps, pa)
    _trees_equal(os_, oa)
    assert ms == ma == meta


def test_async_orbax_rolling_saves_ordered_and_clean(tmp_path):
    '''Re-saves of the rolling name land in order (newest arrays + meta
    win), and the side/.stale swap machinery leaves no residue.'''
    from bmt_tpu.train.checkpoint import (AsyncOrbaxWriter,
                                          load_checkpoint_orbax)

    w = AsyncOrbaxWriter()
    tree_a = {'w': jnp.ones((4, 4))}
    tree_b = {'w': jnp.full((4, 4), 2.0)}
    w.save(str(tmp_path), tree_a, {'epoch': 0}, name='last_cap_model')
    w.save(str(tmp_path), tree_b, {'epoch': 1}, name='last_cap_model')
    w.close()

    p, m, _ = load_checkpoint_orbax(str(tmp_path), tree_a,
                                    name='last_cap_model')
    np.testing.assert_array_equal(np.asarray(p['w']),
                                  np.asarray(tree_b['w']))
    assert m['epoch'] == 1
    assert not (tmp_path / 'last_cap_model.orbax.new').exists()
    assert not (tmp_path / 'last_cap_model.orbax.stale').exists()


def test_orbax_stale_fallback_after_interrupted_swap(tmp_path):
    '''A crash exactly between the async writer's two swap renames leaves
    only ``{name}.orbax.stale`` — the loaders must fall back to it instead
    of restarting the run from scratch.'''
    from bmt_tpu.train.checkpoint import (checkpoint_exists,
                                          load_checkpoint_orbax,
                                          save_checkpoint_orbax)

    tree = {'w': jnp.full((3,), 7.0)}
    save_checkpoint_orbax(str(tmp_path), tree, {'epoch': 4},
                          name='last_cap_model')
    os.rename(tmp_path / 'last_cap_model.orbax',
              tmp_path / 'last_cap_model.orbax.stale')

    assert checkpoint_exists(str(tmp_path), 'last_cap_model', 'orbax')
    p, m, _ = load_checkpoint_orbax(str(tmp_path), tree,
                                    name='last_cap_model')
    np.testing.assert_array_equal(np.asarray(p['w']), np.asarray(tree['w']))
    assert m['epoch'] == 4


def test_async_orbax_propagates_errors(tmp_path):
    '''A failing orbax commit surfaces on wait()/close(), not silently.'''
    from bmt_tpu.train.checkpoint import AsyncOrbaxWriter

    blocker = tmp_path / 'ckpt'
    blocker.write_text('a file where the checkpoint dir must go')
    w = AsyncOrbaxWriter()
    with pytest.raises(Exception):
        # the path collision errors either at submit (directory creation
        # happens on the calling thread) or at the commit barrier — both
        # must surface
        w.save(str(blocker), {'w': jnp.ones(3)}, {}, name='x')
        w.close()


def test_fold_lora_flat_incomplete_triple_errors():
    '''An archive carrying a partial LoRA triple, or adapters over a
    quantized linear (w_q8/scale, no w), gets a descriptive ValueError
    naming the site and the missing companion — not a raw KeyError
    (ADVICE r3).'''
    from bmt_tpu.train.checkpoint import _fold_lora_flat
    a = np.zeros((4, 2), np.float32)
    b = np.zeros((2, 4), np.float32)
    s = np.float32(1.0)
    w = np.zeros((4, 4), np.float32)

    # missing lora_b companion
    with pytest.raises(ValueError, match=r'site/lora_b'):
        _fold_lora_flat({'site/lora_a': a, 'site/lora_s': s, 'site/w': w})
    # missing lora_s companion
    with pytest.raises(ValueError, match=r'site/lora_s'):
        _fold_lora_flat({'site/lora_a': a, 'site/lora_b': b, 'site/w': w})
    # quantized linear alongside adapters: no w to fold into
    with pytest.raises(ValueError, match='quantize'):
        _fold_lora_flat({'site/lora_a': a, 'site/lora_b': b,
                         'site/lora_s': s,
                         'site/w_q8': np.zeros((4, 4), np.int8),
                         'site/scale': np.ones((4,), np.float32)})
    # plain missing w, not quantized
    with pytest.raises(ValueError, match='no.*base weight'):
        _fold_lora_flat({'site/lora_a': a, 'site/lora_b': b,
                         'site/lora_s': s})
    # complete triple still folds and drops the adapter keys
    out = _fold_lora_flat({'site/lora_a': a, 'site/lora_b': b,
                           'site/lora_s': s, 'site/w': w})
    assert set(out) == {'site/w'}


def test_load_pretrained_encoder_native_orbax_extras_raise(tmp_path,
                                                           monkeypatch):
    '''The orbax branch rejects donor encoder leaves the destination
    template lacks — same strictness as the npz path (ADVICE r3). The
    stage loader is stubbed so the test pins exactly the new extras
    check, independent of orbax meta plumbing.'''
    import bmt_tpu.train.checkpoint as ck
    params = init_bimodal_transformer(jax.random.PRNGKey(9), SMALL)
    donor = {'encoder': dict(params['encoder'],
                             extra_leaf=np.zeros((2, 2), np.float32))}
    monkeypatch.setattr(
        ck, 'load_cap_checkpoint',
        lambda path: (None, None, donor, None))
    tpl = jax.tree.map(np.zeros_like, params['encoder'])
    with pytest.raises(KeyError, match='absent from the destination'):
        ck.load_pretrained_encoder_native(str(tmp_path), tpl, 'cap')
    # without the extra leaf the same donor loads fine
    monkeypatch.setattr(
        ck, 'load_cap_checkpoint',
        lambda path: (None, None, {'encoder': params['encoder']}, None))
    enc = ck.load_pretrained_encoder_native(str(tmp_path), tpl, 'cap')
    _trees_equal(enc, params['encoder'])


def test_orbax_swap_fault_injection_every_fs_op(tmp_path):
    '''Pin the async-orbax durability contract: crash the grouped swap
    transaction (_swap_pair_into_place) after EVERY individual fs op and
    assert each crash point resolves — through the loaders' .stale
    fallback — to a LOADABLE params/opt pair that is consistent (both old
    or both new), except the single documented rename gap between the two
    phase-2 renames, where params=new/opt=old is the accepted residual
    torn window (the same one the npz writer has between its params and
    opt file writes).'''
    import shutil

    from bmt_tpu.train.checkpoint import (AsyncOrbaxWriter,
                                          load_checkpoint_orbax,
                                          save_checkpoint_orbax)

    class Crash(Exception):
        pass

    p_old = {'w': jnp.full((3,), 1.0)}
    o_old = {'m': jnp.full((3,), 10.0)}
    p_new = {'w': jnp.full((3,), 2.0)}
    o_new = {'m': jnp.full((3,), 20.0)}

    def setup(root):
        '''Live OLD pair + committed NEW side dirs, as the finalizer sees
        the tree the moment the swap transaction starts.'''
        ckpt = root / 'ckpt'
        save_checkpoint_orbax(str(ckpt), p_old, {'tag': 'old'}, o_old,
                              name='last_cap_model')
        scratch = root / 'scratch'
        save_checkpoint_orbax(str(scratch), p_new, {'tag': 'new'}, o_new,
                              name='incoming')
        os.rename(scratch / 'incoming.orbax',
                  ckpt / 'last_cap_model.orbax.new')
        os.rename(scratch / 'incoming.opt.orbax',
                  ckpt / 'last_cap_model.opt.orbax.new')
        shutil.rmtree(scratch)
        return ckpt

    def swap_with_crash(ckpt, crash_after):
        '''Run the swap, raising Crash after `crash_after` fs ops.
        Returns the total op count of an uninterrupted run.'''
        finals = [str(ckpt / 'last_cap_model.orbax'),
                  str(ckpt / 'last_cap_model.opt.orbax')]
        count = [0]
        real_rename, real_rmtree = os.rename, shutil.rmtree

        def tick():
            if count[0] >= crash_after:
                raise Crash(f'injected after {count[0]} fs ops')
            count[0] += 1

        def rename(src, dst):
            tick()
            return real_rename(src, dst)

        def rmtree(path, **kw):
            tick()
            return real_rmtree(path, **kw)

        os.rename, shutil.rmtree = rename, rmtree
        try:
            AsyncOrbaxWriter._swap_pair_into_place(finals)
        finally:
            os.rename, shutil.rmtree = real_rename, real_rmtree
        return count[0]

    # uninterrupted run: learn the transaction's total op count
    ckpt = setup(tmp_path / 'full')
    total_ops = swap_with_crash(ckpt, crash_after=10 ** 9)
    assert total_ops >= 6   # 2x(rmtree+rename) + 2 rename + 2 rmtree

    torn_points = []
    for n in range(total_ops + 1):
        root = tmp_path / f'crash_{n}'
        ckpt = setup(root)
        if n < total_ops:
            with pytest.raises(Crash):
                swap_with_crash(ckpt, crash_after=n)

        # every crash point must still LOAD (stale fallback included)
        params, meta, opt = load_checkpoint_orbax(
            str(ckpt), {'w': jnp.zeros(3)}, {'m': jnp.zeros(3)},
            name='last_cap_model')
        assert opt is not None, f'opt state unloadable after {n} fs ops'
        got_p = float(np.asarray(params['w'])[0])
        got_o = float(np.asarray(opt['m'])[0])
        assert got_p in (1.0, 2.0) and got_o in (10.0, 20.0), (n, got_p,
                                                               got_o)
        consistent = (got_p, got_o) in ((1.0, 10.0), (2.0, 20.0))
        if not consistent:
            # only the documented direction: params new, opt still old
            assert (got_p, got_o) == (2.0, 10.0), (n, got_p, got_o)
            torn_points.append(n)

    # the torn window is EXACTLY the single gap between the two phase-2
    # renames — no other crash point may produce a mixed pair
    assert len(torn_points) == 1, torn_points
