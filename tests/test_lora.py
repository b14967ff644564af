'''LoRA adapters (ops/lora.py, --lora_rank): rank-r deltas inside the
linear param dicts, trained with the base frozen.

Contracts pinned here:
- zero-init adapters leave the forward BIT-identical (lora_b = 0);
- a train step updates ONLY adapter leaves; the frozen base (and the Adam
  state layout) honours the parameter-efficient contract — moments exist
  for adapters alone via optax.masked;
- merge_lora folds the delta into the base weights exactly (forward match);
- the int8 quantizer and the reference .pt exporter auto-merge loose
  adapters instead of silently dropping a finetune's deltas;
- native checkpoint save -> load_cap_checkpoint round-trips the adapted
  tree (template rebuilt with add_lora from the saved config).
'''
import numpy as np
import jax
import jax.numpy as jnp

from bmt_tpu.models import CapModelDims, init_bimodal_transformer
from bmt_tpu.models.captioning import bimodal_transformer_forward
from bmt_tpu.ops.lora import (add_lora, count_lora, lora_frozen_predicate,
                              merge_lora)
from bmt_tpu.ops.masks import make_masks
from bmt_tpu.train.optim import build_optimizer, freeze_mask
from bmt_tpu.train.steps import init_train_state, make_cap_train_step

DIMS = CapModelDims(voc_size=32, d_model_A=8, d_model_V=8, d_model_C=8,
                    d_model=16, H=2, N=1, d_ff_A=16, d_ff_V=16, d_ff_C=16,
                    dout_p=0.0)


class _Cfg:
    optimizer = 'adam'
    lr = 1e-2
    grad_clip = None
    weight_decay = 0.0
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    lora_rank = 4          # enables the masked-Adam state layout


def _batch(rng, B=4):
    return {
        'src': {
            'rgb': rng.normal(size=(B, 5, 8)).astype(np.float32),
            'flow': rng.normal(size=(B, 5, 8)).astype(np.float32),
            'audio': rng.normal(size=(B, 6, 8)).astype(np.float32),
        },
        'caption': rng.integers(4, 32, size=(B, 6)).astype(np.int32),
    }


def _forward(params, batch):
    masks = make_masks(batch['src'], batch['caption'], 'audio_video', 1)
    return np.asarray(bimodal_transformer_forward(
        params, DIMS, batch['src'], batch['caption'], masks))


def _adapted(rank=4, targets='attn', alpha=None):
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    return params, add_lora(params, rank, jax.random.PRNGKey(7),
                            alpha, targets)


def test_zero_init_is_bit_identical(rng):
    params, adapted = _adapted()
    sites, n = count_lora(adapted)
    # hetero-dim MHA: every adapted linear contributes (d_in + d_out) * r
    assert sites > 0 and n > 0 and n % 4 == 0
    batch = _batch(rng)
    np.testing.assert_array_equal(_forward(params, batch),
                                  _forward(adapted, batch))


def test_targets_control_placement():
    params, attn = _adapted(targets='attn')
    _, attn_ffn = _adapted(targets='attn_ffn')
    _, every = _adapted(targets='all')
    n_attn, n_attn_ffn, n_all = (count_lora(t)[0]
                                 for t in (attn, attn_ffn, every))
    assert n_attn < n_attn_ffn < n_all
    # 'all' adapts every 2-D linear: generator included
    assert 'lora_a' in every['generator']
    assert 'lora_a' not in attn['generator']


def test_train_step_updates_only_adapters(rng):
    _, adapted = _adapted()
    mask = freeze_mask(adapted, lora_frozen_predicate)
    optimizer = build_optimizer(_Cfg(), frozen_mask=mask)
    step = jax.jit(make_cap_train_step(DIMS, optimizer, 0.7, 1))
    state = init_train_state(adapted, optimizer)
    batch = _batch(rng)
    for _ in range(2):   # lora_a's grad needs lora_b != 0: two steps
        state, _ = step(state, batch)

    flat0 = jax.tree_util.tree_flatten_with_path(adapted)[0]
    flat1 = {jax.tree_util.keystr(p): v
             for p, v in jax.tree_util.tree_flatten_with_path(
                 state.params)[0]}
    moved = frozen = 0
    for path, before in flat0:
        after = np.asarray(flat1[jax.tree_util.keystr(path)])
        name = path[-1].key
        if name in ('lora_a', 'lora_b'):
            assert np.abs(after - np.asarray(before)).max() > 0, path
            moved += 1
        else:
            np.testing.assert_array_equal(after, np.asarray(before),
                                          err_msg=str(path))
            frozen += 1
    assert moved == 2 * count_lora(adapted)[0] and frozen > moved


def test_masked_adam_state_covers_only_adapters():
    '''optax.masked keeps moments for adapter leaves alone — the optimizer
    state genuinely shrinks with the trainable set.'''
    _, adapted = _adapted()
    mask = freeze_mask(adapted, lora_frozen_predicate)
    optimizer = build_optimizer(_Cfg(), frozen_mask=mask)
    opt_state = optimizer.init(adapted)
    n_arrays = sum(1 for leaf in jax.tree.leaves(opt_state)
                   if getattr(leaf, 'ndim', None) not in (None, 0))
    # mu + nu per trainable leaf, nothing for the frozen base
    assert n_arrays == 2 * 2 * count_lora(adapted)[0]


def test_opt_state_npz_roundtrip_with_masked_nodes(tmp_path):
    '''MaskedNode placeholders (empty NamedTuples) must survive the npz
    flatten/restore used by rolling resume.'''
    from bmt_tpu.train.checkpoint import load_pytree_npz, save_pytree_npz
    _, adapted = _adapted()
    mask = freeze_mask(adapted, lora_frozen_predicate)
    optimizer = build_optimizer(_Cfg(), frozen_mask=mask)
    opt_state = optimizer.init(adapted)
    path = str(tmp_path / 'opt.npz')
    save_pytree_npz(path, opt_state)
    restored = load_pytree_npz(path, optimizer.init(adapted))
    for a, b in zip(jax.tree.leaves(opt_state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _randomize_adapters(tree, scale=0.3):
    k = [0]
    def walk(node):
        if isinstance(node, dict):
            out = {}
            for name, v in node.items():
                if name == 'lora_b':
                    k[0] += 1
                    out[name] = scale * jax.random.normal(
                        jax.random.PRNGKey(100 + k[0]), v.shape, v.dtype)
                else:
                    out[name] = walk(v)
            return out
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node
    out = walk(tree)
    assert k[0] > 0, 'no adapters found to randomize'
    return out


def test_merge_matches_adapted_forward(rng):
    _, adapted = _adapted(alpha=8.0)   # scale 2.0: exercise non-unit alpha
    adapted = _randomize_adapters(adapted)
    merged = merge_lora(adapted)
    assert count_lora(merged) == (0, 0)
    batch = _batch(rng)
    np.testing.assert_allclose(_forward(merged, batch),
                               _forward(adapted, batch),
                               rtol=2e-5, atol=2e-5)


def test_quantizer_auto_merges(rng):
    from bmt_tpu.ops.quant import count_quantized, quantize_tree_int8
    _, adapted = _adapted()
    adapted = _randomize_adapters(adapted)
    q = quantize_tree_int8(adapted, skip=('emb_C',))
    flat = jax.tree_util.tree_flatten_with_path(
        q, is_leaf=lambda x: isinstance(x, dict) and 'w_q' in x)[0]
    assert count_quantized(q) > 0
    assert not any('lora' in jax.tree_util.keystr(p) for p, _ in flat)
    # quantized-merged forward tracks the adapted fp forward within int8 noise
    batch = _batch(rng)
    ref, got = _forward(adapted, batch), _forward(q, batch)
    assert np.abs(ref - got).mean() < 0.05


def test_export_folds_adapters():
    from bmt_tpu.train.checkpoint import export_cap_state_dict
    _, adapted = _adapted()
    adapted = _randomize_adapters(adapted)
    sd_adapted = export_cap_state_dict(adapted)
    sd_merged = export_cap_state_dict(merge_lora(adapted))
    assert sorted(sd_adapted) == sorted(sd_merged)
    for k in sd_adapted:
        np.testing.assert_allclose(sd_adapted[k], sd_merged[k],
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=k)
    # and the delta really is present (differs from the base-only export)
    sd_base = export_cap_state_dict(
        {k: v for k, v in init_bimodal_transformer(
            jax.random.PRNGKey(0), DIMS).items()})
    diffs = [k for k in sd_adapted
             if not np.allclose(sd_adapted[k], sd_base[k])]
    assert diffs, 'adapter deltas were dropped by the exporter'


def test_native_checkpoint_roundtrip(tmp_path):
    '''save_checkpoint -> load_cap_checkpoint rebuilds the LoRA template
    from the saved config and restores the adapted tree exactly.'''
    from bmt_tpu.config import Config, build_parser
    from bmt_tpu.train.checkpoint import load_cap_checkpoint, save_checkpoint
    _, adapted = _adapted()
    adapted = _randomize_adapters(adapted)
    argv = ['--procedure', 'train_cap', '--d_vid', '8', '--d_aud', '8',
            '--d_model', '16', '--d_model_caps', '8', '--H', '2', '--N', '1',
            '--d_ff_video', '16', '--d_ff_audio', '16', '--d_ff_caps', '16',
            '--dout_p', '0.0', '--lora_rank', '4', '--dont_log']
    cfg = Config(build_parser().parse_args(argv))
    meta = {'config': cfg.to_dict(),
            'vocab_itos': [f't{i}' for i in range(32)]}
    save_checkpoint(str(tmp_path), adapted, meta)
    _, _, restored, vocab = load_cap_checkpoint(str(tmp_path))
    assert len(vocab) == 32
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(adapted)[0],
            jax.tree_util.tree_flatten_with_path(restored)[0]):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_seed_from_lora_finetuned_checkpoint(tmp_path):
    '''--pretrained_cap_model_path accepts a LoRA-FINETUNED checkpoint: the
    saved adapters fold into the base weights (the finetune's effective
    model), so a round-2 finetune starts from round-1's result and applies
    its OWN fresh adapters — it never silently inherits round-1's adapter
    rank/alpha/targets.'''
    from bmt_tpu.train.checkpoint import (load_pretrained_cap_params,
                                          save_checkpoint)

    base = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    adapted = add_lora(base, 4, jax.random.PRNGKey(3), targets='attn_ffn')

    def bump(node):   # nonzero deltas so the merge is observable
        if isinstance(node, dict):
            return {k: (v + 0.01 if k == 'lora_b' else bump(v))
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(bump(v) for v in node)
        return node

    adapted = bump(adapted)
    save_checkpoint(str(tmp_path), adapted, {'epoch': 0},
                    name='best_cap_model')

    expect = merge_lora(adapted)
    for src in (str(tmp_path),                                  # ckpt dir
                str(tmp_path / 'best_cap_model.params.npz')):   # bare npz
        got = load_pretrained_cap_params(src, base)
        # template structure preserved (jit/sharding consumers rely on it)
        assert (jax.tree_util.tree_structure(got)
                == jax.tree_util.tree_structure(base))
        for a, b in zip(jax.tree.leaves(expect), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-6)
        # the merge really happened (base != merged at adapted sites)
        assert any(not np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(jax.tree.leaves(base),
                                   jax.tree.leaves(got)))


def test_adapter_only_artifact_roundtrip(tmp_path):
    '''save_lora_npz writes just the adapter leaves (the kilobyte-scale
    shippable finetune artifact); load_lora_sites reads it back for
    serving, and the sizes honour the parameter-efficient story.'''
    import os

    from bmt_tpu.train.checkpoint import (load_lora_sites, save_lora_npz,
                                          save_checkpoint)

    base = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    adapted = add_lora(base, 4, jax.random.PRNGKey(3), targets='attn_ffn')
    art = tmp_path / 'tune.lora.npz'
    n = save_lora_npz(str(art), adapted)
    assert n == count_lora(adapted)[0]

    sites = load_lora_sites(str(art))
    assert len(sites) == n
    for leaves in sites.values():
        assert set(leaves) == {'lora_a', 'lora_b', 'lora_s'}

    # the artifact holds ONLY adapter leaves (at the flagship scale that
    # is ~0.4% of the full tree; at these toy dims just assert strictly
    # smaller and lora-only content)
    save_checkpoint(str(tmp_path / 'full'), adapted, {'epoch': 0})
    full = os.path.getsize(tmp_path / 'full' / 'best_cap_model.params.npz')
    assert os.path.getsize(art) < full
    with np.load(art) as zf:
        assert all(k.rsplit('/', 1)[-1] in ('lora_a', 'lora_b', 'lora_s')
                   for k in zf.files)

    # a plain-base tree has nothing to ship
    import pytest
    with pytest.raises(ValueError, match='no LoRA adapter leaves'):
        save_lora_npz(str(tmp_path / 'x.npz'), base)


def test_lora_rank_rejected_for_train_prop():
    '''--lora_rank with --procedure train_prop fails loudly instead of
    silently training without adapters.'''
    import pytest

    from bmt_tpu.config import Config, build_parser
    args = build_parser().parse_args(
        ['--procedure', 'train_prop', '--lora_rank', '4', '--dont_log'])
    with pytest.raises(ValueError, match='train_cap only'):
        Config(args)


def test_shared_lora_fusion_matches_per_site_deltas():
    '''The shared-input A-side fusion (ops/lora.py:shared_lora_deltas,
    dispatched in ops/attention.py:_project_qkv for self-attn q=k=v and
    cross-attn k=v) computes the same deltas as three independent
    per-site ``((x @ A) @ B) * s`` applications: each output column of
    ``x @ concat(A)`` is the same K-length contraction, so only GEMM
    tiling may differ (tight tolerance, and exact on CPU).'''
    from bmt_tpu.ops.lora import shared_lora_deltas
    rng = np.random.default_rng(3)
    _, adapted = _adapted(rank=4, targets='attn')

    # give every adapter a NONZERO B so deltas actually flow
    def fill_b(node):
        if isinstance(node, dict):
            if 'lora_b' in node:
                node = dict(node)
                node['lora_b'] = jnp.asarray(
                    rng.normal(size=node['lora_b'].shape) * 0.3,
                    jnp.float32)
                return node
            return {k: fill_b(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(fill_b(v) for v in node)
        return node
    adapted = fill_b(adapted)

    # unit check: fused vs per-site deltas on one site triple
    site = adapted['decoder']['layers'][0]['self_att']
    sites = [site['q2d'], site['k2d'], site['v2d']]
    x = jnp.asarray(rng.normal(size=(4, 6, site['q2d']['w'].shape[0])),
                    jnp.float32)
    fused = shared_lora_deltas(sites, x)
    for d, s in zip(fused, sites):
        ref = ((x @ s['lora_a']) @ s['lora_b']) * s['lora_s']
        np.testing.assert_allclose(np.asarray(d), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    # end-to-end: the adapted forward (which routes through _project_qkv)
    # matches a merge_lora'd base forward — the fused path must not
    # change WHAT is computed, only how the skinny GEMMs are batched
    batch = _batch(rng)
    out_adapted = _forward(adapted, batch)
    out_merged = _forward(merge_lora(adapted), batch)
    np.testing.assert_allclose(out_adapted, out_merged,
                               rtol=2e-4, atol=2e-4)
