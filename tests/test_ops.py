'''Parity tests for core ops against independent torch implementations.'''
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from bmt_tpu.ops import (mask, make_masks, subsequent_mask,
                         multi_head_attention, init_mha,
                         layer_norm, init_layer_norm, linear, init_linear,
                         feed_forward, init_ffn, bridge, init_bridge,
                         positional_encoding_table, positional_encode,
                         vocabulary_embed, init_vocab_embedder,
                         feature_embed, init_feature_embedder)
from tests.torch_ref import (t_mha, t_layer_norm, t_ffn, t_bridge, t_pos_enc,
                             t_vocab_embed, tt)


def test_subsequent_mask():
    m = np.asarray(subsequent_mask(4))
    expected = np.tril(np.ones((4, 4))).astype(bool)[None]
    np.testing.assert_array_equal(m, expected)


def test_pad_and_causal_mask():
    src = jnp.array([[5, 2, 1, 1], [7, 8, 9, 1]])
    trg = jnp.array([[2, 4, 1], [2, 1, 1]])
    src_m, trg_m = mask(src, trg, pad_idx=1)
    np.testing.assert_array_equal(
        np.asarray(src_m),
        np.array([[[1, 1, 0, 0]], [[1, 1, 1, 0]]], bool))
    # causal AND padding
    expected_trg0 = np.array([[1, 0, 0], [1, 1, 0], [1, 1, 0]], bool)
    np.testing.assert_array_equal(np.asarray(trg_m[0]), expected_trg0)


def test_make_masks_feature_channel0_quirk():
    '''V_mask keys off rgb channel 0 vs pad_idx (reference quirk).'''
    rgb = np.zeros((1, 3, 4), np.float32)
    rgb[0, 2, 0] = 1.0  # pad marker in channel 0
    audio = np.ones((1, 2, 4), np.float32) * 0.3
    stacks = {'rgb': jnp.asarray(rgb), 'flow': jnp.zeros_like(jnp.asarray(rgb)),
              'audio': jnp.asarray(audio)}
    masks = make_masks(stacks, None, 'audio_video', pad_idx=1)
    np.testing.assert_array_equal(np.asarray(masks['V_mask']),
                                  np.array([[[1, 1, 0]]], bool))
    np.testing.assert_array_equal(np.asarray(masks['A_mask']),
                                  np.array([[[1, 1]]], bool))


def test_layer_norm_matches_torch(rng):
    p = init_layer_norm(16)
    p = jax.tree.map(lambda x: jnp.asarray(rng.normal(size=x.shape),
                                           jnp.float32), p)
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    ours = np.asarray(layer_norm(p, jnp.asarray(x)))
    theirs = t_layer_norm(p, torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_ffn_and_bridge_match_torch(rng):
    key = jax.random.PRNGKey(0)
    pf = init_ffn(key, 8, 32)
    x = rng.normal(size=(2, 3, 8)).astype(np.float32)
    ours = np.asarray(feed_forward(pf, jnp.asarray(x)))
    theirs = t_ffn(pf, torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    pb = init_bridge(key, 8, 4)
    ours = np.asarray(bridge(pb, jnp.asarray(x)))
    theirs = t_bridge(pb, torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_positional_encoding_matches_reference_formula(rng):
    '''The reference table is non-standard (cos exponent uses odd index).'''
    d_model = 10
    table = positional_encoding_table(50, d_model)
    x = np.zeros((1, 50, d_model), np.float32)
    theirs = t_pos_enc(torch.from_numpy(x), d_model).numpy()
    np.testing.assert_allclose(table[None], theirs, atol=1e-6)

    # offset slicing for stepwise decode
    x1 = rng.normal(size=(1, 1, d_model)).astype(np.float32)
    out = positional_encode(jnp.asarray(table), jnp.asarray(x1), offset=7)
    np.testing.assert_allclose(np.asarray(out)[0, 0], x1[0, 0] + table[7],
                               atol=1e-6)


def test_vocab_embedder_scaling(rng):
    key = jax.random.PRNGKey(1)
    p = init_vocab_embedder(key, 20, 6)
    toks = np.array([[1, 5, 19]])
    ours = np.asarray(vocabulary_embed(p, jnp.asarray(toks), 6))
    theirs = t_vocab_embed(p, torch.from_numpy(toks).long(), 6).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)

    # adapter path (pretrained width != emb_dim)
    glove = rng.normal(size=(20, 4)).astype(np.float32)
    p2 = init_vocab_embedder(key, 20, 6, pretrained=glove)
    assert 'adapter' in p2
    ours = np.asarray(vocabulary_embed(p2, jnp.asarray(toks), 6))
    theirs = t_vocab_embed(p2, torch.from_numpy(toks).long(), 6).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_feature_embedder(rng):
    key = jax.random.PRNGKey(2)
    p = init_feature_embedder(key, 12, 8)
    x = rng.normal(size=(2, 3, 12)).astype(np.float32)
    ours = np.asarray(feature_embed(p, jnp.asarray(x), 8))
    expected = F.relu((torch.from_numpy(x) @ tt(p['linear']['w'])
                       + tt(p['linear']['b'])) * np.sqrt(8)).numpy()
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_mha_hetero_dims_matches_torch(rng):
    key = jax.random.PRNGKey(3)
    H, d_model = 4, 32
    dq, dk = 16, 24
    p = init_mha(key, dq, dk, dk, d_model)
    q = rng.normal(size=(2, 5, dq)).astype(np.float32)
    kv = rng.normal(size=(2, 7, dk)).astype(np.float32)
    m = np.ones((2, 1, 7), bool)
    m[1, 0, 5:] = False

    ours = np.asarray(multi_head_attention(p, jnp.asarray(q), jnp.asarray(kv),
                                           jnp.asarray(kv), jnp.asarray(m), H))
    theirs = t_mha(p, torch.from_numpy(q), torch.from_numpy(kv),
                   torch.from_numpy(kv), torch.from_numpy(m), H).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_mha_causal_mask(rng):
    key = jax.random.PRNGKey(4)
    H, d = 2, 8
    p = init_mha(key, d, d, d, d)
    x = rng.normal(size=(1, 4, d)).astype(np.float32)
    causal = np.asarray(subsequent_mask(4)).repeat(1, axis=0)

    ours = np.asarray(multi_head_attention(p, jnp.asarray(x), jnp.asarray(x),
                                           jnp.asarray(x),
                                           jnp.asarray(causal), H))
    theirs = t_mha(p, torch.from_numpy(x), torch.from_numpy(x),
                   torch.from_numpy(x), torch.from_numpy(causal), H).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_make_masks_subs_modality_without_captions():
    '''The subs_audio_video branch must guard captions=None like the other
    modalities (previously it unpacked a single mask array).'''
    import numpy as np
    from bmt_tpu.ops.masks import make_masks
    B = 3  # != 2, which would silently mis-unpack in the old code
    stacks = {'rgb': jnp.ones((B, 5, 4)), 'flow': jnp.ones((B, 5, 4)),
              'audio': jnp.ones((B, 6, 2)), 'subs': jnp.ones((B, 4))}
    masks = make_masks(stacks, None, 'subs_audio_video', pad_idx=0)
    assert masks['V_mask'].shape == (B, 1, 5)
    assert masks['A_mask'].shape == (B, 1, 6)
    assert masks['S_mask'].shape == (B, 1, 4)
    assert 'C_mask' not in masks


def test_dropout_u16_mask_statistics_and_determinism():
    '''The u16 integer-threshold dropout (DESIGN 6b: halves the mask HBM
    traffic vs bernoulli) must still BE dropout: keep rate within
    sampling noise of 1-rate, survivors scaled by 1/keep, zeros
    elsewhere, and the draw deterministic per key.'''
    import jax
    import jax.numpy as jnp

    from bmt_tpu.ops.layers import dropout

    key = jax.random.PRNGKey(3)
    x = jnp.ones((256, 257), jnp.float32)
    y = np.asarray(dropout(x, 0.1, key, deterministic=False))
    kept = y != 0.0
    # E[kept] = round(0.9*2^16)/2^16 within 8e-6; n=65792 draws
    # -> std of the mean ~0.0012, assert 5 sigma
    assert abs(kept.mean() - 0.9) < 6e-3, kept.mean()
    np.testing.assert_allclose(y[kept], 1.0 / 0.9, rtol=1e-6)
    # deterministic per key; different keys differ
    y2 = np.asarray(dropout(x, 0.1, key, deterministic=False))
    np.testing.assert_array_equal(y, y2)
    y3 = np.asarray(dropout(x, 0.1, jax.random.PRNGKey(4), False))
    assert (y != y3).any()
    # no-op contracts
    np.testing.assert_array_equal(
        np.asarray(dropout(x, 0.0, key, False)), np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(dropout(x, 0.5, key, True)), np.asarray(x))
