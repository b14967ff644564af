'''Weight-only int8 quantization (ops/quant.py): qlinear accuracy, tree
transformation, full quantized decode, engine integration.'''
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bmt_tpu.ops.layers import init_linear, linear
from bmt_tpu.ops.quant import (count_quantized, qlinear,
                               quantize_linear_int8, quantize_tree_int8)


def test_qlinear_matches_linear_within_quant_error():
    rng = np.random.default_rng(0)
    p = init_linear(jax.random.PRNGKey(0), 300, 1024)
    x = jnp.asarray(rng.normal(size=(4, 7, 300)), jnp.float32)
    y = linear(p, x)
    yq = qlinear(quantize_linear_int8(p), x)
    rel = float(jnp.max(jnp.abs(y - yq)) / jnp.max(jnp.abs(y)))
    assert rel < 0.02, rel          # one quant step per operand, ~0.8% typ
    assert yq.dtype == x.dtype


def test_qlinear_weight_roundtrip_exact_at_grid_points():
    '''Weights already on the int8 grid reconstruct exactly: scale*round
    must be lossless when w = k*scale (catches asymmetric-range bugs).'''
    scale = 0.5
    w = jnp.asarray([[-127, -1, 0, 1, 127],
                     [64, -127, 127, -127, 0]], jnp.float32) * scale
    p = {'w': w, 'b': jnp.zeros((5,))}
    qp = quantize_linear_int8(p)
    np.testing.assert_allclose(
        np.asarray(qp['w_q'], np.float32) * np.asarray(qp['w_scale']),
        np.asarray(w), rtol=1e-6)


def test_qlinear_dispatch_and_dtypes():
    p = quantize_linear_int8(init_linear(jax.random.PRNGKey(1), 16, 8))
    assert p['w_q'].dtype == jnp.int8
    assert p['w_scale'].dtype == jnp.float32
    x16 = jnp.ones((3, 16), jnp.bfloat16)
    assert linear(p, x16).dtype == jnp.bfloat16      # dispatches to qlinear
    # all-zero activation rows are finite (scale guard)
    assert bool(jnp.isfinite(linear(p, jnp.zeros((2, 16)))).all())


def test_quantize_tree_transforms_only_linears():
    from bmt_tpu.models import CapModelDims, init_bimodal_transformer
    dims = CapModelDims(voc_size=50, d_model_A=8, d_model_V=8, d_model_C=8,
                        d_model=16, H=2, N=2, d_ff_A=16, d_ff_V=16,
                        d_ff_C=16)
    params = init_bimodal_transformer(jax.random.PRNGKey(0), dims)
    q = quantize_tree_int8(params, skip=('emb_C',))
    assert count_quantized(q) > 0
    # embeddings untouched, LayerNorms untouched
    np.testing.assert_array_equal(np.asarray(q['emb_C']['table']),
                                  np.asarray(params['emb_C']['table']))
    lay = q['decoder']['layers'][0]
    assert 'w_q' in lay['self_att']['q2d']
    assert set(lay['res_self']) == set(
        params['decoder']['layers'][0]['res_self'])
    # generator (LM head) quantized
    assert 'w_q' in q['generator']
    # original tree not mutated
    assert 'w' in params['generator']


def test_quantized_greedy_decode_close_to_fp32():
    '''End-to-end: the KV-cached greedy decode runs on a fully quantized
    tree and its step log-probs track the fp32 decode closely. Tokens are
    compared too — on this fixed seed the argmax path is stable.'''
    from bmt_tpu.decode import greedy_decode_bimodal
    from bmt_tpu.models import CapModelDims, init_bimodal_transformer
    from bmt_tpu.models.captioning import (bimodal_decode_init,
                                           bimodal_decode_step,
                                           bimodal_encode)
    from bmt_tpu.ops.masks import make_masks

    dims = CapModelDims(voc_size=50, d_model_A=8, d_model_V=8, d_model_C=8,
                        d_model=16, H=2, N=2, d_ff_A=16, d_ff_V=16,
                        d_ff_C=16)
    params = init_bimodal_transformer(jax.random.PRNGKey(0), dims)
    qparams = quantize_tree_int8(params)
    rng = np.random.default_rng(3)
    stacks = {'rgb': jnp.asarray(rng.normal(size=(2, 6, 8)), jnp.float32),
              'flow': jnp.asarray(rng.normal(size=(2, 6, 8)), jnp.float32),
              'audio': jnp.asarray(rng.normal(size=(2, 9, 8)), jnp.float32)}

    # step-level log-prob comparison (first step)
    masks = make_masks(stacks, None, 'audio_video', 1)
    for ps, tag in ((params, 'fp32'), (qparams, 'int8')):
        Av, Va = bimodal_encode(ps, dims, stacks, masks, deterministic=True)
        st = bimodal_decode_init(ps, dims, Av, Va, 8,
                                 A_mask=masks['A_mask'],
                                 V_mask=masks['V_mask'])
        lp, _ = bimodal_decode_step(ps, dims, st,
                                    jnp.full((2, 1), 2, jnp.int32), 0,
                                    masks['A_mask'], masks['V_mask'])
        if tag == 'fp32':
            lp_ref = lp
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               atol=0.15)

    toks = np.asarray(greedy_decode_bimodal(qparams, dims, stacks, 8, 2, 3,
                                            1))
    toks_ref = np.asarray(greedy_decode_bimodal(params, dims, stacks, 8, 2,
                                                3, 1))
    assert toks.shape == toks_ref.shape == (2, 9)
    np.testing.assert_array_equal(toks, toks_ref)


def test_quantized_decode_composes_with_int8_kv():
    from bmt_tpu.decode import greedy_decode_bimodal
    from bmt_tpu.models import CapModelDims, init_bimodal_transformer
    dims = CapModelDims(voc_size=50, d_model_A=8, d_model_V=8, d_model_C=8,
                        d_model=16, H=2, N=2, d_ff_A=16, d_ff_V=16,
                        d_ff_C=16)
    params = quantize_tree_int8(
        init_bimodal_transformer(jax.random.PRNGKey(0), dims))
    rng = np.random.default_rng(4)
    stacks = {'rgb': jnp.asarray(rng.normal(size=(2, 6, 8)), jnp.float32),
              'flow': jnp.asarray(rng.normal(size=(2, 6, 8)), jnp.float32),
              'audio': jnp.asarray(rng.normal(size=(2, 9, 8)), jnp.float32)}
    toks = np.asarray(greedy_decode_bimodal(params, dims, stacks, 8, 2, 3,
                                            1, kv_int8=True))
    assert toks.shape == (2, 9)
    assert ((toks >= 0) & (toks < 50)).all()


def test_engine_weights_int8(tmp_path):
    '''CaptionEngine(weights_int8=True) quantizes at init and serves.'''
    from bmt_tpu.models import CapModelDims, init_bimodal_transformer
    from bmt_tpu.ops.quant import count_quantized
    from bmt_tpu.serve import CaptionEngine

    dims = CapModelDims(voc_size=20, d_model_A=8, d_model_V=8, d_model_C=8,
                        d_model=16, H=2, N=1, d_ff_A=16, d_ff_V=16,
                        d_ff_C=16, d_vid=8, d_aud=8)
    from bmt_tpu.data.vocab import Vocab
    params = init_bimodal_transformer(jax.random.PRNGKey(0), dims)
    itos = ['<unk>', '<blank>', '<s>', '</s>'] + [f'w{i}' for i in range(16)]
    vocab = Vocab(itos)
    eng = CaptionEngine(params, dims, vocab, max_len=6, weights_int8=True)
    assert count_quantized(eng.params) > 0
    rng = np.random.default_rng(5)
    crop = {'rgb': rng.normal(size=(5, 8)).astype(np.float32),
            'flow': rng.normal(size=(5, 8)).astype(np.float32),
            'audio': rng.normal(size=(7, 8)).astype(np.float32)}
    sents = eng.caption_crops([crop])
    assert len(sents) == 1 and isinstance(sents[0], str)
