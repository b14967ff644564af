'''Beam search: K=1 equals greedy; larger K never scores worse; finished
beams freeze correctly.'''
import numpy as np
import jax
import jax.numpy as jnp

from bmt_tpu.decode import greedy_decode_bimodal
from bmt_tpu.decode.beam import beam_search_bimodal
from bmt_tpu.models import CapModelDims, init_bimodal_transformer
from bmt_tpu.models.captioning import bimodal_transformer_forward
from bmt_tpu.ops.masks import make_masks

PAD, START, END = 1, 2, 3
DIMS = CapModelDims(voc_size=17, d_model_A=8, d_model_V=8, d_model_C=8,
                    d_model=16, H=2, N=1, d_ff_A=16, d_ff_V=16, d_ff_C=16,
                    dout_p=0.0)


def _stacks(rng, B=3):
    return {
        'rgb': jnp.asarray(rng.normal(size=(B, 5, 8)), jnp.float32),
        'flow': jnp.asarray(rng.normal(size=(B, 5, 8)), jnp.float32),
        'audio': jnp.asarray(rng.normal(size=(B, 6, 8)), jnp.float32),
    }


def _seq_logprob(params, stacks, tokens):
    '''Teacher-forced log-prob of each row up to (and incl.) first END.'''
    toks = jnp.asarray(tokens)
    x, y = toks[:, :-1], toks[:, 1:]
    masks = make_masks(stacks, x, 'audio_video', PAD)
    lp = bimodal_transformer_forward(params, DIMS, stacks, x, masks,
                                     deterministic=True)
    picked = jnp.take_along_axis(lp, y[:, :, None], axis=-1)[:, :, 0]
    out = []
    for b in range(toks.shape[0]):
        row = np.asarray(y[b])
        end_pos = np.argmax(row == END) if (row == END).any() else len(row) - 1
        out.append(float(np.asarray(picked[b])[:end_pos + 1].sum()))
    return np.asarray(out)


def test_beam1_equals_greedy(rng):
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    stacks = _stacks(rng)
    greedy = np.asarray(greedy_decode_bimodal(params, DIMS, stacks, 6,
                                              START, END, PAD))
    beam, _ = beam_search_bimodal(params, DIMS, stacks, 6, START, END, PAD,
                                  beam_size=1)
    beam = np.asarray(beam)
    for b in range(greedy.shape[0]):
        g = greedy[b].tolist()
        cut = g.index(END) + 1 if END in g else len(g)
        assert g[:cut] == beam[b].tolist()[:cut], (b, g, beam[b])


def test_beam4_never_worse_than_greedy(rng):
    params = init_bimodal_transformer(jax.random.PRNGKey(1), DIMS)
    stacks = _stacks(rng, B=4)
    greedy = np.asarray(greedy_decode_bimodal(params, DIMS, stacks, 6,
                                              START, END, PAD))
    beam, beam_scores = beam_search_bimodal(params, DIMS, stacks, 6, START,
                                            END, PAD, beam_size=4)
    g_scores = _seq_logprob(params, stacks, greedy)
    b_scores = _seq_logprob(params, stacks, np.asarray(beam))
    assert np.all(b_scores >= g_scores - 1e-4), (b_scores, g_scores)
    # reported beam scores agree with teacher-forced recomputation
    np.testing.assert_allclose(np.asarray(beam_scores), b_scores, atol=1e-3)


def test_beam_fn_interface(rng):
    from bmt_tpu.decode.beam import make_bimodal_beam_fn
    params = init_bimodal_transformer(jax.random.PRNGKey(2), DIMS)
    fn = make_bimodal_beam_fn(DIMS, 5, START, END, PAD, beam_size=3,
                              length_penalty=0.7)
    toks = np.asarray(fn(params, _stacks(rng, B=2)))
    assert toks.shape == (2, 6)
    assert np.all(toks[:, 0] == START)


def test_unimodal_beam1_equals_greedy(rng):
    from bmt_tpu.decode.beam import beam_search_unimodal
    from bmt_tpu.decode.greedy import greedy_decode_unimodal
    from bmt_tpu.models import init_unimodal_transformer
    dims = CapModelDims(voc_size=17, d_model_A=8, d_model_V=8, d_model=16,
                        H=2, N=1, d_ff_A=16, d_ff_V=16, dout_p=0.0,
                        modality='audio')
    params = init_unimodal_transformer(jax.random.PRNGKey(3), dims)
    stacks = _stacks(rng, B=2)
    greedy = np.asarray(greedy_decode_unimodal(params, dims, stacks, 5,
                                               START, END, PAD))
    beam, _ = beam_search_unimodal(params, dims, stacks, 5, START, END, PAD,
                                   beam_size=1)
    beam = np.asarray(beam)
    for b in range(2):
        g = greedy[b].tolist()
        cut = g.index(END) + 1 if END in g else len(g)
        assert g[:cut] == beam[b].tolist()[:cut]


def test_beam_int8_kv_close_to_bf16(rng):
    '''The folded int8 cross-attention path (beams as query positions over
    quantized K/V) must track the float beam search: identical or
    near-identical tokens and scores within quantization tolerance.'''
    params = init_bimodal_transformer(jax.random.PRNGKey(5), DIMS)
    stacks = _stacks(rng, B=4)
    toks_f, scores_f = beam_search_bimodal(params, DIMS, stacks, 6, START,
                                           END, PAD, beam_size=4)
    toks_q, scores_q = beam_search_bimodal(params, DIMS, stacks, 6, START,
                                           END, PAD, beam_size=4,
                                           kv_int8=True)
    agreement = (np.asarray(toks_q) == np.asarray(toks_f)).mean()
    assert agreement >= 0.9, (agreement, np.asarray(toks_f),
                              np.asarray(toks_q))
    np.testing.assert_allclose(np.asarray(scores_q), np.asarray(scores_f),
                               atol=0.1)
