'''Uni-modal KV-cached greedy decode vs full-prefix recomputation parity.'''
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bmt_tpu.decode import greedy_decode_uncached
from bmt_tpu.decode.greedy import greedy_decode_unimodal
from bmt_tpu.models import (CapModelDims, init_unimodal_transformer,
                            unimodal_transformer_forward)

PAD, START, END = 1, 2, 3


@pytest.mark.parametrize('modality', ['audio', 'video'])
def test_unimodal_cached_matches_uncached(rng, modality):
    dims = CapModelDims(voc_size=19, d_model_A=8, d_model_V=12, d_model=16,
                        H=2, N=2, d_ff_A=16, d_ff_V=24, dout_p=0.0,
                        modality=modality)
    params = init_unimodal_transformer(jax.random.PRNGKey(0), dims)
    B = 3
    src = {
        'rgb': jnp.asarray(rng.normal(size=(B, 5, 12)), jnp.float32),
        'flow': jnp.asarray(rng.normal(size=(B, 5, 12)), jnp.float32),
        'audio': jnp.asarray(rng.normal(size=(B, 7, 8)), jnp.float32),
    }
    max_len = 4

    fwd = jax.jit(partial(unimodal_transformer_forward, dims=dims,
                          deterministic=True))
    slow = np.asarray(greedy_decode_uncached(
        lambda s, t, m: fwd(params, src=s, trg=t, masks=m), src, max_len,
        START, END, PAD, modality))
    fast = np.asarray(greedy_decode_unimodal(params, dims, src, max_len,
                                             START, END, PAD))
    T = slow.shape[1]
    for b in range(B):
        row_slow = slow[b].tolist()
        end_pos = row_slow.index(END) if END in row_slow else len(row_slow)
        assert row_slow[:end_pos + 1] == fast[b, :T].tolist()[:end_pos + 1]


@pytest.mark.parametrize('modality', ['audio', 'video'])
def test_unimodal_sample_top_k_1_equals_greedy(rng, modality):
    '''Sampling decode covers the uni-modal ablation models too: top_k=1
    collapses to greedy argmax regardless of key, and the modality
    dispatch in make_bimodal_sample_fn routes them.'''
    from bmt_tpu.decode import make_bimodal_sample_fn, sample_decode_unimodal
    dims = CapModelDims(voc_size=19, d_model_A=8, d_model_V=12, d_model=16,
                        H=2, N=2, d_ff_A=16, d_ff_V=24, dout_p=0.0,
                        modality=modality)
    params = init_unimodal_transformer(jax.random.PRNGKey(0), dims)
    B = 3
    src = {
        'rgb': jnp.asarray(rng.normal(size=(B, 5, 12)), jnp.float32),
        'flow': jnp.asarray(rng.normal(size=(B, 5, 12)), jnp.float32),
        'audio': jnp.asarray(rng.normal(size=(B, 7, 8)), jnp.float32),
    }
    got = np.asarray(sample_decode_unimodal(
        params, dims, src, jax.random.PRNGKey(4), 4, START, END, PAD,
        top_k=1))
    want = np.asarray(greedy_decode_unimodal(params, dims, src, 4,
                                             START, END, PAD))
    np.testing.assert_array_equal(got, want)

    # the dispatching factory routes uni-modal dims to the same decode
    fn = make_bimodal_sample_fn(dims, 4, START, END, PAD, top_k=1)
    np.testing.assert_array_equal(np.asarray(fn(params, src)), want)

    # stochastic draws are deterministic per key
    a = np.asarray(sample_decode_unimodal(
        params, dims, src, jax.random.PRNGKey(9), 4, START, END, PAD,
        temperature=1.5))
    b = np.asarray(sample_decode_unimodal(
        params, dims, src, jax.random.PRNGKey(9), 4, START, END, PAD,
        temperature=1.5))
    np.testing.assert_array_equal(a, b)
