'''Stochastic decoding: filter semantics, determinism, degenerate limits.'''
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bmt_tpu.decode import (filter_logits, greedy_decode_bimodal,
                            make_bimodal_sample_fn, sample_decode_bimodal)
from bmt_tpu.models import CapModelDims, init_bimodal_transformer

DIMS = CapModelDims(voc_size=23, d_model_A=8, d_model_V=12, d_model_C=10,
                    d_model=16, H=2, N=2, d_ff_A=16, d_ff_V=24, d_ff_C=20,
                    dout_p=0.1)
PAD, START, END = 1, 2, 3
MAX_LEN = 6


@pytest.fixture(scope='module')
def setup():
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    rng = np.random.default_rng(0)
    B = 4
    stacks = {
        'rgb': jnp.asarray(rng.normal(size=(B, 5, 12)), jnp.float32),
        'flow': jnp.asarray(rng.normal(size=(B, 5, 12)), jnp.float32),
        'audio': jnp.asarray(rng.normal(size=(B, 7, 8)), jnp.float32),
    }
    return params, stacks


def test_filter_logits_top_k():
    lp = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    out = np.asarray(filter_logits(lp, top_k=2))
    assert np.isfinite(out[0, :2]).all()
    assert np.isneginf(out[0, 2:]).all()


def test_filter_logits_top_p():
    lp = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    # p=0.6: token 0 (0.5) kept; token 1 kept (mass before it 0.5 <= 0.6);
    # tokens 2,3 cut (mass before them 0.8, 0.95 > 0.6)
    out = np.asarray(filter_logits(lp, top_p=0.6))
    assert np.isfinite(out[0, :2]).all()
    assert np.isneginf(out[0, 2:]).all()
    # even with tiny p the best token survives
    out = np.asarray(filter_logits(lp, top_p=1e-6))
    assert np.isfinite(out[0, 0])
    assert np.isneginf(out[0, 1:]).all()


def test_sample_deterministic_per_key(setup):
    params, stacks = setup
    key = jax.random.PRNGKey(7)
    a = np.asarray(sample_decode_bimodal(params, DIMS, stacks, key,
                                         MAX_LEN, START, END, PAD))
    b = np.asarray(sample_decode_bimodal(params, DIMS, stacks, key,
                                         MAX_LEN, START, END, PAD))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(sample_decode_bimodal(params, DIMS, stacks,
                                         jax.random.PRNGKey(8),
                                         MAX_LEN, START, END, PAD))
    assert not np.array_equal(a, c)  # different key -> different draws


def test_sample_top_k_1_equals_greedy(setup):
    '''top_k=1 collapses sampling to greedy argmax regardless of key.'''
    params, stacks = setup
    got = np.asarray(sample_decode_bimodal(params, DIMS, stacks,
                                           jax.random.PRNGKey(0), MAX_LEN,
                                           START, END, PAD, top_k=1))
    want = np.asarray(greedy_decode_bimodal(params, DIMS, stacks, MAX_LEN,
                                            START, END, PAD))
    np.testing.assert_array_equal(got, want)


def test_low_temperature_approaches_greedy(setup):
    params, stacks = setup
    got = np.asarray(sample_decode_bimodal(params, DIMS, stacks,
                                           jax.random.PRNGKey(3), MAX_LEN,
                                           START, END, PAD,
                                           temperature=1e-4))
    want = np.asarray(greedy_decode_bimodal(params, DIMS, stacks, MAX_LEN,
                                            START, END, PAD))
    np.testing.assert_array_equal(got, want)


def test_make_sample_fn_counter_advances(setup):
    '''The bound fn draws fresh samples per call but is reproducible per
    construction (fixed seed + call counter).'''
    params, stacks = setup
    fn1 = make_bimodal_sample_fn(DIMS, MAX_LEN, START, END, PAD, seed=5)
    a1, a2 = np.asarray(fn1(params, stacks)), np.asarray(fn1(params, stacks))
    assert not np.array_equal(a1, a2)
    fn2 = make_bimodal_sample_fn(DIMS, MAX_LEN, START, END, PAD, seed=5)
    np.testing.assert_array_equal(np.asarray(fn2(params, stacks)), a1)


def test_sample_rows_start_and_terminate(setup):
    params, stacks = setup
    toks = np.asarray(sample_decode_bimodal(params, DIMS, stacks,
                                            jax.random.PRNGKey(1), MAX_LEN,
                                            START, END, PAD,
                                            temperature=1.5, top_p=0.9))
    assert toks.shape == (4, MAX_LEN + 1)
    assert (toks[:, 0] == START).all()
    assert ((toks >= 0) & (toks < DIMS.voc_size)).all()


def test_filter_logits_top_k_exceeding_vocab_is_clamped():
    lp = jnp.log(jnp.asarray([[0.5, 0.3, 0.2]]))
    out = np.asarray(filter_logits(lp, top_k=1000))
    assert np.isfinite(out).all()        # clamp to V: nothing masked


def test_nonpositive_temperature_rejected(setup):
    params, stacks = setup
    with pytest.raises(ValueError):
        sample_decode_bimodal(params, DIMS, stacks, jax.random.PRNGKey(0),
                              MAX_LEN, START, END, PAD, temperature=0.0)


def test_nucleus_cut_is_index_exact():
    '''Tied scores at the nucleus boundary must not widen the support: at
    p=0.5 over four 0.25 tokens the smallest prefix exceeding p is 3
    tokens (mass strictly before the 3rd is 0.5, not > p; before the 4th
    it is 0.75 > p). A value-threshold cut would keep all 4 ties.'''
    lp = jnp.log(jnp.asarray([[0.25, 0.25, 0.25, 0.25]]))
    out = np.asarray(filter_logits(lp, top_p=0.5))
    assert np.isfinite(out[0]).sum() == 3


def test_nucleus_mass_is_absolute_not_slice_relative():
    '''The nucleus cut must measure TRUE vocabulary probability mass, not
    mass renormalized over the top-support slice: with substantial tail
    mass outside the slice, a slice-relative cumsum inflates slice
    probabilities and cuts the nucleus too narrow.'''
    import numpy as np
    from bmt_tpu.decode.sample import filter_logits, _TOP_P_SUPPORT

    V = _TOP_P_SUPPORT + 88
    probs = np.empty(V)
    probs[:10] = 0.04                        # 0.4 mass on ten head tokens
    probs[10:] = 0.6 / (V - 10)              # rest spread over the tail
    # distinct head values keep the sort order deterministic
    probs[:10] += np.arange(10)[::-1] * 1e-6
    probs /= probs.sum()
    logp = np.log(probs)[None, :]
    top_p = 0.41

    out = np.asarray(filter_logits(jnp.asarray(logp), top_p=top_p))[0]
    kept = np.isfinite(out).sum()

    # expected from a FULL-vocab descending cumsum (position is out when
    # the mass strictly before it already exceeds top_p)
    order = np.argsort(-probs, kind='stable')
    csum = np.cumsum(probs[order])
    expected = int(((csum - probs[order]) <= top_p).sum())
    assert expected > 10          # the true nucleus extends into the tail
    assert kept == expected
