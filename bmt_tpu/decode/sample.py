'''Stochastic caption decoding: temperature / top-k / nucleus sampling.

The reference decodes greedily only (captioning_epoch_loops.py:39-65);
beam search and sampling are beyond-reference capabilities sharing the
same KV-cached single-jit loop (``greedy._greedy_core``). Sampling is the
standard recipe for caption diversity: scale logits by 1/temperature,
restrict to the top-k tokens and/or the smallest nucleus whose probability
mass exceeds top_p, then draw categorically.

Determinism: the whole decode is one jitted ``lax.while_loop``; the
per-step key is ``fold_in(rng, step)``, so a (seed, batch) pair always
reproduces the same captions.
'''
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from bmt_tpu.decode.greedy import (_greedy_core, bimodal_step_setup,
                                   unimodal_step_setup)
from bmt_tpu.models.captioning import CapModelDims

_NEG_INF = float('-inf')
# nucleus support cap: top_p sorts only the top-k'd slice (see
# filter_logits); 512 of a 10172 vocab covers any peaked caption
# distribution while keeping the per-step cost near the plain top_k path
_TOP_P_SUPPORT = 512


def filter_logits(log_probs: jnp.ndarray, top_k: int = 0,
                  top_p: float = 1.0) -> jnp.ndarray:
    '''Mask a (B, V) log-prob row-set down to the sampling support.

    top_k > 0: keep only the k highest-scoring tokens per row (value
    threshold at the k-th score, so exact ties with it survive — the same
    semantics as the HF implementation; k is clamped to V).
    top_p < 1: nucleus — keep the smallest descending-probability prefix
    whose cumulative mass exceeds top_p (always at least one token;
    index-exact: the cut happens at a sorted position, not a value, so
    tied boundary scores do not widen the nucleus).
    Both filters compose (intersection).
    '''
    filtered = log_probs.astype(jnp.float32)
    V = filtered.shape[-1]
    if top_k and top_k > 0:
        kth = jax.lax.top_k(filtered, min(top_k, V))[0][:, -1:]   # (B, 1)
        filtered = jnp.where(filtered < kth, _NEG_INF, filtered)
    if top_p < 1.0:
        # A full-vocab sort inside the decode loop is ~24x the whole
        # greedy step on TPU (argsort over (B, 10172) x 30 steps). The
        # nucleus never needs more than a few hundred tokens in practice,
        # so restrict to the top `support` by partial top_k (cheap) and
        # sort only that slice. Probabilities come from the FULL-vocab
        # softmax gathered on the slice (not a slice-renormalized one),
        # so the cumulative mass is absolute and the cut is exact
        # whenever the nucleus fits in `support`; beyond that the filter
        # degrades to combined top-k(support) + nucleus, which only
        # matters for near-uniform distributions at top_p ~ 1.
        support = min(_TOP_P_SUPPORT, V)
        top_lp, top_idx = jax.lax.top_k(filtered, support)   # (B, s) desc
        lse = jax.scipy.special.logsumexp(filtered, axis=-1, keepdims=True)
        probs = jnp.exp(top_lp - lse)
        csum = jnp.cumsum(probs, axis=-1)
        # sorted position i is OUT when the mass strictly before it
        # already exceeds top_p (so the arg-max token always stays in)
        cut = (csum - probs) > top_p
        rows = jnp.arange(filtered.shape[0])[:, None]
        keep = jnp.zeros(filtered.shape, bool).at[rows, top_idx].set(~cut)
        filtered = jnp.where(keep, filtered, _NEG_INF)
    return filtered


def make_sample_select_fn(rng, temperature: float = 1.0, top_k: int = 0,
                          top_p: float = 1.0):
    '''Per-step stochastic selector for ``_greedy_core``.'''
    if temperature <= 0:
        raise ValueError(
            f'temperature must be > 0, got {temperature} (use greedy '
            f'decoding for argmax behaviour)')
    t = float(temperature)

    def select(log_probs, step):
        key = jax.random.fold_in(rng, step)
        logits = filter_logits(log_probs.astype(jnp.float32) / t,
                               top_k, top_p)
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)

    return select


@partial(jax.jit, static_argnames=('dims', 'max_len', 'start_idx',
                                   'end_idx', 'pad_idx', 'temperature',
                                   'top_k', 'top_p', 'attention_impl',
                                   'kv_int8'))
def sample_decode_bimodal(params, dims: CapModelDims, feature_stacks: dict,
                          rng, max_len: int, start_idx: int, end_idx: int,
                          pad_idx: int, temperature: float = 1.0,
                          top_k: int = 0, top_p: float = 1.0,
                          attention_impl: str = 'xla',
                          kv_int8: bool = False):
    '''KV-cached stochastic decode; same interface/shape contract as
    ``greedy_decode_bimodal`` plus an explicit PRNG key.'''
    state, step_closure, B = bimodal_step_setup(
        params, dims, feature_stacks, pad_idx, max_len, attention_impl,
        kv_int8)
    select = make_sample_select_fn(rng, temperature, top_k, top_p)
    return _greedy_core(step_closure, state, B, max_len, start_idx,
                        end_idx, select_fn=select)


@partial(jax.jit, static_argnames=('dims', 'max_len', 'start_idx',
                                   'end_idx', 'pad_idx', 'temperature',
                                   'top_k', 'top_p', 'attention_impl',
                                   'kv_int8'))
def sample_decode_unimodal(params, dims: CapModelDims, feature_stacks: dict,
                           rng, max_len: int, start_idx: int, end_idx: int,
                           pad_idx: int, temperature: float = 1.0,
                           top_k: int = 0, top_p: float = 1.0,
                           attention_impl: str = 'xla',
                           kv_int8: bool = False):
    '''Uni-modal (audio-only / video-only ablation) stochastic decode;
    same single-jit KV-cached loop as ``greedy_decode_unimodal``.'''
    state, step_closure, B = unimodal_step_setup(
        params, dims, feature_stacks, pad_idx, max_len, attention_impl,
        kv_int8)
    select = make_sample_select_fn(rng, temperature, top_k, top_p)
    return _greedy_core(step_closure, state, B, max_len, start_idx,
                        end_idx, select_fn=select)


def make_bimodal_sample_fn(dims: CapModelDims, max_len: int, start_idx: int,
                           end_idx: int, pad_idx: int,
                           temperature: float = 1.0, top_k: int = 0,
                           top_p: float = 1.0, attention_impl: str = 'xla',
                           kv_int8: bool = False, seed: int = 0):
    '''Bind statics; returns fn(params, feature_stacks) matching the
    greedy/beam decoder interface for the validation loops. Each call
    advances an internal counter folded into the key, so successive
    batches draw fresh (but per-run reproducible) samples. Dispatches by
    ``dims.modality`` internally (like ``make_bimodal_beam_fn``), so the
    uni-modal ablation models sample through the same entry point.'''
    base = jax.random.PRNGKey(seed)
    counter = [0]
    decode = (sample_decode_bimodal if dims.modality == 'audio_video'
              else sample_decode_unimodal)

    def fn(params, feature_stacks):
        key = jax.random.fold_in(base, counter[0])
        counter[0] += 1
        return decode(
            params, dims, feature_stacks, key, max_len, start_idx,
            end_idx, pad_idx, temperature, top_k, top_p, attention_impl,
            kv_int8)
    return fn
