'''Parity tests: full bimodal forward vs torch mirror; cached vs uncached
greedy decode; label-smoothing loss vs torch.'''
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from bmt_tpu.models import (CapModelDims, init_bimodal_transformer,
                            bimodal_transformer_forward)
from bmt_tpu.decode import greedy_decode_bimodal, greedy_decode_uncached
from bmt_tpu.ops.masks import make_masks
from bmt_tpu.train import label_smoothing_kl
from tests.torch_ref import t_bimodal_transformer, t_label_smoothing

SMALL = CapModelDims(voc_size=23, d_model_A=8, d_model_V=12, d_model_C=10,
                     d_model=16, H=2, N=2, d_ff_A=16, d_ff_V=24, d_ff_C=20,
                     dout_p=0.1)
PAD, START, END = 1, 2, 3

# jit once per process — eager per-op compiles are pathologically slow here
_jit_fwd = jax.jit(partial(bimodal_transformer_forward, dims=SMALL,
                           deterministic=True))
_jit_fwd_train = jax.jit(partial(bimodal_transformer_forward, dims=SMALL,
                                 deterministic=False))


def _small_batch(rng, B=2, Sa=7, Sv=5, Sc=4):
    src = {
        'rgb': rng.normal(size=(B, Sv, SMALL.d_model_V)).astype(np.float32),
        'flow': rng.normal(size=(B, Sv, SMALL.d_model_V)).astype(np.float32),
        'audio': rng.normal(size=(B, Sa, SMALL.d_model_A)).astype(np.float32),
    }
    # simulate feature padding: last rows padded with pad_idx in rgb/audio
    src['rgb'][1, -2:] = PAD
    src['flow'][1, -2:] = 0.0
    src['audio'][1, -3:] = PAD
    trg = rng.integers(4, SMALL.voc_size, size=(B, Sc)).astype(np.int32)
    trg[:, 0] = START
    trg[1, -1] = PAD
    return {k: jnp.asarray(v) for k, v in src.items()}, jnp.asarray(trg)


def test_bimodal_forward_matches_torch(rng):
    params = init_bimodal_transformer(jax.random.PRNGKey(0), SMALL)
    src, trg = _small_batch(rng)
    masks = make_masks(src, trg, 'audio_video', PAD)

    ours = np.asarray(_jit_fwd(params, src=src, trg=trg, masks=masks))
    theirs = t_bimodal_transformer(
        params, SMALL, {k: np.asarray(v) for k, v in src.items()},
        np.asarray(trg), {k: np.asarray(v) for k, v in masks.items()}).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_cached_decode_matches_uncached(rng):
    '''The KV-cached while_loop decoder must produce the same tokens as the
    reference-style full-prefix re-computation.'''
    params = init_bimodal_transformer(jax.random.PRNGKey(1), SMALL)
    src, _ = _small_batch(rng, B=3)
    max_len = 4  # each prefix length is a separate XLA compile for `slow`

    def fwd(stacks, trg, masks):
        return _jit_fwd(params, src=stacks, trg=trg, masks=masks)

    slow = np.asarray(greedy_decode_uncached(fwd, src, max_len, START, END,
                                             PAD, 'audio_video'))
    fast = np.asarray(greedy_decode_bimodal(params, SMALL, src, max_len,
                                            START, END, PAD))
    # compare up to the slow decoder's (possibly early-stopped) length;
    # positions after a row's first END are garbage by design in both
    T = slow.shape[1]
    for b in range(slow.shape[0]):
        row_slow = slow[b].tolist()
        row_fast = fast[b, :T].tolist()
        end_pos = row_slow.index(END) if END in row_slow else len(row_slow)
        assert row_slow[:end_pos + 1] == row_fast[:end_pos + 1], (
            b, row_slow, row_fast)


def test_label_smoothing_matches_torch(rng):
    B, S, V = 2, 5, 11
    logits = rng.normal(size=(B, S, V)).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    target = rng.integers(0, V, size=(B, S))
    target[0, -1] = PAD
    target[1, -2:] = PAD

    ours = float(label_smoothing_kl(jnp.asarray(log_probs),
                                    jnp.asarray(target), 0.7, PAD))
    theirs = float(t_label_smoothing(log_probs, target, 0.7, PAD))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_label_smoothing_zero_smoothing_is_ce(rng):
    '''smoothing=0 reduces to NLL of the target (plus zero prior).'''
    B, S, V = 1, 3, 7
    logits = rng.normal(size=(B, S, V)).astype(np.float32)
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    target = rng.integers(2, V, size=(B, S))
    ours = float(label_smoothing_kl(jnp.asarray(log_probs),
                                    jnp.asarray(target), 0.0, PAD))
    nll = -sum(log_probs[b, s, target[b, s]]
               for b in range(B) for s in range(S))
    np.testing.assert_allclose(ours, nll, rtol=1e-5)


def test_label_smoothing_closed_form_grads_match_dense(rng):
    '''The closed-form KL (losses.py) has the same value AND gradient as
    the dense formulation that materializes the smoothed distribution.'''
    def dense_kl(log_probs, target, smoothing, pad_idx):
        B, S, V = log_probs.shape
        pred = log_probs.reshape(-1, V).astype(jnp.float32)
        tgt = target.reshape(-1)
        uniform = smoothing / (V - 2)
        dist = jnp.full((B * S, V), uniform, jnp.float32)
        dist = dist.at[jnp.arange(B * S), tgt].set(1.0 - smoothing)
        dist = dist.at[:, pad_idx].set(0.0)
        dist = jnp.where((tgt != pad_idx)[:, None], dist, 0.0)
        log_dist = jnp.where(dist > 0, jnp.log(jnp.maximum(dist, 1e-30)), 0.0)
        kl = jnp.where(dist > 0, dist * (log_dist - pred), 0.0)
        return jnp.sum(kl)

    B, S, V = 3, 5, 23
    logits = jnp.asarray(rng.normal(size=(B, S, V)), jnp.float32)
    target = np.asarray(rng.integers(2, V, size=(B, S)), np.int32)
    target[0, -1] = PAD
    target[2, 1:] = PAD

    for smoothing in (0.0, 0.3, 0.7):
        def loss_ours(x, fn=label_smoothing_kl, s=smoothing):
            return fn(jax.nn.log_softmax(x, axis=-1), jnp.asarray(target),
                      s, PAD)

        def loss_dense(x, s=smoothing):
            return dense_kl(jax.nn.log_softmax(x, axis=-1),
                            jnp.asarray(target), s, PAD)

        v1, g1 = jax.value_and_grad(loss_ours)(logits)
        v2, g2 = jax.value_and_grad(loss_dense)(logits)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-6)


def test_dropout_changes_only_in_training(rng):
    params = init_bimodal_transformer(jax.random.PRNGKey(2), SMALL)
    src, trg = _small_batch(rng)
    masks = make_masks(src, trg, 'audio_video', PAD)

    d1 = _jit_fwd(params, src=src, trg=trg, masks=masks)
    d2 = _jit_fwd(params, src=src, trg=trg, masks=masks)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))

    r1 = _jit_fwd_train(params, src=src, trg=trg, masks=masks,
                        rng=jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(d1), np.asarray(r1))


def test_int8_kv_cache_decode_parity(rng):
    '''The int8 cross-attention KV cache must (a) agree with the bf16 path
    on the decoded tokens for a well-separated model and (b) keep the
    per-step log-probs within quantization tolerance.'''
    from bmt_tpu.models.captioning import (bimodal_decode_init,
                                           bimodal_decode_step,
                                           bimodal_encode)

    params = init_bimodal_transformer(jax.random.PRNGKey(4), SMALL)
    src, _ = _small_batch(rng, B=3)
    masks = make_masks(src, None, 'audio_video', PAD)

    Av, Va = jax.jit(partial(bimodal_encode, dims=SMALL,
                             deterministic=True))(params, src=src,
                                                  masks=masks)
    tok = jnp.full((3, 1), START, jnp.int32)

    @partial(jax.jit, static_argnames=('kv_int8',))
    def first_step(params, Av, Va, kv_int8):
        state = bimodal_decode_init(params, SMALL, Av, Va, 4,
                                    kv_int8=kv_int8)
        lp, _ = bimodal_decode_step(params, SMALL, state, tok, 0,
                                    masks['A_mask'], masks['V_mask'])
        return lp

    lp_f = np.asarray(first_step(params, Av, Va, False))
    lp_q = np.asarray(first_step(params, Av, Va, True))
    # log-probs drift only by the int8 quantization noise of the K/V reads
    np.testing.assert_allclose(lp_q, lp_f, atol=0.05)

    # random weights give near-uniform logits — the worst case for argmax
    # stability under quantization noise — so require high agreement, not
    # exact equality (which would be flaky across backends/fma orderings)
    fast = np.asarray(greedy_decode_bimodal(params, SMALL, src, 4, START,
                                            END, PAD))
    quant = np.asarray(greedy_decode_bimodal(params, SMALL, src, 4, START,
                                             END, PAD, kv_int8=True))
    agreement = (quant == fast).mean()
    assert agreement >= 0.9, (agreement, fast, quant)


def test_label_smoothing_logits_form_matches(rng):
    '''The fused logits-form loss equals the log-prob form in value AND
    gradient (it is the same closed form with logsumexp pulled inside).'''
    import jax
    from bmt_tpu.train.losses import (label_smoothing_kl,
                                      label_smoothing_kl_logits)
    B, S, V = 3, 5, 37
    logits = jnp.asarray(rng.normal(size=(B, S, V)) * 3, jnp.float32)
    target = jnp.asarray(rng.integers(0, V, size=(B, S)), jnp.int32)

    def f_ref(lg):
        lp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        return label_smoothing_kl(lp, target, 0.7, PAD)

    def f_fused(lg):
        return label_smoothing_kl_logits(lg, target, 0.7, PAD)

    v_ref, g_ref = jax.value_and_grad(f_ref)(logits)
    v_fus, g_fus = jax.value_and_grad(f_fused)(logits)
    np.testing.assert_allclose(float(v_fus), float(v_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_fus), np.asarray(g_ref),
                               atol=1e-6)

    # bf16 logits (the train compute dtype) stay close in fp32 terms
    lb = logits.astype(jnp.bfloat16)
    np.testing.assert_allclose(float(f_fused(lb)), float(f_ref(lb)),
                               rtol=1e-4)
