'''Captioning model assemblies: bi-modal and uni-modal transformers.

Functional re-design of the reference captioners
(reference: model/captioning_module.py:16-187): a model is (dims, params)
where ``dims`` is a static hashable config and ``params`` a pytree; the
forward is a pure function suitable for jit/pjit.

The generator head (Linear -> log_softmax; reference: model/generators.py:4-19)
is folded in here.
'''
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from bmt_tpu.models.decoders import (bimodal_decoder_forward,
                                     bimodal_decoder_step, decoder_forward,
                                     init_bimodal_decoder, init_decoder,
                                     init_decode_state)
from bmt_tpu.models.encoders import (bimodal_encoder_forward, encoder_forward,
                                     init_bimodal_encoder, init_encoder)
from bmt_tpu.ops.layers import (feature_embed, init_feature_embedder,
                                init_linear, init_vocab_embedder, linear,
                                positional_encode, positional_encoding_table,
                                vocabulary_embed)

POS_ENC_LEN = 3660  # reference: model/blocks.py:86


@dataclasses.dataclass(frozen=True)
class CapModelDims:
    '''Static architecture config (hashable -> safe as a jit static arg).'''
    voc_size: int
    d_model_A: int = 128
    d_model_V: int = 1024
    d_model_C: int = 300
    d_model: int = 1024
    H: int = 4
    N: int = 2
    d_ff_A: int = 512      # 4 * d_model_A (reference: config_constructor.py:89)
    d_ff_V: int = 4096     # 4 * d_model_V
    d_ff_C: int = 1200     # 4 * d_model_C
    dout_p: float = 0.1
    use_linear_embedder: bool = False
    d_vid: int = 1024
    d_aud: int = 128
    modality: str = 'audio_video'
    remat: bool = False
    # Switch-MoE FFNs (ops/moe.py): 0/1 = dense (reference behaviour);
    # >1 sparsifies every FFN site (enc A/V, dec C) with top-1 routing.
    # Beyond-reference; experts shard over the mesh's ep axis.
    moe_experts: int = 0
    moe_cf: float = 1.25

    @classmethod
    def from_config(cls, cfg, voc_size: int) -> 'CapModelDims':
        # d_ff_* only exist for the modalities the config was built with
        # (reference: config_constructor.py:86-90)
        d_model_A = getattr(cfg, 'd_model_audio', 128)
        d_model_V = getattr(cfg, 'd_model_video', 1024)
        return cls(
            voc_size=voc_size,
            d_model_A=d_model_A, d_model_V=d_model_V,
            d_model_C=cfg.d_model_caps, d_model=cfg.d_model,
            H=cfg.H, N=cfg.N,
            d_ff_A=getattr(cfg, 'd_ff_audio', 4 * d_model_A),
            d_ff_V=getattr(cfg, 'd_ff_video', 4 * d_model_V),
            d_ff_C=cfg.d_ff_caps,
            dout_p=cfg.dout_p, use_linear_embedder=cfg.use_linear_embedder,
            d_vid=cfg.d_vid, d_aud=cfg.d_aud, modality=cfg.modality,
            remat=getattr(cfg, 'remat', False),
            moe_experts=getattr(cfg, 'moe_experts', 0) or 0,
            moe_cf=getattr(cfg, 'moe_capacity_factor', 1.25),
        )


def _rng_stream(key):
    '''Infinite stream of fresh PRNG keys (deterministic per seed).'''
    if key is None:
        while True:
            yield None
    count = 0
    while True:
        count += 1
        yield jax.random.fold_in(key, count)


# ---------------------------------------------------------------------------
# bi-modal transformer (reference: captioning_module.py:101-187)
# ---------------------------------------------------------------------------

def init_bimodal_transformer(key, dims: CapModelDims,
                             glove: Optional[np.ndarray] = None) -> dict:
    ks = jax.random.split(key, 6)
    params = {
        'emb_C': init_vocab_embedder(ks[0], dims.voc_size, dims.d_model_C,
                                     pretrained=glove),
        'encoder': init_bimodal_encoder(ks[1], dims.d_model_A, dims.d_model_V,
                                        dims.d_model, dims.d_ff_A, dims.d_ff_V,
                                        dims.N, dims.moe_experts),
        'decoder': init_bimodal_decoder(ks[2], dims.d_model_A, dims.d_model_V,
                                        dims.d_model_C, dims.d_model,
                                        dims.d_ff_C, dims.N,
                                        dims.moe_experts),
        'generator': init_linear(ks[3], dims.d_model_C, dims.voc_size),
    }
    if dims.use_linear_embedder:
        params['emb_A'] = init_feature_embedder(ks[4], dims.d_aud, dims.d_model_A)
        params['emb_V'] = init_feature_embedder(ks[5], dims.d_vid, dims.d_model_V)
    return params


def _embed_av(params, dims, src, rngs, deterministic, pe_A, pe_V):
    '''Feature embed + positional encode both modalities.'''
    V = src['rgb'] + src['flow']
    A = src['audio']
    if dims.use_linear_embedder:
        A = feature_embed(params['emb_A'], A, dims.d_model_A)
        V = feature_embed(params['emb_V'], V, dims.d_model_V)
    A = positional_encode(pe_A, A, dims.dout_p, next(rngs), deterministic)
    V = positional_encode(pe_V, V, dims.dout_p, next(rngs), deterministic)
    return A, V


def _pe_tables(dims):
    pe_A = jnp.asarray(positional_encoding_table(POS_ENC_LEN, dims.d_model_A))
    pe_V = jnp.asarray(positional_encoding_table(POS_ENC_LEN, dims.d_model_V))
    pe_C = jnp.asarray(positional_encoding_table(POS_ENC_LEN, dims.d_model_C))
    return pe_A, pe_V, pe_C


def bimodal_encode(params, dims: CapModelDims, src: dict, masks: dict,
                   rng=None, deterministic: bool = True,
                   attention_impl: str = 'xla'):
    '''Run embeddings + the bi-modal encoder; returns (Av, Va).'''
    rngs = _rng_stream(rng)
    # only the modality tables: staging the unused (3660, d_model_C) pe_C
    # constant would cost a device transfer per traced bucket shape
    pe_A = jnp.asarray(positional_encoding_table(POS_ENC_LEN, dims.d_model_A))
    pe_V = jnp.asarray(positional_encoding_table(POS_ENC_LEN, dims.d_model_V))
    A, V = _embed_av(params, dims, src, rngs, deterministic, pe_A, pe_V)
    return bimodal_encoder_forward(params['encoder'], A, V, masks['A_mask'],
                                   masks['V_mask'], dims.H, dims.dout_p, rngs,
                                   deterministic, attention_impl, dims.remat)


def bimodal_transformer_forward(params, dims: CapModelDims, src: dict,
                                trg: jnp.ndarray, masks: dict, rng=None,
                                deterministic: bool = True,
                                attention_impl: str = 'xla',
                                return_logits: bool = False,
                                aux_out=None) -> jnp.ndarray:
    '''Full teacher-forced forward -> (B, Sc, voc_size) log-probs.

    Reference: captioning_module.py:164-187.

    ``return_logits=True`` stops at the compute-dtype LOGITS (no fp32
    log_softmax): the train loss computes its own row logsumexp
    (losses.label_smoothing_kl_logits), avoiding a (B, Sc, V) fp32
    materialization — measured 1.3 ms of a 13 ms flagship train step.
    '''
    rngs = _rng_stream(rng)
    pe_A, pe_V, pe_C = _pe_tables(dims)

    A, V = _embed_av(params, dims, src, rngs, deterministic, pe_A, pe_V)
    C = vocabulary_embed(params['emb_C'], trg, dims.d_model_C)
    C = positional_encode(pe_C, C, dims.dout_p, next(rngs), deterministic)

    Av, Va = bimodal_encoder_forward(params['encoder'], A, V, masks['A_mask'],
                                     masks['V_mask'], dims.H, dims.dout_p,
                                     rngs, deterministic, attention_impl,
                                     dims.remat, aux_out, dims.moe_cf)
    C = bimodal_decoder_forward(params['decoder'], C, Av, Va, masks['A_mask'],
                                masks['V_mask'], masks['C_mask'], dims.H,
                                dims.dout_p, rngs, deterministic,
                                attention_impl, aux_out, dims.moe_cf)
    logits = linear(params['generator'], C)
    if return_logits:
        return logits
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def bimodal_decode_init(params, dims: CapModelDims, Av, Va, max_len: int,
                        kv_int8: bool = False, cache_batch: int | None = None,
                        A_mask=None, V_mask=None):
    '''Allocate the KV-cache decode state from encoder memories.'''
    return init_decode_state(params['decoder'], Av, Va, dims.H, max_len,
                             dtype=Av.dtype, kv_int8=kv_int8,
                             cache_batch=cache_batch, A_mask=A_mask,
                             V_mask=V_mask)


def bimodal_decode_step(params, dims: CapModelDims, state, token, step,
                        A_mask, V_mask, attention_impl: str = 'xla'):
    '''One greedy-decode step: embed `token` (B, 1) at position `step`,
    advance the decoder, return (log_probs (B, voc), new_state).'''
    # only pe_C: the (3660, 1024) pe_V table would be a ~15 MB unused
    # device constant staged per traced decode bucket
    pe_C = jnp.asarray(positional_encoding_table(POS_ENC_LEN, dims.d_model_C))
    c_t = vocabulary_embed(params['emb_C'], token, dims.d_model_C)
    c_t = positional_encode(pe_C, c_t, offset=step)
    c_t, state = bimodal_decoder_step(params['decoder'], state, c_t, A_mask,
                                      V_mask, step, dims.H, attention_impl)
    logits = linear(params['generator'], c_t[:, 0, :])
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), state


# ---------------------------------------------------------------------------
# uni-modal transformer (reference: captioning_module.py:16-98)
# ---------------------------------------------------------------------------

def _unimodal_d_model(dims: CapModelDims) -> int:
    return dims.d_model_V if dims.modality == 'video' else dims.d_model_A


def unimodal_encode(params, dims: CapModelDims, src: dict, src_mask,
                    attention_impl: str = 'xla'):
    '''Embed + encode the source modality once (deterministic decode path).'''
    if dims.modality == 'audio':
        x = src['audio']
    else:
        x = src['rgb'] + src['flow']
    d_model = _unimodal_d_model(dims)
    if dims.use_linear_embedder:
        x = feature_embed(params['src_emb'], x, d_model)
    pe = jnp.asarray(positional_encoding_table(POS_ENC_LEN, d_model))
    x = positional_encode(pe, x)
    return encoder_forward(params['encoder'], x, src_mask, dims.H,
                           attention_impl=attention_impl)


def unimodal_decode_init(params, dims: CapModelDims, memory, max_len: int,
                         kv_int8: bool = False,
                         cache_batch: int | None = None, src_mask=None):
    from bmt_tpu.models.decoders import init_unimodal_decode_state
    return init_unimodal_decode_state(params['decoder'], memory, dims.H,
                                      max_len, dtype=memory.dtype,
                                      kv_int8=kv_int8,
                                      cache_batch=cache_batch,
                                      src_mask=src_mask)


def unimodal_decode_step(params, dims: CapModelDims, state, token, step,
                         src_mask, attention_impl: str = 'xla'):
    from bmt_tpu.models.decoders import unimodal_decoder_step
    d_model = _unimodal_d_model(dims)
    pe = jnp.asarray(positional_encoding_table(POS_ENC_LEN, d_model))
    c_t = vocabulary_embed(params['trg_emb'], token, d_model)
    c_t = positional_encode(pe, c_t, offset=step)
    c_t, state = unimodal_decoder_step(params['decoder'], state, c_t,
                                       src_mask, step, dims.H, attention_impl)
    logits = linear(params['generator'], c_t[:, 0, :])
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), state


def init_unimodal_transformer(key, dims: CapModelDims,
                              glove: Optional[np.ndarray] = None) -> dict:
    '''Uni-modal captioner: shares d_model between src features and captions
    (reference: captioning_module.py:22-41 — trg_emb uses the *modality*
    d_model, not d_model_caps).'''
    d_model = _unimodal_d_model(dims)
    d_ff = dims.d_ff_V if dims.modality == 'video' else dims.d_ff_A
    d_feat = dims.d_vid if dims.modality == 'video' else dims.d_aud
    ks = jax.random.split(key, 5)
    params = {
        'trg_emb': init_vocab_embedder(ks[0], dims.voc_size, d_model,
                                       pretrained=glove),
        'encoder': init_encoder(ks[1], d_model, d_ff, dims.N,
                                dims.moe_experts),
        'decoder': init_decoder(ks[2], d_model, d_ff, dims.N,
                                dims.moe_experts),
        'generator': init_linear(ks[3], d_model, dims.voc_size),
    }
    if dims.use_linear_embedder:
        params['src_emb'] = init_feature_embedder(ks[4], d_feat, d_model)
    return params


def unimodal_transformer_forward(params, dims: CapModelDims, src: dict,
                                 trg: jnp.ndarray, masks: dict, rng=None,
                                 deterministic: bool = True,
                                 attention_impl: str = 'xla',
                                 return_logits: bool = False,
                                 aux_out=None) -> jnp.ndarray:
    '''Reference: captioning_module.py:71-98. ``return_logits`` as in
    ``bimodal_transformer_forward``.'''
    rngs = _rng_stream(rng)
    if dims.modality == 'audio':
        x = src['audio']
        src_mask = masks['A_mask']
    elif dims.modality == 'video':
        x = src['rgb'] + src['flow']
        src_mask = masks['V_mask']
    else:
        raise ValueError(dims.modality)
    d_model = _unimodal_d_model(dims)
    trg_mask = masks['C_mask']

    pe = jnp.asarray(positional_encoding_table(POS_ENC_LEN, d_model))
    if dims.use_linear_embedder:
        x = feature_embed(params['src_emb'], x, d_model)
    t = vocabulary_embed(params['trg_emb'], trg, d_model)
    x = positional_encode(pe, x, dims.dout_p, next(rngs), deterministic)
    t = positional_encode(pe, t, dims.dout_p, next(rngs), deterministic)

    memory = encoder_forward(params['encoder'], x, src_mask, dims.H,
                             dims.dout_p, rngs, deterministic, attention_impl,
                             aux_out, dims.moe_cf)
    out = decoder_forward(params['decoder'], t, memory, src_mask, trg_mask,
                          dims.H, dims.dout_p, rngs, deterministic,
                          attention_impl, aux_out, dims.moe_cf)
    logits = linear(params['generator'], out)
    if return_logits:
        return logits
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
