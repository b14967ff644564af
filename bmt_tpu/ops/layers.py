'''Core building-block layers as pure functions over parameter pytrees.

Functional re-design of the reference blocks (reference: model/blocks.py:10-174):
no module objects, no in-place state — parameters are nested dicts of
``jnp.ndarray`` and every forward is a pure function, jit/vmap/pjit friendly.

Initialization mirrors the reference recipe: xavier-uniform for every weight
matrix (reference: model/captioning_module.py:139-142), PyTorch's default
uniform fan-in bound for linear biases, ones/zeros for LayerNorm.
'''
from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def xavier_uniform(key, shape, dtype=jnp.float32):
    '''Xavier/Glorot uniform for a (fan_in, fan_out) matrix.'''
    fan_in, fan_out = shape[0], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_uniform(key, fan_in, shape, dtype=jnp.float32):
    '''PyTorch nn.Linear default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).'''
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def init_linear(key, d_in: int, d_out: int, dtype=jnp.float32) -> dict:
    kw, kb = jax.random.split(key)
    return {
        'w': xavier_uniform(kw, (d_in, d_out), dtype),
        'b': torch_bias_uniform(kb, d_in, (d_out,), dtype),
    }


def linear_base(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    '''The base affine map only — no LoRA delta. Callers that fuse
    adapter deltas across sites (ops/lora.py:shared_lora_deltas) apply
    them on top of this.'''
    if 'w_q' in params:
        # weight-only int8 leaf (ops/quant.py): every linear in the model
        # funnels through here, so quantizing a param subtree transparently
        # switches MHA projections, FFNs, bridges, adapters and the LM head
        # to the int8 MXU path — no call-site changes
        from bmt_tpu.ops.quant import qlinear
        return qlinear(params, x)
    return x @ params['w'] + params['b']


def linear(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = linear_base(params, x)
    if 'lora_a' in params:
        # LoRA leaf (ops/lora.py): frozen base + rank-r trainable delta,
        # two skinny matmuls fused by XLA next to the base GEMM
        delta = ((x @ params['lora_a']) @ params['lora_b']) * params['lora_s']
        y = y + delta.astype(y.dtype)
    return y


def init_layer_norm(d: int, dtype=jnp.float32) -> dict:
    return {'scale': jnp.ones((d,), dtype), 'bias': jnp.zeros((d,), dtype)}


def layer_norm(params: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    '''LayerNorm over the last dim (matches torch.nn.LayerNorm, eps=1e-5).'''
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * params['scale'] + params['bias']).astype(x.dtype)


# ---------------------------------------------------------------------------
# dropout
# ---------------------------------------------------------------------------

def dropout(x: jnp.ndarray, rate: float, rng, deterministic: bool) -> jnp.ndarray:
    '''Inverted dropout. No-op when deterministic or rate == 0.

    Masks are 16-bit integer-threshold draws rather than
    ``jax.random.bernoulli``: bernoulli materializes a uint32 bit tensor
    per site (and, at the flagship train shapes, a same-size layout copy
    of it on the way into its float-uniform compare) — measured as the
    train forward's single largest HBM line item (~470 MB of u32 writes
    per step, docs/DESIGN.md §6b; the step is bandwidth-bound, so those
    bytes are wall-clock). u16 bits halve the materialized bytes and
    skip the float conversion. The realized keep probability is
    ``round(keep * 2^16) / 2^16`` — within 8e-6 absolute of the
    requested rate (torch's own float32-uniform comparison is quantized
    too, at 2^-24), and the TPU hardware RNG ('rbg', the trainers'
    default) emits u16 natively so generation cost is unchanged.'''
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    bits = jax.random.bits(rng, x.shape, jnp.uint16)
    mask_ = bits < jnp.uint16(min(round(keep * 65536.0), 65535))
    return jnp.where(mask_, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# positionwise feed-forward (reference: model/blocks.py:156-174)
# ---------------------------------------------------------------------------

def init_ffn(key, d_model: int, d_ff: int, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {'fc1': init_linear(k1, d_model, d_ff, dtype),
            'fc2': init_linear(k2, d_ff, d_model, dtype)}


def feed_forward(params: dict, x: jnp.ndarray, dout_p: float = 0.0,
                 rng=None, deterministic: bool = True) -> jnp.ndarray:
    h = jax.nn.relu(linear(params['fc1'], x))
    h = dropout(h, dout_p, rng, deterministic)
    return linear(params['fc2'], h)


# ---------------------------------------------------------------------------
# pre-norm residual connection (reference: model/blocks.py:123-136)
# ---------------------------------------------------------------------------

def residual(ln_params: dict, x: jnp.ndarray, sublayer, dout_p: float = 0.0,
             rng=None, deterministic: bool = True) -> jnp.ndarray:
    '''x + dropout(sublayer(LN(x))).'''
    res = sublayer(layer_norm(ln_params, x))
    res = dropout(res, dout_p, rng, deterministic)
    return x + res


# ---------------------------------------------------------------------------
# bridge connection (reference: model/blocks.py:139-153): LN -> Linear -> dropout -> ReLU
# ---------------------------------------------------------------------------

def init_bridge(key, d_in: int, d_out: int, dtype=jnp.float32) -> dict:
    return {'norm': init_layer_norm(d_in, dtype),
            'linear': init_linear(key, d_in, d_out, dtype)}


def bridge(params: dict, x: jnp.ndarray, dout_p: float = 0.0,
           rng=None, deterministic: bool = True) -> jnp.ndarray:
    x = layer_norm(params['norm'], x)
    x = linear(params['linear'], x)
    x = dropout(x, dout_p, rng, deterministic)
    return jax.nn.relu(x)


# ---------------------------------------------------------------------------
# sinusoidal positional encoding (reference: model/blocks.py:84-107)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=16)
def positional_encoding_table(seq_len: int, d_model: int) -> np.ndarray:
    '''Reproduces the reference table exactly, including its non-standard
    exponent convention: pe[pos, j] = sin(pos / 10000^(j/d)) for even j and
    cos(pos / 10000^(j/d)) for odd j (the cos exponent uses the *odd* index,
    unlike Vaswani et al.). Reference: model/blocks.py:91-98.
    '''
    pos = np.arange(seq_len, dtype=np.float64)[:, None]          # (S, 1)
    j = np.arange(d_model, dtype=np.float64)[None, :]            # (1, D)
    angle = pos / np.power(10000.0, j / d_model)                 # (S, D)
    table = np.where(j % 2 == 0, np.sin(angle), np.cos(angle))
    return table.astype(np.float32)


def positional_encode(table: jnp.ndarray, x: jnp.ndarray, dout_p: float = 0.0,
                      rng=None, deterministic: bool = True,
                      offset: int = 0) -> jnp.ndarray:
    '''x + PE[offset:offset+S]; dropout after. ``offset`` supports step-wise
    decoding with a KV cache (position of the current token).'''
    S = x.shape[-2]
    pe = jax.lax.dynamic_slice_in_dim(table, offset, S, axis=0)
    x = x + pe.astype(x.dtype)
    return dropout(x, dout_p, rng, deterministic)


# ---------------------------------------------------------------------------
# embedders (reference: model/blocks.py:33-81)
# ---------------------------------------------------------------------------

def init_vocab_embedder(key, voc_size: int, emb_dim: int,
                        pretrained: np.ndarray | None = None,
                        dtype=jnp.float32) -> dict:
    '''GloVe-initialisable vocabulary embedder.

    When ``pretrained`` has the same width as ``emb_dim`` the table is simply
    replaced (reference: model/blocks.py:53-56). When widths differ, an
    adapter Linear+ReLU follows the frozen table (reference: blocks.py:57-63).
    '''
    k_emb, k_adapter = jax.random.split(key)
    if pretrained is None:
        table = xavier_uniform(k_emb, (voc_size, emb_dim), dtype)
        return {'table': table}
    pretrained = jnp.asarray(pretrained, dtype)
    if pretrained.shape[1] == emb_dim:
        return {'table': pretrained}
    return {'table': pretrained,
            'adapter': init_linear(k_adapter, pretrained.shape[1], emb_dim, dtype)}


def vocabulary_embed(params: dict, tokens: jnp.ndarray, emb_dim: int) -> jnp.ndarray:
    '''tokens (B, S) -> (B, S, emb_dim), scaled by sqrt(emb_dim) after the
    full embedder (lookup, then optional Linear+ReLU adapter), matching the
    reference order (reference: model/blocks.py:42-46, 57-63).
    '''
    x = params['table'][tokens]
    if 'adapter' in params:
        x = jax.nn.relu(linear(params['adapter'], x))
    return x * math.sqrt(emb_dim)


def init_feature_embedder(key, d_feat: int, d_model: int, dtype=jnp.float32) -> dict:
    return {'linear': init_linear(key, d_feat, d_model, dtype)}


def feature_embed(params: dict, x: jnp.ndarray, d_model: int) -> jnp.ndarray:
    '''Linear -> *sqrt(d_model) -> ReLU (reference: model/blocks.py:66-81).'''
    x = linear(params['linear'], x)
    x = x * math.sqrt(d_model)
    return jax.nn.relu(x)
