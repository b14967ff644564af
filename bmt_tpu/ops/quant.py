'''Weight-only int8 quantization for the inference path.

TPU-native rationale: the KV-cached decode step is HBM-bound on its WEIGHT
reads — per generated token every decoder projection, bridge, FFN and the
(d_model_C x voc_size) LM head stream from HBM while the per-token compute
is tiny. Storing those weights int8 with per-output-channel scales halves
that traffic, and quantizing the activations per row on the fly lets the
matmul run int8 x int8 -> int32 on the MXU (2x the bf16 MACs/cycle on v5e).
This composes with ``--kv_cache_int8`` (ops/attention.py:_quantize_per_channel),
which covers the OTHER decode HBM stream, the cross-attention cache.

The reference has no quantized inference at all (its decode re-runs the
full fp32 model on the growing prefix each step: reference
epoch_loops/captioning_epoch_loops.py:39-65); this is a beyond-reference
serving feature, opt-in via ``--weights_int8`` and off by default to keep
decode parity exact.

Scheme (standard weight-only dynamic quantization):
  weights, offline:  w_scale[j] = max_i |w[i, j]| / 127
                     w_q = round(w / w_scale)            int8, per-column
  activations, per call: x_scale[r] = max_c |x[r, c]| / 127 (row-wise)
                     x_q = round(x / x_scale)            int8
  y = (x_q @ w_q) * x_scale * w_scale + b                int32 accumulate

Both quantizations are symmetric (no zero points), so the int32 accumulator
needs no correction terms. Error is bounded by one quantization step per
operand: ~0.8% relative on xavier-initialized weights, small enough that
greedy argmax decisions on a trained model flip only on near-ties.

Inference-only: ``round`` has no useful gradient and the training step
never sees quantized trees. Quantized leaves use keys ('w_q', 'w_scale')
so the parallel layer's name-based sharding rules simply fall through to
replication — serve quantized models on a dp mesh (the intended serving
layout), not mp.
'''
from __future__ import annotations

import jax
import jax.numpy as jnp

# smallest representable scale guard: an all-zero row/column quantizes to
# zeros instead of dividing by zero
_EPS = 1e-12


def quantize_linear_int8(p: dict) -> dict:
    '''{'w' (d_in, d_out), 'b'} -> {'w_q' int8, 'w_scale' f32 (d_out,), 'b'}.

    Per-output-channel symmetric scales: each column j of w is mapped onto
    [-127, 127] independently, so wide and narrow output channels keep
    their own precision (per-tensor scales lose ~2 bits on xavier fans).
    '''
    w = jnp.asarray(p['w'], jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), _EPS) / 127.0
    w_q = jnp.round(w / scale).astype(jnp.int8)
    return {'w_q': w_q, 'w_scale': scale, 'b': p['b']}


def qlinear(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    '''int8 x int8 -> int32 linear with dynamic per-row activation scales.

    Matches ``layers.linear`` semantics (y = x @ w + b) within quantization
    error; output dtype follows x. Leading dims of x are arbitrary.
    '''
    x32 = x.astype(jnp.float32)
    x_scale = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True),
                          _EPS) / 127.0
    x_q = jnp.round(x32 / x_scale).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, p['w_q'],
        (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * x_scale * p['w_scale'] + p['b']
    return y.astype(x.dtype)


def is_linear_leaf(node) -> bool:
    '''The ONE definition of "a plain linear param dict" — shared by the
    quantizer and the LoRA adapter placement (ops/lora.py) so the two tree
    walks can never drift on what counts as a linear.'''
    return (isinstance(node, dict) and set(node) == {'w', 'b'}
            and getattr(node['w'], 'ndim', 0) == 2)


_is_linear_leaf = is_linear_leaf


def quantize_tree_int8(params, skip=()):
    '''Quantize every linear ({'w','b'} 2-D) sub-dict of a param pytree.

    ``skip``: top-level keys left untouched (e.g. 'emb_C' to keep the
    embedding gather + its GloVe adapter full precision). Embedding tables,
    LayerNorms, anchors etc. do not match the linear signature and pass
    through unchanged. Returns a new tree; the input is not mutated.
    '''
    def walk(node):
        if isinstance(node, dict) and 'lora_a' in node and 'w' in node:
            # LoRA-adapted linear: fold the adapter into the base weight
            # first (ops/lora.py), then quantize the merged matrix
            from bmt_tpu.ops.lora import merge_linear_lora
            node = merge_linear_lora(node)
        if _is_linear_leaf(node):
            return quantize_linear_int8(node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return {k: (v if k in skip else walk(v)) for k, v in params.items()}


def count_quantized(params) -> int:
    '''Number of quantized linear leaves in a tree (for logging/tests).'''
    n = 0
    for leaf in jax.tree.leaves(
            params, is_leaf=lambda x: isinstance(x, dict) and 'w_q' in x):
        if isinstance(leaf, dict) and 'w_q' in leaf:
            n += 1
    return n


def linear_out_dim(p: dict) -> int:
    '''Output width of a linear param dict, full-precision or quantized.'''
    return (p['w_q'] if 'w_q' in p else p['w']).shape[1]
