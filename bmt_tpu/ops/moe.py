'''Mixture-of-Experts positionwise feed-forward (Switch-style top-1 routing).

A beyond-reference capability: the reference's FFN (model/blocks.py:156-174)
is dense; this module provides a drop-in sparse alternative so the framework's
parallelism matrix covers expert parallelism (ep) alongside dp/mp/sp/pp.

Design (TPU-first):
- **GShard dense dispatch**: routing is expressed as two einsums against a
  (B, S, E, C) one-hot dispatch tensor instead of gather/scatter — static
  shapes, MXU-friendly, and GSPMD-shardable. With per-row capacity
  C = ceil(S/E * cf) the dispatch tensor is small (a few MB at BMT shapes)
  and the dispatch FLOPs are ~3% of the expert FLOPs.
- **Top-1 (Switch) routing** with a load-balance auxiliary loss
  aux = E * mean_b sum_e f_be * P_be  (f = dispatch fraction, P = mean router
  prob; Fedus et al. 2021 eq. 4). Callers collect it through an explicit
  ``aux_out`` list — no ambient state, so the forward stays a pure function.
- **Expert parallelism**: expert-stacked weights (E, D, F) are sharded over
  the mesh's ``ep`` axis (parallel/sharding_rules.py); GSPMD turns the
  dispatch/combine einsums into the all-to-all-style collectives, nothing is
  hand-written.
- **Capacity overflow drops to the residual**: tokens beyond an expert's
  capacity produce a zero FFN output, so the surrounding pre-norm residual
  (x + dropout(ffn(LN(x)))) passes them through unchanged — the standard
  Switch behaviour.

Exactness anchor: with n_experts=1 the router's softmax is identically 1.0
and capacity holds every token, so ``moe_feed_forward == feed_forward`` with
the same (unstacked) weights — pinned by tests/test_moe.py.
'''
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from bmt_tpu.ops.layers import dropout, feed_forward, xavier_uniform, \
    torch_bias_uniform


def init_moe_ffn(key, d_model: int, d_ff: int, n_experts: int,
                 dtype=jnp.float32) -> dict:
    '''Router (D, E) + expert-stacked FFN weights (E, D, F) / (E, F, D).

    Each expert is initialized exactly like the dense FFN (xavier weight,
    torch-default bias) from its own key, then stacked on a leading expert
    axis — expert 0 of an E=1 MoE is bit-identical to ``init_ffn``'s fc1/fc2.
    '''
    k_router, k_exp = jax.random.split(key)
    exp_keys = jax.random.split(k_exp, n_experts)

    def one_expert(k):
        k1w, k1b, k2w, k2b = jax.random.split(k, 4)
        return {
            'w1': xavier_uniform(k1w, (d_model, d_ff), dtype),
            'b1': torch_bias_uniform(k1b, d_model, (d_ff,), dtype),
            'w2': xavier_uniform(k2w, (d_ff, d_model), dtype),
            'b2': torch_bias_uniform(k2b, d_ff, (d_model,), dtype),
        }

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs),
                           *[one_expert(k) for k in exp_keys])
    return {
        # router kept fp32: tiny, and routing decisions should not flip
        # under the bf16 parameter cast of mixed-precision training
        'router': {'w': xavier_uniform(k_router, (d_model, n_experts),
                                       jnp.float32)},
        'experts': stacked,
    }


def moe_feed_forward(params: dict, x: jnp.ndarray, dout_p: float = 0.0,
                     rng=None, deterministic: bool = True,
                     aux_out=None, capacity_factor: float = 1.25
                     ) -> jnp.ndarray:
    '''Top-1 MoE FFN over tokens x (..., S, D) -> (..., S, D).

    Routing/capacity are computed per leading row (group = batch element),
    so a row's outputs do not depend on its batchmates — batch-size
    invariance, which the serving micro-batcher relies on.
    '''
    ex = params['experts']
    E = ex['w1'].shape[0]
    squeeze = x.ndim == 2
    if squeeze:                     # (S, D) -> (1, S, D)
        x = x[None]
    B, S, D = x.shape
    dt = x.dtype

    # --- routing (fp32 for stable argmax/softmax under bf16 activations)
    logits = x.astype(jnp.float32) @ params['router']['w']       # (B,S,E)
    probs = jax.nn.softmax(logits, axis=-1)
    e_star = jnp.argmax(probs, axis=-1)                          # (B,S)
    gate = jnp.max(probs, axis=-1)                               # (B,S)
    onehot_e = jax.nn.one_hot(e_star, E, dtype=jnp.float32)      # (B,S,E)

    if aux_out is not None:
        # Switch load-balance loss: E * mean_b sum_e f_be * P_be.
        # Perfectly uniform routing gives exactly 1.0.
        f = jnp.mean(onehot_e, axis=1)                           # (B,E)
        P = jnp.mean(probs, axis=1)                              # (B,E)
        aux_out.append(jnp.mean(jnp.sum(f * P, axis=-1)) * E)

    if deterministic:
        # LOSSLESS inference routing (eval capacity = infinity). The
        # capacity-dispatch form below drops tokens as a function of the
        # whole prefix, which would make the teacher-forced forward and
        # the KV-cached one-token-at-a-time decode disagree; with no
        # drops the MoE output is strictly per-token, so cached decode
        # == uncached decode exactly (tests/test_moe.py). Costs E x the
        # dense FFN FLOPs — a deliberate exactness-over-speed trade on
        # the (small) decode FFN; no (B,S,E,C) tensor is materialized.
        y = jnp.zeros_like(x)
        for e in range(E):
            h = jax.nn.relu(x @ ex['w1'][e].astype(dt)
                            + ex['b1'][e].astype(dt))
            out_e = h @ ex['w2'][e].astype(dt) + ex['b2'][e].astype(dt)
            sel = (onehot_e[..., e] * gate).astype(dt)[..., None]
            y = y + sel * out_e
        return y[0] if squeeze else y

    # --- training: GShard capacity dispatch -> expert FFN -> combine
    # (all MXU einsums; overflow tokens drop to the residual)
    C = max(1, min(S, math.ceil(S / E * capacity_factor)))
    # position of each token within its expert's queue (per row);
    # one_hot maps out-of-range (dropped / not-selected) positions to zero
    pos = jnp.cumsum(onehot_e, axis=1) * onehot_e - 1.0          # (B,S,E)
    dispatch = onehot_e[..., None] * jax.nn.one_hot(
        pos.astype(jnp.int32), C, dtype=jnp.float32)             # (B,S,E,C)

    xin = jnp.einsum('bsec,bsd->ebcd', dispatch.astype(dt), x)   # (E,B,C,D)
    h = jax.nn.relu(
        jnp.einsum('ebcd,edf->ebcf', xin, ex['w1'].astype(dt))
        + ex['b1'].astype(dt)[:, None, None, :])
    h = dropout(h, dout_p, rng, deterministic)
    out = (jnp.einsum('ebcf,efd->ebcd', h, ex['w2'].astype(dt))
           + ex['b2'].astype(dt)[:, None, None, :])
    combine = (dispatch * gate[..., None, None]).astype(dt)
    y = jnp.einsum('bsec,ebcd->bsd', combine, out)
    return y[0] if squeeze else y


def ffn_apply(params: dict, x: jnp.ndarray, dout_p: float = 0.0, rng=None,
              deterministic: bool = True, aux_out=None,
              capacity_factor: float = 1.25) -> jnp.ndarray:
    '''Dense/MoE FFN dispatch on the parameter structure — every FFN call
    site in the models funnels through here, so swapping a param subtree
    for ``init_moe_ffn`` output transparently sparsifies that layer.'''
    if 'router' in params:
        return moe_feed_forward(params, x, dout_p, rng, deterministic,
                                aux_out, capacity_factor)
    return feed_forward(params, x, dout_p, rng, deterministic)
