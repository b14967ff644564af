'''Gradient parity of the fused attention custom VJP vs the XLA path.'''
import numpy as np
import jax
import jax.numpy as jnp

from bmt_tpu.ops.attention import scaled_dot_attention
from bmt_tpu.ops.pallas_attention import flash_attention
from bmt_tpu.ops.masks import subsequent_mask


def _loss(attn_fn, q, k, v, m):
    out = attn_fn(q, k, v, m)
    return jnp.sum(jnp.where(jnp.isnan(out), 0.0, out) ** 2)


def test_flash_attention_grads_match_xla(rng):
    B, H, S, d = 2, 2, 6, 8
    q = jnp.asarray(rng.normal(size=(B, H, S, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, S, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, S, d)), jnp.float32)
    pad = np.ones((B, 1, S), bool)
    pad[1, 0, 4:] = False
    causal = np.asarray(subsequent_mask(S))
    m = jnp.asarray((pad[:, :, None, :] & causal[None])[:, 0])[:, None]

    g_ref = jax.grad(lambda *a: _loss(scaled_dot_attention, *a, m),
                     argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(lambda *a: _loss(flash_attention, *a, m),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_flash_attention_grads_key_padding_only(rng):
    B, H, Sq, Sk, d = 1, 2, 4, 7, 8
    q = jnp.asarray(rng.normal(size=(B, H, Sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, Sk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, Sk, d)), jnp.float32)
    m_np = np.ones((B, 1, 1, Sk), bool)
    m_np[..., 5:] = False
    m = jnp.asarray(m_np)

    g_ref = jax.grad(lambda *a: _loss(scaled_dot_attention, *a, m),
                     argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(lambda *a: _loss(flash_attention, *a, m),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def _grads(fn, q, k, v, m):
    return jax.grad(lambda *a: _loss(fn, *a, m), argnums=(0, 1, 2))(q, k, v)


def test_tiled_backward_grads_match_xla(rng):
    '''The tiled Pallas backward (forced via block_k) must reproduce the
    XLA attention VJP at non-divisible shapes with key padding.'''
    B, H, Sq, Sk, d = 2, 2, 9, 300, 8
    q = jnp.asarray(rng.normal(size=(B, H, Sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, Sk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, Sk, d)), jnp.float32)
    m_np = np.ones((B, 1, 1, Sk), bool)
    m_np[1, ..., 250:] = False
    m = jnp.asarray(m_np)

    g_ref = _grads(scaled_dot_attention, q, k, v, m)
    g_til = _grads(lambda q, k, v, m: flash_attention(q, k, v, m,
                                                      block_k=128),
                   q, k, v, m)
    for a, b in zip(g_ref, g_til):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)


def test_tiled_backward_grads_causal(rng):
    B, H, S, d = 1, 2, 10, 8
    q = jnp.asarray(rng.normal(size=(B, H, S, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, S, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, S, d)), jnp.float32)
    pad = np.ones((B, 1, S), bool)
    pad[0, 0, 7:] = False
    causal = np.asarray(subsequent_mask(S))
    m = jnp.asarray((pad[:, :, None, :] & causal[None])[:, 0])[:, None]

    g_ref = _grads(scaled_dot_attention, q, k, v, m)
    g_til = _grads(lambda q, k, v, m: flash_attention(q, k, v, m,
                                                      block_k=128),
                   q, k, v, m)
    for a, b in zip(g_ref, g_til):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)


def test_tiled_backward_fully_masked_row(rng):
    '''A batch row with zero valid keys: forward NaN (parity), backward
    must produce zero (not NaN) grads for that row, like the XLA path.'''
    B, H, Sq, Sk, d = 2, 1, 4, 140, 8
    q = jnp.asarray(rng.normal(size=(B, H, Sq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, Sk, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, Sk, d)), jnp.float32)
    m_np = np.ones((B, 1, 1, Sk), bool)
    m_np[0] = False                       # batch row 0: nothing to attend
    m = jnp.asarray(m_np)

    g_ref = _grads(scaled_dot_attention, q, k, v, m)
    g_til = _grads(lambda q, k, v, m: flash_attention(q, k, v, m,
                                                      block_k=128),
                   q, k, v, m)
    for a, b in zip(g_ref, g_til):
        # the plain-XLA path propagates NaN through the dead row's softmax;
        # the flash VJP (single-block and tiled alike) zeroes it — compare
        # against the NaN-zeroed reference
        a = np.where(np.isnan(np.asarray(a)), 0.0, np.asarray(a))
        assert not np.isnan(np.asarray(b)).any()
        np.testing.assert_allclose(np.asarray(b), a, atol=2e-4)


def test_tiled_backward_multiple_query_blocks(rng):
    '''Sq > block_q exercises nq > 1: the q-axis host padding (pq > 0) and
    the iq*block_q row offsets in both backward kernels.'''
    B, H, S, d = 1, 1, 520, 8                 # block_q=512 -> nq=2, pq=504
    q = jnp.asarray(rng.normal(size=(B, H, S, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, S, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, S, d)), jnp.float32)
    pad = np.ones((B, 1, S), bool)
    pad[0, 0, 500:] = False
    causal = np.asarray(subsequent_mask(S))
    m = jnp.asarray((pad[:, :, None, :] & causal[None])[:, 0])[:, None]

    g_ref = _grads(scaled_dot_attention, q, k, v, m)
    g_til = _grads(lambda q, k, v, m: flash_attention(q, k, v, m,
                                                      block_k=128),
                   q, k, v, m)
    for a, b in zip(g_ref, g_til):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-4)
