'''Training losses.

Label-smoothed KL divergence for captioning, matching the reference exactly
(reference: loss/label_smoothing.py:5-32):

- the smoothed distribution is a uniform prior ``smoothing / (V - 2)`` with
  the ground-truth column *replaced* (not added) by ``1 - smoothing``,
- the pad column is zeroed,
- rows whose target is the pad token are zeroed entirely,
- KL computed against log-prob predictions with ``reduction='sum'``; the
  caller normalizes by the number of non-pad tokens
  (reference: captioning_epoch_loops.py:134-135).
'''
from __future__ import annotations

import jax
import jax.numpy as jnp


def label_smoothing_kl(log_probs: jnp.ndarray, target: jnp.ndarray,
                       smoothing: float, pad_idx: int) -> jnp.ndarray:
    '''log_probs (B, S, V) after log_softmax; target (B, S) int ids.

    Returns the summed KL(dist || exp(log_probs)) over all positions.
    '''
    B, S, V = log_probs.shape
    pred = log_probs.reshape(-1, V).astype(jnp.float32)
    tgt = target.reshape(-1)

    uniform = smoothing / (V - 2)
    dist = jnp.full((B * S, V), uniform, jnp.float32)
    # scatter_(1, target, 1-smoothing) *replaces* the target column
    dist = dist.at[jnp.arange(B * S), tgt].set(1.0 - smoothing)
    # pad column has zero probability
    dist = dist.at[:, pad_idx].set(0.0)
    # rows whose target is the pad token are zeroed
    row_valid = (tgt != pad_idx)[:, None]
    dist = jnp.where(row_valid, dist, 0.0)

    # F.kl_div(pred, dist, reduction='sum') = sum dist * (log(dist) - pred)
    # with the convention 0 * log(0) = 0
    log_dist = jnp.where(dist > 0, jnp.log(jnp.maximum(dist, 1e-30)), 0.0)
    kl = dist * (log_dist - pred)
    kl = jnp.where(dist > 0, kl, 0.0)
    return jnp.sum(kl)


def caption_loss(log_probs: jnp.ndarray, target: jnp.ndarray,
                 smoothing: float, pad_idx: int) -> jnp.ndarray:
    '''Per-token-normalized caption loss as used in the training loop
    (reference: captioning_epoch_loops.py:130-135).'''
    n_tokens = jnp.sum(target != pad_idx)
    return label_smoothing_kl(log_probs, target, smoothing, pad_idx) / \
        jnp.maximum(n_tokens, 1)
