'''Padding / causal mask construction.

Semantics match the reference exactly (reference: model/masking.py:3-21 and
epoch_loops/captioning_epoch_loops.py:91-119) including the load-bearing quirk
that feature padding masks are derived from *channel 0* of the feature stack
compared against the vocabulary pad index (~1.0).

Masks are boolean; True = attend, False = masked out.
'''
from __future__ import annotations

import jax.numpy as jnp


def subsequent_mask(size: int) -> jnp.ndarray:
    '''Lower-triangular causal mask of shape (1, size, size).

    Reference: model/masking.py:3-11.
    '''
    return jnp.tril(jnp.ones((1, size, size), dtype=bool))


def pad_mask(src: jnp.ndarray, pad_idx) -> jnp.ndarray:
    '''(B, S) -> (B, 1, S) boolean mask, True where not padding.'''
    return (src != pad_idx)[:, None, :]


def mask(src: jnp.ndarray, trg, pad_idx):
    '''Reference: model/masking.py:14-21.

    src: (B, S) token ids or feature channel-0 values.
    trg: (B, St) token ids or None.
    Returns src_mask (B, 1, S) or (src_mask, trg_mask) where trg_mask is
    (B, St, St) = padding AND causal.
    '''
    src_mask = pad_mask(src, pad_idx)
    if trg is not None:
        trg_pad = (trg != pad_idx)[:, None, :]          # (B, 1, St)
        trg_mask = trg_pad & subsequent_mask(trg.shape[-1])  # (B, St, St)
        return src_mask, trg_mask
    return src_mask


def make_masks(feature_stacks: dict, captions, modality: str, pad_idx) -> dict:
    '''Build the mask dict consumed by the models.

    Reference: epoch_loops/captioning_epoch_loops.py:91-119. Note the quirk:
    visual/audio padding is detected via ``features[:, :, 0] != pad_idx``
    (feature channel 0 against the *vocabulary* pad index).

    feature_stacks keys: 'rgb', 'flow', 'audio' with shapes (B, S, D).
    captions: (B, Sc) int ids or None.
    '''
    masks = {}
    if modality == 'video':
        if captions is None:
            masks['V_mask'] = mask(feature_stacks['rgb'][:, :, 0], None, pad_idx)
        else:
            masks['V_mask'], masks['C_mask'] = mask(
                feature_stacks['rgb'][:, :, 0], captions, pad_idx)
    elif modality == 'audio':
        if captions is None:
            masks['A_mask'] = mask(feature_stacks['audio'][:, :, 0], None, pad_idx)
        else:
            masks['A_mask'], masks['C_mask'] = mask(
                feature_stacks['audio'][:, :, 0], captions, pad_idx)
    elif modality == 'audio_video':
        if captions is None:
            masks['A_mask'] = mask(feature_stacks['audio'][:, :, 0], None, pad_idx)
            masks['V_mask'] = mask(feature_stacks['rgb'][:, :, 0], None, pad_idx)
        else:
            masks['V_mask'], masks['C_mask'] = mask(
                feature_stacks['rgb'][:, :, 0], captions, pad_idx)
            masks['A_mask'] = mask(feature_stacks['audio'][:, :, 0], None, pad_idx)
    elif modality == 'subs_audio_video':
        if captions is None:
            masks['V_mask'] = mask(feature_stacks['rgb'][:, :, 0], None,
                                   pad_idx)
        else:
            masks['V_mask'], masks['C_mask'] = mask(
                feature_stacks['rgb'][:, :, 0], captions, pad_idx)
        masks['A_mask'] = mask(feature_stacks['audio'][:, :, 0], None, pad_idx)
        masks['S_mask'] = mask(feature_stacks['subs'], None, pad_idx)
    else:
        raise ValueError(f'Unknown modality: {modality}')
    return masks
