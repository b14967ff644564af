'''Host-side feature loading: per-video I3D (.npy rgb/flow) and VGGish audio.

Numpy re-implementation of the reference loaders (reference:
datasets/load_features.py:8-95) with identical crop/pad/missing-file
semantics; operates on numpy only (device transfer happens at batch level).
A C++ fast path with mmap + thread-pool prefetch lives in
``bmt_tpu.data.native`` and is used automatically when built.
'''
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def fill_missing_features(method: str, feature_size: int) -> np.ndarray:
    '''Reference: load_features.py:8-12.'''
    if method == 'random':
        return np.random.rand(1, feature_size).astype(np.float32)
    if method == 'zero':
        return np.zeros((1, feature_size), np.float32)
    raise ValueError(method)


def crop_a_segment(feature: np.ndarray, start: float, end: float,
                   duration: float) -> Optional[np.ndarray]:
    '''Proportional crop [start/dur*S : end/dur*S] with 1-frame fallback for
    degenerate segments (reference: load_features.py:14-34).'''
    S, _D = feature.shape
    start_idx = int(S * (start / duration))
    end_idx = int(S * (end / duration))
    if start_idx == end_idx:
        if start_idx == S:
            start_idx -= 1
        else:
            end_idx += 1
    feature = feature[start_idx:end_idx, :]
    return None if len(feature) == 0 else feature


def pad_segment(feature: np.ndarray, max_feature_len: int,
                pad_idx: float) -> np.ndarray:
    '''Pad rows up to max_feature_len with the pad value
    (reference: load_features.py:37-43).'''
    S, D = feature.shape
    assert S <= max_feature_len, (S, max_feature_len)
    if S == max_feature_len:
        return feature
    pad = np.full((max_feature_len - S, D), pad_idx, feature.dtype)
    return np.concatenate([feature, pad], axis=0)


def load_features_from_npy(cfg, feature_names_list, video_id: str,
                           start, end, duration, pad_idx: int,
                           get_full_feat: bool = False) -> dict:
    '''Reference: load_features.py:46-95. Missing files -> None entries
    (replaced with zero-vectors by the dataset).'''
    supported = {'i3d_features', 'vggish_features'}
    assert isinstance(feature_names_list, list) and feature_names_list
    assert set(feature_names_list).issubset(supported)

    stacks = {}
    if get_full_feat:
        stacks['orig_feat_length'] = {}

    if 'vggish_features' in feature_names_list:
        path = os.path.join(cfg.audio_features_path, f'{video_id}.npy')
        try:
            vggish = np.load(path).astype(np.float32)
            if get_full_feat:
                stacks['orig_feat_length']['audio'] = vggish.shape[0]
                vggish = pad_segment(vggish, cfg.pad_feats_up_to['audio'], pad_idx)
            else:
                vggish = crop_a_segment(vggish, start, end, duration)
        except FileNotFoundError:
            vggish = None
        stacks['audio'] = vggish

    if 'i3d_features' in feature_names_list:
        try:
            rgb = np.load(os.path.join(
                cfg.video_features_path, f'{video_id}_rgb.npy')).astype(np.float32)
            flow = np.load(os.path.join(
                cfg.video_features_path, f'{video_id}_flow.npy')).astype(np.float32)
            assert rgb.shape == flow.shape
            if get_full_feat:
                stacks['orig_feat_length']['rgb'] = rgb.shape[0]
                stacks['orig_feat_length']['flow'] = flow.shape[0]
                rgb = pad_segment(rgb, cfg.pad_feats_up_to['video'], pad_idx)
                flow = pad_segment(flow, cfg.pad_feats_up_to['video'], pad_idx=0)
            else:
                rgb = crop_a_segment(rgb, start, end, duration)
                flow = crop_a_segment(flow, start, end, duration)
        except FileNotFoundError:
            rgb = None
            flow = None
        stacks['rgb'] = rgb
        stacks['flow'] = flow

    return stacks


def pad_stack_batch(stacks: list, pad_value: float, length: int) -> np.ndarray:
    '''Stack a list of (S_i, D) arrays into (B, length, D), padding rows with
    pad_value. S_i may be clipped to `length` (bucketing).'''
    B = len(stacks)
    D = stacks[0].shape[1]
    out = np.full((B, length, D), pad_value, np.float32)
    for i, s in enumerate(stacks):
        n = min(s.shape[0], length)
        out[i, :n] = s[:n]
    return out
