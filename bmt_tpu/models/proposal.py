'''Bi-modal / uni-modal event proposal generators (YOLO-style, functional).

Re-design of the reference proposal stack (reference:
model/proposal_generator.py:11-448) for XLA: the conv heads lower to
``lax.conv_general_dilated`` (MXU-tiled on TPU), the YOLO decode is a pure
function (the reference mutates a ``predictions`` tensor in place), and target
assignment (`make_targets`, reference: proposal_generator.py:389-448) is
re-cast as static-shape scatters over *dense padded* ground-truth tensors
(B, E_max, ...) with a validity mask instead of the reference's ragged
``(sum_events, 4)`` layout.

A key behavioural observation used here: the reference recomputes
``make_targets`` once per kernel-size head, but the result depends only on
(grid size, stride, anchors) — identical across a modality's 10 heads. We
compute it once per modality; outputs are bit-identical.
'''
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from bmt_tpu.models.encoders import (bimodal_encoder_forward, encoder_forward,
                                     init_bimodal_encoder, init_encoder)
from bmt_tpu.ops.layers import (dropout, feature_embed, init_feature_embedder,
                                init_layer_norm, layer_norm,
                                positional_encode, positional_encoding_table)
from bmt_tpu.parallel.seq import shard_seq

POS_ENC_LEN = 3660
EPS = 1e-16  # reference: proposal_generator.py:55, 398


@dataclasses.dataclass(frozen=True)
class PropModelDims:
    '''Static architecture config for the proposal generators.'''
    modality: str = 'audio_video'
    d_model_A: int = 128
    d_model_V: int = 1024
    d_model: int = 1024
    H: int = 4
    N: int = 2
    d_ff_A: int = 512
    d_ff_V: int = 4096
    dout_p: float = 0.1
    use_linear_embedder: bool = False
    d_vid: int = 1024
    d_aud: int = 128
    kernel_sizes_A: Tuple[int, ...] = (5, 13, 23, 35, 51, 69, 91, 121, 161, 211)
    kernel_sizes_V: Tuple[int, ...] = (1, 5, 9, 13, 19, 25, 35, 45, 61, 79)
    conv_layers_A: Tuple[int, ...] = (512, 512)
    conv_layers_V: Tuple[int, ...] = (512, 512)
    anchors_num_A: int = 48
    anchors_num_V: int = 128
    layer_norm: bool = False
    remat: bool = False
    stride_A: float = 0.96          # audio_feature_timespan (config_constructor.py:57)
    stride_V: float = 64 / 25       # feature_timespan_in_fps / fps (config_constructor.py:64)
    obj_coeff: float = 1.0
    noobj_coeff: float = 100.0

    @classmethod
    def from_config(cls, cfg) -> 'PropModelDims':
        kw = dict(
            modality=cfg.modality,
            d_model_A=getattr(cfg, 'd_model_audio', 128),
            d_model_V=getattr(cfg, 'd_model_video', 1024),
            d_model=cfg.d_model, H=cfg.H, N=cfg.N,
            d_ff_A=getattr(cfg, 'd_ff_audio', 512),
            d_ff_V=getattr(cfg, 'd_ff_video', 4096),
            dout_p=cfg.dout_p, use_linear_embedder=cfg.use_linear_embedder,
            d_vid=cfg.d_vid, d_aud=cfg.d_aud,
            layer_norm=getattr(cfg, 'layer_norm', False),
            remat=getattr(cfg, 'remat', False),
            obj_coeff=getattr(cfg, 'obj_coeff', 1.0),
            noobj_coeff=getattr(cfg, 'noobj_coeff', 100.0),
        )
        if 'audio' in cfg.modality:
            kw.update(kernel_sizes_A=tuple(cfg.kernel_sizes['audio']),
                      conv_layers_A=tuple(cfg.conv_layers_audio),
                      anchors_num_A=cfg.anchors_num_audio,
                      stride_A=cfg.strides['audio'])
        if 'video' in cfg.modality:
            kw.update(kernel_sizes_V=tuple(cfg.kernel_sizes['video']),
                      conv_layers_V=tuple(cfg.conv_layers_video),
                      anchors_num_V=cfg.anchors_num_video,
                      stride_V=cfg.strides['video'])
        return cls(**kw)


# ---------------------------------------------------------------------------
# proposal head: conv stack (reference: proposal_generator.py:11-47)
# ---------------------------------------------------------------------------

def _init_conv(key, k: int, d_in: int, d_out: int) -> dict:
    '''PyTorch Conv1d default init (kaiming_uniform a=sqrt(5)):
    weights/bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)), fan_in = d_in * k.
    (The reference xavier loop only covers the encoder, not the heads —
    proposal_generator.py:255-258.)'''
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(d_in * k)
    return {
        'w': jax.random.uniform(kw, (k, d_in, d_out), jnp.float32, -bound, bound),
        'b': jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound),
    }


def init_proposal_head(key, d_model_list, kernel_size: int,
                       with_layer_norm: bool) -> dict:
    '''d_model_list e.g. [d_modality, 512, 512, 3 * anchors_num]; the first
    conv has `kernel_size` ("same" padding, odd k), the rest are pointwise.'''
    assert kernel_size % 2 == 1, 'odd kernel sizes required for same padding'
    n_layers = len(d_model_list) - 1
    keys = jax.random.split(key, n_layers)
    convs, lns = [], []
    for n, (d_in, d_out) in enumerate(zip(d_model_list[:-1], d_model_list[1:])):
        k = kernel_size if n == 0 else 1
        convs.append(_init_conv(keys[n], k, d_in, d_out))
        if with_layer_norm:
            lns.append(init_layer_norm(d_in))
    p = {'convs': convs}
    if with_layer_norm:
        p['lns'] = lns
    return p


def conv1d_same(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    '''x (B, S, D_in) -> (B, S, D_out); kernel (k, D_in, D_out), same padding.'''
    k = p['w'].shape[0]
    pad = k // 2
    out = jax.lax.conv_general_dilated(
        x, p['w'], window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=('NWC', 'WIO', 'NWC'))
    return out + p['b']


def proposal_head_forward(params: dict, x: jnp.ndarray, dout_p: float = 0.0,
                          rng=None, deterministic: bool = True) -> jnp.ndarray:
    '''(B, S, D) -> (B, S, 3 * anchors_num). Dropout+ReLU between conv layers
    but not after the last (reference: proposal_generator.py:32-35).'''
    convs = params['convs']
    lns = params.get('lns')
    n_layers = len(convs)
    for n, conv in enumerate(convs):
        if lns is not None:
            x = layer_norm(lns[n], x)
        x = conv1d_same(conv, x)
        if n < n_layers - 1:
            x = dropout(x, dout_p,
                        jax.random.fold_in(rng, n) if rng is not None else None,
                        deterministic)
            x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------------------
# YOLO decode (reference: proposal_generator.py:128-154, 272-309)
# ---------------------------------------------------------------------------

def yolo_decode(raw: jnp.ndarray, anchors: jnp.ndarray, stride: float):
    '''raw (B, S, 3A) head output -> training quantities + world predictions.

    Returns dict with:
      sigma_c, l, sigma_o : (B, A, S) training-path values
      predictions         : (B, A*S, 3) [start-center*stride, length*stride, conf]
    '''
    B, S, _ = raw.shape
    A = anchors.shape[0]
    x = raw.reshape(B, S, A, 3).transpose(0, 2, 1, 3)      # (B, A, S, 3)

    sigma_c = jax.nn.sigmoid(x[..., 0])
    l = x[..., 1]
    sigma_o = jax.nn.sigmoid(x[..., 2])

    # world-coordinate decode runs in float32 regardless of compute dtype:
    # a bf16 grid misrounds integer cells >= 257 (799 -> 800) and
    # (sigma_c + grid) in bf16 swallows the sub-cell offset entirely past
    # cell 512 — centers would drift by whole cells at Sa=800
    grid = jnp.arange(S, dtype=jnp.float32)[None, None, :]
    prior = (anchors / stride).astype(jnp.float32)[None, :, None]

    center = (sigma_c.astype(jnp.float32) + grid) * stride
    length = prior * jnp.exp(l.astype(jnp.float32)) * stride
    preds = jnp.stack([center, length, sigma_o.astype(jnp.float32)],
                      axis=-1)                             # (B, A, S, 3)
    return {
        'sigma_c': sigma_c, 'l': l, 'sigma_o': sigma_o,
        'predictions': preds.reshape(B, A * S, 3),
    }


def make_targets_dense(centers: jnp.ndarray, lengths: jnp.ndarray,
                       valid: jnp.ndarray, anchors: jnp.ndarray,
                       stride: float, S: int):
    '''Static-shape re-cast of `make_targets` (reference:
    proposal_generator.py:389-448).

    centers/lengths: (B, E) ground-truth event centers/lengths in seconds,
    padded to E_max; valid: (B, E) bool. anchors: (A,) in seconds.

    Returns (obj_mask, noobj_mask, target_x, target_w) each (B, A, S);
    padded events scatter into a trash column which is sliced away, so they
    cannot affect any real grid cell.
    '''
    B, E = centers.shape
    A = anchors.shape[0]
    # anchors are k-means priors, not trainable (reference keeps them as a
    # plain tensor outside the optimizer)
    anchors = jax.lax.stop_gradient(anchors)
    anchors_scaled = anchors / stride                       # (A,)

    gt_x = centers / stride                                 # (B, E) grid coords
    gt_w = lengths / stride

    # length-only tIoU between each anchor and each gt segment
    # (both "centered at zero": inter = min, union = max)
    inter = jnp.minimum(anchors_scaled[None, None, :], gt_w[:, :, None])
    inter = jnp.maximum(inter, 0.0)
    union = jnp.maximum(anchors_scaled[None, None, :], gt_w[:, :, None])
    ious = inter / (union + 1e-8)                           # (B, E, A)
    best_anchor = jnp.argmax(ious, axis=-1)                 # (B, E)

    gt_cell = jnp.floor(gt_x).astype(jnp.int32)
    gt_cell = jnp.clip(gt_cell, 0, S - 1)                  # (proposal_generator.py:423-426)
    # padded events go to the trash column S (sliced off below)
    gt_cell = jnp.where(valid, gt_cell, S)

    batch_ix = jnp.arange(B, dtype=jnp.int32)[:, None].repeat(E, axis=1)

    # Two GT events can land in the same (anchor, cell); the reference's
    # sequential loop overwrites, so the LAST event wins deterministically
    # (proposal_generator.py:427-447). A plain scatter-set with duplicate
    # indices has unspecified write order in XLA, so first resolve each
    # cell's winner with an associative max-scatter over event order, then
    # route every losing event to the trash column — all real-cell writes
    # are then unique.
    order = jnp.arange(1, E + 1, dtype=jnp.int32)[None, :].repeat(B, axis=0)
    order = jnp.where(valid, order, 0)
    owner = jnp.zeros((B, A, S + 1), jnp.int32)
    owner = owner.at[batch_ix, best_anchor, gt_cell].max(order)
    is_winner = owner[batch_ix, best_anchor, gt_cell] == order
    gt_cell = jnp.where(is_winner & valid, gt_cell, S)

    def scatter(values, init):
        buf = jnp.full((B, A, S + 1), init, values.dtype)
        buf = buf.at[batch_ix, best_anchor, gt_cell].set(values)
        return buf[:, :, :S]

    obj_mask = owner[:, :, :S] > 0
    noobj_mask = jnp.logical_not(obj_mask)

    tx = gt_x - jnp.floor(gt_x)                             # center shift
    tw = jnp.log(gt_w / anchors_scaled[best_anchor] + EPS)  # log length ratio
    target_x = scatter(tx.astype(jnp.float32), 0.0)
    target_w = scatter(tw.astype(jnp.float32), 0.0)

    return obj_mask, noobj_mask, target_x, target_w


def _bce(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    '''Elementwise binary cross-entropy with torch.nn.BCELoss log clamping.'''
    log_p = jnp.clip(jnp.log(p), -100.0)
    log_1p = jnp.clip(jnp.log(1.0 - p), -100.0)
    return -(t * log_p + (1.0 - t) * log_1p)


def _masked_mean(x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(x * m) / denom


def yolo_losses(decoded: dict, targets: tuple, obj_coeff: float,
                noobj_coeff: float, denoms=None):
    '''Localization MSE on obj cells + weighted objectness BCE
    (reference: proposal_generator.py:156-176).

    ``denoms``: optional (obj_total, noobj_total) cell counts to normalize
    by INSTEAD of this batch's own mask sums — the gradient-accumulation
    hook: per-microbatch sums divided by the FULL batch's counts add up to
    exactly the full-batch masked means (the counts depend only on the
    targets, never on params, so they can be precomputed).'''
    obj_mask, noobj_mask, target_x, target_w = targets
    obj = obj_mask.astype(jnp.float32)
    noobj = noobj_mask.astype(jnp.float32)

    if denoms is None:
        mean_obj = lambda x: _masked_mean(x, obj)          # noqa: E731
        mean_noobj = lambda x: _masked_mean(x, noobj)      # noqa: E731
    else:
        d_obj = jnp.maximum(denoms[0], 1.0)
        d_noobj = jnp.maximum(denoms[1], 1.0)
        mean_obj = lambda x: jnp.sum(x * obj) / d_obj      # noqa: E731
        mean_noobj = lambda x: jnp.sum(x * noobj) / d_noobj  # noqa: E731

    loss_x = mean_obj(jnp.square(decoded['sigma_c'] - target_x))
    loss_w = mean_obj(jnp.square(decoded['l'] - target_w))
    # gt objectness is obj_mask itself: 1 on obj cells, 0 elsewhere
    bce_o = _bce(decoded['sigma_o'], obj)
    loss_obj = mean_obj(bce_o)
    loss_noobj = mean_noobj(bce_o)

    loss = loss_x + loss_w + obj_coeff * loss_obj + noobj_coeff * loss_noobj
    return loss, {'loss_x': loss_x, 'loss_w': loss_w,
                  'loss_conf_obj': loss_obj, 'loss_conf_noobj': loss_noobj}


def _sum_loss_dicts(acc: dict, new: dict) -> dict:
    return {k: acc.get(k, 0.0) + v for k, v in new.items()}


# ---------------------------------------------------------------------------
# multimodal proposal generator (reference: proposal_generator.py:215-387)
# ---------------------------------------------------------------------------

def init_multimodal_proposal_generator(key, dims: PropModelDims) -> dict:
    ks = jax.random.split(key, 5)
    dims_A = [dims.d_model_A, *dims.conv_layers_A, 3 * dims.anchors_num_A]
    dims_V = [dims.d_model_V, *dims.conv_layers_V, 3 * dims.anchors_num_V]
    params = {
        'encoder': init_bimodal_encoder(ks[0], dims.d_model_A, dims.d_model_V,
                                        dims.d_model, dims.d_ff_A, dims.d_ff_V,
                                        dims.N),
        'heads_A': [init_proposal_head(k, dims_A, ksize, dims.layer_norm)
                    for k, ksize in zip(jax.random.split(ks[1], len(dims.kernel_sizes_A)),
                                        dims.kernel_sizes_A)],
        'heads_V': [init_proposal_head(k, dims_V, ksize, dims.layer_norm)
                    for k, ksize in zip(jax.random.split(ks[2], len(dims.kernel_sizes_V)),
                                        dims.kernel_sizes_V)],
    }
    if dims.use_linear_embedder:
        params['emb_A'] = init_feature_embedder(ks[3], dims.d_aud, dims.d_model_A)
        params['emb_V'] = init_feature_embedder(ks[4], dims.d_vid, dims.d_model_V)
    return params


def _forward_modality_heads(heads, x, anchors, stride, dense_targets,
                            obj_coeff, noobj_coeff, dout_p, rng,
                            deterministic, loss_denoms=None):
    '''Run every kernel-size head of one modality; targets computed once.'''
    S = x.shape[1]
    targets = None
    if dense_targets is not None:
        centers, lengths, valid = dense_targets
        targets = make_targets_dense(centers, lengths, valid, anchors, stride, S)

    all_preds, total_loss, losses = [], 0.0, {}
    for i, head in enumerate(heads):
        raw = proposal_head_forward(
            head, x, dout_p,
            jax.random.fold_in(rng, i) if rng is not None else None,
            deterministic)
        # conv output back on the sp split (GSPMD partitions the conv
        # spatially with halo exchange; no-op outside an sp context)
        raw = shard_seq(raw)
        decoded = yolo_decode(raw, anchors, stride)
        all_preds.append(decoded['predictions'])
        if targets is not None:
            loss, ldict = yolo_losses(decoded, targets, obj_coeff,
                                      noobj_coeff, denoms=loss_denoms)
            total_loss = total_loss + loss
            losses = _sum_loss_dicts(losses, ldict)
    return jnp.concatenate(all_preds, axis=1), total_loss, losses


def multimodal_proposal_forward(params, dims: PropModelDims, src: dict,
                                dense_targets, masks: dict, rng=None,
                                deterministic: bool = True,
                                attention_impl: str = 'xla',
                                loss_denoms=None):
    '''Reference: proposal_generator.py:339-387.

    dense_targets: None (inference) or (centers, lengths, valid) with shapes
    (B, E_max) — padded ground-truth events shared by both modalities.
    loss_denoms: None or ((obj_A, noobj_A), (obj_V, noobj_V)) external cell
    counts for gradient accumulation (see ``yolo_losses``).

    Returns (all_predictions (B, sum_A*S over both modalities, 3),
             total_loss, losses_A, losses_V).
    '''
    from bmt_tpu.models.captioning import _rng_stream
    rngs = _rng_stream(rng)

    A = src['audio']
    V = src['rgb'] + src['flow']
    if dims.use_linear_embedder:
        A = feature_embed(params['emb_A'], A, dims.d_model_A)
        V = feature_embed(params['emb_V'], V, dims.d_model_V)
    pe_A = jnp.asarray(positional_encoding_table(POS_ENC_LEN, dims.d_model_A))
    pe_V = jnp.asarray(positional_encoding_table(POS_ENC_LEN, dims.d_model_V))
    A = positional_encode(pe_A, A, dims.dout_p, next(rngs), deterministic)
    V = positional_encode(pe_V, V, dims.dout_p, next(rngs), deterministic)
    # sequence-parallel entry constraints (no-op outside an sp context)
    A, V = shard_seq(A), shard_seq(V)

    Av, Va = bimodal_encoder_forward(params['encoder'], A, V, masks['A_mask'],
                                     masks['V_mask'], dims.H, dims.dout_p,
                                     rngs, deterministic, attention_impl,
                                     dims.remat)

    # anchors always ride in params; a missing key must fail HERE with a
    # clear KeyError, not as a NoneType crash deep inside yolo_decode
    anchors_A = params['anchors_A']
    anchors_V = params['anchors_V']

    denoms_A, denoms_V = (loss_denoms if loss_denoms is not None
                          else (None, None))
    preds_A, loss_A, losses_A = _forward_modality_heads(
        params['heads_A'], Av, anchors_A, dims.stride_A, dense_targets,
        dims.obj_coeff, dims.noobj_coeff, dims.dout_p, next(rngs),
        deterministic, loss_denoms=denoms_A)
    preds_V, loss_V, losses_V = _forward_modality_heads(
        params['heads_V'], Va, anchors_V, dims.stride_V, dense_targets,
        dims.obj_coeff, dims.noobj_coeff, dims.dout_p, next(rngs),
        deterministic, loss_denoms=denoms_V)

    all_predictions = jnp.concatenate([preds_A, preds_V], axis=1)
    return all_predictions, loss_A + loss_V, losses_A, losses_V


# ---------------------------------------------------------------------------
# uni-modal proposal generator (reference: proposal_generator.py:50-212)
# ---------------------------------------------------------------------------

def init_unimodal_proposal_generator(key, dims: PropModelDims) -> dict:
    is_video = dims.modality == 'video'
    d_modality = dims.d_model_V if is_video else dims.d_model_A
    d_ff = dims.d_ff_V if is_video else dims.d_ff_A
    d_feat = dims.d_vid if is_video else dims.d_aud
    conv_layers = dims.conv_layers_V if is_video else dims.conv_layers_A
    anchors_num = dims.anchors_num_V if is_video else dims.anchors_num_A
    kernel_sizes = dims.kernel_sizes_V if is_video else dims.kernel_sizes_A

    ks = jax.random.split(key, 3)
    layer_dims = [d_modality, *conv_layers, 3 * anchors_num]
    params = {
        'encoder': init_encoder(ks[0], d_modality, d_ff, dims.N),
        'heads': [init_proposal_head(k, layer_dims, ksize, dims.layer_norm)
                  for k, ksize in zip(jax.random.split(ks[1], len(kernel_sizes)),
                                      kernel_sizes)],
    }
    if dims.use_linear_embedder:
        params['emb'] = init_feature_embedder(ks[2], d_feat, d_modality)
    return params


def unimodal_proposal_forward(params, dims: PropModelDims, src: dict,
                              dense_targets, masks: dict, rng=None,
                              deterministic: bool = True,
                              attention_impl: str = 'xla',
                              loss_denoms=None):
    '''Reference: proposal_generator.py:184-212. ``loss_denoms``: None or
    one (obj, noobj) count pair (see ``yolo_losses``).'''
    from bmt_tpu.models.captioning import _rng_stream
    rngs = _rng_stream(rng)

    is_video = dims.modality == 'video'
    if is_video:
        x = src['rgb'] + src['flow']
        src_mask = masks['V_mask']
        d_modality, stride = dims.d_model_V, dims.stride_V
    else:
        x = src['audio']
        src_mask = masks['A_mask']
        d_modality, stride = dims.d_model_A, dims.stride_A

    if dims.use_linear_embedder:
        x = feature_embed(params['emb'], x, d_modality)
    pe = jnp.asarray(positional_encoding_table(POS_ENC_LEN, d_modality))
    x = positional_encode(pe, x, dims.dout_p, next(rngs), deterministic)
    x = shard_seq(x)  # no-op outside a sequence_parallel context
    x = encoder_forward(params['encoder'], x, src_mask, dims.H, dims.dout_p,
                        rngs, deterministic, attention_impl)

    anchors = params['anchors']
    preds, loss, losses = _forward_modality_heads(
        params['heads'], x, anchors, stride, dense_targets,
        dims.obj_coeff, dims.noobj_coeff, dims.dout_p, next(rngs),
        deterministic, loss_denoms=loss_denoms)
    return preds, loss, losses
