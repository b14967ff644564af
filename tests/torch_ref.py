'''Independent PyTorch implementation of the BMT equations, used only as
parity ground truth in tests. Functional style over the same parameter
pytrees as the JAX implementation (weights are transplanted, not re-derived),
so tests validate math, not weight bookkeeping.'''
import math

import numpy as np
import torch
import torch.nn.functional as F


def tt(x):
    return torch.from_numpy(np.asarray(x)).to(torch.float32)


def t_linear(p, x):
    return x @ tt(p['w']) + tt(p['b'])


def t_layer_norm(p, x):
    return F.layer_norm(x, (x.shape[-1],), tt(p['scale']), tt(p['bias']))


def t_attention(q, k, v, mask):
    d_k = q.size(-1)
    logits = q.matmul(k.transpose(-1, -2)) / np.sqrt(d_k)
    if mask is not None:
        logits = logits.masked_fill(mask == 0, -float('inf'))
    return F.softmax(logits, dim=-1).matmul(v)


def t_mha(p, q, k, v, mask, H):
    B, Sq, _ = q.shape
    d_model = tt(p['q2d']['w']).shape[1]
    d_k = d_model // H
    q = t_linear(p['q2d'], q).view(B, -1, H, d_k).transpose(-3, -2)
    k = t_linear(p['k2d'], k).view(B, -1, H, d_k).transpose(-3, -2)
    v = t_linear(p['v2d'], v).view(B, -1, H, d_k).transpose(-3, -2)
    if mask is not None:
        mask = mask.unsqueeze(1)
    out = t_attention(q, k, v, mask)
    out = out.transpose(-3, -2).contiguous().view(B, Sq, d_model)
    return t_linear(p['d2q'], out)


def t_ffn(p, x):
    return t_linear(p['fc2'], F.relu(t_linear(p['fc1'], x)))


def t_residual(ln, x, sublayer):
    return x + sublayer(t_layer_norm(ln, x))


def t_bridge(p, x):
    return F.relu(t_linear(p['linear'], t_layer_norm(p['norm'], x)))


def t_pos_enc(x, d_model):
    S = x.shape[-2]
    mat = np.zeros((S, d_model))
    odds = np.arange(0, d_model, 2)
    evens = np.arange(1, d_model, 2)
    for pos in range(S):
        mat[pos, odds] = np.sin(pos / (10000 ** (odds / d_model)))
        mat[pos, evens] = np.cos(pos / (10000 ** (evens / d_model)))
    return x + torch.from_numpy(mat).float()


def t_vocab_embed(p, tokens, emb_dim):
    x = tt(p['table'])[tokens]
    if 'adapter' in p:
        x = F.relu(t_linear(p['adapter'], x))
    return x * np.sqrt(emb_dim)


def t_bimodal_encoder(params, A, V, A_mask, V_mask, H):
    M1, M2 = A, V
    for p in params['layers']:
        M1 = t_residual(p['res_M1'][0], M1,
                        lambda y: t_mha(p['self_att_M1'], y, y, y, A_mask, H))
        M2 = t_residual(p['res_M2'][0], M2,
                        lambda y: t_mha(p['self_att_M2'], y, y, y, V_mask, H))
        M1m2 = t_residual(p['res_M1'][1], M1,
                          lambda y: t_mha(p['cross_att_M1'], y, M2, M2, V_mask, H))
        M2m1 = t_residual(p['res_M2'][1], M2,
                          lambda y: t_mha(p['cross_att_M2'], y, M1, M1, A_mask, H))
        M1 = t_residual(p['res_M1'][2], M1m2, lambda y: t_ffn(p['ff_M1'], y))
        M2 = t_residual(p['res_M2'][2], M2m1, lambda y: t_ffn(p['ff_M2'], y))
    return M1, M2


def t_bimodal_decoder(params, C, Av, Va, A_mask, V_mask, C_mask, H):
    for p in params['layers']:
        C = t_residual(p['res_self'], C,
                       lambda y: t_mha(p['self_att'], y, y, y, C_mask, H))
        Ca = t_residual(p['res_enc_A'], C,
                        lambda y: t_mha(p['enc_att_A'], y, Av, Av, A_mask, H))
        Cv = t_residual(p['res_enc_V'], C,
                        lambda y: t_mha(p['enc_att_V'], y, Va, Va, V_mask, H))
        C = t_bridge(p['bridge'], torch.cat([Ca, Cv], dim=-1))
        C = t_residual(p['res_ff'], C, lambda y: t_ffn(p['ff'], y))
    return C


def t_bimodal_transformer(params, dims, src, trg, masks):
    V = tt(src['rgb']) + tt(src['flow'])
    A = tt(src['audio'])
    C = t_vocab_embed(params['emb_C'], torch.from_numpy(np.asarray(trg)).long(),
                      dims.d_model_C)
    A = t_pos_enc(A, dims.d_model_A)
    V = t_pos_enc(V, dims.d_model_V)
    C = t_pos_enc(C, dims.d_model_C)
    A_mask = torch.from_numpy(np.asarray(masks['A_mask']))
    V_mask = torch.from_numpy(np.asarray(masks['V_mask']))
    C_mask = torch.from_numpy(np.asarray(masks['C_mask']))
    Av, Va = t_bimodal_encoder(params['encoder'], A, V, A_mask, V_mask, dims.H)
    C = t_bimodal_decoder(params['decoder'], C, Av, Va, A_mask, V_mask,
                          C_mask, dims.H)
    return F.log_softmax(t_linear(params['generator'], C), dim=-1)


def t_label_smoothing(log_probs, target, smoothing, pad_idx):
    pred = torch.from_numpy(np.asarray(log_probs)).reshape(
        -1, log_probs.shape[-1]).float()
    tgt = torch.from_numpy(np.asarray(target)).reshape(-1).long()
    V = pred.shape[-1]
    dist = smoothing * torch.ones_like(pred) / (V - 2)
    dist.scatter_(1, tgt.unsqueeze(-1), 1 - smoothing)
    dist[:, pad_idx] = 0
    pad_rows = torch.nonzero(tgt == pad_idx)
    if len(pad_rows) > 0:
        dist.index_fill_(0, pad_rows.squeeze(-1), 0)
    return F.kl_div(pred, dist, reduction='sum')


def t_conv_head(p, x, with_ln):
    '''x (B, S, D) -> (B, S, out); torch Conv1d over channel-first layout.'''
    x = torch.as_tensor(np.asarray(x)).float().permute(0, 2, 1)  # (B, D, S)
    n = len(p['convs'])
    for i, c in enumerate(p['convs']):
        if with_ln:
            x = F.layer_norm(x.permute(0, 2, 1), (x.shape[1],),
                             tt(p['lns'][i]['scale']),
                             tt(p['lns'][i]['bias'])).permute(0, 2, 1)
        w = tt(c['w']).permute(2, 1, 0)  # (k, in, out) -> (out, in, k)
        k = w.shape[-1]
        x = F.conv1d(x, w, tt(c['b']), padding=k // 2)
        if i < n - 1:
            x = F.relu(x)
    return x.permute(0, 2, 1)


def t_make_targets(predictions_shape, targets, anchors, stride):
    '''Port of the reference YOLO target assignment over ragged targets
    (rows: [batch_idx, center_s, length_s]). Returns numpy arrays.'''
    B, num_anchs, G = predictions_shape
    eps = 1e-16
    noobj = np.ones((B, num_anchs, G), bool)
    obj = np.zeros((B, num_anchs, G), bool)
    tx = np.zeros((B, num_anchs, G), np.float32)
    tw = np.zeros((B, num_anchs, G), np.float32)

    vid = targets[:, 0].astype(int)
    gx = targets[:, 1] / stride
    gw = targets[:, 2] / stride
    a = np.asarray(anchors) / stride
    inter = np.minimum(a[:, None], gw[None, :])
    union = np.maximum(a[:, None], gw[None, :])
    ious = inter / (union + 1e-8)
    best = ious.argmax(0)

    cell = gx.astype(int)
    cell = np.clip(cell, 0, G - 1)
    obj[vid, best, cell] = True
    noobj[vid, best, cell] = False
    tx[vid, best, cell] = gx - np.floor(gx)
    tw[vid, best, cell] = np.log(gw / a[best] + eps)
    return obj, noobj, tx, tw
