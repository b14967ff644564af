'''Checkpoint-import fidelity against a file REAL torch code wrote.

The reference checkpoints (best_cap_model.pt) are not fetchable offline, so
this builds genuine torch nn.Modules whose attribute tree reproduces the
reference's state_dict key layout exactly (reference:
model/captioning_module.py:101-187, model/encoders.py:36-47,
model/decoders.py:37-53, model/blocks.py:33-165, model/generators.py:4-8,
model/multihead_attention.py:46-49), torch.saves a DataParallel-prefixed
checkpoint the way the reference trainer does
(epoch_loops/captioning_epoch_loops.py save path), and then:

  * imports it through load_torch_checkpoint / import_cap_model,
  * asserts END-TO-END LOGIT PARITY between the torch modules' own forward
    (pure torch semantics — nn.Linear/nn.LayerNorm, no shared mapping code
    with the importer) and the JAX forward on the imported params,
  * asserts the pickled utilities.config_constructor.Config object is
    deserialized via the shim without the real class importable.

Any transpose/key-mapping bug in the import path shows up as a logit
mismatch here.
'''
import math
import pickle
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax

from bmt_tpu.models import CapModelDims, bimodal_transformer_forward
from bmt_tpu.ops.masks import make_masks
from bmt_tpu.train.checkpoint import import_cap_model, load_torch_checkpoint

DIMS = CapModelDims(voc_size=23, d_model_A=8, d_model_V=12, d_model_C=10,
                    d_model=16, H=2, N=2, d_ff_A=16, d_ff_V=24, d_ff_C=20,
                    d_aud=4, d_vid=5, use_linear_embedder=True)


# --- torch mirror with the reference's exact attribute names --------------

class MHA(nn.Module):
    def __init__(self, d_q, d_k, d_v, H, d_model):
        super().__init__()
        self.H, self.d_model = H, d_model
        self.linear_Q2d = nn.Linear(d_q, d_model)
        self.linear_K2d = nn.Linear(d_k, d_model)
        self.linear_V2d = nn.Linear(d_v, d_model)
        self.linear_d2Q = nn.Linear(d_model, d_q)

    def forward(self, Q, K, V, mask):
        B, Sq, _ = Q.shape
        d_k = self.d_model // self.H
        q = self.linear_Q2d(Q).view(B, -1, self.H, d_k).transpose(1, 2)
        k = self.linear_K2d(K).view(B, -1, self.H, d_k).transpose(1, 2)
        v = self.linear_V2d(V).view(B, -1, self.H, d_k).transpose(1, 2)
        logits = q @ k.transpose(-1, -2) / math.sqrt(d_k)
        logits = logits.masked_fill(mask.unsqueeze(1) == 0, -float('inf'))
        out = F.softmax(logits, dim=-1) @ v
        out = out.transpose(1, 2).contiguous().view(B, Sq, self.d_model)
        return self.linear_d2Q(out)


class ResidualConnection(nn.Module):
    def __init__(self, size):
        super().__init__()
        self.norm = nn.LayerNorm(size)

    def forward(self, x, sublayer):
        return x + sublayer(self.norm(x))


class PositionwiseFeedForward(nn.Module):
    def __init__(self, d_model, d_ff):
        super().__init__()
        self.fc1 = nn.Linear(d_model, d_ff)
        self.fc2 = nn.Linear(d_ff, d_model)

    def forward(self, x):
        return self.fc2(F.relu(self.fc1(x)))


class BridgeConnection(nn.Module):
    def __init__(self, in_dim, out_dim):
        super().__init__()
        self.norm = nn.LayerNorm(in_dim)
        self.linear = nn.Linear(in_dim, out_dim)

    def forward(self, x):
        return F.relu(self.linear(self.norm(x)))


class BiModalEncoderLayer(nn.Module):
    def __init__(self, d_A, d_V, d_ff_A, d_ff_V, H, d_model):
        super().__init__()
        self.self_att_M1 = MHA(d_A, d_A, d_A, H, d_model)
        self.self_att_M2 = MHA(d_V, d_V, d_V, H, d_model)
        self.bi_modal_att_M1 = MHA(d_A, d_V, d_V, H, d_model)
        self.bi_modal_att_M2 = MHA(d_V, d_A, d_A, H, d_model)
        self.feed_forward_M1 = PositionwiseFeedForward(d_A, d_ff_A)
        self.feed_forward_M2 = PositionwiseFeedForward(d_V, d_ff_V)
        self.res_layers_M1 = nn.ModuleList(
            [ResidualConnection(d_A) for _ in range(3)])
        self.res_layers_M2 = nn.ModuleList(
            [ResidualConnection(d_V) for _ in range(3)])

    def forward(self, M1, M2, M1_mask, M2_mask):
        M1 = self.res_layers_M1[0](
            M1, lambda y: self.self_att_M1(y, y, y, M1_mask))
        M2 = self.res_layers_M2[0](
            M2, lambda y: self.self_att_M2(y, y, y, M2_mask))
        M1m2 = self.res_layers_M1[1](
            M1, lambda y: self.bi_modal_att_M1(y, M2, M2, M2_mask))
        M2m1 = self.res_layers_M2[1](
            M2, lambda y: self.bi_modal_att_M2(y, M1, M1, M1_mask))
        M1 = self.res_layers_M1[2](M1m2, self.feed_forward_M1)
        M2 = self.res_layers_M2[2](M2m1, self.feed_forward_M2)
        return M1, M2


class LayerStack(nn.Module):
    def __init__(self, layers):
        super().__init__()
        self.layers = nn.ModuleList(layers)


class BiModalEncoder(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.encoder_AV = LayerStack([
            BiModalEncoderLayer(dims.d_model_A, dims.d_model_V, dims.d_ff_A,
                                dims.d_ff_V, dims.H, dims.d_model)
            for _ in range(dims.N)])

    def forward(self, A, V, A_mask, V_mask):
        for layer in self.encoder_AV.layers:
            A, V = layer(A, V, A_mask, V_mask)
        return A, V


class BiModalDecoderLayer(nn.Module):
    def __init__(self, dims):
        super().__init__()
        d_C = dims.d_model_C
        self.res_layer_self_att = ResidualConnection(d_C)
        self.self_att = MHA(d_C, d_C, d_C, dims.H, dims.d_model)
        self.res_layer_enc_att_A = ResidualConnection(d_C)
        self.res_layer_enc_att_V = ResidualConnection(d_C)
        self.enc_att_A = MHA(d_C, dims.d_model_A, dims.d_model_A, dims.H,
                             dims.d_model)
        self.enc_att_V = MHA(d_C, dims.d_model_V, dims.d_model_V, dims.H,
                             dims.d_model)
        self.bridge = BridgeConnection(2 * d_C, d_C)
        self.res_layer_ff = ResidualConnection(d_C)
        self.feed_forward = PositionwiseFeedForward(d_C, dims.d_ff_C)

    def forward(self, C, Av, Va, A_mask, V_mask, C_mask):
        C = self.res_layer_self_att(
            C, lambda y: self.self_att(y, y, y, C_mask))
        Ca = self.res_layer_enc_att_A(
            C, lambda y: self.enc_att_A(y, Av, Av, A_mask))
        Cv = self.res_layer_enc_att_V(
            C, lambda y: self.enc_att_V(y, Va, Va, V_mask))
        C = self.bridge(torch.cat([Ca, Cv], dim=-1))
        return self.res_layer_ff(C, self.feed_forward)


class BiModelDecoder(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.decoder = LayerStack(
            [BiModalDecoderLayer(dims) for _ in range(dims.N)])

    def forward(self, C, Av, Va, A_mask, V_mask, C_mask):
        for layer in self.decoder.layers:
            C = layer(C, Av, Va, A_mask, V_mask, C_mask)
        return C


class VocabularyEmbedder(nn.Module):
    def __init__(self, voc_size, emb_dim):
        super().__init__()
        self.emb_dim = emb_dim
        self.embedder = nn.Embedding(voc_size, emb_dim)

    def forward(self, x):
        return self.embedder(x) * math.sqrt(self.emb_dim)


class FeatureEmbedder(nn.Module):
    def __init__(self, d_feat, d_model):
        super().__init__()
        self.d_model = d_model
        self.embedder = nn.Linear(d_feat, d_model)

    def forward(self, x):
        return F.relu(self.embedder(x) * math.sqrt(self.d_model))


class Generator(nn.Module):
    def __init__(self, d_model, voc_size):
        super().__init__()
        self.linear = nn.Linear(d_model, voc_size)

    def forward(self, x):
        return F.log_softmax(self.linear(x), dim=-1)


def _pos_enc(x, d_model):
    S = x.shape[-2]
    mat = np.zeros((S, d_model))
    odds = np.arange(0, d_model, 2)
    evens = np.arange(1, d_model, 2)
    for pos in range(S):
        mat[pos, odds] = np.sin(pos / (10000 ** (odds / d_model)))
        mat[pos, evens] = np.cos(pos / (10000 ** (evens / d_model)))
    return x + torch.from_numpy(mat).float()


class BiModalTransformer(nn.Module):
    def __init__(self, dims, d_aud, d_vid):
        super().__init__()
        self.dims = dims
        self.emb_A = FeatureEmbedder(d_aud, dims.d_model_A)
        self.emb_V = FeatureEmbedder(d_vid, dims.d_model_V)
        self.emb_C = VocabularyEmbedder(dims.voc_size, dims.d_model_C)
        self.encoder = BiModalEncoder(dims)
        self.decoder = BiModelDecoder(dims)
        self.generator = Generator(dims.d_model_C, dims.voc_size)

    def forward(self, src, trg, masks):
        V = self.emb_V(torch.from_numpy(src['rgb'] + src['flow']))
        A = self.emb_A(torch.from_numpy(src['audio']))
        C = self.emb_C(torch.from_numpy(np.asarray(trg)).long())
        A = _pos_enc(A, self.dims.d_model_A)
        V = _pos_enc(V, self.dims.d_model_V)
        C = _pos_enc(C, self.dims.d_model_C)
        A_mask = torch.from_numpy(np.asarray(masks['A_mask']))
        V_mask = torch.from_numpy(np.asarray(masks['V_mask']))
        C_mask = torch.from_numpy(np.asarray(masks['C_mask']))
        Av, Va = self.encoder(A, V, A_mask, V_mask)
        C = self.decoder(C, Av, Va, A_mask, V_mask, C_mask)
        return self.generator(C)


def _make_inputs(rng):
    B, Sa, Sv, Sc = 2, 10, 7, 6
    src = {'rgb': rng.normal(size=(B, Sv, 5)).astype(np.float32),
           'flow': rng.normal(size=(B, Sv, 5)).astype(np.float32),
           'audio': rng.normal(size=(B, Sa, 4)).astype(np.float32)}
    # row 0 fully valid; row 1 has feature padding (pad_idx=1 channel-0
    # convention) and caption padding
    src['audio'][1, 7:] = 1.0
    src['rgb'][1, 5:] = 1.0
    src['flow'][1, 5:] = 0.0
    trg = rng.integers(4, DIMS.voc_size, size=(B, Sc)).astype(np.int32)
    trg[1, 4:] = 1
    return src, trg


def _save_reference_style_checkpoint(path, model, with_config_pickle):
    dp = nn.Module()  # DataParallel-style 'module.' key prefix
    dp.module = model
    cpt = {'model_state_dict': dp.state_dict(), 'epoch': 26,
           'trg_voc_size': DIMS.voc_size,
           'val_1_metrics': {'METEOR': 0.109}}
    if with_config_pickle:
        # emulate the reference's pickled utilities.config_constructor.Config
        mod = types.ModuleType('utilities.config_constructor')

        class Config:
            pass

        Config.__module__ = 'utilities.config_constructor'
        Config.__qualname__ = 'Config'
        mod.Config = Config
        pkg = types.ModuleType('utilities')
        sys.modules['utilities'] = pkg
        sys.modules['utilities.config_constructor'] = mod
        cfg = Config()
        cfg.d_model = DIMS.d_model
        cfg.modality = 'audio_video'
        # force pickle-by-reference of the class, then drop the module so
        # only the importer's shim can satisfy the unpickle
        cpt['config'] = pickle.loads(pickle.dumps(cfg))
        torch.save(cpt, path)
        del sys.modules['utilities.config_constructor']
        del sys.modules['utilities']
    else:
        torch.save(cpt, path)


@pytest.mark.parametrize('with_config_pickle', [True, False])
def test_real_torch_checkpoint_import_logit_parity(tmp_path,
                                                   with_config_pickle):
    torch.manual_seed(7)
    model = BiModalTransformer(DIMS, d_aud=4, d_vid=5).eval()
    path = str(tmp_path / 'best_cap_model.pt')
    _save_reference_style_checkpoint(path, model, with_config_pickle)

    if with_config_pickle:
        assert 'utilities.config_constructor' not in sys.modules

    cpt = load_torch_checkpoint(path)
    assert cpt['epoch'] == 26
    assert cpt['trg_voc_size'] == DIMS.voc_size
    if with_config_pickle:
        assert cpt['config']['d_model'] == DIMS.d_model
        assert cpt['config']['modality'] == 'audio_video'

    params, _ = import_cap_model(cpt)

    rng = np.random.default_rng(0)
    src, trg = _make_inputs(rng)
    masks = make_masks({k: jax.numpy.asarray(v) for k, v in src.items()},
                       jax.numpy.asarray(trg), 'audio_video', 1)

    with torch.no_grad():
        torch_logits = model(src, trg, masks).numpy()
    jax_logits = np.asarray(bimodal_transformer_forward(
        params, DIMS, {k: jax.numpy.asarray(v) for k, v in src.items()},
        jax.numpy.asarray(trg), masks, deterministic=True))

    # ignore fully-padded caption rows' tail positions only if they diverge
    # by masking semantics — they should not: compare everything
    np.testing.assert_allclose(jax_logits, torch_logits, atol=2e-5, rtol=2e-5)


def test_state_dict_key_layout_matches_reference():
    '''The key set the importer expects is exactly what the torch module
    tree (reference attribute names) emits.'''
    model = BiModalTransformer(DIMS, d_aud=4, d_vid=5)
    keys = set(model.state_dict().keys())
    # spot checks straight from the reference's module tree
    expected = {
        'emb_A.embedder.weight', 'emb_A.embedder.bias',
        'emb_C.embedder.weight',
        'encoder.encoder_AV.layers.0.self_att_M1.linear_Q2d.weight',
        'encoder.encoder_AV.layers.1.bi_modal_att_M2.linear_d2Q.bias',
        'encoder.encoder_AV.layers.0.res_layers_M1.2.norm.weight',
        'encoder.encoder_AV.layers.0.feed_forward_M2.fc1.weight',
        'decoder.decoder.layers.0.self_att.linear_K2d.weight',
        'decoder.decoder.layers.1.bridge.linear.weight',
        'decoder.decoder.layers.1.res_layer_ff.norm.bias',
        'generator.linear.weight',
    }
    assert expected <= keys
