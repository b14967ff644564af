'''Proposal-generator torch export: export_prop_state_dict must produce a
state_dict that the REAL reference MultimodalProposalGenerator layout
accepts with load_state_dict(strict=True) — including the head
Sequential's exact parameter indices around the parameter-free
Transpose/Dropout/ReLU modules — and round-trip through import_prop_model
bit-exactly. The torch side is a behavioral mirror of
model/proposal_generator.py:11-38,215-270 built with real torch.
'''
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

# pytest (no tests/__init__.py) puts this directory on sys.path: reuse the
# real-torch BiModalEncoder/FeatureEmbedder mirrors from the cap test
from test_torch_import_real import BiModalEncoder, FeatureEmbedder

from bmt_tpu.models import PropModelDims, init_multimodal_proposal_generator
from bmt_tpu.train.checkpoint import (export_prop_state_dict,
                                      import_prop_model,
                                      load_torch_checkpoint,
                                      save_torch_prop_checkpoint)


class Transpose(nn.Module):
    def forward(self, x):
        return x.transpose(-1, -2)


class ProposalGenerationHead(nn.Module):
    '''Mirror of the reference head's MODULE LAYOUT (proposal_generator.py:
    11-38): the Sequential indices are what the export must reproduce.'''

    def __init__(self, d_model_list, kernel_size, dout_p, layer_norm):
        super().__init__()
        layers = []
        in_dims, out_dims = d_model_list[:-1], d_model_list[1:]
        n_layers = len(d_model_list) - 1
        for n, (in_d, out_d) in enumerate(zip(in_dims, out_dims)):
            if layer_norm:
                layers += [Transpose(), nn.LayerNorm(in_d), Transpose()]
            if n == 0:
                layers.append(nn.Conv1d(in_d, out_d, kernel_size,
                                        padding=kernel_size // 2))
            else:
                layers.append(nn.Conv1d(in_d, out_d, kernel_size=1))
            if n < n_layers - 1:
                if dout_p > 0:
                    layers.append(nn.Dropout(dout_p))
                layers.append(nn.ReLU())
        self.conv_layers = nn.Sequential(*layers)


class MultimodalPropMirror(nn.Module):
    def __init__(self, dims: PropModelDims, dout_p: float):
        super().__init__()
        self.emb_A = FeatureEmbedder(dims.d_aud, dims.d_model_A)
        self.emb_V = FeatureEmbedder(dims.d_vid, dims.d_model_V)
        self.encoder = BiModalEncoder(dims)
        dims_A = [dims.d_model_A, *dims.conv_layers_A,
                  3 * dims.anchors_num_A]
        dims_V = [dims.d_model_V, *dims.conv_layers_V,
                  3 * dims.anchors_num_V]
        self.detection_layers_A = nn.ModuleList([
            ProposalGenerationHead(dims_A, k, dout_p, dims.layer_norm)
            for k in dims.kernel_sizes_A])
        self.detection_layers_V = nn.ModuleList([
            ProposalGenerationHead(dims_V, k, dout_p, dims.layer_norm)
            for k in dims.kernel_sizes_V])


def _pdims(layer_norm: bool) -> PropModelDims:
    return PropModelDims(d_model_A=8, d_model_V=12, d_model=16, H=2, N=1,
                         d_ff_A=16, d_ff_V=24, d_vid=20, d_aud=6,
                         use_linear_embedder=True, kernel_sizes_A=(3, 5),
                         kernel_sizes_V=(3,), conv_layers_A=(8, 8),
                         conv_layers_V=(8,), anchors_num_A=2,
                         anchors_num_V=3, layer_norm=layer_norm)


@pytest.mark.parametrize('layer_norm', [False, True])
@pytest.mark.parametrize('dout_p', [0.1, 0.0])
def test_export_loads_strict_into_reference_layout(layer_norm, dout_p):
    dims = _pdims(layer_norm)
    params = init_multimodal_proposal_generator(jax.random.PRNGKey(0), dims)
    sd = export_prop_state_dict(params, dout_p=dout_p > 0)
    mirror = MultimodalPropMirror(dims, dout_p)
    tsd = {k: torch.from_numpy(np.ascontiguousarray(v))
           for k, v in sd.items()}
    # strict: every reference parameter present, no stray keys, and the
    # Sequential index arithmetic around Dropout/ReLU/Transpose is exact
    mirror.load_state_dict(tsd, strict=True)


@pytest.mark.parametrize('layer_norm', [False, True])
def test_export_import_roundtrip_bitexact(layer_norm):
    dims = _pdims(layer_norm)
    params = init_multimodal_proposal_generator(jax.random.PRNGKey(1), dims)
    params['anchors_A'] = jnp.asarray([2.0, 6.0], jnp.float32)
    params['anchors_V'] = jnp.asarray([3.0, 9.0, 20.0], jnp.float32)

    # numpy state_dict: what the no-torch pickle reader
    # (load_torch_checkpoint) hands import_prop_model
    sd = export_prop_state_dict(params)
    cpt = {'model_state_dict': sd,
           'anchors': {'audio': np.asarray(params['anchors_A']).tolist(),
                       'video': np.asarray(params['anchors_V']).tolist()},
           'config': {}}
    back, _ = import_prop_model(cpt)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    assert set(flat_b) == {p for p, _ in flat_a}
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat_b[path]),
                                      err_msg=str(path))


def test_save_torch_prop_checkpoint_roundtrip(tmp_path):
    '''The written .pt matches the reference save_model dict layout
    (proposal_epoch_loops.py:10-25) and re-imports bit-exactly through the
    torch-free reader.'''
    dims = _pdims(False)
    params = init_multimodal_proposal_generator(jax.random.PRNGKey(2), dims)
    params['anchors_A'] = jnp.asarray([2.0, 6.0], jnp.float32)
    params['anchors_V'] = jnp.asarray([3.0, 9.0, 20.0], jnp.float32)
    path = str(tmp_path / 'best_prop_model.pt')
    save_torch_prop_checkpoint(path, params,
                               {'config': {'modality': 'audio_video'},
                                'epoch': 7, 'best_metric': 0.5})

    cpt = load_torch_checkpoint(path)        # the no-torch pickle reader
    assert cpt['epoch'] == 7 and 'anchors' in cpt
    back, cfg = import_prop_model(cpt)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_export_cli_prop(tmp_path):
    '''The export CLI turns a native prop checkpoint dir into a reference
    best_prop_model.pt (save_model layout) that re-imports bit-exactly.'''
    from bmt_tpu.config import Config, build_parser
    from bmt_tpu.scripts import export as export_cli
    from bmt_tpu.train.checkpoint import save_checkpoint

    argv = ['--procedure', 'train_prop', '--d_vid', '20', '--d_aud', '6',
            '--d_model_audio', '8', '--d_model_video', '12',
            '--d_model', '16', '--H', '2', '--N', '1',
            '--use_linear_embedder', '--anchors_num_audio', '2',
            '--anchors_num_video', '3', '--kernel_sizes_audio', '3', '5',
            '--kernel_sizes_video', '3', '--conv_layers_audio', '8', '8',
            '--conv_layers_video', '8', '--pad_audio_feats_up_to', '24',
            '--pad_video_feats_up_to', '24', '--dont_log']
    cfg = Config(build_parser().parse_args(argv))
    dims = PropModelDims.from_config(cfg)
    params = init_multimodal_proposal_generator(jax.random.PRNGKey(2),
                                                dims)
    params['anchors_A'] = jnp.asarray([2.0, 6.0], jnp.float32)
    params['anchors_V'] = jnp.asarray([3.0, 9.0, 20.0], jnp.float32)
    ckpt = tmp_path / 'ckpt'
    save_checkpoint(str(ckpt), params, {'config': cfg.to_dict(),
                                        'epoch': 7},
                    name='best_prop_model')

    pt = str(tmp_path / 'best_prop_model.pt')
    export_cli.main(['--checkpoint', str(ckpt), '--model', 'prop',
                     '--out', pt])
    cpt = load_torch_checkpoint(pt)
    assert cpt['epoch'] == 7 and 'anchors' in cpt
    back, _ = import_prop_model(cpt)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(params)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
