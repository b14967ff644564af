'''Round-trip: save a reference-format .pt with save_torch_checkpoint, load
it back via the import path, verify params and pickled config survive.'''
import os

import numpy as np
import jax

from bmt_tpu.models import CapModelDims, init_bimodal_transformer
from bmt_tpu.train.checkpoint import (import_cap_model, load_torch_checkpoint,
                                      save_torch_checkpoint)

SMALL = CapModelDims(voc_size=23, d_model_A=8, d_model_V=12, d_model_C=10,
                     d_model=16, H=2, N=2, d_ff_A=16, d_ff_V=24, d_ff_C=20)


def test_save_torch_checkpoint_roundtrip(tmp_path):
    params = init_bimodal_transformer(jax.random.PRNGKey(3), SMALL)
    meta = {'config': {'d_model': 16, 'modality': 'audio_video',
                       'max_len': 30},
            'epoch': 12, 'trg_voc_size': 23,
            'val_1_metrics': {'METEOR': 0.1}}
    path = os.path.join(tmp_path, 'best_cap_model.pt')
    save_torch_checkpoint(path, params, meta)

    cpt = load_torch_checkpoint(path)
    assert cpt['epoch'] == 12
    assert cpt['trg_voc_size'] == 23
    assert cpt['config']['d_model'] == 16
    # state_dict keys carry the DataParallel 'module.' prefix like the
    # reference's checkpoints
    assert all(k.startswith('module.') for k in cpt['model_state_dict'])

    imported, _ = import_cap_model(cpt)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(imported)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # the pickled config class is addressed as
    # utilities.config_constructor.Config (what the reference unpickles)
    import zipfile
    with zipfile.ZipFile(path) as z:
        pkl_name = [n for n in z.namelist() if n.endswith('data.pkl')][0]
        raw = z.read(pkl_name)
    assert b'utilities' in raw and b'Config' in raw


def test_export_cli_cap_and_merged_npz(tmp_path):
    '''The export CLI turns a native checkpoint dir into (a) a reference
    .pt the import path round-trips, and (b) a merged plain-params npz
    when the checkpoint is a LoRA finetune.'''
    from bmt_tpu.config import Config, build_parser
    from bmt_tpu.ops.lora import add_lora, count_lora, merge_lora
    from bmt_tpu.scripts import export as export_cli
    from bmt_tpu.train.checkpoint import load_pytree_npz, save_checkpoint

    argv = ['--procedure', 'train_cap', '--d_vid', '12', '--d_aud', '8',
            '--d_model_video', '12', '--d_model_audio', '8',
            '--d_model', '16', '--d_model_caps', '10', '--H', '2',
            '--N', '2', '--max_len', '30', '--dont_log',
            '--use_linear_embedder', '--lora_rank', '2']
    cfg = Config(build_parser().parse_args(argv))
    itos = ['<unk>', '<blank>', '<s>', '</s>'] + [f'w{i}' for i in range(19)]
    dims = CapModelDims.from_config(cfg, len(itos))
    base = init_bimodal_transformer(jax.random.PRNGKey(3), dims)
    adapted = add_lora(base, 2, jax.random.PRNGKey(5), targets='attn')

    def bump(node):
        if isinstance(node, dict):
            return {k: (v + 0.2 if k == 'lora_b' else bump(v))
                    for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(bump(v) for v in node)
        return node

    adapted = bump(adapted)
    ckpt = tmp_path / 'ckpt'
    save_checkpoint(str(ckpt), adapted,
                    {'config': cfg.to_dict(), 'epoch': 3,
                     'trg_voc_size': len(itos), 'vocab_itos': itos})

    # (a) .pt export: adapters folded, import path round-trips the MERGED
    pt = str(tmp_path / 'best_cap_model.pt')
    export_cli.main(['--checkpoint', str(ckpt), '--out', pt])
    imported, _ = import_cap_model(load_torch_checkpoint(pt))
    merged = merge_lora(adapted)
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(imported)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)

    # (b) npz export: plain merged tree, no adapter leaves
    out_npz = str(tmp_path / 'merged.npz')
    export_cli.main(['--checkpoint', str(ckpt), '--out', out_npz])
    plain = load_pytree_npz(out_npz, merged)
    assert count_lora(plain) == (0, 0)
    for a, b in zip(jax.tree.leaves(merged), jax.tree.leaves(plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
