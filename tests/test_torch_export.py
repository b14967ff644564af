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
