'''Shared fixtures for the multi-process smoke test: a tiny deterministic
model + batch built identically in the test process and in every worker.'''
import numpy as np

from bmt_tpu.models import CapModelDims

DIMS = CapModelDims(voc_size=20, d_model_A=8, d_model_V=8, d_model_C=16,
                    d_model=16, H=2, N=1, d_ff_A=16, d_ff_V=16, d_ff_C=32,
                    dout_p=0.0)


class OptCfg:
    optimizer = 'adam'
    lr = 3e-3
    grad_clip = 1.0
    weight_decay = 0.0
    beta1, beta2, eps = 0.9, 0.999, 1e-8


def make_batch(B=4, Sv=5, Sa=6, Sc=7):
    rng = np.random.default_rng(0)
    src = {
        'rgb': rng.normal(size=(B, Sv, 8)).astype(np.float32),
        'flow': rng.normal(size=(B, Sv, 8)).astype(np.float32),
        'audio': rng.normal(size=(B, Sa, 8)).astype(np.float32),
    }
    captions = np.full((B, Sc), 1, np.int32)
    captions[:, 0] = 2
    captions[:, 1:5] = rng.integers(4, 20, size=(B, 4))
    captions[:, 5] = 3
    return {'src': src, 'caption': captions}
