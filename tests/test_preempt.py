'''Preemption-safe training (utils/preempt.py + batch-exact resume).

The headline property: SIGTERM mid-epoch -> rolling checkpoint after the
current batch -> resume skips exactly the trained batches -> the final
parameters are BIT-IDENTICAL to an uninterrupted run (batch order is a pure
function of (seed, epoch); the per-step dropout key folds off the restored
step counter).
'''
import json
import os
import signal

import numpy as np
import pytest

import bmt_tpu.utils.preempt as preempt_mod
from bmt_tpu.utils.preempt import PreemptionGuard

from test_drivers import mini_data, _mini_cfg  # noqa: F401  (fixture)


# ---------------------------------------------------------------------------
# guard unit tests
# ---------------------------------------------------------------------------

def test_sigterm_sets_flag_and_uninstall_restores():
    prev = signal.getsignal(signal.SIGTERM)
    guard = PreemptionGuard().install()
    try:
        assert not guard.requested
        os.kill(os.getpid(), signal.SIGTERM)
        assert guard.requested
    finally:
        guard.uninstall()
    assert signal.getsignal(signal.SIGTERM) is prev


def test_sigterm_chains_previous_handler():
    hits = []
    orig = signal.signal(signal.SIGTERM, lambda s, f: hits.append(s))
    try:
        guard = PreemptionGuard().install()
        os.kill(os.getpid(), signal.SIGTERM)
        guard.uninstall()
        assert guard.requested
        assert hits == [signal.SIGTERM]
    finally:
        signal.signal(signal.SIGTERM, orig)


# ---------------------------------------------------------------------------
# start_batch exactness (proposal dataset; captioning covered end-to-end by
# the driver test below)
# ---------------------------------------------------------------------------

def test_prop_batches_start_batch_skips_exactly(tmp_path):
    rng = np.random.default_rng(3)
    (tmp_path / 'v').mkdir()
    (tmp_path / 'a').mkdir()
    with open(tmp_path / 'train.csv', 'w') as f:
        f.write('video_id\tcaption\tstart\tend\tduration\tphase\tidx\n')
        for i in range(6):
            vid = f'v_s{i}'
            np.save(tmp_path / 'v' / f'{vid}_rgb.npy',
                    rng.normal(size=(8, 4)).astype(np.float32))
            np.save(tmp_path / 'v' / f'{vid}_flow.npy',
                    rng.normal(size=(8, 4)).astype(np.float32))
            np.save(tmp_path / 'a' / f'{vid}.npy',
                    rng.normal(size=(6, 3)).astype(np.float32))
            f.write(f'{vid}\ta man runs\t1.0\t8.0\t10.0\ttrain\t{i}\n')

    from bmt_tpu.config import Config
    cfg = Config.from_dict({
        'train_meta_path': str(tmp_path / 'train.csv'),
        'val_1_meta_path': str(tmp_path / 'train.csv'),
        'val_2_meta_path': str(tmp_path / 'train.csv'),
        'modality': 'audio_video', 'video_feature_name': 'i3d',
        'audio_feature_name': 'vggish',
        'video_features_path': str(tmp_path / 'v'),
        'audio_features_path': str(tmp_path / 'a'),
        'd_vid': 4, 'd_aud': 3, 'start_token': '<s>', 'end_token': '</s>',
        'pad_token': '<blank>', 'min_freq_caps': 1, 'train_batch_size': 2,
        'inference_batch_size': 2, 'max_len': 30,
        'pad_audio_feats_up_to': 16, 'pad_video_feats_up_to': 12,
    })
    from bmt_tpu.data.proposal_data import ProposalDataset
    ds = ProposalDataset(cfg, 'train', pad_idx=1,
                         cache_dir=str(tmp_path / 'cache'))
    full = list(ds.batches(epoch=1, seed=5, prefetch=0))
    tail = list(ds.batches(epoch=1, seed=5, prefetch=0, start_batch=2))
    assert len(tail) == len(full) - 2
    for a, b in zip(full[2:], tail):
        assert a['video_ids'] == b['video_ids']
        np.testing.assert_array_equal(a['src']['rgb'], b['src']['rgb'])


# ---------------------------------------------------------------------------
# end-to-end: interrupted + resumed == uninterrupted, bit for bit
# ---------------------------------------------------------------------------

class _FireAtBatch(PreemptionGuard):
    '''Deterministic stand-in: "SIGTERM arrives during batch N" without
    real signal timing. The flag is polled once per optimizer step, so the
    N-th poll firing emulates the real handler exactly; once fired it
    stays up (like the real flag).'''
    N = 1

    def __init__(self, signals=None):
        super().__init__(signals=())
        self._polls = 0
        self._fired = False

    def install(self):
        return self

    @property
    def requested(self):
        if not self._fired:
            self._polls += 1
            if self._polls >= self.N:
                self._fired = True
        return self._fired

    @requested.setter
    def requested(self, v):   # parent __init__ writes False; ignore
        pass


def _params_npz(cfg, name):
    path = os.path.join(cfg.model_checkpoint_path, f'{name}.params.npz')
    with np.load(path) as z:
        return {k: z[k].copy() for k in z.files}


def _meta(cfg, name):
    with open(os.path.join(cfg.model_checkpoint_path,
                           f'{name}.meta.json')) as f:
        return json.load(f)


@pytest.mark.slow
def test_preempt_resume_bit_identical_cap(mini_data, tmp_path, monkeypatch):
    from bmt_tpu.train.cap_trainer import train_cap
    common = dict(epoch_num=2, one_by_one_starts_at=9)  # skip 1-by-1 decode

    # A: uninterrupted two epochs
    cfg_a = _mini_cfg(mini_data, tmp_path / 'a', 'train_cap',
                      exper_name='preA', **common)
    train_cap(cfg_a)
    ref = _params_npz(cfg_a, 'last_cap_model')

    # B1: "SIGTERM" during epoch 0 batch 2 -> rolling ckpt + clean exit
    cfg_b = _mini_cfg(mini_data, tmp_path / 'b', 'train_cap',
                      exper_name='preB', **common)
    with monkeypatch.context() as m:
        m.setattr(preempt_mod, 'PreemptionGuard', _FireAtBatch)
        train_cap(cfg_b)
    meta = _meta(cfg_b, 'last_cap_model')
    assert meta['epoch'] == -1          # no epoch completed yet
    assert meta['batch_in_epoch'] == 1  # next unprocessed batch
    mid = _params_npz(cfg_b, 'last_cap_model')
    assert any(not np.array_equal(ref[k], mid[k]) for k in ref), \
        'mid-epoch checkpoint should differ from the finished run'

    # B2: resume (same experiment dir) -> finishes epochs 0 and 1
    cfg_b2 = _mini_cfg(mini_data, tmp_path / 'b', 'train_cap',
                       exper_name='preB', **common)
    train_cap(cfg_b2)
    out = _params_npz(cfg_b2, 'last_cap_model')
    assert set(out) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)
    assert _meta(cfg_b2, 'last_cap_model')['epoch'] == 1


@pytest.mark.slow
def test_preempt_resume_bit_identical_prop(mini_data, tmp_path, monkeypatch):
    from bmt_tpu.train.prop_trainer import train_prop
    common = dict(epoch_num=2)

    # B=2 -> train_batch_size 4 -> two proposal batches per epoch,
    # so firing at batch 1 is a genuine mid-epoch interruption
    cfg_a = _mini_cfg(mini_data, tmp_path / 'a', 'train_prop',
                      exper_name='ppA', B=2, **common)
    train_prop(cfg_a)
    ref = _params_npz(cfg_a, 'last_prop_model')

    cfg_b = _mini_cfg(mini_data, tmp_path / 'b', 'train_prop',
                      exper_name='ppB', B=2, **common)
    with monkeypatch.context() as m:
        m.setattr(preempt_mod, 'PreemptionGuard', _FireAtBatch)
        train_prop(cfg_b)
    meta = _meta(cfg_b, 'last_prop_model')
    assert meta['epoch'] == -1 and meta['batch_in_epoch'] == 1

    cfg_b2 = _mini_cfg(mini_data, tmp_path / 'b', 'train_prop',
                       exper_name='ppB', B=2, **common)
    train_prop(cfg_b2)
    out = _params_npz(cfg_b2, 'last_prop_model')
    for k in ref:
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)
