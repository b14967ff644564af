'''Tail batches are trained on, not dropped.

The reference trains on every batch including the short tail
(reference: epoch_loops/captioning_epoch_loops.py:122-149). Our epoch loop
keeps shapes static by repeat-padding the tail batch to the compiled batch
size and masking the padded rows out of the loss via 'row_valid'. These
tests pin the equivalence: a padded+masked step produces the SAME loss and
the SAME parameter update as stepping on the unpadded tail.
'''
import numpy as np
import jax
import jax.numpy as jnp

from bmt_tpu.models import CapModelDims, init_bimodal_transformer
from bmt_tpu.train.loops import _pad_batch_to
from bmt_tpu.train.optim import build_optimizer
from bmt_tpu.train.steps import init_train_state, make_cap_train_step

PAD = 1
DIMS = CapModelDims(voc_size=20, d_model_A=8, d_model_V=8, d_model_C=16,
                    d_model=16, H=2, N=1, d_ff_A=16, d_ff_V=16, d_ff_C=32,
                    dout_p=0.0)


class _Cfg:
    optimizer = 'adam'
    lr = 3e-3
    grad_clip = 1.0
    weight_decay = 0.0
    beta1, beta2, eps = 0.9, 0.999, 1e-8


def _tail_batch(rng, n_valid, Sv=5, Sa=6, Sc=7):
    src = {
        'rgb': rng.normal(size=(n_valid, Sv, 8)).astype(np.float32),
        'flow': rng.normal(size=(n_valid, Sv, 8)).astype(np.float32),
        'audio': rng.normal(size=(n_valid, Sa, 8)).astype(np.float32),
    }
    captions = np.full((n_valid, Sc), PAD, np.int32)
    captions[:, 0] = 2
    for b in range(n_valid):
        captions[b, 1:5] = rng.integers(4, 20, size=4)
        captions[b, 5] = 3
    return {'src': src, 'caption': captions,
            'video_ids': [f'v{i}' for i in range(n_valid)]}


def test_padded_masked_tail_step_matches_unpadded():
    rng = np.random.default_rng(0)
    batch = _tail_batch(rng, n_valid=2)
    B = 4

    padded = _pad_batch_to({k: v for k, v in batch.items()
                            if k != 'video_ids'}, B)
    padded['row_valid'] = np.arange(B) < 2

    optimizer = build_optimizer(_Cfg())
    step = make_cap_train_step(DIMS, optimizer, 0.7, PAD)
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)

    state_a = init_train_state(params, optimizer)
    state_a, metrics_a = jax.jit(step)(state_a, {
        'src': batch['src'], 'caption': batch['caption']})

    state_b = init_train_state(params, optimizer)
    state_b, metrics_b = jax.jit(step)(state_b, padded)

    np.testing.assert_allclose(float(metrics_a['loss']),
                               float(metrics_b['loss']), rtol=1e-5)
    for (path_a, leaf_a), (_, leaf_b) in zip(
            jax.tree_util.tree_leaves_with_path(state_a.params),
            jax.tree_util.tree_leaves_with_path(state_b.params)):
        np.testing.assert_allclose(np.asarray(leaf_a), np.asarray(leaf_b),
                                   atol=1e-5, err_msg=str(path_a))


def test_epoch_loop_consumes_tail_batches():
    '''train_epoch_cap steps on every batch, including a non-full tail.'''
    from bmt_tpu.train.loops import train_epoch_cap

    rng = np.random.default_rng(1)

    class FakeDataset:
        batch_size = 4

        def batches(self, epoch=0, seed=0):
            yield _tail_batch(rng, n_valid=4)
            yield _tail_batch(rng, n_valid=3)   # tail

    seen = []

    def fake_step(state, dev):
        assert dev['caption'].shape[0] == 4
        seen.append(np.asarray(dev['row_valid']).sum())
        return state, {'loss': jnp.zeros(())}

    _, _ = train_epoch_cap(fake_step, None, FakeDataset(), epoch=0)
    assert seen == [4, 3]
