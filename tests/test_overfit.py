'''Learning-dynamics test: the captioner memorizes a tiny dataset.

Trains the bimodal transformer on 4 fixed (features, caption) pairs for a
few hundred steps and asserts (a) the loss drops substantially and (b)
greedy decoding reproduces the training captions token-for-token — the
end-to-end proof that forward, loss, gradients, optimizer and the KV-cached
decoder are consistent with each other.'''
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bmt_tpu.decode import greedy_decode_bimodal
from bmt_tpu.models import CapModelDims, init_bimodal_transformer
from bmt_tpu.train.optim import build_optimizer
from bmt_tpu.train.steps import init_train_state, make_cap_train_step

PAD, START, END = 1, 2, 3
DIMS = CapModelDims(voc_size=20, d_model_A=8, d_model_V=8, d_model_C=16,
                    d_model=16, H=2, N=1, d_ff_A=16, d_ff_V=16, d_ff_C=32,
                    dout_p=0.0)


class _Cfg:
    optimizer = 'adam'
    lr = 3e-3
    grad_clip = 1.0
    weight_decay = 0.0
    beta1, beta2, eps = 0.9, 0.999, 1e-8


@pytest.mark.slow
def test_overfit_and_decode_memorized_captions(rng):
    B, Sv, Sa, Sc = 4, 6, 8, 7
    src = {
        'rgb': jnp.asarray(rng.normal(size=(B, Sv, 8)), jnp.float32),
        'flow': jnp.asarray(rng.normal(size=(B, Sv, 8)), jnp.float32),
        'audio': jnp.asarray(rng.normal(size=(B, Sa, 8)), jnp.float32),
    }
    # distinct caption per sample: <s> w w w w w </s>
    captions = np.full((B, Sc), PAD, np.int32)
    captions[:, 0] = START
    for b in range(B):
        captions[b, 1:6] = rng.integers(4, 20, size=5)
        captions[b, 6] = END
    batch = {'src': src, 'caption': jnp.asarray(captions)}

    optimizer = build_optimizer(_Cfg())
    step = jax.jit(make_cap_train_step(DIMS, optimizer, 0.0, PAD),
                   donate_argnums=(0,))
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    state = init_train_state(params, optimizer)

    first_loss = None
    for _ in range(300):
        state, metrics = step(state, batch)
        if first_loss is None:
            first_loss = float(metrics['loss'])
    final_loss = float(metrics['loss'])
    assert final_loss < first_loss * 0.05, (first_loss, final_loss)

    toks = np.asarray(greedy_decode_bimodal(state.params, DIMS, src,
                                            Sc - 1, START, END, PAD))
    for b in range(B):
        expected = captions[b, :7].tolist()
        got = toks[b, :7].tolist()
        assert got == expected, (b, got, expected)
