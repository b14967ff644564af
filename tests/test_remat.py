'''Rematerialization: remat=True produces identical outputs and grads.'''
import numpy as np
import jax
import jax.numpy as jnp

from bmt_tpu.models import CapModelDims, init_bimodal_transformer
from bmt_tpu.models.captioning import bimodal_transformer_forward
from bmt_tpu.ops.masks import make_masks
from bmt_tpu.train.losses import caption_loss

BASE = dict(voc_size=23, d_model_A=8, d_model_V=12, d_model_C=10, d_model=16,
            H=2, N=2, d_ff_A=16, d_ff_V=24, d_ff_C=20, dout_p=0.0)


def test_remat_identical_forward_and_grads(rng):
    dims = CapModelDims(**BASE)
    dims_r = CapModelDims(**BASE, remat=True)
    params = init_bimodal_transformer(jax.random.PRNGKey(0), dims)

    src = {'rgb': jnp.asarray(rng.normal(size=(2, 5, 12)), jnp.float32),
           'flow': jnp.asarray(rng.normal(size=(2, 5, 12)), jnp.float32),
           'audio': jnp.asarray(rng.normal(size=(2, 7, 8)), jnp.float32)}
    trg = jnp.asarray(rng.integers(4, 23, size=(2, 5)), jnp.int32)
    masks = make_masks(src, trg[:, :-1], 'audio_video', 1)

    def loss(p, d):
        lp = bimodal_transformer_forward(p, d, src, trg[:, :-1], masks,
                                         deterministic=True)
        return caption_loss(lp, trg[:, 1:], 0.7, 1)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, dims))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(p, dims_r))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)
