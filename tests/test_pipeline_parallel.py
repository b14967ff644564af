'''Pipeline parallelism (parallel/pipeline.py): GPipe-style microbatch
pipelining of layer stacks over a 'pp' mesh axis.

Parity baseline: the sequential layer stack. fp32 tolerance note — the
model pins fp32 internally (LayerNorm cast, softmax logits), and merely
REGROUPING a batch into microbatches on one device already perturbs
gradients by ~1e-3 absolute at grad magnitudes ~1e4 (measured); the grad
assertions therefore scale atol per leaf instead of chasing bitwise
equality. Real schedule bugs (wrong stage order, dropped/duplicated
microbatches, mis-collected warm-up garbage) produce O(1) relative
errors, far above the floor.
'''
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from bmt_tpu.models.encoders import (bimodal_encoder_forward,
                                     init_bimodal_encoder)
from bmt_tpu.parallel.pipeline import (pipeline_layer_stack,
                                       pipelined_bimodal_encoder_forward,
                                       stack_layer_params)

H = 2


def _model(n_layers):
    return init_bimodal_encoder(jax.random.PRNGKey(0), 8, 8, 16, 16, 16,
                                n_layers)


def _data(rng, B=8, Sa=6, Sv=5):
    A = jnp.asarray(rng.normal(size=(B, Sa, 8)), jnp.float32)
    V = jnp.asarray(rng.normal(size=(B, Sv, 8)), jnp.float32)
    # one padded key row per modality so masking flows through the ring
    Am = jnp.asarray(np.ones((B, 1, Sa), bool).copy())
    Am = Am.at[:, :, -1].set(False)
    Vm = jnp.ones((B, 1, Sv), bool)
    return A, V, Am, Vm


def _pp_mesh(pp):
    return Mesh(np.array(jax.devices()[:pp]), ('pp',))


def _seq_forward(stacked, n_layers, A, V, Am, Vm):
    layers = [jax.tree.map(lambda x: x.reshape(n_layers, *x.shape[2:])[i],
                           stacked) for i in range(n_layers)]
    return bimodal_encoder_forward({'layers': layers}, A, V, Am, Vm, H)


@pytest.mark.parametrize('n_layers,n_micro', [(2, 4), (4, 2)])
def test_pp2_forward_matches_sequential(rng, n_layers, n_micro):
    params = _model(n_layers)
    A, V, Am, Vm = _data(rng)
    ref_Av, ref_Va = bimodal_encoder_forward(params, A, V, Am, Vm, H)

    stage = stack_layer_params(params['layers'], 2)
    Av, Va = jax.jit(lambda sp: pipelined_bimodal_encoder_forward(
        sp, A, V, Am, Vm, H, _pp_mesh(2), n_micro=n_micro))(stage)
    np.testing.assert_allclose(np.asarray(Av), np.asarray(ref_Av),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(Va), np.asarray(ref_Va),
                               rtol=1e-4, atol=1e-4)


def test_pp2_grads_match_sequential(rng):
    '''jax.grad through the pipelined forward (scan + ppermute transpose =
    pipelined backward) equals the sequential stack's gradients up to the
    measured fp32 regrouping noise.'''
    n_layers = 4
    params = _model(n_layers)
    A, V, Am, Vm = _data(rng)
    mesh = _pp_mesh(2)
    stage = stack_layer_params(params['layers'], 2)

    def loss_seq(stk):
        Av, Va = _seq_forward(stk, n_layers, A, V, Am, Vm)
        return jnp.sum(Av ** 2) + jnp.sum(Va ** 2)

    def loss_pp(stk):
        Av, Va = pipelined_bimodal_encoder_forward(
            stk, A, V, Am, Vm, H, mesh, n_micro=4)
        return jnp.sum(Av ** 2) + jnp.sum(Va ** 2)

    l1, g1 = jax.value_and_grad(loss_seq)(stage)
    l2, g2 = jax.jit(jax.value_and_grad(loss_pp))(stage)
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        # noise scale is set by the per-microbatch CONTRIBUTIONS, not the
        # final sum: a leaf whose grads nearly cancel across the batch
        # (e.g. LN biases) keeps ~1e-4-level absolute regrouping noise
        # even when its summed gradient is ~1e-5 — hence the atol floor
        scale = float(jnp.max(jnp.abs(a))) + 1.0
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=max(5e-6 * scale, 5e-4), rtol=0)
    # no gradient leaked NaN through the warm-up ticks (a zeroed carry
    # would NaN the masked softmax and poison every grad via 0 * NaN)
    assert not any(bool(jnp.any(jnp.isnan(x))) for x in jax.tree.leaves(g2))


def test_micro_batch_count_invariance(rng):
    params = _model(2)
    A, V, Am, Vm = _data(rng)
    mesh = _pp_mesh(2)
    stage = stack_layer_params(params['layers'], 2)
    outs = [np.asarray(jax.jit(lambda sp, m=m: pipelined_bimodal_encoder_forward(
        sp, A, V, Am, Vm, H, mesh, n_micro=m)[0])(stage))
        for m in (1, 2, 8)]
    np.testing.assert_allclose(outs[1], outs[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(outs[2], outs[0], rtol=1e-4, atol=1e-4)


def test_pipeline_is_real_collective_permute(rng):
    '''The compiled module must move data over the ring (ppermute) and the
    stage parameters must be device-sharded — guards against a silently
    replicated "pipeline".'''
    params = _model(2)
    A, V, Am, Vm = _data(rng)
    mesh = _pp_mesh(2)
    stage = stack_layer_params(params['layers'], 2)
    fn = jax.jit(lambda sp: pipelined_bimodal_encoder_forward(
        sp, A, V, Am, Vm, H, mesh, n_micro=4))
    hlo = fn.lower(stage).compile().as_text()
    assert 'collective-permute' in hlo, 'no ring traffic in compiled pp module'


def test_stack_layer_params_validates_divisibility():
    params = _model(3)
    with pytest.raises(ValueError):
        stack_layer_params(params['layers'], 2)
    stage = stack_layer_params(params['layers'], 3)
    leaf = jax.tree.leaves(stage)[0]
    assert leaf.shape[:2] == (3, 1)


def test_pipeline_dropout_trains(rng):
    '''Non-deterministic mode draws per-(stage, tick) dropout keys: runs,
    stays finite, differs from the deterministic pass.'''
    params = _model(2)
    A, V, Am, Vm = _data(rng)
    mesh = _pp_mesh(2)
    stage = stack_layer_params(params['layers'], 2)
    det = pipelined_bimodal_encoder_forward(
        stage, A, V, Am, Vm, H, mesh, n_micro=2)
    dr = pipelined_bimodal_encoder_forward(
        stage, A, V, Am, Vm, H, mesh, n_micro=2, dout_p=0.3,
        rng=jax.random.PRNGKey(7), deterministic=False)
    assert np.isfinite(np.asarray(dr[0])).all()
    assert float(jnp.max(jnp.abs(dr[0] - det[0]))) > 1e-3


def test_generic_stack_threads_constants(rng):
    '''pipeline_layer_stack is layer_fn-agnostic: constants ride the carry
    untouched and per-layer params apply in stack order.'''
    W = jnp.asarray(rng.normal(size=(4, 1, 3, 3)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
    flag = jnp.arange(8, dtype=jnp.int32)
    mesh = _pp_mesh(4)

    def layer_fn(p, key, carry):
        # p arrives with the (pp, local) axes already stripped
        y, f = carry
        return (y @ p['w'], f)

    y, f = pipeline_layer_stack({'w': W}, (x, flag), layer_fn, mesh, 2)
    ref = x
    for i in range(4):
        ref = ref @ W[i, 0]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(f), np.asarray(flag))
