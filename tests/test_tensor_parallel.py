'''Tensor-parallel (dp x mp) correctness: a dp=2 x mp=4 sharded train step
matches the dp=1 step bit-for-bit up to reduction-order noise.'''
import numpy as np
import jax
import jax.numpy as jnp

from bmt_tpu.models import CapModelDims, init_bimodal_transformer
from bmt_tpu.parallel import (DataParallel, cap_param_shardings, make_mesh,
                              place_params, shard_batch)
from bmt_tpu.train.optim import build_optimizer
from bmt_tpu.train.steps import init_train_state, make_cap_train_step

DIMS = CapModelDims(voc_size=32, d_model_A=8, d_model_V=8, d_model_C=8,
                    d_model=16, H=2, N=1, d_ff_A=16, d_ff_V=16, d_ff_C=16,
                    dout_p=0.0)


class _Cfg:
    optimizer = 'adam'
    lr = 1e-3
    grad_clip = None
    weight_decay = 0.0
    beta1, beta2, eps = 0.9, 0.999, 1e-8


def _batch(rng, B=8):
    return {
        'src': {
            'rgb': rng.normal(size=(B, 5, 8)).astype(np.float32),
            'flow': rng.normal(size=(B, 5, 8)).astype(np.float32),
            'audio': rng.normal(size=(B, 6, 8)).astype(np.float32),
        },
        'caption': rng.integers(4, 32, size=(B, 6)).astype(np.int32),
    }


def _run(mesh, batch):
    optimizer = build_optimizer(_Cfg())
    step = jax.jit(make_cap_train_step(DIMS, optimizer, 0.7, 1),
                   donate_argnums=(0,))
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    params = place_params(params, mesh)
    state = init_train_state(params, optimizer)
    state, metrics = step(state, shard_batch(mesh, batch))
    return float(metrics['loss']), jax.tree.map(np.asarray, state.params)


def test_param_shardings_shapes():
    mesh = make_mesh(dp=2, mp=4)
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    sh = cap_param_shardings(params, mesh)
    enc0 = params['encoder']['layers'][0]
    enc0_sh = sh['encoder']['layers'][0]
    # fc1 of M1 FFN: (8, 16) column-sharded over mp=4
    assert enc0_sh['ff_M1']['fc1']['w'].spec == ('mp',) or \
        tuple(enc0_sh['ff_M1']['fc1']['w'].spec) == (None, 'mp')
    # layer norm replicated
    assert tuple(enc0_sh['res_M1'][0]['scale'].spec) == ()
    # placement works
    placed = place_params(params, mesh)
    leaf = placed['encoder']['layers'][0]['ff_M1']['fc1']['w']
    shard_shapes = {s.data.shape for s in leaf.addressable_shards}
    assert shard_shapes == {(8, 4)}  # 16 / mp=4


def test_dp2_mp4_matches_dp1(rng):
    assert len(jax.devices()) >= 8
    batch = _batch(rng)

    loss_ref, params_ref = _run(make_mesh(dp=1, mp=1), batch)
    loss_tp, params_tp = _run(make_mesh(dp=2, mp=4), batch)

    np.testing.assert_allclose(loss_tp, loss_ref, rtol=1e-5)
    # adam's rsqrt amplifies all-reduce ordering noise on tiny grads; the
    # update magnitude is lr=1e-3, so 3e-4 bounds it well below a sign flip
    for a, b in zip(jax.tree.leaves(params_ref), jax.tree.leaves(params_tp)):
        np.testing.assert_allclose(b, a, atol=3e-4)


def test_jit_step_preserves_mp_shardings():
    '''DataParallel.jit_step with mp > 1 must INHERIT the params' Megatron
    shardings (place_params) instead of pinning them replicated — pinning
    would silently undo tensor parallelism on every call.'''
    import numpy as np
    import optax
    from bmt_tpu.parallel import DataParallel, place_params

    dp = DataParallel(dp=4, mp=2)
    params = {'layer': {'fc1': {'w': jnp.ones((8, 16)), 'b': jnp.ones((16,))}}}
    params = place_params(params, dp.mesh)
    w_spec = params['layer']['fc1']['w'].sharding.spec
    assert 'mp' in str(w_spec)      # column-sharded by the rules

    tx = optax.sgd(1e-2)

    def step(state, batch):
        p, opt = state
        g = jax.tree.map(lambda x: x * 0 + batch['x'].mean(), p)
        upd, opt = tx.update(g, opt, p)
        return (optax.apply_updates(p, upd), opt), jnp.zeros(())

    jstep = dp.jit_step(step)
    state = (params, tx.init(params))
    batch = {'x': np.ones((8, 4), np.float32)}
    (p2, _), _ = jstep(state, dp.shard(batch))
    # the updated params keep the mp sharding (not forced replicated)
    assert 'mp' in str(p2['layer']['fc1']['w'].sharding.spec)


def test_lora_adapters_mirror_base_mp_layout(rng):
    '''LoRA leaves shard like their base weight (ops/lora.py docstring):
    column-parallel linears shard lora_b's output dim, row-parallel ones
    shard lora_a's input dim, lora_s stays replicated — and the dp2 x mp4
    LoRA train step (base frozen, gradient pruning on) matches dp1.'''
    from bmt_tpu.ops.lora import add_lora, lora_frozen_predicate
    from bmt_tpu.parallel import cap_param_shardings
    from bmt_tpu.train.optim import freeze_mask

    def make_params():
        # rebuilt per run: the jitted step donates the state, and dp=1
        # place_params is a no-copy placement, so sharing one tree across
        # runs would read deleted buffers
        return add_lora(init_bimodal_transformer(jax.random.PRNGKey(0),
                                                 DIMS),
                        2, jax.random.PRNGKey(5), targets='attn_ffn')

    params = make_params()
    mesh = make_mesh(dp=2, mp=4)
    sh = cap_param_shardings(params, mesh)
    enc0 = sh['encoder']['layers'][0]
    assert tuple(enc0['ff_M1']['fc1']['lora_b'].spec) == (None, 'mp')
    assert tuple(enc0['ff_M1']['fc2']['lora_a'].spec) == ('mp', None)
    assert tuple(enc0['ff_M1']['fc1']['lora_s'].spec) == ()
    # attention projections: q2d/k2d/v2d are column-parallel, d2q row
    dec0 = sh['decoder']['layers'][0]
    assert tuple(dec0['self_att']['q2d']['lora_b'].spec) == (None, 'mp')
    assert tuple(dec0['self_att']['d2q']['lora_a'].spec) == ('mp', None)

    mask = freeze_mask(params, lora_frozen_predicate)

    class _LoraCfg(_Cfg):
        lora_rank = 2

    def run(mesh):
        optimizer = build_optimizer(_LoraCfg(), frozen_mask=mask)
        step = jax.jit(make_cap_train_step(DIMS, optimizer, 0.7, 1,
                                           frozen_mask=mask),
                       donate_argnums=(0,))
        placed = place_params(make_params(), mesh)
        state = init_train_state(placed, optimizer)
        batch = _batch(np.random.default_rng(3))
        state, metrics = step(state, shard_batch(mesh, batch))
        return float(metrics['loss']), jax.tree.map(np.asarray, state.params)

    loss_ref, params_ref = run(make_mesh(dp=1, mp=1))
    loss_tp, params_tp = run(make_mesh(dp=2, mp=4))
    np.testing.assert_allclose(loss_tp, loss_ref, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(params_ref), jax.tree.leaves(params_tp)):
        np.testing.assert_allclose(b, a, atol=3e-4)
