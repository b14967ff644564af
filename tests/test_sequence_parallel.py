'''Sequence (context) parallelism over the mesh's ``sp`` axis.

The proposal stage's Sa=800/Sv=300 sequences are the framework's
long-sequence path; ``--sp_devices`` shards them across devices
(parallel/seq.py) with GSPMD inserting attention K/V gathers and conv halo
exchanges. These tests pin (a) numerical equivalence of sp-sharded
training/inference against single-device runs, (b) that the sharding is
real (collectives appear in the compiled module and the per-device shards
actually split the sequence axis), and (c) that the constraints are inert
outside a sequence_parallel context.
'''
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bmt_tpu.models import (PropModelDims,
                            init_multimodal_proposal_generator,
                            init_unimodal_proposal_generator)
from bmt_tpu.parallel import DataParallel, make_mesh, sequence_parallel, shard_seq
from bmt_tpu.train.optim import build_optimizer
from bmt_tpu.train.steps import (init_train_state, make_prop_inference_step,
                                 make_prop_train_step)

# dropout off: the sp/dp equivalence must not depend on RNG partitioning
DIMS = PropModelDims(d_model_A=8, d_model_V=8, d_model=16, H=2, N=1,
                     d_ff_A=16, d_ff_V=16, d_vid=8, d_aud=8,
                     kernel_sizes_A=(3, 5), kernel_sizes_V=(3,),
                     conv_layers_A=(8,), conv_layers_V=(8,),
                     anchors_num_A=2, anchors_num_V=2, dout_p=0.0)


class _Cfg:
    # small lr: after one Adam step from zero moments the update is
    # +-lr*~1 elementwise, so an fp-noise-induced sign flip on a
    # near-zero gradient perturbs a parameter by up to 2*lr — keep that
    # below the comparison tolerance instead of hoping no tiny gradient
    # sits within reduction-reorder noise of zero
    optimizer = 'adam'
    lr = 1e-4
    grad_clip = 1.0
    weight_decay = 0.0
    beta1, beta2, eps = 0.9, 0.999, 1e-8


def _params():
    p = init_multimodal_proposal_generator(jax.random.PRNGKey(0), DIMS)
    p['anchors_A'] = jnp.asarray([2.0, 6.0], jnp.float32)
    p['anchors_V'] = jnp.asarray([3.0, 9.0], jnp.float32)
    return p


def _batch(rng, B=4, Sv=8, Sa=16, E=3):
    return {
        'src': {
            'rgb': rng.normal(size=(B, Sv, 8)).astype(np.float32),
            'flow': rng.normal(size=(B, Sv, 8)).astype(np.float32),
            'audio': rng.normal(size=(B, Sa, 8)).astype(np.float32),
        },
        'centers': rng.uniform(1, 15, size=(B, E)).astype(np.float32),
        'lengths': rng.uniform(1, 6, size=(B, E)).astype(np.float32),
        'valid': np.ones((B, E), bool),
    }


def _run_train_step(batch, dp_size, sp_size):
    dp = DataParallel(dp=dp_size, sp=sp_size)
    seq_mesh = dp.mesh if sp_size > 1 else None
    optimizer = build_optimizer(_Cfg())
    step = dp.jit_step(make_prop_train_step(DIMS, optimizer, 1,
                                            seq_mesh=seq_mesh))
    state = init_train_state(_params(), optimizer)
    state = state._replace(params=dp.replicate_tree(state.params),
                           opt_state=dp.replicate_tree(state.opt_state))
    state, metrics = step(state, dp.shard(batch))
    return float(metrics['loss']), jax.tree.map(np.asarray, state.params)


def test_sp_train_step_matches_single_device(rng):
    batch = _batch(rng)
    loss1, params1 = _run_train_step(batch, 1, 1)
    loss_sp, params_sp = _run_train_step(batch, 2, 2)
    np.testing.assert_allclose(loss_sp, loss1, rtol=1e-5)
    # collective reduction order differs -> fp32 noise; through one Adam
    # step that is bounded by ~2*lr (see _Cfg)
    for a, b in zip(jax.tree.leaves(params1), jax.tree.leaves(params_sp)):
        np.testing.assert_allclose(b, a, atol=2.5e-4)


def test_sp4_inference_matches_single_device(rng):
    batch = _batch(rng)
    params = _params()

    plain = np.asarray(make_prop_inference_step(DIMS, 1)(
        params, {'src': batch['src']}))

    dp = DataParallel(dp=2, sp=4)
    step = jax.jit(make_prop_inference_step(DIMS, 1, seq_mesh=dp.mesh))
    sharded = np.asarray(step(dp.replicate_tree(params),
                              dp.shard({'src': batch['src']})))
    np.testing.assert_allclose(sharded, plain, rtol=2e-5, atol=1e-5)


def test_sp_sharding_is_real_not_replicated(rng):
    '''The compiled sp module must contain cross-device collectives and the
    batch features must actually be split along the sequence axis — guards
    against the constraints silently degrading to full replication.'''
    batch = _batch(rng)
    dp = DataParallel(dp=1, sp=4)

    placed = dp.shard({'src': batch['src']})
    shard_shapes = {s.data.shape
                    for s in placed['src']['audio'].addressable_shards}
    assert shard_shapes == {(4, 4, 8)}, shard_shapes  # Sa=16 / sp4

    step = jax.jit(make_prop_inference_step(DIMS, 1, seq_mesh=dp.mesh))
    compiled = step.lower(dp.replicate_tree(_params()), placed).compile()
    hlo = compiled.as_text()
    assert ('all-gather' in hlo or 'collective-permute' in hlo
            or 'all-reduce' in hlo or 'all-to-all' in hlo), (
        'no collectives in the sp-sharded module — sequence axis was '
        'replicated away')


def test_sp_unimodal_prop_matches_single_device(rng):
    dims = PropModelDims(modality='video', d_model_V=8, d_model=16, H=2,
                         N=1, d_ff_V=16, d_vid=8,
                         kernel_sizes_V=(3, 5), conv_layers_V=(8,),
                         anchors_num_V=2, dout_p=0.0)
    params = init_unimodal_proposal_generator(jax.random.PRNGKey(0), dims)
    params['anchors'] = jnp.asarray([3.0, 9.0], jnp.float32)
    src = _batch(rng)['src']

    plain = np.asarray(make_prop_inference_step(dims, 1)(
        params, {'src': src}))

    dp = DataParallel(dp=2, sp=2)
    step = jax.jit(make_prop_inference_step(dims, 1, seq_mesh=dp.mesh))
    sharded = np.asarray(step(dp.replicate_tree(params),
                              dp.shard({'src': src})))
    np.testing.assert_allclose(sharded, plain, rtol=2e-5, atol=1e-5)


def test_shard_seq_noop_outside_context():
    x = jnp.ones((4, 8, 3))
    assert shard_seq(x) is x
    # indivisible sequence axes fall back to identity inside the context
    mesh = make_mesh(dp=2, sp=4)
    with sequence_parallel(mesh):
        y = jnp.ones((4, 9, 3))
        assert shard_seq(y) is y
    # sp=1 context is inert as well
    with sequence_parallel(make_mesh(dp=8)):
        assert shard_seq(x) is x


def test_make_mesh_sp_validation():
    with pytest.raises(ValueError):
        make_mesh(dp=4, sp=4)  # 16 > 8 virtual devices
    mesh = make_mesh(dp=2, sp=2, mp=2)
    assert mesh.shape == {'dp': 2, 'sp': 2, 'ep': 1, 'mp': 2}
