'''Data-parallel correctness: a dp=8 sharded train step produces the same
loss and parameter update as dp=1 on the identical batch.'''
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bmt_tpu.models import CapModelDims, init_bimodal_transformer
from bmt_tpu.parallel import DataParallel, make_mesh
from bmt_tpu.train.optim import build_optimizer
from bmt_tpu.train.steps import init_train_state, make_cap_train_step

DIMS = CapModelDims(voc_size=31, d_model_A=8, d_model_V=8, d_model_C=8,
                    d_model=16, H=2, N=1, d_ff_A=16, d_ff_V=16, d_ff_C=16,
                    dout_p=0.0)  # dropout off: per-device rngs would differ


class _Cfg:
    optimizer = 'adam'
    lr = 1e-3
    grad_clip = 1.0
    weight_decay = 0.0
    beta1, beta2, eps = 0.9, 0.999, 1e-8


def _batch(rng, B=8):
    return {
        'src': {
            'rgb': rng.normal(size=(B, 5, 8)).astype(np.float32),
            'flow': rng.normal(size=(B, 5, 8)).astype(np.float32),
            'audio': rng.normal(size=(B, 6, 8)).astype(np.float32),
        },
        'caption': rng.integers(4, 31, size=(B, 6)).astype(np.int32),
    }


def _run_step(dp_size, batch):
    dp = DataParallel(dp=dp_size)
    optimizer = build_optimizer(_Cfg())
    step = dp.jit_step(make_cap_train_step(DIMS, optimizer, 0.7, 1))
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    state = init_train_state(params, optimizer)
    state = state._replace(params=dp.replicate_tree(state.params),
                           opt_state=dp.replicate_tree(state.opt_state))
    state, metrics = step(state, dp.shard(batch))
    return (float(metrics['loss']),
            jax.tree.map(np.asarray, state.params))


def test_dp8_matches_dp1(rng):
    assert len(jax.devices()) >= 8
    batch = _batch(rng)
    loss1, params1 = _run_step(1, batch)
    loss8, params8 = _run_step(8, batch)
    np.testing.assert_allclose(loss8, loss1, rtol=1e-5)
    # gradient all-reduce order differs across mesh sizes -> fp32 noise
    for a, b in zip(jax.tree.leaves(params1), jax.tree.leaves(params8)):
        np.testing.assert_allclose(b, a, atol=1e-4)


def test_dp8_greedy_decode_matches_dp1(rng):
    '''Sharding the feature stacks over a dp=8 mesh partitions the whole
    KV-cached greedy decode (encoder + while_loop steps) and produces the
    identical tokens as single-device decode — the pod-scale batched
    decode path used by validation_1by1.'''
    from bmt_tpu.decode import greedy_decode_bimodal

    assert len(jax.devices()) >= 8
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    src = _batch(rng)['src']

    single = np.asarray(greedy_decode_bimodal(params, DIMS, src, 6, 2, 3, 1))

    dp = DataParallel(dp=8)
    sharded = np.asarray(greedy_decode_bimodal(
        dp.replicate_tree(params), DIMS, dp.shard(src), 6, 2, 3, 1))
    np.testing.assert_array_equal(sharded, single)


def test_dp8_beam_search_matches_dp1(rng):
    '''Beam search (batch tiled x K beams inside) also partitions cleanly
    over the dp mesh: same best tokens and scores as single-device.'''
    from bmt_tpu.decode import beam_search_bimodal

    assert len(jax.devices()) >= 8
    params = init_bimodal_transformer(jax.random.PRNGKey(0), DIMS)
    src = _batch(rng)['src']

    toks1, scores1 = beam_search_bimodal(params, DIMS, src, 6, 2, 3, 1,
                                         beam_size=3)
    dp = DataParallel(dp=8)
    toks8, scores8 = beam_search_bimodal(dp.replicate_tree(params), DIMS,
                                         dp.shard(src), 6, 2, 3, 1,
                                         beam_size=3)
    np.testing.assert_array_equal(np.asarray(toks8), np.asarray(toks1))
    np.testing.assert_allclose(np.asarray(scores8), np.asarray(scores1),
                               rtol=1e-5)


def test_make_decode_fn_shards_only_divisible_batches(rng):
    '''The shared decode wrapper shards over dp when the batch divides the
    mesh and silently falls back to single-device otherwise (odd eval
    tails must not error mid-run).'''
    from bmt_tpu.train.loops import make_decode_fn

    dp = DataParallel(dp=8)
    seen = []

    def fake_greedy(params, src):
        seen.append(len(src['rgb'].sharding.device_set))
        return jnp.zeros((src['rgb'].shape[0], 3), jnp.int32)

    fn = make_decode_fn(fake_greedy, dp, jnp.float32)
    src8 = {k: jnp.asarray(v) for k, v in _batch(rng, B=8)['src'].items()}
    src6 = {k: jnp.asarray(v) for k, v in _batch(rng, B=6)['src'].items()}
    fn(None, src8)
    fn(None, src6)
    assert seen[0] == 8          # sharded over the whole mesh
    assert seen[1] == 1          # fallback: single device


def test_mesh_has_room_for_model_parallel_axis():
    mesh = make_mesh(dp=4, mp=2)
    assert mesh.shape == {'dp': 4, 'sp': 1, 'ep': 1, 'mp': 2}


def test_shard_batch_places_on_dp(rng):
    dp = DataParallel(dp=8)
    batch = dp.shard(_batch(rng, B=8))
    sharding = batch['src']['rgb'].sharding
    # batch axis split over 8 devices
    shard_shapes = {s.data.shape for s in batch['src']['rgb'].addressable_shards}
    assert shard_shapes == {(1, 5, 8)}


def test_make_mesh_rejects_oversized_and_zero_dp():
    import pytest
    from bmt_tpu.parallel import make_mesh
    with pytest.raises(ValueError):
        make_mesh(mp=16)            # mp > devices -> dp would be 0
    with pytest.raises(ValueError):
        make_mesh(dp=5, mp=2)       # 10 > 8 virtual devices
