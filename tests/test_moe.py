'''Mixture-of-Experts FFN + expert parallelism (ops/moe.py).

Covers: E=1 exactness vs the dense FFN, Switch aux-loss semantics, capacity
overflow -> residual passthrough, batch-row independence (serving contract),
full bimodal model integration (train step with aux, cached greedy decode
parity), and ep-mesh sharding equivalence on the 8-device CPU mesh.
'''
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmt_tpu.ops.layers import feed_forward
from bmt_tpu.ops.moe import ffn_apply, init_moe_ffn, moe_feed_forward


def _dense_view(pm, e=0):
    return {'fc1': {'w': pm['experts']['w1'][e], 'b': pm['experts']['b1'][e]},
            'fc2': {'w': pm['experts']['w2'][e], 'b': pm['experts']['b2'][e]}}


def test_moe_e1_equals_dense():
    '''With one expert the router prob is exactly 1.0 and capacity holds
    every token -> bit-equal to the dense FFN with the same weights.'''
    pm = init_moe_ffn(jax.random.PRNGKey(0), 8, 32, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8))
    y_moe = moe_feed_forward(pm, x, capacity_factor=10.0)
    y_dense = feed_forward(_dense_view(pm), x)
    np.testing.assert_array_equal(np.asarray(y_moe), np.asarray(y_dense))


def test_moe_aux_balanced_is_one():
    '''A uniform router (zero weights) gives f_e = dispatch fractions that
    average to 1/E and P_e = 1/E exactly -> aux == 1.0.'''
    pm = init_moe_ffn(jax.random.PRNGKey(0), 8, 16, 4)
    pm['router']['w'] = jnp.zeros_like(pm['router']['w'])
    aux = []
    moe_feed_forward(pm, jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8)),
                     aux_out=aux)
    assert np.isclose(float(aux[0]), 1.0, atol=1e-6)


def test_moe_aux_penalizes_collapse():
    '''A router collapsed onto one expert scores aux ~= E (the Switch
    loss's worst case), strictly above the balanced 1.0.'''
    pm = init_moe_ffn(jax.random.PRNGKey(0), 8, 16, 4)
    w = np.zeros((8, 4), np.float32)
    w[:, 2] = 100.0   # every token -> expert 2
    pm['router']['w'] = jnp.asarray(w)
    aux = []
    moe_feed_forward(pm, jnp.ones((2, 16, 8)), aux_out=aux)
    assert float(aux[0]) > 3.5


def test_moe_capacity_overflow_drops_to_zero():
    '''Training path: tokens beyond an expert's capacity produce a zero FFN
    output (the surrounding residual then passes them through unchanged).'''
    pm = init_moe_ffn(jax.random.PRNGKey(0), 8, 16, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 8))
    y_cap1 = moe_feed_forward(pm, x, deterministic=False,
                              capacity_factor=0.01)  # C == 1
    n_zero = int((np.abs(np.asarray(y_cap1)).sum(-1) == 0).sum())
    # at most 4 tokens (one per expert) can be served
    assert n_zero >= 32 - 4
    y_full = moe_feed_forward(pm, x, deterministic=False,
                              capacity_factor=100.0)
    assert int((np.abs(np.asarray(y_full)).sum(-1) == 0).sum()) == 0


def test_moe_train_path_matches_lossless_when_capacity_ample():
    '''The capacity-dispatch (training) form and the lossless (inference)
    form compute the same math when nothing overflows.'''
    pm = init_moe_ffn(jax.random.PRNGKey(0), 8, 16, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 8))
    y_train = moe_feed_forward(pm, x, deterministic=False,
                               capacity_factor=100.0)
    y_infer = moe_feed_forward(pm, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(y_train), np.asarray(y_infer),
                               rtol=1e-5, atol=1e-6)


def test_moe_row_independence():
    '''Routing and capacity are per leading row: a row's output must not
    change with its batchmates (the serving micro-batcher coalesces
    requests from different callers). Checked on the training/capacity
    path — the lossless inference path is per-token by construction.'''
    pm = init_moe_ffn(jax.random.PRNGKey(0), 8, 16, 4)
    xs = jax.random.normal(jax.random.PRNGKey(1), (3, 16, 8))
    batched = moe_feed_forward(pm, xs, deterministic=False)
    for i in range(3):
        solo = moe_feed_forward(pm, xs[i:i + 1], deterministic=False)
        np.testing.assert_array_equal(np.asarray(batched[i]),
                                      np.asarray(solo[0]))


def test_moe_router_receives_gradient():
    pm = init_moe_ffn(jax.random.PRNGKey(0), 8, 16, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 8))

    def loss(p):
        aux = []
        y = moe_feed_forward(p, x, deterministic=False, aux_out=aux)
        return jnp.sum(y ** 2) + 0.01 * aux[0]

    g = jax.grad(loss)(pm)
    assert float(jnp.linalg.norm(g['router']['w'])) > 0.0
    assert float(jnp.linalg.norm(g['experts']['w1'])) > 0.0


def test_ffn_apply_dispatches_on_structure():
    from bmt_tpu.ops.layers import init_ffn
    dense = init_ffn(jax.random.PRNGKey(0), 8, 16)
    moe = init_moe_ffn(jax.random.PRNGKey(0), 8, 16, 2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8))
    np.testing.assert_array_equal(np.asarray(ffn_apply(dense, x)),
                                  np.asarray(feed_forward(dense, x)))
    np.testing.assert_array_equal(np.asarray(ffn_apply(moe, x)),
                                  np.asarray(moe_feed_forward(moe, x)))


# ---------------------------------------------------------------------------
# model integration
# ---------------------------------------------------------------------------

def _tiny_dims(moe_experts=4):
    from bmt_tpu.models.captioning import CapModelDims
    return CapModelDims(voc_size=37, d_model_A=8, d_model_V=16, d_model_C=12,
                        d_model=16, H=2, N=2, d_ff_A=16, d_ff_V=32,
                        d_ff_C=24, dout_p=0.1, d_vid=16, d_aud=8,
                        moe_experts=moe_experts)


def _tiny_batch(key, B=4, Sa=10, Sv=6, Sc=7, voc=37):
    ka, kv, kf, kc = jax.random.split(key, 4)
    src = {'audio': jax.random.normal(ka, (B, Sa, 8)),
           'rgb': jax.random.normal(kv, (B, Sv, 16)),
           'flow': jax.random.normal(kf, (B, Sv, 16))}
    caption = jax.random.randint(kc, (B, Sc), 2, voc)
    return src, caption


def test_bimodal_moe_forward_and_aux():
    from bmt_tpu.models.captioning import (bimodal_transformer_forward,
                                           init_bimodal_transformer)
    from bmt_tpu.ops.masks import make_masks
    dims = _tiny_dims()
    params = init_bimodal_transformer(jax.random.PRNGKey(0), dims)
    src, caption = _tiny_batch(jax.random.PRNGKey(1))
    masks = make_masks(src, caption, 'audio_video', 1)
    aux = []
    out = bimodal_transformer_forward(params, dims, src, caption, masks,
                                      deterministic=True, aux_out=aux)
    assert bool(jnp.isfinite(out).all())
    # encoder appends one aux per layer (N=2; M1+M2 summed inside), the
    # decoder one per layer FFN -> 2 + 2 entries
    assert len(aux) == 4
    assert all(float(a) > 0 for a in aux)


def test_moe_train_step_runs_and_aux_moves_loss():
    import optax
    from bmt_tpu.train.steps import init_train_state, make_cap_train_step
    dims = _tiny_dims()
    from bmt_tpu.models.captioning import init_bimodal_transformer
    params = init_bimodal_transformer(jax.random.PRNGKey(0), dims)
    src, caption = _tiny_batch(jax.random.PRNGKey(1))
    batch = {'src': src, 'caption': caption}
    opt = optax.adam(1e-4)

    losses = {}
    for coeff in (0.0, 10.0):
        step = jax.jit(make_cap_train_step(dims, opt, 0.7, 1,
                                           moe_aux_coeff=coeff))
        state = init_train_state(params, opt, seed=0)
        new_state, metrics = step(state, batch)
        assert bool(jnp.isfinite(metrics['loss']))
        assert int(new_state.step) == 1
        losses[coeff] = float(metrics['loss'])
    # the aux term is part of the objective -> a large coeff must move it
    assert losses[10.0] > losses[0.0]


def test_moe_greedy_decode_cached_matches_uncached():
    '''The KV-cached decode step uses the same ffn_apply dispatch as the
    teacher-forced forward — greedy captions must be identical.'''
    from bmt_tpu.decode import greedy_decode_bimodal, greedy_decode_uncached
    from bmt_tpu.models.captioning import (bimodal_transformer_forward,
                                           init_bimodal_transformer)
    dims = _tiny_dims()
    params = init_bimodal_transformer(jax.random.PRNGKey(0), dims)
    src, _ = _tiny_batch(jax.random.PRNGKey(1))
    max_len = 5   # each prefix length compiles separately in the slow path

    def fwd(stacks, trg, masks):
        return bimodal_transformer_forward(params, dims, stacks, trg, masks,
                                           deterministic=True)

    slow = np.asarray(greedy_decode_uncached(fwd, src, max_len, 2, 3, 1,
                                             'audio_video'))
    fast = np.asarray(greedy_decode_bimodal(params, dims, src, max_len,
                                            2, 3, 1))
    T = slow.shape[1]
    for b in range(slow.shape[0]):
        row_slow, row_fast = slow[b].tolist(), fast[b, :T].tolist()
        end = row_slow.index(3) if 3 in row_slow else T
        assert row_slow[:end + 1] == row_fast[:end + 1]


# ---------------------------------------------------------------------------
# expert parallelism over the ep mesh axis
# ---------------------------------------------------------------------------

def test_ep_sharded_train_step_matches_single_device():
    '''dp2 x ep4 on the 8-device CPU mesh: expert weights actually shard
    (addressable shard < full), GSPMD compiles the dispatch collectives,
    and one train step's loss/params match the unsharded run.'''
    import optax
    from bmt_tpu.parallel import DataParallel, place_params
    from bmt_tpu.train.steps import init_train_state, make_cap_train_step
    from bmt_tpu.models.captioning import init_bimodal_transformer

    if len(jax.devices()) < 8:
        pytest.skip('needs 8 devices')
    dims = _tiny_dims(moe_experts=4)
    params = init_bimodal_transformer(jax.random.PRNGKey(0), dims)
    src, caption = _tiny_batch(jax.random.PRNGKey(1), B=4)
    batch = {'src': src, 'caption': caption}
    opt = optax.adam(1e-3)
    make = lambda: make_cap_train_step(dims, opt, 0.7, 1,
                                       moe_aux_coeff=0.01)

    # single-device baseline
    state0 = init_train_state(params, opt, seed=0)
    ref_state, ref_metrics = jax.jit(make())(state0, batch)

    dp = DataParallel(2, ep=4)
    placed = place_params(params, dp.mesh)
    w1 = placed['encoder']['layers'][0]['ff_M1']['experts']['w1']
    shard_shape = w1.addressable_shards[0].data.shape
    assert shard_shape[0] == w1.shape[0] // 4   # experts split over ep

    state = init_train_state(placed, opt, seed=0)
    step = dp.jit_step(make(), donate_state=False)
    new_state, metrics = step(state, dp.shard(batch))
    assert np.isclose(float(metrics['loss']), float(ref_metrics['loss']),
                      rtol=1e-5, atol=1e-5)
    # parameters after the update agree too (threefry RNG is bit-stable
    # across shardings; tolerance absorbs reduction-order drift)
    ref_w = np.asarray(ref_state.params['decoder']['layers'][0]['ff']
                       ['experts']['w2'])
    new_w = np.asarray(new_state.params['decoder']['layers'][0]['ff']
                       ['experts']['w2'])
    np.testing.assert_allclose(new_w, ref_w, rtol=2e-5, atol=2e-6)


def test_ep_mesh_flag_validation():
    from bmt_tpu.parallel.mesh import make_mesh
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 devices')
    mesh = make_mesh(2, 1, None, 1, 4)
    assert mesh.shape == {'dp': 2, 'sp': 1, 'ep': 4, 'mp': 1}
    with pytest.raises(ValueError):
        make_mesh(4, 1, None, 1, 4)   # 16 > 8 devices
