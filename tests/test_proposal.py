'''Proposal generator parity: conv heads vs torch Conv1d, YOLO decode math,
dense target assignment vs a numpy port of the reference logic.'''
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from bmt_tpu.models import (PropModelDims, init_multimodal_proposal_generator,
                            multimodal_proposal_forward, make_targets_dense,
                            yolo_losses)
from bmt_tpu.models.proposal import (init_proposal_head,
                                     proposal_head_forward, yolo_decode)
from bmt_tpu.ops.masks import make_masks
from tests.torch_ref import t_conv_head, t_make_targets

SMALL = PropModelDims(
    d_model_A=8, d_model_V=12, d_model=16, H=2, N=1, d_ff_A=16, d_ff_V=24,
    kernel_sizes_A=(3, 5), kernel_sizes_V=(1, 3),
    conv_layers_A=(16,), conv_layers_V=(16,),
    anchors_num_A=4, anchors_num_V=6, dout_p=0.1)
PAD = 1


def test_conv_head_matches_torch(rng):
    for with_ln in (False, True):
        p = init_proposal_head(jax.random.PRNGKey(0), [8, 16, 12], 5, with_ln)
        x = rng.normal(size=(2, 9, 8)).astype(np.float32)
        ours = np.asarray(jax.jit(proposal_head_forward)(p, jnp.asarray(x)))
        theirs = t_conv_head(p, x, with_ln).numpy()
        np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_yolo_decode_math(rng):
    B, S, A = 2, 6, 3
    anchors = jnp.asarray([1.0, 4.0, 9.0])
    stride = 2.0
    raw = rng.normal(size=(B, S, 3 * A)).astype(np.float32)
    d = jax.jit(partial(yolo_decode, stride=stride))(jnp.asarray(raw),
                                                     anchors)

    x = raw.reshape(B, S, A, 3).transpose(0, 2, 1, 3)
    sig = lambda v: 1 / (1 + np.exp(-v))
    grid = np.arange(S)[None, None, :]
    prior = (np.asarray(anchors) / stride)[None, :, None]
    center = (sig(x[..., 0]) + grid) * stride
    length = prior * np.exp(x[..., 1]) * stride
    conf = sig(x[..., 2])
    expected = np.stack([center, length, conf], -1).reshape(B, A * S, 3)
    np.testing.assert_allclose(np.asarray(d['predictions']), expected,
                               rtol=2e-5, atol=1e-5)


def test_make_targets_matches_reference_port(rng):
    B, S, A, E = 3, 20, 5, 4
    anchors = np.sort(rng.uniform(1, 40, size=A)).astype(np.float32)
    stride = 2.56

    # ragged reference-style targets: [batch_idx, center_s, length_s]
    rows = []
    valid = np.zeros((B, E), bool)
    centers = np.zeros((B, E), np.float32)
    lengths = np.zeros((B, E), np.float32)
    for b in range(B):
        n = int(rng.integers(1, E + 1))
        for e in range(n):
            c = float(rng.uniform(0, S * stride))
            w = float(rng.uniform(0.5, 30))
            rows.append([b, c, w])
            valid[b, e] = True
            centers[b, e] = c
            lengths[b, e] = w
    ragged = np.asarray(rows, np.float32)

    obj_ref, noobj_ref, tx_ref, tw_ref = t_make_targets(
        (B, A, S), ragged, anchors, stride)

    fn = jax.jit(partial(make_targets_dense, stride=stride, S=S))
    obj, noobj, tx, tw = fn(jnp.asarray(centers), jnp.asarray(lengths),
                            jnp.asarray(valid), jnp.asarray(anchors))

    np.testing.assert_array_equal(np.asarray(obj), obj_ref)
    np.testing.assert_array_equal(np.asarray(noobj), noobj_ref)
    np.testing.assert_allclose(np.asarray(tx), tx_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tw), tw_ref, atol=2e-4)


def test_multimodal_proposal_forward_shapes_and_losses(rng):
    params = init_multimodal_proposal_generator(jax.random.PRNGKey(0), SMALL)
    params['anchors_A'] = jnp.asarray([1.0, 3.0, 8.0, 20.0])
    params['anchors_V'] = jnp.asarray([1.0, 2.0, 4.0, 8.0, 16.0, 32.0])

    B, Sa, Sv, E = 2, 10, 8, 3
    src = {
        'rgb': jnp.asarray(rng.normal(size=(B, Sv, 12)), jnp.float32),
        'flow': jnp.asarray(rng.normal(size=(B, Sv, 12)), jnp.float32),
        'audio': jnp.asarray(rng.normal(size=(B, Sa, 8)), jnp.float32),
    }
    centers = jnp.asarray(rng.uniform(0, 18, size=(B, E)), jnp.float32)
    lengths = jnp.asarray(rng.uniform(1, 10, size=(B, E)), jnp.float32)
    valid = jnp.asarray([[True, True, False], [True, False, False]])
    masks = make_masks(src, None, 'audio_video', PAD)

    fwd = jax.jit(partial(multimodal_proposal_forward, dims=SMALL,
                          deterministic=True))
    preds, loss, losses_A, losses_V = fwd(params, src=src,
                                          dense_targets=(centers, lengths, valid),
                                          masks=masks)
    expected_props = (len(SMALL.kernel_sizes_A) * SMALL.anchors_num_A * Sa
                      + len(SMALL.kernel_sizes_V) * SMALL.anchors_num_V * Sv)
    assert preds.shape == (B, expected_props, 3)
    assert np.isfinite(float(loss)) and float(loss) > 0
    for d in (losses_A, losses_V):
        assert set(d) == {'loss_x', 'loss_w', 'loss_conf_obj', 'loss_conf_noobj'}
        assert all(np.isfinite(float(v)) for v in d.values())

    # inference path: no targets
    preds2, loss2, _, _ = fwd(params, src=src, dense_targets=None, masks=masks)
    assert preds2.shape == preds.shape
    np.testing.assert_allclose(np.asarray(preds2), np.asarray(preds),
                               atol=1e-5)


def test_proposal_grads_flow_not_into_anchors(rng):
    params = init_multimodal_proposal_generator(jax.random.PRNGKey(0), SMALL)
    params['anchors_A'] = jnp.asarray([1.0, 3.0, 8.0, 20.0])
    params['anchors_V'] = jnp.asarray([1.0, 2.0, 4.0, 8.0, 16.0, 32.0])

    B, Sa, Sv, E = 1, 6, 5, 2
    src = {
        'rgb': jnp.asarray(rng.normal(size=(B, Sv, 12)), jnp.float32),
        'flow': jnp.asarray(rng.normal(size=(B, Sv, 12)), jnp.float32),
        'audio': jnp.asarray(rng.normal(size=(B, Sa, 8)), jnp.float32),
    }
    targets = (jnp.asarray(rng.uniform(0, 10, (B, E)), jnp.float32),
               jnp.asarray(rng.uniform(1, 6, (B, E)), jnp.float32),
               jnp.ones((B, E), bool))
    masks = make_masks(src, None, 'audio_video', PAD)

    def loss_fn(p):
        _, loss, _, _ = multimodal_proposal_forward(p, SMALL, src, targets,
                                                    masks, deterministic=True)
        return loss

    grads = jax.jit(jax.grad(loss_fn))(params)
    assert float(jnp.abs(grads['anchors_A']).sum()) == 0.0
    assert float(jnp.abs(grads['anchors_V']).sum()) == 0.0
    # but head weights do receive gradient
    g = grads['heads_A'][0]['convs'][0]['w']
    assert float(jnp.abs(g).sum()) > 0


def test_make_targets_dense_duplicate_cells_last_event_wins():
    '''Two valid GT events landing in the same (anchor, cell) must resolve
    deterministically to the LAST event, matching the reference's
    sequential overwrite (proposal_generator.py:427-447; numpy fancy
    assignment in t_make_targets is also last-wins).'''
    stride, S, A_n = 2.0, 8, 2
    anchors = np.asarray([4.0, 12.0], np.float32)
    # events 0 and 2 share cell 3 and the same best anchor; event 2 is last
    centers = np.asarray([[6.2, 10.0, 7.8]], np.float32)
    lengths = np.asarray([[4.0, 5.0, 4.5]], np.float32)
    valid = np.ones((1, 3), bool)
    ragged = np.asarray([[0, 6.2, 4.0], [0, 10.0, 5.0], [0, 7.8, 4.5]],
                        np.float32)

    obj_ref, noobj_ref, tx_ref, tw_ref = t_make_targets(
        (1, A_n, S), ragged, anchors, stride)
    obj, noobj, tx, tw = jax.jit(partial(make_targets_dense, stride=stride,
                                         S=S))(
        jnp.asarray(centers), jnp.asarray(lengths), jnp.asarray(valid),
        jnp.asarray(anchors))

    # sanity: the collision actually happens
    assert int(np.asarray(obj).sum()) == 2 < 3
    np.testing.assert_array_equal(np.asarray(obj), obj_ref)
    np.testing.assert_allclose(np.asarray(tx), tx_ref, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tw), tw_ref, atol=1e-6)


def test_yolo_decode_fp32_grid_under_bf16():
    '''World-coordinate decode must not inherit bf16's integer resolution:
    at S=800, a bf16 grid rounds cell 799 to 800 and swallows sub-cell
    offsets past cell 512.'''
    S, A_n, stride = 800, 1, 0.96
    anchors = jnp.asarray([2.0])
    raw = jnp.zeros((1, S, 3), jnp.bfloat16)   # sigmoid(0) = 0.5 offset
    d = jax.jit(partial(yolo_decode, stride=stride))(raw, anchors)
    preds = np.asarray(d['predictions']).reshape(A_n, S, 3)
    assert preds.dtype == np.float32
    centers = preds[0, :, 0]
    np.testing.assert_allclose(centers,
                               (np.arange(S) + 0.5) * stride, rtol=1e-6)
