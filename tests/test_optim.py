'''Optimizer construction, freezing, LR control, scheduler semantics.'''
import numpy as np
import jax
import jax.numpy as jnp
import optax

from bmt_tpu.train.optim import (ReduceLROnPlateau, build_optimizer,
                                 freeze_mask, get_learning_rate,
                                 set_learning_rate)


class _Cfg:
    optimizer = 'adam'
    lr = 1e-2
    grad_clip = None
    weight_decay = 0.0
    beta1, beta2, eps = 0.9, 0.999, 1e-8


def test_frozen_leaves_get_zero_updates():
    params = {'emb': {'table': jnp.ones((4, 3))},
              'layer': {'w': jnp.ones((3, 3))}}
    mask = freeze_mask(params, lambda keys: keys[:2] == ('emb', 'table'))
    assert mask['emb']['table'] is True and mask['layer']['w'] is False

    tx = build_optimizer(_Cfg(), frozen_mask=mask)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates['emb']['table']).sum()) == 0.0
    assert float(jnp.abs(updates['layer']['w']).sum()) > 0.0


def test_learning_rate_injection():
    params = {'w': jnp.ones((2, 2))}
    tx = build_optimizer(_Cfg())
    state0 = tx.init(params)
    assert np.isclose(get_learning_rate(state0), 1e-2)
    state = set_learning_rate(state0, 5e-4)
    assert np.isclose(get_learning_rate(state), 5e-4)
    # purely functional: the input state is untouched (donation-safe)
    assert np.isclose(get_learning_rate(state0), 1e-2)

    # update magnitude scales with the injected lr (adam first step = lr)
    grads = {'w': jnp.ones((2, 2))}
    updates, _ = tx.update(grads, state, params)
    assert np.allclose(np.abs(np.asarray(updates['w'])), 5e-4, rtol=1e-3)


def test_grad_clipping_applied_before_adam():
    class Cfg(_Cfg):
        grad_clip = 1.0
    tx = build_optimizer(Cfg())
    params = {'w': jnp.ones((2, 2))}
    state = tx.init(params)
    big = {'w': jnp.full((2, 2), 1e6)}
    updates, _ = tx.update(big, state, params)
    assert np.all(np.isfinite(np.asarray(updates['w'])))


def test_reduce_lr_on_plateau_min_mode():
    s = ReduceLROnPlateau(1.0, factor=0.5, patience=1, mode='min')
    assert s.step(10.0) == 1.0      # first metric -> best
    assert s.step(9.0) == 1.0       # improved
    assert s.step(9.5) == 1.0       # bad 1 (within patience)
    assert s.step(9.6) == 0.5       # bad 2 -> reduce
    assert s.step(8.0) == 0.5       # improved again, lr stays


def test_reduce_lr_on_plateau_max_mode():
    s = ReduceLROnPlateau(1.0, factor=0.1, patience=0, mode='max')
    assert s.step(1.0) == 1.0
    assert s.step(2.0) == 1.0
    assert s.step(1.5) == 0.1       # patience 0 -> immediate


def test_reduce_lr_on_plateau_state_roundtrip():
    '''A resumed scheduler continues from the reduced LR instead of
    resetting to the initial one.'''
    s = ReduceLROnPlateau(1.0, factor=0.5, patience=0, mode='min')
    s.step(10.0)
    s.step(11.0)                    # -> reduce to 0.5
    assert s.lr == 0.5

    fresh = ReduceLROnPlateau(1.0, factor=0.5, patience=0, mode='min')
    fresh.load_state_dict(s.state_dict())
    # an improving metric must keep the REDUCED lr, not the initial 1.0
    assert fresh.step(9.0) == 0.5
    assert fresh.best == 9.0


def test_frozen_grads_excluded_from_clip_norm():
    '''Frozen-leaf gradients must not inflate the global clip norm (torch:
    requires_grad=False params have no grads and are excluded from
    clip_grad_norm_). The freezing mask sits at the HEAD of the chain.'''
    class _ClipCfg(_Cfg):
        grad_clip = 1.0

    params = {'frozen': jnp.ones((4,)), 'live': jnp.ones((4,))}
    mask = {'frozen': True, 'live': False}
    grads = {'frozen': jnp.full((4,), 1e6),   # would dominate the norm
             'live': jnp.full((4,), 0.1)}

    tx = build_optimizer(_ClipCfg(), frozen_mask=mask)
    upd, _ = tx.update(grads, tx.init(params), params)

    # reference: same grads with the frozen leaf zeroed, no mask
    tx_ref = build_optimizer(_ClipCfg())
    grads_ref = {'frozen': jnp.zeros((4,)), 'live': grads['live']}
    upd_ref, _ = tx_ref.update(grads_ref, tx_ref.init(params), params)

    np.testing.assert_allclose(np.asarray(upd['live']),
                               np.asarray(upd_ref['live']), rtol=1e-6)
    assert float(jnp.abs(upd['frozen']).sum()) == 0.0


def test_frozen_leaves_immune_to_weight_decay():
    '''With weight_decay > 0 a frozen leaf must still receive an exactly
    zero update (torch skips requires_grad=False params entirely, so no
    L2-into-gradient decay is ever applied to them).'''
    class _WdCfg(_Cfg):
        weight_decay = 0.01

    params = {'frozen': jnp.full((4,), 3.0), 'live': jnp.full((4,), 3.0)}
    mask = {'frozen': True, 'live': False}
    grads = {'frozen': jnp.zeros((4,)), 'live': jnp.ones((4,))}

    tx = build_optimizer(_WdCfg(), frozen_mask=mask)
    state = tx.init(params)
    for _ in range(3):
        updates, state = tx.update(grads, state, params)
        assert float(jnp.abs(updates['frozen']).sum()) == 0.0
        assert float(jnp.abs(updates['live']).sum()) > 0.0


def test_plateau_threshold_torch_semantics():
    '''Noise-level metric drift must count as a bad epoch (torch rel
    threshold 1e-4), so the LR actually reduces on plateaus.'''
    sch = ReduceLROnPlateau(1.0, factor=0.5, patience=1)
    sch.step(2.3)
    lr = 1.0
    for i in range(4):                    # drifts by < 1e-4 relative
        lr = sch.step(2.3 - (i + 1) * 1e-6)
    assert lr == 0.25                     # reduced twice (patience=1)
    # a real improvement resets the counter
    sch2 = ReduceLROnPlateau(1.0, factor=0.5, patience=1)
    sch2.step(2.3)
    assert sch2.step(2.0) == 1.0


def test_plateau_none_factor_uses_torch_defaults():
    '''--lr_reduce_factor/--lr_patience default to None in the CLI; the
    scheduler must fall back to torch's defaults (0.1 / 10) instead of
    crashing with a TypeError at the first reduction.'''
    s = ReduceLROnPlateau(1.0, None, None)
    s.step(5.0)
    lr = 1.0
    for _ in range(12):           # exceed the default patience of 10
        lr = s.step(6.0)
    assert lr == 0.1              # reduced once by the default factor


def test_bf16_mu_dtype_option():
    '''--optim_mu_dtype bfloat16 stores Adam's first moment bf16 (halved
    optimizer-state HBM) while the second moment stays fp32; updates
    remain finite and close to the fp32-mu optimizer.'''
    class _MuCfg(_Cfg):
        optim_mu_dtype = 'bfloat16'

    params = {'w': jnp.ones((8, 4)) * 0.5}
    grads = {'w': jnp.full((8, 4), 0.3)}

    tx = build_optimizer(_MuCfg())
    state = tx.init(params)
    adam_states = [s for s in jax.tree_util.tree_flatten(
                       state, is_leaf=lambda n: hasattr(n, 'mu'))[0]
                   if hasattr(s, 'mu')]
    assert adam_states, 'no scale_by_adam state found'
    assert all(s.mu['w'].dtype == jnp.bfloat16 for s in adam_states)
    assert all(s.nu['w'].dtype == jnp.float32 for s in adam_states)

    upd, state = tx.update(grads, state, params)
    tx32 = build_optimizer(_Cfg())
    upd32, _ = tx32.update(grads, tx32.init(params), params)
    assert np.isfinite(np.asarray(upd['w'])).all()
    np.testing.assert_allclose(np.asarray(upd['w']),
                               np.asarray(upd32['w']),
                               rtol=0, atol=1e-4)


def test_warmup_cosine_schedule_shape():
    '''--scheduler warmup_cosine: SGD with lr=1 and unit grads makes the
    update magnitude equal the schedule multiplier — linear 0->1 over the
    warmup, cosine 1->floor over the budget.'''
    class _SchedCfg:
        optimizer = 'sgd'
        lr = 1.0
        grad_clip = None
        weight_decay = 0.0
        momentum = 0.0
        scheduler = 'warmup_cosine'
        warmup_steps = 4
        lr_final_ratio = 0.1

    params = {'w': jnp.zeros((3,))}
    tx = build_optimizer(_SchedCfg(), total_steps=12)
    state = tx.init(params)
    grads = {'w': jnp.ones((3,))}
    mags = []
    for _ in range(12):
        updates, state = tx.update(grads, state, params)
        mags.append(float(-updates['w'][0]))
    # warmup: strictly increasing from ~0 to the peak
    assert mags[0] < 0.3 and mags[0] < mags[1] < mags[2] < mags[3]
    np.testing.assert_allclose(mags[4], 1.0, atol=0.05)  # peak after warmup
    # cosine decay towards the floor (0.1 of peak)
    assert mags[5] > mags[7] > mags[9] > mags[11]
    np.testing.assert_allclose(mags[11], 0.1, atol=0.08)


def test_warmup_cosine_count_survives_resume():
    '''The schedule's step count lives in the opt_state, so a checkpoint
    round-trip resumes mid-schedule instead of rewinding the LR.'''
    from bmt_tpu.train.checkpoint import load_pytree_npz, save_pytree_npz

    class _SchedCfg:
        optimizer = 'sgd'
        lr = 1.0
        grad_clip = None
        weight_decay = 0.0
        momentum = 0.0
        scheduler = 'warmup_cosine'
        warmup_steps = 0
        lr_final_ratio = 0.0

    params = {'w': jnp.zeros((3,))}
    tx = build_optimizer(_SchedCfg(), total_steps=10)
    state = tx.init(params)
    grads = {'w': jnp.ones((3,))}
    for _ in range(5):
        updates, state = tx.update(grads, state, params)

    import os, tempfile
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, 'opt.npz')
        save_pytree_npz(path, state)
        restored = load_pytree_npz(path, tx.init(params))

    u_live, _ = tx.update(grads, state, params)
    u_rest, _ = tx.update(grads, restored, params)
    np.testing.assert_allclose(np.asarray(u_rest['w']),
                               np.asarray(u_live['w']), rtol=1e-6)


def test_skip_nonfinite_grads():
    '''--skip_nonfinite_grads: a NaN-grad step applies a ZERO update and
    leaves the optimizer state usable; the next finite step applies
    normally; after max consecutive errors the NaN passes through.'''
    class _GuardCfg(_Cfg):
        skip_nonfinite_grads = 2

    params = {'w': jnp.ones((2,))}
    tx = build_optimizer(_GuardCfg())
    state = tx.init(params)
    bad = {'w': jnp.asarray([jnp.nan, 1.0])}
    good = {'w': jnp.ones((2,))}

    updates, state = tx.update(bad, state, params)
    assert float(jnp.abs(updates['w']).sum()) == 0.0  # skipped, not NaN

    updates, state = tx.update(good, state, params)
    assert np.all(np.isfinite(np.asarray(updates['w'])))
    assert float(jnp.abs(updates['w']).sum()) > 0.0

    # two consecutive bad steps exhaust the budget; the third surfaces
    for _ in range(2):
        updates, state = tx.update(bad, state, params)
        assert float(jnp.nansum(jnp.abs(updates['w']))) == 0.0
    updates, state = tx.update(bad, state, params)
    assert not np.all(np.isfinite(np.asarray(updates['w'])))
