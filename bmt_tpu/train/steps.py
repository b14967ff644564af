'''jit-compiled training / validation step functions.

Each step is a pure (state, batch) -> (state, metrics) function with static
shapes, built once per (dims, hyperparams) and jitted with data-parallel
shardings by ``bmt_tpu.parallel.DataParallel``. Masks are constructed on
device inside the step (they are cheap elementwise ops XLA fuses away).

Reference loops being replaced: epoch_loops/captioning_epoch_loops.py:122-172
(teacher-forced train + next-word validation) and
epoch_loops/proposal_epoch_loops.py:27-97.
'''
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from bmt_tpu.models.captioning import (CapModelDims,
                                       bimodal_transformer_forward,
                                       unimodal_transformer_forward)
from bmt_tpu.models.proposal import (PropModelDims,
                                     multimodal_proposal_forward,
                                     unimodal_proposal_forward)
from bmt_tpu.ops.masks import make_masks
from bmt_tpu.train.losses import label_smoothing_kl_logits


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    rng: jax.Array
    step: jax.Array
    # exponential moving average of params (--ema_decay > 0), else None
    # (None is an empty pytree subtree, so the state's structure — and
    # every existing checkpoint template — is unchanged when EMA is off)
    ema: dict = None


def cast_tree(tree, dtype):
    '''Cast fp32 leaves to ``dtype`` (classic mixed precision: fp32 master
    params/optimizer state, low-precision compute). No-op for fp32.'''
    if dtype == jnp.float32:
        return tree
    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, 'dtype') and x.dtype == jnp.float32 else x, tree)


def init_train_state(params, optimizer, seed: int = 0,
                     prng_impl: str = 'threefry2x32',
                     ema: bool = False) -> TrainState:
    '''prng_impl: 'threefry2x32' (default; bit-stable across shardings and
    compilations — used by the bitwise dp/mp equivalence tests) or 'rbg'
    (TPU hardware RNG: measured ~30% faster train step at BMT shapes since
    dropout mask generation dominates threefry cost; bits may differ across
    backends/shardings, which dropout does not care about). The trainers
    default to 'rbg' via --prng_impl.

    ema=True seeds the EMA tree with a COPY of params (a copy, not the
    same arrays: the train step donates the state, and the same donated
    buffer appearing twice in one call is illegal aliasing). Placement —
    and hence any fsdp/mp sharding — is inherited from params.'''
    return TrainState(params=params,
                      opt_state=optimizer.init(params),
                      rng=jax.random.key(seed, impl=prng_impl),
                      step=jnp.zeros((), jnp.int32),
                      ema=(jax.tree.map(lambda x: x.copy(), params)
                           if ema else None))


def _freeze_prune(frozen_mask):
    '''params -> params map that ``stop_gradient``s frozen leaves (identity
    when nothing is frozen).

    Gradient pruning at the SOURCE: the optimizer chain already zeroes
    frozen-leaf gradients before clipping (train/optim.py:30-35, torch
    requires_grad=False semantics), so stopping the gradient inside the
    loss is numerically identical — but now AD never emits the frozen
    weights' dW GEMMs (x^T @ dy) or the frozen embedding table's
    scatter-add, and when an entire prefix of the network is frozen the
    dx propagation through it is dead code too. For LoRA finetuning this
    removes nearly all weight-gradient FLOPs from the backward; for the
    reference's stage-2 frozen-encoder recipe it removes the encoder's.
    Side effect: the logged grad_norm now counts trainable leaves only,
    which matches what the global-norm CLIP always saw.

    Why not rely on XLA's DCE: it only fires when nothing observes the
    frozen gradients. The cap step's grad_norm metric observed ALL of
    them, silently keeping every frozen dW GEMM alive (measured: the
    LoRA step compiled ~1/3 more dot ops without this). Source-level
    stop_gradient makes the pruning structural, independent of which
    metrics a step returns.'''
    if frozen_mask is None or not any(jax.tree.leaves(frozen_mask)):
        return lambda p: p

    def prune(p):
        return jax.tree.map(
            lambda x, f: jax.lax.stop_gradient(x) if f else x,
            p, frozen_mask)
    return prune


def _apply_updates_pruned(params, updates, frozen_mask):
    '''optax.apply_updates that passes frozen leaves through by IDENTITY.

    The frozen updates are exactly zero (optimizer freeze contract), so
    `p + 0` is value-identical — but the identity form lets XLA alias the
    donated input buffer instead of streaming a read+write over every
    frozen leaf (for LoRA finetuning that is ~51M params x 8 bytes of
    dead HBM traffic per step).'''
    if frozen_mask is None or not any(jax.tree.leaves(frozen_mask)):
        return optax.apply_updates(params, updates)
    return jax.tree.map(
        lambda p, u, f: p if f else jnp.asarray(p + u).astype(
            jnp.asarray(p).dtype),
        params, updates, frozen_mask)


def _trainable_global_norm(grads, frozen_mask):
    '''Global grad norm over TRAINABLE leaves only. Frozen gradients are
    exactly zero (source-level pruning + optimizer zeroing), so the value
    is identical to the all-leaves norm — this just keeps the metric from
    walking frozen zero-leaves, and matches what torch's clip_grad_norm_
    reports (it only ever sees requires_grad=True params).'''
    if frozen_mask is None or not any(jax.tree.leaves(frozen_mask)):
        return optax.global_norm(grads)
    leaves = [g for g, f in zip(jax.tree.leaves(grads),
                                jax.tree.leaves(frozen_mask)) if not f]
    return optax.global_norm(leaves)


def _cap_forward(dims: CapModelDims):
    if dims.modality == 'audio_video':
        return bimodal_transformer_forward
    return unimodal_transformer_forward


def _ema_update(ema, params, decay: float):
    '''One EMA step: e <- decay*e + (1-decay)*p. No-op when EMA is off
    (decay == 0 / ema is None). Elementwise over sharded trees, so the
    EMA inherits and keeps whatever placement params carry.'''
    if not decay or ema is None:
        return ema
    return jax.tree.map(lambda e, p: e * decay + p * (1.0 - decay),
                        ema, params)


def make_cap_train_step(dims: CapModelDims, optimizer, smoothing: float,
                        pad_idx: int, attention_impl: str = 'xla',
                        compute_dtype=jnp.float32, accum_steps: int = 1,
                        moe_aux_coeff: float = 0.01,
                        ema_decay: float = 0.0, frozen_mask=None):
    '''Teacher-forced captioning train step
    (reference: captioning_epoch_loops.py:122-149).

    accum_steps > 1 splits the batch into that many microbatches and
    lax.scans over them, accumulating the raw (summed-KL) gradients and
    the token counts, normalizing once at the end — mathematically the
    full-batch gradient (the loss is a row-sum, so grads are linear in
    it), at 1/accum_steps the activation memory.

    With MoE FFNs (dims.moe_experts > 1) the Switch load-balance loss is
    folded in token-weighted — objective = (Σ_mb KL_mb + coeff·aux_mb·n_mb)
    / N_total — so the accumulated gradient still equals the full-batch
    gradient exactly (routing and capacity are per-row, so microbatching
    never changes routing decisions either).
    '''
    fwd = _cap_forward(dims)
    collect_aux = dims.moe_experts > 1 and moe_aux_coeff > 0.0
    prune = _freeze_prune(frozen_mask)

    def _masked_targets(caption, row_valid):
        cap_x, cap_y = caption[:, :-1], caption[:, 1:]
        # Tail batches are repeat-padded to the full batch size on the host;
        # 'row_valid' marks the real rows. Forcing padded rows' targets to
        # pad_idx zeroes their loss rows and drops them from n_tokens, so
        # the gradient matches training on the unpadded tail exactly.
        if row_valid is not None:
            cap_y = jnp.where(row_valid.astype(bool)[:, None], cap_y,
                              pad_idx)
        return cap_x, cap_y

    def _raw_loss(p, src_raw, caption, row_valid, rng):
        '''(summed KL, n_tokens) for one (micro)batch.'''
        p = prune(p)
        cap_x, cap_y = _masked_targets(caption, row_valid)
        src = jax.tree.map(lambda x: x.astype(compute_dtype), src_raw)
        masks = make_masks(src_raw, cap_x, dims.modality, pad_idx)
        # logits path: the loss does its own row logsumexp, so no
        # (B, S, V) fp32 log_softmax is materialized (see
        # label_smoothing_kl_logits; ~10% of the flagship step)
        aux_list = [] if collect_aux else None
        logits = fwd(cast_tree(p, compute_dtype), dims, src, cap_x,
                     masks, rng=rng, deterministic=False,
                     attention_impl=attention_impl, return_logits=True,
                     aux_out=aux_list)
        kl = label_smoothing_kl_logits(logits, cap_y, smoothing, pad_idx)
        n = jnp.sum(cap_y != pad_idx)
        if aux_list:
            aux = sum(aux_list) / len(aux_list)   # mean over FFN sites
            kl = kl + moe_aux_coeff * aux * n
        return kl, n

    def step(state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, state.step)
        row_valid = batch.get('row_valid')

        if accum_steps == 1:
            def loss_fn(p):
                kl, n = _raw_loss(p, batch['src'], batch['caption'],
                                  row_valid, rng)
                return kl / jnp.maximum(n, 1)
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
        else:
            B = batch['caption'].shape[0]
            if B % accum_steps:
                raise ValueError(
                    f'batch size {B} not divisible by '
                    f'grad_accum_steps={accum_steps}')

            def split(x):
                return x.reshape(accum_steps, x.shape[0] // accum_steps,
                                 *x.shape[1:])
            micro = {'src': jax.tree.map(split, batch['src']),
                     'caption': split(batch['caption']),
                     'row_valid': (split(row_valid)
                                   if row_valid is not None else None)}

            def body(carry, mb):
                acc_g, acc_kl, acc_n, i = carry
                (kl, n), g = jax.value_and_grad(
                    _raw_loss, has_aux=True)(
                        state.params, mb['src'], mb['caption'],
                        mb['row_valid'], jax.random.fold_in(rng, i))
                return (jax.tree.map(jnp.add, acc_g, g), acc_kl + kl,
                        acc_n + n, i + 1), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (grads, kl, n, _), _ = jax.lax.scan(
                body, (zeros, jnp.zeros((), jnp.float32),
                       jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)),
                micro)
            n = jnp.maximum(n, 1)
            grads = jax.tree.map(lambda g: g / n, grads)
            loss = kl / n

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = _apply_updates_pruned(state.params, updates, frozen_mask)
        new_state = TrainState(params, opt_state, state.rng, state.step + 1,
                               _ema_update(state.ema, params, ema_decay))
        return new_state, {'loss': loss,
                           'grad_norm': _trainable_global_norm(grads,
                                                               frozen_mask)}
    return step


def make_multistep(step_fn):
    '''Bundle K optimizer steps into ONE device dispatch.

    Returns ``multistep(state, stacked_batch) -> (state, stacked_metrics)``
    where every array leaf of ``stacked_batch`` carries a leading axis K
    (K host batches stacked) and the metrics come back with the same
    leading K. ``lax.scan`` threads the TrainState through ``step_fn``
    K times inside one compiled program, so each dispatch pays the
    host->device launch cost once instead of K times.

    Bit-identical to K sequential dispatches by construction: the scanned
    body IS the single step (same per-step RNG — the steps fold
    ``state.step`` into the key, and ``state.step`` advances inside the
    scan exactly as it does across separate calls); pinned in
    tests/test_multistep.py. Works for any (state, batch) -> (state,
    metrics) step — captioning and proposal alike.

    Why this exists (scoped by round-5 measurement, docs/DESIGN.md
    §6b): in an ASYNC dispatch loop — one that never reads device
    values mid-stream, like this repo's epoch loops — jit dispatches
    already pipeline and bundling is ≈parity (the scan itself adds no
    device time; trace-verified). The win is the SYNC-per-step loop: a
    loop that reads the loss to host every step (per-step logging /
    guard checks, the reference's own loop shape) pays a host↔device
    round trip per step, and the bundle amortizes it to 1/K — measured
    ~3× per-step behind the bench tunnel (`train_bundled_syncloop_*`).
    The trade-offs are K batches of input resident on device at once
    (for BMT's B=32 bf16 batches, ~13 MB each — noise next to the
    51M-param state) and loss/guard visibility at K-step granularity
    (the epoch loop accounts for both).
    '''
    def multistep(state: TrainState, stacked_batch):
        return jax.lax.scan(step_fn, state, stacked_batch)
    return multistep


def make_cap_val_step(dims: CapModelDims, smoothing: float, pad_idx: int,
                      attention_impl: str = 'xla',
                      compute_dtype=jnp.float32):
    '''Next-word validation loss
    (reference: captioning_epoch_loops.py:152-172).'''
    fwd = _cap_forward(dims)

    def step(params, batch):
        caption = batch['caption']
        cap_x, cap_y = caption[:, :-1], caption[:, 1:]
        # see make_cap_train_step: repeat-padded tail rows are excluded
        # (same contract as the train step: a present-but-None row_valid
        # means "all rows real")
        if batch.get('row_valid') is not None:
            cap_y = jnp.where(batch['row_valid'].astype(bool)[:, None],
                              cap_y, pad_idx)
        src = jax.tree.map(lambda x: x.astype(compute_dtype), batch['src'])
        masks = make_masks(batch['src'], cap_x, dims.modality, pad_idx)
        n_tokens = jnp.maximum(jnp.sum(cap_y != pad_idx), 1)
        logits = fwd(cast_tree(params, compute_dtype), dims, src, cap_x,
                     masks, deterministic=True,
                     attention_impl=attention_impl, return_logits=True)
        return label_smoothing_kl_logits(logits, cap_y, smoothing,
                                         pad_idx) / n_tokens
    return step


def _prop_forward(dims: PropModelDims):
    if dims.modality == 'audio_video':
        return multimodal_proposal_forward
    return unimodal_proposal_forward


def make_prop_train_step(dims: PropModelDims, optimizer, pad_idx: int,
                         attention_impl: str = 'xla',
                         compute_dtype=jnp.float32, accum_steps: int = 1,
                         seq_mesh=None, ema_decay: float = 0.0,
                         frozen_mask=None):
    '''Proposal-generator train step
    (reference: proposal_epoch_loops.py:27-63).

    accum_steps > 1 is EXACT like the captioning accumulation, despite the
    YOLO losses being masked MEANS over obj/noobj cells: the cell counts
    depend only on the targets (never on params), so a cheap target-only
    pre-pass computes the FULL batch's counts per modality, each
    microbatch contributes sum/total_count (``yolo_losses(denoms=...)``),
    and the summed microbatch gradients equal the full-batch gradient.

    seq_mesh: a mesh with a live ``sp`` axis enables sequence-parallel
    sharding constraints on the forward's activations (parallel/seq.py) —
    the Sa=800/Sv=300 proposal sequences then split across sp with GSPMD
    inserting the attention K/V gathers and conv halo exchanges. None (or
    sp=1) leaves the step bit-identical to the unconstrained build.'''
    from bmt_tpu.parallel.seq import sequence_parallel
    fwd = _prop_forward(dims)
    prune = _freeze_prune(frozen_mask)

    def _denoms(batch):
        '''Full-batch obj/noobj cell counts per modality — pure target
        math (make_targets_dense uses no parameters except the frozen
        anchors).'''
        from bmt_tpu.models.proposal import make_targets_dense
        centers, lengths = batch['centers'], batch['lengths']
        valid = batch['valid']

        def counts(anchors, stride, S):
            obj, noobj, _, _ = make_targets_dense(
                centers, lengths, valid, jax.lax.stop_gradient(anchors),
                stride, S)
            return (jnp.sum(obj.astype(jnp.float32)),
                    jnp.sum(noobj.astype(jnp.float32)))
        return counts

    def _step(state: TrainState, batch):
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(p, src_raw, targets, mrng, loss_denoms=None):
            p = prune(p)
            src = jax.tree.map(lambda x: x.astype(compute_dtype), src_raw)
            masks = make_masks(src_raw, None, dims.modality, pad_idx)
            out = fwd(cast_tree(p, compute_dtype), dims, src, targets, masks,
                      rng=mrng, deterministic=False,
                      attention_impl=attention_impl,
                      loss_denoms=loss_denoms)
            if dims.modality == 'audio_video':
                _, loss, losses_A, losses_V = out
                return loss, (losses_A, losses_V)
            _, loss, losses = out
            # label the single modality's loss terms correctly
            if dims.modality == 'video':
                return loss, ({}, losses)
            return loss, (losses, {})

        if accum_steps == 1:
            targets = (batch['centers'], batch['lengths'], batch['valid'])
            (loss, (lA, lV)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch['src'], targets,
                                       rng)
        else:
            B = batch['valid'].shape[0]
            if B % accum_steps:
                raise ValueError(
                    f'batch size {B} not divisible by '
                    f'grad_accum_steps={accum_steps}')
            counts = _denoms(batch)
            if dims.modality == 'audio_video':
                loss_denoms = (
                    counts(state.params['anchors_A'], dims.stride_A,
                           batch['src']['audio'].shape[1]),
                    counts(state.params['anchors_V'], dims.stride_V,
                           batch['src']['rgb'].shape[1]))
            else:
                S = (batch['src']['rgb'].shape[1]
                     if dims.modality == 'video'
                     else batch['src']['audio'].shape[1])
                stride = (dims.stride_V if dims.modality == 'video'
                          else dims.stride_A)
                loss_denoms = counts(state.params['anchors'], stride, S)

            def split(x):
                return x.reshape(accum_steps, x.shape[0] // accum_steps,
                                 *x.shape[1:])
            micro = {'src': jax.tree.map(split, batch['src']),
                     'centers': split(batch['centers']),
                     'lengths': split(batch['lengths']),
                     'valid': split(batch['valid'])}

            def body(carry, mb):
                acc_g, acc_loss, acc_lA, acc_lV, i = carry
                (loss, (lA, lV)), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(
                        state.params, mb['src'],
                        (mb['centers'], mb['lengths'], mb['valid']),
                        jax.random.fold_in(rng, i), loss_denoms)
                return (jax.tree.map(jnp.add, acc_g, g), acc_loss + loss,
                        jax.tree.map(jnp.add, acc_lA, lA),
                        jax.tree.map(jnp.add, acc_lV, lV), i + 1), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            # trace once with microbatch 0 to learn the loss-dict pytrees
            zl = jnp.zeros((), jnp.float32)
            zero_l = jax.eval_shape(
                lambda p: loss_fn(p, jax.tree.map(lambda x: x[0], micro['src']),
                                  (micro['centers'][0], micro['lengths'][0],
                                   micro['valid'][0]), rng, loss_denoms)[1],
                state.params)
            zlA = jax.tree.map(lambda _: zl, zero_l[0])
            zlV = jax.tree.map(lambda _: zl, zero_l[1])
            (grads, loss, lA, lV, _), _ = jax.lax.scan(
                body, (zeros, zl, zlA, zlV, jnp.zeros((), jnp.int32)),
                micro)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = _apply_updates_pruned(state.params, updates, frozen_mask)
        new_state = TrainState(params, opt_state, state.rng, state.step + 1,
                               _ema_update(state.ema, params, ema_decay))
        metrics = {'loss': loss}
        metrics.update({f'{k}_A': v for k, v in lA.items()})
        metrics.update({f'{k}_V': v for k, v in lV.items()})
        return new_state, metrics

    def step(state: TrainState, batch):
        # the context flips a trace-time flag; entering it inside the
        # jitted function guarantees it is active whenever jit (lazily)
        # traces, not just on the first eager call
        with sequence_parallel(seq_mesh):
            return _step(state, batch)
    return step


def make_prop_inference_step(dims: PropModelDims, pad_idx: int,
                             attention_impl: str = 'xla',
                             compute_dtype=jnp.float32, seq_mesh=None):
    '''Forward-only proposal predictions (B, AS_total, 3)
    (reference: proposal_epoch_loops.py:99-110). seq_mesh: see
    make_prop_train_step.'''
    from bmt_tpu.parallel.seq import sequence_parallel
    fwd = _prop_forward(dims)

    def step(params, batch):
        with sequence_parallel(seq_mesh):
            src = jax.tree.map(lambda x: x.astype(compute_dtype),
                               batch['src'])
            masks = make_masks(batch['src'], None, dims.modality, pad_idx)
            out = fwd(cast_tree(params, compute_dtype), dims, src, None,
                      masks, deterministic=True,
                      attention_impl=attention_impl)
            return out[0].astype(jnp.float32)
    return step
