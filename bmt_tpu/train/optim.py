'''Optimizers and LR scheduling (optax).

Matches torch semantics used by the reference trainers
(reference: scripts/train_captioning_module.py:46-58):
- Adam with L2-into-gradient weight decay (torch style, not AdamW),
- global-norm gradient clipping applied to raw gradients
  (reference: captioning_epoch_loops.py:138-139),
- constant LR or ReduceLROnPlateau (host-side metric-driven).

Parameter freezing (GloVe embeddings unless --unfreeze_word_emb; pretrained
encoders unless --finetune_*_encoder) is expressed as an optax multi_transform
mask — frozen leaves get zero updates.
'''
from __future__ import annotations

from typing import Callable, Optional

import jax
import optax


def build_optimizer(cfg, frozen_mask=None,
                    total_steps: Optional[int] = None
                    ) -> optax.GradientTransformation:
    '''cfg needs: optimizer, lr, grad_clip, weight_decay and (adam) beta1/2,
    eps or (sgd) momentum. ``frozen_mask``: pytree of bools matching params
    (True = frozen). ``total_steps``: the run's step budget, required by
    the warmup_cosine schedule (trainers pass epoch_num * batches/epoch).'''
    chain = []
    if frozen_mask is not None:
        # zero frozen-leaf gradients FIRST: torch's frozen params
        # (requires_grad=False) contribute nothing to clip_grad_norm_, so
        # the global clip must see trainable gradients only, and Adam's
        # moments for frozen leaves stay zero
        chain.append(optax.masked(optax.set_to_zero(), frozen_mask))
    if getattr(cfg, 'grad_clip', None) is not None:
        clip = optax.clip_by_global_norm(cfg.grad_clip)
        if frozen_mask is not None:
            # norm over trainable leaves only: frozen gradients are exactly
            # zero (set_to_zero above + source-level pruning in the steps),
            # so the clip factor is value-identical — but the masked form
            # stops XLA from walking 51M frozen zero-leaves per step, and
            # it is literally what torch's clip_grad_norm_ sees (only
            # requires_grad=True params are handed to it)
            not_frozen = jax.tree.map(lambda f: not f, frozen_mask)
            clip = optax.masked(clip, not_frozen)
        chain.append(clip)
    wd = getattr(cfg, 'weight_decay', 0.0) or 0.0
    if wd:
        decay = optax.add_decayed_weights(wd)
        if frozen_mask is not None:
            # torch skips requires_grad=False params entirely, so frozen
            # leaves must not receive decay-driven updates either
            not_frozen = jax.tree.map(lambda f: not f, frozen_mask)
            decay = optax.masked(decay, not_frozen)
        chain.append(decay)

    if cfg.optimizer == 'adam':
        # --optim_mu_dtype bfloat16 stores Adam's FIRST moment in bf16:
        # halves that state's HBM traffic and checkpoint bytes. The
        # second moment stays fp32 — it is a variance whose dynamic
        # range bf16's 8-bit mantissa degrades (sqrt amplifies the
        # quantization), while the first moment is smooth and tolerant
        # (standard mixed-precision practice). npz checkpoints round-trip
        # bf16 exactly via an f32 upcast (train/checkpoint.py:_flatten).
        mu_dtype = getattr(cfg, 'optim_mu_dtype', 'float32') or 'float32'
        adam = optax.scale_by_adam(b1=getattr(cfg, 'beta1', 0.9),
                                   b2=getattr(cfg, 'beta2', 0.999),
                                   eps=getattr(cfg, 'eps', 1e-8),
                                   mu_dtype=mu_dtype)
        if frozen_mask is not None and getattr(cfg, 'lora_rank', 0):
            # LoRA finetuning: allocate Adam moments ONLY for the adapter
            # leaves (optax.masked stores MaskedNode placeholders for the
            # frozen base) — the whole point of parameter-efficient
            # finetuning is that optimizer state shrinks with the
            # trainable set, not just that updates are zeroed. Gated on
            # lora_rank so pre-existing runs' opt_state trees (GloVe-
            # frozen etc.) keep their checkpoint structure.
            not_frozen = jax.tree.map(lambda f: not f, frozen_mask)
            adam = optax.masked(adam, not_frozen)
        chain.append(adam)
    elif cfg.optimizer == 'sgd':
        mom = getattr(cfg, 'momentum', 0.0)
        if mom:
            chain.append(optax.trace(decay=mom))
    else:
        raise ValueError(cfg.optimizer)

    # per-STEP LR schedule (--scheduler warmup_cosine): a RELATIVE
    # multiplier on top of the injected base learning_rate, so
    # get/set_learning_rate and the plateau machinery stay untouched.
    # The schedule's step count lives in the opt_state
    # (ScaleByScheduleState) and therefore survives checkpoint resume.
    if getattr(cfg, 'scheduler', 'constant') == 'warmup_cosine':
        warm = max(int(getattr(cfg, 'warmup_steps', 0) or 0), 0)
        floor = float(getattr(cfg, 'lr_final_ratio', 0.0) or 0.0)
        total = int(total_steps or getattr(cfg, 'lr_total_steps', 0) or 0)
        if total > warm:
            sched = optax.warmup_cosine_decay_schedule(
                init_value=0.0 if warm else 1.0, peak_value=1.0,
                warmup_steps=warm, decay_steps=total, end_value=floor)
        else:
            # no (usable) step budget: linear warmup, then flat
            sched = optax.linear_schedule(
                init_value=0.0 if warm else 1.0, end_value=1.0,
                transition_steps=max(warm, 1))
        chain.append(optax.scale_by_schedule(sched))

    chain.append(optax.scale(-1.0))
    # trailing safety net: whatever any upstream transform produced, the
    # final update for a frozen leaf is exactly zero (freeze contract)
    tail = ([optax.masked(optax.set_to_zero(), frozen_mask)]
            if frozen_mask is not None else [])
    # --skip_nonfinite_grads N: production NaN/inf guard — a step whose
    # gradients are nonfinite applies NO update (inner state untouched)
    # instead of poisoning the parameters; after N CONSECUTIVE bad steps
    # the nonfinite updates pass through so the failure surfaces rather
    # than looping forever (optax.apply_if_finite semantics)
    skip_n = int(getattr(cfg, 'skip_nonfinite_grads', 0) or 0)

    def make(learning_rate):
        inner = optax.chain(*chain, optax.scale(learning_rate), *tail)
        if skip_n > 0:
            inner = optax.apply_if_finite(inner,
                                          max_consecutive_errors=skip_n)
        return inner

    return optax.inject_hyperparams(make)(learning_rate=cfg.lr)


def set_learning_rate(opt_state, lr: float):
    '''Return a new optimizer state with the injected learning rate replaced.

    Purely functional (the input state is not mutated), so it stays correct
    when the train step donates its opt_state buffers.
    '''
    def rebuild(state):
        if hasattr(state, 'hyperparams') and \
                'learning_rate' in state.hyperparams:
            hp = dict(state.hyperparams)
            old = jax.numpy.asarray(hp['learning_rate'])
            hp['learning_rate'] = jax.numpy.asarray(lr, dtype=old.dtype)
            return state._replace(hyperparams=hp), True
        if isinstance(state, tuple):
            rebuilt = [rebuild(s) for s in state]
            children = tuple(s for s, _ in rebuilt)
            if hasattr(state, '_fields'):  # namedtuple
                children = type(state)(*children)
            return children, any(f for _, f in rebuilt)
        return state, False

    new_state, found = rebuild(opt_state)
    assert found, 'no injected learning_rate found'
    return new_state


def get_learning_rate(opt_state) -> Optional[float]:
    def find(state):
        if hasattr(state, 'hyperparams') and 'learning_rate' in state.hyperparams:
            return float(state.hyperparams['learning_rate'])
        if isinstance(state, tuple):
            for s in state:
                r = find(s)
                if r is not None:
                    return r
        return None
    return find(opt_state)


class ReduceLROnPlateau:
    '''Host-side metric-driven LR scheduler (torch semantics: mode 'min',
    multiply LR by factor after `patience` epochs without improvement).'''

    def __init__(self, init_lr: float, factor: float, patience: int,
                 mode: str = 'min', threshold: float = 1e-4):
        self.lr = init_lr
        # --lr_reduce_factor / --lr_patience default to None in the CLI
        # (like the reference's); fall back to torch's own defaults
        # (factor=0.1, patience=10) instead of crashing with a TypeError
        # at the first reduction, hours into training
        self.factor = factor if factor is not None else 0.1
        self.patience = patience if patience is not None else 10
        self.mode = mode
        self.threshold = threshold   # torch default: rel mode, 1e-4
        self.best = None
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        # torch 'rel' threshold semantics: noise-level drift does NOT
        # count as improvement (strict < would never trigger a reduction
        # on a slowly-drifting metric)
        improved = (self.best is None
                    or (self.mode == 'min'
                        and metric < self.best * (1.0 - self.threshold))
                    or (self.mode == 'max'
                        and metric > self.best * (1.0 + self.threshold)))
        if improved:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr *= self.factor
                self.bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        '''Host state for checkpointing (resume must not reset a reduced
        LR back to the initial one).'''
        return {'lr': self.lr, 'best': self.best,
                'bad_epochs': self.bad_epochs}

    def load_state_dict(self, d: dict) -> None:
        self.lr = d['lr']
        self.best = d['best']
        self.bad_epochs = d['bad_epochs']


def freeze_mask(params, predicate: Callable[[tuple], bool]):
    '''Build a boolean mask pytree: predicate(path_tuple) -> frozen?'''
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def is_frozen(path):
        keys = tuple(getattr(k, 'key', getattr(k, 'idx', None)) for k in path)
        return predicate(keys)

    mask_flat = [is_frozen(path) for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, mask_flat)
