'''Proposal-generator training driver (reference:
scripts/train_proposal_generator.py:15-104): k-means anchors from the train
JSON, bi-modal encoder optionally seeded from a pretrained captioning
checkpoint (frozen unless --finetune_cap_encoder), best-by-avg-F1
checkpointing.'''
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from bmt_tpu.config import Config
from bmt_tpu.data.proposal_data import ProposalDataset
from bmt_tpu.data.vocab import Vocab, build_vocab_from_meta
from bmt_tpu.models import (PropModelDims,
                            init_multimodal_proposal_generator,
                            init_unimodal_proposal_generator)
from bmt_tpu.parallel import DataParallel
from bmt_tpu.parallel.mesh import maybe_init_distributed
from bmt_tpu.train.checkpoint import (detect_checkpoint_format,
                                      import_cap_model,
                                      get_checkpoint_io,
                                      load_torch_checkpoint)
from bmt_tpu.train.loops import train_epoch_prop, validate_prop
from bmt_tpu.train.optim import (ReduceLROnPlateau, build_optimizer,
                                 freeze_mask, set_learning_rate)
from bmt_tpu.train.steps import (init_train_state, make_prop_inference_step,
                                 make_prop_train_step)
from bmt_tpu.utils.logging import MetricsLogger, NullLogger
from bmt_tpu.utils.misc import timer
from bmt_tpu.utils.proposal_utils import calc_anchors_using_kmeans


def train_prop(cfg: Config):
    from bmt_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()
    maybe_init_distributed()
    seed = 0
    np.random.seed(seed)

    anchors = {}
    if 'audio' in cfg.modality:
        anchors['audio'] = calc_anchors_using_kmeans(cfg.train_json_path,
                                                     cfg.anchors_num_audio)
    if 'video' in cfg.modality:
        anchors['video'] = calc_anchors_using_kmeans(cfg.train_json_path,
                                                     cfg.anchors_num_video)

    # the reference instantiates a whole captioning dataset here only to
    # read pad_idx (train_proposal_generator.py:34-35); building just the
    # vocabulary the same way skips a second full tokenize+pre-encode pass
    # over ~50k captions at startup
    if getattr(cfg, 'vocab_path', None):
        vocab = Vocab.load(cfg.vocab_path)
    else:
        vocab = build_vocab_from_meta(cfg.train_meta_path, cfg.start_token,
                                      cfg.end_token, cfg.pad_token,
                                      cfg.min_freq_caps)
    pad_idx = vocab[cfg.pad_token]

    train_ds = ProposalDataset(cfg, 'train', pad_idx)
    valid_ds = ProposalDataset(cfg, 'val_1', pad_idx)

    dims = PropModelDims.from_config(cfg)

    key = jax.random.PRNGKey(seed)
    if cfg.modality == 'audio_video':
        params = init_multimodal_proposal_generator(key, dims)
        params['anchors_A'] = jnp.asarray(anchors['audio'], jnp.float32)
        params['anchors_V'] = jnp.asarray(anchors['video'], jnp.float32)
    else:
        params = init_unimodal_proposal_generator(key, dims)
        params['anchors'] = jnp.asarray(anchors[cfg.modality], jnp.float32)

    # pretrained captioning encoder (reference:
    # proposal_generator.py:234-249)
    frozen_module = None
    path = getattr(cfg, 'pretrained_cap_model_path', None)
    if path:
        print(f'Pretrained caption path: \n {path}')
        if path.endswith('.pt'):
            cpt = load_torch_checkpoint(path)
            if cfg.modality == 'audio_video':
                cap_params, _ = import_cap_model(cpt)
            else:
                # uni-modal prop reuses a uni-modal cap encoder
                # (reference: proposal_generator.py:85-106)
                from bmt_tpu.train.checkpoint import import_unimodal_cap_model
                cap_params, _ = import_unimodal_cap_model(cpt)
        else:
            # native checkpoint (npz dir / bare params.npz / orbax dir):
            # only the encoder subtree transfers, mirroring the reference's
            # 'encoder' key filter (proposal_generator.py:244-246)
            from bmt_tpu.train.checkpoint import load_pretrained_encoder_native
            cap_params = {'encoder': load_pretrained_encoder_native(
                path, params['encoder'], 'cap')}
        params['encoder'] = cap_params['encoder']
        if not getattr(cfg, 'finetune_cap_encoder', False):
            frozen_module = 'encoder'

    def is_frozen(path_keys):
        if path_keys[0] in ('anchors_A', 'anchors_V', 'anchors'):
            return True
        return frozen_module is not None and path_keys[0] == frozen_module

    # the warmup_cosine schedule needs the run's step budget
    mask = freeze_mask(params, is_frozen)
    optimizer = build_optimizer(cfg, frozen_mask=mask,
                                total_steps=cfg.epoch_num * len(train_ds))

    # sp > 1 additionally shards the Sa=800/Sv=300 sequences across
    # devices (sequence parallelism — parallel/seq.py); dp x sp devices
    # total, GSPMD inserts the K/V gathers and conv halo exchanges
    sp = getattr(cfg, 'sp_devices', 1) or 1
    use_fsdp = bool(getattr(cfg, 'fsdp', False))
    dp = DataParallel(getattr(cfg, 'dp_devices', None), sp=sp,
                      fsdp=use_fsdp)
    seq_mesh = dp.mesh if sp > 1 else None
    compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == 'bfloat16'
                     else jnp.float32)
    # accum is EXACT here too: the YOLO masked-mean denominators depend
    # only on targets, so a target-only pre-pass supplies the full-batch
    # cell counts to every microbatch (see make_prop_train_step)
    ema_decay = float(getattr(cfg, 'ema_decay', 0.0) or 0.0)
    raw_step = make_prop_train_step(
        dims, optimizer, pad_idx, cfg.attention_impl, compute_dtype,
        accum_steps=getattr(cfg, 'grad_accum_steps', 1),
        seq_mesh=seq_mesh, ema_decay=ema_decay, frozen_mask=mask)
    train_step = dp.jit_step(raw_step, donate_state=True)
    # multi-step dispatch bundling (see cap_trainer / steps.make_multistep)
    steps_per_dispatch = int(getattr(cfg, 'steps_per_dispatch', 1) or 1)
    multistep = None
    if steps_per_dispatch > 1:
        from bmt_tpu.train.steps import make_multistep
        multistep = dp.jit_step(make_multistep(raw_step),
                                donate_state=True, stacked=True)
    inference_step = jax.jit(make_prop_inference_step(
        dims, pad_idx, cfg.attention_impl, compute_dtype,
        seq_mesh=seq_mesh))

    if use_fsdp:
        # shard large leaves over dp (ZeRO-3) BEFORE optimizer.init so the
        # Adam moments shard identically (sharding_rules.py)
        from bmt_tpu.parallel import place_params
        params = place_params(
            params, dp.mesh, fsdp=True,
            fsdp_min_elems=getattr(cfg, 'fsdp_min_elems', 1 << 16))
    state = init_train_state(params, optimizer, seed,
                             getattr(cfg, 'prng_impl', 'rbg'),
                             ema=ema_decay > 0)
    if not use_fsdp:
        state = state._replace(
            params=dp.replicate_tree(state.params),
            opt_state=dp.replicate_tree(state.opt_state),
            ema=(dp.replicate_tree(state.ema)
                 if state.ema is not None else None))
    else:
        # sharded leaves are on the mesh already; the scalars
        # optimizer.init created fresh (counts, rng, step) are not
        state = dp.complete_on_mesh(state)

    # TRAINABLE means not frozen: the reference counts requires_grad
    # params only, so the GloVe table / frozen encoders / anchors are
    # excluded here too
    n_params = sum(
        int(np.prod(p.shape))
        for p, frozen in zip(jax.tree.leaves(params),
                             jax.tree.leaves(freeze_mask(params, is_frozen)))
        if hasattr(p, 'shape') and not frozen)
    print(f'Total Number of Trainable Parameters: {n_params / 1e6} Mil.')

    logger = MetricsLogger(cfg.log_path) if cfg.to_log else NullLogger()
    logger.add_scalar('debug/param_number', n_params, 0)

    scheduler = None
    if cfg.scheduler == 'reduce_on_plateau':
        scheduler = ReduceLROnPlateau(cfg.lr, cfg.lr_reduce_factor,
                                      cfg.lr_patience, mode='max')

    best_metric = -np.inf
    unchanged = 0
    start_epoch = 0

    # rolling resume, symmetric with train_cap: a crash mid-run restarts
    # from the last completed epoch instead of epoch 0 (the reference can
    # only save — proposal_generator training restarts from scratch)
    ckpt_fmt = getattr(cfg, 'ckpt_format', 'npz')
    save_ckpt, _ = get_checkpoint_io(ckpt_fmt)
    async_writer = None
    if getattr(cfg, 'async_ckpt', False):
        if ckpt_fmt == 'npz':
            from bmt_tpu.train.checkpoint import AsyncCheckpointWriter
            async_writer = AsyncCheckpointWriter(save_ckpt)
        else:
            # orbax rides its own multihost-safe async machinery
            from bmt_tpu.train.checkpoint import AsyncOrbaxWriter
            async_writer = AsyncOrbaxWriter()
        save_ckpt = async_writer.save
    ckpt_dir = cfg.log_path if cfg.to_log else None
    on_disk_fmt = (detect_checkpoint_format(ckpt_dir, 'last_prop_model',
                                            ckpt_fmt) if ckpt_dir else None)
    if on_disk_fmt is not None:
        if on_disk_fmt != ckpt_fmt:
            print(f'Resuming from a {on_disk_fmt} checkpoint '
                  f'(--ckpt_format is {ckpt_fmt}; new saves use {ckpt_fmt})')
        _, load_ckpt = get_checkpoint_io(on_disk_fmt)
        p, meta, opt = load_ckpt(ckpt_dir, state.params,
                                 state.opt_state, 'last_prop_model')
        # re-place loaded host arrays onto the live shardings (fsdp/sp
        # resume must not silently lose its placements — see place_like)
        from bmt_tpu.parallel import place_like
        p = place_like(p, state.params)
        opt = place_like(opt, state.opt_state) if opt is not None else None
        ema = state.ema
        if ema is not None:
            try:
                e, _, _ = load_ckpt(ckpt_dir, state.ema, None,
                                    'last_prop_model.ema')
                ema = place_like(e, state.ema)
            except FileNotFoundError:   # resuming a pre-EMA run
                ema = place_like(jax.tree.map(lambda x: x.copy(), p),
                                 state.ema)
        state = state._replace(
            params=p, opt_state=opt or state.opt_state, ema=ema,
            step=jnp.asarray(meta.get('step', 0), jnp.int32))
        start_epoch = meta.get('epoch', -1) + 1
        best_metric = meta.get('best_metric', -np.inf)
        unchanged = meta.get('unchanged', 0)
        # batch-exact resume of a preemption-interrupted epoch
        resume_batch = meta.get('batch_in_epoch', 0) or 0
        if scheduler is not None and meta.get('scheduler'):
            scheduler.load_state_dict(meta['scheduler'])
        print(f'Resumed from epoch {start_epoch}'
              + (f' batch {resume_batch}' if resume_batch else ''))
    else:
        resume_batch = 0

    guard = None
    if ckpt_dir and getattr(cfg, 'preempt_save', True):
        from bmt_tpu.utils.preempt import PreemptionGuard
        guard = PreemptionGuard().install()

    for epoch in range(start_epoch, cfg.epoch_num):
        print(f'The best metric was unchanged for {unchanged} epochs.')
        print(f'Started @ {cfg.curr_time}; '
              f'Current timer: {timer(cfg.curr_time)}')
        # >=: a resume with a LOWERED --early_stop_after must still stop
        if unchanged >= cfg.early_stop_after:
            break

        state, _ = train_epoch_prop(
            train_step, state, train_ds, epoch, logger, dp, seed,
            guard=guard,
            start_batch=(resume_batch if epoch == start_epoch else 0),
            multistep=multistep, steps_per_dispatch=steps_per_dispatch,
            profile_steps=getattr(cfg, 'profile_steps', 0),
            profile_dir=(os.path.join(cfg.log_path, 'profile')
                         if cfg.log_path else None))

        if guard is not None and guard.requested:
            b = guard.batch_in_epoch
            save_ckpt(ckpt_dir, state.params, {
                'config': cfg.to_dict(),
                'epoch': epoch - 1 if b else epoch,
                'batch_in_epoch': b or 0,
                'step': int(state.step),
                'anchors': anchors,
                'val_anet_metrics': None,
                'best_metric': float(best_metric),
                'unchanged': unchanged,
                'scheduler': (scheduler.state_dict()
                              if scheduler is not None else None),
            }, state.opt_state, 'last_prop_model')
            if state.ema is not None:
                save_ckpt(ckpt_dir, state.ema, {'epoch': epoch},
                          None, 'last_prop_model.ema')
            print(f'[preempt] rolling checkpoint saved @ epoch {epoch} '
                  f'batch {b if b else "end"}; exiting')
            break

        # EMA (if on) is what gets validated and what best_* holds
        eval_params = state.ema if state.ema is not None else state.params
        avg_f1, metrics = validate_prop(cfg, inference_step, eval_params,
                                        valid_ds, epoch, logger, dp)

        if scheduler is not None:
            state = state._replace(opt_state=set_learning_rate(
                state.opt_state, scheduler.step(avg_f1)))

        is_best = avg_f1 > best_metric
        if is_best:
            best_metric = avg_f1
            unchanged = 0
        else:
            unchanged += 1

        if ckpt_dir:
            meta = {
                'config': cfg.to_dict(),
                'epoch': epoch,
                'step': int(state.step),
                'anchors': anchors,
                'val_anet_metrics': metrics,
                'best_metric': float(best_metric),
                'unchanged': unchanged,
                'scheduler': (scheduler.state_dict()
                              if scheduler is not None else None),
            }
            # rolling checkpoint every epoch (resume), best kept separately
            save_ckpt(ckpt_dir, state.params, meta,
                      state.opt_state, 'last_prop_model')
            if state.ema is not None:
                save_ckpt(ckpt_dir, state.ema, {'epoch': epoch},
                          None, 'last_prop_model.ema')
            if is_best:
                # best_* holds the weights that scored (EMA when on)
                save_ckpt(ckpt_dir, eval_params, meta,
                          state.opt_state, 'best_prop_model')
                print(f'Saved model @ {epoch} epoch. '
                      f'Best metric: {best_metric:.5f}')

    if guard is not None:
        guard.uninstall()
    if async_writer is not None:
        # drain pending background writes (incl. a preemption save) so
        # the checkpoint is durably on disk before the process can exit
        async_writer.close()
    print(f'Experiment: {cfg.curr_time[2:]}')
    logger.close()
    return best_metric
