'''Captioning-module training driver (reference:
scripts/train_captioning_module.py:18-135).

Differences by design:
- nn.DataParallel -> jit over a jax.sharding Mesh (grad all-reduce over ICI),
- torchtext/GloVe -> host vocab + aligned GloVe matrix (optional on disk),
- checkpoints are native npz+JSON with full resume; metadata mirrors the
  reference checkpoint fields (epoch, val losses/metrics, trg_voc_size,
  config).
'''
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from bmt_tpu.config import Config
from bmt_tpu.data.captioning import CaptioningDataset
from bmt_tpu.data.vocab import load_glove
from bmt_tpu.decode import (make_bimodal_beam_fn, make_bimodal_greedy_fn,
                            make_bimodal_sample_fn,
                            make_unimodal_greedy_fn)
from bmt_tpu.models import (CapModelDims, init_bimodal_transformer,
                            init_unimodal_transformer)
from bmt_tpu.parallel import DataParallel
from bmt_tpu.parallel.mesh import maybe_init_distributed
from bmt_tpu.train.checkpoint import (detect_checkpoint_format,
                                      get_checkpoint_io, import_prop_model,
                                      load_torch_checkpoint)
from bmt_tpu.train.loops import (make_decode_fn, train_epoch_cap,
                                 validate_next_word, validation_1by1)
from bmt_tpu.train.optim import (ReduceLROnPlateau, build_optimizer,
                                 freeze_mask, set_learning_rate)
from bmt_tpu.train.steps import (cast_tree, init_train_state,
                                 make_cap_train_step, make_cap_val_step)
from bmt_tpu.utils.logging import MetricsLogger, NullLogger
from bmt_tpu.utils.misc import average_metrics_in_two_dicts, timer


def _glove_dim(cfg) -> int:
    '''Embedding width of the configured GloVe vectors: parsed from the
    "<N>d" suffix of the vectors name/path (reference torchtext infers it
    from the chosen ``word_emb_caps`` vectors, e.g. glove.840B.300d).'''
    import re
    for source in (os.path.basename(getattr(cfg, 'glove_path', '') or ''),
                   getattr(cfg, 'word_emb_caps', '') or ''):
        m = re.search(r'(\d+)d', source)
        if m:
            return int(m.group(1))
    return 300


def _load_pretrained_encoder(params, cfg):
    '''Optionally seed the encoder from a proposal checkpoint (ablation;
    reference: captioning_module.py:147-162). Accepts native npz dirs or
    reference .pt files.'''
    path = getattr(cfg, 'pretrained_prop_model_path', None)
    if not path:
        return params, None
    print(f'Pretrained prop path: \n {path}')
    if path.endswith('.pt'):
        cpt = load_torch_checkpoint(path)
        if cfg.modality == 'audio_video':
            prop_params, _ = import_prop_model(cpt)
        else:
            # uni-modal cap reuses a uni-modal prop encoder
            # (reference: captioning_module.py:50-69)
            from bmt_tpu.train.checkpoint import import_unimodal_prop_model
            prop_params, _ = import_unimodal_prop_model(cpt, cfg.modality)
        params['encoder'] = prop_params['encoder']
    else:
        # native checkpoint (npz dir / bare params.npz / orbax dir): only
        # the encoder subtree transfers (reference filter:
        # captioning_module.py:157-159 keeps 'encoder' keys)
        from bmt_tpu.train.checkpoint import load_pretrained_encoder_native
        params['encoder'] = load_pretrained_encoder_native(
            path, params['encoder'], 'prop')
    frozen = not getattr(cfg, 'finetune_prop_encoder', False)
    return params, ('encoder' if frozen else None)


def train_cap(cfg: Config):
    from bmt_tpu.utils.misc import enable_compile_cache
    enable_compile_cache()
    maybe_init_distributed()
    seed = 0
    np.random.seed(seed)

    train_ds = CaptioningDataset(cfg, 'train')
    val_1_ds = CaptioningDataset(cfg, 'val_1', vocab=train_ds.train_vocab)
    val_2_ds = CaptioningDataset(cfg, 'val_2', vocab=train_ds.train_vocab)

    dims = CapModelDims.from_config(cfg, train_ds.trg_voc_size)

    glove = None
    if getattr(cfg, 'glove_path', None):
        # always keep the full pretrained width: when it differs from
        # d_model_caps, init_vocab_embedder adds the reference's trained
        # Linear+ReLU adapter (blocks.py:57-63) rather than truncating the
        # vectors to meaningless prefixes
        glove = load_glove(cfg.glove_path, train_ds.train_vocab,
                           dim=_glove_dim(cfg), cache_dir='./tmp')

    key = jax.random.PRNGKey(seed)
    if cfg.modality == 'audio_video':
        params = init_bimodal_transformer(key, dims, glove=glove)
        emb_key = 'emb_C'
    else:
        params = init_unimodal_transformer(key, dims, glove=glove)
        emb_key = 'trg_emb'

    params, frozen_module = _load_pretrained_encoder(params, cfg)

    # full-captioner seed (continued pretraining / LoRA base) — beyond the
    # reference, which can only transplant encoders between stages
    cap_seed = getattr(cfg, 'pretrained_cap_model_path', None)
    if cap_seed:
        from bmt_tpu.train.checkpoint import load_pretrained_cap_params
        print(f'Pretrained cap path (full-model seed): \n {cap_seed}')
        params = load_pretrained_cap_params(cap_seed, params)

    lora_rank = int(getattr(cfg, 'lora_rank', 0) or 0)
    if lora_rank:
        from bmt_tpu.ops.lora import (add_lora, count_lora,
                                      lora_frozen_predicate)
        params = add_lora(params, lora_rank, jax.random.fold_in(key, 77),
                          getattr(cfg, 'lora_alpha', None),
                          getattr(cfg, 'lora_targets', 'attn'))
        sites, n_adapter = count_lora(params)
        print(f'LoRA: rank {lora_rank}, {sites} adapted linears, '
              f'{n_adapter / 1e6:.3f} Mil. adapter params')

    # frozen leaves: GloVe table unless --unfreeze_word_emb; imported encoder;
    # with LoRA, everything except the adapters
    freeze_emb = (glove is not None
                  and not getattr(cfg, 'unfreeze_word_emb', False))

    def is_frozen(path_keys):
        if lora_rank:
            return lora_frozen_predicate(path_keys)
        if freeze_emb and path_keys[:2] == (emb_key, 'table'):
            return True
        if frozen_module is not None and path_keys[0] == frozen_module:
            return True
        return False

    mask = freeze_mask(params, is_frozen)
    # the warmup_cosine schedule needs the run's step budget
    optimizer = build_optimizer(cfg, frozen_mask=mask,
                                total_steps=cfg.epoch_num * len(train_ds))

    n_ep = getattr(cfg, 'ep_devices', 1)
    if n_ep > 1 and (dims.moe_experts or 0) % n_ep != 0:
        raise ValueError(
            f'--ep_devices {n_ep} requires --moe_experts divisible by it '
            f'(got {dims.moe_experts}); expert weights shard their leading '
            f'expert axis over the ep mesh axis')
    use_fsdp = bool(getattr(cfg, 'fsdp', False))
    dp = DataParallel(getattr(cfg, 'dp_devices', None), ep=n_ep,
                      fsdp=use_fsdp)
    compute_dtype = (jnp.bfloat16 if cfg.compute_dtype == 'bfloat16'
                     else jnp.float32)
    ema_decay = float(getattr(cfg, 'ema_decay', 0.0) or 0.0)
    raw_step = make_cap_train_step(
        dims, optimizer, cfg.smoothing, train_ds.pad_idx,
        cfg.attention_impl, compute_dtype,
        accum_steps=getattr(cfg, 'grad_accum_steps', 1),
        moe_aux_coeff=getattr(cfg, 'moe_aux_coeff', 0.01),
        ema_decay=ema_decay, frozen_mask=mask)
    train_step = dp.jit_step(raw_step, donate_state=True)
    # --steps_per_dispatch > 1: bundle K optimizer steps per dispatch
    # (lax.scan over K stacked batches; bit-identical to sequential
    # dispatches — see train/steps.py:make_multistep). Epoch tails
    # shorter than a bundle run through train_step.
    steps_per_dispatch = int(getattr(cfg, 'steps_per_dispatch', 1) or 1)
    multistep = None
    if steps_per_dispatch > 1:
        from bmt_tpu.train.steps import make_multistep
        multistep = dp.jit_step(make_multistep(raw_step),
                                donate_state=True, stacked=True)
    val_step = jax.jit(make_cap_val_step(
        dims, cfg.smoothing, train_ds.pad_idx, cfg.attention_impl,
        compute_dtype))
    if getattr(cfg, 'decode_strategy', 'greedy') == 'beam':
        # make_bimodal_beam_fn dispatches by dims.modality internally
        greedy_fn = make_bimodal_beam_fn(
            dims, cfg.max_len, train_ds.start_idx, train_ds.end_idx,
            train_ds.pad_idx, cfg.beam_size, cfg.length_penalty,
            cfg.attention_impl, getattr(cfg, 'kv_cache_int8', False))
    elif getattr(cfg, 'decode_strategy', 'greedy') == 'sample':
        # make_bimodal_sample_fn dispatches by dims.modality internally
        greedy_fn = make_bimodal_sample_fn(
            dims, cfg.max_len, train_ds.start_idx, train_ds.end_idx,
            train_ds.pad_idx, cfg.temperature,
            getattr(cfg, 'sample_top_k', 0),
            getattr(cfg, 'sample_top_p', 1.0), cfg.attention_impl,
            getattr(cfg, 'kv_cache_int8', False), seed=seed)
    elif cfg.modality == 'audio_video':
        greedy_fn = make_bimodal_greedy_fn(
            dims, cfg.max_len, train_ds.start_idx, train_ds.end_idx,
            train_ds.pad_idx, cfg.attention_impl,
            getattr(cfg, 'kv_cache_int8', False))
    else:
        greedy_fn = make_unimodal_greedy_fn(
            dims, cfg.max_len, train_ds.start_idx, train_ds.end_idx,
            train_ds.pad_idx, cfg.attention_impl,
            getattr(cfg, 'kv_cache_int8', False))

    if dp.n_ep > 1 or use_fsdp:
        # shard MoE expert weights over ep / large leaves over dp (fsdp)
        # BEFORE optimizer.init: optax's zeros_like preserves the
        # placement, so the Adam moments shard identically and jit_step
        # inherits everything (mesh.py)
        from bmt_tpu.parallel import place_params
        params = place_params(
            params, dp.mesh, fsdp=use_fsdp,
            fsdp_min_elems=getattr(cfg, 'fsdp_min_elems', 1 << 16))
    state = init_train_state(params, optimizer, seed,
                             getattr(cfg, 'prng_impl', 'rbg'),
                             ema=ema_decay > 0)
    if dp.n_ep == 1 and not use_fsdp:
        state = state._replace(
            params=dp.replicate_tree(state.params),
            opt_state=dp.replicate_tree(state.opt_state),
            ema=(dp.replicate_tree(state.ema)
                 if state.ema is not None else None))
    else:
        # the sharded leaves are already on the mesh; the scalars
        # optimizer.init created fresh (counts, rng, step) are not
        state = dp.complete_on_mesh(state)

    # TRAINABLE means not frozen: the reference counts requires_grad
    # params only, so the GloVe table / frozen encoders / anchors are
    # excluded here too
    n_params = sum(
        int(np.prod(p.shape))
        for p, frozen in zip(jax.tree.leaves(params),
                             jax.tree.leaves(mask))
        if hasattr(p, 'shape') and not frozen)
    print(f'Total Number of Trainable Parameters: {n_params / 1e6} Mil.')

    logger = MetricsLogger(cfg.log_path) if cfg.to_log else NullLogger()
    logger.add_scalar('debug/param_number', n_params, 0)

    scheduler = None
    if cfg.scheduler == 'reduce_on_plateau':
        scheduler = ReduceLROnPlateau(cfg.lr, cfg.lr_reduce_factor,
                                      cfg.lr_patience)

    best_metric = 0.0
    unchanged = 0
    start_epoch = 0

    # resume if a checkpoint exists in the log dir (either format — a
    # changed --ckpt_format must not silently restart from epoch 0)
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
    ckpt_dir = cfg.model_checkpoint_path if cfg.to_log else None
    on_disk_fmt = (detect_checkpoint_format(ckpt_dir, 'last_cap_model',
                                            ckpt_fmt) if ckpt_dir else None)
    if on_disk_fmt is not None:
        if on_disk_fmt != ckpt_fmt:
            print(f'Resuming from a {on_disk_fmt} checkpoint '
                  f'(--ckpt_format is {ckpt_fmt}; new saves use {ckpt_fmt})')
        _, load_ckpt = get_checkpoint_io(on_disk_fmt)
        p, meta, opt = load_ckpt(ckpt_dir, state.params,
                                 state.opt_state, 'last_cap_model')
        # re-place the loaded host arrays onto the live state's shardings:
        # without this an fsdp/ep/mp resume would silently lose its
        # placements at the next jit call (parallel/mesh.py:place_like)
        from bmt_tpu.parallel import place_like
        p = place_like(p, state.params)
        opt = place_like(opt, state.opt_state) if opt is not None else None
        # restore the step counter too: the per-step dropout key is
        # fold_in(rng, step), so a resume at step=0 would replay the RNG
        # streams already consumed by the original run's first epochs
        ema = state.ema
        if ema is not None:
            # EMA sidecar: restore for an exact resume; seed from the
            # restored raw params when resuming a pre-EMA run
            try:
                e, _, _ = load_ckpt(ckpt_dir, state.ema, None,
                                    'last_cap_model.ema')
                ema = place_like(e, state.ema)
            except FileNotFoundError:
                ema = place_like(jax.tree.map(lambda x: x.copy(), p),
                                 state.ema)
        state = state._replace(
            params=p, opt_state=opt or state.opt_state, ema=ema,
            step=jnp.asarray(meta.get('step', 0), jnp.int32))
        start_epoch = meta.get('epoch', -1) + 1
        best_metric = meta.get('best_metric', 0.0)
        unchanged = meta.get('unchanged', 0)
        # batch-exact resume of a preemption-interrupted epoch
        # (utils/preempt.py): skip the batches already trained on
        resume_batch = meta.get('batch_in_epoch', 0) or 0
        if scheduler is not None and meta.get('scheduler'):
            scheduler.load_state_dict(meta['scheduler'])
        print(f'Resumed from epoch {start_epoch}'
              + (f' batch {resume_batch}' if resume_batch else ''))
    else:
        resume_batch = 0

    # SIGTERM -> finish the current batch, checkpoint, exit cleanly
    # (bit-identical resume; see utils/preempt.py). Only worth installing
    # when there is somewhere to save.
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

        state, train_loss = train_epoch_cap(
            train_step, state, train_ds, epoch, logger, dp, seed,
            profile_steps=getattr(cfg, 'profile_steps', 0),
            profile_dir=(os.path.join(cfg.log_path, 'profile')
                         if cfg.log_path else None),
            guard=guard,
            start_batch=(resume_batch if epoch == start_epoch else 0),
            multistep=multistep, steps_per_dispatch=steps_per_dispatch)

        if guard is not None and guard.requested:
            # mid-epoch: save with last COMPLETED epoch + batch cursor so
            # the resume re-enters this epoch at the right batch; signal
            # after the final batch: the epoch is complete, save normally
            b = guard.batch_in_epoch
            save_ckpt(ckpt_dir, state.params, {
                'config': cfg.to_dict(),
                'epoch': epoch - 1 if b else epoch,
                'batch_in_epoch': b or 0,
                'step': int(state.step),
                'val_1_loss': None, 'val_2_loss': None,
                'val_1_metrics': None, 'val_2_metrics': None,
                'trg_voc_size': train_ds.trg_voc_size,
                'vocab_itos': train_ds.train_vocab.itos,
                'best_metric': best_metric,
                'unchanged': unchanged,
                'scheduler': (scheduler.state_dict()
                              if scheduler is not None else None),
            }, state.opt_state, 'last_cap_model')
            if state.ema is not None:
                save_ckpt(ckpt_dir, state.ema, {'epoch': epoch},
                          None, 'last_cap_model.ema')
            print(f'[preempt] rolling checkpoint saved @ epoch {epoch} '
                  f'batch {b if b else "end"}; exiting')
            break

        # EMA (if on) is what gets EVALUATED and what best_* holds; the
        # raw weights keep training and the rolling last_* keeps both
        eval_params = state.ema if state.ema is not None else state.params
        val_1_loss = validate_next_word(val_step, eval_params, val_1_ds,
                                        epoch, dp)
        val_2_loss = validate_next_word(val_step, eval_params, val_2_ds,
                                        epoch, dp)
        val_avg = (val_1_loss + val_2_loss) / 2
        logger.add_scalar('debug/val_loss_avg', val_avg, epoch)

        if scheduler is not None:
            state = state._replace(opt_state=set_learning_rate(
                state.opt_state, scheduler.step(val_avg)))

        val_1_metrics = val_2_metrics = avg = None
        if epoch >= cfg.one_by_one_starts_at:
            # decode in the configured compute dtype (params cast once,
            # features per batch inside the wrapper); features sharded
            # over the dp mesh so validation decode uses every chip
            decode_params = cast_tree(eval_params, compute_dtype)
            decode_fn = make_decode_fn(greedy_fn, dp, compute_dtype)
            val_1_metrics = validation_1by1(cfg, decode_params, decode_fn,
                                            val_1_ds, epoch, logger)
            val_2_metrics = validation_1by1(cfg, decode_params, decode_fn,
                                            val_2_ds, epoch, logger)
            if val_1_metrics is not None:
                avg = average_metrics_in_two_dicts(
                    val_1_metrics, val_2_metrics)['Average across tIoUs']
            if cfg.to_log and avg is not None:
                for name, tag in (('METEOR', 'meteor'), ('Bleu_4', 'bleu4'),
                                  ('Bleu_3', 'bleu3'),
                                  ('Precision', 'precision'),
                                  ('Recall', 'recall')):
                    logger.add_scalar(f'metrics/{tag}', avg[name] * 100,
                                      epoch)

        is_best = False
        if avg is not None:
            is_best = best_metric < avg['METEOR']
            if is_best:
                best_metric = avg['METEOR']
                unchanged = 0
            else:
                unchanged += 1

        if ckpt_dir:
            meta = {
                'config': cfg.to_dict(),
                'epoch': epoch,
                'step': int(state.step),
                'val_1_loss': val_1_loss, 'val_2_loss': val_2_loss,
                'val_1_metrics': val_1_metrics,
                'val_2_metrics': val_2_metrics,
                'trg_voc_size': train_ds.trg_voc_size,
                'vocab_itos': train_ds.train_vocab.itos,
                'best_metric': best_metric,
                'unchanged': unchanged,
                'scheduler': (scheduler.state_dict()
                              if scheduler is not None else None),
            }
            # rolling checkpoint every epoch: a crash before the first
            # 1-by-1 validation still resumes from the latest epoch
            save_ckpt(ckpt_dir, state.params, meta,
                      state.opt_state, 'last_cap_model')
            if state.ema is not None:
                save_ckpt(ckpt_dir, state.ema, {'epoch': epoch},
                          None, 'last_cap_model.ema')
            if is_best:
                # best_* holds the weights that actually SCORED best —
                # the EMA tree when --ema_decay is on — so eval/serving
                # consumers load it unchanged
                save_ckpt(ckpt_dir, eval_params, meta,
                          state.opt_state, 'best_cap_model')
                if lora_rank:
                    # the finetune's shippable artifact: adapter leaves
                    # only (kilobytes), consumed directly by serving's
                    # --lora_adapter
                    from bmt_tpu.train.checkpoint import save_lora_npz
                    save_lora_npz(os.path.join(
                        ckpt_dir, 'best_cap_model.lora.npz'), eval_params)

    if guard is not None:
        guard.uninstall()
    if async_writer is not None:
        # drain pending background writes (incl. a preemption save) so
        # the checkpoint is durably on disk before the process can exit
        async_writer.close()
    print(f'{cfg.curr_time}')
    print(f'best_metric: {best_metric}')
    logger.close()
    return best_metric
