'''Epoch-level training / validation loops and the 1-by-1 greedy-decode
validation producing ActivityNet submission JSONs.

Functional re-design of the reference epoch loops
(reference: epoch_loops/captioning_epoch_loops.py:122-292,
epoch_loops/proposal_epoch_loops.py:27-140) around jitted step functions and
a data-parallel mesh instead of nn.DataParallel.
'''
from __future__ import annotations

import json
import os
from time import time
from typing import Optional

import numpy as np

from bmt_tpu.evaluation.metrics import calculate_metrics
from bmt_tpu.utils.misc import HiddenPrints


def _device_batch(batch: dict, keys) -> dict:
    return {k: batch[k] for k in keys if k in batch}


def _pad_batch_to(batch: dict, B: int) -> dict:
    '''Repeat-pad array leaves along axis 0 to batch size B (decode batches
    must hit a fixed compiled shape; extra rows are sliced off afterward).'''
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.shape and v.shape[0] < B:
            reps = [v[-1:]] * (B - v.shape[0])
            out[k] = np.concatenate([v] + reps, axis=0)
        elif isinstance(v, dict):
            out[k] = _pad_batch_to(v, B)
        else:
            out[k] = v
    return out


def _stack_host_batches(devs):
    '''Stack K prepared host batches leaf-wise into the leading scan axis
    of a multi-step-dispatch bundle (train.steps.make_multistep).'''
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs), *devs)


class _EpochProfiler:
    '''First-N-steps jax trace of an epoch (epoch 0 only, both stages'
    ``--profile_steps``); on close, prints the traced DEVICE ms/step —
    the number to hold against the roofline (the wall−device gap is
    host/tunnel overhead, docs/DESIGN.md §6b). Best-effort: a trace the
    backend cannot annotate skips the summary, never the epoch.'''

    def __init__(self, profile_steps: int, epoch: int, profile_dir):
        from bmt_tpu.utils.profiling import trace
        self.n_target = profile_steps
        self.dir = profile_dir
        self.ctx = (trace(profile_dir)
                    if profile_steps > 0 and epoch == 0 and profile_dir
                    else None)
        if self.ctx is not None:
            self.ctx.__enter__()

    def step(self, n: int):
        '''Call after every dispatch; closes once n reaches the target.'''
        if self.ctx is not None and n >= self.n_target:
            self.close(n)

    def close(self, n: int):
        if self.ctx is None:
            return
        ctx, self.ctx = self.ctx, None
        ctx.__exit__(None, None, None)
        import sys
        try:
            from bmt_tpu.utils.profiling import trace_device_ms_per_exec
            total_ms = trace_device_ms_per_exec(str(self.dir), 1)
            print(f'[profile] traced device time: '
                  f'{total_ms / max(n, 1):.3f} ms/step over {n} steps '
                  f'({self.dir})', file=sys.stderr)
        except Exception as e:
            print(f'[profile] trace summary unavailable: '
                  f'{type(e).__name__}: {e}', file=sys.stderr)


def train_epoch_cap(train_step, state, dataset, epoch: int, logger=None,
                    dp=None, seed: int = 0, profile_steps: int = 0,
                    profile_dir=None, guard=None, start_batch: int = 0,
                    multistep=None, steps_per_dispatch: int = 1):
    '''Teacher-forced training epoch (reference:
    captioning_epoch_loops.py:122-149). Returns (state, mean loss).

    With profile_steps > 0 (epoch 0 only), a jax.profiler trace of the
    first N steps is captured under profile_dir (TensorBoard/Perfetto).

    guard: optional utils/preempt.PreemptionGuard — polled after every
    dispatch; on request the epoch stops early with
    guard.batch_in_epoch = index of the next unprocessed batch.
    start_batch: skip the first k batches (exact resume of an
    interrupted epoch; batch order is deterministic per (seed, epoch)).

    multistep + steps_per_dispatch > 1: bundle that many optimizer steps
    into one device dispatch (``multistep`` = the jitted
    ``make_multistep`` wrap of the SAME step; bit-identical to sequential
    dispatches — tests/test_multistep.py). Epoch tails shorter than a
    bundle fall back to the single-step ``train_step``. Preemption
    granularity coarsens to one bundle: the guard is polled between
    dispatches, so up to steps_per_dispatch-1 extra batches complete
    after the signal — still an exact-resume point, just a later one.'''
    total, n = 0.0, 0
    bundle_k = steps_per_dispatch if multistep is not None else 1
    pending = []
    prof = _EpochProfiler(profile_steps, epoch, profile_dir)
    # per-host sharded input pipeline: on a multi-host pod each process
    # loads feature files only for its own dp row block (None single-host;
    # the kwarg is only passed when live so duck-typed datasets without
    # multi-host support keep working)
    local_rows = dp.local_rows(dataset.batch_size) if dp is not None else None
    kw = {} if local_rows is None else {'local_rows': local_rows}
    if start_batch:
        kw['start_batch'] = start_batch

    def run_single(dev):
        nonlocal state, total, n
        if dp is not None:
            dev = dp.shard(dev)
        state, metrics = train_step(state, dev)
        # keep the loss ON DEVICE: a float() here would block the host
        # on every step and defeat JAX's async dispatch (the next
        # batch's shard/device_put should overlap this step's compute)
        total = total + metrics['loss']
        n += 1

    def run_bundle(devs):
        nonlocal state, total, n
        stacked = _stack_host_batches(devs)
        if dp is not None:
            stacked = dp.shard_stacked(stacked)
        state, metrics = multistep(state, stacked)
        total = total + metrics['loss'].sum()
        n += len(devs)

    try:
        for batch in dataset.batches(epoch=epoch, seed=seed, **kw):
            # Tail batches are repeat-padded to the compiled batch size and
            # masked out of the loss via 'row_valid' (reference trains on
            # every row: captioning_epoch_loops.py:122-149); shapes stay
            # static / divisible over the dp mesh.
            n_valid = len(batch['video_ids'])
            if n_valid != dataset.batch_size:
                batch = _pad_batch_to(batch, dataset.batch_size)
            dev = _device_batch(batch, ('src', 'caption'))
            dev['row_valid'] = np.arange(dataset.batch_size) < n_valid
            if bundle_k > 1:
                pending.append(dev)
                if len(pending) < bundle_k:
                    continue
                run_bundle(pending)
                pending = []
            else:
                run_single(dev)
            prof.step(n)
            if guard is not None and guard.requested:
                guard.batch_in_epoch = start_batch + n
                break
        else:
            # epoch tail shorter than a bundle: single-step dispatches
            for dev in pending:
                run_single(dev)
                if guard is not None and guard.requested:
                    guard.batch_in_epoch = start_batch + n
                    break
            pending = []
    finally:
        prof.close(n)
    mean = float(total) / max(n, 1)
    if logger is not None:
        logger.add_scalar('debug/train_loss_epoch', mean, epoch)
    return state, mean


def validate_next_word(val_step, params, dataset, epoch: int,
                       dp=None) -> float:
    '''Next-word validation loss (reference:
    captioning_epoch_loops.py:152-172).'''
    total, n = 0.0, 0
    local_rows = dp.local_rows(dataset.batch_size) if dp is not None else None
    kw = {} if local_rows is None else {'local_rows': local_rows}
    for batch in dataset.batches(epoch=0, shuffle=False, **kw):
        B = dataset.batch_size
        n_valid = len(batch['video_ids'])
        batch = _pad_batch_to(batch, B)
        dev = _device_batch(batch, ('src', 'caption'))
        # repeat-padded tail rows are masked out of the loss so they are
        # not double-counted (same 'row_valid' contract as the train step)
        dev['row_valid'] = np.arange(B) < n_valid
        if dp is not None:
            dev = dp.shard(dev)
        total = total + val_step(params, dev)   # device-side (async)
        n += 1
    return float(total) / max(n, 1)


def make_decode_fn(greedy_fn, dp=None, compute_dtype=None):
    '''Decode wrapper shared by the trainer and the eval driver: casts the
    feature stacks to the compute dtype and shards them over the dp mesh
    when the batch divides evenly (odd eval batches fall back to
    single-device rather than erroring mid-run).'''
    from bmt_tpu.train.steps import cast_tree

    def decode_fn(params, src):
        if compute_dtype is not None:
            src = cast_tree(src, compute_dtype)
        if dp is not None:
            src = dp.maybe_shard(src)
        return greedy_fn(params, src)
    return decode_fn


def ints_to_sentence(ints, vocab, end_token='</s>') -> str:
    '''Token ids -> cleaned sentence (reference:
    captioning_epoch_loops.py:217-240): drop <s>, cut at first </s>, join,
    capitalize.'''
    strings = [vocab.itos[int(i)] for i in ints][1:]
    try:
        strings = strings[:strings.index(end_token)]
    except ValueError:
        pass
    return ' '.join(strings).capitalize()


def validation_1by1(cfg, params, decoder_fn, dataset, epoch: int,
                    logger=None, phase: Optional[str] = None):
    '''Greedy-decode every validation segment, write the submission JSON and
    score it (reference: captioning_epoch_loops.py:174-292).

    decoder_fn(params, feature_stacks) -> (B, max_len+1) token ids.
    '''
    start_timer = time()
    phase = phase or dataset.phase
    predictions = {
        'version': 'VERSION 1.0',
        'external_data': {'used': True, 'details': ''},
        'results': {},
    }

    if phase == 'val_1':
        reference_paths = [cfg.reference_paths[0]]
        tIoUs = [0.5]
    elif phase == 'val_2':
        reference_paths = [cfg.reference_paths[1]]
        tIoUs = [0.5]
    elif phase == 'learned_props':
        reference_paths = cfg.reference_paths
        tIoUs = cfg.tIoUs
        assert len(tIoUs) == 4
    else:
        raise ValueError(phase)

    def flush(batch, tokens):
        # np.asarray here blocks on THIS batch's result only; the next
        # batch's decode (dispatched before flush is called) keeps running
        # on device while the host converts sentences — 1-deep software
        # pipelining of host work against device decode
        ints_stack = np.asarray(tokens)[:len(batch['video_ids'])]
        for vid, start, end, ints in zip(batch['video_ids'], batch['starts'],
                                         batch['ends'], ints_stack):
            segment = {
                'sentence': ints_to_sentence(ints, dataset.train_vocab,
                                             cfg.end_token),
                'timestamp': [float(start), float(end)],
            }
            predictions['results'].setdefault(vid, []).append(segment)

    in_flight = None
    for batch in dataset.batches(epoch=0, shuffle=False):
        padded = _pad_batch_to(batch, dataset.batch_size)
        tokens = decoder_fn(params, padded['src'])   # async dispatch
        if in_flight is not None:
            flush(*in_flight)
        in_flight = (batch, tokens)
    if in_flight is not None:
        flush(*in_flight)

    # a disabled (--dont_log) or empty log dir must not disable SCORING:
    # the decode work is already paid and best-model/early-stop tracking
    # depends on the metrics — fall back to ./tmp for the submission file
    # (AnetPredictions uses the same fallback)
    out_dir = cfg.log_path or './tmp'
    os.makedirs(out_dir, exist_ok=True)
    submission_path = os.path.join(
        out_dir, f'captioning_results_{phase}_e{epoch}.json')
    if os.path.exists(submission_path):
        submission_path = submission_path.replace('.json', f'_{time()}.json')
    with open(submission_path, 'w') as f:
        json.dump(predictions, f)

    with HiddenPrints():
        val_metrics = calculate_metrics(reference_paths, submission_path,
                                        tIoUs, cfg.max_prop_per_vid)
    if phase == 'learned_props':
        print(submission_path)

    if logger is not None and phase != 'learned_props':
        avg = val_metrics['Average across tIoUs']
        logger.add_scalar(f'{phase}/meteor', avg['METEOR'] * 100, epoch)
        logger.add_scalar(f'{phase}/bleu4', avg['Bleu_4'] * 100, epoch)
        logger.add_scalar(f'{phase}/bleu3', avg['Bleu_3'] * 100, epoch)
        logger.add_scalar(f'{phase}/precision', avg['Precision'] * 100, epoch)
        logger.add_scalar(f'{phase}/recall', avg['Recall'] * 100, epoch)
        logger.add_scalar(f'{phase}/duration_of_1by1',
                          (time() - start_timer) / 60, epoch)
    return val_metrics


def train_epoch_prop(train_step, state, dataset, epoch: int, logger=None,
                     dp=None, seed: int = 0, guard=None,
                     start_batch: int = 0, multistep=None,
                     steps_per_dispatch: int = 1, profile_steps: int = 0,
                     profile_dir=None):
    '''Proposal-generator training epoch (reference:
    proposal_epoch_loops.py:27-63). guard/start_batch: see
    train_epoch_cap (preemption-exact early stop + resume);
    multistep/steps_per_dispatch: multi-step dispatch bundling, also as
    there (stacked metrics sum into the same accumulators);
    profile_steps/profile_dir: first-N-steps jax trace + traced
    device-ms summary, also as there.'''
    from bmt_tpu.utils.proposal_utils import add_dict_to_another_dict
    total, n = 0.0, 0
    acc: dict = {}
    bundle_k = steps_per_dispatch if multistep is not None else 1
    pending = []
    prof = _EpochProfiler(profile_steps, epoch, profile_dir)
    # per-host sharded input pipeline (see train_epoch_cap); the fixed
    # proposal pad lengths make batch geometry host-independent trivially
    local_rows = dp.local_rows(dataset.batch_size) if dp is not None else None
    kw = {} if local_rows is None else {'local_rows': local_rows}
    if start_batch:
        kw['start_batch'] = start_batch

    def account(metrics, k):
        # device-side accumulation (no per-step host sync); the shared
        # loss-dict accumulator works on jax scalars unchanged. Bundled
        # dispatches return (K,)-stacked metrics — sum them in.
        nonlocal total, acc, n
        loss = metrics['loss']
        total = total + (loss.sum() if k > 1 else loss)
        rest = {key: (v.sum() if k > 1 else v)
                for key, v in metrics.items() if key != 'loss'}
        acc = add_dict_to_another_dict(rest, acc)
        n += k

    def run_single(dev):
        nonlocal state
        if dp is not None:
            dev = dp.shard(dev)
        state, metrics = train_step(state, dev)
        account(metrics, 1)

    for batch in dataset.batches(epoch=epoch, seed=seed, **kw):
        dev = _device_batch(batch, ('src', 'centers', 'lengths', 'valid'))
        if bundle_k > 1:
            pending.append(dev)
            if len(pending) < bundle_k:
                continue
            stacked = _stack_host_batches(pending)
            if dp is not None:
                stacked = dp.shard_stacked(stacked)
            state, metrics = multistep(state, stacked)
            account(metrics, len(pending))
            pending = []
        else:
            run_single(dev)
        prof.step(n)
        if guard is not None and guard.requested:
            guard.batch_in_epoch = start_batch + n
            break
    else:
        for dev in pending:
            run_single(dev)
            if guard is not None and guard.requested:
                guard.batch_in_epoch = start_batch + n
                break
        pending = []
    prof.close(n)
    if n == 0 and start_batch == 0:
        import sys
        print(f'WARNING: proposal train epoch {epoch} ran ZERO batches — '
              f'the dataset has fewer videos than train_batch_size '
              f'(B x dp_devices) and the last partial batch is dropped '
              f'(reference drop_last); nothing was trained this epoch',
              file=sys.stderr)
    mean = float(total) / max(n, 1)
    if logger is not None:
        logger.add_scalar('debug/loss_epoch', mean, epoch)
        for k, v in acc.items():
            logger.add_scalar(f'debug/train_{k}', float(v) / max(n, 1),
                              epoch)
    else:
        print(f'Train Loss @ {epoch} epoch: {mean}')
    return state, mean


def validate_prop(cfg, inference_step, params, dataset, epoch: int,
                  logger=None, dp=None):
    '''Proposal validation -> AnetPredictions -> detection P/R/F1
    (reference: proposal_epoch_loops.py:99-140). Returns avg F1.'''
    from bmt_tpu.utils.proposal_utils import AnetPredictions, calculate_f1
    anet = AnetPredictions(cfg, dataset.phase, epoch)
    for batch in dataset.batches(epoch=0, shuffle=False):
        n_valid = len(batch['video_ids'])
        padded = _pad_batch_to(batch, dataset.batch_size)
        dev = _device_batch(padded, ('src',))
        if dp is not None:
            dev = dp.shard(dev)
        preds = np.asarray(inference_step(params, dev))[:n_valid]
        anet.add_new_predictions(preds, batch)
    anet.write_anet_predictions_to_json()
    metrics = anet.evaluate_predictions()

    if logger is not None:
        for tiou in cfg.tIoUs:
            p, r = metrics[tiou]['Precision'], metrics[tiou]['Recall']
            logger.add_scalar(f'densevid_eval_k/precision_{tiou}', p, epoch)
            logger.add_scalar(f'densevid_eval_k/recall_{tiou}', r, epoch)
            logger.add_scalar(f'densevid_eval_k/F1_{tiou}',
                              calculate_f1(r, p), epoch)
    avg_p = metrics['Average across tIoUs']['Precision']
    avg_r = metrics['Average across tIoUs']['Recall']
    avg_f1 = calculate_f1(avg_r, avg_p)
    if logger is not None:
        logger.add_scalar('metrics/avg_precision_at_k', avg_p, epoch)
        logger.add_scalar('metrics/avg_recall_at_k', avg_r, epoch)
        logger.add_scalar('metrics/avg_F1_at_k', avg_f1, epoch)
    return avg_f1, metrics
