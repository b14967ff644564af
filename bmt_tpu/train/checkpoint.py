'''Checkpointing: native save/resume + reference PyTorch .pt import.

Native format: a directory with ``params.npz`` / ``opt_state.npz`` (flattened
pytrees), ``meta.json`` (config dict, epoch, metrics, vocab itos) — full
training resume, unlike the reference which can only save
(reference: captioning_epoch_loops.py:68-88 saves, nothing loads for resume).

Reference import: reads ``best_cap_model.pt`` / ``best_prop_model.pt``
(PyTorch zip pickles containing a pickled Config object and a DataParallel
state_dict with ``module.`` prefixes — reference:
scripts/eval_on_learned_props.py:80-95, sample/single_video_prediction.py:95)
and converts them into this framework's parameter pytrees. torch (CPU) is
used for deserialization only.
'''
from __future__ import annotations

import json
import os
import re
import sys
import types
from typing import Dict, Tuple

import numpy as np

SEP = '/'

try:
    from ml_dtypes import bfloat16 as _BF16
except ImportError:                                   # pragma: no cover
    _BF16 = None


# ---------------------------------------------------------------------------
# native npz checkpoints with resume
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=''):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f'{prefix}{k}{SEP}'))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f'{prefix}{i}{SEP}'))
    else:
        arr = np.asarray(tree)
        if arr.dtype == _BF16:
            # np.savez cannot serialize ml_dtypes.bfloat16; upcast to
            # float32 (lossless: bf16 is a truncated f32) — the load path
            # casts back to the template leaf's bf16 (also lossless), so
            # the round trip is bit-exact. Used by the low-precision
            # optimizer-state option (--optim_mu_dtype bfloat16).
            arr = arr.astype(np.float32)
        out[prefix[:-1]] = arr
    return out


def _json_meta_default(obj):
    '''Meta values must survive a JSON round trip: numpy arrays/scalars
    convert losslessly; anything else fails AT SAVE TIME (the old
    ``default=str`` stringified e.g. a stray ndarray into its elided repr,
    corrupting it far from the save that caused it).'''
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, np.generic):
        return obj.item()
    if hasattr(obj, 'tolist'):        # jax arrays
        return np.asarray(obj).tolist()
    raise TypeError(
        f'checkpoint meta value of type {type(obj).__name__} is not '
        f'JSON-serializable: {obj!r:.80}')


def save_pytree_npz(path: str, tree):
    '''Atomic: np.savez truncates in place, so a crash mid-write would
    destroy the ONLY copy of a rolling resume checkpoint — write to a
    temp name in the same directory and os.replace (atomic on POSIX).'''
    tmp = f'{path}.tmp-{os.getpid()}'
    np.savez(tmp, **_flatten(tree))
    # np.savez appends .npz when missing; the tmp name has none
    os.replace(tmp if os.path.exists(tmp) else f'{tmp}.npz', path)


def _restore_into(data: Dict[str, np.ndarray], like, origin: str):
    '''Rebuild the structure of ``like`` from a flat key->array dict,
    validating that every restored array matches the template leaf's shape
    (a silent shape drift would surface as an XLA error or wrong math far
    from the load). Returns (tree, used_keys).'''
    used = set()

    def rebuild(t, prefix=''):
        if isinstance(t, dict):
            return {k: rebuild(v, f'{prefix}{k}{SEP}') for k, v in t.items()}
        if isinstance(t, (list, tuple)):
            seq = [rebuild(v, f'{prefix}{i}{SEP}') for i, v in enumerate(t)]
            if hasattr(t, '_fields'):  # NamedTuple (e.g. optax states)
                return type(t)(*seq)
            return tuple(seq) if isinstance(t, tuple) else seq
        key = prefix[:-1]
        used.add(key)
        arr = data[key]
        tpl_shape = getattr(t, 'shape', None)
        if tpl_shape is not None and tuple(arr.shape) != tuple(tpl_shape):
            raise ValueError(
                f'{origin}: array {key!r} has shape {tuple(arr.shape)} but '
                f'the restore template expects {tuple(tpl_shape)} — the '
                f'checkpoint was written for a different architecture')
        if (_BF16 is not None and getattr(t, 'dtype', None) == _BF16
                and arr.dtype != _BF16):
            # bf16 leaves are stored upcast to f32 (np.savez cannot hold
            # ml_dtypes.bfloat16); restore the template's dtype — exact,
            # since the f32 came from a bf16. Only bf16 templates cast:
            # any other dtype mismatch should stay visible, not be
            # silently coerced.
            arr = arr.astype(_BF16)
        return arr

    return rebuild(like), used


def load_pytree_npz(path: str, like):
    '''Restore arrays into the structure of ``like`` (same treedef).
    Raises if the archive holds keys the template lacks — a silent drop
    (e.g. a GloVe-adapter subtree missing from a hand-built template)
    would surface as a shape error or wrong math far from the load.'''
    data = dict(np.load(path, allow_pickle=False))
    tree, used = _restore_into(data, like, path)
    leftover = sorted(set(data) - used)
    if leftover:
        raise KeyError(
            f'{path} holds {len(leftover)} arrays absent from the restore '
            f'template (first few: {leftover[:4]}) — the template was '
            f'built for a different architecture/options')
    return tree


def _fold_lora_flat(data: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    '''Fold every ``<site>/lora_{a,b,s}`` triple of a flat key->array dict
    into its ``<site>/w`` (fp32 accumulate, mirroring
    ops.lora.merge_linear_lora) and drop the adapter keys — the
    flat-archive analog of ``merge_lora``. No-op on plain archives.'''
    merged = dict(data)
    for k in data:
        site, leaf = k.rsplit(SEP, 1) if SEP in k else ('', k)
        if leaf != 'lora_a':
            continue
        for companion in ('lora_b', 'lora_s'):
            ck = f'{site}{SEP}{companion}'
            if ck not in data:
                raise ValueError(
                    f'archive holds {k!r} but not its companion {ck!r} — '
                    f'an incomplete LoRA adapter triple cannot be folded')
        w_key = f'{site}{SEP}w'
        if w_key not in data:
            hint = (' (the site is int8-quantized — merge LoRA before '
                    'quantize_tree_int8, not after)'
                    if f'{site}{SEP}w_q8' in data else '')
            raise ValueError(
                f'archive holds LoRA adapters for site {site!r} but no '
                f'{w_key!r} base weight to fold them into{hint}')
        a = data[k].astype(np.float32)
        b = data[f'{site}{SEP}lora_b'].astype(np.float32)
        s = float(data[f'{site}{SEP}lora_s'])
        merged[w_key] = (merged[w_key].astype(np.float32) + (a @ b) * s
                         ).astype(data[w_key].dtype)
    return {k: v for k, v in merged.items()
            if k.rsplit(SEP, 1)[-1] not in ('lora_a', 'lora_b', 'lora_s')}


def load_subtree_npz(path: str, like, subtree: str = 'encoder'):
    '''Restore only the ``subtree`` branch of a FULL-checkpoint archive into
    the structure of ``like`` (which is the subtree itself, not the whole
    model). The native analog of the reference's encoder-weights filter
    (reference: model/proposal_generator.py:244-246 keeps ``'encoder' in k``
    keys and drops the rest), so archive keys outside the subtree are
    expected and ignored by design; template keys missing from the archive
    still raise, and shapes are validated.

    A LoRA-finetuned source archive is a valid donor: its adapter deltas
    are folded into the base weights first, so the transplant carries the
    finetune's EFFECTIVE weights (dropping them silently would hand over
    the frozen base as if it were the finetune). Any OTHER subtree key the
    template lacks is an architecture mismatch and raises.'''
    data = dict(np.load(path, allow_pickle=False))
    prefix = subtree + SEP
    sub = {k[len(prefix):]: v for k, v in data.items()
           if k.startswith(prefix)}
    if not sub:
        raise KeyError(
            f'{path} holds no arrays under {subtree!r}/ — not a checkpoint '
            f'of a model with that submodule (keys start with: '
            f'{sorted({k.split(SEP)[0] for k in data})})')
    sub = _fold_lora_flat(sub)
    tree, used = _restore_into(sub, like, f'{path}[{subtree}]')
    leftover = sorted(set(sub) - used)
    if leftover:
        raise KeyError(
            f'{path}[{subtree}] holds {len(leftover)} arrays absent from '
            f'the restore template even after folding LoRA adapters '
            f'(first few: {leftover[:4]}) — written for a different '
            f'architecture/options than this run configures')
    return tree


def save_checkpoint(ckpt_dir: str, params, meta: dict, opt_state=None,
                    name: str = 'best_cap_model'):
    '''meta: JSON-serializable dict (config, epoch, metrics, vocab itos...).

    Multi-host: params/opt_state are replicated (hence addressable on every
    host), so only process 0 writes — the others would race on the shared
    checkpoint dir.'''
    import jax
    if jax.process_index() != 0:
        return
    os.makedirs(ckpt_dir, exist_ok=True)
    save_pytree_npz(os.path.join(ckpt_dir, f'{name}.params.npz'), params)
    if opt_state is not None:
        save_pytree_npz(os.path.join(ckpt_dir, f'{name}.opt.npz'), opt_state)
    # meta written last and atomically: on a crash mid-save the previous
    # meta still pairs with the previous (atomically-replaced) arrays
    meta_path = os.path.join(ckpt_dir, f'{name}.meta.json')
    tmp = f'{meta_path}.tmp-{os.getpid()}'
    with open(tmp, 'w') as f:
        json.dump(meta, f, default=_json_meta_default)
    os.replace(tmp, meta_path)


def load_checkpoint(ckpt_dir: str, params_like, opt_state_like=None,
                    name: str = 'best_cap_model'):
    params = load_pytree_npz(os.path.join(ckpt_dir, f'{name}.params.npz'),
                             params_like)
    with open(os.path.join(ckpt_dir, f'{name}.meta.json')) as f:
        meta = json.load(f)
    opt_state = None
    opt_path = os.path.join(ckpt_dir, f'{name}.opt.npz')
    if opt_state_like is not None and os.path.exists(opt_path):
        opt_state = load_pytree_npz(opt_path, opt_state_like)
    return params, meta, opt_state


# ---------------------------------------------------------------------------
# orbax backend (same call contract as the npz pair above)
# ---------------------------------------------------------------------------
#
# Orbax is the idiomatic JAX checkpointer: atomic directory commits, async
# IO, and — on a pod — per-host distributed save/restore of sharded arrays,
# none of which the flat npz writer provides. meta stays a sidecar JSON so
# resume logic is format-agnostic. Select with --ckpt_format orbax.

def save_checkpoint_orbax(ckpt_dir: str, params, meta: dict, opt_state=None,
                          name: str = 'best_cap_model'):
    '''Params and opt_state go to separate orbax directories (mirroring
    the npz layout) so eval/serving consumers can restore the model
    without an optimizer-state template.'''
    import jax
    import orbax.checkpoint as ocp
    os.makedirs(ckpt_dir, exist_ok=True)
    # the array saves are collectives: EVERY process participates (orbax
    # coordinates shard writes); the meta sidecar is host-side and must be
    # written by exactly one process
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(os.path.join(ckpt_dir, f'{name}.orbax')),
                   params, force=True)
        if opt_state is not None:
            ckptr.save(os.path.abspath(
                os.path.join(ckpt_dir, f'{name}.opt.orbax')),
                opt_state, force=True)
    if jax.process_index() == 0:
        # the orbax format keeps its OWN meta sidecar: sharing
        # {name}.meta.json with the npz format would pair stale arrays of
        # one format with newer meta of the other after a --ckpt_format
        # switch-and-revert. Same strict serialization as the npz path
        # (default=str silently stringifies ndarrays), written atomically.
        meta_path = os.path.join(ckpt_dir, f'{name}.orbax.meta.json')
        tmp = f'{meta_path}.tmp-{os.getpid()}'
        with open(tmp, 'w') as f:
            json.dump(meta, f, default=_json_meta_default)
        os.replace(tmp, meta_path)


def _orbax_path(ckpt_dir: str, fname: str) -> str:
    '''Prefer the live orbax dir; fall back to its ``.stale`` sibling — a
    crash landing exactly between AsyncOrbaxWriter's two swap renames
    leaves only the previous (complete) checkpoint under that name.'''
    final = os.path.abspath(os.path.join(ckpt_dir, fname))
    if not os.path.exists(final) and os.path.exists(f'{final}.stale'):
        return f'{final}.stale'
    return final


def load_checkpoint_orbax(ckpt_dir: str, params_like, opt_state_like=None,
                          name: str = 'best_cap_model'):
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        params = ckptr.restore(_orbax_path(ckpt_dir, f'{name}.orbax'),
                               params_like)
        opt_state = None
        opt_path = _orbax_path(ckpt_dir, f'{name}.opt.orbax')
        if opt_state_like is not None and os.path.exists(opt_path):
            opt_state = ckptr.restore(opt_path, opt_state_like)
    meta_path = os.path.join(ckpt_dir, f'{name}.orbax.meta.json')
    if not os.path.exists(meta_path):     # pre-round-3 orbax checkpoints
        meta_path = os.path.join(ckpt_dir, f'{name}.meta.json')
    with open(meta_path) as f:
        meta = json.load(f)
    return params, meta, opt_state


def read_checkpoint_meta(ckpt_dir: str, name: str) -> dict:
    '''Read a checkpoint's meta sidecar, whichever format wrote it last:
    prefers the NEWER of {name}.meta.json (npz) and
    {name}.orbax.meta.json when both exist.'''
    cands = [os.path.join(ckpt_dir, f'{name}.meta.json'),
             os.path.join(ckpt_dir, f'{name}.orbax.meta.json')]
    cands = [p for p in cands if os.path.exists(p)]
    if not cands:
        raise FileNotFoundError(
            f'no {name} meta sidecar under {ckpt_dir}')
    with open(max(cands, key=os.path.getmtime)) as f:
        return json.load(f)


def checkpoint_exists(ckpt_dir: str, name: str, fmt: str = 'npz') -> bool:
    if fmt == 'orbax':
        return os.path.exists(_orbax_path(ckpt_dir, f'{name}.orbax'))
    return os.path.exists(os.path.join(ckpt_dir, f'{name}.params.npz'))


def detect_checkpoint_format(ckpt_dir: str, name: str,
                             preferred: str = 'npz'):
    '''Format of the on-disk checkpoint, probing ``preferred`` first.
    Returns 'npz' / 'orbax' / None — so switching --ckpt_format mid-run
    resumes from whatever exists instead of silently restarting.'''
    other = 'orbax' if preferred == 'npz' else 'npz'
    for fmt in (preferred, other):
        if checkpoint_exists(ckpt_dir, name, fmt):
            return fmt
    return None


def get_checkpoint_io(fmt: str = 'npz'):
    '''(save_fn, load_fn) for the configured checkpoint format.'''
    if fmt == 'orbax':
        return save_checkpoint_orbax, load_checkpoint_orbax
    return save_checkpoint, load_checkpoint


class AsyncCheckpointWriter:
    '''Overlap checkpoint file IO with training (--async_ckpt).

    ``save()`` snapshots params/opt_state to host SYNCHRONOUSLY — the
    jitted train step donates the state buffers, so device arrays held
    across the next step launch would be read-after-free — then hands
    serialization + file writes (the dominant cost: ~0.6 GB of npz at
    51 M params with Adam state) to a single worker thread and returns.
    The single worker keeps saves strictly ordered, so an older pending
    write can never clobber a newer rolling ``last_*`` checkpoint, and
    the atomic write-then-rename in save_pytree_npz/meta still holds.

    Worker errors are NOT swallowed: they re-raise on the next ``save()``
    or on ``wait()`` (trainers call wait() before exiting — including
    after a SIGTERM preemption save — so a full disk cannot silently
    discard every epoch's checkpoint and then let the process exit 0).

    npz only by design: the orbax format's array writes are multi-host
    COLLECTIVES, and running collectives from an unsynchronized
    background thread can deadlock a pod (orbax ships its own
    AsyncCheckpointer for that case).
    '''

    def __init__(self, save_fn=save_checkpoint):
        import concurrent.futures as cf
        self._save_fn = save_fn
        self._pool = cf.ThreadPoolExecutor(max_workers=1,
                                           thread_name_prefix='bmt-ckpt')
        self._pending = []

    def save(self, ckpt_dir: str, params, meta: dict, opt_state=None,
             name: str = 'best_cap_model'):
        import jax
        self._reap()
        host_params, host_opt = jax.device_get((params, opt_state))
        self._pending.append(self._pool.submit(
            self._save_fn, ckpt_dir, host_params, meta, host_opt, name))

    def _reap(self):
        done = [f for f in self._pending if f.done()]
        self._pending = [f for f in self._pending if not f.done()]
        for f in done:
            f.result()  # re-raise worker errors at the call site

    def wait(self):
        '''Block until every submitted save is durably on disk.'''
        while self._pending:
            self._pending.pop(0).result()

    def close(self):
        self.wait()
        self._pool.shutdown()


class AsyncOrbaxWriter:
    '''--async_ckpt for the orbax format (same save/wait/close contract as
    AsyncCheckpointWriter).

    Arrays ride orbax's own ``AsyncCheckpointer`` — the multihost-safe
    async path: the device→host copy happens on the CALLING thread before
    ``save()`` returns (so the train step's donated buffers are never read
    late), and the background commit uses orbax's pod barrier machinery
    instead of a plain worker thread (which could deadlock the format's
    multi-process collective writes — the reason AsyncCheckpointWriter is
    npz-only).

    Durability contract (matches the npz worker): a crash can lose at most
    the pending save, and on-disk meta is never NEWER than the arrays it
    describes. Two mechanisms deliver it:

    - arrays commit to a SIDE directory ``{name}.orbax.new`` — never
      force-overwriting the live checkpoint, whose deletion would
      otherwise happen synchronously at submit while the replacement
      commits in the background (a kill in that window would leave no
      rolling checkpoint at all and silently restart the run);
    - a single FINALIZER thread joins each commit as soon as orbax
      finishes it (``wait_until_finished`` is a local thread join — the
      collective machinery runs on orbax's own threads, so nothing
      collective happens off the synchronized path), then swaps the
      params+opt side dirs into place as one grouped transaction
      (``_swap_pair_into_place``) and writes the meta sidecar LAST.
      ``load_checkpoint_orbax``/``checkpoint_exists`` fall back to a
      ``.stale`` dir when a crash lands mid-swap, so every crash point
      resolves to a consistent params/opt pair except the single rename
      gap between the two phase-2 renames — the same residual window the
      npz writer has between its params and opt file writes.

    Finalizer errors re-raise on the next ``save()``/``wait()``/
    ``close()`` — a full disk cannot silently discard epochs and exit 0.
    '''

    def __init__(self):
        import concurrent.futures as cf
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self._ckptrs = {}      # key -> (params ckptr, opt ckptr)
        self._fin = cf.ThreadPoolExecutor(max_workers=1,
                                          thread_name_prefix='bmt-orbax-fin')
        self._pending = {}     # key -> outstanding finalize future

    def _unit(self, key):
        if key not in self._ckptrs:
            ocp = self._ocp
            self._ckptrs[key] = (
                ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler()),
                ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler()))
        return self._ckptrs[key]

    def _reap(self):
        done = {k: f for k, f in self._pending.items() if f.done()}
        for k, f in done.items():
            del self._pending[k]
            f.result()   # re-raise finalizer errors at the call site

    @staticmethod
    def _swap_pair_into_place(finals):
        '''``{path}.new`` → ``{path}`` for every path in ``finals``, as one
        grouped transaction: ALL old finals move aside to ``.stale`` first,
        then all side dirs rename into place back-to-back, then the stales
        are removed. Grouping the phase-2 renames makes the params/opt
        torn window a single rename gap (the same residual window the npz
        writer has between its params and opt file writes); every crash
        point outside that gap resolves to a CONSISTENT pair — either both
        old (via the ``.stale`` fallback) or both new. Local fs ops:
        process 0 only on pods.'''
        import shutil
        for final in finals:
            shutil.rmtree(f'{final}.stale', ignore_errors=True)
            if os.path.exists(final):
                os.rename(final, f'{final}.stale')
        for final in finals:
            os.rename(f'{final}.new', final)
        for final in finals:
            shutil.rmtree(f'{final}.stale', ignore_errors=True)

    def _finalize(self, key, ckpt_dir, name, meta, has_opt):
        import jax
        pc, oc = self._ckptrs[key]
        pc.wait_until_finished()
        oc.wait_until_finished()
        if jax.process_index() == 0:
            finals = [os.path.join(ckpt_dir, f'{name}.orbax')]
            if has_opt:
                finals.append(os.path.join(ckpt_dir, f'{name}.opt.orbax'))
            self._swap_pair_into_place(finals)
            # meta LAST: never newer than the arrays it describes
            meta_path = os.path.join(ckpt_dir, f'{name}.orbax.meta.json')
            tmp = f'{meta_path}.tmp-{os.getpid()}'
            with open(tmp, 'w') as f:
                json.dump(meta, f, default=_json_meta_default)
            os.replace(tmp, meta_path)

    def save(self, ckpt_dir: str, params, meta: dict, opt_state=None,
             name: str = 'best_cap_model'):
        ocp = self._ocp
        self._reap()
        key = os.path.abspath(os.path.join(ckpt_dir, name))
        pc, oc = self._unit(key)
        # a re-save of the same name must join its previous FINALIZE (not
        # just the orbax commit): the finalizer swaps the very side dir
        # the force=True save below would delete — racing them could move
        # a half-deleted dir live and then discard the last good copy
        prev = self._pending.pop(key, None)
        if prev is not None:
            prev.result()
        os.makedirs(ckpt_dir, exist_ok=True)
        # force=True only ever clears a LEFTOVER side dir from a crashed
        # run — the live checkpoint is not touched until the swap
        pc.save(f'{key}.orbax.new', args=ocp.args.StandardSave(params),
                force=True)
        if opt_state is not None:
            oc.save(f'{key}.opt.orbax.new',
                    args=ocp.args.StandardSave(opt_state), force=True)
        self._pending[key] = self._fin.submit(
            self._finalize, key, ckpt_dir, name, meta,
            opt_state is not None)

    def wait(self):
        '''Block until every submitted save (arrays, swap, meta) is durably
        on disk.'''
        while self._pending:
            _, fut = self._pending.popitem()
            fut.result()

    def close(self):
        self.wait()
        for pc, oc in self._ckptrs.values():
            pc.close()
            oc.close()
        self._ckptrs.clear()
        self._fin.shutdown()


def load_model_params(ckpt_dir: str, name: str, params_like):
    '''Format-agnostic model-params load for eval/serving consumers: reads
    ``{name}.orbax`` or ``{name}.params.npz``, whichever exists.'''
    fmt = detect_checkpoint_format(ckpt_dir, name)
    if fmt is None:
        raise FileNotFoundError(
            f'no {name} checkpoint (npz or orbax) under {ckpt_dir}')
    if fmt == 'orbax':
        params, _, _ = load_checkpoint_orbax(ckpt_dir, params_like,
                                             None, name)
        return params
    return load_pytree_npz(os.path.join(ckpt_dir, f'{name}.params.npz'),
                           params_like)


# ---------------------------------------------------------------------------
# reference torch .pt import
# ---------------------------------------------------------------------------

class _ConfigShim:
    '''Stands in for the reference's pickled Config object
    (reference: eval_on_learned_props.py:80-83).'''

    def __init__(self, *a, **k):
        pass


def _install_config_shims():
    '''Unpickling reference checkpoints needs
    utilities.config_constructor.Config importable.'''
    for mod_name in ('utilities', 'utilities.config_constructor'):
        if mod_name not in sys.modules:
            sys.modules[mod_name] = types.ModuleType(mod_name)
    sys.modules['utilities.config_constructor'].Config = _ConfigShim


def load_torch_checkpoint(path: str) -> dict:
    '''Load a reference .pt checkpoint; tensors -> numpy, pickled Config ->
    plain attribute dict.'''
    _install_config_shims()
    import torch
    cpt = torch.load(path, map_location='cpu', weights_only=False)
    out = {}
    for k, v in cpt.items():
        if k == 'model_state_dict':
            out[k] = {name: t.detach().cpu().numpy()
                      for name, t in v.items()}
        elif k == 'config':
            out[k] = dict(getattr(v, '__dict__', {}))
        elif k == 'optimizer_state_dict' or k == 'scheduler_state_dict':
            out[k] = v  # opaque; not imported
        else:
            out[k] = v
    return out


def _strip_module(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    '''DataParallel wrap leaves a 'module.' key prefix
    (reference consequence of train_captioning_module.py:61).'''
    return {re.sub(r'^module\.', '', k): v for k, v in sd.items()}


def _lin(sd, base) -> dict:
    '''torch Linear (out,in) -> ours (in,out).'''
    return {'w': np.ascontiguousarray(sd[f'{base}.weight'].T),
            'b': sd[f'{base}.bias']}


def _ln(sd, base) -> dict:
    return {'scale': sd[f'{base}.weight'], 'bias': sd[f'{base}.bias']}


def _mha(sd, base) -> dict:
    return {'q2d': _lin(sd, f'{base}.linear_Q2d'),
            'k2d': _lin(sd, f'{base}.linear_K2d'),
            'v2d': _lin(sd, f'{base}.linear_V2d'),
            'd2q': _lin(sd, f'{base}.linear_d2Q')}


def _ffn(sd, base) -> dict:
    return {'fc1': _lin(sd, f'{base}.fc1'), 'fc2': _lin(sd, f'{base}.fc2')}


def _vocab_embedder(sd, base) -> dict:
    '''Embedding table (plus optional adapter when GloVe width != d_model;
    reference: model/blocks.py:53-63).'''
    if f'{base}.embedder.weight' in sd:
        return {'table': sd[f'{base}.embedder.weight']}
    return {'table': sd[f'{base}.embedder.0.weight'],
            'adapter': _lin(sd, f'{base}.embedder.1')}


def _count_layers(sd, pattern: str) -> int:
    rx = re.compile(pattern)
    idxs = {int(m.group(1)) for k in sd if (m := rx.match(k))}
    return max(idxs) + 1 if idxs else 0


def _bimodal_encoder_from_sd(sd, prefix='encoder.encoder_AV.layers') -> dict:
    N = _count_layers(sd, rf'{re.escape(prefix)}\.(\d+)\.')
    layers = []
    for i in range(N):
        b = f'{prefix}.{i}'
        layers.append({
            'self_att_M1': _mha(sd, f'{b}.self_att_M1'),
            'self_att_M2': _mha(sd, f'{b}.self_att_M2'),
            'cross_att_M1': _mha(sd, f'{b}.bi_modal_att_M1'),
            'cross_att_M2': _mha(sd, f'{b}.bi_modal_att_M2'),
            'ff_M1': _ffn(sd, f'{b}.feed_forward_M1'),
            'ff_M2': _ffn(sd, f'{b}.feed_forward_M2'),
            'res_M1': [_ln(sd, f'{b}.res_layers_M1.{j}.norm') for j in range(3)],
            'res_M2': [_ln(sd, f'{b}.res_layers_M2.{j}.norm') for j in range(3)],
        })
    return {'layers': layers}


def _encoder_from_sd(sd, prefix='encoder.enc_layers') -> dict:
    N = _count_layers(sd, rf'{re.escape(prefix)}\.(\d+)\.')
    layers = []
    for i in range(N):
        b = f'{prefix}.{i}'
        layers.append({
            'self_att': _mha(sd, f'{b}.self_att'),
            'ff': _ffn(sd, f'{b}.feed_forward'),
            'res': [_ln(sd, f'{b}.res_layers.{j}.norm') for j in range(2)],
        })
    return {'layers': layers}


def import_cap_model(cpt: dict) -> Tuple[dict, dict]:
    '''Reference BiModalTransformer checkpoint -> (params pytree, config
    dict). Key layout per model/captioning_module.py:101-187.'''
    sd = _strip_module(cpt['model_state_dict'])
    cfg = cpt.get('config', {})

    params = {
        'emb_C': _vocab_embedder(sd, 'emb_C'),
        'encoder': _bimodal_encoder_from_sd(sd),
        'generator': _lin(sd, 'generator.linear'),
    }
    if 'emb_A.embedder.weight' in sd:
        params['emb_A'] = {'linear': _lin(sd, 'emb_A.embedder')}
        params['emb_V'] = {'linear': _lin(sd, 'emb_V.embedder')}

    # decoder: decoder.decoder.layers.{i}
    N = _count_layers(sd, r'decoder\.decoder\.layers\.(\d+)\.')
    layers = []
    for i in range(N):
        b = f'decoder.decoder.layers.{i}'
        layers.append({
            'self_att': _mha(sd, f'{b}.self_att'),
            'enc_att_A': _mha(sd, f'{b}.enc_att_A'),
            'enc_att_V': _mha(sd, f'{b}.enc_att_V'),
            'bridge': {'norm': _ln(sd, f'{b}.bridge.norm'),
                       'linear': _lin(sd, f'{b}.bridge.linear')},
            'ff': _ffn(sd, f'{b}.feed_forward'),
            'res_self': _ln(sd, f'{b}.res_layer_self_att.norm'),
            'res_enc_A': _ln(sd, f'{b}.res_layer_enc_att_A.norm'),
            'res_enc_V': _ln(sd, f'{b}.res_layer_enc_att_V.norm'),
            'res_ff': _ln(sd, f'{b}.res_layer_ff.norm'),
        })
    params['decoder'] = {'layers': layers}
    return params, cfg


def _conv_head_from_sd(sd, base: str) -> dict:
    '''Detection head Sequential: classify entries by tensor rank
    (3-dim = Conv1d, pairs of 1-dim = LayerNorm).'''
    rx = re.compile(rf'{re.escape(base)}\.conv_layers\.(\d+)\.(weight|bias)')
    by_idx: Dict[int, dict] = {}
    for k, v in sd.items():
        m = rx.match(k)
        if m:
            by_idx.setdefault(int(m.group(1)), {})[m.group(2)] = v

    convs, lns = [], []
    for idx in sorted(by_idx):
        entry = by_idx[idx]
        w = entry['weight']
        if w.ndim == 3:  # torch Conv1d (out, in, k) -> (k, in, out)
            convs.append({'w': np.ascontiguousarray(w.transpose(2, 1, 0)),
                          'b': entry['bias']})
        else:            # LayerNorm
            lns.append({'scale': w, 'bias': entry['bias']})
    head = {'convs': convs}
    if lns:
        head['lns'] = lns
    return head


def import_prop_model(cpt: dict) -> Tuple[dict, dict]:
    '''Reference MultimodalProposalGenerator checkpoint -> (params, config).
    Key layout per model/proposal_generator.py:215-270. Anchors ride along
    in params as 'anchors_A'/'anchors_V'.'''
    sd = _strip_module(cpt['model_state_dict'])
    cfg = cpt.get('config', {})

    params = {'encoder': _bimodal_encoder_from_sd(sd)}
    if 'emb_A.embedder.weight' in sd:
        params['emb_A'] = {'linear': _lin(sd, 'emb_A.embedder')}
        params['emb_V'] = {'linear': _lin(sd, 'emb_V.embedder')}

    for mod, key in (('A', 'heads_A'), ('V', 'heads_V')):
        n = _count_layers(sd, rf'detection_layers_{mod}\.(\d+)\.')
        params[key] = [
            _conv_head_from_sd(sd, f'detection_layers_{mod}.{i}')
            for i in range(n)]

    anchors = cpt.get('anchors', {})
    if 'audio' in anchors:
        params['anchors_A'] = np.asarray(anchors['audio'], np.float32)
    if 'video' in anchors:
        params['anchors_V'] = np.asarray(anchors['video'], np.float32)
    return params, cfg


def import_unimodal_prop_model(cpt: dict, modality: str) -> Tuple[dict, dict]:
    '''Reference uni-modal ProposalGenerator checkpoint
    (model/proposal_generator.py:50-120).'''
    sd = _strip_module(cpt['model_state_dict'])
    cfg = cpt.get('config', {})
    params = {'encoder': _encoder_from_sd(sd)}
    if 'emb.embedder.weight' in sd:
        params['emb'] = {'linear': _lin(sd, 'emb.embedder')}
    n = _count_layers(sd, r'detection_layers\.(\d+)\.')
    params['heads'] = [_conv_head_from_sd(sd, f'detection_layers.{i}')
                       for i in range(n)]
    anchors = cpt.get('anchors', {})
    if modality in anchors:
        params['anchors'] = np.asarray(anchors[modality], np.float32)
    return params, cfg


def import_unimodal_cap_model(cpt: dict) -> Tuple[dict, dict]:
    '''Reference uni-modal Transformer checkpoint
    (model/captioning_module.py:16-98).'''
    sd = _strip_module(cpt['model_state_dict'])
    cfg = cpt.get('config', {})
    params = {
        'trg_emb': _vocab_embedder(sd, 'trg_emb'),
        'encoder': _encoder_from_sd(sd, 'encoder.enc_layers'),
        'generator': _lin(sd, 'generator.linear'),
    }
    if 'src_emb.embedder.weight' in sd:
        params['src_emb'] = {'linear': _lin(sd, 'src_emb.embedder')}
    N = _count_layers(sd, r'decoder\.dec_layers\.(\d+)\.')
    layers = []
    for i in range(N):
        b = f'decoder.dec_layers.{i}'
        layers.append({
            'self_att': _mha(sd, f'{b}.self_att'),
            'enc_att': _mha(sd, f'{b}.enc_att'),
            'ff': _ffn(sd, f'{b}.feed_forward'),
            'res': [_ln(sd, f'{b}.res_layers.{j}.norm') for j in range(3)],
        })
    params['decoder'] = {'layers': layers}
    return params, cfg


# ---------------------------------------------------------------------------
# export: reference-compatible state_dict naming (for round-trip tests and
# for users moving back to the torch implementation)
# ---------------------------------------------------------------------------

def _sd_put_lin(sd, base, p):
    sd[f'{base}.weight'] = np.ascontiguousarray(np.asarray(p['w']).T)
    sd[f'{base}.bias'] = np.asarray(p['b'])


def _sd_put_ln(sd, base, p):
    sd[f'{base}.weight'] = np.asarray(p['scale'])
    sd[f'{base}.bias'] = np.asarray(p['bias'])


def _sd_put_mha(sd, base, p):
    _sd_put_lin(sd, f'{base}.linear_Q2d', p['q2d'])
    _sd_put_lin(sd, f'{base}.linear_K2d', p['k2d'])
    _sd_put_lin(sd, f'{base}.linear_V2d', p['v2d'])
    _sd_put_lin(sd, f'{base}.linear_d2Q', p['d2q'])


def _sd_put_ffn(sd, base, p):
    if 'router' in p:
        raise ValueError(
            'cannot export a MoE model (--moe_experts > 1) to a '
            'reference-keyed state_dict: the reference architecture '
            'has dense FFNs only. Use the native npz/orbax checkpoint '
            'formats for MoE models.')
    _sd_put_lin(sd, f'{base}.fc1', p['fc1'])
    _sd_put_lin(sd, f'{base}.fc2', p['fc2'])


def _sd_put_bimodal_encoder(sd, enc):
    '''BiModalEncoder subtree under the reference's shared attribute name
    (both the captioner and the proposal generator call it ``encoder``).'''
    for i, L in enumerate(enc['layers']):
        b = f'encoder.encoder_AV.layers.{i}'
        _sd_put_mha(sd, f'{b}.self_att_M1', L['self_att_M1'])
        _sd_put_mha(sd, f'{b}.self_att_M2', L['self_att_M2'])
        _sd_put_mha(sd, f'{b}.bi_modal_att_M1', L['cross_att_M1'])
        _sd_put_mha(sd, f'{b}.bi_modal_att_M2', L['cross_att_M2'])
        _sd_put_ffn(sd, f'{b}.feed_forward_M1', L['ff_M1'])
        _sd_put_ffn(sd, f'{b}.feed_forward_M2', L['ff_M2'])
        for j in range(3):
            _sd_put_ln(sd, f'{b}.res_layers_M1.{j}.norm', L['res_M1'][j])
            _sd_put_ln(sd, f'{b}.res_layers_M2.{j}.norm', L['res_M2'][j])


def export_cap_state_dict(params: dict, data_parallel: bool = True) -> dict:
    '''Inverse of import_cap_model: produce a reference-keyed state_dict of
    numpy arrays. LoRA adapters (ops/lora.py) are folded into the base
    weights first — the reference model has no adapter slots, and silently
    dropping a finetune's deltas would export the wrong model.'''
    from bmt_tpu.ops.lora import count_lora, merge_lora
    if count_lora(params)[0]:
        params = merge_lora(params)
    sd = {}

    emb = params['emb_C']
    if 'adapter' in emb:
        sd['emb_C.embedder.0.weight'] = np.asarray(emb['table'])
        _sd_put_lin(sd, 'emb_C.embedder.1', emb['adapter'])
    else:
        sd['emb_C.embedder.weight'] = np.asarray(emb['table'])

    if 'emb_A' in params:
        _sd_put_lin(sd, 'emb_A.embedder', params['emb_A']['linear'])
        _sd_put_lin(sd, 'emb_V.embedder', params['emb_V']['linear'])

    _sd_put_bimodal_encoder(sd, params['encoder'])

    for i, L in enumerate(params['decoder']['layers']):
        b = f'decoder.decoder.layers.{i}'
        _sd_put_mha(sd, f'{b}.self_att', L['self_att'])
        _sd_put_mha(sd, f'{b}.enc_att_A', L['enc_att_A'])
        _sd_put_mha(sd, f'{b}.enc_att_V', L['enc_att_V'])
        _sd_put_ln(sd, f'{b}.bridge.norm', L['bridge']['norm'])
        _sd_put_lin(sd, f'{b}.bridge.linear', L['bridge']['linear'])
        _sd_put_ffn(sd, f'{b}.feed_forward', L['ff'])
        _sd_put_ln(sd, f'{b}.res_layer_self_att.norm', L['res_self'])
        _sd_put_ln(sd, f'{b}.res_layer_enc_att_A.norm', L['res_enc_A'])
        _sd_put_ln(sd, f'{b}.res_layer_enc_att_V.norm', L['res_enc_V'])
        _sd_put_ln(sd, f'{b}.res_layer_ff.norm', L['res_ff'])

    _sd_put_lin(sd, 'generator.linear', params['generator'])

    if data_parallel:
        sd = {f'module.{k}': v for k, v in sd.items()}
    return sd


def _conv_head_to_sd(sd, base: str, head: dict, dout_p: bool = True):
    '''Inverse of _conv_head_from_sd, reconstructing the EXACT Sequential
    indices of the reference head (model/proposal_generator.py:11-38):
    per block n — [Transpose, LayerNorm, Transpose] when layer_norm, then
    Conv1d, then [Dropout (when dout_p>0), ReLU] for every block but the
    last. Only LayerNorm/Conv1d carry parameters, so the index arithmetic
    must skip the parameter-free modules for torch load_state_dict
    (strict=True) to accept the result.'''
    convs = head['convs']
    lns = head.get('lns')
    idx = 0
    for n, conv in enumerate(convs):
        if lns is not None:
            _sd_put_ln(sd, f'{base}.conv_layers.{idx + 1}', lns[n])
            idx += 3
        w = np.asarray(conv['w'])   # ours (k, in, out) -> torch (out, in, k)
        sd[f'{base}.conv_layers.{idx}.weight'] = np.ascontiguousarray(
            w.transpose(2, 1, 0))
        sd[f'{base}.conv_layers.{idx}.bias'] = np.asarray(conv['b'])
        idx += 1
        if n < len(convs) - 1:
            idx += (1 if dout_p else 0) + 1   # Dropout?, ReLU


def export_prop_state_dict(params: dict, data_parallel: bool = False,
                           dout_p: bool = True) -> dict:
    '''Inverse of import_prop_model: a reference-keyed
    MultimodalProposalGenerator state_dict (numpy arrays). The reference
    trains the proposal stage single-device (no DataParallel wrap —
    scripts/train_proposal_generator.py:54), so no ``module.`` prefix by
    default. ``dout_p``: whether the receiving model was built with
    dout_p > 0 (it shifts the heads' Sequential indices).

    LoRA adapters (a transplanted finetuned encoder can carry them) are
    folded into the base weights first, like export_cap_state_dict — the
    reference model has no adapter slots and silently dropping the deltas
    would export the wrong model.'''
    from bmt_tpu.ops.lora import count_lora, merge_lora
    if count_lora(params)[0]:
        params = merge_lora(params)
    sd = {}
    if 'emb_A' in params:
        _sd_put_lin(sd, 'emb_A.embedder', params['emb_A']['linear'])
        _sd_put_lin(sd, 'emb_V.embedder', params['emb_V']['linear'])
    _sd_put_bimodal_encoder(sd, params['encoder'])
    for mod, key in (('A', 'heads_A'), ('V', 'heads_V')):
        for i, head in enumerate(params[key]):
            _conv_head_to_sd(sd, f'detection_layers_{mod}.{i}', head,
                             dout_p)
    if data_parallel:
        sd = {f'module.{k}': v for k, v in sd.items()}
    return sd


def save_torch_checkpoint(path: str, params: dict, meta: dict):
    '''Write a reference-format best_cap_model.pt so models trained here can
    be loaded by the original PyTorch implementation (its loaders re-read the
    pickled config and state_dict — eval_on_learned_props.py:86-124).

    Bi-modal captioners only: the export key map covers the
    BiModalTransformer layout (uni-modal ablation trees are rejected with
    a clear error rather than a KeyError mid-export).'''
    if 'emb_C' not in params:
        raise ValueError(
            'save_torch_checkpoint exports the bi-modal captioner layout '
            "only (params have no 'emb_C' — a uni-modal tree?)")
    import torch
    _install_config_shims()
    # pickle the config under the module/name the reference expects, so its
    # own Config shim can unpickle it
    cls = sys.modules['utilities.config_constructor'].Config
    cls.__module__ = 'utilities.config_constructor'
    cls.__qualname__ = 'Config'
    cfg = cls()
    cfg.__dict__.update(meta.get('config', {}))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_cap_state_dict(params).items()}
    torch.save({
        'config': cfg,
        'epoch': meta.get('epoch', 0),
        'model_state_dict': sd,
        'optimizer_state_dict': {},
        'val_1_loss': meta.get('val_1_loss'),
        'val_2_loss': meta.get('val_2_loss'),
        'val_1_metrics': meta.get('val_1_metrics'),
        'val_2_metrics': meta.get('val_2_metrics'),
        'trg_voc_size': meta.get('trg_voc_size'),
    }, path)


def save_torch_prop_checkpoint(path: str, params: dict, meta: dict,
                               dout_p: 'bool | None' = None):
    '''Write a reference-format best_prop_model.pt (the dict layout of
    epoch_loops/proposal_epoch_loops.py:10-25, incl. the top-level anchors
    dict the reference re-loads at inference —
    sample/single_video_prediction.py:103-106) so proposal generators
    trained here run in the original PyTorch implementation.

    ``dout_p`` shifts the conv heads' Sequential indices; when None it is
    read from the checkpoint's own config in ``meta`` (a model trained
    with --dout_p 0 has no Dropout slots), defaulting to True only when
    the config carries no dout_p at all.'''
    if dout_p is None:
        dout_p = bool(meta.get('config', {}).get('dout_p', True))
    if 'heads_A' not in params:
        raise ValueError(
            'save_torch_prop_checkpoint exports the multimodal proposal '
            "generator layout only (params have no 'heads_A' — a "
            'uni-modal tree?)')
    import torch
    _install_config_shims()
    cls = sys.modules['utilities.config_constructor'].Config
    cls.__module__ = 'utilities.config_constructor'
    cls.__qualname__ = 'Config'
    cfg = cls()
    cfg.__dict__.update(meta.get('config', {}))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_prop_state_dict(params, dout_p=dout_p).items()}
    torch.save({
        'config': cfg,
        'epoch': meta.get('epoch', 0),
        'model_state_dict': sd,
        'optimizer_state_dict': {},
        'scheduler_state_dict': None,
        'anchors': {'audio': np.asarray(params['anchors_A']).tolist(),
                    'video': np.asarray(params['anchors_V']).tolist()},
        'val_anet_metrics': meta.get('val_anet_metrics'),
        'best_metric': meta.get('best_metric'),
    }, path)


def load_pretrained_encoder_native(path: str, encoder_like, stage: str):
    '''Encoder subtree from a NATIVE checkpoint of the other training stage
    (the torch-free half of the reference's two-stage recipe:
    scripts/train_proposal_generator.py:15 reuses the captioning encoder,
    model/captioning_module.py:147-162 the proposal encoder).

    ``path`` forms: a bare ``*.npz`` params archive, or a native checkpoint
    directory (npz or orbax) holding ``best_{stage}_model.*``.
    ``encoder_like``: the destination model's encoder subtree (template).
    ``stage``: 'cap' or 'prop' — which stage wrote the checkpoint at
    ``path``. Shapes are validated against the template so an architecture
    mismatch fails at load time with a named leaf, not inside XLA.'''
    assert stage in ('cap', 'prop'), stage
    if not os.path.isdir(path):
        return load_subtree_npz(path, encoder_like)
    name = f'best_{stage}_model'
    npz = os.path.join(path, f'{name}.params.npz')
    if os.path.exists(npz):
        return load_subtree_npz(npz, encoder_like)
    # orbax directory: restore through the full stage loader (needs the
    # meta JSON to rebuild the template), then keep the encoder
    if stage == 'cap':
        _, _, full, _ = load_cap_checkpoint(path)
    else:
        _, _, full = load_prop_checkpoint(path)
    enc = full['encoder']
    # a LoRA-finetuned donor (orbax restores WITH adapter leaves): fold the
    # deltas so the transplant is the finetune's effective encoder — the
    # same semantics as the npz path's archive-level fold above
    from bmt_tpu.ops.lora import count_lora, merge_lora
    if count_lora(enc)[0]:
        enc = merge_lora(enc)
    got, want = _flatten(enc), _flatten(encoder_like)
    missing = sorted(set(want) - set(got))
    if missing:
        raise KeyError(f'{path}: encoder subtree lacks {missing[:4]} — '
                       f'written for a different architecture')
    # extras beyond the (now-merged) lora_* leaves are an architecture
    # mismatch, same strictness as the npz path's leftover-keys raise
    extras = sorted(set(got) - set(want))
    if extras:
        raise KeyError(
            f'{path}: encoder subtree holds {len(extras)} leaves absent '
            f'from the destination template even after folding LoRA '
            f'adapters (first few: {extras[:4]}) — written for a '
            f'different architecture/options than this run configures')
    for k, tpl in want.items():
        if hasattr(tpl, 'shape') and tuple(got[k].shape) != tuple(tpl.shape):
            raise ValueError(
                f'{path}: encoder leaf {k!r} has shape '
                f'{tuple(got[k].shape)}, template expects '
                f'{tuple(tpl.shape)}')
    return enc


def load_pretrained_cap_params(path: str, template):
    '''FULL captioner parameters from a checkpoint, into ``template``'s
    structure — the seed for continued pretraining and LoRA finetuning
    (train_cap ``--pretrained_cap_model_path``; no reference analog — the
    reference can only transplant encoders). Accepts a native checkpoint
    dir (npz or orbax), a bare ``params.npz``, or a reference ``.pt``.
    ``template`` must be the PLAIN base tree (adapters are added after).

    A LoRA-FINETUNED checkpoint is a valid seed: its adapters are folded
    into the base weights first (fp32 accumulate, ops/lora.py semantics),
    so the seed is the finetune's effective model and the new run's own
    --lora_rank/--lora_targets/--lora_alpha apply fresh adapters on top —
    round-2 finetuning never silently inherits round-1's adapter config.'''
    def _merged_lora_npz(npz_path):
        '''Archive-level merge: fold each ``<site>/lora_*`` triple into its
        ``<site>/w`` (_fold_lora_flat, mirroring merge_linear_lora's
        numerics), then restore the plain tree into the template's
        structure.'''
        merged = _fold_lora_flat(dict(np.load(npz_path, allow_pickle=False)))
        tree, used = _restore_into(merged, template, npz_path)
        leftover = sorted(set(merged) - used)
        if leftover:
            raise KeyError(
                f'{npz_path} holds {len(leftover)} arrays absent from the '
                f'restore template even after folding its LoRA adapters '
                f'(first few: {leftover[:4]})')
        return tree

    def _load_npz(npz_path):
        with np.load(npz_path, allow_pickle=False) as zf:
            has_lora = any(k.rsplit(SEP, 1)[-1] in
                           ('lora_a', 'lora_b', 'lora_s') for k in zf.files)
        if has_lora:
            return _merged_lora_npz(npz_path)
        return load_pytree_npz(npz_path, template)

    def _validate(got_tree):
        got, want = _flatten(got_tree), _flatten(template)
        missing = sorted(set(want) - set(got))
        if missing:
            raise KeyError(
                f'{path}: checkpoint lacks {missing[:4]} — written for a '
                f'different architecture/options than this run configures')
        for k, tpl in want.items():
            if hasattr(tpl, 'shape') and \
                    tuple(got[k].shape) != tuple(tpl.shape):
                raise ValueError(
                    f'{path}: leaf {k!r} has shape {tuple(got[k].shape)}, '
                    f'this run expects {tuple(tpl.shape)}')
        return got_tree

    if path.endswith('.pt'):
        cpt = load_torch_checkpoint(path)
        sd = _strip_module(cpt['model_state_dict'])
        if any(k.startswith('trg_emb.') for k in sd):
            params, _ = import_unimodal_cap_model(cpt)
        else:
            params, _ = import_cap_model(cpt)
        return _validate(params)
    if not os.path.isdir(path):
        return _load_npz(path)
    npz = os.path.join(path, 'best_cap_model.params.npz')
    if os.path.exists(npz):
        return _load_npz(npz)
    _, _, params, _ = load_cap_checkpoint(path)
    from bmt_tpu.ops.lora import count_lora, merge_lora
    if count_lora(params)[0]:
        # orbax checkpoint of a LoRA finetune (meta cfg carried lora_rank,
        # so load_cap_checkpoint restored WITH adapters): fold them
        params = merge_lora(params)
    return _validate(params)


def save_lora_npz(path: str, params) -> int:
    '''Write ONLY the adapter leaves of a LoRA-finetuned tree — the
    shippable artifact of a finetune (kilobytes at rank 8 vs ~200 MB for
    the full tree). Loadable by ``load_lora_sites`` and therefore by
    serving's ``--lora_adapter`` and ``CaptionEngine.add_adapter``.
    Atomic write; returns the adapted-site count.'''
    flat = {k: v for k, v in _flatten(params).items()
            if k.rsplit(SEP, 1)[-1] in ('lora_a', 'lora_b', 'lora_s')}
    if not flat:
        raise ValueError('tree carries no LoRA adapter leaves')
    tmp = f'{path}.tmp-{os.getpid()}'
    with open(tmp, 'wb') as f:
        np.savez(f, **flat)
    os.replace(tmp, path)
    return len(flat) // 3


def load_lora_sites(path: str) -> Dict[str, dict]:
    '''The LoRA adapter leaves of a finetuned checkpoint, as
    ``{site_path: {'lora_a','lora_b','lora_s'}}`` keyed by the
    ``SEP``-joined tree path of the adapted linear.

    The multi-tenant serving loader (serve.py:CaptionEngine.add_adapter):
    N domain finetunes share ONE frozen base in HBM, each contributing
    only its kilobyte-scale deltas. Accepts a bare ``params.npz``, a
    native checkpoint dir (npz or orbax), or an adapter-carrying pytree.'''
    if isinstance(path, dict):
        flat = _flatten(path)
    else:
        npz = path
        if os.path.isdir(path):
            cand = os.path.join(path, 'best_cap_model.params.npz')
            npz = cand if os.path.exists(cand) else None
        if npz and os.path.exists(npz) and not os.path.isdir(npz):
            flat = dict(np.load(npz, allow_pickle=False))
        else:
            _, _, params, _ = load_cap_checkpoint(path)
            flat = _flatten(params)
    sites: Dict[str, dict] = {}
    for k, v in flat.items():
        site, leaf = k.rsplit(SEP, 1) if SEP in k else ('', k)
        if leaf in ('lora_a', 'lora_b', 'lora_s'):
            sites.setdefault(site, {})[leaf] = np.asarray(v)
    if not sites:
        raise ValueError(
            f'{path}: no LoRA adapter leaves found — not a '
            f'--lora_rank finetune checkpoint')
    for site, leaves in sites.items():
        missing = {'lora_a', 'lora_b', 'lora_s'} - set(leaves)
        if missing:
            raise ValueError(f'{path}: site {site!r} lacks {missing}')
    return sites


def load_cap_checkpoint(path: str, train_meta_path: str = None,
                        allow_vocab_drift: bool = False):
    '''Load a captioning checkpoint from either format; returns
    (cfg, dims, params, vocab). Shared by the single-video app, the serving
    CLI and embedding applications (reference analog:
    sample/single_video_prediction.py:95-117 for the .pt side).

    - ``path`` ending in ``.pt``: reference PyTorch pickle; the vocabulary
      is rebuilt from ``train_meta_path`` and checked against the
      checkpoint's embedding-table size. A size mismatch RAISES (decoding
      with a drifted id->word map yields silently garbled captions; the
      reference hard-depends on this equality) unless
      ``allow_vocab_drift=True`` explicitly overrides.
    - otherwise: native npz dir containing ``best_cap_model.*``; config and
      vocab itos come from the meta JSON (no rebuild, so no drift).
    '''
    from bmt_tpu.config import Config
    from bmt_tpu.data.vocab import Vocab, build_vocab_from_meta
    from bmt_tpu.models import (CapModelDims, init_bimodal_transformer,
                                init_unimodal_transformer)
    import jax

    if path.endswith('.pt'):
        cpt = load_torch_checkpoint(path)
        # dispatch on the state-dict layout, not the pickled config: the
        # bi-modal captioner embeds captions as 'emb_C', the uni-modal
        # ablations as 'trg_emb' (reference: captioning_module.py)
        sd = _strip_module(cpt['model_state_dict'])
        if any(k.startswith('trg_emb.') for k in sd):
            params, cfg_dict = import_unimodal_cap_model(cpt)
            emb_key = 'trg_emb'
        else:
            params, cfg_dict = import_cap_model(cpt)
            emb_key = 'emb_C'
        cfg = Config.from_dict(cfg_dict)
        assert train_meta_path, '.pt checkpoints need a train_meta_path ' \
                                'to rebuild the vocabulary'
        cfg.train_meta_path = train_meta_path
        vocab = build_vocab_from_meta(train_meta_path, cfg.start_token,
                                      cfg.end_token, cfg.pad_token,
                                      cfg.min_freq_caps)
        voc_size = cpt.get('trg_voc_size',
                           params[emb_key]['table'].shape[0])
        if len(vocab) != voc_size:
            msg = (f'rebuilt vocab size {len(vocab)} != checkpoint voc '
                   f'size {voc_size} ({train_meta_path} is not the CSV '
                   f'this model was trained on) — decoded captions would '
                   f'be garbled')
            if not allow_vocab_drift:
                raise ValueError(
                    msg + '; pass --allow_vocab_drift to proceed anyway')
            print(f'warning: {msg} (override active)', file=sys.stderr)
        dims = CapModelDims.from_config(cfg,
                                        params[emb_key]['table'].shape[0])
        return cfg, dims, params, vocab

    meta = read_checkpoint_meta(path, 'best_cap_model')
    cfg = Config.from_dict(meta['config'])
    vocab = Vocab(meta['vocab_itos'])
    dims = CapModelDims.from_config(cfg, len(vocab))
    init_fn = (init_bimodal_transformer if cfg.modality == 'audio_video'
               else init_unimodal_transformer)
    emb_key = 'emb_C' if cfg.modality == 'audio_video' else 'trg_emb'
    # GloVe-adapter checkpoints (vectors narrower than d_model_C) carry an
    # extra '<emb>/adapter' Linear — the restore template must have it or
    # the load errors. Peek the saved table width to rebuild it (npz: read
    # the archive keys; orbax: the checkpoint's own structure metadata).
    glove_tpl = None
    npz_path = os.path.join(path, 'best_cap_model.params.npz')
    if os.path.exists(npz_path):
        with np.load(npz_path) as z:
            if f'{emb_key}{SEP}adapter{SEP}w' in z.files:
                glove_tpl = np.zeros(z[f'{emb_key}{SEP}table'].shape,
                                     np.float32)
    elif os.path.exists(os.path.join(path, 'best_cap_model.orbax')):
        try:
            import orbax.checkpoint as ocp
            with ocp.StandardCheckpointer() as ckptr:
                md = ckptr.metadata(os.path.abspath(
                    os.path.join(path, 'best_cap_model.orbax')))
            # StepMetadata -> item_metadata (TreeMetadata) -> .tree dict
            tree = getattr(getattr(md, 'item_metadata', md), 'tree', md)
            emb_md = tree[emb_key]
            if 'adapter' in emb_md:
                glove_tpl = np.zeros(tuple(emb_md['table'].shape),
                                     np.float32)
        except Exception as e:    # metadata API drift: fail with context
            print(f'warning: could not probe orbax checkpoint structure '
                  f'for a GloVe adapter ({e!r}); restoring without one',
                  file=sys.stderr)
    template = init_fn(jax.random.PRNGKey(0), dims, glove=glove_tpl)
    if getattr(cfg, 'lora_rank', 0):
        # LoRA-finetuned checkpoint: the saved tree carries adapter leaves
        # (ops/lora.py); the restore template must too. Decode/serving
        # apply them transparently through ops/layers.py:linear.
        from bmt_tpu.ops.lora import add_lora
        template = add_lora(template, int(cfg.lora_rank),
                            jax.random.PRNGKey(0),
                            getattr(cfg, 'lora_alpha', None),
                            getattr(cfg, 'lora_targets', 'attn'))
    params = load_model_params(path, 'best_cap_model', template)
    return cfg, dims, params, vocab


def load_prop_checkpoint(path: str, max_prop_per_vid: int = None):
    '''Load a proposal-generator checkpoint (.pt or native npz dir);
    returns (cfg, dims, params) with anchors included (reference analog:
    sample/single_video_prediction.py:66-91).'''
    from bmt_tpu.config import Config
    from bmt_tpu.models import (PropModelDims,
                                init_multimodal_proposal_generator,
                                init_unimodal_proposal_generator)
    import jax
    import jax.numpy as jnp

    if path.endswith('.pt'):
        cpt = load_torch_checkpoint(path)
        cfg_peek = cpt.get('config', {})
        modality = (cfg_peek.get('modality', 'audio_video')
                    if isinstance(cfg_peek, dict)
                    else getattr(cfg_peek, 'modality', 'audio_video'))
        if modality == 'audio_video':
            params, cfg_dict = import_prop_model(cpt)
        else:
            params, cfg_dict = import_unimodal_prop_model(cpt, modality)
    else:
        meta = read_checkpoint_meta(path, 'best_prop_model')
        cfg_dict = meta['config']
        cfg_tmp = Config.from_dict(cfg_dict)
        dims_tmp = PropModelDims.from_config(cfg_tmp)
        if cfg_dict.get('modality', 'audio_video') == 'audio_video':
            template = init_multimodal_proposal_generator(
                jax.random.PRNGKey(0), dims_tmp)
            template['anchors_A'] = jnp.zeros(
                (cfg_dict['anchors_num_audio'],), jnp.float32)
            template['anchors_V'] = jnp.zeros(
                (cfg_dict['anchors_num_video'],), jnp.float32)
        else:
            template = init_unimodal_proposal_generator(
                jax.random.PRNGKey(0), dims_tmp)
            n_anch = cfg_dict['anchors_num_' + cfg_dict['modality']]
            template['anchors'] = jnp.zeros((n_anch,), jnp.float32)
        params = load_model_params(path, 'best_prop_model', template)
    if max_prop_per_vid is not None:
        cfg_dict['max_prop_per_vid'] = max_prop_per_vid
    cfg = Config.from_dict(cfg_dict)
    dims = PropModelDims.from_config(cfg)
    return cfg, dims, params
