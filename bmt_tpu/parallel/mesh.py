'''Device mesh + sharding utilities.

Replaces the reference's single-process ``nn.DataParallel`` (reference:
scripts/train_captioning_module.py:61) with a JAX ``Mesh``: the batch is
sharded over the ``dp`` axis, parameters/optimizer state are replicated, and
XLA inserts the gradient all-reduce over ICI automatically when a jitted step
function carries these shardings. The mesh is built with room for more axes
(`mp` for tensor/sequence parallelism) — unused (size 1) at BMT's 51 M params
but the entry points are shape-agnostic.
'''
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_init_distributed():
    '''Initialize multi-host JAX when launched under a pod scheduler
    (coordinator env vars present). Single-host runs are unaffected; on a
    pod this makes jax.devices() span all hosts so the same dp mesh rides
    ICI within a slice and DCN across slices.

    On TPU pods the coordinator/process topology is auto-detected; for
    explicit launches (including the CPU multi-process smoke test,
    tests/test_multiprocess.py) JAX_COORDINATOR_ADDRESS +
    JAX_NUM_PROCESSES + JAX_PROCESS_ID are honored. Cross-process CPU
    collectives go through gloo (config only affects the CPU backend).
    '''
    import os
    coord = (os.environ.get('JAX_COORDINATOR_ADDRESS')
             or os.environ.get('COORDINATOR_ADDRESS'))
    if not coord:
        return
    try:
        jax.config.update('jax_cpu_collectives_implementation', 'gloo')
    except Exception:
        pass  # older jax without the option
    n = os.environ.get('JAX_NUM_PROCESSES')
    pid = os.environ.get('JAX_PROCESS_ID')
    try:
        if n is not None and pid is not None:
            jax.distributed.initialize(coordinator_address=coord,
                                       num_processes=int(n),
                                       process_id=int(pid))
        else:
            jax.distributed.initialize()  # pod auto-detection
    except Exception as e:  # already initialized or single-process
        print(f'jax.distributed.initialize skipped: {e}')


def make_mesh(dp: Optional[int] = None, mp: int = 1,
              devices=None, sp: int = 1, ep: int = 1) -> Mesh:
    '''``('dp', 'sp', 'ep', 'mp')`` mesh over the local devices; unused axes
    are size 1 (a size-1 axis never appears in a PartitionSpec's collectives,
    so plain data parallelism lowers identically to a 1-D mesh).

    dp defaults to all available devices / (sp * ep * mp). ``sp`` is the
    sequence/context-parallel axis used by the proposal stage's long
    sequences (see parallel/seq.py), ``ep`` the expert-parallel axis
    sharding MoE expert weights (ops/moe.py + sharding_rules.py), ``mp``
    the Megatron tensor-parallel axis (sharding_rules.py).
    '''
    devices = devices if devices is not None else jax.devices()
    if dp is None:
        dp = len(devices) // (sp * ep * mp)
    if dp < 1 or sp < 1 or mp < 1 or ep < 1 or dp * sp * ep * mp > len(devices):
        raise ValueError(
            f'mesh dp={dp} x sp={sp} x ep={ep} x mp={mp} needs '
            f'{max(dp, 1) * max(sp, 1) * max(ep, 1) * max(mp, 1)} devices '
            f'but only {len(devices)} are available (check --dp_devices / '
            f'--sp_devices / --ep_devices / mp)')
    if dp * sp * ep * mp < len(devices):
        import sys
        print(f'NOTE: building a dp{dp}xsp{sp}xep{ep}xmp{mp} mesh on '
              f'{dp * sp * ep * mp} of {len(devices)} visible devices; pass '
              f'--dp_devices {len(devices) // (sp * ep * mp)} to use all of '
              f'them', file=sys.stderr)
    devices = np.asarray(devices[:dp * sp * ep * mp]).reshape(dp, sp, ep, mp)
    return Mesh(devices, axis_names=('dp', 'sp', 'ep', 'mp'))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    '''Shard the leading (batch) axis over dp; everything else replicated.'''
    return NamedSharding(mesh, P('dp'))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, stacked: bool = False):
    '''Place a pytree of host arrays on the mesh, batch axis sharded over dp.

    Scalars / 0-d leaves are replicated. When the mesh carries a live
    ``sp`` axis, rank-3 ``(B, S, D)`` feature leaves whose sequence axis
    divides it are additionally sharded over sp (the sequence-parallel
    input layout; see parallel/seq.py) — other leaves (captions, dense GT
    targets, row-valid flags) stay batch-sharded only.

    stacked=True places a K-STACKED batch (every array leaf carries a
    leading axis of K host batches, the multi-step-dispatch input of
    ``train.steps.make_multistep``): the K axis is replicated — lax.scan
    iterates it — and the batch axis is now axis 1, so every spec gains a
    leading None and the rank thresholds shift by one.
    '''
    lead = (None,) if stacked else ()
    bsh = NamedSharding(mesh, P(*lead, 'dp'))
    rsh = replicate(mesh)
    sp = mesh.shape.get('sp', 1)
    seq_sh = (NamedSharding(mesh, P(*lead, 'dp', 'sp')) if sp > 1 else None)
    feat_rank = 4 if stacked else 3
    seq_axis = 2 if stacked else 1
    min_rank = 1 if stacked else 0
    multiproc = jax.process_count() > 1

    def place(x, sh):
        if not multiproc:
            return jax.device_put(x, sh)
        # multi-host: assemble the global array from this process's
        # addressable shards only. A plain device_put would (a) run
        # multihost_utils.assert_equal over the full host value — extra
        # cross-host traffic per batch — and (b) reject per-host input
        # pipelines outright (the loaders fill only their own dp rows;
        # see DataParallel.local_rows).
        dmap = sh.addressable_devices_indices_map(x.shape)
        shards = [jax.device_put(x[idx], d) for d, idx in dmap.items()]
        return jax.make_array_from_single_device_arrays(x.shape, sh, shards)

    def put(x):
        x = np.asarray(x)
        if x.ndim <= min_rank:
            return place(x, rsh)
        if (seq_sh is not None and x.ndim == feat_rank
                and x.shape[seq_axis] % sp == 0):
            return place(x, seq_sh)
        return place(x, bsh)

    return jax.tree.map(put, batch)


def place_like(tree, ref):
    '''device_put each leaf of ``tree`` onto the sharding of the matching
    leaf in ``ref`` (same treedef). Used on checkpoint resume: the npz
    loader returns host arrays, and without re-placing them an fsdp/mp
    training state would silently lose its sharding at the next jit call
    (uncommitted inputs default to whatever GSPMD propagation picks).
    Leaves whose reference is not a committed jax.Array pass through.'''
    def put(n, r):
        if isinstance(r, jax.Array) and hasattr(r, 'sharding'):
            return jax.device_put(n, r.sharding)
        return n
    return jax.tree.map(put, tree, ref)


class DataParallel:
    '''Thin helper bundling a mesh with the common shardings and a jit
    wrapper for train/eval steps.

    Usage:
        dp = DataParallel(n_devices)
        step = dp.jit_step(train_step_fn, donate_state=True)
        state = dp.replicate_tree(state)
        state, metrics = step(state, dp.shard(batch))
    '''

    def __init__(self, dp: Optional[int] = None, mp: int = 1, devices=None,
                 sp: int = 1, ep: int = 1, fsdp: bool = False):
        self.mesh = make_mesh(dp, mp, devices, sp, ep)
        self.n_dp = self.mesh.shape['dp']
        self.n_sp = self.mesh.shape.get('sp', 1)
        self.n_ep = self.mesh.shape.get('ep', 1)
        # fsdp: params/optimizer state are sharded over dp (ZeRO-3 via the
        # rules in sharding_rules.py) — jit must inherit those placements
        # instead of pinning the state replicated
        self.fsdp = bool(fsdp)
        self.batch_sh = batch_sharding(self.mesh)
        self.repl_sh = replicate(self.mesh)

    def shard(self, batch):
        return shard_batch(self.mesh, batch)

    def shard_stacked(self, batch):
        '''Place a K-stacked batch (leading scan axis replicated, batch
        axis 1 dp-sharded) — the input of a multi-step-dispatch bundle
        (train.steps.make_multistep).'''
        return shard_batch(self.mesh, batch, stacked=True)

    def maybe_shard(self, batch):
        '''Shard when the batch divides the dp axis, else leave as-is —
        the shared gate for eval/decode consumers (train steps size their
        batches to the mesh up front).'''
        if self.n_dp > 1:
            B = next(iter(jax.tree.leaves(batch))).shape[0]
            if B % self.n_dp == 0:
                return self.shard(batch)
        return batch

    def replicate_tree(self, tree):
        return jax.tree.map(lambda x: jax.device_put(x, self.repl_sh), tree)

    def complete_on_mesh(self, tree):
        '''Replicate onto this mesh every leaf that is not already placed
        on it, leaving mesh-placed (sharded) leaves untouched.

        Needed by the fsdp/ep paths: place_params puts the params (and,
        via optax's zeros_like, the Adam moments) on the mesh, but
        optimizer.init also creates fresh SCALAR leaves (step counts) on
        the default device — when the mesh is a strict subset of the
        visible devices, jit then sees two conflicting device assignments
        and raises "Received incompatible devices".'''
        def put(x):
            sh = getattr(x, 'sharding', None)
            if isinstance(sh, NamedSharding) and sh.mesh == self.mesh:
                return x
            return jax.device_put(x, self.repl_sh)
        return jax.tree.map(put, tree)

    def jit_step(self, fn, donate_state: bool = False, stacked: bool = False,
                 **jit_kwargs):
        '''jit a (state, batch) -> (state, aux) step: state replicated,
        batch dp-sharded; XLA inserts the grad psum over ICI.

        With mp > 1 the state's shardings are INHERITED from the arrays
        themselves (place_params' Megatron rules): pinning them replicated
        here would silently undo tensor parallelism — 2x param memory and
        no mp compute split — on every call. With sp > 1 the BATCH
        shardings are inherited too: shard() places feature leaves
        (dp, sp)-sharded and the rest dp-sharded, and pinning them all to
        P('dp') here would undo the sequence split at the jit boundary.

        stacked=True jits a multi-step bundle (make_multistep): the batch
        leaves carry a leading scan axis, so the pinned batch sharding
        gains a leading None (matching shard_stacked's placement).'''
        donate = (0,) if donate_state else ()
        batch_sh = (NamedSharding(self.mesh, P(None, 'dp')) if stacked
                    else self.batch_sh)
        if self.n_sp > 1:
            return jax.jit(fn, donate_argnums=donate, **jit_kwargs)
        if self.mesh.shape.get('mp', 1) > 1 or self.n_ep > 1 or self.fsdp:
            return jax.jit(
                fn,
                in_shardings=(None, batch_sh),
                donate_argnums=donate,
                **jit_kwargs)
        return jax.jit(
            fn,
            in_shardings=(self.repl_sh, batch_sh),
            out_shardings=(self.repl_sh, self.repl_sh),
            donate_argnums=donate,
            **jit_kwargs)

    def local_rows(self, B: int):
        '''This process's contiguous row block [lo, hi) of a (B, ...) batch
        under the dp sharding — the per-host slice of the global batch on a
        multi-host pod.

        ``jax.device_put`` only ever transfers a process's ADDRESSABLE
        shards, so a host that fills the other processes' rows with zeros
        ships exactly the same bytes to its chips as one that loaded
        everything: the data loaders use this slice to skip feature IO for
        rows this host will never transfer (per-host sharded input
        pipeline). Returns None when the whole batch is local
        (single-process) or when this process's rows are non-contiguous
        under the device order (callers then load everything — correct,
        just without the IO saving).
        '''
        if jax.process_count() == 1:
            return None
        pid = jax.process_index()
        rows = []
        for dev, idx in self.batch_sh.devices_indices_map((B,)).items():
            if dev.process_index != pid:
                continue
            sl = idx[0]
            lo = sl.start or 0
            hi = sl.stop if sl.stop is not None else B
            rows.append((lo, hi))
        if not rows:
            return (0, 0)
        rows.sort()
        lo, hi = rows[0]
        for s, e in rows[1:]:
            if s != hi:
                return None  # non-contiguous: fall back to full loading
            hi = e
        return (lo, hi)

    def jit_eval(self, fn, **jit_kwargs):
        '''jit a (params, batch) -> out eval/decode step; output stays
        dp-sharded (gathered lazily on host read). With sp > 1 shardings
        are inherited from the arrays (see jit_step); with fsdp the params'
        dp shardings are inherited too (pinning them replicated here would
        materialize a full all-gathered copy on every device per call —
        exactly the memory fsdp exists to avoid).'''
        if self.n_sp > 1:
            return jax.jit(fn, **jit_kwargs)
        if self.fsdp:
            return jax.jit(fn, in_shardings=(None, self.batch_sh),
                           **jit_kwargs)
        return jax.jit(
            fn,
            in_shardings=(self.repl_sh, self.batch_sh),
            **jit_kwargs)
