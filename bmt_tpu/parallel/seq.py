'''Sequence (context) parallelism over the mesh's ``sp`` axis.

The proposal stage is the framework's long-sequence path (Sa=800 audio /
Sv=300 video frames per video — reference: main.py:99-102) and its encoder
attention and k<=211 conv heads dominate its FLOPs. Sequence parallelism
splits those sequences across devices: activations are sharded ``(dp, sp)``
on ``(B, S, D)`` and XLA GSPMD inserts the collectives — K/V all-gathers
for self/cross attention (softmax needs every key for each query row) and
halo exchanges / operand gathers for the spatially-partitioned conv heads.
No manual collectives anywhere, per the framework's GSPMD-first design
(DESIGN.md §5); the reference has no equivalent (its only axis is
``nn.DataParallel`` batch scatter).

Mechanism: model code calls :func:`shard_seq` on boundary activations.
Outside a :func:`sequence_parallel` context (or when the mesh's sp axis is
size 1) it is a no-op, so the single-chip and dp/mp paths are untouched;
inside, it pins a ``P('dp', 'sp')`` sharding constraint so GSPMD keeps the
sequence axis split through the network instead of drifting to full
replication. The context is entered at TRACE time (inside the jitted step
functions, see train/steps.py), so it composes with lazy jit compilation.
'''
from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_STATE = threading.local()


def _active_mesh() -> Optional[Mesh]:
    return getattr(_STATE, 'mesh', None)


@contextlib.contextmanager
def sequence_parallel(mesh: Optional[Mesh]):
    '''Enable shard_seq constraints for traces happening inside the block.

    A ``None`` mesh or one whose ``sp`` axis is size 1 disables them (the
    block is then a plain no-op), so callers can pass their mesh
    unconditionally.
    '''
    prev = _active_mesh()
    live = mesh is not None and mesh.shape.get('sp', 1) > 1
    _STATE.mesh = mesh if live else None
    try:
        yield
    finally:
        _STATE.mesh = prev


def shard_seq(x, seq_axis: int = 1):
    '''Constrain a ``(B, ..., S, ...)`` activation to ``P('dp', 'sp')`` on
    (batch, sequence) when a sequence_parallel context is active and the
    dims divide the mesh axes; identity otherwise. Safe to sprinkle on any
    activation whose sequence axis position is known statically.'''
    mesh = _active_mesh()
    if mesh is None:
        return x
    shape = getattr(x, 'shape', ())
    if (len(shape) <= seq_axis
            or shape[seq_axis] % mesh.shape['sp']
            or shape[0] % mesh.shape['dp']):
        return x
    spec = [None] * len(shape)
    spec[0] = 'dp'
    spec[seq_axis] = 'sp'
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
