'''Pipeline parallelism over a ``pp`` mesh axis (GPipe-style microbatching).

BMT's 51 M parameters fit comfortably on one chip, so pipelining is not a
capacity need for the flagship configs — this module exists because the
framework's parallelism surface should cover the axis for scaled-up
variants (deeper ``--N`` stacks / wider ``--d_model``), and because the
mechanism must be *validated*, not hypothetical. It is tested for forward
and gradient parity against the sequential layer stack
(tests/test_pipeline_parallel.py) and demonstrated in the driver dry-run.

Design — the classic homogeneous-stage microbatch pipeline, written the
JAX-native way (``shard_map`` + ``lax.ppermute`` ring, no manual device
placement):

- the ``N``-layer stack is split into ``pp`` stages of ``N/pp`` layers;
  stage parameters are STACKED on a leading axis and sharded over 'pp',
  so each device physically holds only its own stage's weights (the point
  of pipeline parallelism);
- the batch splits into ``n_micro`` microbatches; a ``lax.scan`` runs
  ``n_micro + pp - 1`` ticks. Every tick each device applies its stage to
  its current microbatch and passes the result to the next device over
  the ICI ring (one ``ppermute`` per tick — nearest-neighbour traffic,
  exactly what the ring interconnect is good at);
- stage 0 feeds fresh microbatches in, the last stage emits results,
  collected via a masked ``psum`` (zeros from non-final stages), which
  also makes the output replicated across 'pp';
- autodiff runs straight through ``scan``+``ppermute``+``psum`` (their
  transposes are a reversed scan, the inverse permutation, and a
  broadcast), so ``jax.grad`` of a pipelined forward IS pipelined
  backward — bubble fraction (pp-1)/(n_micro+pp-1) in both directions.

The reference has no equivalent of any of this (its only axis is
``nn.DataParallel`` batch scatter — reference:
scripts/train_captioning_module.py:61).

Dropout note: sequential execution draws one (B, ...) mask per layer;
pipelined execution draws per-microbatch masks (folding the tick index
into the stage key). Both are valid dropout but the bit-streams differ,
so parity tests run deterministic; training under a pipeline is still
seed-reproducible.
'''
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_layer_params(layers: list, pp: int):
    '''[N x layer pytree] -> pytree with leaves (pp, N/pp, ...): stage s
    holds rows [s*N/pp, (s+1)*N/pp).'''
    n = len(layers)
    if n % pp:
        raise ValueError(f'{n} layers do not split into {pp} stages')
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return jax.tree.map(
        lambda x: x.reshape(pp, n // pp, *x.shape[1:]), stacked)


def pipeline_layer_stack(stage_params, inputs, layer_fn: Callable,
                         mesh: Mesh, n_micro: int, rng=None):
    '''Run ``layer_fn`` over every layer of a stacked stack, pipelined over
    the mesh's 'pp' axis.

    stage_params: pytree with leaves (pp, layers_per_stage, ...)
                  (see stack_layer_params) — sharded over 'pp' here.
    inputs:       pytree of (B, ...) arrays threaded through the layers
                  unchanged in structure/shape (constants like masks ride
                  along unmodified; layer_fn just returns them).
    layer_fn:     (one_layer_params, rng_or_None, carry_pytree) -> carry.
    n_micro:      microbatch count; B must divide by it. More microbatches
                  = smaller pipeline bubble ((pp-1)/(n_micro+pp-1)).
    rng:          optional base key; each (stage-layer, tick) gets a
                  distinct fold for dropout.

    Returns the carry pytree at (B, ...) shapes, replicated over 'pp'.
    '''
    pp = mesh.shape['pp']
    B = jax.tree.leaves(inputs)[0].shape[0]
    if B % n_micro:
        raise ValueError(f'batch {B} not divisible by n_micro={n_micro}')
    mbs = jax.tree.map(
        lambda x: x.reshape(n_micro, B // n_micro, *x.shape[1:]), inputs)

    n_ticks = n_micro + pp - 1

    def device_fn(params, mbs):
        # params leaves arrive as (1, layers_per_stage, ...) — this
        # device's stage
        params = jax.tree.map(lambda x: x[0], params)
        n_local = jax.tree.leaves(params)[0].shape[0]
        stage = jax.lax.axis_index('pp')

        def apply_stage(carry, t):
            for j in range(n_local):
                layer_p = jax.tree.map(lambda x: x[j], params)
                key = (jax.random.fold_in(
                    jax.random.fold_in(rng, stage * n_local + j), t)
                    if rng is not None else None)
                carry = layer_fn(layer_p, key, carry)
            return carry

        # warm-up ticks feed stages > 0 a REAL microbatch (not zeros):
        # zeroed carries would zero the boolean masks too, and a fully
        # masked softmax is NaN — harmless in the forward (warm-up
        # outputs are never collected) but 0-cotangent * NaN = NaN
        # poisons every parameter gradient in the backward. Real rows
        # keep the throwaway compute finite; its cotangent is exactly
        # zero, so gradients match the sequential stack.
        warm = jax.tree.map(lambda x: x[0], mbs)
        perm = [(i, (i + 1) % pp) for i in range(pp)]

        def tick(recv, t):
            # stage 0 consumes microbatch t while it lasts (its outputs
            # past t = n_micro-1 are garbage that drains off the end of
            # the schedule and is never collected)
            mb_t = jax.tree.map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False),
                mbs)
            inp = jax.tree.map(
                lambda a, b: jnp.where(stage == 0, a, b), mb_t, recv)
            out = apply_stage(inp, t)
            sent = jax.tree.map(
                lambda x: jax.lax.ppermute(x, 'pp', perm), out)
            emit = jax.tree.map(
                lambda x: jnp.where(stage == pp - 1, x,
                                    jnp.zeros_like(x)), out)
            return sent, emit

        _, emitted = jax.lax.scan(tick, warm, jnp.arange(n_ticks))
        # microbatch m leaves the last stage at tick m + pp - 1
        res = jax.tree.map(lambda x: x[pp - 1:], emitted)   # (M, B/M, ...)
        # non-final stages contributed zeros -> psum both collects the
        # result and replicates it across 'pp'
        return jax.tree.map(lambda x: jax.lax.psum(x, 'pp'), res)

    spec_params = jax.tree.map(lambda _: P('pp'), stage_params)
    spec_mbs = jax.tree.map(lambda _: P(), mbs)
    out = jax.shard_map(device_fn, mesh=mesh,
                        in_specs=(spec_params, spec_mbs),
                        out_specs=jax.tree.map(lambda _: P(), mbs),
                        check_vma=False)(stage_params, mbs)
    return jax.tree.map(
        lambda x: x.reshape(B, *x.shape[2:]), out)


def pipelined_bimodal_encoder_forward(stage_params, A, V, A_mask, V_mask,
                                      H: int, mesh: Mesh, n_micro: int,
                                      dout_p: float = 0.0, rng=None,
                                      deterministic: bool = True,
                                      attention_impl: str = 'xla'):
    '''Drop-in pipelined variant of
    :func:`bmt_tpu.models.encoders.bimodal_encoder_forward`: the N
    bi-modal layers split into pp stages, each (A, V, masks) microbatch
    flows through the ring. Returns (Av, Va).

    stage_params: from ``stack_layer_params(params['layers'], pp)``.
    '''
    from bmt_tpu.models.captioning import _rng_stream
    from bmt_tpu.models.encoders import bimodal_encoder_layer_forward

    def layer_fn(p, key, carry):
        M1, M2, m1, m2 = carry
        rr = _rng_stream(key) if key is not None else None
        M1, M2 = bimodal_encoder_layer_forward(
            p, M1, M2, m1, m2, H, dout_p, rr, deterministic,
            attention_impl)
        return (M1, M2, m1, m2)

    Av, Va, _, _ = pipeline_layer_stack(
        stage_params, (A, V, A_mask, V_mask), layer_fn, mesh, n_micro,
        rng=None if deterministic else rng)
    return Av, Va
