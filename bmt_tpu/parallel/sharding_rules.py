'''Parameter sharding rules: tensor parallelism (``mp``) and ZeRO/FSDP
(params + optimizer state sharded over the data axis ``dp``).

BMT's 51 M parameters fit on one chip, so neither is required for capacity —
but the mesh is built with the axes (SURVEY §7) and these rules make them
live: attention head projections and FFN hidden dims are Megatron-style
column/row sharded over ``mp``, the generator's vocab projection is
column-sharded, and with ``fsdp=True`` every large leaf additionally shards
one remaining dim over ``dp`` (the GSPMD spelling of ZeRO-3: XLA all-gathers
weights just-in-time in forward/backward and reduce-scatters gradients, so
per-device parameter + Adam-moment memory drops ~dp-fold; SURVEY §2.2 lists
ZeRO/FSDP among the strategies the reference lacks). No manual collectives.

Under eager JAX, arrays placed with these shardings propagate through
``optax.init`` (zeros_like preserves sharding) and through jitted steps, so
no explicit in_shardings plumbing is needed — place the params once.
'''
from __future__ import annotations

import math

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaves smaller than this stay replicated under fsdp: all-gathering a
# LayerNorm scale or a bias costs a collective launch per use and saves
# a few KB — the win is the big matrices (embeddings, FFN/attention
# projections, conv heads), which are all >= 1 MiB.
FSDP_MIN_ELEMS = 1 << 16


def _add_fsdp(spec: P, shape, dp_size: int, min_elems: int) -> P:
    '''Extend a (possibly shorter-than-ndim) spec with ``'dp'`` on the
    largest still-unsharded dim that divides the dp axis; unchanged when no
    dim qualifies or the leaf is small.'''
    entries = list(spec) + [None] * (len(shape) - len(spec))
    if math.prod(shape) < min_elems:
        return P(*entries)
    cands = [d for d, (dim, e) in enumerate(zip(shape, entries))
             if e is None and dim % dp_size == 0]
    if not cands:
        return P(*entries)
    entries[max(cands, key=lambda i: shape[i])] = 'dp'
    return P(*entries)


def _spec_for(path_keys, shape) -> P:
    keys = set(path_keys)
    last = path_keys[-1]

    # MoE (ops/moe.py): the expert-stacked weights shard their leading
    # expert axis over 'ep' (AND their hidden d_ff over 'mp' — ep and mp
    # compose); the tiny router stays replicated so every device routes
    # identically
    if 'experts' in keys:
        return {'w1': P('ep', None, 'mp'), 'b1': P('ep', 'mp'),
                'w2': P('ep', 'mp', None), 'b2': P('ep', None)}.get(last, P())
    if 'router' in keys:
        return P()

    # LoRA adapters (ops/lora.py) mirror the base weight's layout: a
    # column-parallel linear shards lora_b's output dim, a row-parallel one
    # shards lora_a's input dim; the rank dim and the scale stay replicated
    if last == 'lora_s':
        return P()
    col = bool({'q2d', 'k2d', 'v2d', 'fc1', 'generator'} & keys)
    row = bool({'d2q', 'fc2'} & keys)
    if last == 'lora_a':
        return P('mp', None) if row else P()
    if last == 'lora_b':
        return P(None, 'mp') if col else P()

    # attention projections: into-d_model matrices shard the head dim
    if {'q2d', 'k2d', 'v2d'} & keys:
        return P(None, 'mp') if last == 'w' else P('mp')
    # out-projection: row-sharded (contracting dim), bias replicated
    if 'd2q' in keys:
        return P('mp', None) if last == 'w' else P()
    # FFN: column-shard fc1, row-shard fc2
    if 'fc1' in keys:
        return P(None, 'mp') if last == 'w' else P('mp')
    if 'fc2' in keys:
        return P('mp', None) if last == 'w' else P()
    # LM head: shard the vocabulary dim
    if 'generator' in keys:
        return P(None, 'mp') if last == 'w' else P('mp')
    # everything else (norms, embeddings, bridges, convs, anchors): replicated
    return P()


def cap_param_shardings(params, mesh: Mesh, fsdp: bool = False,
                        fsdp_min_elems: int = FSDP_MIN_ELEMS):
    '''Pytree of NamedSharding matching ``params`` (captioning or proposal
    models — the rules key off leaf names). With ``fsdp=True`` large leaves
    additionally shard over the mesh's ``dp`` axis (ZeRO-3).'''
    dp_size = mesh.shape.get('dp', 1)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = []
    for path, leaf in flat:
        keys = tuple(getattr(k, 'key', getattr(k, 'idx', None)) for k in path)
        shape = getattr(leaf, 'shape', ())
        spec = _spec_for(keys, shape)
        # guard: every named axis must exist in the mesh and divide its
        # dim; fall back to replication otherwise
        ok = True
        for dim, axis in zip(shape, spec):
            size = mesh.shape.get(axis, 0) if axis is not None else 1
            if size == 0 or dim % size != 0:
                ok = False
        spec = spec if ok else P()
        if fsdp and dp_size > 1:
            # normalize first: drop size-1 mesh axes (no-op shardings) so
            # they don't block fsdp from the largest dim
            spec = P(*[a if a is not None and mesh.shape.get(a, 1) > 1
                       else None for a in spec])
            # dims added here divide dp_size by construction, so no re-guard
            spec = _add_fsdp(spec, shape, dp_size, fsdp_min_elems)
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def place_params(params, mesh: Mesh, fsdp: bool = False,
                 fsdp_min_elems: int = FSDP_MIN_ELEMS):
    '''Place a parameter pytree on the mesh under the tp (+ optional fsdp)
    rules.'''
    shardings = cap_param_shardings(params, mesh, fsdp, fsdp_min_elems)
    return jax.tree.map(jax.device_put, params, shardings)
