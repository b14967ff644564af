'''Tensor-parallel parameter sharding rules (the mesh's ``mp`` axis).

BMT's 51 M parameters fit on one chip, so tensor parallelism is not required
for capacity — but the mesh is built with an ``mp`` axis (SURVEY §7) and
these rules make it live: attention head projections and FFN hidden dims are
Megatron-style column/row sharded, the generator's vocab projection is
column-sharded. XLA GSPMD inserts the all-reduces; no manual collectives.

Under eager JAX, arrays placed with these shardings propagate through
``optax.init`` (zeros_like preserves sharding) and through jitted steps, so
no explicit in_shardings plumbing is needed — place the params once.
'''
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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


def cap_param_shardings(params, mesh: Mesh):
    '''Pytree of NamedSharding matching ``params`` (captioning or proposal
    models — the rules key off leaf names).'''
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = []
    for path, leaf in flat:
        keys = tuple(getattr(k, 'key', getattr(k, 'idx', None)) for k in path)
        spec = _spec_for(keys, getattr(leaf, 'shape', ()))
        # guard: every named axis must exist in the mesh and divide its
        # dim; fall back to replication otherwise
        ok = True
        for dim, axis in zip(getattr(leaf, 'shape', ()), spec):
            size = mesh.shape.get(axis, 0) if axis is not None else 1
            if size == 0 or dim % size != 0:
                ok = False
        shardings.append(NamedSharding(mesh, spec if ok else P()))
    return jax.tree_util.tree_unflatten(treedef, shardings)


def place_params(params, mesh: Mesh):
    '''Place a parameter pytree on the mesh under the tp rules.'''
    shardings = cap_param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
