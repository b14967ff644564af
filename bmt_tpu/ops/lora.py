'''LoRA adapters: parameter-efficient finetuning of the captioner.

Beyond-reference capability (the reference finetunes nothing smaller than a
whole encoder: model/captioning_module.py:147-162). LoRA (Hu et al., 2021)
freezes the base weights and trains a rank-r update ``dW = (alpha/r) A @ B``
per linear; at BMT scale (d_model=1024, r=8) the adapters are ~0.4% of the
51 M base parameters, so domain finetunes ship as kilobyte-scale deltas and
the optimizer state shrinks ~250x.

TPU-native design notes:
- adapters live INSIDE the linear param dicts (``{'w','b'}`` gains
  ``lora_a (d_in, r)``, ``lora_b (r, d_out)``, ``lora_s ()``), so every
  consumer — train steps, KV-cache precompute, beam/sample decode, serving —
  picks them up through the single ``ops/layers.py:linear`` dispatch point
  with zero call-site changes, exactly like the int8 path;
- the delta is two skinny matmuls XLA fuses alongside the frozen base
  matmul; at r<=32 the extra FLOPs are <2% of the base GEMM;
- ``merge_lora`` folds adapters back into ``w`` for deployment (restores
  the exact base-graph HLO, enables ``--weights_int8`` on top — the int8
  quantizer auto-merges loose adapters, ops/quant.py);
- under tensor parallelism the adapter of a column-parallel linear shards
  ``lora_b``'s output dim and that of a row-parallel linear shards
  ``lora_a``'s input dim (parallel/sharding_rules.py), mirroring the base
  weight's layout so GSPMD inserts no extra collectives beyond the base
  path's.

Trainability is expressed through the existing freeze machinery
(train/optim.py:freeze_mask): with ``--lora_rank`` the cap trainer freezes
everything whose leaf name is not ``lora_a``/``lora_b``.
'''
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# shared "what is a linear" predicate (quant.py imports lora lazily inside
# its tree walk, so this top-level import is cycle-free)
from bmt_tpu.ops.quant import is_linear_leaf as _is_linear_leaf

# which linear sub-dicts get adapters, by their key in the parent dict
TARGET_SETS = {
    'attn': {'q2d', 'k2d', 'v2d', 'd2q'},
    'attn_ffn': {'q2d', 'k2d', 'v2d', 'd2q', 'fc1', 'fc2'},
    'all': None,   # every 2-D linear leaf
}


def add_lora(params, rank: int, key, alpha: float | None = None,
             targets: str = 'attn'):
    '''Return a copy of ``params`` with LoRA leaves added to target linears.

    ``lora_a`` is xavier-initialized, ``lora_b`` zeros — the adapted forward
    is BIT-IDENTICAL to the base model at step 0 (delta == 0). ``alpha``
    defaults to ``rank`` (scale 1.0). ``targets``: 'attn' (default — the
    attention projections, the standard LoRA placement), 'attn_ffn', 'all'.
    '''
    if rank <= 0:
        return params
    if targets not in TARGET_SETS:
        raise ValueError(
            f'unknown --lora_targets {targets!r}; one of {sorted(TARGET_SETS)}')
    names = TARGET_SETS[targets]
    scale = float(alpha if alpha is not None else rank) / float(rank)
    # deterministic per-site keys: fold the site index into the base key so
    # adapter init is independent of dict iteration details across versions
    counter = [0]

    def adapt(node, name):
        if _is_linear_leaf(node) and (names is None or name in names):
            d_in = node['w'].shape[0]
            k = jax.random.fold_in(key, counter[0])
            counter[0] += 1
            bound = math.sqrt(6.0 / (d_in + rank))
            return {
                **node,
                'lora_a': jax.random.uniform(
                    k, (d_in, rank), jnp.float32, -bound, bound),
                'lora_b': jnp.zeros((rank, node['w'].shape[1]), jnp.float32),
                'lora_s': jnp.asarray(scale, jnp.float32),
            }
        if isinstance(node, dict):
            return {k2: adapt(v, k2) for k2, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(adapt(v, name) for v in node)
        return node

    return {k2: adapt(v, k2) for k2, v in params.items()}


def shared_lora_deltas(sites, x):
    '''Adapter deltas for several linears that share the SAME input, with
    ONE concatenated A-side GEMM.

    Why: a rank-8 ``x @ A`` pads its 8-wide output dim to the MXU's 128
    lanes, so each per-site A GEMM costs ~16x its useful FLOPs. Where
    sites share an input (self-attention q2d/k2d/v2d on x, cross
    attention / KV-precompute k2d/v2d on the memory, the cached decode
    step's q/k/v), concatenating the A matrices runs one GEMM in the
    same padded footprint as one site's — measured to recover most of
    the LoRA forward overhead (docs/DESIGN.md 6b). Per-column math is
    unchanged (each output column is the same K-length dot product);
    only the GEMM's tiling may differ in the last ulp of the DELTA,
    never of the frozen base path, and the zero-init equivalence
    (lora_b == 0 -> delta exactly 0) is preserved bitwise.

    The B side deliberately stays per-site: folding the group's
    ``lora_b`` into one block-diagonal GEMM was probed and measured
    SLOWER end-to-end (+0.54 vs +0.48 ms forward overhead) — the
    block-diagonal assembly and, on the training path, the backward's
    scatter of d(B_blk) back into per-site trainable leaves cost more
    than the saved GEMM dispatches.

    ``sites``: list of adapted linear dicts (each with lora_a/lora_b/
    lora_s); ``x``: the shared input. Returns one delta per site.
    '''
    ranks = [s['lora_a'].shape[1] for s in sites]
    u = x @ jnp.concatenate([s['lora_a'] for s in sites], axis=1)
    deltas, off = [], 0
    for s, r in zip(sites, ranks):
        deltas.append((u[..., off:off + r] @ s['lora_b']) * s['lora_s'])
        off += r
    return deltas


def apply_shared_lora(sites, x, ys):
    '''``ys[i] + delta_i`` for sites sharing input ``x`` (see
    shared_lora_deltas); dtypes follow each base output.'''
    return [y + d.astype(y.dtype)
            for y, d in zip(ys, shared_lora_deltas(sites, x))]


def merge_linear_lora(node: dict) -> dict:
    '''Fold one linear's adapter into its base weight (fp32 accumulate).'''
    w = jnp.asarray(node['w'], jnp.float32)
    delta = (jnp.asarray(node['lora_a'], jnp.float32)
             @ jnp.asarray(node['lora_b'], jnp.float32)) * node['lora_s']
    merged = (w + delta).astype(node['w'].dtype)
    return {k: v for k, v in {**node, 'w': merged}.items()
            if not k.startswith('lora_')}


def merge_lora(params):
    '''Fold every adapter into its base weight; returns a plain base tree.

    Use before ``--weights_int8`` quantization or reference .pt export (both
    expect plain ``{'w','b'}`` linears); the quantizer also auto-merges.
    '''
    def walk(node):
        if isinstance(node, dict):
            if 'lora_a' in node:
                if 'w' not in node:
                    raise ValueError(
                        'cannot merge LoRA into a quantized linear — merge '
                        'before quantize_tree_int8, not after')
                return merge_linear_lora(node)
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v) for v in node)
        return node

    return walk(params)


def count_lora(params) -> tuple[int, int]:
    '''(number of adapted linears, total adapter parameters).'''
    sites, n = 0, 0
    def walk(node):
        nonlocal sites, n
        if isinstance(node, dict):
            if 'lora_a' in node:
                sites += 1
                n += int(node['lora_a'].size + node['lora_b'].size)
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)
    walk(params)
    return sites, n


def lora_frozen_predicate(path_keys) -> bool:
    '''Freeze predicate for LoRA finetuning: only adapter A/B train
    (``lora_s`` is a static scale, frozen like the base weights).'''
    return path_keys[-1] not in ('lora_a', 'lora_b')
