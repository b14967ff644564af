'''Device-time accounting via jax.profiler traces (works over the
tunnel): per-program DEVICE milliseconds for the train step and its
pieces, separating the executable's true cost from host/tunnel
overhead. This is the instrument behind docs/DESIGN.md §6b's round-5
table (device step 10.72 ms = fwd 2.76 + bwd 5.15 + opt 2.59; device
MFU 0.467 vs the wall-based scoreboard 0.37 — the gap is the
time-shared tunnel's duty cycle).

Usage: python examples/device_time_trace.py [--B 32] [--reps 3]
Writes traces under tmp/trace_* (TensorBoard/Perfetto-viewable) and
prints one line per program.
'''
import argparse
import os
import shutil
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(1, os.path.join(os.path.dirname(__file__), '..'))

from bmt_tpu.models import CapModelDims, init_bimodal_transformer
from bmt_tpu.models.captioning import bimodal_transformer_forward
from bmt_tpu.ops.masks import make_masks
from bmt_tpu.train.losses import label_smoothing_kl_logits
from bmt_tpu.train.optim import build_optimizer
from bmt_tpu.train.steps import (cast_tree, init_train_state,
                                 make_cap_train_step)
from bmt_tpu.utils.misc import enable_compile_cache
from bmt_tpu.utils.profiling import trace, trace_device_ms_per_exec




def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument('--B', type=int, default=32)
    ap.add_argument('--reps', type=int, default=3)
    args = ap.parse_args(argv)
    enable_compile_cache()

    B, Sa, Sv, Sc, VOC = args.B, 256, 96, 22, 10172
    bf16 = jnp.bfloat16
    dims = CapModelDims(voc_size=VOC)
    params = init_bimodal_transformer(jax.random.PRNGKey(0), dims)
    rng = np.random.default_rng(0)
    captions = np.full((B, Sc), 1, np.int32)
    captions[:, 0] = 2
    captions[:, 1:-2] = rng.integers(4, VOC, size=(B, Sc - 3))
    captions[:, -2] = 3
    batch = {
        'src': {
            'rgb': jnp.asarray(rng.normal(size=(B, Sv, 1024)), jnp.float32),
            'flow': jnp.asarray(rng.normal(size=(B, Sv, 1024)), jnp.float32),
            'audio': jnp.asarray(rng.normal(size=(B, Sa, 128)), jnp.float32),
        },
        'caption': jnp.asarray(captions),
    }

    class _Cfg:
        optimizer = 'adam'
        lr = 5e-5
        grad_clip = 1.0
        weight_decay = 0.0
        beta1, beta2, eps = 0.9, 0.999, 1e-8

    optimizer = build_optimizer(_Cfg())
    key0 = jax.random.key(0, impl='rbg')

    def loss_fn(p):
        cap = batch['caption']
        cap_x, cap_y = cap[:, :-1], cap[:, 1:]
        src = jax.tree.map(lambda x: x.astype(bf16), batch['src'])
        masks = make_masks(batch['src'], cap_x, dims.modality, 1)
        logits = bimodal_transformer_forward(
            cast_tree(p, bf16), dims, src, cap_x, masks, rng=key0,
            deterministic=False, return_logits=True)
        kl = label_smoothing_kl_logits(logits, cap_y, 0.7, 1)
        return kl / jnp.maximum(jnp.sum(cap_y != 1), 1)

    step = jax.jit(make_cap_train_step(dims, optimizer, 0.7, 1,
                                       attention_impl='xla',
                                       compute_dtype=bf16),
                   donate_argnums=(0,))
    cell = [init_train_state(jax.tree.map(jnp.copy, params), optimizer,
                             prng_impl='rbg')]

    def step_once():
        s, m = step(cell[0], batch)
        cell[0] = s
        return m['loss']

    p0 = jax.tree.map(jnp.copy, params)
    fwd = jax.jit(loss_fn)
    grad = jax.jit(lambda p: jax.value_and_grad(loss_fn)(p)[1])
    progs = {
        'step': step_once,
        'fwd': lambda: fwd(p0),
        'grad': lambda: grad(p0)['generator']['b'],
    }
    for name, fn in progs.items():
        fn()
        np.asarray(jax.tree.leaves(fn())[0])
        print(f'{name} warm', file=sys.stderr)

    for name, fn in progs.items():
        d = os.path.join(os.path.dirname(__file__), '..', 'tmp',
                         f'trace_{name}')
        shutil.rmtree(d, ignore_errors=True)
        with trace(d):
            out = None
            for _ in range(args.reps):
                out = fn()
            np.asarray(jax.tree.leaves(out)[0])
        print(f'{name:6s} device {trace_device_ms_per_exec(d, args.reps):8.3f} '
              f'ms/exec  (trace: {d})')
        if name == 'step':
            # device-time flame by source line (99% coverage measured):
            # pair with examples/traffic_census.py's byte view
            from bmt_tpu.utils.profiling import trace_device_ms_by_source
            compiled = step.lower(cell[0], batch).compile().as_text()
            by = trace_device_ms_by_source(d, compiled)
            for src, ms in list(by.items())[:10]:
                print(f'         {ms / args.reps:7.3f} ms/step  {src}')


if __name__ == '__main__':
    main()
