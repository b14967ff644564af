'''bmt_tpu — a TPU-native (JAX/XLA/Pallas) dense video captioning framework.

Re-implements the capabilities of the Bi-Modal Transformer (BMT) dense video
captioning pipeline (reference: v-iashin/BMT) with a TPU-first design:
pure-functional models over parameter pytrees, jit-compiled static-shape step
functions, KV-cached autoregressive decoding via `lax.while_loop`, data-parallel
training over a `jax.sharding.Mesh`, and fused Pallas attention kernels.

Subpackages
-----------
- ``ops``        core math: attention, masks, layers (ref: model/blocks.py etc.)
- ``models``     captioning + proposal model assemblies (ref: model/*.py)
- ``decode``     greedy decoding with KV cache (ref: captioning_epoch_loops.py:39)
- ``data``       host-side input pipeline (ref: datasets/*)
- ``train``      losses, optimizers, trainers, checkpointing (ref: epoch_loops/*, loss/*)
- ``parallel``   mesh/sharding utilities (replaces nn.DataParallel)
- ``evaluation`` dense-captioning eval protocol + pure-python scorers (ref: evaluation/evaluate.py)
- ``utils``      proposal utils, config, misc (ref: utilities/*)
'''

__version__ = '0.1.0'
