from bmt_tpu.parallel.mesh import (make_mesh, shard_batch, replicate,
                                   batch_sharding, DataParallel, place_like)
from bmt_tpu.parallel.sharding_rules import (cap_param_shardings,
                                             place_params)
from bmt_tpu.parallel.seq import sequence_parallel, shard_seq
from bmt_tpu.parallel.pipeline import (pipeline_layer_stack,
                                       pipelined_bimodal_encoder_forward,
                                       stack_layer_params)
