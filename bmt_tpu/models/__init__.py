from bmt_tpu.models.captioning import (
    CapModelDims, init_bimodal_transformer, bimodal_transformer_forward,
    init_unimodal_transformer, unimodal_transformer_forward,
)
from bmt_tpu.models.encoders import (
    init_bimodal_encoder, bimodal_encoder_forward,
    init_encoder, encoder_forward,
)
from bmt_tpu.models.decoders import (
    init_bimodal_decoder, bimodal_decoder_forward,
    init_decoder, decoder_forward,
)
from bmt_tpu.models.proposal import (
    PropModelDims, init_multimodal_proposal_generator,
    multimodal_proposal_forward, init_unimodal_proposal_generator,
    unimodal_proposal_forward, make_targets_dense, yolo_losses,
)
