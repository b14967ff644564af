from bmt_tpu.train.losses import label_smoothing_kl, caption_loss
