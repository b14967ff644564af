'''Metrics logging: TensorBoard (torch.utils.tensorboard, host-side) with a
JSONL fallback, mirroring the reference's scalar layout
(reference: scripts/train_captioning_module.py:65-118).'''
from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricsLogger:
    def __init__(self, log_path: Optional[str]):
        self.log_path = log_path
        self.tb = None
        self.jsonl = None
        if log_path:
            os.makedirs(log_path, exist_ok=True)
            try:
                from torch.utils import tensorboard
                self.tb = tensorboard.SummaryWriter(log_dir=log_path)
            except Exception:
                pass
            self.jsonl = open(os.path.join(log_path, 'metrics.jsonl'), 'a')

    def add_scalar(self, tag: str, value, step: int):
        if self.tb is not None:
            self.tb.add_scalar(tag, value, step)
        if self.jsonl is not None:
            self.jsonl.write(json.dumps(
                {'tag': tag, 'value': float(value), 'step': int(step),
                 'time': time.time()}) + '\n')
            self.jsonl.flush()

    def close(self):
        if self.tb is not None:
            self.tb.close()
        if self.jsonl is not None:
            self.jsonl.close()


class NullLogger(MetricsLogger):
    def __init__(self):
        super().__init__(None)
