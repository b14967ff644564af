'''Preemption-safe training: SIGTERM -> batch-exact checkpoint -> clean exit.

TPU pods (and most cluster schedulers) deliver SIGTERM with a grace window
before killing a job. The reference has no resume at all; this framework's
rolling per-epoch checkpoints already bound the loss to one epoch — this
module shrinks it to ONE BATCH, and does so *exactly*:

- the guard's signal handler only sets a flag (handlers run between Python
  bytecodes on the main thread — never interrupt a jit dispatch);
- the epoch loops poll the flag after each optimizer step and stop early,
  recording the index of the next unprocessed batch;
- the trainer writes the rolling checkpoint with ``batch_in_epoch`` in the
  metadata and returns;
- on resume, the data loaders skip exactly that many batches
  (``batches(..., start_batch=k)``): batch composition is a pure function
  of (seed, epoch) and the per-step RNG folds off the restored step
  counter, so interrupted-and-resumed training is BIT-IDENTICAL to an
  uninterrupted run (pinned by tests/test_preempt.py).

The previous handler is chained, so schedulers' own SIGTERM bookkeeping
(and pytest's) keeps working; ``uninstall()`` restores it.
'''
from __future__ import annotations

import signal
import sys


class PreemptionGuard:
    '''Cooperative stop flag driven by OS signals.

    Usage:
        guard = PreemptionGuard().install()       # SIGTERM by default
        train_epoch_cap(..., guard=guard)
        if guard.requested: save rolling ckpt with guard.batch_in_epoch
    '''

    def __init__(self, signals=(signal.SIGTERM,)):
        self.signals = tuple(signals)
        self.requested = False
        self.batch_in_epoch = None   # set by the epoch loop when it stops
        self._prev = {}

    def install(self) -> 'PreemptionGuard':
        for sig in self.signals:
            self._prev[sig] = signal.signal(sig, self._handler)
        return self

    def uninstall(self):
        for sig, prev in self._prev.items():
            signal.signal(sig, prev)
        self._prev.clear()

    def _handler(self, signum, frame):
        self.requested = True
        print(f'[preempt] signal {signum} received: will checkpoint after '
              f'the current batch and exit cleanly', file=sys.stderr)
        prev = self._prev.get(signum)
        if callable(prev):           # chain the scheduler's own handler
            prev(signum, frame)

    def request(self):
        '''Programmatic trigger (tests, cooperative shutdown).'''
        self.requested = True
