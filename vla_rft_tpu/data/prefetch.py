"""Background batch prefetcher.

The reference hides RLDS decode latency inside tf.data's own threading
(datasets.py num_workers=0 + tf parallelism); our numpy pipeline gets the
same overlap from a single producer thread with a small queue — the host
prepares batch t+1 while the device runs step t.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Dict


class PrefetchingLoader:
    """Wraps any object with next_batch()/state_dict()/load_state_dict()."""

    def __init__(self, inner, buffer_size: int = 2):
        self.inner = inner
        self._q: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self):
        while not self._stop.is_set():
            try:
                batch = self.inner.next_batch()
            except StopIteration:
                break
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue

    def next_batch(self) -> Dict[str, Any]:
        return self._q.get()

    def state_dict(self):
        return self.inner.state_dict()

    def load_state_dict(self, state):
        self.inner.load_state_dict(state)

    def close(self):
        self._stop.set()
