"""Host->device input pipeline: background batch assembly + device prefetch.

The reference's DataLoader iterates synchronously on the host
(graph_classification_utils.py:48); under a tunnel or busy host the device
idles between steps. `prefetch_to_device` overlaps (a) host-side batch
assembly (numpy or the native C++ assembler) on a worker thread with
(b) async host->device transfer, keeping `size` batches in flight.
"""
from __future__ import annotations

import collections
import queue
import threading
from typing import Callable, Iterable, Iterator

import jax


def prefetch_to_device(batches: Iterable, size: int = 2,
                       device=None) -> Iterator:
    """Yield device-resident pytrees while the next `size` are prepared and
    transferred in the background."""
    dev = device or jax.devices()[0]
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _SENTINEL = object()

    def worker():
        try:
            for b in batches:
                q.put(jax.device_put(b, dev))
        except BaseException as e:  # surface errors at the consumer
            q.put(e)
            return
        q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
