"""Input pipeline: prefetched, preprocessed uint8 batches onto the device.

The serving-side analogue of the reference's caller-provided input feed
(Caffe2 speed_benchmark hands QNNPACK preprocessed NHWC uint8 buffers,
README.md:58-147).  Host work (resize + quantize) runs in the native C++
thread pool (native/image_prep.cpp); `device_put` is asynchronous in JAX, so
a one-deep prefetch queue overlaps host preprocessing and H2D transfer of
batch N+1 with device compute on batch N - continuous batching for a
single-stream workload.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

import numpy as np

import jax

from .native import resize_quantize_batch


class BatchPrefetcher:
    """Wrap a host-batch iterator with a background prefetch thread that
    preprocesses and stages batches onto the device."""

    def __init__(self, source: Iterable[np.ndarray],
                 preprocess: Callable[[np.ndarray], np.ndarray] | None = None,
                 prefetch: int = 2, device=None):
        self._source = iter(source)
        self._preprocess = preprocess or (lambda x: x)
        self._device = device or jax.devices()[0]
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for batch in self._source:
                staged = jax.device_put(self._preprocess(batch), self._device)
                self._q.put(staged)
        except Exception as e:  # surface errors on the consumer side
            self._q.put(e)
        finally:
            self._q.put(None)

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item


def image_pipeline(float_batches: Iterable[np.ndarray], target_hw,
                   scale: float, zero_point: int, prefetch: int = 2,
                   device=None) -> BatchPrefetcher:
    """Resize+quantize float NHWC batches in native threads and prefetch the
    uint8 result to the device."""
    return BatchPrefetcher(
        float_batches,
        preprocess=lambda b: resize_quantize_batch(b, target_hw, scale,
                                                   zero_point),
        prefetch=prefetch, device=device)
