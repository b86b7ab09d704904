"""Background-thread batch prefetching.

The reference pays one synchronous host round trip per step: numpy batch
assembly + augmentation happen inline before every sess.run
(train.py:207-211). Here a one-(or more)-batch-ahead daemon thread
overlaps host-side loading/augmentation with device compute, so samplers
with real host cost (the ScanNet crop sampler) keep the chip fed.
"""

from __future__ import annotations

import queue
import threading
from collections.abc import Iterable, Iterator


class _ExceptionWrapper:
    def __init__(self, exc: BaseException):
        self.exc = exc


_END = object()


def parallel_map(fn, items: Iterable, workers: int,
                 ahead: int | None = None) -> Iterator:
    """Order-preserving lazy thread map with a bounded in-flight window.

    Numpy-heavy item producers (the ScanNet crop sampler's slab scans and
    resampling gathers) release the GIL for most of their work, so a small
    thread pool overlaps them well without process-spawn cost. `ahead`
    bounds buffered results (host memory), default 2x workers.
    """
    if workers <= 1:
        for x in items:
            yield fn(x)
        return
    import collections
    from concurrent.futures import ThreadPoolExecutor

    ahead = ahead if ahead is not None else workers * 2
    dq: collections.deque = collections.deque()
    with ThreadPoolExecutor(max_workers=workers) as ex:
        try:
            for x in items:
                dq.append(ex.submit(fn, x))
                if len(dq) >= ahead:
                    yield dq.popleft().result()
            while dq:
                yield dq.popleft().result()
        finally:
            for f in dq:
                f.cancel()


class Prefetcher(Iterator):
    """Wrap an iterable so items are produced by a background thread.

    `depth` bounds how far ahead the producer runs (host memory bound).
    Exceptions raised by the underlying iterable re-raise at the consumer.
    ``close()`` stops the producer early (e.g. when the consumer takes a
    bounded prefix of the stream); it is also safe after exhaustion.
    """

    def __init__(self, iterable: Iterable, depth: int = 2):
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._produce, args=(iterable,), daemon=True)
        self._thread.start()

    def _put(self, item) -> bool:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _produce(self, iterable) -> None:
        try:
            for item in iterable:
                if not self._put(item):
                    return
            self._put(_END)
        except BaseException as exc:  # noqa: BLE001 — forwarded to consumer
            self._put(_ExceptionWrapper(exc))

    def __iter__(self) -> "Prefetcher":
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration
        item = self._q.get()
        if item is _END:
            self._stop.set()
            raise StopIteration
        if isinstance(item, _ExceptionWrapper):
            self._stop.set()
            raise item.exc
        return item

    def close(self) -> None:
        self._stop.set()
        while True:  # unblock a producer waiting on a full queue
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=5)
