"""Host-side async prefetch — the TPU-native equivalent of the reference's
``DataLoader(..., num_workers=4)`` (train_asr.py:390-402, the repo's only
host concurrency; SURVEY.md section 2.3 "host parallelism").

Two small primitives:

  * :func:`background_iterator` — runs a (possibly expensive) host iterable
    in a worker thread with a bounded queue, so augmentation/mixing/np IO
    overlaps device compute;
  * :func:`prefetch_to_device` — additionally moves each batch onto the
    device (optionally with a mesh sharding) ``depth`` steps ahead, so the
    device never waits on a host->HBM transfer.

Threads (not processes) are right here: the producers are numpy/jax host
ops that release the GIL during transfers, and batches stay in shared
memory.
"""

from __future__ import annotations

import queue
import threading
import weakref
from typing import Any, Callable, Dict, Iterable, Iterator, Optional

_SENTINEL = object()


class _ProducerError:
    """Unique wrapper for producer exceptions — a plain tagged tuple could
    collide with legitimate items."""

    __slots__ = ("exc",)

    def __init__(self, exc: BaseException):
        self.exc = exc


def background_iterator(iterable: Iterable, maxsize: int = 2) -> Iterator:
    """Iterate ``iterable`` on a daemon thread, yielding through a bounded
    queue. Exceptions in the producer re-raise at the consumer. Closing or
    abandoning the returned generator (break / GC / exception in the
    consumer loop) signals the producer to stop, so no thread stays blocked
    on a full queue pinning device batches.

    The producer thread starts HERE (not on first ``next``), so up to
    ``maxsize`` items are already being produced before the consumer begins
    iterating — the 'depth steps ahead' contract of prefetch_to_device.
    Consequence: up to ``maxsize``+1 items are CONSUMED from ``iterable`` at
    construction time, even if the returned iterator is never advanced — do
    not hand in an iterator you also plan to keep reading elsewhere, and do
    not construct this speculatively over a source whose items are precious."""
    q: "queue.Queue" = queue.Queue(maxsize=maxsize)
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            it = iter(iterable)
            while not stop.is_set():
                try:
                    item = next(it)  # don't produce past a stop signal
                except StopIteration:
                    break
                if not _put(item):
                    return
        except BaseException as e:  # propagate to consumer
            _put(_ProducerError(e))
            return
        _put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()  # eager: production begins before the first next()

    def _drain() -> Iterator:
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    return
                if isinstance(item, _ProducerError):
                    raise item.exc
                yield item
        finally:
            stop.set()  # GeneratorExit / consumer exception: release producer
            # drain until the producer thread is dead: a put racing the stop
            # signal may land one more item, which must not stay referenced
            while t.is_alive():
                try:
                    q.get(timeout=0.05)
                except queue.Empty:
                    pass
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    gen = _drain()
    # A generator that is GC'd before its first next() never runs its
    # finally block (Python skips GeneratorExit for unstarted generators),
    # which with the eager producer start above would leak the thread
    # blocked on q.put forever. The finalizer covers that window; after
    # normal/closed iteration it just re-sets an already-set event.
    weakref.finalize(gen, stop.set)
    return gen


def prefetch_to_device(
    batches: Iterable[Dict[str, Any]],
    depth: int = 2,
    mesh=None,
    put_fn: Optional[Callable] = None,
) -> Iterator[Dict[str, Any]]:
    """Yield device-resident batches ``depth`` steps ahead of consumption.

    ``put_fn(batch) -> batch`` overrides placement; default is
    ``jax.device_put`` per leaf (or :func:`asr_shap.pipeline.train
    .shard_batch` when a mesh is given).
    """
    import jax

    if put_fn is None:
        if mesh is not None:
            from asr_shap.pipeline.train import shard_batch

            put_fn = lambda b: shard_batch(b, mesh)
        else:
            put_fn = lambda b: {k: jax.device_put(v) for k, v in b.items()}

    it = background_iterator(map(put_fn, batches), maxsize=depth)
    return it
