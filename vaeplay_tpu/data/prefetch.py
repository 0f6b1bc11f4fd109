"""Host input pipeline: batch prefetching + parallel sample loading.

The reference feeds every trainer through `torch.utils.data.DataLoader(...,
num_workers=args.workers)` (e.g. train_BE.py:115-121): worker processes
decode/augment samples while the GPU computes.  The TPU-native equivalent has
two independent levers, both implemented here:

  * `prefetch(iterable, depth)` — a producer thread drains any batch iterator
    into a bounded queue so host-side decode/augment/collate of batch i+1
    overlaps device execution of batch i.  Under the axon runtime device
    dispatch is asynchronous, so a prefetch depth of 2 is enough to hide the
    host pipeline entirely unless sample decode is slower than the step.
  * `pooled_items(load_fn, indices, workers)` — an ordered thread-pool map
    used by the file-backed datasets' `epoch_batches(workers=N)`: per-sample
    PIL decode + resize (which release the GIL) run on `workers` threads,
    bounded in flight so memory stays proportional to the pool, with results
    delivered in deterministic index order regardless of thread timing.

Threads (not processes) are the right grain here: the per-sample work is
C-backed (PIL/numpy release the GIL), and thread pools avoid the serialized
tensor IPC that torch pays between DataLoader workers and the main process.
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, Iterator, Sequence, TypeVar

T = TypeVar("T")

_SENTINEL = object()


class _PrefetchIterator:
    """Iterator over `src` driven by a background producer thread.

    Exceptions raised by the source iterator are re-raised in the consumer.
    Abandoning the iterator (GC / `close()`) unblocks and stops the producer.
    """

    def __init__(self, src: Iterable, depth: int):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(depth, 1))
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._produce, args=(iter(src),), daemon=True
        )
        self._thread.start()

    def _produce(self, it: Iterator) -> None:
        try:
            for item in it:
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if self._stop.is_set():
                    return
            self._put_forever(_SENTINEL)
        except BaseException as e:  # propagate into the consumer
            self._put_forever(e)

    def _put_forever(self, item) -> None:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return
            except queue.Full:
                continue

    def __iter__(self) -> "_PrefetchIterator":
        return self

    def __next__(self):
        if self._stop.is_set():
            raise StopIteration
        item = self._q.get()
        if item is _SENTINEL:
            self._stop.set()
            raise StopIteration
        if isinstance(item, BaseException):
            self._stop.set()
            raise item
        return item

    def close(self) -> None:
        self._stop.set()

    def __del__(self):  # pragma: no cover - GC timing
        self._stop.set()


def prefetch(src: Iterable, depth: int = 2) -> _PrefetchIterator:
    """Wrap a batch iterator so the host prepares up to `depth` batches ahead
    on a background thread.  Works with any `epoch_batches(...)` iterator."""
    return _PrefetchIterator(src, depth)


def batched_loads(
    load_fn: Callable[[int], T], order: Sequence[int], batch_size: int,
    workers: int = 0, drop_remainder: bool = True,
) -> Iterator[list]:
    """Yield lists of `load_fn(i)` results grouped into batches.  With
    workers > 0 the loads are pooled across batch boundaries (the pool keeps
    working through a batch edge), in deterministic index order."""
    stop = ((len(order) // batch_size) * batch_size
            if drop_remainder else len(order))
    it = pooled_items(load_fn, [int(i) for i in order[:stop]], workers)
    for i in range(0, stop, batch_size):
        yield [next(it) for _ in range(min(batch_size, stop - i))]


def epoch_iterator(dset, batch_size: int, seed: int = 0, workers: int = 0,
                   depth: int = 2):
    """The standard trainer input pipeline: `dset.epoch_batches(...)` wrapped
    in a `prefetch` thread, with `workers=` forwarded when the dataset's
    epoch_batches supports it (the file-backed datasets; synthetic generators
    are already cheap and ignore it)."""
    import inspect

    kwargs = {}
    try:
        if "workers" in inspect.signature(dset.epoch_batches).parameters:
            kwargs["workers"] = workers
    except (TypeError, ValueError):  # pragma: no cover - exotic callables
        pass
    return prefetch(dset.epoch_batches(batch_size, seed, **kwargs), depth)


def pooled_items(
    load_fn: Callable[[int], T], indices: Sequence[int], workers: int,
    inflight_factor: int = 4,
) -> Iterator[T]:
    """Yield `load_fn(i)` for each index, in order.

    workers <= 0 degenerates to a plain sequential map (byte-identical to the
    pre-existing single-threaded path).  With workers > 0, up to
    `workers * inflight_factor` loads are in flight at once; results are
    still yielded in index order, so downstream collation is deterministic.
    `load_fn` must be thread-safe for parallel use (pure loads from disk are).
    """
    if workers <= 0:
        for i in indices:
            yield load_fn(i)
        return
    with ThreadPoolExecutor(max_workers=workers) as pool:
        indices = list(indices)
        window = max(workers * inflight_factor, 1)
        futures = [pool.submit(load_fn, i) for i in indices[:window]]
        next_submit = window
        for k in range(len(indices)):
            yield futures[k].result()
            futures[k] = None  # release the loaded item
            if next_submit < len(indices):
                futures.append(pool.submit(load_fn, indices[next_submit]))
                next_submit += 1
