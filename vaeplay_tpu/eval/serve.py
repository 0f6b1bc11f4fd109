"""Pipelined manga-page serving — the production form of the reference's
page loop (test_BE_manga.py:414-462, which is strictly sequential: load →
predict → paste per page).

On a tunnel-attached TPU the device predict (dispatch + bit-packed fetch)
costs a few hundred ms of latency that the reference's sequential loop pays
on the critical path.  `serve_pages` runs a 2-deep software pipeline: the
predict for page i executes on a single dedicated dispatch thread while the
host CPU pastes page i-1 and loads page i+1, so the device/tunnel time hides
behind host image work (and vice versa).  Exactly one device request is ever
in flight, and all device calls happen on the one dispatch thread — the
ordering the axon runtime is safe under (CLAUDE.md: one TPU program stream).

Page results are identical to the sequential loop's: pages are independent
(per-sample model, per-page paste), so only wall-clock changes.
"""

import os
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterable, Iterator, NamedTuple, Optional, Sequence, Tuple

from vaeplay_tpu.eval.manga import (
    load_manga_from_annotation, load_manga_from_mask,
    paste_edge_result_on_manga, paste_result_on_manga,
)


class PageJob(NamedTuple):
    """One page to serve.  `anno_path` selects the labelme-annotation route
    (ref main_annotation, test_BE_manga.py:414-462); otherwise `mask_path`
    selects the connected-components mask route (ref main_mask :373-412)."""
    img_path: str
    anno_path: Optional[str]
    mask_path: Optional[str]
    name: str


def load_page(job: PageJob, img_size: int) -> Dict:
    if job.anno_path:
        return load_manga_from_annotation(job.img_path, job.anno_path, img_size)
    return load_manga_from_mask(job.img_path, job.mask_path, img_size)


def paste_page(job: PageJob, page: Dict, preds: Dict, res_output: str):
    import numpy as np

    if job.anno_path:
        paste_result_on_manga(
            job.img_path, page, np.asarray(preds["masks"]),
            np.asarray(preds["edges"]), res_output, job.name)
    else:
        paste_edge_result_on_manga(
            job.img_path, page, np.asarray(preds["edges"]), res_output,
            job.name)


class ServeStats(NamedTuple):
    """serve_pages outcome breakdown."""
    written: int
    empty: int   # pages that loaded fine but contained no bubbles
    failed: int  # pages skipped on a load/predict/paste error


def serve_pages(predict: Callable, jobs: Sequence[PageJob], img_size: int,
                res_output: str, verbose: bool = True,
                load_workers: int = 4, paste_workers: int = 4) -> ServeStats:
    """Run every job through load → predict → paste with every stage off the
    critical path (round-3 VERDICT item 5: pages are embarrassingly parallel,
    test_BE_manga.py:414-462, but the host image work was single-threaded):

      load   `load_workers` threads decode/crop/resize pages ahead
             (window-bounded so memory stays O(workers), not O(pages));
      predict a single dedicated dispatch thread owns ALL device calls, in
             page order — the one-TPU-program-stream ordering the axon
             runtime is safe under;
      paste  `paste_workers` threads wait for their page's predict and do the
             page-resolution paste + PNG encode (PIL/zlib release the GIL).

    Per-page outputs are written to per-page files by pure per-page functions,
    so results are identical to the sequential loop's — only wall-clock and
    the interleaving of progress prints change.  Bad pages are skipped with a
    message (reference blanket-except, test_BE_manga.py:460-461); empty pages
    (no bubbles) are counted separately.  Returns a ServeStats
    (written, empty, failed) breakdown."""
    n_done = n_empty = n_failed = 0

    def paste_task(job, page, fut):
        # returns True on success; exceptions are counted by the collector
        paste_page(job, page, fut.result(), res_output)
        if verbose:
            print(f"{job.name}: {page['images'].shape[0]} bubbles → "
                  f"{os.path.join(res_output, job.name)}.png")
        return True

    with ThreadPoolExecutor(max_workers=max(1, load_workers)) as lp, \
            ThreadPoolExecutor(max_workers=1) as dp, \
            ThreadPoolExecutor(max_workers=max(1, paste_workers)) as pp:
        jobs_it = iter(jobs)
        window = max(1, load_workers) + 2
        load_q: deque = deque()   # (job, load future), submission order
        paste_q: deque = deque()  # (job, paste future)

        def fill_loads():
            while len(load_q) < window:
                try:
                    job = next(jobs_it)
                except StopIteration:
                    return
                load_q.append((job, lp.submit(load_page, job, img_size)))

        def collect_paste(p):
            nonlocal n_done, n_failed
            job, fut = p
            try:
                fut.result()
                n_done += 1
            except Exception as e:  # skip bad pages (test_BE_manga.py:460)
                n_failed += 1
                print(f"skip {job.img_path}: {e}")

        fill_loads()
        while load_q:
            job, lf = load_q.popleft()
            fill_loads()
            try:
                page = lf.result()
            except Exception as e:
                n_failed += 1
                print(f"skip {job.img_path}: {e}")
                continue
            if page["images"].shape[0] == 0:
                n_empty += 1
                if verbose:
                    print(f"{job.name}: no bubbles found")
                continue
            fut = dp.submit(predict, page["images"])
            paste_q.append((job, pp.submit(paste_task, job, page, fut)))
            while len(paste_q) > 2 * max(1, paste_workers):
                collect_paste(paste_q.popleft())
        while paste_q:
            collect_paste(paste_q.popleft())
    return ServeStats(n_done, n_empty, n_failed)


def pipeline_bc_batches(
    dispatch_mask: Callable, submit_trace: Callable,
    dispatch_refine: Callable, batches: Iterable,
) -> Iterator[Tuple[object, object]]:
    """Software-pipelined BC serve: mask program → host contour trace →
    refine program (reference networks_BC.py:208-241, where the trace sits
    on the critical path between the two device passes).

    The sequential loop pays, per batch:  mask dispatch + device exec +
    tunnel sync + host trace + refine dispatch + device exec + output fetch.
    This generator skews the stages across consecutive batches so the host
    trace of batch i-1 and the output fetch of batch i-2 overlap the device
    execution of batch i's mask pass:

        enqueue order:  mask(0) | mask(1), refine(0) | mask(2), refine(1),
                        yield(0) | mask(3), refine(2), yield(1) | ...

    All device dispatches stay on the caller's thread (the axon-safe single
    dispatch stream, see module docstring); only the blocking packed-mask
    fetch + trace runs on the tracer's worker thread (`submit_trace`,
    typically BridgeTracer.submit — the same overlap already used by the
    BC trainer, train/steps_bc.py:134).

    Args:
      dispatch_mask:   batch → bit-packed mask device array   (async enqueue)
      submit_trace:    packed → Future[(pts, counts)]         (worker thread)
      dispatch_refine: (batch, pts, counts) → refine output   (async enqueue)
      batches:         iterable of model inputs
    Yields (batch, refine_output) in order, with the output delayed one
    batch behind the dispatch front; the caller's fetch of each yielded
    output overlaps the next batch's device work.  Results are identical to
    the sequential loop's — batches are independent, only wall-clock changes.
    """
    tq: deque = deque()  # (batch, trace future) — mask dispatched
    rq: deque = deque()  # (batch, refine output) — refine dispatched

    def advance():
        x, tf = tq.popleft()
        pts, counts = tf.result()
        rq.append((x, dispatch_refine(x, pts, counts)))

    for x in batches:
        tq.append((x, submit_trace(dispatch_mask(x))))
        if len(tq) >= 2:
            advance()
        while len(rq) >= 2:
            yield rq.popleft()
    while tq:
        advance()
    while rq:
        yield rq.popleft()
