"""End-to-end manga-page serving benchmark (reference test_BE_manga.py).

Measures the full serve pipeline on the real TPU chip: page decode → labelme
box crop (eval/manga.py) → BucketedPredictor BE eval forward (bf16) → paste
masks back at page resolution → PNG write.  This is the wall-clock a user of
the reference's manga inference script experiences, including host image work
and the device→host fetch of the predictions — under the axon runtime that
fetch is a *real* sync, so plain wall timing is honest here (no enqueue lie;
see tools/bench_util.py for the train-step rules).

Pages get varying bubble counts (1..max) so the run exercises the bucketed
batch padding (eval/predictor.py): without it, every distinct bubbles-per-page
count would trigger a fresh 20-60 s XLA compile.

Usage: python tools/bench_manga_serve.py [--pages 24] [--img_size 512]
Prints one JSON line: {"pages_per_s": ..., "bubbles_per_s": ..., ...}
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image


def build_tree(root: str, n_pages: int, page_size: int, max_bubbles: int,
               seed: int = 0):
    """Synthetic manga/episode/chapter tree with labelme annotations.

    Bubble count cycles 1..max_bubbles across pages so the serve run hits
    several bucket shapes.  Returns (pages_root, annos_root, total_bubbles).
    """
    pages = os.path.join(root, "pages")
    annos = os.path.join(root, "annos")
    page_dir = os.path.join(pages, "MangaA", "ep1", "ch1", "OriginSizeManga")
    anno_dir = os.path.join(annos, "MangaA", "ep1", "ch1")
    os.makedirs(page_dir)
    os.makedirs(anno_dir)
    rng = np.random.default_rng(seed)
    h = w = page_size
    ys, xs = np.mgrid[0:h, 0:w]
    total = 0
    for p in range(n_pages):
        k = 1 + p % max_bubbles
        total += k
        page = rng.uniform(100, 200, (h, w, 3)).astype(np.uint8)
        shapes = []
        for _ in range(k):
            cx, cy = rng.uniform(0.15 * w, 0.85 * w, 2)
            rx, ry = rng.uniform(0.04 * w, 0.09 * w, 2)
            bub = (((xs - cx) / rx) ** 2 + ((ys - cy) / ry) ** 2) <= 1.0
            page[bub] = 255
            shapes.append({
                "label": "Bubble-Boundary", "sub_label": "Oval",
                "points": [[float(cx - rx - 4), float(cy - ry - 4)],
                           [float(cx + rx + 4), float(cy + ry + 4)]],
            })
        Image.fromarray(page).save(os.path.join(page_dir, f"p{p:03d}.png"))
        with open(os.path.join(anno_dir, f"p{p:03d}.json"), "w") as f:
            json.dump({"imageWidth": w, "imageHeight": h, "shapes": shapes}, f)
    return pages, annos, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=24)
    ap.add_argument("--page_size", type=int, default=1024)
    ap.add_argument("--img_size", type=int, default=512)
    ap.add_argument("--max_bubbles", type=int, default=9)
    args = ap.parse_args()

    from vaeplay_tpu.cli.test_be import load_be_state
    from vaeplay_tpu.eval.predictor import make_packed_be_predict, next_bucket
    from vaeplay_tpu.eval.serve import PageJob, serve_pages
    import jax.numpy as jnp

    root = tempfile.mkdtemp(prefix="manga_bench_")
    try:
        pages, annos, n_bubbles = build_tree(
            root, args.pages, args.page_size, args.max_bubbles)
        model, state = load_be_state(None, args.img_size)
        # production serving mode: the CLI's bit-packed bucketed path, bf16
        predict = make_packed_be_predict(model, state, args.img_size,
                                         compute_dtype=jnp.bfloat16)
        res = os.path.join(root, "out")
        os.makedirs(res)

        def walk(res_dir):
            # the CLI's production path: pipelined predict-vs-host overlap
            page_dir = os.path.join(pages, "MangaA", "ep1", "ch1",
                                    "OriginSizeManga")
            anno_dir = os.path.join(annos, "MangaA", "ep1", "ch1")
            jobs = [
                PageJob(os.path.join(page_dir, pf),
                        os.path.join(anno_dir, pf.split(".")[0] + ".json"),
                        None, pf.split(".")[0])
                for pf in sorted(os.listdir(page_dir))
            ]
            serve_pages(predict, jobs, args.img_size, res_dir, verbose=False)

        # warmup pass: compiles every bucket the workload will touch
        buckets = sorted({next_bucket(1 + p % args.max_bubbles, 32)
                          for p in range(args.pages)})
        t0 = time.perf_counter()
        walk(res)
        warm_s = time.perf_counter() - t0

        res2 = os.path.join(root, "out2")
        os.makedirs(res2)
        t0 = time.perf_counter()
        walk(res2)
        dt = time.perf_counter() - t0
        out = {
            "pages": args.pages, "bubbles": n_bubbles,
            "page_size": args.page_size, "img_size": args.img_size,
            "buckets": buckets,
            "warmup_s": round(warm_s, 2),
            "pages_per_s": round(args.pages / dt, 3),
            "bubbles_per_s": round(n_bubbles / dt, 2),
            "ms_per_page": round(dt / args.pages * 1000, 2),
        }
        print("BENCH_RESULT " + json.dumps(out))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
