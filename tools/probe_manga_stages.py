"""Stage-level timing of the manga serve pipeline (load / predict / paste /
PNG) to locate the host cost the round-3 verdict flagged (703 ms/page ≈ all
host work).  Runs the same synthetic tree as tools/bench_manga_serve.py and
times each stage sequentially (no pipeline overlap) so the per-stage cost is
unambiguous; the pipelined wall-clock is the bench tool's job.
"""

import os
import sys
import tempfile
import shutil
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.bench_manga_serve import build_tree


def main():
    pages_n = int(os.environ.get("PAGES", 24))
    page_size = int(os.environ.get("PAGE_SIZE", 1024))
    img_size = int(os.environ.get("IMG_SIZE", 512))

    from vaeplay_tpu.cli.test_be import load_be_state
    from vaeplay_tpu.eval.predictor import make_packed_be_predict
    from vaeplay_tpu.eval.serve import PageJob, load_page, paste_page
    import jax.numpy as jnp

    root = tempfile.mkdtemp(prefix="manga_probe_")
    try:
        pages, annos, n_bub = build_tree(root, pages_n, page_size, 9)
        model, state = load_be_state(None, img_size)
        predict = make_packed_be_predict(model, state, img_size,
                                         compute_dtype=jnp.bfloat16)
        page_dir = os.path.join(pages, "MangaA", "ep1", "ch1",
                                "OriginSizeManga")
        anno_dir = os.path.join(annos, "MangaA", "ep1", "ch1")
        jobs = [PageJob(os.path.join(page_dir, pf),
                        os.path.join(anno_dir, pf.split(".")[0] + ".json"),
                        None, pf.split(".")[0])
                for pf in sorted(os.listdir(page_dir))]
        res = os.path.join(root, "out")
        os.makedirs(res)

        # warmup (compiles every bucket)
        for job in jobs:
            pg = load_page(job, img_size)
            paste_page(job, pg, predict(pg["images"]), res)

        t_load = t_pred = t_paste = 0.0
        loaded = []
        t0 = time.perf_counter()
        for job in jobs:
            loaded.append((job, load_page(job, img_size)))
        t_load = time.perf_counter() - t0

        preds = []
        t0 = time.perf_counter()
        for job, pg in loaded:
            preds.append(predict(pg["images"]))
        t_pred = time.perf_counter() - t0

        t0 = time.perf_counter()
        for (job, pg), pr in zip(loaded, preds):
            paste_page(job, pg, pr, res)
        t_paste = time.perf_counter() - t0

        tot = t_load + t_pred + t_paste
        for name, t in (("load (decode+crop+resize)", t_load),
                        ("predict (dispatch+exec+fetch)", t_pred),
                        ("paste (+PNG write)", t_paste),
                        ("TOTAL sequential", tot)):
            print(f"{name:32s} {t / pages_n * 1e3:8.1f} ms/page "
                  f"({t:6.2f} s / {pages_n})", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
