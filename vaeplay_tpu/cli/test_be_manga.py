"""Manga-page BE inference CLI — rebuild of reference test_BE_manga.py.

Walks manga/episode/chapter directories, crops per-bubble squares from
labelme annotations (or coarse masks), batches them through the BE net on
TPU, and pastes results back at page resolution (eval/manga.py).
"""

import argparse
import os

from vaeplay_tpu.cli.test_be import load_be_state
from vaeplay_tpu.eval.predictor import make_packed_be_predict
from vaeplay_tpu.eval.serve import PageJob, load_page, paste_page, serve_pages
from vaeplay_tpu.utils.amp import resolve_dtype
from vaeplay_tpu.utils.viz import makedirs


def process_page(predict, img_path, anno_path, mask_path,
                 img_size, res_output, name):
    """Annotation route (labelme boxes, ref main_annotation
    test_BE_manga.py:414-462) when anno_path is given; otherwise the
    connected-components mask route (ref main_mask :373-412), whose paste
    takes edges from the prediction and content from the coarse mask.

    `predict` maps (B, H, W, 3) images → dict of np arrays; pass a
    `eval.predictor.BucketedPredictor` so the varying bubbles-per-page batch
    size maps onto a handful of padded bucket shapes instead of one XLA
    compile per distinct count.

    Sequential single-page form; the CLI walker itself goes through
    `eval.serve.serve_pages`, which pipelines the device predict against the
    host load/paste of neighboring pages (same per-page results)."""
    job = PageJob(img_path, anno_path, mask_path, name)
    page = load_page(job, img_size)
    if page["images"].shape[0] == 0:
        print(f"{name}: no bubbles found")
        return
    paste_page(job, page, predict(page["images"]), res_output)
    print(f"{name}: {page['images'].shape[0]} bubbles → {res_output}/{name}.png")


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU manga-page BE inference")
    parser.add_argument("--path", type=str, dest="path", required=True,
                        help="manga root folder (manga/episode/chapter layout)")
    parser.add_argument("--anno_path", type=str, dest="anno_path", default=None)
    parser.add_argument("--model_path", type=str, dest="model_path", default=None)
    parser.add_argument("--debug", action="store_true", dest="debug")
    parser.add_argument("--gpu", type=int, dest="gpu", default=0)  # ignored
    parser.add_argument("--img_size", type=int, dest="img_size", default=512)
    parser.add_argument("--res_output", type=str, dest="res_output",
                        default="./results/manga")
    parser.add_argument("--dtype", type=str, dest="dtype", default="float32",
                        choices=("float32", "f32", "bfloat16", "bf16"),
                        help="serving compute dtype (bf16 halves HBM traffic; "
                             "the pasted masks are 0.5-thresholded either way)")
    args = parser.parse_args(argv)

    if not args.debug and not args.model_path:
        parser.error("--model_path required unless --debug")
    makedirs(args.res_output)
    model, state = load_be_state(None if args.debug else args.model_path,
                                 args.img_size)
    # Bit-packed bucketed serving: the paste routes threshold at 0.5, so the
    # device ships 1 bit/pixel instead of f32 probabilities (32x less
    # device→host traffic — the dominant page-serve cost on this runtime).
    predict = make_packed_be_predict(model, state, args.img_size,
                                     compute_dtype=resolve_dtype(args.dtype))

    jobs = []
    for manga in sorted(os.listdir(args.path)):
        m_path = os.path.join(args.path, manga)
        if not os.path.isdir(m_path):
            continue
        for epi in sorted(os.listdir(m_path)):
            e_path = os.path.join(m_path, epi)
            for chapter in sorted(os.listdir(e_path)):
                c_path = os.path.join(e_path, chapter, "OriginSizeManga")
                if not os.path.isdir(c_path):
                    continue
                # mask route source: sibling OriginSizeBubbles dir
                # (reference main_mask, test_BE_manga.py:386-396)
                b_path = os.path.join(e_path, chapter, "OriginSizeBubbles")
                for pagef in sorted(os.listdir(c_path)):
                    img_path = os.path.join(c_path, pagef)
                    stem = pagef.split(".")[0]
                    anno = None
                    if args.anno_path:
                        cand = os.path.join(args.anno_path, manga, epi, chapter,
                                            f"{stem}.json")
                        anno = cand if os.path.exists(cand) else None
                    mask = None
                    if anno is None:
                        cand = os.path.join(b_path, pagef)
                        mask = cand if os.path.exists(cand) else None
                        if mask is None:
                            continue
                    jobs.append(PageJob(img_path, anno, mask,
                                        f"{manga}_{epi}_{chapter}_{stem}"))
    serve_pages(predict, jobs, args.img_size, args.res_output)


if __name__ == "__main__":
    main()
