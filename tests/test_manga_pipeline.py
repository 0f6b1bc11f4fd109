"""End-to-end manga-page pipeline test: synthetic page → crops → paste-back."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from vaeplay_tpu.eval.manga import (
    load_manga_from_annotation, load_manga_from_mask, paste_result_on_manga,
)

pytestmark = pytest.mark.slow  # excluded from the fast tier (pytest -m 'not slow')


@pytest.fixture
def synthetic_page(tmp_path):
    """A 256x256 page with two bubble regions + coarse mask + labelme anno."""
    h = w = 256
    img = np.full((h, w, 3), 200, np.uint8)
    mask = np.full((h, w, 3), 255, np.uint8)  # white bg → cleared

    def add_bubble(cx, cy, r, label):
        yy, xx = np.mgrid[0:h, 0:w]
        inside = (xx - cx) ** 2 + (yy - cy) ** 2 <= r * r
        img[inside] = 255
        mask[inside] = (255, label, 0)

    add_bubble(70, 80, 30, 1)
    add_bubble(180, 170, 25, 2)
    img_path = str(tmp_path / "page.png")
    mask_path = str(tmp_path / "mask.png")
    Image.fromarray(img).save(img_path)
    Image.fromarray(mask).save(mask_path)
    anno = {
        "imageWidth": w, "imageHeight": h,
        "shapes": [
            {"label": "Bubble-Boundary", "points": [[40, 50], [100, 110]],
             "sub_label": "Oval"},
            {"label": "Bubble-Boundary", "points": [[155, 145], [205, 195]],
             "sub_label": "NoFrame"},
        ],
    }
    anno_path = str(tmp_path / "page.json")
    with open(anno_path, "w") as f:
        json.dump(anno, f)
    return img_path, mask_path, anno_path, tmp_path


def test_load_from_mask(synthetic_page):
    img_path, mask_path, _, _ = synthetic_page
    page = load_manga_from_mask(img_path, mask_path, 64)
    assert page["images"].shape == (2, 64, 64, 3)
    assert set(page["labels"].tolist()) == {1, 2}
    assert page["boxes"].shape == (2, 4)


def test_load_from_annotation(synthetic_page):
    img_path, _, anno_path, _ = synthetic_page
    page = load_manga_from_annotation(img_path, anno_path, 64)
    assert page["images"].shape == (2, 64, 64, 3)
    assert page["labels"].tolist() == [1, 3]  # Oval=1, NoFrame=3
    assert page["original_boxes"].shape == (2, 4)


def test_paste_result_roundtrip(synthetic_page):
    img_path, mask_path, _, tmp_path = synthetic_page
    page = load_manga_from_mask(img_path, mask_path, 64)
    b = page["images"].shape[0]
    # fake predictions: central disc as mask, ring as edge
    yy, xx = np.mgrid[0:64, 0:64]
    d = (xx - 32) ** 2 + (yy - 32) ** 2
    masks = np.broadcast_to((d < 20**2).astype(np.float32)[None, :, :, None],
                            (b, 64, 64, 1))
    edges = np.broadcast_to(((d >= 20**2) & (d < 24**2)).astype(np.float32)[None, :, :, None],
                            (b, 64, 64, 1))
    out = paste_result_on_manga(img_path, page, masks, edges,
                                str(tmp_path), "result")
    assert os.path.exists(tmp_path / "result.png")
    assert out.shape == (256, 256, 3)
    # background stays white; content paints the file's RED channel (the
    # reference writes [edge, class, content] through cv2/BGR, so its PNG —
    # and load_manga_from_mask's red-channel read — put content at index 0)
    assert (out[0, 0] == 255).all()
    painted = (out[:, :, 0] == 255) & (out[:, :, 2] == 0)
    assert painted.sum() > 100
    # class channel carries the bubble label where painted
    labels_present = set(np.unique(out[:, :, 1][painted]).tolist())
    assert labels_present <= {1, 2}
    # file-level contract: the written PNG must be consumable by
    # load_manga_from_mask (red-channel content read, ref test_BE_manga.py:231)
    reloaded = load_manga_from_mask(img_path, str(tmp_path / "result.png"), 64)
    assert reloaded["images"].shape[0] >= 1
    assert set(reloaded["labels"].tolist()) <= {1, 2}


def test_paste_noframe_uses_dilated_box(synthetic_page):
    img_path, _, anno_path, tmp_path = synthetic_page
    page = load_manga_from_annotation(img_path, anno_path, 64)
    b = page["images"].shape[0]
    masks = np.zeros((b, 64, 64, 1), np.float32)  # predictions empty
    edges = np.zeros((b, 64, 64, 1), np.float32)
    out = paste_result_on_manga(img_path, page, masks, edges,
                                str(tmp_path), "result2")
    # the NoFrame bubble (label 3) must still paint via its dilated box
    painted = (out[:, :, 1] == 3)
    assert painted.sum() > 100


def test_serve_pages_matches_sequential(synthetic_page, tmp_path_factory):
    """The pipelined walker (eval/serve.py) must write byte-identical pages
    to the sequential per-page path, for both the annotation route and the
    connected-components mask route."""
    from vaeplay_tpu.cli.test_be_manga import process_page
    from vaeplay_tpu.eval.serve import PageJob, serve_pages

    img_path, mask_path, anno_path, _ = synthetic_page
    rng = np.random.default_rng(0)

    def predict(imgs):
        n = imgs.shape[0]
        r = np.random.default_rng(n)  # deterministic per batch shape
        return {"masks": (r.uniform(0, 1, (n, 64, 64, 1)) > 0.4).astype(np.float32),
                "edges": (r.uniform(0, 1, (n, 64, 64, 1)) > 0.6).astype(np.float32)}

    jobs = [
        PageJob(img_path, anno_path, None, "anno_route"),
        PageJob(img_path, None, mask_path, "mask_route"),
        PageJob(img_path, anno_path, None, "anno_route_2"),
    ]
    seq_dir = str(tmp_path_factory.mktemp("seq"))
    pipe_dir = str(tmp_path_factory.mktemp("pipe"))
    for j in jobs:
        process_page(predict, j.img_path, j.anno_path, j.mask_path, 64,
                     seq_dir, j.name)
    n = serve_pages(predict, jobs, 64, pipe_dir, verbose=False)
    assert n.written == len(jobs)
    assert (n.empty, n.failed) == (0, 0)
    for j in jobs:
        a = np.asarray(Image.open(os.path.join(seq_dir, f"{j.name}.png")))
        b = np.asarray(Image.open(os.path.join(pipe_dir, f"{j.name}.png")))
        np.testing.assert_array_equal(a, b)


def test_serve_pages_skips_bad_pages(synthetic_page, tmp_path_factory):
    from vaeplay_tpu.eval.serve import PageJob, serve_pages

    img_path, mask_path, anno_path, _ = synthetic_page

    def predict(imgs):
        n = imgs.shape[0]
        return {"masks": np.ones((n, 64, 64, 1), np.float32),
                "edges": np.zeros((n, 64, 64, 1), np.float32)}

    out = str(tmp_path_factory.mktemp("skip"))
    jobs = [
        PageJob("/nonexistent/page.png", anno_path, None, "bad"),
        PageJob(img_path, anno_path, None, "good"),
    ]
    n = serve_pages(predict, jobs, 64, out, verbose=False)
    # the breakdown distinguishes failed pages from empty ones (round-2
    # ADVICE: the old scalar return conflated them)
    assert (n.written, n.empty, n.failed) == (1, 0, 1)
    assert os.path.exists(os.path.join(out, "good.png"))
    assert not os.path.exists(os.path.join(out, "bad.png"))


class _ImmediateTracer:
    """Mimics BridgeTracer.submit with a synchronous 'worker': the trace
    result is computed eagerly and wrapped in a resolved Future."""

    def __init__(self, log):
        self.log = log

    def submit(self, packed):
        from concurrent.futures import Future

        self.log.append(("trace", packed))
        f = Future()
        f.set_result((packed * 10, packed))  # (pts, counts) stand-ins
        return f


def test_pipeline_bc_batches_matches_sequential_and_overlaps():
    """eval/serve.pipeline_bc_batches must (a) yield exactly the sequential
    loop's (batch, refine(batch, trace(mask(batch)))) results in order, and
    (b) actually skew the stages: mask(i+1) is dispatched before refine(i),
    so the host trace of batch i can overlap device work."""
    from vaeplay_tpu.eval.serve import pipeline_bc_batches

    for n in (0, 1, 2, 5):
        log = []
        tracer = _ImmediateTracer(log)

        def dispatch_mask(x):
            log.append(("mask", x))
            return x

        def dispatch_refine(x, pts, counts):
            log.append(("refine", x))
            return ("refined", x, pts, counts)

        batches = list(range(n))
        got = list(pipeline_bc_batches(dispatch_mask, tracer.submit,
                                       dispatch_refine, batches))
        assert got == [(x, ("refined", x, x * 10, x)) for x in batches]
        mask_pos = {x: i for i, (op, x) in enumerate(log) if op == "mask"}
        refine_pos = {x: i for i, (op, x) in enumerate(log) if op == "refine"}
        for x in batches[:-1]:
            # the skew: the NEXT batch's mask dispatch precedes this refine
            assert mask_pos[x + 1] < refine_pos[x]
