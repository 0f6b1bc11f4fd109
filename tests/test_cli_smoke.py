"""--debug smoke tests for every test/inference CLI (VERDICT round-1 item 6):
each CLI must run end to end on its synthetic dataset with an untrained net
(the reference's --debug idiom, test_BE.py:71-75) and write its output files.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow  # excluded from the fast tier (pytest -m 'not slow')


def _pngs(d):
    out = []
    for root, _, files in os.walk(d):
        out += [os.path.join(root, f) for f in files if f.endswith(".png")]
    return out


def test_cli_test_be(tmp_path):
    from vaeplay_tpu.cli import test_be

    out = str(tmp_path / "be")
    test_be.main(["--debug", "--img_size", "64", "--batchsize", "2",
                  "--res_output", out])
    assert _pngs(out), "test_be wrote no grids"


def test_cli_test_bc(tmp_path):
    from vaeplay_tpu.cli import test_bc

    out = str(tmp_path / "bc")
    test_bc.main(["--debug", "--img_size", "64", "--max_points", "32",
                  "--batchsize", "2", "--res_output", out])
    assert _pngs(out), "test_bc wrote no grids"


def test_cli_test_bp(tmp_path):
    from vaeplay_tpu.cli import test_bp

    out = str(tmp_path / "bp")
    test_bp.main(["--debug", "--img_size", "64", "--batchsize", "2",
                  "--res_output", out])
    assert _pngs(out), "test_bp wrote no grids"


def test_cli_test_bcp(tmp_path):
    from vaeplay_tpu.cli import test_bcp

    out = str(tmp_path / "bcp")
    test_bcp.main(["--debug", "--img_size", "64", "--max_points", "64",
                   "--batchsize", "2", "--res_output", out])
    assert _pngs(out), "test_bcp wrote no grids"


def test_cli_test_be_font(tmp_path):
    from vaeplay_tpu.cli import test_be_font

    out = str(tmp_path / "font")
    test_be_font.main(["--debug", "--img_size", "64", "--batchsize", "2",
                       "--res_output", out])
    assert _pngs(out), "test_be_font wrote no grids"


def test_cli_test_datasets(tmp_path):
    from vaeplay_tpu.cli import test_datasets

    out = str(tmp_path / "viz")
    test_datasets.main(["--out", out, "--img_size", "64", "--batchsize", "2"])
    assert _pngs(out), "test_datasets wrote no visualizations"


@pytest.fixture()
def manga_tree(tmp_path):
    """Tiny manga/episode/chapter tree with one page, a coarse-bubble mask
    (mask route) and a labelme annotation (annotation route)."""
    page_dir = tmp_path / "pages" / "MangaA" / "ep1" / "ch1" / "OriginSizeManga"
    bub_dir = tmp_path / "pages" / "MangaA" / "ep1" / "ch1" / "OriginSizeBubbles"
    anno_dir = tmp_path / "annos" / "MangaA" / "ep1" / "ch1"
    for d in (page_dir, bub_dir, anno_dir):
        os.makedirs(d)
    h = w = 256
    rng = np.random.default_rng(0)
    page = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
    # one elliptical bubble
    ys, xs = np.mgrid[0:h, 0:w]
    bub = (((xs - 120.0) / 60.0) ** 2 + ((ys - 110.0) / 45.0) ** 2) <= 1.0
    page[bub] = 255
    Image.fromarray(page).save(page_dir / "p0.png")
    # coarse mask: ch0 = bubble, ch1 = label id (1 = Oval)
    mask = np.zeros((h, w, 3), np.uint8)
    mask[bub, 0] = 255
    mask[bub, 1] = 1
    Image.fromarray(mask).save(bub_dir / "p0.png")
    anno = {
        "imageWidth": w, "imageHeight": h,
        "shapes": [{
            "label": "Bubble-Boundary", "sub_label": "Oval",
            "points": [[55, 60], [185, 160]],
        }],
    }
    with open(anno_dir / "p0.json", "w") as f:
        json.dump(anno, f)
    return str(tmp_path / "pages"), str(tmp_path / "annos")


def test_cli_test_be_manga_annotation_route(manga_tree, tmp_path):
    from vaeplay_tpu.cli import test_be_manga

    pages, annos = manga_tree
    out = str(tmp_path / "manga_anno")
    test_be_manga.main(["--debug", "--path", pages, "--anno_path", annos,
                        "--img_size", "64", "--res_output", out])
    results = _pngs(out)
    assert results, "annotation route wrote no page"
    rgb = np.asarray(Image.open(results[0]))
    assert rgb.shape == (256, 256, 3)


def test_cli_test_be_manga_mask_route(manga_tree, tmp_path):
    """No --anno_path → the connected-components mask route must dispatch
    (round-1 gap: this path was unreachable from the CLI)."""
    from vaeplay_tpu.cli import test_be_manga

    pages, _ = manga_tree
    out = str(tmp_path / "manga_mask")
    test_be_manga.main(["--debug", "--path", pages,
                        "--img_size", "64", "--res_output", out])
    results = _pngs(out)
    assert results, "mask route wrote no page"
    rgb = np.asarray(Image.open(results[0]))
    assert rgb.shape == (256, 256, 3)
    # the content channel (file RED, matching the reference's cv2-written
    # PNG and load_manga_from_mask's read) must carry the coarse bubble region
    assert (rgb[..., 0] == 255).sum() > 100


def test_cli_test_be_gan_manga(manga_tree, tmp_path):
    from vaeplay_tpu.cli import test_be_gan_manga

    pages, annos = manga_tree
    out = str(tmp_path / "manga_gan")
    test_be_gan_manga.main(["--debug", "--path", pages, "--anno_path", annos,
                            "--img_size", "64", "--res_output", out])
    assert _pngs(out), "be_gan manga route wrote no page"


@pytest.fixture()
def bubble_patch_tree(tmp_path):
    """Two tiny class-folder trees: a BC tree (`a` + `a_edge/_mask/
    _mask_edge`, BCDataset dataset.py:236-240 — its scanner treats ANY
    file without a mask/edge/bubble token as a base patch, so `_layer`
    files cannot share the tree) and a BP/BCP tree (`a` + `a_mask2` +
    `a_layer`, BPDatasetTEST/BCPDatasetTEST dataset.py:421-460, 641-688).
    Returns (bc_root, bp_root)."""
    h = w = 64
    ys, xs = np.mgrid[0:h, 0:w]
    disk = (((xs - 32.0) / 18.0) ** 2 + ((ys - 30.0) / 14.0) ** 2) <= 1.0
    inner = (((xs - 32.0) / 15.0) ** 2 + ((ys - 30.0) / 11.0) ** 2) <= 1.0
    ring = disk & ~inner
    gray = np.where(disk, 255, 40).astype(np.uint8)
    layer = np.zeros((h, w, 3), np.uint8)           # ch0 = content, ch1 = edge
    layer[disk, 0] = 255
    layer[ring, 1] = 255
    for cls in ("2", "3"):
        d = tmp_path / "data_bc" / cls
        os.makedirs(d)
        Image.fromarray(gray).save(d / "a.png")
        Image.fromarray(gray).save(d / "a_edge.png")
        Image.fromarray(layer).save(d / "a_mask.png")
        Image.fromarray(layer).save(d / "a_mask_edge.png")
        d = tmp_path / "data_bp" / cls
        os.makedirs(d)
        Image.fromarray(gray).save(d / "a.png")
        Image.fromarray(gray).save(d / "a_mask2.png")
        Image.fromarray(layer).save(d / "a_layer.png")
    return str(tmp_path / "data_bc"), str(tmp_path / "data_bp")


def test_cli_test_bc_walker(bubble_patch_tree, tmp_path):
    from vaeplay_tpu.cli import test_bc

    out = str(tmp_path / "bc_walk")
    test_bc.main(["--debug", "--path", bubble_patch_tree[0], "--img_size", "64",
                  "--max_points", "32", "--batchsize", "2",
                  "--res_output", out])
    assert _pngs(out), "bc walker wrote no grids"


def test_cli_test_bp_walker(bubble_patch_tree, tmp_path):
    from vaeplay_tpu.cli import test_bp

    out = str(tmp_path / "bp_walk")
    test_bp.main(["--debug", "--path", bubble_patch_tree[1], "--img_size", "64",
                  "--batchsize", "2", "--res_output", out])
    assert _pngs(out), "bp walker wrote no grids"


def test_cli_test_bcp_walker(bubble_patch_tree, tmp_path):
    from vaeplay_tpu.cli import test_bcp

    out = str(tmp_path / "bcp_walk")
    test_bcp.main(["--debug", "--path", bubble_patch_tree[1], "--img_size", "64",
                   "--max_points", "64", "--batchsize", "2",
                   "--res_output", out])
    assert _pngs(out), "bcp walker wrote no grids"


def test_cli_test_be_font_walker(tmp_path):
    from vaeplay_tpu.cli import test_be_font

    kana_dir = tmp_path / "kana"
    os.makedirs(kana_dir)
    rng = np.random.default_rng(3)
    for i in range(2):
        img = np.full((40, 32), 255, np.uint8)
        img[8:30, 6 + 4 * i : 12 + 4 * i] = 0  # a fat stroke
        Image.fromarray(img).save(kana_dir / f"k{i}.png")
    out = str(tmp_path / "font_walk")
    test_be_font.main(["--debug", "--path", str(kana_dir), "--img_size", "64",
                       "--batchsize", "2", "--res_output", out])
    assert _pngs(out), "be_font walker wrote no grids"
