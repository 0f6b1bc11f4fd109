"""Manga-page inference with the BE_GAN generator — rebuild of reference
test_BE_GAN_manga.py (which reuses test_BE_manga's pipeline with the G net,
test_BE_GAN_manga.py:7,20-33)."""

import argparse
import os

import jax
import jax.numpy as jnp

from vaeplay_tpu.eval.predictor import make_packed_be_predict
from vaeplay_tpu.eval.serve import PageJob, serve_pages
from vaeplay_tpu.models.be_gan import ComposeNet
from vaeplay_tpu.train.checkpoint import Checkpointer
from vaeplay_tpu.train.state import TrainState, frozen_backbone_adam
from vaeplay_tpu.utils.amp import resolve_dtype
from vaeplay_tpu.utils.jitting import jit_init
from vaeplay_tpu.utils.viz import makedirs


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU manga inference (BE_GAN G)")
    parser.add_argument("--path", type=str, dest="path", required=True)
    parser.add_argument("--anno_path", type=str, dest="anno_path", required=True)
    parser.add_argument("--model_path", type=str, dest="model_path", default=None)
    parser.add_argument("--debug", action="store_true", dest="debug")
    parser.add_argument("--gpu", type=int, dest="gpu", default=0)  # ignored
    parser.add_argument("--img_size", type=int, dest="img_size", default=512)
    parser.add_argument("--res_output", type=str, dest="res_output",
                        default="./results/manga_gan")
    parser.add_argument("--dtype", type=str, dest="dtype", default="float32",
                        choices=("float32", "f32", "bfloat16", "bf16"))
    args = parser.parse_args(argv)
    if not args.debug and not args.model_path:
        parser.error("--model_path required unless --debug")
    makedirs(args.res_output)

    model = ComposeNet()
    x = jnp.zeros((1, args.img_size, args.img_size, 3))
    variables = jit_init(model, {"params": jax.random.PRNGKey(0)}, x)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"],
        frozen_backbone_adam(1e-4), constants=variables.get("constants"))
    if args.model_path:
        ck = Checkpointer(args.model_path)
        restored = ck.restore(ck.latest())  # generator subtree (test_BE_GAN_manga.py:20-22)
        g = restored.get("g") or restored["G"]  # new uniform / legacy layout
        state = state.replace(params=g["params"],
                              batch_stats=g["batch_stats"],
                              constants=g.get("constants", state.constants))
    predict = make_packed_be_predict(model, state, args.img_size,
                                     compute_dtype=resolve_dtype(args.dtype))

    jobs = []
    for manga in sorted(os.listdir(args.path)):
        m_path = os.path.join(args.path, manga)
        if not os.path.isdir(m_path):
            continue
        for epi in sorted(os.listdir(m_path)):
            for chapter in sorted(os.listdir(os.path.join(m_path, epi))):
                c_path = os.path.join(m_path, epi, chapter, "OriginSizeManga")
                if not os.path.isdir(c_path):
                    continue
                for pagef in sorted(os.listdir(c_path)):
                    stem = pagef.split(".")[0]
                    anno = os.path.join(args.anno_path, manga, epi, chapter,
                                        f"{stem}.json")
                    if not os.path.exists(anno):
                        continue
                    jobs.append(PageJob(os.path.join(c_path, pagef), anno,
                                        None, f"{manga}_{epi}_{chapter}_{stem}"))
    serve_pages(predict, jobs, args.img_size, args.res_output)


if __name__ == "__main__":
    main()
