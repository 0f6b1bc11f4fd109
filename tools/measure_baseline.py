"""Measure the reference (kungyao/vae-play) VAE-GAN train-step throughput on CPU.

The reference hardcodes CUDA (`.cuda(...)` on modules/tensors, networks.py:241);
this harness imports it read-only from /root/reference with a device shim so the
exact reference training computation (forward + 5 retained backwards + 4
RMSprop steps, train.py:43-78) runs on CPU torch.  The resulting images/sec is
the BASELINE.md number that bench.py reports `vs_baseline` against.

Usage: python tools/measure_baseline.py [--img_size 256] [--batch 16] [--steps 5]
"""

import argparse
import json
import sys
import time

import torch
import torch.nn.functional as F

REFERENCE = "/root/reference"


def install_cpu_shim():
    """Make .cuda() a no-op so the CUDA-hardcoded reference runs on CPU."""
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img_size", type=int, default=256)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--zdim", type=int, default=128)
    args = p.parse_args()

    install_cpu_shim()
    sys.path.insert(0, REFERENCE)
    from models.networks import VaeGan  # reference import, read-only

    torch.manual_seed(0)
    vae = VaeGan(args.img_size, args.zdim, num_of_param=3)
    lr = 1e-4
    optims = [
        torch.optim.RMSprop(vae.encoder.parameters(), lr=lr),
        torch.optim.RMSprop(vae.decoder.parameters(), lr=lr),
        torch.optim.RMSprop(vae.discriminator.parameters(), lr=lr),
        torch.optim.RMSprop(vae.param_encoder.parameters(), lr=lr),
    ]

    imgs = torch.rand(args.batch, 1, args.img_size, args.img_size)
    targets = torch.randn(args.batch, 3)

    def one_step():
        b = imgs.size(0)
        x_tilde, disc_class, disc_layer, mus, log_variances, params = vae(imgs)
        dlo, dlp = disc_layer[:b], disc_layer[b:-b]
        dco, dcp, dcs = disc_class[:b], disc_class[b:-b], disc_class[-b:]
        nle, kl, mse, bdo, bdp, bds, l1 = VaeGan.loss(
            imgs, x_tilde, dlo, dlp, disc_layer[-b:], dco, dcp, dcs,
            mus, log_variances, targets, params)
        lambda_mse = 1e-6
        loss_recon = F.mse_loss(imgs, x_tilde)
        loss_encoder = torch.sum(kl) + torch.sum(mse)
        loss_discriminator = torch.sum(bdo) + torch.sum(bdp) + torch.sum(bds)
        loss_decoder = torch.sum(lambda_mse * mse) - (1.0 - lambda_mse) * loss_discriminator
        loss_aux = l1
        vae.zero_grad()
        loss_recon.backward(retain_graph=True)
        loss_encoder.backward(retain_graph=True)
        loss_decoder.backward(retain_graph=True)
        loss_discriminator.backward(retain_graph=True)
        loss_aux.backward()
        for o in optims:
            o.step()

    one_step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.steps):
        one_step()
    dt = time.perf_counter() - t0
    ips = args.steps * args.batch / dt
    print(json.dumps({
        "workload": f"vae_gan_train_step_{args.img_size}px_bs{args.batch}",
        "device": "cpu (torch reference)",
        "images_per_sec": round(ips, 3),
        "sec_per_step": round(dt / args.steps, 4),
    }))


if __name__ == "__main__":
    main()
