"""One-stop weight conversion CLI.

Converts torch-side weights into adm_tpu npz trees:

  # reference trainer checkpoint (model-<N>.pt) -> EDMPrecond params
  python -m adm_tpu.cli.convert_weights ddm-checkpoint model-80.pt out.npz [--no-ema]

  # CompVis / reference AutoencoderKL checkpoint -> VAE params
  python -m adm_tpu.cli.convert_weights vae kl-f4.ckpt out.npz

  # torch-fidelity InceptionV3 .pth -> FID feature extractor params
  python -m adm_tpu.cli.convert_weights inception weights-inception-*.pth out.npz

  # torchvision vgg16 state_dict .pth -> LPIPS backbone params
  python -m adm_tpu.cli.convert_weights vgg16 vgg16.pth out.npz

Backbones (torchvision .pth of swin_b / resnet101 / efficientnet_b7):
  python -m adm_tpu.cli.convert_weights swin_b swin_b.pth out.npz

Load the npz via np.load(..., allow_pickle=True)['params'].item() or the
dedicated loaders (metrics.metric.load_inception_params, metrics.lpips.
build_lpips_params with ADM_TPU_VGG16_WEIGHTS).
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser(description="convert torch weights to adm_tpu npz")
    p.add_argument("kind", choices=["ddm-checkpoint", "vae", "inception", "vgg16",
                                    "clip",
                                    "swin_b", "resnet101", "efficientnet_b7"])
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--no-ema", action="store_true",
                   help="ddm-checkpoint: use online weights instead of EMA")
    args = p.parse_args()

    import torch

    if args.kind == "ddm-checkpoint":
        from adm_tpu.utils.torch_convert import convert_reference_checkpoint

        tree = convert_reference_checkpoint(args.src, use_ema=not args.no_ema)
    elif args.kind == "vae":
        from adm_tpu.utils.torch_convert import convert_autoencoder_kl

        sd = torch.load(args.src, map_location="cpu")
        for key in ("state_dict", "model"):
            if isinstance(sd, dict) and key in sd:
                sd = sd[key]
        tree = convert_autoencoder_kl(sd)
    elif args.kind == "inception":
        from adm_tpu.metrics.inception import convert_inception

        tree = convert_inception(torch.load(args.src, map_location="cpu"))
    elif args.kind == "clip":
        from adm_tpu.nn.text_encoder import convert_clip_text

        sd = torch.load(args.src, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        tree = {"params": convert_clip_text(sd)}
    elif args.kind == "vgg16":
        from adm_tpu.metrics.lpips import convert_vgg16_features

        sd = torch.load(args.src, map_location="cpu")
        if "state_dict" in sd:
            sd = sd["state_dict"]
        tree = {"params": convert_vgg16_features(sd)}
    else:  # swin_b / resnet101 / efficientnet_b7
        from adm_tpu.utils import backbone_convert

        sd = torch.load(args.src, map_location="cpu")
        for key in ("state_dict", "model"):
            if isinstance(sd, dict) and key in sd:
                sd = sd[key]
        converter = getattr(backbone_convert, f"convert_{args.kind}")
        tree = {"params": converter(sd)}

    np.savez(args.dst, params=np.array(tree["params"], dtype=object))
    n = sum(
        leaf.size
        for leaf in _leaves(tree["params"])
    )
    print(f"wrote {args.dst}: {n:,} parameters")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield np.asarray(tree)


if __name__ == "__main__":
    main()
