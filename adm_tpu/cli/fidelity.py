"""`fidelity`-compatible CLI: on-device FID/ISC/KID between image folders.

The reference shells out to the pip `fidelity` CLI for evaluation
(`train_uncond_dpm.py:363-365`, `sample_uncond.py:177-180`:
`fidelity -g 0 -f -i -b <batch> --input1 <dir> --input2 <dir>`). This is
the drop-in surface, computed fully on the TPU (metrics/metric.py) —
short flags match torch-fidelity's (-f fid, -i isc, -k kid, -b batch).

Usage:
    python -m adm_tpu.cli.fidelity -f -i -b 128 --input1 samples/ --input2 data/
Inception weights: --weights or ADM_TPU_INCEPTION_WEIGHTS (converted
torch-fidelity weights-inception-2015-12-05; see metrics/inception.py).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input1", required=True, help="first image folder")
    p.add_argument("--input2", default=None, help="second image folder")
    p.add_argument("-f", "--fid", action="store_true")
    p.add_argument("-i", "--isc", action="store_true")
    p.add_argument("-k", "--kid", action="store_true")
    p.add_argument("-b", "--batch-size", type=int, default=128)
    p.add_argument("-g", "--gpu", default=None,
                   help="accepted for command-line compatibility; ignored "
                        "(device selection is JAX's)")
    p.add_argument("--weights", default=None,
                   help="converted InceptionV3 weights (.npz or raw .pth)")
    p.add_argument("--kid-subset-size", type=int, default=1000)
    p.add_argument("--image-size", type=int, default=None,
                   help="optionally resize inputs (HxW square) before scoring")
    args = p.parse_args(argv)

    if not (args.fid or args.isc or args.kid):
        args.fid = True
    from adm_tpu.metrics.metric import calculate_metrics

    out = calculate_metrics(
        args.input1,
        args.input2,
        fid=args.fid,
        isc=args.isc,
        kid=args.kid,
        batch_size=args.batch_size,
        weights_path=args.weights,
        image_size=(args.image_size, args.image_size)
        if args.image_size
        else None,
        kid_subset_size=args.kid_subset_size,
    )
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    main()
