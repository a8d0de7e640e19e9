"""FID CLI — equivalent of /root/reference/evaluation.py.

    python -m kidney_diffusion_tpu.cli.evaluation path/to/real path/to/fake \
        [--batch-size 50] [--inception-weights fid_inception.npz]
    python -m kidney_diffusion_tpu.cli.evaluation --save-stats path out.npz
"""

from __future__ import annotations

import argparse

from ..eval.fid import calculate_fid_given_paths, save_statistics


def main():
    p = argparse.ArgumentParser()
    p.add_argument("path", type=str, nargs=2,
                   help="two image dirs (or .npz stats files) to compare; "
                        "with --save-stats: an image dir and the output .npz")
    p.add_argument("--batch-size", type=int, default=50)
    p.add_argument("--dims", type=int, default=2048,
                   help="pool3 is the only supported feature layer")
    p.add_argument("--inception-weights", type=str, default=None,
                   help=".npz converted from the pytorch-fid checkpoint "
                        "(see eval.fid.convert_torch_fid_weights)")
    p.add_argument("--save-stats", action="store_true")
    args = p.parse_args()

    assert args.dims == 2048, "only pool3 (2048) features are implemented"

    if args.save_stats:
        save_statistics(
            args.path[0], args.path[1],
            batch_size=args.batch_size, weights_path=args.inception_weights,
        )
        print(f"stats saved to {args.path[1]}")
        return

    fid = calculate_fid_given_paths(
        tuple(args.path), batch_size=args.batch_size,
        weights_path=args.inception_weights,
    )
    print("FID: ", fid)


if __name__ == "__main__":
    main()
