#!/usr/bin/env python
"""Pre-build the packed dataset cache and print dataset statistics.

Run once after placing the reference-format data under
data/<frame>/{training,validation}; training afterwards starts instantly.
Can also generate a synthetic GRF dataset for smoke runs (--synthetic N).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-root", default="./data")
    p.add_argument("--reference-frame", default="lagrangian",
                   choices=["lagrangian", "eulerian"])
    p.add_argument("--image-size", type=int, default=96)
    p.add_argument("--num-frames", type=int, default=11)
    p.add_argument("--selected-channels", type=int, nargs="+",
                   default=[0, 1, 3])
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic training samples first")
    p.add_argument("--synthetic-val", type=int, default=0)
    p.add_argument("--rebuild", action="store_true")
    args = p.parse_args(argv)

    from videometamaterials_tpu.data.dataset import VideoDataset

    root = Path(args.data_root) / args.reference_frame
    if args.synthetic:
        from videometamaterials_tpu.data.synthetic import (
            make_synthetic_dataset,
        )
        make_synthetic_dataset(root / "training", args.synthetic,
                               args.image_size, args.num_frames, seed=0)
        make_synthetic_dataset(root / "validation",
                               args.synthetic_val or max(args.synthetic // 8,
                                                         1),
                               args.image_size, args.num_frames, seed=1)
        print(f"synthetic data written under {root}")

    for split in ("training", "validation"):
        folder = root / split
        if not folder.exists():
            print(f"skip {split}: {folder} missing")
            continue
        ds = VideoDataset(folder, args.image_size,
                          selected_channels=args.selected_channels,
                          num_frames=args.num_frames, per_frame_cond=True,
                          reference_frame=args.reference_frame,
                          rebuild_cache=args.rebuild)
        v, l = ds[0]
        print(f"{split}: {len(ds)} samples, video {v.shape} "
              f"[{v.min():.3f},{v.max():.3f}], labels {ds.labels.shape}, "
              f"zero_u_2={ds.zero_u_2}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
