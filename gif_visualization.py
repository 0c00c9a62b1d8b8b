#!/usr/bin/env python
"""Publication-style rendering of prediction/FEM GIFs (reference
gif_visualization.py parity, as a CLI).

Generates '<path>/visualization_<row>-<col>/' with jet-colormapped RGBA GIFs
and the pixel-estimated stress-strain curve CSV.
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path", required=True,
                   help="directory containing prediction_channel_*.gif")
    p.add_argument("--frame-ranges", required=True,
                   help="frame_range_data.csv (training data) or the FEM "
                        "run's frame_range.csv")
    p.add_argument("--ref-frame", default="lagrangian",
                   choices=["lagrangian", "eulerian"])
    p.add_argument("--row", type=int, default=0,
                   help="conditioning index (grid row)")
    p.add_argument("--col", type=int, default=0,
                   help="prediction index (grid column)")
    p.add_argument("--atol", type=float, default=0.02)
    args = p.parse_args(argv)

    from videometamaterials_tpu.postproc.visualization import (
        create_visualization,
    )

    path = args.path if args.path.endswith("/") else args.path + "/"
    out = create_visualization(path, args.frame_ranges, args.row, args.col,
                               ref_frame=args.ref_frame, atol=args.atol)
    print(f"visualization written to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
