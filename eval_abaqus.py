#!/usr/bin/env python
"""FEM verification entry point (reference eval_abaqus.py parity, as a CLI).

Runs Abaqus CAE on a generated geometry (or a fresh GRF sample) and converts
the solver's per-frame field CSVs to channel GIFs + frame_range.csv.
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--samples-path",
                   default="runs/pretrained/eval_target_w_5.0_0/step_200000/")
    p.add_argument("--sample-index", type=int, default=0)
    p.add_argument("--sample-grf", action="store_true",
                   help="evaluate a random GRF geometry instead")
    p.add_argument("--no-gifs", action="store_true")
    p.add_argument("--gif-reference-frame", default="eulerian",
                   choices=["eulerian", "lagrangian"])
    p.add_argument("--pixels", type=int, default=48)
    args = p.parse_args(argv)

    from videometamaterials_tpu.fem.eval_abaqus import evaluate_sample

    evaluate_sample(
        samples_path=args.samples_path,
        sample_index=args.sample_index,
        sample_grf=args.sample_grf,
        create_gifs=not args.no_gifs,
        gif_reference_frame=args.gif_reference_frame,
        pixels=args.pixels,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
