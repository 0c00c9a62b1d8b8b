#!/usr/bin/env python
"""HBM-traffic floor for the spatial linear-attention pool at the bench
shape — the companion to scripts/conv_pool_roofline.py, so every pool of
the measured forward (temporal / conv / linear) has a written floor
argument.

The round-3 attribution (scripts/breakdown_probe.py) measured the linear
pool at 31.6 ms of the 119.9 ms CFG-folded batch-8 forward, with the
merged-heads fused kernel (ops/pallas/fused_linear_block.py) ON at all
levels. This script counts the pool's HBM tensor traffic pass by pass:

- FLOOR: each block must read its input once and write its output once
  (weights are KB-scale; the per-head d x d context matrices, softmax
  tables and cond tokens live in VMEM) -> 2 C-passes per block.
- SHIPPED plan: the merged kernel splits into a stats kernel (reads x,
  accumulates ctx/z in VMEM) and an apply kernel (re-reads x, recomputes
  LN+q in registers, writes the projected output), then XLA adds the
  residual (out + x) as a fusion on the write -> 3 C-passes + the
  residual's extra x read.
- The one remaining traffic idea — persisting q from the stats kernel to
  skip the apply kernel's x re-read — LOSES at the dominant level: q is
  (N, heads*dim_head = 256) vs x (N, 64) at level 0, i.e. the saved read
  is replaced by a 4x bigger write+read. At dim 512 the trade flips, but
  that level carries ~3% of the pool's bytes.

Block placement counted (models/unet3d.py:1055-1120, mirroring
vddp.py:574-713): one SpatialLinearAttention per down/up level when
use_sparse_linear_attn, at (dim_out downs, dim_in ups); the mid spatial
attention is FULL attention and belongs to neither this pool nor this
count. All activations bf16; bandwidth defaults to the MEASURED relay
streaming rate (BENCH_NOTES.md: ~51 GB/s, 1/16 of v5e spec) — divide the
floors by 16 for a full-bandwidth chip.
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8, help="CFG-folded batch")
    p.add_argument("--frames", type=int, default=11)
    p.add_argument("--image-size", type=int, default=96)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--mults", default="1,2,4,8")
    p.add_argument("--gbps", type=float, default=51.0,
                   help="measured HBM streaming GB/s (relay)")
    p.add_argument("--measured-ms", type=float, default=31.6,
                   help="measured pool time (breakdown_probe.py)")
    args = p.parse_args()

    B, F = args.batch, args.frames
    mults = [int(m) for m in args.mults.split(",")]
    dims = [args.dim * m for m in mults]

    def mb(h, c):  # one bf16 activation pass, frames folded into batch
        return B * F * h * h * c * 2 / 1e6

    # (label, H, C) for every linear-attention block: down level i at
    # dim_out = dims[i], resolution H/2^i; up level j at dim_in =
    # reversed([init_dim, *dims])[j+1] — which works out to the same
    # (H, C) multiset as the downs for the reference's dim_mults.
    blocks = []
    h = args.image_size
    for i, c in enumerate(dims):
        blocks.append((f"down_{i}", h, c))
        if i < len(dims) - 1:
            h //= 2
    h = args.image_size // (2 ** (len(dims) - 1))
    up_dims = [args.dim] + dims[:-1]          # dim_in per up level, deepest first
    for j, c in enumerate(reversed(up_dims)):
        blocks.append((f"up_{j}", h, c))
        if j < len(dims) - 1:
            h *= 2

    floor_mb = shipped_mb = 0.0
    print(f"{'block':>8} {'H':>4} {'C':>4} {'1 pass (MB)':>12}")
    for label, hh, c in blocks:
        one = mb(hh, c)
        print(f"{label:>8} {hh:>4} {c:>4} {one:>12.1f}")
        floor_mb += 2 * one          # read x + write out
        shipped_mb += 4 * one        # stats read + apply read + write
        #                              + residual x read (add fused on write)

    t_floor = floor_mb / args.gbps
    t_ship = shipped_mb / args.gbps
    print(f"\nblocks: {len(blocks)}  (all-bf16, B={B} CFG-folded, F={F})")
    print(f"FLOOR  (2 passes/block): {floor_mb:8.0f} MB -> "
          f"{t_floor:6.1f} ms @ {args.gbps:.0f} GB/s")
    print(f"SHIPPED(4 passes/block): {shipped_mb:8.0f} MB -> "
          f"{t_ship:6.1f} ms @ {args.gbps:.0f} GB/s")
    print(f"measured pool: {args.measured_ms:.1f} ms = "
          f"{args.measured_ms / t_floor:.2f}x floor, "
          f"{args.measured_ms / t_ship:.2f}x shipped-plan traffic")
    spec = args.gbps * 16
    print(f"spec-bandwidth floor ({spec:.0f} GB/s): "
          f"{floor_mb / spec:.1f} ms")


if __name__ == "__main__":
    main()
