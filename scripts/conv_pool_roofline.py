#!/usr/bin/env python
"""HBM-traffic floor for the UNet3D conv/GroupNorm pool at the bench shape.

The round-3 attribution (scripts/breakdown_probe.py) measured the conv pool
at 33.0 ms of the 119.9 ms CFG-folded batch-8 forward. This script counts
the pool's unavoidable HBM tensor traffic op by op (the same arithmetic
that bounded the temporal kernel in BENCH_NOTES round 3) so the ledger can
state how close the measured time is to the memory floor, and how much a
one-pass GroupNorm-statistics fusion could save at most.

Model: every conv reads its input once and writes its output once (weights
are KB-scale, ignored); GroupNorm needs one statistics read of the conv
output (two in the shipped two-pass form if XLA does not fuse mean+var into
one sweep) and one normalize+FiLM+SiLU read->write (the write feeds the
next conv's read, each counted once). All tensors bf16. Bandwidth is the
MEASURED relay streaming rate (BENCH_NOTES.md: ~51 GB/s, 1/16 of v5e spec),
so the floor is for THIS environment; on a full-bandwidth chip divide by 16.

Reference structure being counted: vddp.py:267-311 (Block/ResnetBlock),
:574-713 (level layout), :625-628 (init conv 7x7), :705-709 (final).
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8, help="CFG-folded batch")
    p.add_argument("--frames", type=int, default=11)
    p.add_argument("--image-size", type=int, default=96)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--mults", default="1,2,4,8")
    p.add_argument("--channels", type=int, default=3)
    p.add_argument("--gbps", type=float, default=51.0,
                   help="measured HBM streaming GB/s (relay)")
    p.add_argument("--stats-passes", type=int, default=1, choices=[1, 2],
                   help="GroupNorm statistics reads per norm (2 = separate "
                        "mean and var sweeps, 1 = one-pass/fused)")
    args = p.parse_args()

    B, F = args.batch, args.frames
    mults = [int(m) for m in args.mults.split(",")]
    dims = [args.dim * m for m in mults]

    def mb(h, c):  # bf16 activation tensor, frames folded into batch
        return B * F * h * h * c * 2 / 1e6

    traffic = []  # (label, MB)

    def conv(label, h_in, c_in, h_out, c_out):
        traffic.append((f"{label} conv R", mb(h_in, c_in)))
        traffic.append((f"{label} conv W", mb(h_out, c_out)))

    def gn(label, h, c):
        traffic.append((f"{label} GN stats R", args.stats_passes * mb(h, c)))
        traffic.append((f"{label} GN norm R+W", 2 * mb(h, c)))

    def resnet(label, h, c_in, c_out):
        conv(f"{label}.b1", h, c_in, h, c_out)
        gn(f"{label}.b1", h, c_out)
        conv(f"{label}.b2", h, c_out, h, c_out)
        gn(f"{label}.b2", h, c_out)
        if c_in != c_out:
            conv(f"{label}.skip1x1", h, c_in, h, c_out)
            traffic.append((f"{label}.skip add R+W", 2 * mb(h, c_out)))
        else:
            traffic.append((f"{label}.skip add R+W", 2 * mb(h, c_out)))

    H = args.image_size
    # init conv 7x7 (vddp.py:625-628)
    conv("init", H, args.channels, H, dims[0])

    # down path (vddp.py:673-682): 2 ResnetBlocks per level + Downsample
    h = H
    c_prev = dims[0]
    for i, c in enumerate(dims):
        resnet(f"down{i}.r1", h, c_prev, c)
        resnet(f"down{i}.r2", h, c, c)
        if i < len(dims) - 1:
            conv(f"down{i}.down", h, c, h // 2, c)
            h //= 2
        c_prev = c

    # mid (vddp.py:684-692)
    resnet("mid.r1", h, dims[-1], dims[-1])
    resnet("mid.r2", h, dims[-1], dims[-1])

    # up path (vddp.py:694-703): skip concat doubles input channels
    for i, c in reversed(list(enumerate(dims))):
        resnet(f"up{i}.r1", h, 2 * c, dims[i - 1] if i else dims[0])
        cin = dims[i - 1] if i else dims[0]
        resnet(f"up{i}.r2", h, cin, cin)
        if i:
            conv(f"up{i}.up", h, cin, h * 2, cin)
            h *= 2

    # final: Block(2*dim -> dim) + 1x1 out conv (vddp.py:705-709)
    conv("final.b", H, 2 * dims[0], H, dims[0])
    gn("final.b", H, dims[0])
    conv("final.out1x1", H, dims[0], H, args.channels)

    total = sum(t for _, t in traffic)
    gn_stats = sum(t for lbl, t in traffic if "GN stats" in lbl)
    gn_all = sum(t for lbl, t in traffic if "GN" in lbl)
    conv_io = total - gn_all
    print(f"shape: CFG-folded batch {B}, {F} frames, {H}x{H}, dims {dims}")
    print(f"conv R/W traffic:        {conv_io:8.0f} MB")
    print(f"GroupNorm stats reads:   {gn_stats:8.0f} MB "
          f"({args.stats_passes}-pass)")
    print(f"GroupNorm norm R+W:      {gn_all - gn_stats:8.0f} MB")
    print(f"TOTAL pool traffic:      {total:8.0f} MB")
    print(f"floor at {args.gbps:.0f} GB/s:     {total / args.gbps:8.1f} ms")


if __name__ == "__main__":
    main()
