#!/usr/bin/env python
"""Analytic roofline for the bench forward (1152x864, N=5, bf16, B=1).

VERDICT r4 item 1: "bytes that must move + MACs required per 1152x864 N=5
forward vs the measured 110-130 GB/s / 170 TF/s, per component" — this
script computes that bound from the model's own configuration (stage
tuples from models/net.py, window geometry from make_config) and prints a
per-component table against the measured per-component times from the
round-4/5 traces (PROGRESS.md).

Resource model (chip characterization, PROGRESS.md round 2 — MEASURED on
this axon-tunneled v5e, not spec):
    HBM stream          119 GB/s   (elementwise + pallas copy, 110-130)
    MXU bf16            170 TF/s   (8192^3 matmul)
    gather (small/large payload)   1.8-3.7 / 10-13.5 ns per index
    VPU f32 (8x128x8 ALUs @ 940 MHz) ~7.5 Tops/s ideal; compares/selects
        measured closer to ~3 Tops/s sustained in the one-hot build

Every byte count below is the traffic the chosen ALGORITHM requires — a
lower bound for the implementation class, not for any conceivable
algorithm (e.g. the per-view window DMA could in principle be shared
across views only by a different tiling).

Reference anchors: the components mirror
/root/reference/models/patchmatch.py:198-217 (evaluation),
models/module.py:130-181 (warp), models/net.py:9-70 (feature extractor).
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field

BW = 119e9         # bytes/s, measured HBM stream (midpoint of 110-130)
MXU = 170e12       # bf16 MACs*2/s measured
VPU = 3.0e12       # sustained compare/select ops/s (measured one-hot build)
GATHER_NS = 2.7    # ns/index, small-payload in-cache regime (1.8-3.7)

B, V = 1, 4        # batch, source views
H0, W0 = 864, 1152


@dataclass
class Comp:
    name: str
    bytes: float = 0.0
    macs: float = 0.0       # MXU MACs
    vpu: float = 0.0        # VPU ops (compares/selects/FMA lanes)
    gidx: float = 0.0       # gather indices
    note: str = ""

    @property
    def t_ms(self) -> float:
        return 1e3 * max(
            self.bytes / BW, 2 * self.macs / MXU, self.vpu / VPU,
            self.gidx * GATHER_NS * 1e-9,
        )

    @property
    def bound(self) -> str:
        t = {
            "HBM": self.bytes / BW,
            "MXU": 2 * self.macs / MXU,
            "VPU": self.vpu / VPU,
            "gather": self.gidx * GATHER_NS * 1e-9,
        }
        return max(t, key=t.get)


def feature_component() -> Comp:
    """FeatureNet, s2d prefix (models/feature.py): 5 views batched."""
    n = 5 * B
    # (name, k, s, cin, cout, ho, wo) for the s2d-folded program: the fold
    # preserves MACs exactly (entry rearrangement), so MACs equal the
    # original NHWC program's; bytes use the folded activation shapes.
    # original conv stack (feature.py): 3->8 (k3), 8->8, 8->16 s2, 16->16,
    # 16->16, 16->32 s2, 32->32, 32->32, 32->64 s2, 64->64, 64->64
    convs = [
        (3, 1, 3, 8, H0, W0), (3, 1, 8, 8, H0, W0),
        (5, 2, 8, 16, H0 // 2, W0 // 2),
        (3, 1, 16, 16, H0 // 2, W0 // 2), (3, 1, 16, 16, H0 // 2, W0 // 2),
        (5, 2, 16, 32, H0 // 4, W0 // 4),
        (3, 1, 32, 32, H0 // 4, W0 // 4), (3, 1, 32, 32, H0 // 4, W0 // 4),
        (5, 2, 32, 64, H0 // 8, W0 // 8),
        (3, 1, 64, 64, H0 // 8, W0 // 8), (3, 1, 64, 64, H0 // 8, W0 // 8),
    ]
    macs = sum(k * k * ci * co * ho * wo for k, _, ci, co, ho, wo in convs) * n
    # lateral 1x1 + output 1x1 heads (inner1/2, output1/2/3)
    heads = [(64, 64, H0 // 8, W0 // 8), (32, 64, H0 // 4, W0 // 4),
             (16, 64, H0 // 2, W0 // 2), (64, 64, H0 // 8, W0 // 8),
             (64, 32, H0 // 4, W0 // 4), (64, 16, H0 // 2, W0 // 2)]
    macs += sum(ci * co * ho * wo for ci, co, ho, wo in heads) * n
    # bytes: each layer writes its activation once and reads its input once
    # (folded shapes: the s2d prefix keeps everything at H/4 x W/4 with
    # fold^2*C channels = same element count). bf16 activations.
    acts = [ci * ho * wo * s * s for (_, s, ci, _, ho, wo) in convs]
    outs = [co * ho * wo for (_, _, _, co, ho, wo) in convs]
    ab = (sum(acts) + sum(outs)) * 2 * n
    # FPN upsample+add passes + head reads/writes
    fpn = (64 * (H0 // 8) * (W0 // 8) + 64 * (H0 // 4) * (W0 // 4)
           + 64 * (H0 // 2) * (W0 // 2)) * 2 * 3 * n
    return Comp("feature extractor (5 views, s2d)", bytes=ab + fpn,
                macs=macs, note="MXU-rich; measured 9.5ms == bytes bound")


def quad_tables() -> list[Comp]:
    """make_quad_table_2d per stage: read stacked feats, write 4C tables."""
    out = []
    for s, (c, hs, ws) in {3: (64, H0 // 8, W0 // 8),
                           2: (32, H0 // 4, W0 // 4),
                           1: (16, H0 // 2, W0 // 2)}.items():
        ht, wt = hs + 48 + 2, ws + 32 + 2  # HWIN_MAX row pad + X_MARGIN*2
        by = (V * hs * ws * c + V * ht * wt * 4 * c) * 2
        out.append(Comp(f"quad tables s{s}", bytes=by, note="pure HBM"))
    return out


def windowed_calls() -> list[Comp]:
    from patchmatchnet_tpu.ops.pallas.windowed_similarity import make_config

    # (stage, D, C, G, iter) per evaluation call at the bench config:
    # s3 it1 D=48+16 prop, it2 D=16+16; s2 D=8+8 x2; s1 D=8 (no prop)
    calls = [(3, 64, 64, 8), (3, 32, 64, 8),
             (2, 16, 32, 8), (2, 16, 32, 8), (1, 8, 16, 4)]
    dims = {3: (H0 // 8, W0 // 8), 2: (H0 // 4, W0 // 4), 1: (H0 // 2, W0 // 2)}
    out = []
    for s, d, c, g in calls:
        hs, ws = dims[s]
        cfg = make_config(hs, ws)
        k = cfg.hband * cfg.wwin
        tiles = cfg.ty * cfg.tx
        samples = d * cfg.hp * cfg.wp
        # window DMA: per tile per view, hwin x wwin x 4C bf16
        win = tiles * V * cfg.hwin * cfg.wwin * 4 * c * 2
        # depth tiles f32 + ref bf16 + vw f32 (per view: v is the innermost
        # grid dim with revisited blocks, so Mosaic re-fetches per v only
        # the view-indexed blocks; dep/ref/out stay resident per (ty,tx))
        other = (d * cfg.hp * cfg.wp * 4 + cfg.hp * cfg.wp * c * 2
                 + V * cfg.hp * cfg.wp * 4)
        # output volume written once (views fused)
        outv = g * d * cfg.hp * cfg.wp * 4
        # MACs: one-hot [K, S] x band [K, 4C] matmul -> K * 4C per sample;
        # plus bilinear combine 4C, ref product C, group-mean dot C*G
        macs = samples * V * (k * 4 * c + 4 * c + c + c * g)
        # one-hot build: K compares per sample per view
        vpu = samples * V * k
        out.append(Comp(
            f"windowed eval s{s} D={d}", bytes=win + other + outv,
            macs=macs, vpu=vpu,
            note=f"K={k} tiles={tiles} MXU-dominated",
        ))
    return out


def eval_tail_calls() -> list[Comp]:
    """Fused eval-grid tail (ops/pallas/eval_tail.py): u16 quad gather
    (payload 2D u16) + lane-packed kernel; plus SimilarityNet before it and
    softmax/regression after (counted in 'tail glue')."""
    calls = [(3, 64, 8), (3, 32, 8), (2, 16, 8), (2, 16, 8), (1, 8, 4)]
    dims = {3: (H0 // 8, W0 // 8), 2: (H0 // 4, W0 // 4), 1: (H0 // 2, W0 // 2)}
    ke = 9
    out = []
    for s, d, g in calls:
        hs, ws = dims[s]
        hw = hs * ws
        # SimilarityNet: 1x1x1 convs g->16->8->1 over [G, D, H, W] f32
        sim_macs = hw * d * (g * 16 + 16 * 8 + 8 * 1)
        sim_bytes = (g * d * hw) * 4 + d * hw * 2  # read volume, write cost
        # eval-tail gather: Ke * HW indices, payload 2D u16 (x fixed | cost)
        gidx = ke * hw
        tail_bytes = gidx * 2 * d * 2 + d * hw * 4  # taps + score write
        # depth weight + neighbor reduce in VMEM: ~Ke*D vpu ops/pixel
        vpu = hw * ke * d * 6
        out.append(Comp(
            f"sim-net + eval tail s{s} D={d}",
            bytes=sim_bytes + tail_bytes, macs=sim_macs, vpu=vpu, gidx=gidx,
        ))
    return out


def propagation() -> Comp:
    """Propagation gathers: Kp neighbors x HW indices, 4 B payload
    (middle-hypothesis depth), per call with propagation."""
    calls = [(3, 16), (3, 16), (2, 8), (2, 8)]  # s1 has 0 neighbors
    dims = {3: (H0 // 8, W0 // 8), 2: (H0 // 4, W0 // 4)}
    gidx = sum(kp * dims[s][0] * dims[s][1] for s, kp in calls)
    return Comp("propagation gathers", gidx=gidx, bytes=gidx * 8,
                note="4 B payload/idx — known-inefficient (roadmap 4)")


def misc() -> list[Comp]:
    comps = []
    # depth upsample between stages + x_norm builds + softmax passes
    passes = 0
    for s, d in [(3, 64), (3, 32), (2, 16), (2, 16), (1, 8)]:
        hs, ws = {3: (H0 // 8, W0 // 8), 2: (H0 // 4, W0 // 4),
                  1: (H0 // 2, W0 // 2)}[s]
        passes += d * hs * ws * 4 * 6  # x_norm, hi/lo, softmax rw, regress
    comps.append(Comp("regression/softmax/x_norm glue", bytes=passes))
    # refinement: convs at full res (models/refinement.py: image 3->8,
    # depth 1->8, deconv 8->8, cat 16 -> 8 -> 1), bf16
    rmacs = (H0 * W0 * (3 * 8 * 9 + 8 * 8 * 9) +
             (H0 // 2) * (W0 // 2) * (1 * 8 * 9 + 8 * 8 * 9 * 4) +
             H0 * W0 * (16 * 8 * 9 + 8 * 8 * 9 + 8 * 1 * 9))
    rbytes = H0 * W0 * (3 + 8 + 8 + 16 + 8 + 1 + 1) * 2
    comps.append(Comp("refinement head", bytes=rbytes, macs=rmacs))
    # depth upsample bilinear x2 between stages + final nearest
    up = (H0 // 4 * W0 // 4 + H0 // 2 * W0 // 2 + H0 * W0) * 4 * 2
    comps.append(Comp("stage upsamples", bytes=up))
    return comps


def main():
    comps = ([feature_component()] + quad_tables() + windowed_calls()
             + eval_tail_calls() + [propagation()] + misc())
    total_b = sum(c.bytes for c in comps)
    total_m = sum(c.macs for c in comps)
    total_t = sum(c.t_ms for c in comps)
    print(f"{'component':38s} {'MB':>7s} {'GMAC':>7s} {'Gvpu':>6s} "
          f"{'Midx':>5s} {'bound':>6s} {'t_ms':>6s}")
    for c in comps:
        print(f"{c.name:38s} {c.bytes/1e6:7.1f} {c.macs/1e9:7.2f} "
              f"{c.vpu/1e9:6.2f} {c.gidx/1e6:5.2f} {c.bound:>6s} "
              f"{c.t_ms:6.2f}")
    print(f"\nTOTAL bytes {total_b/1e6:.0f} MB  MACs {total_m/1e9:.1f} G")
    print(f"speed-of-light sum (each component at its own bound): "
          f"{total_t:.1f} ms -> {H0*W0/1e6/total_t*1e3:.2f} MPix/s")
    print(f"pure-HBM bound alone: {total_b/BW*1e3:.1f} ms")
    print(f"pure-MXU bound alone: {2*total_m/MXU*1e3:.1f} ms")


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    main()
