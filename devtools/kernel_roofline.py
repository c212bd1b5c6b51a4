"""Roofline decomposition of the fused uvu conv kernel (production plan).

Counts, per edge block, the three kernel phases' work:
  1. CG matmuls (MXU): c_all rows x max_d2 x B
  2. message assembly (VPU): per-path fma loop — current u-major layout vs
     an m-major (channel-vectorized) layout
  3. aggregation matmul (MXU): D_out x B x C

v5e peaks (per chip): MXU ~197 TFLOP/s bf16, ~49 TFLOP/s f32;
VPU ~ 8 sublanes x 128 lanes x 4 ALUs x 0.94 GHz ~= 3.85 Tflop/s (f32);
HBM ~819 GB/s.
"""

import numpy as np

from matten_tpu.ops.irreps import Irreps
from matten_tpu.ops.tensor_product import uvu_tp_plan
from matten_tpu.kernels.fused_conv import _plan_metas

FEATS = Irreps("32x0o+32x0e+16x1o+16x1e+4x2o+4x2e+2x3o+2x3e+2x4e")
SH = Irreps("0e+1o+2e+3o+4e")

plan = uvu_tp_plan(FEATS, SH, FEATS)
metas, c_all, max_d2 = _plan_metas(plan)

B = 256  # edge block
E = 24 * 1024  # ~ padded edges, bench-like batch
N = 256
print(f"plan: {len(plan.instructions)} paths, mid dim={plan.irreps_out.dim}, "
      f"weights={plan.weight_numel}, in1 dim={plan.irreps_in1.dim}")
print(f"c_all: {c_all.shape}")

# phase 1: CG matmul flops per block (grouped per SH degree)
cg_flops = 2 * c_all.shape[0] * max_d2 * B
# phase 2 current: per path mul*d1 fmas of [d3, B]
fma_flops = 0
vregs_cur = 0  # vector ops in units of (8,128) vregs touched
vregs_mmaj = 0
lanes = 128
subl = 8
for m in metas:
    mul, d1, d3 = m["mul"], m["d1"], m["d3"]
    fma_flops += 2 * mul * d1 * d3 * B
    # current: mul*d1 fma ops on [d3, B] tiles -> ceil(d3/8)*B/128 vregs each
    vregs_cur += mul * d1 * int(np.ceil(d3 / subl)) * (B // lanes)
    # m-major: d1*d3 fma ops on [mul, B] tiles
    vregs_mmaj += d1 * d3 * int(np.ceil(mul / subl)) * (B // lanes)
# phase 3: aggregation matmul
dout = plan.irreps_out.dim

nblocks = E // B
VPU = 3.85e12
MXU_F32 = 49e12
MXU_BF16 = 197e12

print(f"\nper-layer totals over {nblocks} blocks (E={E}, B={B}):")
print(f"  CG matmul: {cg_flops*nblocks/1e9:.2f} GF "
      f"-> {cg_flops*nblocks/MXU_F32*1e6:.0f} us f32 MXU")
print(f"  assembly fma: {fma_flops*nblocks/1e9:.2f} GF "
      f"-> {fma_flops*nblocks/VPU*1e6:.0f} us VPU (if perfectly packed)")
print(f"  assembly vreg-ops current(u-major): {vregs_cur*nblocks/1e6:.2f} M; "
      f"m-major: {vregs_mmaj*nblocks/1e6:.2f} M "
      f"(x{vregs_cur/max(vregs_mmaj,1):.1f} reduction)")
# VPU does ~1 vreg op/cycle/ALU-group; 0.94GHz, ~4-8 issue -> assume 4/cycle
for ipc in (1, 4):
    print(f"    -> at {ipc} vreg/cycle: cur {vregs_cur*nblocks/(0.94e9*ipc)*1e3:.2f} ms, "
          f"m-major {vregs_mmaj*nblocks/(0.94e9*ipc)*1e3:.2f} ms")
for C in (256, 128, 64, 32, 8):
    agg = 2 * dout * B * C * nblocks
    print(f"  aggregation C={C}: {agg/1e9:.1f} GF -> f32 {agg/MXU_F32*1e3:.2f} ms, "
          f"bf16 {agg/MXU_BF16*1e3:.2f} ms")

# HBM traffic per layer (f32): read xg/sh/w + write agg
d1 = plan.irreps_in1.dim
d2 = plan.irreps_in2.dim
dw = plan.weight_numel
traffic = 4 * (E * (d1 + d2 + dw) + N * dout)
print(f"\n  HBM traffic/layer (f32, fwd): {traffic/1e6:.1f} MB "
      f"-> {traffic/819e9*1e6:.0f} us at 819 GB/s")
print(f"  speed-of-light fwd/layer ~ max(MXU, VPU, HBM) of the above")
