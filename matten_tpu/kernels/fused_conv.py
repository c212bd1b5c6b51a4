"""Fused gather-free TFN convolution kernel: uvu TP + in-VMEM aggregation.

The speed-of-light analysis of the TFN message pass (SURVEY.md §7 hard part
4, BASELINE.json north star): the uvu tensor product's un-simplified output
irreps are wide (production plan: 103 paths, ~4200 components), so
materializing per-edge messages costs ~E x 4200 x 4B of HBM write+read per
layer — an order of magnitude more traffic than the inputs. This kernel
never materializes messages:

  * layout: features on sublanes, edges on lanes ([D, E] transposed), so
    every CG-path slice is a cheap sublane slice and the lane dimension is
    always 128-aligned — this is what makes the kernel compile fast and
    run at line rate (the naive [E, D] layout relayouts on every slice);
  * per edge block (256 lanes): for each CG path, one MXU matmul
    (CG-table x SH block) followed by a short static fma loop over the
    2l+1 components inside a fori_loop over channels;
  * aggregation: messages are immediately reduced into a [D_out, C]
    node-chunk accumulator that lives in VMEM while consecutive edge
    blocks deposit into it (destination one-hot matmul on the MXU — the
    segment-sum as dense contraction trick). A scalar-prefetched
    block -> chunk owner map drives the output BlockSpec, so batches of
    ANY node count run in the fused kernel: collation groups the
    dst-sorted edge list so each edge block touches exactly one node
    chunk (matten_tpu/data/graph.py chunk alignment), and Pallas keeps
    the output block resident across the contiguous run of blocks that
    own it, flushing once per chunk;
  * HBM traffic: read x/sh/w once, write the [D_out, N] aggregate once.

Gradients: custom_vjp with Pallas kernels for dx (the transposed plan run
over a SOURCE-sorted edge permutation, so the scatter is chunk-local) and
dw (per-edge inner products); dsh falls back to the XLA composition (dead
code unless positions are differentiated).
"""

from __future__ import annotations

import functools
import logging
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

_warned_fallbacks = set()


def _log_fallback(plan, reason: str, **info) -> None:
    """Once-per-(plan, shape) warning when the fused-kernel dispatch drops
    to the XLA `_reference` tier (~11x slower) — the perf cliff must be
    visible (round-3 verdict weak #4)."""
    key = (id(plan), reason, tuple(sorted(info.items())))
    if key in _warned_fallbacks:
        return
    _warned_fallbacks.add(key)
    logger.warning(
        "fused_uvu_conv: falling back to the XLA reference tier (%s; %s; "
        "plan=%d paths, %d out components)",
        reason,
        ", ".join(f"{k}={v}" for k, v in sorted(info.items())),
        len(plan.instructions),
        plan.irreps_out.dim,
    )

from matten_tpu.ops.tensor_product import TensorProductPlan
from matten_tpu.ops.wigner import wigner_3j

__all__ = [
    "fused_uvu_conv",
    "fused_uvu_conv_t",
    "EdgeChunks",
    "NODE_CHUNK",
    "EDGE_BLOCK",
    "RESIDENT_NODES_MAX",
]


def _interpret_params(interpret: bool):
    """CPU-test interpreter selection: the Mosaic TPU interpreter.

    `interpret=True`'s HLO interpreter replays the kernel jaxpr under a
    vma-checked shard_map without the jnp-level pvary auto-insertion, so
    internal constants (iota, zero inits) collide with shard-varying
    operands; the Mosaic interpreter (pltpu.InterpretParams) emulates TPU
    semantics and composes with the checker.
    """
    if not interpret:
        return False
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.InterpretParams()


# v5e has 128 MiB of VMEM per core; Mosaic's default 16 MiB scoped limit is
# conservative. The chunked kernel's double-buffered [D_out, C] output block
# + [D_out, B] message scratch + input blocks need ~17 MiB for the
# production plan at C=B=256.
_VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def _compiler_params():
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)

# Default node-chunk / edge-block geometry for the chunk-aligned layout.
# C = 128 is the Mosaic lane-granularity floor — smaller output chunks are
# rejected (last block dim must be a multiple of 128) and larger ones only
# grow the one-hot aggregation matmul, which is the kernels' dominant
# per-block fixed cost ([D_out, B] @ [B, C] scales with C). Measured on
# v5e (DEVNOTES r3): the chunked C=128 kernels beat the single-[D_out, N]
# accumulator already at N = 256 (1.26 vs 1.40 ms fwd+bwd), so collation
# engages chunking as soon as the batch exceeds one chunk.
NODE_CHUNK = 128
EDGE_BLOCK = 256
CHUNK_THRESHOLD_NODES = 128


class EdgeChunks(NamedTuple):
    """Chunk-aligned edge-layout metadata (built host-side at collation).

    dst_owner: [E/B] int32 — node-chunk owner of each dst-sorted edge block
        (non-decreasing; every block's edges target one chunk).
    src_perm:  [E] int32 — permutation into the dst-sorted edge arrays that
        orders edges by SOURCE node chunk (fill slots point at an inert
        masked edge).
    src_owner: [E/B] int32 — node-chunk owner of each src-sorted edge block.
    """

    dst_owner: jnp.ndarray
    src_perm: jnp.ndarray
    src_owner: jnp.ndarray


class _Layout(NamedTuple):
    """Kernel-internal row layout of an irreps-typed feature axis.

    to_kernel:  gather indices, x_kernel = x_std[to_kernel]
    to_std:     inverse gather,  x_std = x_kernel[to_std]
    offs:       per-entry kernel start offset
    mmaj:       per-entry flag — True = m-major (component-major,
                channel-minor) slab layout
    """

    to_kernel: np.ndarray
    to_std: np.ndarray
    offs: tuple
    mmaj: tuple


def _mmaj_layout(irreps, threshold: int) -> _Layout:
    """m-major kernel layout for the wide-channel entries.

    Entries with mul >= threshold move to the FRONT (every mul in
    {16, 32, ...} keeps their slab starts 16-sublane-aligned) and store
    rows component-major: row = entry_off + m * mul + u. A [mul, B] slab
    per component then covers all channels in ceil(mul/8) full vregs — the
    per-(channel, m1) fma loop of the standard u-major layout wastes
    (8 - dim%8)/8 of each vreg on the small irrep dims. Remaining entries
    keep the standard layout, after the m-major block.
    """
    entries = list(irreps)
    slices = irreps.slices()
    n = irreps.dim
    order = [i for i, mi in enumerate(entries) if mi.mul >= threshold] + [
        i for i, mi in enumerate(entries) if mi.mul < threshold
    ]
    to_kernel = np.zeros(n, np.int32)
    offs = [0] * len(entries)
    mmaj = [False] * len(entries)
    pos = 0
    for i in order:
        mul, ir = entries[i].mul, entries[i].ir
        d = ir.dim
        s = slices[i].start
        offs[i] = pos
        if mul >= threshold:
            mmaj[i] = True
            m_grid, u_grid = np.meshgrid(np.arange(d), np.arange(mul), indexing="ij")
            to_kernel[pos : pos + mul * d] = (s + u_grid * d + m_grid).reshape(-1)
        else:
            to_kernel[pos : pos + mul * d] = np.arange(s, s + mul * d)
        pos += mul * d
    to_std = np.argsort(to_kernel).astype(np.int32)
    return _Layout(to_kernel, to_std, tuple(offs), tuple(mmaj))


def _uvu_groups(plan: TensorProductPlan, threshold: int):
    """Path groups for small-mul slab packing.

    Small-mul paths sharing the same (in1 entry, sh entry) read the same
    x channels against the same CG@sh product block; packing their output
    components into ONE [sum(d3), B] slab per channel turns per-path
    partially-filled-vreg fmas into shared full slabs (the per-path w
    multiply stays per path). Returns {(i_in1, i_in2): [path indices]} for
    groups of >= 2 paths with mul < threshold."""
    groups = {}
    for pi, ins in enumerate(plan.instructions):
        mul1, _ = plan.irreps_in1[ins.i_in1]
        if 0 < mul1 < threshold:
            groups.setdefault((ins.i_in1, ins.i_in2), []).append(pi)
    return {k: v for k, v in groups.items() if len(v) >= 2}


def _out_layout(plan: TensorProductPlan, threshold: int, groups) -> _Layout:
    """Kernel row layout of the uvu OUTPUT axis: m-major entries first
    (16-aligned slabs), then grouped small-mul entries interleaved
    [u-major x (path, m3)] so each channel's packed slab is contiguous,
    then remaining entries in standard layout.

    offs[i_out] is the entry's kernel base; for grouped entries the base
    points at the (u=0, off_p) row and rows step by the GROUP's summed d3
    per channel (metas carry that stride)."""
    out_slices = plan.irreps_out.slices()
    entries = list(plan.irreps_out)
    n = plan.irreps_out.dim
    in_group = {}
    for key, pis in groups.items():
        for pi in pis:
            in_group[plan.instructions[pi].i_out] = key
    to_kernel = np.zeros(n, np.int32)
    offs = [0] * len(entries)
    mmaj = [False] * len(entries)
    pos = 0
    # 1) m-major entries
    for i, mi in enumerate(entries):
        if mi.mul >= threshold:
            d = mi.ir.dim
            s = out_slices[i].start
            offs[i] = pos
            mmaj[i] = True
            m_g, u_g = np.meshgrid(np.arange(d), np.arange(mi.mul), indexing="ij")
            to_kernel[pos : pos + mi.mul * d] = (s + u_g * d + m_g).reshape(-1)
            pos += mi.mul * d
    # 2) grouped small-mul entries, interleaved per group
    for key, pis in groups.items():
        mul = plan.irreps_in1[plan.instructions[pis[0]].i_in1].mul
        d3s = [plan.irreps_out[plan.instructions[pi].i_out].ir.dim for pi in pis]
        d3sum = sum(d3s)
        off_p = 0
        for pi, d3 in zip(pis, d3s):
            i_out = plan.instructions[pi].i_out
            s = out_slices[i_out].start
            offs[i_out] = pos + off_p  # base of (u=0, this path)
            for u in range(mul):
                r0 = pos + u * d3sum + off_p
                to_kernel[r0 : r0 + d3] = np.arange(s + u * d3, s + (u + 1) * d3)
            off_p += d3
        pos += mul * d3sum
    # 3) remaining entries, standard layout
    for i, mi in enumerate(entries):
        if mi.mul >= threshold or i in in_group:
            continue
        d = mi.ir.dim
        s = out_slices[i].start
        offs[i] = pos
        to_kernel[pos : pos + mi.mul * d] = np.arange(s, s + mi.mul * d)
        pos += mi.mul * d
    assert pos == n
    to_std = np.argsort(to_kernel).astype(np.int32)
    return _Layout(to_kernel, to_std, tuple(offs), tuple(mmaj))


def _plan_metas(
    plan: TensorProductPlan, transpose: bool = False, mmaj_threshold: int = 0
):
    """Static per-path metadata + stacked CG tables.

    transpose=True swaps the roles of the first input and the output
    (CG[m3, m2, m1] instead of CG[m1, m2, m3]) — the dx backward pass is
    the forward kernel run on this transposed plan with src/dst swapped.

    mmaj_threshold > 0 activates the kernel-internal layouts: m-major for
    entries with mul >= threshold (see _mmaj_layout) and [u x (path, m3)]
    slab packing for small-mul path groups (_uvu_groups / _out_layout);
    callers must permute the node/cotangent arrays with the returned
    layouts. Forward metas then contain one packed meta per group
    (kind "grp"); transposed metas stay per-path but carry the group
    stride/offset so their gradient reads index the packed layout.
    """
    in1_slices = plan.irreps_in1.slices()
    in2_slices = plan.irreps_in2.slices()
    out_slices = plan.irreps_out.slices()
    lay1 = layo = None
    groups = {}
    if mmaj_threshold:
        groups = _uvu_groups(plan, mmaj_threshold)
        lay1 = _mmaj_layout(plan.irreps_in1, mmaj_threshold)
        layo = _out_layout(plan, mmaj_threshold, groups)
    group_of = {}
    for key, pis in groups.items():
        d3s = [plan.irreps_out[plan.instructions[pi].i_out].ir.dim for pi in pis]
        for pi in pis:
            group_of[pi] = (key, sum(d3s))

    w_offs = []
    w_off = 0
    for wshape in plan.weight_shapes:
        w_offs.append(w_off)
        w_off += int(np.prod(wshape))

    max_d2 = max(mi.ir.dim for mi in plan.irreps_in2)

    def path_c(pi, ins, pw):
        ir1 = plan.irreps_in1[ins.i_in1].ir
        ir2 = plan.irreps_in2[ins.i_in2].ir
        ir3 = plan.irreps_out[ins.i_out].ir
        c = (wigner_3j(ir1.l, ir2.l, ir3.l) * pw).astype(np.float32)
        if transpose:
            c = np.ascontiguousarray(c.transpose(2, 1, 0))  # [m3, m2, m1]
        return c

    raw = []
    grouped_done = set()
    for pi, (ins, pw) in enumerate(zip(plan.instructions, plan.path_weights)):
        mul1, ir1 = plan.irreps_in1[ins.i_in1]
        mul2, ir2 = plan.irreps_in2[ins.i_in2]
        assert ins.mode == "uvu" and mul2 == 1
        x_start = in1_slices[ins.i_in1].start if lay1 is None else lay1.offs[ins.i_in1]
        o_start = out_slices[ins.i_out].start if layo is None else layo.offs[ins.i_out]

        if not transpose and pi in group_of:
            # one packed meta per group, emitted at its first path
            key = group_of[pi][0]
            if key in grouped_done:
                continue
            grouped_done.add(key)
            pis = groups[key]
            d3s = [plan.irreps_out[plan.instructions[p].i_out].ir.dim for p in pis]
            d3sum = sum(d3s)
            d1 = ir1.dim
            # combined CG rows [m1-major x (path, m3)]
            c2 = np.zeros((d1 * d3sum, ir2.dim), dtype=np.float32)
            off_p = 0
            for p, d3 in zip(pis, d3s):
                cp = path_c(p, plan.instructions[p], plan.path_weights[p])
                for m1 in range(d1):
                    c2[m1 * d3sum + off_p : m1 * d3sum + off_p + d3] = cp[m1].T
                off_p += d3
            raw.append(
                dict(
                    kind="grp",
                    x_start=x_start,
                    sh_sl=in2_slices[ins.i_in2],
                    o_base=layo.offs[plan.instructions[pis[0]].i_out],
                    w_starts=tuple(w_offs[p] for p in pis),
                    d3s=tuple(d3s),
                    c2=c2,
                    mul=mul1,
                    d1=d1,
                    d2=ir2.dim,
                    d3=d3sum,
                    mmaj=False,
                )
            )
            continue

        c = path_c(pi, ins, pw)
        da = c.shape[0]
        db = c.shape[2]
        # rows a-major x b: C2[da*db, d2] for t = C2 @ y
        c2 = np.ascontiguousarray(c.transpose(0, 2, 1).reshape(da * db, ir2.dim))
        x_stride = da
        if transpose:
            x_start, o_start = o_start, x_start
            if pi in group_of:
                # gradient reads index the packed forward layout:
                # row(u) = group base + path offset + u * sum(d3)
                x_stride = group_of[pi][1]
        raw.append(
            dict(
                kind="path",
                x_start=x_start,
                x_stride=x_stride,
                sh_sl=in2_slices[ins.i_in2],
                o_start=o_start,
                w_start=w_offs[pi],
                c2=c2,
                mul=mul1,
                d1=da,
                d2=ir2.dim,
                d3=db,
                mmaj=bool(mmaj_threshold) and mul1 >= mmaj_threshold,
            )
        )
    # order metas by SH entry so each group's CG rows are contiguous and the
    # kernel can do one CG matmul per spherical-harmonic degree
    raw.sort(key=lambda m: (m["sh_sl"].start, m["sh_sl"].stop))
    metas = []
    c_blocks = []
    col_off = 0
    for m in raw:
        c2 = m.pop("c2")
        c2p = np.zeros((c2.shape[0], max_d2), dtype=np.float32)
        c2p[:, : m["d2"]] = c2
        m["c_sl"] = slice(col_off, col_off + c2.shape[0])
        metas.append(m)
        c_blocks.append(c2p)
        col_off += c2.shape[0]
    c_all = np.concatenate(c_blocks, axis=0)  # [total_rows, max_d2]
    return metas, c_all, max_d2, (lay1, layo)


@functools.lru_cache(maxsize=None)
def _build_call(
    plan: TensorProductPlan,
    n_edges: int,
    n_nodes: int,
    block: int,
    chunk: int,
    interpret: bool,
    transpose: bool = False,
    agg_dtype: str = "float32",
):
    """Fused TP + chunked aggregation kernel.

    Grid over edge blocks; a scalar-prefetched [E/block] owner map selects
    the [dout, chunk] output block each edge block deposits into. The owner
    map must be non-decreasing (edges grouped by destination chunk) so each
    output block is visited in one contiguous run. chunk == n_nodes with an
    all-zero owner map degenerates to the single-accumulator layout.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n_nodes % chunk == 0, (n_nodes, chunk)
    assert n_edges % block == 0, (n_edges, block)
    metas, c_all, max_d2, _ = _plan_metas(plan, transpose=transpose)
    # transposed plans read gradient rows (out irreps) and write input irreps;
    # their out entries collide across paths, so message rows accumulate
    d1 = plan.irreps_out.dim if transpose else plan.irreps_in1.dim
    d2 = plan.irreps_in2.dim
    dw = plan.weight_numel
    dout = plan.irreps_in1.dim if transpose else plan.irreps_out.dim
    accumulate = transpose
    grid = (n_edges // block,)

    def col_block(d):
        # [feature_rows, edge_block] — features whole, edges blocked on lanes
        return pl.BlockSpec(
            (d, block), lambda i, own: (0, i), memory_space=pltpu.VMEM
        )

    # group CG tables by SH entry so each edge block does ONE CG matmul per
    # spherical-harmonic degree instead of one per path
    groups = {}  # (sh start, sh stop) -> [meta indices]
    for idx, m in enumerate(metas):
        key = (m["sh_sl"].start, m["sh_sl"].stop)
        groups.setdefault(key, []).append(idx)

    def kernel(own_ref, xT_ref, shT_ref, wT_ref, dst_ref, c_ref, out_ref, msg_ref):
        i = pl.program_id(0)
        own = own_ref[i]
        prev = own_ref[jnp.maximum(i - 1, 0)]

        @pl.when((i == 0) | (own != prev))
        def _():
            out_ref[:, :] = jnp.zeros(out_ref.shape, out_ref.dtype)

        # destination one-hot [block, chunk] for the aggregation matmul
        # (chunk-local ids; rows outside [0, chunk) vanish — fill edges).
        # bf16 operands run the dominant MXU contraction ~4x faster; the
        # one-hot is exact in bf16 and accumulation stays f32.
        adt = jnp.bfloat16 if agg_dtype == "bfloat16" else jnp.float32
        dst = dst_ref[:, 0:1] - own * chunk  # [block, 1] int32
        node_ids = jax.lax.broadcasted_iota(jnp.int32, (block, chunk), 1)
        onehot = (node_ids == dst).astype(adt)  # [block, C]

        # one CG matmul per SH degree: t_all rows cover every path's d1*d3
        ts = {}
        for (a, b), idxs in groups.items():
            y = shT_ref[a:b, :].astype(jnp.float32)  # [d2, B]
            r0 = metas[idxs[0]]["c_sl"].start
            r1 = metas[idxs[-1]]["c_sl"].stop
            cg = c_ref[r0:r1, : (b - a)]
            ts[(a, b)] = (jnp.dot(cg, y, preferred_element_type=jnp.float32), r0)

        if accumulate:
            msg_ref[:, :] = jnp.zeros(msg_ref.shape, msg_ref.dtype)

        # per-path message assembly into the VMEM message buffer
        for m in metas:
            mul, pd1, pd3 = m["mul"], m["d1"], m["d3"]
            t_all, r0 = ts[(m["sh_sl"].start, m["sh_sl"].stop)]
            tb = m["c_sl"].start - r0
            for u in range(mul):
                x0 = m["x_start"] + u * pd1
                xu = xT_ref[x0 : x0 + pd1, :].astype(jnp.float32)  # [d1, B]
                acc = t_all[tb : tb + pd3, :] * xu[0:1, :]
                for m1 in range(1, pd1):
                    acc = acc + (
                        t_all[tb + m1 * pd3 : tb + (m1 + 1) * pd3, :]
                        * xu[m1 : m1 + 1, :]
                    )
                w0 = m["w_start"] + u
                o0 = m["o_start"] + u * pd3
                val = acc * wT_ref[w0 : w0 + 1, :].astype(jnp.float32)
                if accumulate:
                    msg_ref[o0 : o0 + pd3, :] += val
                else:
                    msg_ref[o0 : o0 + pd3, :] = val

        # single aggregation matmul: [Dout, B] @ [B, C] accumulated over the
        # blocks owned by this chunk
        out_ref[:, :] += jnp.dot(
            msg_ref[:, :].astype(adt), onehot, preferred_element_type=jnp.float32
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # the block -> chunk owner map
        grid=grid,
        in_specs=[
            col_block(d1),
            col_block(d2),
            col_block(dw),
            pl.BlockSpec((block, 1), lambda i, own: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                c_all.shape, lambda i, own: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (dout, chunk), lambda i, own: (0, own[i]), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((dout, block), jnp.float32)],
    )

    def run(own, xT, shT, wT, dst):
        # convert the CG table inside the (possibly traced) call — a module
        # -level jnp constant created during one jit trace and reused from
        # the lru cache in another raises UnexpectedTracerError
        c_arr = jnp.asarray(c_all)
        # under a vma-checked shard_map the output must declare which mesh
        # axes it varies over: the union of the (per-shard) inputs'
        vma = frozenset().union(
            *(getattr(jax.typeof(a), "vma", frozenset()) for a in (xT, shT, wT))
        )
        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((dout, n_nodes), jnp.float32, vma=vma),
            interpret=_interpret_params(interpret),
            compiler_params=_compiler_params(),
        )
        return call(own, xT, shT, wT, dst, c_arr)

    return run


@functools.lru_cache(maxsize=None)
def _build_dw_call(
    plan: TensorProductPlan, n_edges: int, block: int, interpret: bool
):
    """Radial-weight gradient kernel: dw[e, p, u] = <acc_pu(e), g_dst(e)>."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    metas, c_all, _, _ = _plan_metas(plan, transpose=False)
    d1 = plan.irreps_in1.dim
    d2 = plan.irreps_in2.dim
    dw = plan.weight_numel
    dout = plan.irreps_out.dim
    grid = (n_edges // block,)

    def col_block(d):
        return pl.BlockSpec((d, block), lambda i: (0, i), memory_space=pltpu.VMEM)

    groups = {}
    for idx, m in enumerate(metas):
        groups.setdefault((m["sh_sl"].start, m["sh_sl"].stop), []).append(idx)

    def kernel(xT_ref, shT_ref, gT_ref, c_ref, wg_ref):
        ts = {}
        for (a, b), idxs in groups.items():
            y = shT_ref[a:b, :].astype(jnp.float32)
            r0 = metas[idxs[0]]["c_sl"].start
            r1 = metas[idxs[-1]]["c_sl"].stop
            cg = c_ref[r0:r1, : (b - a)]
            ts[(a, b)] = (jnp.dot(cg, y, preferred_element_type=jnp.float32), r0)
        for m in metas:
            mul, pd1, pd3 = m["mul"], m["d1"], m["d3"]
            t_all, r0 = ts[(m["sh_sl"].start, m["sh_sl"].stop)]
            tb = m["c_sl"].start - r0
            for u in range(mul):
                x0 = m["x_start"] + u * pd1
                xu = xT_ref[x0 : x0 + pd1, :].astype(jnp.float32)
                acc = t_all[tb : tb + pd3, :] * xu[0:1, :]
                for m1 in range(1, pd1):
                    acc = acc + (
                        t_all[tb + m1 * pd3 : tb + (m1 + 1) * pd3, :]
                        * xu[m1 : m1 + 1, :]
                    )
                o0 = m["o_start"] + u * pd3
                gu = gT_ref[o0 : o0 + pd3, :].astype(jnp.float32)
                w0 = m["w_start"] + u
                wg_ref[w0 : w0 + 1, :] = jnp.sum(acc * gu, axis=0, keepdims=True)

    def run(xT, shT, gT):
        c_arr = jnp.asarray(c_all)  # per-trace constant (see _build_call)
        vma = frozenset().union(
            *(getattr(jax.typeof(a), "vma", frozenset()) for a in (xT, shT, gT))
        )
        call = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                col_block(d1),
                col_block(d2),
                col_block(dout),
                pl.BlockSpec(c_all.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=col_block(dw),
            out_shape=jax.ShapeDtypeStruct((dw, n_edges), jnp.float32, vma=vma),
            interpret=_interpret_params(interpret),
            compiler_params=_compiler_params(),
        )
        return call(xT, shT, gT, c_arr)

    return run


def _reference(plan, x_nodes, sh, w, src, dst, n_nodes):
    msg = plan.apply(x_nodes[src], sh, w)
    return jax.ops.segment_sum(msg, dst, num_segments=n_nodes)


def _match_vma(cotangent, primal):
    """psum a custom-vjp cotangent over mesh axes the primal does not vary on.

    Under a vma-checked shard_map, a replicated input (e.g. node features in
    edge-sharded graph parallelism) consumed by shard-varying edge arrays
    yields per-shard partial gradients; the XLA tier gets the cross-shard
    psum automatically from the pvary transpose, a custom_vjp must insert it
    explicitly (cotangent vma must equal primal vma).
    """
    extra = getattr(jax.typeof(cotangent), "vma", frozenset()) - getattr(
        jax.typeof(primal), "vma", frozenset()
    )
    if extra:
        cotangent = jax.lax.psum(cotangent, tuple(sorted(extra)))
    return cotangent


def _pad_cols(arrs, e, e_pad):
    if e_pad == e:
        return arrs
    return [jnp.pad(a, [(0, 0), (0, e_pad - e)]) for a in arrs]


@functools.lru_cache(maxsize=None)
def _make_fn(plan: TensorProductPlan, block: int, n_out: int, interpret: bool):
    """Single-chunk variant (accumulator covers all n_out nodes)."""

    def _prep(e):
        blk = min(block, e)
        e_pad = int(np.ceil(e / blk)) * blk
        return blk, e_pad

    @jax.custom_vjp
    def fused(x_nodes, sh, w, src, dst):
        e = sh.shape[0]
        blk, e_pad = _prep(e)
        from matten_tpu.kernels.fused_tp import get_kernel_in_dtype

        idt = jnp.dtype(get_kernel_in_dtype())
        xTg = x_nodes.T[:, src]  # [D1, E] lane gather
        xTg, shT, wT = _pad_cols(
            [xTg.astype(idt), sh.T.astype(idt), w.T.astype(idt)], e, e_pad
        )
        # padded edges carry zero sh/w -> zero message; point at node 0
        dst_c = jnp.pad(dst.astype(jnp.int32).reshape(-1, 1), [(0, e_pad - e), (0, 0)])
        own = jnp.zeros(e_pad // blk, dtype=jnp.int32)
        from matten_tpu.kernels.fused_tp import get_agg_matmul_dtype

        call = _build_call(
            plan, e_pad, n_out, blk, n_out, interpret,
            agg_dtype=get_agg_matmul_dtype(),
        )
        aggT = call(own, xTg, shT, wT, dst_c)
        return aggT.T.astype(x_nodes.dtype)

    def fwd(x_nodes, sh, w, src, dst):
        return fused(x_nodes, sh, w, src, dst), (x_nodes, sh, w, src, dst)

    def bwd(res, g):
        x_nodes, sh, w, src, dst = res
        n_in = x_nodes.shape[0]
        e = sh.shape[0]
        blk, e_pad = _prep(e)

        from matten_tpu.kernels.fused_tp import get_kernel_in_dtype

        idt = jnp.dtype(get_kernel_in_dtype())
        gTg = g.T[:, dst]  # [Dout, E] cotangent gathered at destinations
        xTg = x_nodes.T[:, src]
        gTg, xTg, shT, wT = _pad_cols(
            [gTg.astype(idt), xTg.astype(idt), sh.T.astype(idt), w.T.astype(idt)],
            e, e_pad,
        )
        src_c = jnp.pad(src.astype(jnp.int32).reshape(-1, 1), [(0, e_pad - e), (0, 0)])
        own = jnp.zeros(e_pad // blk, dtype=jnp.int32)

        # dx: the transposed plan scattered into SOURCE nodes
        from matten_tpu.kernels.fused_tp import get_agg_matmul_dtype

        dx_call = _build_call(
            plan, e_pad, n_in, blk, n_in, interpret, transpose=True,
            agg_dtype=get_agg_matmul_dtype(),
        )
        dxT = dx_call(own, gTg, shT, wT, src_c)
        dx = dxT.T.astype(x_nodes.dtype)

        # dw: per-edge inner products of the forward accumulators with g
        dw_call = _build_dw_call(plan, e_pad, blk, interpret)
        dwT = dw_call(xTg, shT, gTg)
        dw = dwT.T[:e].astype(w.dtype)

        # dsh via the XLA reference path; XLA dead-code-eliminates this
        # entirely when positions are not differentiated (the usual case —
        # this model family predicts tensors, not forces)
        _, vjp_sh = jax.vjp(
            lambda s: _reference(plan, x_nodes, s, w, src, dst, g.shape[0]), sh
        )
        (dsh,) = vjp_sh(g)
        return (
            _match_vma(dx, x_nodes),
            _match_vma(dsh, sh),
            _match_vma(dw, w),
            None,
            None,
        )

    fused.defvjp(fwd, bwd)
    return fused


@functools.lru_cache(maxsize=None)
def _make_chunked_fn(
    plan: TensorProductPlan, block: int, n_out: int, chunk: int, interpret: bool
):
    """Chunk-aligned variant: arbitrary node counts, VMEM-bounded chunks.

    Requires the collation-produced layout (data/graph.py chunk alignment):
    dst-sorted edges grouped so each `block` of edges targets one `chunk` of
    nodes, plus a source-sorted permutation with the same property.
    """

    @jax.custom_vjp
    def fused(x_nodes, sh, w, src, dst, dst_owner, src_perm, src_owner):
        from matten_tpu.kernels.fused_tp import get_kernel_in_dtype

        e = sh.shape[0]
        assert e % block == 0, (e, block)
        idt = jnp.dtype(get_kernel_in_dtype())
        xTg = x_nodes.T[:, src].astype(idt)
        shT = sh.T.astype(idt)
        wT = w.T.astype(idt)
        dst_c = dst.astype(jnp.int32).reshape(-1, 1)
        from matten_tpu.kernels.fused_tp import get_agg_matmul_dtype

        call = _build_call(
            plan, e, n_out, block, chunk, interpret,
            agg_dtype=get_agg_matmul_dtype(),
        )
        aggT = call(dst_owner, xTg, shT, wT, dst_c)
        return aggT.T.astype(x_nodes.dtype)

    def fwd(x_nodes, sh, w, src, dst, dst_owner, src_perm, src_owner):
        out = fused(x_nodes, sh, w, src, dst, dst_owner, src_perm, src_owner)
        return out, (x_nodes, sh, w, src, dst, dst_owner, src_perm, src_owner)

    def bwd(res, g):
        x_nodes, sh, w, src, dst, dst_owner, src_perm, src_owner = res
        n_in = x_nodes.shape[0]
        e = sh.shape[0]
        from matten_tpu.kernels.fused_tp import get_kernel_in_dtype

        idt = jnp.dtype(get_kernel_in_dtype())

        # dx: transposed plan over the SOURCE-sorted edge view so the
        # scatter is chunk-local (src_perm fill slots point at masked edges
        # whose sh/w are zero -> zero contributions)
        srcp = src[src_perm]
        gTg_p = g.T[:, dst[src_perm]].astype(idt)
        shT_p = sh.T[:, src_perm].astype(idt)
        wT_p = w.T[:, src_perm].astype(idt)
        src_c = srcp.astype(jnp.int32).reshape(-1, 1)
        from matten_tpu.kernels.fused_tp import get_agg_matmul_dtype

        dx_call = _build_call(
            plan, int(src_perm.shape[0]), n_in, block, chunk, interpret,
            transpose=True, agg_dtype=get_agg_matmul_dtype(),
        )
        dxT = dx_call(src_owner, gTg_p, shT_p, wT_p, src_c)
        dx = dxT.T.astype(x_nodes.dtype)

        # dw: per-edge, dst-sorted layout (no scatter)
        xTg = x_nodes.T[:, src].astype(idt)
        shT = sh.T.astype(idt)
        gTg = g.T[:, dst].astype(idt)
        dw_call = _build_dw_call(plan, e, block, interpret)
        dwT = dw_call(xTg, shT, gTg)
        dw = dwT.T.astype(w.dtype)

        _, vjp_sh = jax.vjp(
            lambda s: _reference(plan, x_nodes, s, w, src, dst, g.shape[0]), sh
        )
        (dsh,) = vjp_sh(g)
        return (
            _match_vma(dx, x_nodes),
            _match_vma(dsh, sh),
            _match_vma(dw, w),
            None,
            None,
            None,
            None,
            None,
        )

    fused.defvjp(fwd, bwd)
    return fused


def fits_vmem(plan: TensorProductPlan, n_nodes: int, block: int = EDGE_BLOCK) -> bool:
    """Whether a VMEM-resident [D_out, n_nodes] accumulator applies.

    2x the accumulator (double-buffered output block) + message scratch +
    double-buffered input blocks, against the raised Mosaic limit with ~20%
    headroom for semaphores/stack.
    """
    dout = plan.irreps_out.dim
    d_in = plan.irreps_in1.dim + plan.irreps_in2.dim + plan.weight_numel
    bytes_needed = 4 * (2 * dout * n_nodes + dout * block + 2 * d_in * block)
    return bytes_needed < int(0.8 * _VMEM_LIMIT_BYTES)


def fused_uvu_conv(
    plan: TensorProductPlan,
    x_nodes: jnp.ndarray,
    sh: jnp.ndarray,
    w: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    chunks: Optional[EdgeChunks] = None,
    num_nodes_out: Optional[int] = None,
    block: int = EDGE_BLOCK,
    node_chunk: int = NODE_CHUNK,
    interpret: bool = None,
) -> jnp.ndarray:
    """Aggregated messages [N_out, irreps_out.dim] without materializing them.

    Equivalent to  segment_sum(plan.apply(x_nodes[src], sh, w), dst, N_out).

    `num_nodes_out` (default: x_nodes.shape[0]) sizes the output — under
    node-sharded graph parallelism x_nodes is the halo-gathered global array
    while dst ids and the output are shard-local.

    `chunks` (EdgeChunks from chunk-aligned collation) engages the
    node-chunked accumulator for batches whose [D_out, N] accumulator would
    not fit in VMEM; without it such batches fall back to the XLA tier.
    `interpret=None` follows the global tier config (set_tp_impl).
    """
    if interpret is None:
        from matten_tpu.kernels import fused_tp

        interpret = fused_tp._INTERPRET
    n_out = int(num_nodes_out) if num_nodes_out is not None else x_nodes.shape[0]
    n_in = x_nodes.shape[0]
    # the dx backward scatters into the (possibly halo-gathered) input nodes
    dx_fits = 8 * plan.irreps_in1.dim * n_in < int(0.8 * _VMEM_LIMIT_BYTES)
    if chunks is not None and n_out % node_chunk == 0 and n_out > node_chunk:
        # n_in != n_out (halo-gathered node-sharded input) is fine as long
        # as the input space is chunk-divisible: the dx backward scatters
        # into a chunked [d1, n_in] output driven by the collation's
        # global-space src owner map
        if fits_vmem(plan, node_chunk, block) and n_in % node_chunk == 0:
            return _make_chunked_fn(plan, block, n_out, node_chunk, interpret)(
                x_nodes, sh, w, src, dst,
                chunks.dst_owner, chunks.src_perm, chunks.src_owner,
            )
        _log_fallback(
            plan, "chunked layout rejected", n_in=n_in, n_out=n_out,
            node_chunk=node_chunk, block=block,
        )
        return _reference(plan, x_nodes, sh, w, src, dst, n_out)
    if not (fits_vmem(plan, n_out, block) and dx_fits):
        _log_fallback(
            plan, "accumulator exceeds VMEM and no chunk-aligned collation",
            n_in=n_in, n_out=n_out, block=block,
        )
        return _reference(plan, x_nodes, sh, w, src, dst, n_out)
    return _make_fn(plan, block, n_out, interpret)(x_nodes, sh, w, src, dst)


# ---------------------------------------------------------------------------
# v2: resident-node kernels — in-kernel one-hot gathers + merged dx/dw bwd
# ---------------------------------------------------------------------------
# Measured on v5e (DEVNOTES): the v1 kernels are bandwidth-bound on the
# XLA-side data preparation, not MXU-bound — the [D1, E] source-feature
# gather, the [E, Dw] radial-weight transpose and above all the backward's
# [Dout, E] cotangent gather (~409 MB per layer at the bench batch)
# dominate. v2 eliminates all three:
#   * node features stay RESIDENT in VMEM ([D1, N] whole-array input) and
#     are gathered per edge block by a one-hot matmul on the MXU;
#   * radial weights arrive natively transposed ([Dw, E]) from the
#     transposed ScalarMLP, and the w cotangent leaves transposed;
#   * the backward is ONE kernel over the dst-sorted layout: the output
#     cotangent rides as a chunk-indexed INPUT block (free gather — the
#     same owner map as the forward output), dx accumulates into a
#     resident [D1, N_in] whole-array output via a one-hot scatter matmul
#     (sharing the src one-hot with the x gather), and dw shares the loads.
# Applicable while the node arrays fit VMEM (RESIDENT_NODES_MAX); larger
# batches fall back to the v1 src-sorted chunked machinery.

RESIDENT_NODES_MAX = 2048
SINGLE_ACC_MAX = 1024  # v2 without collation chunk fields (own = zeros)

# m-major slab layout threshold: entries with mul >= this are laid out
# component-major inside the v2 kernels (see _mmaj_layout) — one fma then
# covers all channels of a path component in full vregs instead of one
# partially-filled vreg per (channel, component) pair. 0 disables (exact
# replication of the u-major summation order). DEVNOTES roofline: the
# production plan's assembly drops to ~0.69x (fwd) / ~0.60x (merged bwd)
# of the u-major vreg-op count.
MMAJ_THRESHOLD = 16


def set_mmaj_threshold(t: int) -> None:
    global MMAJ_THRESHOLD
    MMAJ_THRESHOLD = int(t)


def _assemble(metas, ts, xg, wT_read, emit):
    """Per-path message assembly shared by the v2 kernels.

    xg: [d1_kernel_layout, B] gathered features (kernel row layout).
    wT_read(w0, mul) -> [mul, B] radial-weight slab (f32).
    emit(row0, nrows, value) stores (forward: out entries are per-path
    exclusive) or accumulates (transposed: entries collide across paths)
    message rows.
    """
    for m in metas:
        mul, pd1, pd3 = m["mul"], m["d1"], m["d3"]
        t_all, r0 = ts[(m["sh_sl"].start, m["sh_sl"].stop)]
        tb = m["c_sl"].start - r0
        if m.get("kind") == "grp":
            # packed small-mul group: ONE [sum(d3), B] accumulator per
            # channel shared by all paths; per-path radial weight applied
            # on the path's sub-slab
            for u in range(mul):
                x0 = m["x_start"] + u * pd1
                xu = xg[x0 : x0 + pd1, :]
                acc = t_all[tb : tb + pd3, :] * xu[0:1, :]
                for m1 in range(1, pd1):
                    acc = acc + (
                        t_all[tb + m1 * pd3 : tb + (m1 + 1) * pd3, :]
                        * xu[m1 : m1 + 1, :]
                    )
                off = 0
                for w0, d3 in zip(m["w_starts"], m["d3s"]):
                    emit(
                        m["o_base"] + u * pd3 + off,
                        d3,
                        acc[off : off + d3, :] * wT_read(w0 + u, 1),
                    )
                    off += d3
        elif m.get("mmaj"):
            x0, o0, w0 = m["x_start"], m["o_start"], m["w_start"]
            w_slab = wT_read(w0, mul)
            if pd1 <= pd3:
                # pre-scale the pd1 x slabs by w: pd1 mults + pd1*pd3 fmas
                xw = [
                    xg[x0 + m1 * mul : x0 + (m1 + 1) * mul, :] * w_slab
                    for m1 in range(pd1)
                ]
                for m3 in range(pd3):
                    acc = t_all[tb + m3 : tb + m3 + 1, :] * xw[0]
                    for m1 in range(1, pd1):
                        r = tb + m1 * pd3 + m3
                        acc = acc + t_all[r : r + 1, :] * xw[m1]
                    emit(o0 + m3 * mul, mul, acc)
            else:
                # post-scale per output component: pd3 mults
                xs = [
                    xg[x0 + m1 * mul : x0 + (m1 + 1) * mul, :]
                    for m1 in range(pd1)
                ]
                for m3 in range(pd3):
                    acc = t_all[tb + m3 : tb + m3 + 1, :] * xs[0]
                    for m1 in range(1, pd1):
                        r = tb + m1 * pd3 + m3
                        acc = acc + t_all[r : r + 1, :] * xs[m1]
                    emit(o0 + m3 * mul, mul, acc * w_slab)
        else:
            stride = m.get("x_stride", pd1)
            for u in range(mul):
                x0 = m["x_start"] + u * stride
                xu = xg[x0 : x0 + pd1, :]
                acc = t_all[tb : tb + pd3, :] * xu[0:1, :]
                for m1 in range(1, pd1):
                    acc = acc + (
                        t_all[tb + m1 * pd3 : tb + (m1 + 1) * pd3, :]
                        * xu[m1 : m1 + 1, :]
                    )
                w0 = m["w_start"] + u
                o0 = m["o_start"] + u * pd3
                emit(o0, pd3, acc * wT_read(w0, 1))


@functools.lru_cache(maxsize=None)
def _build_fwd2(
    plan: TensorProductPlan,
    n_edges: int,
    n_in: int,
    n_out: int,
    block: int,
    chunk: int,
    interpret: bool,
    mm_dtype: str,
    mmaj: int = 0,
):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n_out % chunk == 0 and n_edges % block == 0
    metas, c_all, _, _ = _plan_metas(plan, mmaj_threshold=mmaj)
    d1 = plan.irreps_in1.dim
    d2 = plan.irreps_in2.dim
    dw = plan.weight_numel
    dout = plan.irreps_out.dim
    grid = (n_edges // block,)
    mdt = jnp.bfloat16 if mm_dtype == "bfloat16" else jnp.float32

    groups = {}
    for idx, m in enumerate(metas):
        groups.setdefault((m["sh_sl"].start, m["sh_sl"].stop), []).append(idx)

    def kernel(own_ref, xall_ref, shT_ref, wT_ref, src_ref, dst_ref, c_ref,
               out_ref, msg_ref):
        i = pl.program_id(0)
        own = own_ref[i]
        prev = own_ref[jnp.maximum(i - 1, 0)]

        @pl.when((i == 0) | (own != prev))
        def _():
            out_ref[:, :] = jnp.zeros(out_ref.shape, out_ref.dtype)

        # source one-hot gather: xg[d1, B] = x_all @ (iota_n == src)
        src_row = src_ref[0:1, :]  # [1, B] int32
        n_iota = jax.lax.broadcasted_iota(jnp.int32, (n_in, block), 0)
        oh_src = (n_iota == src_row).astype(mdt)
        xg = jnp.dot(
            xall_ref[:, :].astype(mdt), oh_src,
            preferred_element_type=jnp.float32,
        )

        dst = dst_ref[:, 0:1] - own * chunk
        node_ids = jax.lax.broadcasted_iota(jnp.int32, (block, chunk), 1)
        oh_dst = (node_ids == dst).astype(mdt)

        ts = {}
        for (a, b), idxs in groups.items():
            y = shT_ref[a:b, :].astype(jnp.float32)
            r0 = metas[idxs[0]]["c_sl"].start
            r1 = metas[idxs[-1]]["c_sl"].stop
            cg = c_ref[r0:r1, : (b - a)]
            ts[(a, b)] = (jnp.dot(cg, y, preferred_element_type=jnp.float32), r0)

        def emit(o0, nrows, val):
            msg_ref[o0 : o0 + nrows, :] = val

        _assemble(
            metas, ts, xg,
            lambda w0, n: wT_ref[w0 : w0 + n, :].astype(jnp.float32),
            emit,
        )

        out_ref[:, :] += jnp.dot(
            msg_ref[:, :].astype(mdt), oh_dst, preferred_element_type=jnp.float32
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((d1, n_in), lambda i, own: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d2, block), lambda i, own: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((dw, block), lambda i, own: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i, own: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i, own: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(c_all.shape, lambda i, own: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (dout, chunk), lambda i, own: (0, own[i]), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((dout, block), jnp.float32)],
    )

    def run(own, xall, shT, wT, src_row, dst_col):
        c_arr = jnp.asarray(c_all)  # per-trace constant (see _build_call)
        vma = frozenset().union(
            *(getattr(jax.typeof(a), "vma", frozenset()) for a in (xall, shT, wT))
        )
        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((dout, n_out), jnp.float32, vma=vma),
            interpret=_interpret_params(interpret),
            compiler_params=_compiler_params(),
        )
        return call(own, xall, shT, wT, src_row, dst_col, c_arr)

    return run


@functools.lru_cache(maxsize=None)
def _build_bwd2(
    plan: TensorProductPlan,
    n_edges: int,
    n_in: int,
    n_out: int,
    block: int,
    chunk: int,
    interpret: bool,
    mm_dtype: str,
    mmaj: int = 0,
):
    """Merged backward: ONE pass over the dst-sorted edge blocks emitting
    dxT [d1, n_in] (resident accumulated output; one-hot scatter shares the
    src one-hot with the x gather) and dwT [dw, E] (per-block columns).
    The output cotangent gT is a chunk-indexed input — the same owner map
    that drives the forward's output blocks."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n_out % chunk == 0 and n_edges % block == 0
    metas, c_all, _, _ = _plan_metas(plan, mmaj_threshold=mmaj)
    metas_t, c_all_t, _, _ = _plan_metas(plan, transpose=True, mmaj_threshold=mmaj)
    d1 = plan.irreps_in1.dim
    d2 = plan.irreps_in2.dim
    dw = plan.weight_numel
    dout = plan.irreps_out.dim
    grid = (n_edges // block,)
    mdt = jnp.bfloat16 if mm_dtype == "bfloat16" else jnp.float32

    def grp(ms):
        g = {}
        for idx, m in enumerate(ms):
            g.setdefault((m["sh_sl"].start, m["sh_sl"].stop), []).append(idx)
        return g

    groups, groups_t = grp(metas), grp(metas_t)

    def kernel(own_ref, xall_ref, gT_ref, shT_ref, wT_ref, src_ref, dst_ref,
               c_ref, ct_ref, dx_ref, dwT_ref, dmsg_ref):
        i = pl.program_id(0)
        own = own_ref[i]

        @pl.when(i == 0)
        def _():
            dx_ref[:, :] = jnp.zeros(dx_ref.shape, dx_ref.dtype)

        # shared one-hots: src (gather x / scatter dx), dst-local (gather g)
        src_row = src_ref[0:1, :]
        n_iota = jax.lax.broadcasted_iota(jnp.int32, (n_in, block), 0)
        oh_src = (n_iota == src_row).astype(mdt)  # [n_in, B]
        dst_loc = dst_ref[0:1, :] - own * chunk  # [1, B]
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (chunk, block), 0)
        oh_g = (c_iota == dst_loc).astype(mdt)  # [C, B]

        xg = jnp.dot(xall_ref[:, :].astype(mdt), oh_src,
                     preferred_element_type=jnp.float32)  # [d1, B]
        gblk = jnp.dot(gT_ref[:, :].astype(mdt), oh_g,
                       preferred_element_type=jnp.float32)  # [dout, B]

        def cg_ts(gps, ms, cref):
            out = {}
            for (a, b), idxs in gps.items():
                y = shT_ref[a:b, :].astype(jnp.float32)
                r0 = ms[idxs[0]]["c_sl"].start
                r1 = ms[idxs[-1]]["c_sl"].stop
                out[(a, b)] = (
                    jnp.dot(cref[r0:r1, : (b - a)], y,
                            preferred_element_type=jnp.float32),
                    r0,
                )
            return out

        ts = cg_ts(groups, metas, c_ref)
        ts_t = cg_ts(groups_t, metas_t, ct_ref)

        # dw: recompute the forward accumulators from xg, inner-product with g
        for m in metas:
            mul, pd1, pd3 = m["mul"], m["d1"], m["d3"]
            t_all, r0 = ts[(m["sh_sl"].start, m["sh_sl"].stop)]
            tb = m["c_sl"].start - r0
            if m.get("kind") == "grp":
                # packed group: shared accumulator recompute, one slab
                # product with g, per-path row reductions
                for u in range(mul):
                    x0 = m["x_start"] + u * pd1
                    xu = xg[x0 : x0 + pd1, :]
                    acc = t_all[tb : tb + pd3, :] * xu[0:1, :]
                    for m1 in range(1, pd1):
                        acc = acc + (
                            t_all[tb + m1 * pd3 : tb + (m1 + 1) * pd3, :]
                            * xu[m1 : m1 + 1, :]
                        )
                    g0 = m["o_base"] + u * pd3
                    prod = acc * gblk[g0 : g0 + pd3, :]
                    off = 0
                    for w0, d3 in zip(m["w_starts"], m["d3s"]):
                        dwT_ref[w0 + u : w0 + u + 1, :] = jnp.sum(
                            prod[off : off + d3, :], axis=0, keepdims=True
                        )
                        off += d3
            elif m.get("mmaj"):
                # slab form: dw[u] = sum_{m1,m3} t(m1,m3) x(u,m1) g(u,m3);
                # contract the cheaper index first
                x0, o0, w0 = m["x_start"], m["o_start"], m["w_start"]
                xs = [
                    xg[x0 + m1 * mul : x0 + (m1 + 1) * mul, :]
                    for m1 in range(pd1)
                ]
                gs = [
                    gblk[o0 + m3 * mul : o0 + (m3 + 1) * mul, :]
                    for m3 in range(pd3)
                ]
                dwv = None
                if pd1 <= pd3:
                    for m1 in range(pd1):
                        tg = t_all[tb + m1 * pd3 : tb + m1 * pd3 + 1, :] * gs[0]
                        for m3 in range(1, pd3):
                            r = tb + m1 * pd3 + m3
                            tg = tg + t_all[r : r + 1, :] * gs[m3]
                        v = xs[m1] * tg
                        dwv = v if dwv is None else dwv + v
                else:
                    for m3 in range(pd3):
                        tx = t_all[tb + m3 : tb + m3 + 1, :] * xs[0]
                        for m1 in range(1, pd1):
                            r = tb + m1 * pd3 + m3
                            tx = tx + t_all[r : r + 1, :] * xs[m1]
                        v = gs[m3] * tx
                        dwv = v if dwv is None else dwv + v
                dwT_ref[w0 : w0 + mul, :] = dwv
            else:
                for u in range(mul):
                    x0 = m["x_start"] + u * pd1
                    xu = xg[x0 : x0 + pd1, :]
                    acc = t_all[tb : tb + pd3, :] * xu[0:1, :]
                    for m1 in range(1, pd1):
                        acc = acc + (
                            t_all[tb + m1 * pd3 : tb + (m1 + 1) * pd3, :]
                            * xu[m1 : m1 + 1, :]
                        )
                    o0 = m["o_start"] + u * pd3
                    gu = gblk[o0 : o0 + pd3, :]
                    w0 = m["w_start"] + u
                    dwT_ref[w0 : w0 + 1, :] = jnp.sum(acc * gu, axis=0, keepdims=True)

        # dx: transposed-plan assembly from g rows, scatter into src columns
        dmsg_ref[:, :] = jnp.zeros(dmsg_ref.shape, dmsg_ref.dtype)

        def emit_dx(o0, nrows, val):
            dmsg_ref[o0 : o0 + nrows, :] += val

        _assemble(
            metas_t, ts_t, gblk,
            lambda w0, n: wT_ref[w0 : w0 + n, :].astype(jnp.float32),
            emit_dx,
        )

        # scatter-accumulate: dxT += dmsg @ oh_src^T  (NT matmul)
        dx_ref[:, :] += jax.lax.dot_general(
            dmsg_ref[:, :].astype(mdt),
            oh_src,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((d1, n_in), lambda i, own: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (dout, chunk), lambda i, own: (0, own[i]), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((d2, block), lambda i, own: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((dw, block), lambda i, own: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i, own: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block), lambda i, own: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(c_all.shape, lambda i, own: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                c_all_t.shape, lambda i, own: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec((d1, n_in), lambda i, own: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dw, block), lambda i, own: (0, i), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((d1, block), jnp.float32)],
    )

    def run(own, xall, gT, shT, wT, src_row, dst_row):
        c_arr = jnp.asarray(c_all)
        ct_arr = jnp.asarray(c_all_t)
        vma = frozenset().union(
            *(
                getattr(jax.typeof(a), "vma", frozenset())
                for a in (xall, gT, shT, wT)
            )
        )
        call = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((d1, n_in), jnp.float32, vma=vma),
                jax.ShapeDtypeStruct((dw, n_edges), jnp.float32, vma=vma),
            ],
            interpret=_interpret_params(interpret),
            compiler_params=_compiler_params(),
        )
        return call(own, xall, gT, shT, wT, src_row, dst_row, c_arr, ct_arr)

    return run


@functools.lru_cache(maxsize=None)
def _make_fn2(
    plan: TensorProductPlan,
    block: int,
    n_in: int,
    n_out: int,
    chunk: int,
    interpret: bool,
    mm_dtype: str,
    mmaj: int = 0,
):
    """v2 custom_vjp: transposed radial weights in/out, merged backward.

    Signature: fused(x_nodes [N_in, d1], sh [E, d2], wT [dw, E], src, dst,
    own [E/block]) — `own` is the dst-chunk owner map (all zeros with
    chunk == n_out for the single-accumulator layout).

    mmaj > 0 runs the kernels in the m-major row layout (_mmaj_layout);
    the static std<->kernel row permutations are applied here, outside the
    kernels (XLA folds the gathers into the adjacent transposes)."""
    lay1 = layo = None
    if mmaj:
        _, _, _, (lay1, layo) = _plan_metas(plan, mmaj_threshold=mmaj)

    def _prep(e):
        blk = min(block, e)
        e_pad = int(np.ceil(e / blk)) * blk
        return blk, e_pad

    def _pad_rows(a, e, e_pad):
        return a if e_pad == e else jnp.pad(a, [(0, 0), (0, e_pad - e)])

    def _perm(aT, lay):
        return aT if lay is None else jnp.take(aT, lay.to_kernel, axis=0)

    def _unperm(aT, lay):
        return aT if lay is None else jnp.take(aT, lay.to_std, axis=0)

    @jax.custom_vjp
    def fused(x_nodes, sh, wT, src, dst, own):
        from matten_tpu.kernels.fused_tp import get_kernel_in_dtype

        e = sh.shape[0]
        blk, e_pad = _prep(e)
        # sh/w edge arrays are the kernels' dominant HBM reads; their
        # STORAGE dtype is the set_kernel_in_dtype knob (kernel bodies
        # upcast to f32 at read time either way)
        idt = jnp.dtype(get_kernel_in_dtype())
        xall = _perm(x_nodes.T.astype(jnp.float32), lay1)
        shT = _pad_rows(sh.T.astype(idt), e, e_pad)
        wTp = _pad_rows(wT.astype(idt), e, e_pad)
        src_row = _pad_rows(src.astype(jnp.int32).reshape(1, -1), e, e_pad)
        dst_col = jnp.pad(
            dst.astype(jnp.int32).reshape(-1, 1), [(0, e_pad - e), (0, 0)]
        )
        call = _build_fwd2(
            plan, e_pad, n_in, n_out, blk, chunk, interpret, mm_dtype, mmaj
        )
        aggT = _unperm(call(own, xall, shT, wTp, src_row, dst_col), layo)
        return aggT.T.astype(x_nodes.dtype)

    def fwd(x_nodes, sh, wT, src, dst, own):
        return fused(x_nodes, sh, wT, src, dst, own), (x_nodes, sh, wT, src, dst, own)

    def bwd(res, g):
        from matten_tpu.kernels.fused_tp import get_kernel_in_dtype

        x_nodes, sh, wT, src, dst, own = res
        e = sh.shape[0]
        blk, e_pad = _prep(e)
        idt = jnp.dtype(get_kernel_in_dtype())
        xall = _perm(x_nodes.T.astype(jnp.float32), lay1)
        gT = _perm(g.T.astype(jnp.float32), layo)
        shT = _pad_rows(sh.T.astype(idt), e, e_pad)
        wTp = _pad_rows(wT.astype(idt), e, e_pad)
        src_row = _pad_rows(src.astype(jnp.int32).reshape(1, -1), e, e_pad)
        dst_row = _pad_rows(dst.astype(jnp.int32).reshape(1, -1), e, e_pad)
        call = _build_bwd2(
            plan, e_pad, n_in, n_out, blk, chunk, interpret, mm_dtype, mmaj
        )
        dxT, dwT = call(own, xall, gT, shT, wTp, src_row, dst_row)
        dx = _unperm(dxT, lay1).T.astype(x_nodes.dtype)
        dw = dwT[:, :e].astype(wT.dtype)

        # dsh via the XLA composition (dead code unless positions are
        # differentiated — this model family predicts tensors, not forces)
        _, vjp_sh = jax.vjp(
            lambda s: _reference(plan, x_nodes, s, wT.T, src, dst, g.shape[0]), sh
        )
        (dsh,) = vjp_sh(g)
        return (
            _match_vma(dx, x_nodes),
            _match_vma(dsh, sh),
            _match_vma(dw, wT),
            None,
            None,
            None,
        )

    fused.defvjp(fwd, bwd)
    return fused


def _v2_vmem_ok(plan: TensorProductPlan, n_in: int, n_out: int, chunk: int,
                block: int) -> bool:
    """VMEM budget of the v2 kernels: resident x_all + dx + the blocked
    operands, with headroom for one-hot temporaries and semaphores."""
    d1 = plan.irreps_in1.dim
    d2 = plan.irreps_in2.dim
    dw = plan.weight_numel
    dout = plan.irreps_out.dim
    resident = d1 * n_in * 2  # x_all + dxT
    blocks = 2 * (d2 + dw + 2) * block + dout * block * 2  # dbl-buffered + msg
    chunks_b = 2 * dout * chunk * 2  # fwd out + bwd gT (double-buffered)
    onehots = (n_in + chunk) * block
    total = 4 * (resident + blocks + chunks_b + onehots)
    return total < int(0.7 * _VMEM_LIMIT_BYTES)


def fused_uvu_conv_t(
    plan: TensorProductPlan,
    x_nodes: jnp.ndarray,
    sh: jnp.ndarray,
    wT: jnp.ndarray,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    chunks: Optional[EdgeChunks] = None,
    num_nodes_out: Optional[int] = None,
    block: int = EDGE_BLOCK,
    node_chunk: int = NODE_CHUNK,
    interpret: bool = None,
) -> jnp.ndarray:
    """fused_uvu_conv with natively transposed radial weights (wT [dw, E]).

    Dispatches to the v2 resident-node kernels when the node arrays fit
    VMEM (including halo-gathered inputs with n_in != n_out); larger
    batches fall back to the v1 machinery/XLA via `fused_uvu_conv`."""
    if interpret is None:
        from matten_tpu.kernels import fused_tp

        interpret = fused_tp._INTERPRET
    from matten_tpu.kernels.fused_tp import get_agg_matmul_dtype

    mm_dtype = get_agg_matmul_dtype()
    n_out = int(num_nodes_out) if num_nodes_out is not None else x_nodes.shape[0]
    n_in = x_nodes.shape[0]
    e = sh.shape[0]
    mmaj = MMAJ_THRESHOLD
    if n_in <= RESIDENT_NODES_MAX:
        if (
            chunks is not None
            and n_out % node_chunk == 0
            and n_out > node_chunk
            and e % block == 0
            and _v2_vmem_ok(plan, n_in, n_out, node_chunk, block)
        ):
            return _make_fn2(
                plan, block, n_in, n_out, node_chunk, interpret, mm_dtype, mmaj
            )(x_nodes, sh, wT, src, dst, chunks.dst_owner)
        if n_out <= SINGLE_ACC_MAX and _v2_vmem_ok(
            plan, n_in, n_out, n_out, block
        ):
            blk = min(block, e)
            e_pad = int(np.ceil(e / blk)) * blk
            own = jnp.zeros(e_pad // blk, dtype=jnp.int32)
            return _make_fn2(
                plan, block, n_in, n_out, n_out, interpret, mm_dtype, mmaj
            )(x_nodes, sh, wT, src, dst, own)
    return fused_uvu_conv(
        plan, x_nodes, sh, wT.T, src, dst,
        chunks=chunks, num_nodes_out=num_nodes_out,
        block=block, node_chunk=node_chunk, interpret=interpret,
    )
