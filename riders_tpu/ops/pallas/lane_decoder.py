"""Pallas TPU kernels for the RC-Net patch decoder in "lane-major" layout.

The decoder runs B*K patches (512 for the ZJU bench, 768 for NTU) at tiny
spatial extents.  XLA's NHWC convolutions collapse on these shapes: the
MXU rate is gated by the output-channel lane occupancy (~27% only at
C_out >= 256, measured 4-7% at the decoder's 16..64 channels), and no
XLA-level rewrite fixes it - space-to-depth phase convs inflate FLOPs
16/9x and still cap near 10% on the patch batch, and a channels-in-lanes
Pallas kernel dies on Mosaic lane rotations (PERF.md round-3 negative
results).

The fix is the layout.  Every decoder tensor here is

    (H, W, C, N)   - H, W untiled; C in sublanes; N = B*K in lanes

so a 3x3 conv tap x[h+dy, w+dx] is an *untiled-dim* slice (free), and the
conv at each position is nine accumulating MXU matmuls

    acc += W[dy,dx] (C_out, C_in)  @  x[h+dy, w+dx] (C_in, N)

with N = 512/768 filling the lane dimension completely regardless of the
channel counts.  Measured on the deconv1 fusion conv (120x50, 64->32,
N=512): 0.54 ms vs 2.83 ms for the XLA conv - and at that point the
kernel is HBM-bound, not compute-bound.

Conventions:
  * tensors carry a zero border (`pad` rows/cols, 1 or 2) on H and W so
    every tap read is in-bounds and SAME zero padding is exact; kernels
    write their own zero borders from the edge programs;
  * DMA offsets on the tiled (C, N) dims are (0, multiple-of-128); H/W
    offsets are untiled and unconstrained;
  * edge blocks clamp their window start to H-TH (recomputing a few rows
    twice rather than branching; outputs are identical);
  * input windows and output blocks are double-buffered, as in
    ops/pallas/roi_pool.py.

Replaces the patch-decode path of RCNet/networks.py:458-778 at inference;
the XLA formulation in models/rcnet.py stays for training and CPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 24 * 2 ** 20
_VMEM_LIMIT = 64 * 2 ** 20


# ---------------------------------------------------------------------------
# Host-side helpers


def to_lane(t: jnp.ndarray, pad: int = 1) -> jnp.ndarray:
    """(N, H, W, C) -> zero-padded (H+2p, W+2p, C, N) bf16."""
    t = jnp.transpose(t.astype(jnp.bfloat16), (1, 2, 3, 0))
    return jnp.pad(t, ((pad, pad), (pad, pad), (0, 0), (0, 0)))


def bn_fold(bn_params, bn_stats, eps: float = 1e-5):
    """Fold BatchNorm into per-channel (scale, bias), f32."""
    g = (bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)).astype(
        jnp.float32)
    b = (bn_params["bias"] - bn_stats["mean"] * g).astype(jnp.float32)
    return g, b


def nearest_resize_lane(x: jnp.ndarray, out_hw: Tuple[int, int]
                        ) -> jnp.ndarray:
    """Nearest resize of a padded (h+2, w+2, C, N) tensor to padded
    (H+2, W+2, C, N), torch floor(i*in/out) semantics (resize2d
    'nearest'), via slice-concats on the untiled dims - no gathers."""
    from riders_tpu.ops.resize import resize_nearest_indices

    H, W = out_hw
    h, w = x.shape[0] - 2, x.shape[1] - 2

    def expand(t, n_in, n_out, axis):
        idx = resize_nearest_indices(n_in, n_out)
        border = t.shape[axis] - 1
        pieces = [jax.lax.slice_in_dim(t, 0, 1, axis=axis)]
        i = 0
        while i < n_out:
            # contiguous ascending run -> one slice
            j = i
            while (j + 1 < n_out and idx[j + 1] == idx[j] + 1):
                j += 1
            if j > i:
                pieces.append(jax.lax.slice_in_dim(
                    t, idx[i] + 1, idx[j] + 2, axis=axis))
                i = j + 1
                continue
            # repeat run -> repeated single slice
            j = i
            while j + 1 < n_out and idx[j + 1] == idx[i]:
                j += 1
            s = jax.lax.slice_in_dim(t, idx[i] + 1, idx[i] + 2, axis=axis)
            pieces.extend([s] * (j - i + 1))
            i = j + 1
        pieces.append(jax.lax.slice_in_dim(t, border, border + 1,
                                           axis=axis))
        return jnp.concatenate(pieces, axis=axis)

    return expand(expand(x, h, H, 0), w, W, 1)


def _pack_conv(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) -> (Co, 9*Ci) bf16, tap-major."""
    return jnp.transpose(k, (3, 0, 1, 2)).reshape(
        k.shape[3], 9 * k.shape[2]).astype(jnp.bfloat16)


def _pack_kstack(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, Co) -> (4, 4*Co, 4*Ci) K-stacked output-phase weights.

    Outputs are computed in 2x2 groups (phases r, s stacked into the
    matmul M dim) against the group's 4x4 input window.  Window row a
    contributes one dot

        acc += W[a] (4Co, 4Ci) @ X_a,   W[a][(r,s)Co, b*Ci] = k[a-r, b-s]

    where X_a = the slab's 4 consecutive window columns of row a,
    (4, Ci, N) reshaped to (4Ci, N) - a free view, W being the
    contiguous dim, so no operand staging at all.  This turns the
    per-position (Co, Ci) dots - M as low as 16 and K 32 - into
    (4Co, 4Ci) @ (4Ci, N) dots that fill the MXU."""
    ci, co = int(k.shape[2]), int(k.shape[3])
    kT = jnp.transpose(k, (0, 1, 3, 2)).astype(jnp.float32)  # (3,3,co,ci)
    z = jnp.zeros((co, ci), jnp.float32)
    rows = []
    for a in range(4):
        phases = []
        for r in range(2):
            for s_ in range(2):
                row = [kT[a - r, b - s_]
                       if (0 <= a - r <= 2 and 0 <= b - s_ <= 2) else z
                       for b in range(4)]
                phases.append(jnp.concatenate(row, axis=1))
        rows.append(jnp.concatenate(phases, axis=0))
    return jnp.stack(rows).astype(jnp.bfloat16)


def _pack_up_kstack(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, F) -> (3, 4F, 3*Ci): nearest-x2+conv phase kernel
    (layers.nearest2x_phase_kernel, output phases in M), one weight per
    coarse window ROW with its three columns K-stacked (the slab's W dim
    is contiguous, so the (3Ci, N) operand is a free view)."""
    from riders_tpu.models.layers import nearest2x_phase_kernel
    kp = nearest2x_phase_kernel(k.astype(jnp.float32))  # (3, 3, Ci, 4F)
    kT = jnp.transpose(kp, (0, 1, 3, 2))  # (3, 3, 4F, Ci)
    return jnp.stack([
        jnp.concatenate([kT[dy, dx] for dx in range(3)], axis=1)
        for dy in range(3)]).astype(jnp.bfloat16)


def _pack_upconv(k: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Ci, F) -> (2, 2, 2, 2, F, Ci) phase-grouped tap weights.

    [r, s, a, b] is the (F, Ci) weight of coarse tap (a, b) for output
    phase (r, s): nearest-x2 maps the fine tap row 2h+r+dy-1 to coarse
    row h + (r+dy-1)//2, so each phase touches a 2x2 coarse window and
    the 3x3 taps landing on the same cell pre-sum (UpConvBlock fast_2x
    semantics, models/layers.py:nearest2x_phase_kernel)."""
    k = k.astype(jnp.float32)
    rows = []
    for r in range(2):
        srow = []
        for s in range(2):
            cells = [[[] for _ in range(2)] for _ in range(2)]
            for dy in range(3):
                a = (r + dy - 1) // 2 + 1 - r  # 0 or 1
                for dx in range(3):
                    b = (s + dx - 1) // 2 + 1 - s
                    cells[a][b].append(k[dy, dx].T)
            srow.append(jnp.stack(
                [jnp.stack([sum(cell) for cell in arow]) for arow in cells]))
        rows.append(jnp.stack(srow))
    return jnp.stack(rows).astype(jnp.bfloat16)


def _sb(scale, bias, co):
    if scale is None:
        scale = jnp.ones((co,), jnp.float32)
        bias = jnp.zeros((co,), jnp.float32)
    return jnp.stack([scale, bias]).reshape(2, co, 1).astype(jnp.float32)


def _fit(th, tw, nb, vmem_fn, gran_h=1, min_tw=2):
    """Shrink (th, tw, nb) until vmem_fn(th, tw, nb) fits the budget."""
    while vmem_fn(th, tw, nb) > _VMEM_BUDGET:
        if tw > min_tw:
            tw = max(min_tw, tw // 2)
        elif nb > 128:
            nb //= 2
        elif th > gran_h:
            th = max(gran_h, (th // 2 // gran_h) * gran_h)
        else:
            break
    return th, tw, nb


def _nb0(N: int) -> int:
    """Largest lane-block size that divides N and fits one vreg set
    (<= 512 lanes); keeps nn * nb == N exact for any patch-bucket N
    (e.g. the NTU bench's B*K = 768 -> 384)."""
    for d in range(min(N, 512), 0, -1):
        if N % d == 0:
            return d
    return N


def _linear_idx(step, ni, nj):
    j = jax.lax.rem(step, nj)
    i = jax.lax.rem(step // nj, ni)
    n = step // (ni * nj)
    return n, i, j


# ---------------------------------------------------------------------------
# Shared kernel pieces


def _drain_out(yv, osems, slot, step, total):
    """Wait the output copies still in flight on the last grid step."""
    @pl.when(step == total - 1)
    def _():
        pltpu.make_async_copy(yv.at[slot], yv.at[slot], osems.at[slot]
                              ).wait()

        @pl.when(total > 1)
        def _():
            o = jax.lax.rem(step + 1, 2)
            pltpu.make_async_copy(yv.at[o], yv.at[o], osems.at[o]).wait()


def _wait_prev_out(yv, osems, slot, step):
    """Before reusing an output slot, wait the copy started 2 steps ago
    (same slot, same block shape, hence the same byte count)."""
    @pl.when(step >= 2)
    def _():
        pltpu.make_async_copy(yv.at[slot], yv.at[slot], osems.at[slot]
                              ).wait()


def _write_borders(y_ref, zrow, zcol, zsem, i, j, ni, nj, H, W, TH, TW,
                   r, q, n0, NB, pad, extra_bottom=0):
    """Zero the `pad`-px border (plus `extra_bottom` rows at the bottom)
    of a padded output from the edge programs.

    Top/bottom strips cover [pad + q, pad + q + TW) columns (their union
    over j covers the interior); column strips span rows [r, r + TH +
    2*pad + extra_bottom) - for non-bottom blocks that overhangs into the
    next blocks' rows, which is harmless because the border columns are
    uniformly zero; the corner blocks fill the corners."""
    P, E = pad, extra_bottom

    def cp(src, dst):
        c = pltpu.make_async_copy(src, dst, zsem)
        c.start()
        c.wait()

    @pl.when(i == 0)
    def _():
        cp(zrow.at[pl.ds(0, P)],
           y_ref.at[pl.ds(0, P), pl.ds(q + P, TW), slice(None),
                    pl.ds(n0, NB)])

    @pl.when(i == ni - 1)
    def _():
        cp(zrow.at[pl.ds(0, P + E)],
           y_ref.at[pl.ds(H + P, P + E), pl.ds(q + P, TW), slice(None),
                    pl.ds(n0, NB)])

    @pl.when(j == 0)
    def _():
        cp(zcol.at[pl.ds(0, TH + 2 * P + E), pl.ds(0, P)],
           y_ref.at[pl.ds(r, TH + 2 * P + E), pl.ds(0, P), slice(None),
                    pl.ds(n0, NB)])

    @pl.when(j == nj - 1)
    def _():
        cp(zcol.at[pl.ds(0, TH + 2 * P + E), pl.ds(0, P)],
           y_ref.at[pl.ds(r, TH + 2 * P + E), pl.ds(W + P, P),
                    slice(None), pl.ds(n0, NB)])

    for cond, (cr, cq) in (
            ((i == 0) & (j == 0), (0, 0)),
            ((i == 0) & (j == nj - 1), (0, W + P))):
        @pl.when(cond)
        def _(cr=cr, cq=cq):
            cp(zcol.at[pl.ds(0, P), pl.ds(0, P)],
               y_ref.at[pl.ds(cr, P), pl.ds(cq, P), slice(None),
                        pl.ds(n0, NB)])
    for cond, cq in (((i == ni - 1) & (j == 0), 0),
                     ((i == ni - 1) & (j == nj - 1), W + P)):
        @pl.when(cond)
        def _(cq=cq):
            cp(zcol.at[pl.ds(0, P + E), pl.ds(0, P)],
               y_ref.at[pl.ds(H + P, P + E), pl.ds(cq, P), slice(None),
                        pl.ds(n0, NB)])


# ---------------------------------------------------------------------------
# Generic multi-input 3x3 conv


def lane_conv3x3(xs: Sequence[jnp.ndarray], ks: Sequence[jnp.ndarray],
                 scale: Optional[jnp.ndarray], bias: Optional[jnp.ndarray],
                 slope: Optional[float], out_pad: int = 1,
                 out_extra_bottom: int = 0,
                 interpret: bool = False) -> jnp.ndarray:
    """SAME 3x3 conv over the channel-concat of padded (H+2, W+2, Ci, N)
    inputs (the DecoderBlock fusion conv, with the concat realized as
    per-input weight slices), + folded-BN scale/bias + leaky_relu(slope)
    (None = linear), returning zero-bordered
    (H+2p+extra, W+2p, Co, N) bf16.

    Outputs are computed in 2x2 groups with the four phases stacked into
    the matmul M dim (_pack_conv16): 16 dots (4Co, Ci) per group instead
    of 4x9 dots (Co, Ci)."""
    H, W = xs[0].shape[0] - 2, xs[0].shape[1] - 2
    N = xs[0].shape[3]
    cis = [int(x.shape[2]) for x in xs]
    co = int(ks[0].shape[3])

    def vmem(th, tw, nb):
        ins = sum(2 * (th + 2) * (tw + 2) * ci * nb * 2 for ci in cis)
        outs = 2 * th * tw * co * nb * 2
        zs = (4 * (th + 10) + 8 * tw) * co * nb * 2
        return ins + outs + zs

    nb0 = _nb0(N)
    th0 = min(max(2, (H // 2) * 2), 12)
    tw0 = min(max(2, (W // 2) * 2), 10)
    th, tw, nb = _fit(th0, tw0, nb0, vmem, gran_h=2)
    tw = max(2, tw - tw % 2)
    ni, nj, nn = -(-H // th), -(-W // tw), N // nb
    ws = [_pack_kstack(k) for k in ks]

    kern = functools.partial(
        _conv_kernel, H=H, W=W, TH=th, TW=tw, NB=nb, cis=cis, co=co,
        slope=slope, pad=out_pad, extra=out_extra_bottom,
        n_inputs=len(xs))
    return pl.pallas_call(
        kern,
        grid=(nn, ni, nj),
        in_specs=[pl.BlockSpec((2, co, 1), lambda n, i, j: (0, 0, 0))]
        + [pl.BlockSpec((4, 4 * co, 4 * ci), lambda n, i, j: (0, 0, 0))
           for ci in cis]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in xs],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (H + 2 * out_pad + out_extra_bottom, W + 2 * out_pad, co, N),
            jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((2, th + 2, tw + 2, ci, nb),
                                   jnp.bfloat16) for ci in cis]
        + [pltpu.VMEM((2, th, tw, co, nb), jnp.bfloat16),
           pltpu.VMEM((8, tw, co, nb), jnp.bfloat16),
           pltpu.VMEM((th + 10, 4, co, nb), jnp.bfloat16),
           pltpu.SemaphoreType.DMA((len(xs), 2)),
           pltpu.SemaphoreType.DMA((2,)),
           pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(_sb(scale, bias, co), *ws, *xs)


def _conv_kernel(*refs, H, W, TH, TW, NB, cis, co, slope, pad, extra,
                 n_inputs):
    sb_ref = refs[0]
    ws = refs[1:1 + n_inputs]
    xs = refs[1 + n_inputs:1 + 2 * n_inputs]
    y_ref = refs[1 + 2 * n_inputs]
    xvs = refs[2 + 2 * n_inputs:2 + 3 * n_inputs]
    yv, zrow, zcol, sems, osems, zsem = refs[2 + 3 * n_inputs:]

    nn, ni, nj = pl.num_programs(0), pl.num_programs(1), pl.num_programs(2)
    n, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    step = (n * ni + i) * nj + j

    def offs(n_, i_, j_):
        return (jnp.minimum(i_ * TH, H - TH),
                jnp.minimum(j_ * TW, W - TW), n_ * NB)

    def dma_in(k, slot, n_, i_, j_):
        r, q, n0 = offs(n_, i_, j_)
        return pltpu.make_async_copy(
            xs[k].at[pl.ds(r, TH + 2), pl.ds(q, TW + 2), slice(None),
                     pl.ds(n0, NB)],
            xvs[k].at[slot], sems.at[k, slot])

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        for k in range(n_inputs):
            dma_in(k, 0, n, i, j).start()
        zrow[...] = jnp.zeros_like(zrow)
        zcol[...] = jnp.zeros_like(zcol)

    @pl.when(step + 1 < nn * ni * nj)
    def _():
        n2, i2, j2 = _linear_idx(step + 1, ni, nj)
        for k in range(n_inputs):
            dma_in(k, jax.lax.rem(step + 1, 2), n2, i2, j2).start()

    for k in range(n_inputs):
        dma_in(k, slot, n, i, j).wait()

    _wait_prev_out(yv, osems, slot, step)

    # 2x2 output groups: group (pc, qc) covers fine rows 2pc..2pc+1; its
    # 4x4 input window starts at slab index (2pc, 2qc) (slab origin is
    # one halo cell before the block).  Window column b K-stacks its
    # four rows into one (4Ci, NB) operand (_pack_kstack).
    sc = jnp.concatenate([sb_ref[0]] * 4, axis=0)
    bi = jnp.concatenate([sb_ref[1]] * 4, axis=0)
    for pc in range(TH // 2):
        for qc in range(TW // 2):
            acc = None
            for k in range(n_inputs):
                for a in range(4):
                    X = xvs[k][slot, 2 * pc + a,
                               pl.ds(2 * qc, 4)].reshape(4 * cis[k], NB)
                    t = jax.lax.dot_general(
                        ws[k][a], X, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = t if acc is None else acc + t
            acc = acc * sc + bi
            if slope is not None:
                acc = jnp.where(acc > 0, acc, slope * acc)
            accb = acc.astype(jnp.bfloat16)
            for r in range(2):
                for s in range(2):
                    rs = r * 2 + s
                    yv[slot, 2 * pc + r, 2 * qc + s] = (
                        accb[rs * co:(rs + 1) * co])

    r, q, n0 = offs(n, i, j)
    pltpu.make_async_copy(
        yv.at[slot],
        y_ref.at[pl.ds(r + pad, TH), pl.ds(q + pad, TW), slice(None),
                 pl.ds(n0, NB)],
        osems.at[slot]).start()

    if pad:
        _write_borders(y_ref, zrow, zcol, zsem, i, j, ni, nj, H, W, TH, TW,
                       r, q, n0, NB, pad, extra)
    _drain_out(yv, osems, slot, step, nn * ni * nj)


# ---------------------------------------------------------------------------
# Fused nearest-x2-upsample + 3x3 conv (UpConvBlock fast path)


def lane_upconv2x(x: jnp.ndarray, k: jnp.ndarray, scale: jnp.ndarray,
                  bias: jnp.ndarray, slope: Optional[float],
                  out_pad: int = 1, interpret: bool = False) -> jnp.ndarray:
    """UpConvBlock fast path in lane layout: x padded (h+2, w+2, Ci, N) ->
    padded (2h+2p, 2w+2p, F, N); k (3, 3, Ci, F).  Each coarse cell's
    four output phases compute as 9 stacked dots (4F, Ci) against the
    3x3 coarse window (_pack_up9)."""
    h, w = x.shape[0] - 2, x.shape[1] - 2
    N = x.shape[3]
    ci, f = int(k.shape[2]), int(k.shape[3])
    H, W = 2 * h, 2 * w

    def vmem(th, tw, nb):
        ins = 2 * (th // 2 + 2) * (tw // 2 + 2) * ci * nb * 2
        outs = 2 * th * tw * f * nb * 2
        zs = (2 * (th + 6) + 4 * tw) * f * nb * 2
        return ins + outs + zs

    nb0 = _nb0(N)
    th, tw, nb = _fit(min(H, 12), min(W, 10), nb0, vmem, gran_h=2)
    tw = max(2, tw - tw % 2)
    ni, nj, nn = -(-H // th), -(-W // tw), N // nb

    kern = functools.partial(_upconv_kernel, H=H, W=W, TH=th, TW=tw, NB=nb,
                             ci=ci, f=f, slope=slope, pad=out_pad)
    return pl.pallas_call(
        kern,
        grid=(nn, ni, nj),
        in_specs=[pl.BlockSpec((2, f, 1), lambda n, i, j: (0, 0, 0)),
                  pl.BlockSpec((3, 4 * f, 3 * ci), lambda n, i, j: (0, 0, 0)),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(
            (H + 2 * out_pad, W + 2 * out_pad, f, N), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, th // 2 + 2, tw // 2 + 2, ci, nb), jnp.bfloat16),
            pltpu.VMEM((2, th, tw, f, nb), jnp.bfloat16),
            pltpu.VMEM((4, tw, f, nb), jnp.bfloat16),
            pltpu.VMEM((th + 6, 2, f, nb), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(_sb(scale, bias, f), _pack_up_kstack(k), x)


def _upconv_kernel(sb_ref, w_ref, x_ref, y_ref, xv, yv, zrow, zcol, sems,
                   osems, zsem, *, H, W, TH, TW, NB, ci, f, slope, pad):
    nn, ni, nj = pl.num_programs(0), pl.num_programs(1), pl.num_programs(2)
    n, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    step = (n * ni + i) * nj + j

    def offs(n_, i_, j_):
        # H, W, TH, TW even -> r, q even (phase alignment)
        return (jnp.minimum(i_ * TH, H - TH),
                jnp.minimum(j_ * TW, W - TW), n_ * NB)

    def dma_in(slot, n_, i_, j_):
        r, q, n0 = offs(n_, i_, j_)
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(r // 2, TH // 2 + 2), pl.ds(q // 2, TW // 2 + 2),
                     slice(None), pl.ds(n0, NB)],
            xv.at[slot], sems.at[slot])

    slot = jax.lax.rem(step, 2)

    @pl.when(step == 0)
    def _():
        dma_in(0, n, i, j).start()
        zrow[...] = jnp.zeros_like(zrow)
        zcol[...] = jnp.zeros_like(zcol)

    @pl.when(step + 1 < nn * ni * nj)
    def _():
        n2, i2, j2 = _linear_idx(step + 1, ni, nj)
        dma_in(jax.lax.rem(step + 1, 2), n2, i2, j2).start()

    dma_in(slot, n, i, j).wait()
    _wait_prev_out(yv, osems, slot, step)

    # coarse cell (pc, qc) -> fine 2x2 at (2pc, 2qc); 3x3 coarse window
    # starts at slab (pc, qc) (slab origin = one coarse halo cell);
    # window column dx K-stacks its three rows (_pack_up_kstack).
    sc = jnp.concatenate([sb_ref[0]] * 4, axis=0)
    bi = jnp.concatenate([sb_ref[1]] * 4, axis=0)
    for pc in range(TH // 2):
        for qc in range(TW // 2):
            acc = None
            for dy in range(3):
                X = xv[slot, pc + dy, pl.ds(qc, 3)].reshape(3 * ci, NB)
                t = jax.lax.dot_general(
                    w_ref[dy], X, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = t if acc is None else acc + t
            acc = acc * sc + bi
            if slope is not None:
                acc = jnp.where(acc > 0, acc, slope * acc)
            accb = acc.astype(jnp.bfloat16)
            for r in range(2):
                for s in range(2):
                    rs = r * 2 + s
                    yv[slot, 2 * pc + r, 2 * qc + s] = (
                        accb[rs * f:(rs + 1) * f])

    r, q, n0 = offs(n, i, j)
    pltpu.make_async_copy(
        yv.at[slot],
        y_ref.at[pl.ds(r + pad, TH), pl.ds(q + pad, TW), slice(None),
                 pl.ds(n0, NB)],
        osems.at[slot]).start()

    if pad:
        _write_borders(y_ref, zrow, zcol, zsem, i, j, ni, nj, H, W, TH, TW,
                       r, q, n0, NB, pad)
    _drain_out(yv, osems, slot, step, nn * ni * nj)
