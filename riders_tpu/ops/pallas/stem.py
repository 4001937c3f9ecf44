"""Pallas TPU kernel: fused stride-2 stem conv + BN + leaky-relu.

The RC-Net image encoder opens with a 7x7/s2 conv on 3 channels
(RCNet/networks.py:82-97 via net_utils.Conv2d).  XLA's direct conv is
MXU-hostile at C_in=3 (the contraction dim is 3) and its layout choices
bracket the op with relayout copies: on the 640x512 bench the stem cluster
(conv + copies) costs ~4.5 ms/call of 36 - the single largest line item
(PERF.md).  This kernel computes the same stem as an im2col matmul,
with the BatchNorm folded into the weights and the leaky-relu fused.

Two layout tricks make the im2col free of strided access (PERF.md's key
negative result: strided slices are dead on arrival on this chip):

* **Row pairs**: row-major (rows, X) pairs up under reshape(rows/2, 2*X),
  so a stride-2 7-tap row window reads 4 *consecutive* pair-rows; done on
  the host side where the reshape is free.
* **Tap-major columns**: the host pre-transposes each padded row from
  (col, ch) to (s, col_pair) with s = (col_parity*Cin + ch): a stride-2
  7-tap column window then reads 4 *consecutive* col-pair lanes per s.
  In-kernel the im2col concatenates the n_q pair-row blocks along
  sublanes (offset-0, tile-aligned) and the n_j col-pair shifts become
  lane-sliced operands of n_j accumulated MXU contractions per row.

The 7x7xCin kernel is scattered into the same (pair-row, row-parity,
pair-col, col-parity, ch) slot order at trace time (structural zeros for
the out-of-range taps).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fold_kernel_slots(w_slots: jnp.ndarray, n_j: int, cout: int
                       ) -> jnp.ndarray:
    """Combine the n_j col-pair slot matrices into n_j + 3 phase-combined
    matrices for the W-FOLDED output form (lane = (w%4)*Cout + c).

    Folded output column w = 4q + a taps phase-sorted operand lanes
    (a+j)%4 * Wq + q + (a+j)//4; slices with equal s = a + j coincide, so
    one dot per s serves all four output phase groups at full 128-lane
    occupancy: w_comb[s][:, a*Cout:(a+1)*Cout] = w_slots[s - a]."""
    K = w_slots.shape[1]
    w_comb = jnp.zeros((n_j + 3, K, 4 * cout), w_slots.dtype)
    for s in range(n_j + 3):
        for a in range(4):
            j = s - a
            if 0 <= j < n_j:
                w_comb = w_comb.at[s, :, a * cout:(a + 1) * cout].set(
                    w_slots[j])
    return w_comb


def _scatter_kernel_slots(kernel: jnp.ndarray, k: int, n_q: int,
                          n_j: int, su: int) -> jnp.ndarray:
    """(k, k, Cin, Cout) conv kernel -> (n_j, n_q*su, Cout) im2col slot
    matrices, one per col-pair shift j.  Slot (q, u) with
    u = e*(2*Cin) + w2*Cin + ch taps dy = 2q + e - 1, dx = 2j + w2;
    out-of-range taps and the sublane padding u >= 4*Cin are zero.

    (A round-3 variant moved the j shifts into host-side stacked operand
    copies to avoid Mosaic's unaligned lane slices - it measured WORSE:
    +0.6 ms in-kernel from the 4x operand DMA and +1.5 ms of host
    stacking copies.  The per-row dot's N=32 output lanes, not the lane
    shifts, bound this kernel.)"""
    Cin, Cout = kernel.shape[2], kernel.shape[3]
    w = jnp.zeros((n_j, n_q, su, Cout), kernel.dtype)
    for q in range(n_q):
        for e in range(2):
            dy = 2 * q + e - 1
            if not 0 <= dy < k:
                continue
            for j in range(n_j):
                for w2 in range(2):
                    dx = 2 * j + w2
                    if not 0 <= dx < k:
                        continue
                    u = e * 2 * Cin + w2 * Cin
                    w = w.at[j, q, u:u + Cin].set(kernel[dy, dx])
    return w.reshape(n_j, n_q * su, Cout)


@functools.partial(
    jax.jit,
    static_argnames=("k", "negative_slope", "clip_max", "block_rows",
                     "pad_to", "fill", "lead", "pool", "fold_w",
                     "interpret"))
def stem_conv_pallas(image: jnp.ndarray,
                     kernel: jnp.ndarray,
                     scale: jnp.ndarray,
                     bias: jnp.ndarray,
                     k: int = 7,
                     negative_slope: float = 0.2,
                     clip_max: float | None = None,
                     block_rows: int = 16,
                     pad_to: Tuple[int, int] = (0, 0),
                     fill: float = -1e30,
                     lead: int | None = None,
                     pool: bool = False,
                     fold_w: bool = False,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused stem: leaky_relu(conv_{k x k, s2}(x) * scale + bias),
    optionally clipped at `clip_max` (relu6 = slope 0 + clip 6).

    `lead` is the number of padded rows/cols BEFORE the first input pixel
    (the conv's top/left padding): (k-1)//2 for symmetric torch-style
    SAME (the default), 0 for TF-style 'SAME' on even extents (the
    asymmetric pad the efficientnet stem uses).

    Args:
      image: (B, H, W, Cin) input (any float dtype; computed in bf16).
      kernel: (k, k, Cin, Cout) conv kernel.
      scale, bias: (Cout,) folded BatchNorm: scale = gamma/sqrt(var+eps),
        bias = beta - mean*scale.  Pass ones/zeros for a bias-free conv.
      k: kernel size with k % 4 == 3 (3, 7, 11...; the pair-row mapping
        needs an odd SAME pad).
      pad_to: minimum (rows, cols) of the output canvas.  Extra rows/cols
        beyond the conv output are written as `fill` IN the kernel, so a
        consumer that wants a fill-padded canvas (the RoI pooling kernel's
        flat view) reads the output without any slice/pad/relayout pass -
        slicing this buffer back to the conv extent cost ~1.4 ms/call on
        the 640x512 bench (PERF.md).  Rows round up to a block multiple;
        cols are exact (fold_w: round up to 8).
      fold_w: emit the canvas (and the fused pool output) W-FOLDED:
        shape (B, rows, ceil(Wo2/4), 4*Cout) with lane (w%4)*Cout + c
        holding column w = 4q + c at sublane-row q.  At Cout=32 this
        packs the 128-lane tiles densely (the standard NHWC canvas is
        physically 4x lane-padded), the kernel's dots run at full
        128-lane occupancy via phase-combined weights (they are N=32-
        bound otherwise), and the folded-input RoI pool kernel consumes
        the canvas with no flatten relayout (the canvas->flat copies
        cost 2.5 ms/call on the ZJU bench, PERF.md round 4).  Requires
        Cout * 4 == 128-lane alignment, i.e. Cout in (8, 16, 32).
    Returns:
      (B, max_rows, max(ceil(W/2), pad_cols), Cout) bf16; the conv result
      lives in [:, :ceil(H/2), :ceil(W/2), :].  (fold_w: the folded
      shapes above; with `pool` the pooled map is folded the same way.)
    """
    assert k % 2 == 1
    B, H, W, Cin = image.shape
    Cout = kernel.shape[-1]
    Ho, Wo = -(-H // 2), -(-W // 2)
    Wo2 = max(Wo, pad_to[1])
    TR = block_rows
    Hp2, Wp2 = -(-Ho // 2), -(-Wo // 2)
    if fold_w:
        # the folded lane dim must be one full tile for the lane rolls
        assert 4 * Cout == 128, Cout
        # even folded width for the pool's sublane-pair bitcast
        Wo2 = -(-Wo2 // 8) * 8
    if pool:
        # MaxPool2d(3, 2, 1) of the conv output is emitted from the same
        # kernel (the canvas stays in VMEM anyway); the pooled row tiling
        # must be exact, so pick the largest TR with
        # ceil(Ho/TR)*(TR//2) == ceil(Ho/2).
        for TR in (16, 8, 4, 2):
            if -(-Ho // TR) * (TR // 2) == Hp2:
                break
        # the sublane-pair bitcast needs an even canvas width; one more
        # fill column is invisible to the canvas consumers
        Wo2 += Wo2 % 2
    # folded canvas geometry: OC x CL is the per-row output tile
    OC = Wo2 // 4 if fold_w else Wo2
    CL = 4 * Cout if fold_w else Cout
    Wpq = -(-Wp2 // 4) if fold_w else Wp2
    if lead is None:
        lead = (k - 1) // 2           # symmetric SAME padding
    # window tap dx spans [0, k) from padded col 2c, so the group count
    # covers padded cols up to 2c + k - 1
    n_j = (k + 1) // 2                # pair-col groups per window
    n_q = (k + 1) // 2                # pair-rows per window
    S = 2 * Cin                       # tap-rows per (pair-col) lane
    # Sublane rows per merged pair-row, padded to the bf16 tile (16) so
    # the im2col concatenates full tile-aligned blocks (Mosaic cannot
    # concatenate at unaligned sublane offsets).
    SU = -(-2 * S // 16) * 16

    # ---- host-side layout prep (cheap XLA pad/reshape/transpose) ----
    # Columns: `lead` zeros, data, zero tail to a pair count that is a
    # multiple of 128 (lane tiling) and covers the last window.
    n_pairs_w = -(-max(Wo2 + n_j - 1, (W + lead + 1) // 2) // 128) * 128
    # Rows: stored = orig + lead + 1 puts output row r's taps at stored
    # pairs r..r+n_q-1.
    row_lead = lead + 1
    n_blocks = -(-Ho // TR)                       # blocks that compute
    n_blocks_out = -(-max(Ho, pad_to[0]) // TR)   # incl. pure-fill blocks
    n_pairs_h = n_blocks * TR + n_q
    rows_sto = 2 * n_pairs_h

    x = image.astype(jnp.bfloat16)
    x = jnp.pad(x, ((0, 0), (row_lead, rows_sto - row_lead - H),
                    (lead, 2 * n_pairs_w - lead - W), (0, 0)))
    # (B, rows, 2*n_pairs_w, Cin) -> (B, rows, n_pairs_w, S) -> transpose
    # taps into sublanes -> merge row pairs -> pad taps to the sublane
    # tile (all free except the minor transpose, which XLA runs at
    # memory bandwidth).
    if fold_w:
        # Phase-sorted lanes: col-pair p = 4q + a lands at lane
        # a*Wq + q, so the folded output's four phase groups read
        # CONTIGUOUS lane slices (one per s = a + j).  Same bytes moved
        # as the plain minor transpose below.
        Wq = n_pairs_w // 4
        x = x.reshape(B, rows_sto, Wq, 4, S)
        x = jnp.transpose(x, (0, 1, 4, 3, 2))
        x = x.reshape(B, n_pairs_h, 2 * S, 4, Wq)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, SU - 2 * S), (0, 0), (0, 0)))
        x = x.reshape(B, n_pairs_h, SU, n_pairs_w)
    else:
        Wq = 0
        x = x.reshape(B, rows_sto, n_pairs_w, S)
        x = jnp.transpose(x, (0, 1, 3, 2))
        x = x.reshape(B, n_pairs_h, 2 * S, n_pairs_w)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, SU - 2 * S), (0, 0)))

    w_slots = _scatter_kernel_slots(
        kernel.astype(jnp.float32) * scale.astype(jnp.float32)[None, None,
                                                               None, :],
        k, n_q, n_j, SU)
    if fold_w:
        w_slots = _fold_kernel_slots(w_slots, n_j, Cout)
    w_slots = w_slots.astype(jnp.bfloat16)
    n_dots = n_j + 3 if fold_w else n_j
    b_row = bias.astype(jnp.float32).reshape(1, Cout)
    if fold_w:
        b_row = jnp.tile(b_row, (1, 4))

    dma_pairs = TR + n_q

    fill_f = float(fill)

    def kern(x_ref, w_ref, b_ref, *refs):
        if pool:
            out_ref, pool_ref, buf, sem, carry = refs
        else:
            (out_ref, buf, sem), pool_ref = refs, None
        bb = pl.program_id(0)
        nr = pl.num_programs(1)
        rb = pl.program_id(1)
        r0 = rb * TR
        step = bb * nr + rb

        def dma_in(slot, bb_, rb_):
            return pltpu.make_async_copy(
                x_ref.at[bb_, pl.ds(rb_ * TR, dma_pairs), :, :],
                buf.at[slot], sem.at[slot])

        slot = jax.lax.rem(step, 2)

        @pl.when((step == 0) & (r0 < Ho))
        def _():
            dma_in(0, bb, rb).start()

        # prefetch the next computing block's window (skip fill blocks)
        nxt = step + 1

        @pl.when(nxt < pl.num_programs(0) * nr)
        def _():
            bb2 = nxt // nr
            rb2 = jax.lax.rem(nxt, nr)

            @pl.when(rb2 * TR < Ho)
            def _():
                dma_in(jax.lax.rem(nxt, 2), bb2, rb2).start()

        @pl.when(r0 >= Ho)
        def _():
            out_ref[0] = jnp.full((TR, OC, CL), fill_f, out_ref.dtype)

        @pl.when(r0 < Ho)
        def _():
            dma_in(slot, bb, rb).wait()

            # im2col rows: output row r0+t taps stored pair-rows
            # t..t+n_q-1 (offset-0 sublane concat of full SU blocks); the
            # n_j col-pair shifts become lane-sliced matmul operands
            # accumulated below, so no concatenation ever mixes offsets.
            t = jnp.concatenate([buf[slot, q:q + TR] for q in range(n_q)],
                                axis=1)         # (TR, n_q*SU, n_pairs_w)

            b = b_ref[...]
            if fold_w:
                # validity of folded column w = 4q + lane//Cout
                col_ok = (
                    4 * jax.lax.broadcasted_iota(jnp.int32, (OC, CL), 0)
                    + jax.lax.broadcasted_iota(jnp.int32, (OC, CL), 1)
                    // Cout) < Wo
            else:
                col_ok = (jax.lax.broadcasted_iota(jnp.int32, (Wo2, 1), 0)
                          < Wo)
            rows = []
            for tt in range(TR):
                acc = jnp.zeros((OC, CL), jnp.float32)
                if fold_w:
                    # one dot per s = a + j at full 128-lane occupancy
                    # (phase-combined weights, _fold_kernel_slots)
                    for s in range(n_dots):
                        base = (s % 4) * Wq + s // 4
                        acc = acc + jax.lax.dot_general(
                            t[tt, :, base:base + OC], w_ref[s],
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                else:
                    for j in range(n_j):
                        acc = acc + jax.lax.dot_general(
                            t[tt, :, j:j + Wo2], w_ref[j],
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                acc = acc + b
                acc = jnp.maximum(acc, negative_slope * acc)
                if clip_max is not None:
                    acc = jnp.minimum(acc, clip_max)
                val = jnp.where(col_ok & (r0 + tt < Ho),
                                acc.astype(out_ref.dtype),
                                jnp.asarray(fill_f, out_ref.dtype))
                out_ref[0, tt] = val
                rows.append(val)

            if pool and fold_w:
                # MaxPool2d(3, 2, 1) on the FOLDED rows.  Row taps as in
                # the unfolded branch below.  Column taps: pooled column
                # p = 4pq + pa taps w = 8pq + 2pa + {-1, 0, 1}, i.e.
                # folded rows q = 2pq(+1) (the sublane-pair bitcast
                # gives the even/odd q split elementwise) at lane groups
                # a = (2pa + d) % 4 - reached with STATIC lane rolls
                # T_g (source group (pa+g)%4 into output group pa) and
                # per-group selects.
                prev = jnp.where(r0 == 0,
                                 jnp.full((OC, CL), fill_f, jnp.bfloat16),
                                 carry[...])
                a_lane = jax.lax.broadcasted_iota(
                    jnp.int32, (OC // 2, CL), 1) // Cout
                first = (jax.lax.broadcasted_iota(
                    jnp.int32, (OC // 2, CL), 0) == 0)
                for p in range(TR // 2):
                    above = rows[2 * p - 1] if p > 0 else prev
                    rm = jnp.maximum(jnp.maximum(rows[2 * p],
                                                 rows[2 * p + 1]), above)
                    xi = pltpu.bitcast(rm, jnp.int32)   # (OC//2, CL)
                    Ts = [xi] + [pltpu.roll(xi, CL - g * Cout, 1)
                                 for g in (1, 2, 3)]

                    def ev(g):
                        return pltpu.bitcast(
                            (Ts[g] & 0xFFFF).astype(jnp.uint16),
                            jnp.bfloat16)

                    def od(g, prev_row=False):
                        ti = pltpu.roll(Ts[g], 1, 0) if prev_row else Ts[g]
                        o = pltpu.bitcast(
                            ((ti >> 16) & 0xFFFF).astype(jnp.uint16),
                            jnp.bfloat16)
                        if prev_row:
                            o = jnp.where(
                                first, jnp.asarray(fill_f, jnp.bfloat16),
                                o)
                        return o

                    def bysel(v0, v1, v2, v3):
                        return jnp.where(
                            a_lane == 0, v0,
                            jnp.where(a_lane == 1, v1,
                                      jnp.where(a_lane == 2, v2, v3)))

                    e0, e1, e2 = ev(0), ev(1), ev(2)
                    o0, o2, o3 = od(0), od(2), od(3)
                    tap1 = bysel(od(3, True), e0, e1, o2)   # d = -1
                    tap2 = bysel(e0, e1, o2, o3)            # d = 0
                    tap3 = bysel(e1, e2, o3, o0)            # d = +1
                    pm = jnp.maximum(jnp.maximum(tap1, tap2), tap3)
                    pool_ref[0, p] = pm[:Wpq]
                carry[...] = rows[TR - 1]
            elif pool:
                # MaxPool2d(3, 2, 1) over the conv rows just produced.
                # Row taps {2p-1, 2p, 2p+1}: the -1 tap of the block's
                # first pooled row is the previous block's last conv row
                # (carried in scratch; -inf-like fill at the frame top).
                # Column taps: adjacent sublanes pack into one 32-bit
                # lane under a bf16->int32 bitcast, so the stride-2
                # even/odd split is elementwise - no strided access.
                prev = jnp.where(r0 == 0,
                                 jnp.full((Wo2, Cout), fill_f,
                                          jnp.bfloat16),
                                 carry[...])
                for p in range(TR // 2):
                    above = rows[2 * p - 1] if p > 0 else prev
                    rm = jnp.maximum(jnp.maximum(rows[2 * p],
                                                 rows[2 * p + 1]), above)
                    xi = pltpu.bitcast(rm, jnp.int32)   # (Wo2//2, Cout)
                    even = pltpu.bitcast(
                        (xi & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
                    odd = pltpu.bitcast(
                        ((xi >> 16) & 0xFFFF).astype(jnp.uint16),
                        jnp.bfloat16)
                    # odd[o-1] via a 32-bit roll of the packed pairs
                    # (sub-32-bit rotates are unsupported)
                    osh = pltpu.bitcast(
                        ((pltpu.roll(xi, 1, 0) >> 16) & 0xFFFF
                         ).astype(jnp.uint16), jnp.bfloat16)
                    first = (jax.lax.broadcasted_iota(
                        jnp.int32, (Wo2 // 2, 1), 0) == 0)
                    osh = jnp.where(first,
                                    jnp.asarray(fill_f, jnp.bfloat16),
                                    osh)
                    pm = jnp.maximum(jnp.maximum(even, odd), osh)
                    pool_ref[0, p] = pm[:Wp2]
                carry[...] = rows[TR - 1]

    scratch = [pltpu.VMEM((2, dma_pairs, SU, n_pairs_w), jnp.bfloat16),
               pltpu.SemaphoreType.DMA((2,))]
    out_shapes = jax.ShapeDtypeStruct((B, n_blocks_out * TR, OC, CL),
                                      jnp.bfloat16)
    out_specs = pl.BlockSpec((1, TR, OC, CL), lambda b, r: (b, r, 0, 0))
    if pool:
        # The pooled rows tile exactly (TR selection above); the pure-
        # fill canvas blocks (r >= n_blocks) clamp onto the last real
        # pooled block, which Mosaic treats as a consecutive revisit -
        # the kernel leaves the buffer untouched and it is rewritten
        # unchanged.
        out_shapes = (out_shapes,
                      jax.ShapeDtypeStruct((B, Hp2, Wpq, CL),
                                           jnp.bfloat16))
        out_specs = (out_specs,
                     pl.BlockSpec((1, TR // 2, Wpq, CL),
                                  lambda b, r: (b, min(r, n_blocks - 1)
                                                if isinstance(r, int)
                                                else jnp.minimum(
                                                    r, n_blocks - 1),
                                                0, 0)))
        scratch += [pltpu.VMEM((OC, CL), jnp.bfloat16)]

    out = pl.pallas_call(
        kern,
        grid=(B, n_blocks_out),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((n_dots, n_q * SU, CL), lambda b, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CL), lambda b, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, w_slots, b_row)

    return out
