"""W-folded (space-to-depth along W) convolution primitives.

TPU convs with few channels waste the MXU: the contraction dim
(Kh*Kw*C_in) and the output lanes (C_out) both sit far below the
128-lane tile, and XLA inserts layout copies between the low-channel
and high-channel worlds (PERF.md round-4 rollup: the SML stage burns
7.65 ms/call for <0.3 TFLOP).  Folding W by F re-expresses the SAME
linear ops on a (B, H, W/F, F*C) canvas whose channel dim is F times
wider:

    x_f[b, h, w', f*C + c] = x[b, h, F*w' + f, c]

which for a row-major (W, C) trailing block is exactly
``x.reshape(B, H, W // F, F * C)`` - fold/unfold are free reshapes, the
same lane convention the Pallas stem kernel emits (ops/pallas/stem.py,
PERF.md step 16).

A conv with W-stride s maps an F_in-folded input to an (F_in/s)-folded
output.  Writing t = s*f_out + kw - pad_left and (q, r) = divmod(t, F_in),
the original kernel tap kw seen from output phase f_out reads folded
position w' + q at input phase r, so the folded kernel

    K_f[kh, q - q_min, r*Ci + ci, f_out*Co + co] += K[kh, kw, ci, co]

is block-sparse (one entry per (kh, kw, f_out)) but dense as far as the
MXU is concerned: the folded conv costs ~F x the FLOPs of the original
and runs at full lane occupancy.  Zero padding of the folded W axis
corresponds exactly to zero padding of the original axis (every folded
pad position covers only out-of-range original columns when W % F == 0),
so folded convs are EXACT re-layouts of the original ops - same products,
f32 accumulation, plus exact zeros.

Used by models/sml_folded.py (the fused pipeline's folded SML stage);
the weight transforms are loop-invariant inside the bench's chained jit
and hoisted by XLA's LICM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def tf_same_pads(in_size: int, kernel: int, stride: int) -> Tuple[int, int]:
    """TF/XLA 'SAME' asymmetric padding (left, right) for one axis."""
    out = -(-in_size // stride)
    total = max((out - 1) * stride + kernel - in_size, 0)
    return total // 2, total - total // 2


def fold_w(x: jnp.ndarray, F: int) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H, W//F, F*C); lane f*C+c = column F*w'+f."""
    if F == 1:
        return x
    *lead, H, W, C = x.shape
    assert W % F == 0, (W, F)
    return x.reshape(*lead, H, W // F, F * C)


def unfold_w(x: jnp.ndarray, F: int) -> jnp.ndarray:
    """Inverse of fold_w."""
    if F == 1:
        return x
    *lead, H, Wf, FC = x.shape
    assert FC % F == 0
    return x.reshape(*lead, H, Wf * F, FC // F)


def refold_w(x: jnp.ndarray, f_from: int, f_to: int) -> jnp.ndarray:
    """Change fold factor (both directions); a trailing-dims reshape."""
    if f_from == f_to:
        return x
    *lead, H, Wf, FC = x.shape
    C = FC // f_from
    return x.reshape(*lead, H, Wf * f_from // f_to, f_to * C)


@functools.lru_cache(maxsize=None)
def _fold_scatter(F_in: int, F_out: int, Kw: int, stride_w: int,
                  pad_w_left: int) -> Tuple[np.ndarray, int, int]:
    """Static scatter S[q - q_min, r, f_out, kw] plus (q_min, q_max)."""
    assert F_in == stride_w * F_out, (F_in, F_out, stride_w)
    qs = []
    for fo in range(F_out):
        for kw in range(Kw):
            qs.append(divmod(stride_w * fo + kw - pad_w_left, F_in))
    q_min = min(q for q, _ in qs)
    q_max = max(q for q, _ in qs)
    S = np.zeros((q_max - q_min + 1, F_in, F_out, Kw), np.float32)
    i = 0
    for fo in range(F_out):
        for kw in range(Kw):
            q, r = qs[i]
            S[q - q_min, r, fo, kw] = 1.0
            i += 1
    return S, q_min, q_max


def fold_conv_kernel(kernel: jnp.ndarray, F_in: int, F_out: int,
                     stride_w: int, pad_w_left: int
                     ) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Fold an HWIO conv kernel for a W-folded input/output.

    Args:
      kernel: (Kh, Kw, Ci, Co).
      F_in / F_out: input/output fold factors; F_in == stride_w * F_out.
      stride_w: original conv stride along W (folded stride is always 1).
      pad_w_left: original left zero-pad along W.
    Returns:
      (K_f, (pad_left_f, pad_right_f)): folded kernel
      (Kh, Kw', F_in*Ci, F_out*Co) and the folded-axis zero padding.
    """
    Kh, Kw, Ci, Co = kernel.shape
    S, q_min, q_max = _fold_scatter(F_in, F_out, Kw, stride_w, pad_w_left)
    Kf = jnp.einsum("qrfk,hkio->hqrifo", jnp.asarray(S),
                    kernel.astype(jnp.float32))
    Kf = Kf.reshape(Kh, q_max - q_min + 1, F_in * Ci, F_out * Co)
    return Kf.astype(kernel.dtype), (-q_min, q_max)


def folded_conv(x_f: jnp.ndarray, kernel: jnp.ndarray, *,
                F_in: int, F_out: int, stride: Tuple[int, int],
                pad_h: Tuple[int, int], pad_w_left: int,
                dtype=None) -> jnp.ndarray:
    """Apply an original HWIO conv to a W-folded NHWC input.

    `kernel` is the ORIGINAL (Kh, Kw, Ci, Co) kernel; the fold transform
    runs here (tiny einsum against a constant scatter - loop-invariant
    under a chained jit, one-time if the caller pre-folds params).
    """
    Kf, pad_wf = fold_conv_kernel(kernel, F_in, F_out, stride[1], pad_w_left)
    dt = dtype or x_f.dtype
    return jax.lax.conv_general_dilated(
        x_f.astype(dt), Kf.astype(dt), (stride[0], 1),
        [pad_h, pad_wf], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(dt)


def fold_pw_kernel(kernel: jnp.ndarray, F: int) -> jnp.ndarray:
    """(1x1) (Ci, Co) -> block-diagonal (F*Ci, F*Co) (phase-preserving)."""
    Ci, Co = kernel.shape
    eye = jnp.eye(F, dtype=kernel.dtype)
    Kf = jnp.einsum("fg,io->figo", eye, kernel)
    return Kf.reshape(F * Ci, F * Co)


def folded_pointwise(x_f: jnp.ndarray, kernel: jnp.ndarray, F: int,
                     dtype=None) -> jnp.ndarray:
    """1x1 conv (Ci, Co) on an F-folded input: one full-lane matmul."""
    dt = dtype or x_f.dtype
    Kf = fold_pw_kernel(kernel, F).astype(dt)
    return jnp.einsum("...c,cd->...d", x_f.astype(dt), Kf,
                      preferred_element_type=jnp.float32).astype(dt)


def folded_depthwise(x_f: jnp.ndarray, kernel: jnp.ndarray, *,
                     F_in: int, F_out: int, stride: Tuple[int, int],
                     pad_h: Tuple[int, int], pad_w_left: int) -> jnp.ndarray:
    """Depthwise conv on a W-folded input.

    kernel: (Kh, Kw, 1, C) (flax depthwise layout).  A folded depthwise
    conv crosses phase groups (output phase f_out's tap kw reads input
    phase (stride*f_out + kw - pad) % F_in), which feature_group_count
    cannot express in the f-major lane order; a dense folded kernel
    would cost F*C x the FLOPs.  Instead each (f_out, kh, kw) tap is a
    static slice of the zero-padded canvas FMA'd with the per-channel
    weight - exactly the original FLOP count, all VPU, fused by XLA.
    Accumulation in f32 mirrors the MXU conv's accumulator.
    """
    Kh, Kw, one, C = kernel.shape
    assert one == 1
    sh, sw = stride
    assert F_in == sw * F_out
    B, H, Wf, FC = x_f.shape
    assert FC == F_in * C

    S, q_min, q_max = _fold_scatter(F_in, F_out, Kw, sw, pad_w_left)
    del S
    x_p = jnp.pad(x_f, ((0, 0), pad_h, (-q_min, q_max), (0, 0)))
    H_out = (H + pad_h[0] + pad_h[1] - Kh) // sh + 1

    # Pre-slice the H phases once so every row tap is a static slice
    # (strided slices on the row axis are major-dim copies; do them
    # sh times, not Kh*Kw*F_out times).
    if sh > 1:
        x_par = [x_p[:, p::sh] for p in range(sh)]
    else:
        x_par = [x_p]

    kf = kernel[:, :, 0, :].astype(jnp.float32)    # (Kh, Kw, C)
    outs = []
    for fo in range(F_out):
        acc = None
        for kh in range(Kh):
            base = x_par[kh % sh]
            row0 = kh // sh
            for kw in range(Kw):
                q, r = divmod(sw * fo + kw - pad_w_left, F_in)
                # Folded output width == folded input width: W'_out =
                # (W/sw)/F_out = W/F_in = Wf.
                sl = jax.lax.slice(
                    base,
                    (0, row0, q - q_min, r * C),
                    (B, row0 + H_out, q - q_min + Wf, (r + 1) * C))
                term = sl.astype(jnp.float32) * kf[kh, kw]
                acc = term if acc is None else acc + term
        outs.append(acc)
    out = jnp.concatenate(outs, axis=-1).astype(x_f.dtype)
    return out
