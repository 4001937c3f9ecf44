"""Deterministic 2-D resampling with exact torch / OpenCV semantics.

The reference mixes four interpolation conventions that all affect metric
parity (SURVEY.md "hard parts"):

* ``nearest``      - cv2.INTER_NEAREST / torch ``interpolate(mode='nearest')``:
                     src = floor(dst * in/out).  Used for every SML network
                     input (modules/midas/transforms.py:135-167) and the
                     RC-Net decoder's final upsample (utils/net_utils.py:196).
* ``bilinear`` ac=True  - fusion blocks (modules/midas/blocks.py:168-170),
                     decoder multi-scale upsamples (RCNet/networks.py:720-756).
* ``bilinear`` ac=False - SML output head (blocks.py:187) and cv2.INTER_LINEAR.
* ``bicubic``  ac=False - final prediction upsample (val_zju.py:200-210),
                     cubic kernel A = -0.75 with border-clamped taps.

Rather than translating gather-heavy CPU kernels, resampling is expressed as
two dense matmuls with precomputed (out x in) weight matrices - separable
filtering that XLA maps straight onto the MXU and fuses with surrounding ops.
Weight matrices are built once per (in, out, method) in float64 numpy and
cached.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resize2d", "resize_nearest_indices", "compute_net_shape"]


def compute_net_shape(image_shape: Tuple[int, int],
                      target: int = 288,
                      multiple_of: int = 32,
                      method: str = "minimal") -> Tuple[int, int]:
    """Network input size for an arbitrary frame: the aspect-keeping,
    multiple-of-32 resize of modules/midas/transforms.py:59-125.

    'minimal' picks the axis whose scale is closest to 1 (the SML
    convention, get_transforms:318-326); 'lower_bound' guarantees >= target
    on both axes; 'upper_bound' guarantees <= target (the test-time
    transform tables' midas_small convention, transforms_test.py:270-277).
    E.g. 480x640 -> (288, 384); 512x640 -> (288, 352).
    """
    h, w = image_shape
    scale_h = target / h
    scale_w = target / w
    if method == "minimal":
        scale = scale_w if abs(1 - scale_w) < abs(1 - scale_h) else scale_h
        sh = sw = scale
    elif method == "lower_bound":
        sh = sw = max(scale_h, scale_w)
    elif method == "upper_bound":
        sh = sw = min(scale_h, scale_w)
    else:
        raise ValueError(method)

    def constrain(x, min_val=None, max_val=None):
        y = int(np.round(x / multiple_of) * multiple_of)
        if max_val is not None and y > max_val:
            y = int(np.floor(x / multiple_of) * multiple_of)
        if min_val is not None and y < min_val:
            y = int(np.ceil(x / multiple_of) * multiple_of)
        return y

    min_val = target if method == "lower_bound" else None
    max_val = target if method == "upper_bound" else None
    return (constrain(sh * h, min_val, max_val),
            constrain(sw * w, min_val, max_val))


@functools.lru_cache(maxsize=None)
def resize_nearest_indices(in_size: int, out_size: int) -> Tuple[int, ...]:
    """floor(i * in/out) source indices (torch 'nearest' / cv2 INTER_NEAREST)."""
    scale = in_size / out_size
    idx = np.clip(np.floor(np.arange(out_size) * scale), 0, in_size - 1)
    return tuple(idx.astype(np.int64).tolist())


@functools.lru_cache(maxsize=None)
def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    """One-hot (out x in) selection matrix for nearest resampling."""
    idx = np.asarray(resize_nearest_indices(in_size, out_size))
    W = np.zeros((out_size, in_size), np.float32)
    W[np.arange(out_size), idx] = 1.0
    return W


@functools.lru_cache(maxsize=None)
def _nearest_runs(in_size: int, out_size: int):
    """Nearest upsampling as repetition runs: maximal spans [a, b) of
    source indices whose elements each repeat `c` times in the output.
    floor(i*in/out) is monotone, so the output is the concatenation of
    the runs' c-fold repeats.  Returns None when any source index is
    skipped (downsampling) - those need the gather/matmul form."""
    idx = np.asarray(resize_nearest_indices(in_size, out_size))
    counts = np.bincount(idx, minlength=in_size)
    if (counts == 0).any():
        return None
    runs = []
    s = 0
    for j in range(1, in_size + 1):
        if j == in_size or counts[j] != counts[s]:
            runs.append((s, j, int(counts[s])))
            s = j
    return tuple(runs)


def _source_coords(in_size: int, out_size: int, align_corners: bool,
                   cubic: bool) -> np.ndarray:
    # torch computes source coordinates in the tensor's scalar type (fp32
    # for float inputs); emulate that so weights match bitwise.
    i = np.arange(out_size, dtype=np.float32)
    if align_corners:
        if out_size == 1:
            return np.zeros(out_size)
        scale = np.float32(in_size - 1) / np.float32(out_size - 1)
        return (i * scale).astype(np.float64)
    scale = np.float32(in_size) / np.float32(out_size)
    src = ((i + np.float32(0.5)) * scale - np.float32(0.5)).astype(np.float32)
    if not cubic:
        # torch clamps negative source coords for linear, not for cubic
        # (cubic uses bounded taps instead).
        src = np.maximum(src, 0.0)
    return src.astype(np.float64)


@functools.lru_cache(maxsize=None)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool
                   ) -> np.ndarray:
    src = _source_coords(in_size, out_size, align_corners, cubic=False)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w1 = src - i0
    w0 = 1.0 - w1
    W = np.zeros((out_size, in_size), np.float64)
    rows = np.arange(out_size)
    np.add.at(W, (rows, i0), w0)
    np.add.at(W, (rows, i1), w1)
    return W.astype(np.float32)


def _cubic_kernel(t: np.ndarray, A: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel with a = -0.75 (torch/OpenCV)."""
    at = np.abs(t)
    at2, at3 = at * at, at * at * at
    w = np.where(
        at <= 1.0,
        (A + 2.0) * at3 - (A + 3.0) * at2 + 1.0,
        np.where(at < 2.0, A * at3 - 5.0 * A * at2 + 8.0 * A * at - 4.0 * A,
                 0.0))
    return w


@functools.lru_cache(maxsize=None)
def _cubic_matrix(in_size: int, out_size: int, align_corners: bool
                  ) -> np.ndarray:
    src = _source_coords(in_size, out_size, align_corners, cubic=True)
    i_floor = np.floor(src).astype(np.int64)
    W = np.zeros((out_size, in_size), np.float64)
    rows = np.arange(out_size)
    frac = src - i_floor
    for tap in (-1, 0, 1, 2):
        idx = np.clip(i_floor + tap, 0, in_size - 1)  # border-replicate taps
        w = _cubic_kernel(frac - tap)
        np.add.at(W, (rows, idx), w)
    return W.astype(np.float32)


def _nearest_axis(x: jnp.ndarray, axis: int, in_n: int, out_n: int
                  ) -> jnp.ndarray:
    """Nearest resampling of one axis (see the method='nearest' notes in
    resize2d): repetition runs when upsampling, one-hot matmul otherwise."""
    axis = axis % x.ndim
    runs = _nearest_runs(in_n, out_n) if out_n > in_n else None
    # Irregular W upscales keep the one-hot matmul: on the ZJU decoder's
    # (512, 60, 12->25, 128) resize the slice+broadcast+concat chain
    # measured 0.94 ms/call vs the matmul's 0.58 (trace, round 4) - the
    # W dim sits in sublanes of the conv layout and the pieces each pay
    # a relayout.  H resizes and exact integer factors use repetition.
    if runs is not None and len(runs) > 1 and axis != x.ndim - 3:
        runs = None
    if runs is not None and len(runs) <= 4:
        pieces = []
        for a, b, c in runs:
            seg = jax.lax.slice_in_dim(x, a, b, axis=axis)
            if c > 1:
                shape = (seg.shape[:axis + 1] + (c,)
                         + seg.shape[axis + 1:])
                seg = jnp.broadcast_to(
                    jnp.expand_dims(seg, axis + 1), shape)
                seg = seg.reshape(seg.shape[:axis] + ((b - a) * c,)
                                  + seg.shape[axis + 2:])
            pieces.append(seg)
        return pieces[0] if len(pieces) == 1 else \
            jnp.concatenate(pieces, axis=axis)
    prec = None if x.dtype == jnp.bfloat16 else "highest"
    M = jnp.asarray(_nearest_matrix(in_n, out_n)).astype(x.dtype)
    if axis == x.ndim - 3:
        return jnp.einsum("oh,...hwc->...owc", M, x, precision=prec)
    assert axis == x.ndim - 2
    return jnp.einsum("pw,...hwc->...hpc", M, x, precision=prec)


def resize2d(x: jnp.ndarray,
             out_shape: Tuple[int, int],
             method: str = "bilinear",
             align_corners: bool = False) -> jnp.ndarray:
    """Resize the (-3, -2) spatial axes of an NHWC(-like) array.

    Args:
      x: (..., H, W, C) array.
      out_shape: target (H2, W2).
      method: 'nearest' | 'bilinear' | 'bicubic'.
      align_corners: corner-alignment convention (ignored for nearest).
    """
    h, w = x.shape[-3], x.shape[-2]
    h2, w2 = out_shape
    if (h, w) == (h2, w2):
        return x

    if method == "nearest":
        # Gathers (and strided slices) lower to slow dynamic-slice loops
        # on TPU (PERF.md).  Upsampling is exact element repetition
        # (floor(i*in/out) visits every source index in order), expressed
        # as broadcast+reshape per repetition run plus one concat - an
        # integer factor is a single run; irregular factors like the
        # decoder's 12 -> 25 are two (the one-hot matmul form this
        # replaces ran at 4 TF/s on K=12 x N=25 shapes, PERF.md round 4).
        # Downsampling and many-run cases keep the exact one-hot matmul
        # (a single 1.0 tap per output row, so values pass through
        # bit-exactly; bf16 stays bf16 - 8x the f32 MXU rate).
        if h != h2:
            x = _nearest_axis(x, -3, h, h2)
        if w != w2:
            x = _nearest_axis(x, -2, w, w2)
        return x

    if method == "bilinear":
        Wh = _linear_matrix(h, h2, align_corners)
        Ww = _linear_matrix(w, w2, align_corners)
    elif method == "bicubic":
        Wh = _cubic_matrix(h, h2, align_corners)
        Ww = _cubic_matrix(w, w2, align_corners)
    else:
        raise ValueError(f"Unknown resize method: {method}")

    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    # Default f32 einsum precision on TPU is the 3-pass bf16
    # decomposition (~2^-21 relative error, f32-like; bit-identical on
    # CPU where parity tests run); 'highest' doubles the MXU pass count
    # for no observable metric change and cost 7.5 fps on the ZJU bench
    # (same-session A/B 449.9 vs 442.4, PERF.md step 18).
    # RIDERS_RESIZE_HIGHEST=1 restores the 6-pass form for A/B work.
    prec = ("highest" if os.environ.get("RIDERS_RESIZE_HIGHEST") == "1"
            else None)
    if h != h2:
        xf = jnp.einsum("oh,...hwc->...owc", jnp.asarray(Wh), xf,
                        precision=prec)
    if w != w2:
        xf = jnp.einsum("pw,...hwc->...hpc", jnp.asarray(Ww), xf,
                        precision=prec)
    return xf.astype(orig_dtype)


def edge_pad2d(image: jnp.ndarray, pad_y: int, pad_x: int) -> jnp.ndarray:
    """Edge-pad (B, H, W, C) by (pad_y, pad_x) per side via two one-hot
    matmuls on full-lane flat views.

    Numerically identical to jnp.pad(mode='edge') (one-hot selection is
    exact in any dtype), but avoids XLA's slice+broadcast+concat lowering
    whose tiny (B, W, C) boundary-row relayouts cost ~2.4 ms/call on the
    ZJU bench (copy.2366/2368 in the round-3 profile): the row pad is a
    (H2, H) one-hot against the (B, H, W*C) flat view, the column pad a
    (W*C, W2*C) pixel-block one-hot on the flat lanes - both MXU work at
    full lane occupancy (<0.15 ms total).
    """
    B, H, W, C = image.shape
    H2, W2 = H + 2 * pad_y, W + 2 * pad_x
    ry = np.zeros((H2, H), np.float32)
    ry[np.arange(H2), np.clip(np.arange(-pad_y, H + pad_y), 0, H - 1)] = 1
    cx = np.zeros((W * C, W2 * C), np.float32)
    src = np.clip(np.arange(-pad_x, W + pad_x), 0, W - 1)
    for c in range(C):
        cx[src * C + c, np.arange(W2) * C + c] = 1
    dt = image.dtype
    flat = image.reshape(B, H, W * C)
    out = jnp.einsum("ph,bhx->bpx", jnp.asarray(ry, dt), flat)
    out = jnp.einsum("bpx,xq->bpq", out, jnp.asarray(cx, dt))
    return out.reshape(B, H2, W2, C)
