"""Linear (and full) attention with LoFTR-style encoder layers.

TPU-native implementation of RCNet/linear_attention.py: the O(N) elu+1
feature-map linear attention ("Transformers are RNNs"), optional softmax
full attention, the QKV/merge/MLP/LayerNorm encoder layer, and the
alternating self/cross transformer stack.  Everything is einsum-based and
maps directly onto the MXU; sequences here are tiny (L = S = 21 tokens for
the ZJU patch, d=128, 8 heads - RCNet/networks.py:378-444) so the entire
stack fuses into a handful of matmuls.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def elu_feature_map(x: jnp.ndarray) -> jnp.ndarray:
    return nn.elu(x) + 1.0


def linear_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     q_mask: Optional[jnp.ndarray] = None,
                     kv_mask: Optional[jnp.ndarray] = None,
                     eps: float = 1e-6) -> jnp.ndarray:
    """Linear attention (linear_attention.py:18-45).

    Args:
      q: (N, L, H, D); k, v: (N, S, H, D); masks (N, L) / (N, S).
    Returns (N, L, H, D).
    """
    Q = elu_feature_map(q)
    K = elu_feature_map(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None]
    if kv_mask is not None:
        K = K * kv_mask[:, :, None, None]
        v = v * kv_mask[:, :, None, None]

    v_length = v.shape[1]
    v = v / v_length
    KV = jnp.einsum("nshd,nshv->nhdv", K, v)
    Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + eps)
    out = jnp.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_length
    return out


def linear_attention_flat(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          nhead: int,
                          q_mask: Optional[jnp.ndarray] = None,
                          kv_mask: Optional[jnp.ndarray] = None,
                          eps: float = 1e-6) -> jnp.ndarray:
    """`linear_attention` computed on the flat (N, L, d_model) tensors.

    Mathematically identical to splitting into `nhead` heads of
    D = d_model/nhead: the per-head KV contraction is the block-diagonal
    restriction of the full d_model x d_model contraction (off-block
    products are multiplied by an exact 0/1 mask), and the per-head
    normalizer is a head-segment sum via a one-hot matmul.  This keeps
    every tensor 3D with a full 128-lane minor dim - the (N, L, H, D)
    head split costs six relayout copies per layer on TPU because D=16
    pads each vreg 8x (PERF.md round 3).
    """
    n, l, d_model = q.shape
    dim = d_model // nhead
    Q = elu_feature_map(q)
    K = elu_feature_map(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None]
    if kv_mask is not None:
        K = K * kv_mask[:, :, None]
        v = v * kv_mask[:, :, None]

    heads = jnp.arange(d_model) // dim
    block = (heads[:, None] == heads[None, :]).astype(q.dtype)   # (d, d)
    onehot = (heads[:, None] == jnp.arange(nhead)[None, :]).astype(
        jnp.float32)                                             # (d, H)

    v_length = v.shape[1]
    v = v / v_length
    KV = jnp.einsum("nsd,nsv->ndv", K, v) * block
    Z = 1.0 / (jnp.einsum("nld,dh->nlh",
                          Q.astype(jnp.float32)
                          * K.sum(axis=1, keepdims=True).astype(jnp.float32),
                          onehot) + eps)
    Zx = jnp.einsum("nlh,dh->nld", Z, onehot).astype(q.dtype)
    return jnp.einsum("nld,ndv->nlv", Q, KV) * Zx * v_length


def full_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   q_mask: Optional[jnp.ndarray] = None,
                   kv_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Softmax attention (linear_attention.py:49-80)."""
    qk = jnp.einsum("nlhd,nshd->nlsh", q, k)
    if kv_mask is not None and q_mask is not None:
        mask = (q_mask[:, :, None, None] * kv_mask[:, None, :, None]) > 0
        qk = jnp.where(mask, qk, -jnp.inf)
    temp = 1.0 / (q.shape[-1] ** 0.5)
    attn = nn.softmax(temp * qk, axis=2)
    return jnp.einsum("nlsh,nshd->nlhd", attn, v)


class LoFTREncoderLayer(nn.Module):
    """Pre-projection attention + concat-MLP residual update
    (linear_attention.py:84-135)."""

    d_model: int
    nhead: int = 8
    attention: str = "linear"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, source: jnp.ndarray,
                 x_mask: Optional[jnp.ndarray] = None,
                 source_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n, l, c = x.shape
        s = source.shape[1]
        dim = self.d_model // self.nhead

        dense = lambda feat, name: nn.Dense(feat, use_bias=False,
                                            dtype=self.dtype, name=name)
        q = dense(self.d_model, "q_proj")(x)
        k = dense(self.d_model, "k_proj")(source)
        v = dense(self.d_model, "v_proj")(source)

        if self.attention == "linear":
            # Flat-head formulation: no (N, L, H, D) split (see
            # linear_attention_flat).
            message = linear_attention_flat(q, k, v, self.nhead,
                                            x_mask, source_mask)
        else:
            message = full_attention(
                q.reshape(n, l, self.nhead, dim),
                k.reshape(n, s, self.nhead, dim),
                v.reshape(n, s, self.nhead, dim),
                x_mask, source_mask).reshape(n, l, self.d_model)
        message = dense(self.d_model, "merge")(message)
        message = nn.LayerNorm(dtype=self.dtype, name="norm1")(message)

        message = jnp.concatenate([x, message], axis=-1)
        message = dense(2 * self.d_model, "mlp1")(message)
        message = nn.relu(message)
        message = dense(self.d_model, "mlp2")(message)
        message = nn.LayerNorm(dtype=self.dtype, name="norm2")(message)
        return x + message


class LocalFeatureTransformer(nn.Module):
    """Alternating self/cross transformer stack (linear_attention.py:139-184).

    `layer_types` x `n_layers` layers; 'self' updates both streams with
    themselves, 'cross' attends each stream to the other.
    """

    d_model: int = 128
    nhead: int = 8
    layer_types: Sequence[str] = ("self", "cross")
    n_layers: int = 4
    attention: str = "linear"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat0: jnp.ndarray, feat1: jnp.ndarray,
                 mask0: Optional[jnp.ndarray] = None,
                 mask1: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        names = list(self.layer_types) * self.n_layers
        for i, kind in enumerate(names):
            layer = LoFTREncoderLayer(
                self.d_model, self.nhead, self.attention, dtype=self.dtype,
                name=f"layer{i}")
            if kind == "self":
                feat0 = layer(feat0, feat0, mask0, mask0)
                feat1 = layer(feat1, feat1, mask1, mask1)
            elif kind == "cross":
                feat0 = layer(feat0, feat1, mask0, mask1)
                feat1 = layer(feat1, feat0, mask1, mask0)
            else:
                raise KeyError(kind)
        return feat0, feat1
