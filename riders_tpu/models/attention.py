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
        q = dense(self.d_model, "q_proj")(x).reshape(n, l, self.nhead, dim)
        k = dense(self.d_model, "k_proj")(source).reshape(
            n, s, self.nhead, dim)
        v = dense(self.d_model, "v_proj")(source).reshape(
            n, s, self.nhead, dim)

        attn = linear_attention if self.attention == "linear" else full_attention
        message = attn(q, k, v, x_mask, source_mask)
        message = dense(self.d_model, "merge")(
            message.reshape(n, l, self.d_model))
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
