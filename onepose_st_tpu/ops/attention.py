"""Attention primitives for the matcher transformers.

Linear attention ("Transformers are RNNs" elu+1 kernel) and full attention,
matching the semantics of reference
src/models/OnePosePlus/loftr_module/linear_attention.py:21-99 — but written
as pure functions over [B, N, H, D] arrays that XLA maps onto the MXU as two
batched matmuls (O(N·D²) instead of O(N²·D)).

Accumulations are forced to f32 (preferred_element_type) so bf16 activations
don't lose the normalization term.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def elu_feature_map(x: jax.Array) -> jax.Array:
    return jax.nn.elu(x) + 1.0


def linear_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_mask: jax.Array | None = None,
    kv_mask: jax.Array | None = None,
    eps: float = 1e-6,
) -> jax.Array:
    """Linear attention with the elu+1 kernel.

    Args:
      q: [B, L, H, D]; k, v: [B, S, H, D]; masks: [B, L] / [B, S] bool.
    Returns: [B, L, H, D] in q.dtype.

    The 1/S value pre-scaling mirrors the reference's fp16-overflow guard
    (linear_attention.py:55-57); harmless in f32 and keeps parity.
    """
    dtype = q.dtype
    Q = elu_feature_map(q)
    K = elu_feature_map(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None].astype(Q.dtype)
    if kv_mask is not None:
        kmask = kv_mask[:, :, None, None].astype(K.dtype)
        K = K * kmask
        v = v * kmask
    s_len = v.shape[1]
    v_scaled = v / s_len
    # KV: [B, H, D, Dv] — contraction over S on the MXU, f32 accumulation
    KV = jnp.einsum("bshd,bshv->bhdv", K, v_scaled, preferred_element_type=jnp.float32)
    K_sum = jnp.sum(K.astype(jnp.float32), axis=1)  # [B, H, D]
    Z = 1.0 / (
        jnp.einsum("blhd,bhd->blh", Q.astype(jnp.float32), K_sum) + eps
    )  # [B, L, H]
    out = jnp.einsum(
        "blhd,bhdv->blhv", Q, KV.astype(dtype), preferred_element_type=jnp.float32
    )
    return (out * Z[..., None] * s_len).astype(dtype)


def full_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    q_mask: jax.Array | None = None,
    kv_mask: jax.Array | None = None,
) -> jax.Array:
    """Softmax attention, [B, L, H, D] x [B, S, H, D] -> [B, L, H, D]."""
    dtype = q.dtype
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, dtype=jnp.float32))
    logits = (
        jnp.einsum("blhd,bshd->bhls", q, k, preferred_element_type=jnp.float32) * scale
    )
    if kv_mask is not None:
        mask = kv_mask[:, None, None, :]
        if q_mask is not None:
            mask = mask & q_mask[:, None, :, None]
        logits = jnp.where(mask, logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum(
        "bhls,bshd->blhd", attn, v, preferred_element_type=jnp.float32
    ).astype(dtype)
