"""Global (full-bidirectional) attention for ViT/DINOv3 encoders.

The reference's ViT paths run timm's eager attention, materializing
[B, H, N, N] score tensors (reference models/encoders.py:162-292, 487-662).
That is fine at 224^2/patch16 (N=197) but the framework's DINOv3 512^2
patch-8 preset (configs/Dino_resize_patch8.yaml) puts N at 4096+ tokens,
where materialized scores are gigabytes per block
(16 x 12 x 4101^2 f32 ≈ 12.9 GB) — un-trainable on one chip.

``global_attention`` routes to the tiled online-softmax (flash) Pallas TPU
kernel from ``jax.experimental.pallas.ops.tpu.flash_attention`` (forward +
backward, f32 running max/sum, scores never leave VMEM), padding the
sequence to a block multiple with SegmentIds so pad keys are masked and pad
query rows are cropped. On non-TPU backends (tests, the virtual CPU mesh)
it falls back to the XLA einsum reference — numerics match to bf16
tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BLOCK = 512  # q/kv tile; N is padded to a multiple of this


def _xla_attention(q, k, v, sm_scale: float):
    """Reference einsum path: q,k,v [B, H, N, dh]."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q * sm_scale, k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.lru_cache(maxsize=None)
def _block_sizes(n_pad: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    b = min(_BLOCK, n_pad)
    return BlockSizes(
        block_q=b, block_k_major=b, block_k=b, block_b=1,
        block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
        block_q_dkv=b,
        block_k_major_dq=b, block_k_dq=b, block_q_dq=b,
    )


def global_attention(q, k, v, *, sm_scale: float,
                     use_flash: bool = True) -> jax.Array:
    """Full-attention over q,k,v [B, H, N, dh] -> [B, H, N, dh].

    ``use_flash`` selects the Pallas flash kernel; it is forced off outside
    the TPU backend (the library kernel has no interpreter path here).
    Sequences are padded to a multiple of the 512 tile with pad tokens in a
    second segment (real queries never attend pad keys); outputs are
    cropped back to N.
    """
    if not use_flash or jax.default_backend() != "tpu":
        return _xla_attention(q, k, v, sm_scale)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    B, H, N, dh = q.shape
    n_pad = -(-N // _BLOCK) * _BLOCK
    segment_ids = None
    if n_pad != N:
        pad = ((0, 0), (0, 0), (0, n_pad - N), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        seg = jnp.concatenate(
            [jnp.zeros((B, N), jnp.int32), jnp.ones((B, n_pad - N),
                                                    jnp.int32)], axis=1)
        segment_ids = SegmentIds(q=seg, kv=seg)

    out = flash_attention(
        q, k, v, segment_ids=segment_ids, causal=False, sm_scale=sm_scale,
        block_sizes=_block_sizes(n_pad))
    if n_pad != N:
        out = out[:, :, :N, :]
    return out.astype(q.dtype)
