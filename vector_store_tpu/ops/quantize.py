"""Vector quantization for device storage.

Parity targets: the reference's Quantization modes (lib.rs:463-495) as stored
by USearch — F32/F16/BF16 floats, I8 scalar quantization, and B1 binary
packing (usearch.rs:1179-1205 packs bit=1 for components > 0). On TPU the
float modes map onto native dtypes; I8 uses the [-1, 1] -> [-127, 127] scalar
scheme (USearch's i8 convention); B1 packs sign bits 8-per-byte, MSB first.
"""

from __future__ import annotations

import jax.numpy as jnp
import ml_dtypes
import numpy as np

from vector_store_tpu.core.types import Quantization

I8_SCALE = 127.0


def storage_dtype(quantization: Quantization):
    return {
        Quantization.F32: jnp.float32,
        Quantization.F16: jnp.float16,
        Quantization.BF16: jnp.bfloat16,
        Quantization.I8: jnp.int8,
        Quantization.B1: jnp.uint8,
    }[quantization]


def padded_dim(dimensions: int, quantization: Quantization) -> int:
    """Storage row length: dimensions padded to a multiple of 128 lanes
    (TPU tiling), or ceil(D/8) bytes padded to 128 for B1."""
    if quantization is Quantization.B1:
        d = (dimensions + 7) // 8
    else:
        d = dimensions
    return ((d + 127) // 128) * 128


def pack_b1(x: np.ndarray) -> np.ndarray:
    """Pack f32 [..., D] into binary [..., ceil(D/8)] uint8; bit set iff
    component > 0. MSB-first within each byte."""
    bits = (x > 0).astype(np.uint8)
    d = bits.shape[-1]
    pad = (-d) % 8
    if pad:
        bits = np.pad(bits, [(0, 0)] * (bits.ndim - 1) + [(0, pad)])
    return np.packbits(bits, axis=-1)


def unpack_b1(packed: np.ndarray, dimensions: int) -> np.ndarray:
    bits = np.unpackbits(packed, axis=-1)[..., :dimensions]
    return bits.astype(np.float32)


def quantize_for_storage(x: np.ndarray, quantization: Quantization) -> np.ndarray:
    """Convert f32 host vectors [..., D] to their storage representation
    (numpy; the result is what gets placed into the device array)."""
    if quantization is Quantization.F32:
        return x.astype(np.float32)
    if quantization is Quantization.F16:
        return x.astype(np.float16)
    if quantization is Quantization.BF16:
        return x.astype(ml_dtypes.bfloat16)
    if quantization is Quantization.I8:
        return np.clip(np.round(x * I8_SCALE), -127, 127).astype(np.int8)
    if quantization is Quantization.B1:
        return pack_b1(x)
    raise ValueError(f"unknown quantization {quantization}")


def vector_norms(x: np.ndarray) -> np.ndarray:
    """L2 norms of f32 host vectors [..., D] -> [...], for cosine."""
    return np.sqrt(np.sum(x.astype(np.float64) ** 2, axis=-1)).astype(np.float32)
