"""Binary-descriptor representations and conversions.

The framework keeps 256-bit ORB descriptors (reference README.md:115) in two
layouts, chosen per consumer:

* **packed**: ``[N, 8] uint32`` — 32 bytes/descriptor, the storage format
  (matches the reference's ``cv::Mat`` of 32 uint8, loop_closing.hpp:16) and
  the input to the XOR+popcount Pallas matcher.
* **signed**: ``[N, 256] int8`` of +-1 — the MXU format: for +-1 vectors
  ``dot(a, b) = bits - 2 * hamming(a, b)``, so Hamming distance becomes an
  int8 matmul on the systolic array (SURVEY.md §7 "popcount on TPU").

Conversions are pure jnp and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BITS = 256
WORDS = BITS // 32


def bits_to_packed(bits: jax.Array) -> jax.Array:
    """[..., 256] {0,1} -> [..., 8] uint32 (bit i of word w = bit 32*w+i)."""
    b = bits.astype(jnp.uint32).reshape(*bits.shape[:-1], WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1).astype(jnp.uint32)


def packed_to_bits(packed: jax.Array) -> jax.Array:
    """[..., 8] uint32 -> [..., 256] {0,1} uint8."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    b = (packed[..., :, None] >> shifts) & jnp.uint32(1)
    return b.reshape(*packed.shape[:-1], BITS).astype(jnp.uint8)


def bits_to_signed(bits: jax.Array) -> jax.Array:
    """[..., 256] {0,1} -> [..., 256] int8 of +-1 (1 -> +1, 0 -> -1)."""
    return (bits.astype(jnp.int8) * 2 - 1).astype(jnp.int8)


def packed_to_signed(packed: jax.Array) -> jax.Array:
    return bits_to_signed(packed_to_bits(packed))


def signed_to_packed(signed: jax.Array) -> jax.Array:
    return bits_to_packed((signed > 0).astype(jnp.uint8))


def popcount_u32(x: jax.Array) -> jax.Array:
    """Bit-parallel popcount of a uint32 array (SWAR; no popcount ALU op on
    the TPU VPU, SURVEY.md §7)."""
    x = x.astype(jnp.uint32)
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((x * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def hamming_packed(a: jax.Array, b: jax.Array) -> jax.Array:
    """Reference-semantics Hamming distance between packed descriptor sets:
    ``a`` [M, 8], ``b`` [N, 8] uint32 -> [M, N] int32. XOR+popcount on the
    VPU — the oracle implementation; the production path is the MXU matmul
    in :mod:`.matching`."""
    x = a[:, None, :] ^ b[None, :, :]
    return jnp.sum(popcount_u32(x), axis=-1)
