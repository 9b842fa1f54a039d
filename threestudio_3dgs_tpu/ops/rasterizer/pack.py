"""Lossy-but-bounded bit packing of gradient columns for payload-carrying
sorts.

The backward pair-grad reduction permutes a (P, F~10) f32 table to
gaussian-major order with a payload-carrying `lax.sort` (binning.py
`_gather_bwd_impl`).  TPU sort cost is ~1 ms per payload column at 2M rows
(PERF.md cost table), so the 10 gradient columns dominate the 18 ms sort.
Gradients carry a ~1e-3 relative accuracy budget vs the oracle (the FD/VJP
test tolerance), which leaves room to move FEWER THAN 32 bits per value
through the sort:

  * `pack21` / `unpack21`: 3 values -> 2 uint32 words.  A 21-bit float
    (sign + 8-bit exponent + 12-bit mantissa) is the TOP 21 BITS of the IEEE
    f32 encoding, extracted with round-to-nearest by adding half of the
    dropped 11 bits before truncating -- the carry propagates through
    mantissa into exponent exactly like IEEE rounding.  Relative error
    <= 2^-13 ~ 1.2e-4: an order of magnitude inside the budget.
    F=10 -> 7 words: sort operands drop 11 -> 8.

  * `pack16` / `unpack16`: 2 values -> 1 uint32 word via the same
    top-bits trick at 16 bits (sign + 8 exp + 7 mantissa, i.e. bfloat16).
    Relative error <= 2^-8 ~ 3.9e-3: OVER the budget; kept for
    experiments only.

The CUDA pipeline has no analog (atomicAdd reduces in hardware,
reference renderer/diff_gaussian_rasterizer.py:122-131 boundary); this is a
TPU-specific bandwidth trade enabled by the budgeted tolerance.

Values must be finite (gradients are; non-finite inputs round like their
bit patterns and stay non-finite-ish after unpack, which the NaN watchdog
catches downstream).
"""

from __future__ import annotations

import jax.numpy as jnp


def _round_top_bits(x: jnp.ndarray, keep: int) -> jnp.ndarray:
    """f32 -> top-`keep`-bits encoding (uint32 holding the rounded high bits
    in its LOW `keep` bits)."""
    drop = 32 - keep
    u = jnp.asarray(x, jnp.float32).view(jnp.uint32)
    # round-to-nearest(-up on ties): adding 2^(drop-1) carries through the
    # mantissa into the exponent exactly as IEEE rounding requires.
    # (Overflow to inf needs |x| within 2^-13 of f32-max -- not a gradient.)
    u = u + jnp.uint32(1 << (drop - 1))
    return u >> drop


def _from_top_bits(u: jnp.ndarray, keep: int) -> jnp.ndarray:
    drop = 32 - keep
    return (u << drop).view(jnp.float32)


def pack21(cols: jnp.ndarray) -> jnp.ndarray:
    """(P, F) f32 -> (P, ceil(F/3)*2 - (1 if F%3==1 else 0)) uint32.

    Triples (v0, v1, v2) pack as
      w0 = v0 | (v1 & 0x7FF) << 21        (v0 all 21, v1 low 11)
      w1 = (v1 >> 11) | v2 << 10          (v1 high 10, v2 all 21)
    A trailing group of 1 value uses one word, of 2 values two words.
    """
    p, f = cols.shape
    words = []
    for i in range(0, f, 3):
        g = [_round_top_bits(cols[:, j], 21) for j in range(i, min(i + 3, f))]
        if len(g) == 3:
            words.append(g[0] | (g[1] & jnp.uint32(0x7FF)) << 21)
            words.append((g[1] >> 11) | g[2] << 10)
        elif len(g) == 2:
            words.append(g[0] | (g[1] & jnp.uint32(0x7FF)) << 21)
            words.append(g[1] >> 11)
        else:
            words.append(g[0])
    return jnp.stack(words, axis=1)


def unpack21(packed: jnp.ndarray, f: int) -> jnp.ndarray:
    """Inverse of pack21: (P, W) uint32 -> (P, f) f32."""
    cols = []
    w = 0
    for i in range(0, f, 3):
        n = min(3, f - i)
        if n >= 1:
            cols.append(_from_top_bits(packed[:, w] & jnp.uint32(0x1FFFFF), 21))
        if n >= 2:
            v1 = (packed[:, w] >> 21) | (packed[:, w + 1] & jnp.uint32(0x3FF)) << 11
            cols.append(_from_top_bits(v1, 21))
        if n == 3:
            cols.append(_from_top_bits(packed[:, w + 1] >> 10, 21))
        w += 2 if n >= 2 else 1
    return jnp.stack(cols, axis=1)


def unpack21_rows(packed: jnp.ndarray, f: int) -> jnp.ndarray:
    """Row-major twin of unpack21 for kernel use: (W, B) uint32 -> (f, B) f32.

    Mirrors unpack21's bit layout with values on ROWS (the Pallas segsum
    block layout puts pairs on lanes); built from bitwise ops + a 32-bit
    bitcast only, so it lowers inside a Mosaic kernel."""
    rows = []
    w = 0
    for i in range(0, f, 3):
        n = min(3, f - i)
        if n >= 1:
            rows.append(_from_top_bits(packed[w] & jnp.uint32(0x1FFFFF), 21))
        if n >= 2:
            v1 = (packed[w] >> 21) | (packed[w + 1] & jnp.uint32(0x3FF)) << 11
            rows.append(_from_top_bits(v1, 21))
        if n == 3:
            rows.append(_from_top_bits(packed[w + 1] >> 10, 21))
        w += 2 if n >= 2 else 1
    return jnp.stack(rows, axis=0)


def pack24(cols: jnp.ndarray) -> jnp.ndarray:
    """(P, F) f32 -> (P, ceil(F*3/4)) uint32: 4 values per 3 words at 24
    bits each (sign + 8-bit exponent + 15-bit mantissa, rel err <= 2^-16 ~
    1.5e-5).  Unlike pack21 (gradient budget 1e-3), 24-bit packing serves
    FORWARD feature columns under the oracle-PSNR floor: alpha/color error
    ~3e-5 keeps the pipeline at 90+ dB (floor 85).

      w0 = v0 | (v1 & 0xFF)  << 24
      w1 = (v1 >> 8)  | (v2 & 0xFFFF) << 16
      w2 = (v2 >> 16) | v3 << 8
    Trailing groups of 1/2/3 values use 1/2/3 words."""
    p, f = cols.shape
    words = []
    for i in range(0, f, 4):
        g = [_round_top_bits(cols[:, j], 24) for j in range(i, min(i + 4, f))]
        n = len(g)
        if n >= 2:
            words.append(g[0] | (g[1] & jnp.uint32(0xFF)) << 24)
        else:
            words.append(g[0])
        if n >= 3:
            words.append((g[1] >> 8) | (g[2] & jnp.uint32(0xFFFF)) << 16)
        elif n == 2:
            words.append(g[1] >> 8)
        if n == 4:
            words.append((g[2] >> 16) | g[3] << 8)
        elif n == 3:
            words.append(g[2] >> 16)
    return jnp.stack(words, axis=1)


def unpack24(packed: jnp.ndarray, f: int) -> jnp.ndarray:
    """Inverse of pack24: (P, W) uint32 -> (P, f) f32."""
    cols = []
    w = 0
    for i in range(0, f, 4):
        n = min(4, f - i)
        if n >= 1:
            cols.append(
                _from_top_bits(packed[:, w] & jnp.uint32(0xFFFFFF), 24)
            )
        if n >= 2:
            v1 = (packed[:, w] >> 24) | (
                packed[:, w + 1] & jnp.uint32(0xFFFF)
            ) << 8
            cols.append(_from_top_bits(v1, 24))
        if n >= 3:
            v2 = (packed[:, w + 1] >> 16) | (
                packed[:, w + 2] & jnp.uint32(0xFF)
            ) << 16
            cols.append(_from_top_bits(v2, 24))
        if n == 4:
            cols.append(_from_top_bits(packed[:, w + 2] >> 8, 24))
        w += (1, 1, 2, 3, 3)[n]
    return jnp.stack(cols, axis=1)


def unpack24_rows_from_halves(lo_hi_rows, f: int):
    """Kernel-side decode: a list of (lo16, hi16) f32-int row pairs (each
    value < 2^16, selected exactly through the one-hot matmul) -> f rows of
    f32 features.  Mirrors unpack24's bit layout."""
    words = [
        lo.astype(jnp.int32) | (hi.astype(jnp.int32) << 16)
        for lo, hi in lo_hi_rows
    ]
    words = [w.astype(jnp.uint32) for w in words]
    rows = []
    w = 0
    for i in range(0, f, 4):
        n = min(4, f - i)
        if n >= 1:
            rows.append(_from_top_bits(words[w] & jnp.uint32(0xFFFFFF), 24))
        if n >= 2:
            v1 = (words[w] >> 24) | (words[w + 1] & jnp.uint32(0xFFFF)) << 8
            rows.append(_from_top_bits(v1, 24))
        if n >= 3:
            v2 = (words[w + 1] >> 16) | (words[w + 2] & jnp.uint32(0xFF)) << 16
            rows.append(_from_top_bits(v2, 24))
        if n == 4:
            rows.append(_from_top_bits(words[w + 2] >> 8, 24))
        w += (1, 1, 2, 3, 3)[n]
    return rows


def pack16(cols: jnp.ndarray) -> jnp.ndarray:
    """(P, F) f32 -> (P, ceil(F/2)) uint32, 2 bfloat16-precision values/word."""
    p, f = cols.shape
    words = []
    for i in range(0, f, 2):
        lo = _round_top_bits(cols[:, i], 16)
        if i + 1 < f:
            hi = _round_top_bits(cols[:, i + 1], 16)
            words.append(lo | hi << 16)
        else:
            words.append(lo)
    return jnp.stack(words, axis=1)


def unpack16(packed: jnp.ndarray, f: int) -> jnp.ndarray:
    cols = []
    for j in range(f):
        w = packed[:, j // 2]
        u = (w >> 16) if (j % 2) else (w & jnp.uint32(0xFFFF))
        cols.append(_from_top_bits(u, 16))
    return jnp.stack(cols, axis=1)
