"""Output-tiled monotone segmented-sum kernel vs a numpy oracle (interpret
mode on CPU; the rasterizer gradient tests exercise it again end-to-end)."""

import numpy as np
import jax.numpy as jnp

from threestudio_3dgs_tpu.ops.rasterizer.segsum_pallas import (
    SEGT,
    segsum_monotone_pallas,
)


def _oracle(vals, slots, n_pairs, n_segments):
    out = np.zeros((n_segments, vals.shape[1]), np.float32)
    for i in range(n_pairs):
        out[slots[i]] += vals[i]
    return out


def _run_case(n_segments, n_pairs, p_total, f, seed, use_offsets):
    rng = np.random.default_rng(seed)
    # monotone slots: each segment owns a random (possibly zero) pair count
    counts = rng.poisson(n_pairs / n_segments, size=n_segments)
    # force every segment >= 1 pair like the binning invariant for visible
    # gaussians, then trim to n_pairs
    counts = np.maximum(counts, 1)
    slots = np.repeat(np.arange(n_segments), counts)[:n_pairs]
    n_pairs = len(slots)
    offsets = np.concatenate([[0], np.cumsum(counts)])[:n_segments]
    vals = np.zeros((p_total, f), np.float32)
    vals[:n_pairs] = rng.normal(size=(n_pairs, f)).astype(np.float32)
    slots_full = np.full(p_total, 123456789, np.int32)
    slots_full[:n_pairs] = slots

    got = segsum_monotone_pallas(
        jnp.asarray(vals),
        jnp.asarray(slots_full),
        jnp.int32(n_pairs),
        n_segments,
        interpret=True,
        seg_offsets=jnp.asarray(offsets, jnp.int32) if use_offsets else None,
    )
    want = _oracle(vals, slots, n_pairs, n_segments)
    # kernel uses a 2-term bf16 split (~2^-18 relative): gradient sums, far
    # below the 1e-3 grad parity budget
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=5e-5)


def test_segsum_small_with_offsets():
    _run_case(n_segments=300, n_pairs=2000, p_total=4096, f=10, seed=0,
              use_offsets=True)


def test_segsum_small_searchsorted():
    _run_case(n_segments=300, n_pairs=2000, p_total=4096, f=10, seed=1,
              use_offsets=False)


def test_segsum_multi_tile():
    # spans several SEGT output tiles, including tile-boundary segments
    _run_case(n_segments=SEGT * 2 + 77, n_pairs=6000, p_total=8192, f=6,
              seed=2, use_offsets=True)


def test_segsum_giant_segment():
    """One segment spanning many pair blocks (a gaussian with huge coverage)."""
    n_segments, p_total = 130, 8192
    rng = np.random.default_rng(3)
    counts = np.ones(n_segments, np.int64)
    counts[3] = 6000  # spans several 1024-pair blocks
    slots = np.repeat(np.arange(n_segments), counts)
    n_pairs = len(slots)
    offsets = np.concatenate([[0], np.cumsum(counts)])[:n_segments]
    vals = np.zeros((p_total, 4), np.float32)
    vals[:n_pairs] = rng.normal(size=(n_pairs, 4)).astype(np.float32)
    slots_full = np.full(p_total, -7, np.int32)
    slots_full[:n_pairs] = slots
    got = segsum_monotone_pallas(
        jnp.asarray(vals), jnp.asarray(slots_full), jnp.int32(n_pairs),
        n_segments, interpret=True,
        seg_offsets=jnp.asarray(offsets, jnp.int32),
    )
    want = _oracle(vals, slots, n_pairs, n_segments)
    # 6000-term sums through the 2-term bf16 split: rel error ~6e-5, an
    # order of magnitude under the 1e-3 gradient parity budget
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-3)
