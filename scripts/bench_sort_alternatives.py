"""Non-bitonic sort prototype measurement (round-4 verdict item 3).

The tile-grouping sort is a 257-bucket stable counting sort in disguise.
The round-3 design note rejected counting/radix variants on two priced
claims: (a) the rank phases are cheap but (b) the APPLY phase is either a
fragment-DMA storm (latency-dead) or an O(n * range) one-hot matmul
(FLOP-dead).  This benchmark MEASURES the pieces on hardware:

  1. `lax.sort` anchors: 1-key and the production 12-operand tile sort at
     2M rows -- the bar to beat.
  2. Counting-sort phase 1+2: per-block histogram via one-hot MXU matmul
     (Pallas, sequential grid) + XLA prefix -- the cheap part, measured.
  3. The apply phase's fragment-DMA cost: a Pallas kernel that issues K
     dynamic (L x 64 B) HBM->HBM copies per block, swept over realistic
     fragment sizes -- the per-fragment cost extrapolates to the full apply.
  4. The in-VMEM one-hot permutation alternative (local 2048-row stable
     bucket sort as a (2048, 2048) bf16 matmul) -- the FLOP-dead variant,
     measured per block.

All timings are serial chains (each iteration's input depends on the
previous iteration's output) inside ONE compiled fori_loop -- the axon
tunnel elides naively repeated identical dispatches (PERF.md pitfalls), so
free-standing `timeit(f, x)` loops report fantasy numbers here.

Verdict rule: adopt if a full counting sort would beat the measured
1-key+payload anchor at 2M; else the round-3 rejection stands ON DATA.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 2 * 1024 * 1024
NT = 257
BLK = 2048
NB = P // BLK

rng = np.random.default_rng(0)
keys = np.sort(rng.integers(0, NT, size=P)).astype(np.int32)
rng.shuffle(keys)  # uniform random tile ids
payloads = [rng.random(P).astype(np.float32) for _ in range(10)]

def _fetch(tree):
    """Force completion via a host transfer -- jax.block_until_ready returns
    early through the axon tunnel for single small dispatches (measured:
    32 chained 2M sorts "complete" in 0.09 ms under block_until_ready but
    take 107 ms under a host fetch)."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return np.asarray(leaf.reshape(-1)[:8])


def chain_time(step, carry, n_lo=4, n_hi=20):
    """Per-iteration ms of `step` (carry -> carry), serial chain in one jit.

    Times a host-fetch-terminated fori_loop at two iteration counts and
    reports the slope -- cancelling tunnel latency and fetch cost, and
    defeating dispatch elision (each timed call's input is the previous
    call's output buffer)."""
    f = jax.jit(
        lambda c, n: jax.lax.fori_loop(0, n, lambda i, cc: step(cc), c)
    )
    r = f(carry, 1)
    _fetch(r)  # compile + warm
    r = f(r, 2)
    _fetch(r)
    t0 = time.perf_counter()
    r = f(r, n_lo)
    _fetch(r)
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = f(r, n_hi)
    _fetch(r)
    t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (n_hi - n_lo) * 1000


# ---- 1. lax.sort anchors ---------------------------------------------------
# Bitonic network cost is data-independent, so re-sorting the sorted output
# is a valid chain; the carry dependence defeats dispatch elision/CSE.
keys_j = jnp.asarray(keys)
pls = [jnp.asarray(p) for p in payloads]

t1 = chain_time(lambda k: jax.lax.sort((k,), num_keys=1)[0], keys_j)
print(f"lax.sort 1-key @2M:         {t1:7.2f} ms")


def _sort12(c):
    out = jax.lax.sort(c, num_keys=1)
    return out


t12p = chain_time(_sort12, tuple([keys_j] + pls + [keys_j]))
print(f"lax.sort 1-key+11 payload:  {t12p:7.2f} ms")


# ---- 2. histogram kernel (phase 1) ----------------------------------------
NTP = 384  # buckets padded to a lane multiple


def _hist_kernel(keys_hbm, out_hbm, kscr, oscr, sem_k, sem_o):
    b = pl.program_id(0)
    rd = pltpu.make_async_copy(keys_hbm.at[b], kscr, sem_k)
    rd.start()
    rd.wait()
    k = kscr[0:1, :]  # (1, BLK)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLK, NTP), 1)
    onehot = (k.reshape(BLK, 1) == cols).astype(jnp.bfloat16)
    ones = jnp.ones((8, BLK), jnp.bfloat16)
    cnt = jax.lax.dot_general(
        ones, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (8, NTP) all rows equal
    oscr[...] = cnt
    wr = pltpu.make_async_copy(oscr, out_hbm.at[b], sem_o)
    wr.start()
    wr.wait()


def hist_pallas(k2d):
    return pl.pallas_call(
        _hist_kernel,
        grid=(NB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((NB, 8, NTP), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, BLK), jnp.int32),
            pltpu.VMEM((8, NTP), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(k2d)


keys_2d = jnp.broadcast_to(
    keys_j.reshape(NB, 1, BLK), (NB, 8, BLK)
).astype(jnp.int32)


def _phase12(k2d):
    h = hist_pallas(k2d)[:, 0, :NT]  # (NB, NT)
    block_prefix = jnp.cumsum(h, axis=0) - h  # exclusive over blocks
    bucket_totals = jnp.sum(h, axis=0)
    bucket_starts = jnp.cumsum(bucket_totals) - bucket_totals
    starts = block_prefix + bucket_starts[None, :]  # (NB, NT) write starts
    # chain: total count == P always, so this adds 0 -- but the compiler
    # cannot know that, forcing each iteration to depend on the last.
    zero = (jnp.sum(h).astype(jnp.int32) - P).astype(jnp.int32)
    return k2d + zero, starts


t12 = chain_time(lambda c: _phase12(c)[0], keys_2d)
print(f"counting phases 1+2 (hist kernel + prefix): {t12:7.2f} ms")


# ---- 3. fragment-DMA apply cost --------------------------------------------
# realistic fragment census from the actual key stream: distinct buckets per
# 2048-row block, fragment length distribution
frag_counts = []
for b in range(NB):
    blk = keys[b * BLK : (b + 1) * BLK]
    frag_counts.append(len(np.unique(blk)))
favg = float(np.mean(frag_counts))
print(f"fragments (distinct buckets) per {BLK}-block: mean {favg:.0f}")

FRAGS = 192  # fragments issued per program in the microbenchmark


def _frag_kernel(starts_smem, src_hbm, dst_hbm, sems, *, frags, flen):
    b = pl.program_id(0)
    for j in range(frags):
        s = starts_smem[b * frags + j]
        cp = pltpu.make_async_copy(
            src_hbm.at[pl.ds(s, flen)], dst_hbm.at[pl.ds(s, flen)], sems.at[j]
        )
        cp.start()
    for j in range(frags):
        s = starts_smem[b * frags + j]
        pltpu.make_async_copy(
            src_hbm.at[pl.ds(s, flen)], dst_hbm.at[pl.ds(s, flen)], sems.at[j]
        ).wait()


def frag_bench(nprog, frags, flen):
    # HBM slices must be 128-lane aligned, so physical rows are 512 B here
    # (vs ~48 B real pair rows) -- per-DMA cost is latency-dominated at these
    # sizes, so this bounds the real apply cost from ABOVE by < 2x.
    rows = P // 8
    src = jnp.asarray(rng.random((rows, 128)).astype(np.float32))
    starts = jnp.asarray(
        rng.integers(0, rows - flen, size=nprog * frags).astype(np.int32)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprog,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((frags,))],
    )
    fn = pl.pallas_call(
        functools.partial(_frag_kernel, frags=frags, flen=flen),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        input_output_aliases={1: 0},  # src (after prefetch arg) -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    ms = chain_time(lambda s: fn(starts, s), src, n_lo=4, n_hi=24)
    per_dma_us = ms * 1000 / (nprog * frags)
    return ms, per_dma_us


for flen in (8, 16):
    ms, per_dma = frag_bench(64, FRAGS, flen)
    total_frags = NB * favg
    proj = per_dma * total_frags / 1000
    print(
        f"fragment DMA len={flen} rows: {per_dma:6.2f} us/DMA "
        f"-> apply projection {proj:7.1f} ms for {total_frags:.0f} fragments"
    )


# ---- 4. one-hot permutation apply (FLOP variant), one block ---------------
def _perm_kernel(vals_hbm, perm_hbm, out_hbm, vscr, pscr, oscr, sv, sp, so):
    b = pl.program_id(0)
    cp = pltpu.make_async_copy(vals_hbm.at[b], vscr, sv)
    cp.start()
    cp2 = pltpu.make_async_copy(perm_hbm.at[b], pscr, sp)
    cp2.start()
    cp.wait()
    cp2.wait()
    dst = pscr[0:1, :]  # (1, BLK) destination position per row
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    onehot = (dst.reshape(BLK, 1) == cols).astype(jnp.bfloat16)
    v = vscr[...]
    hi = v.astype(jnp.bfloat16)
    mid_f = v - hi.astype(jnp.float32)
    mid = mid_f.astype(jnp.bfloat16)
    lo = (mid_f - mid.astype(jnp.float32)).astype(jnp.bfloat16)

    def mm(a):
        return jax.lax.dot_general(
            a, onehot, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    oscr[...] = mm(hi) + (mm(mid) + mm(lo))
    wr = pltpu.make_async_copy(oscr, out_hbm.at[b], so)
    wr.start()
    wr.wait()


def perm_bench():
    f8 = 16
    vals = jnp.asarray(rng.random((NB, f8, BLK)).astype(np.float32))
    perm = jnp.broadcast_to(
        jnp.asarray(
            np.stack([rng.permutation(BLK) for _ in range(NB)]).astype(np.int32)
        ).reshape(NB, 1, BLK),
        (NB, 8, BLK),
    ).astype(jnp.int32)
    fn = pl.pallas_call(
        _perm_kernel,
        grid=(NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((NB, f8, BLK), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((f8, BLK), jnp.float32),
            pltpu.VMEM((8, BLK), jnp.int32),
            pltpu.VMEM((f8, BLK), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    ms = chain_time(lambda v: fn(v, perm), vals, n_lo=2, n_hi=6)
    print(
        f"one-hot local permutation (16 rows x {BLK}x{BLK} bf16, {NB} blocks): "
        f"{ms:7.2f} ms  (local reorder only -- the apply still needs the "
        f"fragment DMAs on top)"
    )


perm_bench()
print(
    "\nconclusion inputs: counting sort total = phases12 + apply; compare "
    "against the 1-key+11-payload anchor above."
)
