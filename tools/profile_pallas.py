#!/usr/bin/env python
"""Pallas-vs-XLA probes for this renderer's hot ops (VERDICT round-1 item 4).

Run on the real chip. Two questions, both answered by measurement:

1. Can a Pallas kernel beat XLA's native gather for the traversal's scattered
   ``(B, 8)`` node-row fetch (the measured bottleneck — tools/PERF_NOTES.md)?
   Strategies probed:
     a. ``jnp.take`` on a VMEM-resident table          -> does not lower
     b. ``jnp.take_along_axis`` (B,W) idx              -> does not lower
     c. flat ``take_along_axis`` (B*W,1)               -> does not lower
     d. scalar-prefetch BlockSpec row gather (grid=B)  -> (1,8) blocks violate
        the (8,128) tile floor; padding rows 16x defeats the point
     e. SMEM-index fori_loop of VMEM dynamic slices    -> lowers; SLOWER
        than XLA's gather (sequential scalar-issued row copies)
   Verdict: **no** — Mosaic has no vectorized scattered-gather primitive; the
   XLA gather (which saturates the hardware's row-rate) is the floor.
   Ratio convention everywhere (incl. PERF_NOTES): pallas/xla, >1 = pallas
   slower.  Both sides are timed as standalone jitted dispatches that
   materialize the (B, W) gathered block (symmetric protocol, ADVICE r2).

2. Can ``pltpu.prng_random_bits`` (hardware PRNG) beat threefry for the
   per-pass uniform block (B=65536 x 5 bounces x 18 slots)?
   Verdict: **no** — measured pallas/xla = 1.7x SLOWER (1.67 ms vs 0.97 ms
   for 4.7 MFloats, tools/PERF_NOTES.md); XLA's vectorized threefry is faster
   than the HW PRNG stream at this width, and uniforms are <2% of a render
   pass either way.

The renderer's hot loop is gather-bound with a ~free VPU body and no matmul
structure, so the MXU — the unit Pallas exists to feed — has nothing to do;
kernel-level wins here come from *fewer gather steps* (brick leaves: measured
and rejected; between-bounce compaction: measured and shipped), not from
hand-scheduling the fetches. Numbers recorded in tools/PERF_NOTES.md.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 17  # node-pool rows (4 MB of (N,8) i32: VMEM-resident is feasible)
W = 8
B = 4096  # traversal tile width


def bench(fn, *args, iters=30):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def probe_gather():
    table = jax.random.randint(jax.random.PRNGKey(0), (N, W), 0, 1 << 30, dtype=jnp.int32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, N, dtype=jnp.int32)
    ref = np.asarray(table)[np.asarray(idx)]

    # (e) the one strategy that lowers: SMEM indices, per-row VMEM dynamic slice
    def k_smem_loop(idx_ref, table_ref, out_ref):
        def body(i, _):
            out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(idx_ref[i], 1), :]
            return 0

        jax.lax.fori_loop(0, B, body, 0)

    pallas_gather = jax.jit(
        lambda idx, table: pl.pallas_call(
            k_smem_loop,
            out_shape=jax.ShapeDtypeStruct((B, W), jnp.int32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(idx, table)
    )

    out = jax.block_until_ready(pallas_gather(idx, table))
    assert np.array_equal(np.asarray(out), ref), "pallas gather parity"

    # XLA gather as a standalone dispatch materializing the same (B, 8)
    # output block — symmetric with the Pallas kernel (ADVICE r2: the old
    # 20-step scan reduced to a scalar amortized dispatch and possibly never
    # round-tripped the block to HBM, inflating the Pallas disadvantage)
    @jax.jit
    def xla_gather(idx, table):
        return table[idx]

    jax.block_until_ready(xla_gather(idx, table))
    t_pl = bench(pallas_gather, idx, table)
    t_xla = bench(xla_gather, idx, table)
    print(f"gather B={B} over {N} rows:")
    print(f"  pallas SMEM-loop : {t_pl*1e6:8.1f} us ({t_pl/B*1e9:6.2f} ns/row)")
    print(f"  XLA gather       : {t_xla*1e6:8.1f} us ({t_xla/B*1e9:6.2f} ns/row)")
    print(f"  ratio pallas/xla : {t_pl/t_xla:.1f}x (>1 = pallas slower)")
    print(f"  pallas/xla: {t_pl/t_xla:.2f}x  (>1 = pallas slower)")


def probe_rng():
    BL, NB, U = 65536, 5, 18
    tot = BL * NB * U
    grid = 64
    rows = -(-(-(-tot // 128)) // (8 * grid)) * 8 * grid
    tile = rows // grid

    def kernel(seed_ref, out_ref):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        bits = pltpu.bitcast(pltpu.prng_random_bits((tile, 128)), jnp.uint32)
        mant = jax.lax.shift_right_logical(bits, jnp.uint32(9))
        out_ref[:] = pltpu.bitcast(mant | jnp.uint32(0x3F800000), jnp.float32) - 1.0

    @jax.jit
    def pallas_uniforms(seed):
        flat = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        )(seed)
        return flat.reshape(-1)[:tot].reshape(BL, NB, U)

    @jax.jit
    def threefry_uniforms(key):
        return jax.random.uniform(key, (BL, NB, U), dtype=jnp.float32)

    seed = jnp.array([12345], jnp.int32)
    key = jax.random.PRNGKey(0)
    a = np.asarray(jax.block_until_ready(pallas_uniforms(seed)))
    assert 0.0 <= a.min() and a.max() < 1.0 and abs(a.mean() - 0.5) < 1e-2
    jax.block_until_ready(threefry_uniforms(key))
    t_pl = bench(pallas_uniforms, seed)
    t_tf = bench(threefry_uniforms, key)
    print(f"uniform block ({BL}x{NB}x{U}):")
    print(f"  pallas HW PRNG : {t_pl*1e6:8.1f} us")
    print(f"  XLA threefry   : {t_tf*1e6:8.1f} us")
    print(f"  pallas/xla: {t_pl/t_tf:.2f}x  (>1 = pallas slower)")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    probe_gather()
    probe_rng()
