"""Gradient-reduction breakdown at the 6M north-star scale (real TPU).

The round-4 queue measured reduce_bwd[rowgather] = 223.7 ms — the
largest backward stage. This decomposes it: sort-only, sort+gather,
and the full packed reduction (both methods), so the segsum-kernel and
data-movement shares are separated by subtraction.

Usage: python -u scripts/perf/micro_reduce.py <variant>
  variant in: sort, gather, rowgather, ride, f32
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from luisacomputegaussiansplatting_tpu.ops import segsum

import os

L = int(os.environ.get("MR_L", 10_600_000))  # north-star max_pairs_sorted
N = int(os.environ.get("MR_N", 6_000_000))
COLS = 9
REPS = 4

variant = sys.argv[1]

key0 = jax.random.PRNGKey(0)
# entry gids with the production distribution shape: sorted-by-tile
# entries hit gaussians in near-random order; ~12% drop rows (gid -1)
gid = jax.random.randint(key0, (L,), -1, N, dtype=jnp.int32)
fields = tuple(
    jax.random.normal(jax.random.fold_in(key0, i), (L,), jnp.float32)
    for i in range(COLS)
)
jax.block_until_ready((gid, fields))


def run_sort(salt, gid, *fields):
    key = jnp.where(gid >= 0, gid, N) + (salt * 0).astype(jnp.int32)
    iota = jnp.arange(L, dtype=jnp.int32)
    sk, perm = jax.lax.sort((key, iota), num_keys=2, is_stable=False)
    return sk[0].astype(jnp.float32) + perm[-1].astype(jnp.float32)


def run_gather(salt, gid, *fields):
    key = jnp.where(gid >= 0, gid, N) + (salt * 0).astype(jnp.int32)
    iota = jnp.arange(L, dtype=jnp.int32)
    sk, perm = jax.lax.sort((key, iota), num_keys=2, is_stable=False)
    packed = segsum._pack_bf16_pairs(list(fields))
    mat = jnp.stack(packed, axis=1).astype(jnp.int32)
    sp = jnp.take(mat, perm, axis=0)
    return sp.ravel()[0].astype(jnp.float32) + sk[0].astype(jnp.float32)


INTERPRET = bool(int(os.environ.get("MR_INTERPRET", "0")))  # CPU smoke


def run_reduce(method, dtype):
    def f(salt, gid, *fields):
        fs = (fields[0] + salt,) + fields[1:]
        out = segsum.reduce_fields_by_id(
            gid, fs, N, interpret=INTERPRET, dtype=dtype, method=method
        )
        return out.ravel()[0]

    return f


FN = {
    "sort": run_sort,
    "gather": run_gather,
    "rowgather": run_reduce("rowgather", "bf16"),
    "ride": run_reduce("ride", "bf16"),
    "f32": run_reduce("rowgather", "f32"),
}[variant]

f = jax.jit(FN)


def seq(n, k):
    out = f(jnp.float32(k) * 1e-30, gid, *fields)
    for _ in range(n - 1):
        out = f(out * 1e-30 + jnp.float32(k) * 1e-30, gid, *fields)
    return out


t0 = time.perf_counter()
np.asarray(seq(1, 0))
print(f"  [{variant}] compiled in {time.perf_counter()-t0:.0f}s",
      file=sys.stderr, flush=True)
np.asarray(seq(REPS, 1))
t0 = time.perf_counter(); np.asarray(seq(1, 2)); t1 = time.perf_counter() - t0
t0 = time.perf_counter(); np.asarray(seq(REPS, 3)); tn = time.perf_counter() - t0
per = (tn - t1) / (REPS - 1) * 1e3
print(f"reduce_micro[{variant}]: {per:.1f} ms  "
      f"(1rep {t1*1e3:.1f}, {REPS}rep {tn*1e3:.1f})", flush=True)
