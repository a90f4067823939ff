"""Round-3 micro-measurements, part 2: fused-key entry sort + reduce
candidates. Chained-dependent timing (see scripts/perf/micro_round3.py discipline).

Usage: python -u scripts/perf/micro_round3b.py <stage>   # fused | reduce
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

L = 10_700_000
N = 6_000_000
NT = 2040  # 1080p tile=32 grid
REPS = 4


def opaque_int(out):
    return (jnp.asarray(out).ravel()[0].astype(jnp.float32) * 1e-30).astype(jnp.int32)


def opaque_f32(out):
    return jnp.asarray(out).ravel()[0].astype(jnp.float32) * 1e-30


def timeit(name, fn, args, salt_fn, perturb, reps=REPS):
    def chain(n):
        @jax.jit
        def run(salt, *a):
            a = salt_fn(a, salt)
            out = fn(*a)
            for _ in range(n - 1):
                a = perturb(a, out)
                out = fn(*a)
            return jax.tree.map(lambda x: x.ravel()[0], out)

        return run

    def fetch(out):
        return jax.tree.map(lambda x: np.asarray(x), out)

    r1, rn = chain(1), chain(reps)
    fetch(r1(jnp.int32(0), *args))
    fetch(rn(jnp.int32(1), *args))
    t0 = time.perf_counter(); fetch(r1(jnp.int32(2), *args)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); fetch(rn(jnp.int32(3), *args)); tn = time.perf_counter() - t0
    per = (tn - t1) / (reps - 1) * 1e3
    print(f"{name}: {per:.1f} ms  (1rep {t1*1e3:.1f}, {reps}rep {tn*1e3:.1f})", flush=True)
    return per


def ikey(k):
    return jax.random.PRNGKey(k)


def stage_fused():
    tile = jax.random.randint(ikey(0), (L,), 0, NT, jnp.int32)
    depth = jax.random.uniform(ikey(1), (L,), jnp.float32, 0.2, 30.0)
    gid = jax.random.randint(ikey(2), (L,), 0, N, jnp.int32)
    args = (tile, depth, gid)

    def salt(a, s):
        return ((a[0] + s) % NT, a[1], a[2])

    def pert(a, out):
        return ((a[0] + opaque_int(out[0])) % NT, a[1], a[2])

    tb = (NT + 1).bit_length()  # 11
    db = 32 - tb

    def fuse(t, d):
        dbits = jax.lax.bitcast_convert_type(d, jnp.int32)
        dq = jax.lax.shift_right_logical(dbits, 31 - db) & ((1 << db) - 1)
        return (t.astype(jnp.uint32) << db) | dq.astype(jnp.uint32)

    def f_stable(t, d, g):
        k = fuse(t, d)
        sk, sg = jax.lax.sort((k, g), num_keys=1, is_stable=True)
        return (sk >> db).astype(jnp.int32), sg

    def f_unstable(t, d, g):
        k = fuse(t, d)
        sk, sg = jax.lax.sort((k, g), num_keys=1, is_stable=False)
        return (sk >> db).astype(jnp.int32), sg

    timeit("sort_fused_2op_stable", f_stable, args, salt, pert)
    timeit("sort_fused_2op_unstable", f_unstable, args, salt, pert)


def stage_reduce():
    from luisacomputegaussiansplatting_tpu.ops.segsum import (
        segment_sum_sorted, _pack_bf16_pairs, _unpack_bf16_pairs,
    )

    gid = jax.random.randint(ikey(0), (L,), 0, N, jnp.int32)
    rows = [jax.random.normal(ikey(i + 1), (L,), jnp.float32) for i in range(9)]
    args = (gid, *rows)

    def salt(a, s):
        return ((a[0] + s) % N,) + tuple(r + s.astype(jnp.float32) * 1e-6 for r in a[1:])

    def pert(a, out):
        z = opaque_f32(out)
        return ((a[0] + z.astype(jnp.int32)) % N,) + tuple(r + z for r in a[1:])

    def cand_rowgather(g, *r):
        key = jnp.where(g >= 0, g, N)
        iota = jnp.arange(L, dtype=jnp.int32)
        skey, perm = jax.lax.sort((key, iota), num_keys=1)
        mat = jnp.stack(r, axis=1)  # (L, 9)
        srows = jnp.take(mat, perm, axis=0)
        keep = skey < N
        srows = jnp.where(keep[:, None], srows, 0.0)
        return segment_sum_sorted(skey, srows, N)

    def cand_rowgather_bf16(g, *r):
        key = jnp.where(g >= 0, g, N)
        iota = jnp.arange(L, dtype=jnp.int32)
        skey, perm = jax.lax.sort((key, iota), num_keys=1)
        packed = _pack_bf16_pairs(list(r))  # 5 x (L,) uint32
        mat = jnp.stack(packed, axis=1)  # (L, 5)
        sp = jnp.take(mat, perm, axis=0)
        fields = _unpack_bf16_pairs([sp[:, i] for i in range(5)], 9)
        keep = skey < N
        srows = jnp.stack([jnp.where(keep, f, 0.0) for f in fields], axis=1)
        return segment_sum_sorted(skey, srows, N)

    timeit("reduce_sort2_rowgather_bf16", cand_rowgather_bf16, args, salt, pert)
    timeit("reduce_sort2_rowgather_f32", cand_rowgather, args, salt, pert)


if __name__ == "__main__":
    {"fused": stage_fused, "reduce": stage_reduce}[sys.argv[1]]()
