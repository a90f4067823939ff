"""Round-3 micro-measurements on the real TPU (chained-dependent timing).

Usage: python -u scripts/perf/micro_round3.py <stage>
Stages: reduce | gather | sort | transpose

Timing discipline (axon tunnel): each timed call passes a FRESH salt that
perturbs the inputs (defeats result caching of repeat-identical calls);
inside one jit, reps chain through a runtime-opaque function of the
previous output (defeats XLA CSE of the unrolled reps). Per-op time =
(t_nrep - t_1rep) / (n - 1).
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
REPS = 4


def opaque_int(out):
    """Runtime zero that XLA cannot constant-fold."""
    return (jnp.asarray(out).ravel()[0].astype(jnp.float32) * 1e-30).astype(jnp.int32)


def opaque_f32(out):
    return jnp.asarray(out).ravel()[0].astype(jnp.float32) * 1e-30


def timeit(name, fn, args, salt_fn, perturb, reps=REPS):
    """fn(*args) -> array(s). salt_fn(args, salt:int32 scalar) perturbs
    inputs by a real value change; perturb(args, out) chains reps."""

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
        # block_until_ready is unreliable on the axon tunnel (deferred
        # execution); an actual value fetch is the only trustworthy sync.
        # The ~109ms RTT cancels in the (tn - t1) subtraction.
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


# ---- salts / perturbs for (int_idx_first, float_rest) arg tuples ----

def salt_int_first(a, salt):
    return ((a[0] + salt) % N,) + a[1:]


def pert_int_first(a, out):
    return ((a[0] + opaque_int(out)) % N,) + a[1:]


def stage_reduce(only=None):
    from luisacomputegaussiansplatting_tpu.ops.segsum import (
        reduce_fields_by_id, segment_sum_sorted, _pack_bf16_pairs,
        _unpack_bf16_pairs,
    )

    gid = jax.random.randint(ikey(0), (L,), 0, N, jnp.int32)
    rows = [jax.random.normal(ikey(i + 1), (L,), jnp.float32) for i in range(9)]
    args = (gid, *rows)

    def salt(a, s):
        return ((a[0] + s) % N,) + tuple(r + s.astype(jnp.float32) * 1e-6 for r in a[1:])

    def pert(a, out):
        z = opaque_f32(out)
        return ((a[0] + z.astype(jnp.int32)) % N,) + tuple(r + z for r in a[1:])

    if only in (None, "bf16_ride"):
        timeit("reduce_bf16_ride", lambda g, *r: reduce_fields_by_id(g, r, N, dtype="bf16"),
               args, salt, pert)
    if only in (None, "f32_ride"):
        timeit("reduce_f32_ride", lambda g, *r: reduce_fields_by_id(g, r, N, dtype="f32"),
               args, salt, pert)

    def cand_rowgather(g, *r):
        key = jnp.where(g >= 0, g, N)
        iota = jnp.arange(L, dtype=jnp.int32)
        skey, perm = jax.lax.sort((key, iota), num_keys=1)
        mat = jnp.stack(r, axis=1)  # (L, 9)
        srows = jnp.take(mat, perm, axis=0)
        keep = skey < N
        srows = jnp.where(keep[:, None], srows, 0.0)
        return segment_sum_sorted(skey, srows, N)

    if only in (None, "rowgather_f32"):
        timeit("reduce_sort2_rowgather_f32", cand_rowgather, args, salt, pert)

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

    if only in (None, "rowgather_bf16"):
        timeit("reduce_sort2_rowgather_bf16", cand_rowgather_bf16, args, salt, pert)


def stage_gather():
    idx = jax.random.randint(ikey(0), (L,), 0, N, jnp.int32)

    for cols in (16, 9, 8, 7, 6):
        tab = jax.random.normal(ikey(1), (N, cols), jnp.float32)
        timeit(f"rowgather_{cols}xf32",
               lambda i, t: jnp.take(t, i, axis=0).sum(axis=0),
               (idx, tab), salt_int_first, pert_int_first)

    # composite: gather -> field-major transpose (what build_payload pays)
    tab9 = jax.random.normal(ikey(1), (N, 9), jnp.float32)
    timeit("rowgather9_T",
           lambda i, t: (jnp.take(t, i, axis=0).T + 0.0).sum(axis=1),
           (idx, tab9), salt_int_first, pert_int_first)
    tab7 = jax.random.normal(ikey(1), (N, 7), jnp.float32)
    timeit("rowgather7_T",
           lambda i, t: (jnp.take(t, i, axis=0).T + 0.0).sum(axis=1),
           (idx, tab7), salt_int_first, pert_int_first)


def stage_sort():
    tile = jax.random.randint(ikey(0), (L,), 0, 2040, jnp.int32)
    depth = jax.random.uniform(ikey(1), (L,), jnp.float32, 0.2, 30.0)
    gid = jax.random.randint(ikey(2), (L,), 0, N, jnp.int32)
    args = (tile, depth, gid)

    def salt(a, s):
        return ((a[0] + s) % 2040, a[1], a[2])

    def pert(a, out):
        return ((a[0] + opaque_int(out[0])) % 2040, a[1], a[2])

    timeit("sort_2key_3op",
           lambda t, d, g: jax.lax.sort((t, d, g), num_keys=2, is_stable=True),
           args, salt, pert)
    timeit("sort_1key_3op",
           lambda t, d, g: jax.lax.sort((t, d, g), num_keys=1, is_stable=True),
           args, salt, pert)
    timeit("sort_1key_3op_unstable",
           lambda t, d, g: jax.lax.sort((t, d, g), num_keys=1, is_stable=False),
           args, salt, pert)
    timeit("sort_1key_2op",
           lambda t, d, g: jax.lax.sort((t, g), num_keys=1, is_stable=True),
           args, salt, pert)


def stage_transpose():
    rows = jax.random.normal(ikey(0), (9, L), jnp.float32)

    def salt(a, s):
        return (a[0] + s.astype(jnp.float32) * 1e-6,)

    def pert(a, out):
        return (a[0] + opaque_f32(out),)

    timeit("transpose_9xL_to_Lx9",
           lambda r: (r.T + 0.0).sum(axis=0), (rows,), salt, pert)

    vecs = tuple(jax.random.normal(ikey(i), (L,), jnp.float32) for i in range(9))

    def salt9(a, s):
        return tuple(v + s.astype(jnp.float32) * 1e-6 for v in a)

    def pert9(a, out):
        z = opaque_f32(out)
        return tuple(v + z for v in a)

    timeit("stack9_axis1",
           lambda *v: (jnp.stack(v, axis=1) + 0.0).sum(axis=0),
           vecs, salt9, pert9)


if __name__ == "__main__":
    if sys.argv[1] == "reduce":
        stage_reduce(sys.argv[2] if len(sys.argv) > 2 else None)
    else:
        {"gather": stage_gather, "sort": stage_sort,
         "transpose": stage_transpose}[sys.argv[1]]()
