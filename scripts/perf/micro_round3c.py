"""Round-3c micro-measurements: gradient-reduce variants (real TPU).

Usage: python -u scripts/perf/micro_round3c.py <stage>
Stages: reduce | sort6 | kernel

Isolates the two candidate wins in the backward gradient reduction
(measured 291 ms standalone at 10.7M entries / 6M ids, bf16 ride,
stable sort + HIGHEST-precision segsum matmuls):
  * unstable ride sort (segment sums are order-invariant up to float
    association);
  * DEFAULT-precision one-hot contraction when data is exactly
    bf16-representable (single MXU pass, bit-exact for bf16 data).

Timing discipline: see micro_round3.py (chained-dependent, salt per
call, (tn - t1)/(n-1)).
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
    return (jnp.asarray(out).ravel()[0].astype(jnp.float32) * 1e-30).astype(
        jnp.int32
    )


def opaque_f32(out):
    return jnp.asarray(out).ravel()[0].astype(jnp.float32) * 1e-30


def timeit(name, fn, args, salt_fn, perturb, reps=REPS):
    """ONE compiled graph; reps chain across dispatches through a lazy
    device scalar (data-dependent salt => no dispatch/result caching;
    the in-graph unrolled variant compiles 5-10x slower on the tunnel).
    """

    @jax.jit
    def run(salt, *a):
        a = salt_fn(a, salt)
        out = fn(*a)
        return jax.tree.map(lambda x: x.ravel()[0], out)

    def seq(n, k):
        out = run(jnp.int32(k), *args)
        for _ in range(n - 1):
            out = run(
                jnp.int32(k) + opaque_int(jax.tree.leaves(out)[0]), *args
            )
        return out

    def fetch(out):
        return jax.tree.map(lambda x: np.asarray(x), out)

    t0 = time.perf_counter()
    fetch(seq(1, 0))
    print(f"  [{name}] compiled in {time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    fetch(seq(reps, 1))
    t0 = time.perf_counter(); fetch(seq(1, 2)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); fetch(seq(reps, 3)); tn = time.perf_counter() - t0
    per = (tn - t1) / (reps - 1) * 1e3
    print(f"{name}: {per:.1f} ms  (1rep {t1*1e3:.1f}, {reps}rep {tn*1e3:.1f})",
          flush=True)
    return per


def ikey(k):
    return jax.random.PRNGKey(k)


def _reduce_args():
    gid = jax.random.randint(ikey(0), (L,), 0, N, jnp.int32)
    rows = [
        jax.random.normal(ikey(i + 1), (L,), jnp.float32) for i in range(9)
    ]
    return (gid, *rows)


def _salt(a, s):
    return ((a[0] + s) % N,) + tuple(
        r + s.astype(jnp.float32) * 1e-6 for r in a[1:]
    )


def _pert(a, out):
    z = opaque_f32(out)
    return ((a[0] + z.astype(jnp.int32)) % N,) + tuple(r + z for r in a[1:])


def stage_reduce(only=None):
    from luisacomputegaussiansplatting_tpu.ops.segsum import (
        reduce_fields_by_id,
    )

    args = _reduce_args()
    # baseline on record: 291 ms (stable sort + HIGHEST matmuls)
    if only in (None, "stable"):
        timeit(
            "reduce_bf16_stable_defaultprec",
            lambda g, *r: reduce_fields_by_id(
                g, r, N, dtype="bf16", stable=True
            ),
            args, _salt, _pert,
        )
    if only in (None, "unstable"):
        timeit(
            "reduce_bf16_unstable_defaultprec",
            lambda g, *r: reduce_fields_by_id(g, r, N, dtype="bf16"),
            args, _salt, _pert,
        )
    if only in (None, "f32u"):
        timeit(
            "reduce_f32_unstable_highest",
            lambda g, *r: reduce_fields_by_id(g, r, N, dtype="f32"),
            args, _salt, _pert,
        )


def stage_sort6():
    from luisacomputegaussiansplatting_tpu.ops.segsum import _pack_bf16_pairs

    args = _reduce_args()

    def mk(stable):
        def f(g, *r):
            key = jnp.where(g >= 0, g, N)
            packed = _pack_bf16_pairs(list(r))
            return jax.lax.sort(
                (key, *packed), num_keys=1, is_stable=stable
            )[0]

        return f

    timeit("sort6op_stable", mk(True), args, _salt, _pert)
    timeit("sort6op_unstable", mk(False), args, _salt, _pert)


def stage_kernel():
    """Segsum kernel alone on pre-sorted ids: HIGHEST vs DEFAULT."""
    from luisacomputegaussiansplatting_tpu.ops.segsum import (
        E, _ROWS, _segsum_call,
    )

    skey = jnp.sort(jax.random.randint(ikey(0), (L,), 0, N, jnp.int32))
    rows = [
        jax.random.normal(ikey(i + 1), (L,), jnp.float32) for i in range(9)
    ]
    args = (skey, *rows)

    def mk(precision):
        def f(k, *r):
            n_windows = -(-N // E)
            outside = jnp.float32(n_windows * E)
            ids_f = jnp.where(k < N, k.astype(jnp.float32), outside)
            pad = jnp.zeros((_ROWS - 10, L), jnp.float32)
            table = jnp.concatenate(
                [jnp.stack(list(r), axis=0), ids_f[None, :], pad], axis=0
            )
            tail = (
                jnp.zeros((_ROWS, E), jnp.float32).at[9, :].set(outside)
            )
            table = jnp.concatenate([table, tail], axis=1)
            return _segsum_call(k, table, N, 9, False, precision)

        return f

    def salt(a, s):
        return (a[0],) + tuple(
            r + s.astype(jnp.float32) * 1e-6 for r in a[1:]
        )

    def pert(a, out):
        z = opaque_f32(out)
        return (a[0],) + tuple(r + z for r in a[1:])

    timeit("tablebuild_plus_kernel_highest", mk(jax.lax.Precision.HIGHEST),
           args, salt, pert)
    timeit("tablebuild_plus_kernel_default", mk(jax.lax.Precision.DEFAULT),
           args, salt, pert)


if __name__ == "__main__":
    stage = sys.argv[1] if len(sys.argv) > 1 else "reduce"
    only = sys.argv[2] if len(sys.argv) > 2 else None
    if stage == "reduce":
        stage_reduce(only)
    elif stage == "sort6":
        stage_sort6()
    elif stage == "kernel":
        stage_kernel()
    else:
        raise SystemExit(f"unknown stage {stage}")
