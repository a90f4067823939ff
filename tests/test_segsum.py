"""Tests for the Pallas sorted segment-sum (the gradient-reduction kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luisacomputegaussiansplatting_tpu.ops.segsum import (
    E,
    reduce_rows_by_id,
    segment_sum_sorted,
)


def _oracle(gid, rows, n_out):
    out = np.zeros((n_out, rows.shape[1]), np.float64)
    for g, r in zip(np.asarray(gid), np.asarray(rows)):
        if 0 <= g < n_out:
            out[g] += r
    return out.astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1])
def test_sorted_segment_sum_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n_out = 300
    L = 2 * E
    # clustered ids with gaps, ascending; tail = drop bin (== n_out)
    gid = np.sort(rng.integers(0, n_out, L - 100).astype(np.int32))
    gid = np.concatenate([gid, np.full(100, n_out, np.int32)])
    rows = rng.normal(size=(L, 9)).astype(np.float32)
    out = segment_sum_sorted(
        jnp.asarray(gid), jnp.asarray(rows), n_out, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), _oracle(gid, rows, n_out), rtol=1e-5, atol=1e-5
    )


def test_segment_spanning_many_chunks():
    """One id whose rows straddle several chunk boundaries (carry chain)."""
    n_out = 10
    L = 3 * E
    gid = np.full(L, 4, np.int32)
    gid[: E // 2] = 1
    gid[-3:] = 7
    rows = np.ones((L, 9), np.float32)
    out = segment_sum_sorted(
        jnp.asarray(gid), jnp.asarray(rows), n_out, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), _oracle(gid, rows, n_out))


def test_huge_id_gap_multi_window():
    """Chunk id span far beyond one window (the while-loop path)."""
    n_out = 5 * E
    L = E
    gid = np.sort(
        np.concatenate(
            [
                np.zeros(E // 2, np.int32),
                np.full(E // 2, n_out - 1, np.int32),  # gap of ~5 windows
            ]
        )
    )
    rows = np.arange(L * 2, dtype=np.float32).reshape(L, 2)
    out = segment_sum_sorted(
        jnp.asarray(gid), jnp.asarray(rows), n_out, interpret=True
    )
    oracle = _oracle(gid, rows, n_out)
    np.testing.assert_allclose(np.asarray(out), oracle, rtol=1e-5)
    # untouched gap rows stay exactly zero
    assert np.all(np.asarray(out[1 : n_out - 1]) == 0.0)


def test_reduce_rows_by_id_unsorted_with_invalid():
    rng = np.random.default_rng(3)
    n_out = 64
    L = 5000  # not a multiple of E: exercises padding
    gid = rng.integers(-1, n_out, L).astype(np.int32)  # -1 = dropped
    rows = rng.normal(size=(L, 9)).astype(np.float32)
    # garbage (NaN) in dropped rows must not leak into the sums
    rows[gid == -1] = np.nan
    out = reduce_rows_by_id(
        jnp.asarray(gid), jnp.asarray(rows), n_out, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out), _oracle(gid, rows, n_out), rtol=1e-4, atol=1e-5
    )


def test_gather_payload_grad_matches_dense():
    """gather_payload custom VJP == dense autodiff oracle."""
    from luisacomputegaussiansplatting_tpu.ops.render import gather_payload

    from luisacomputegaussiansplatting_tpu.ops.rasterize_pallas import (
        PAYLOAD_ROWS,
    )

    rng = np.random.default_rng(7)
    n, cap = 37, 4096
    table = jnp.asarray(rng.normal(size=(n, 9)).astype(np.float32))
    gid = jnp.asarray(
        np.where(
            rng.random(cap) < 0.2, -1, rng.integers(0, n, cap)
        ).astype(np.int32)
    )
    ct = jnp.asarray(rng.normal(size=(PAYLOAD_ROWS, cap)).astype(np.float32))

    def f(t):
        return jnp.vdot(gather_payload(t, gid, n), ct)

    def f_ref(t):
        safe = jnp.maximum(gid, 0)
        rows = jnp.where((gid >= 0)[:, None], jnp.take(t, safe, axis=0), 0.0)
        return jnp.vdot(rows.T, ct[:9])

    g = jax.grad(f)(table)
    g_ref = jax.grad(f_ref)(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_reduce_fields_matches_rows():
    from luisacomputegaussiansplatting_tpu.ops.segsum import (
        reduce_fields_by_id,
        reduce_rows_by_id,
    )

    rng = np.random.default_rng(9)
    n_out, L = 200, 9000
    gid = jnp.asarray(rng.integers(-1, n_out, L).astype(np.int32))
    rows = rng.normal(size=(L, 9)).astype(np.float32)
    rows[np.asarray(gid) == -1] = np.nan  # dropped garbage must not leak
    a = reduce_rows_by_id(gid, jnp.asarray(rows), n_out, interpret=True)
    fields = tuple(jnp.asarray(rows[:, i]) for i in range(9))
    for method in ("rowgather", "ride"):
        b = reduce_fields_by_id(
            gid, fields, n_out, interpret=True, method=method,
        )
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=method,
        )
        # bf16: per-entry rounding only — segment sums stay close
        c = reduce_fields_by_id(
            gid, fields, n_out, interpret=True, dtype="bf16", method=method,
        )
        scale = np.abs(np.asarray(a)).max()
        assert np.abs(np.asarray(c) - np.asarray(a)).max() < 2e-2 * scale
