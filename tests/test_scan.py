"""Pallas cummax kernel vs lax.cummax oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luisacomputegaussiansplatting_tpu.ops.scan import _BLOCK, cummax_i32


@pytest.mark.parametrize("n", [5, 1024, _BLOCK, _BLOCK + 1, 3 * _BLOCK + 777])
def test_cummax_matches_lax(n):
    rng = np.random.default_rng(n)
    x = jnp.asarray(rng.integers(-1000, 1000, n).astype(np.int32))
    got = cummax_i32(x, interpret=True)
    want = jax.lax.cummax(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cummax_carry_across_blocks():
    # max early in block 0 must propagate to the last block
    n = 2 * _BLOCK + 123
    x = jnp.full((n,), -5, jnp.int32).at[3].set(999)
    got = cummax_i32(x, interpret=True)
    assert int(got[-1]) == 999
    assert int(got[2]) == -5
