"""Pallas in-VMEM bitonic sort vs jnp ground truth (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from water_sandbox_tpu.ops.pallas import bitonic_sort


@pytest.mark.parametrize("n", [1024, 1000, 4096, 2500])
def test_sort_pairs_matches_jnp(n):
    k = jax.random.PRNGKey(n)
    keys = jax.random.randint(k, (n,), 0, 5000, dtype=jnp.int32)
    vals = jnp.arange(n, dtype=jnp.int32)
    sk, sv = bitonic_sort.sort_pairs(keys, vals, interpret=True)
    sk, sv = np.asarray(sk), np.asarray(sv)

    ref = np.sort(np.asarray(keys))
    np.testing.assert_array_equal(sk, ref)
    # values form a permutation consistent with the keys
    assert sorted(sv.tolist()) == list(range(n))
    np.testing.assert_array_equal(np.asarray(keys)[sv], sk)


def test_argsort_keys_orders_cells():
    keys = jnp.asarray([5, 3, 3, 9, 0, 5, 3, 1] * 128, jnp.int32)
    sk, order = bitonic_sort.argsort_keys(keys, interpret=True)
    assert (np.diff(np.asarray(sk)) >= 0).all()
    np.testing.assert_array_equal(np.asarray(keys)[np.asarray(order)],
                                  np.asarray(sk))
