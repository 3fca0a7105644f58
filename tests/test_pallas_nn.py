"""Pallas 1-NN kernel logic, validated on CPU via interpret mode
(SURVEY.md §4: CPU-runnable kernel tests the reference lacks)."""
import numpy as np
import jax.numpy as jnp

from pctpu.ops.pallas_nn import nearest_pallas


def test_nearest_pallas_interpret_matches_brute(rng):
    q = rng.uniform(-40, 40, size=(700, 3)).astype(np.float32)
    db = rng.uniform(-40, 40, size=(3000, 3)).astype(np.float32)
    d2, idx = nearest_pallas(jnp.asarray(q), jnp.asarray(db),
                             query_tile=256, db_tile=1024, interpret=True)
    ref = ((q[:, None, :] - db[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), ref.argmin(1))
    np.testing.assert_allclose(np.asarray(d2), ref.min(1), rtol=1e-6)


def test_nearest_pallas_interpret_mask(rng):
    q = rng.normal(size=(100, 3)).astype(np.float32)
    db = rng.normal(size=(500, 3)).astype(np.float32)
    mask = np.zeros(500, bool)
    mask[:321] = True
    d2, idx = nearest_pallas(jnp.asarray(q), jnp.asarray(db),
                             jnp.asarray(mask),
                             query_tile=128, db_tile=256, interpret=True)
    ref = ((q[:, None, :] - db[None, :321, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), ref.argmin(1))
