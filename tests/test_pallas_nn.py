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


def test_nearest_banded_interpret(rng):
    from pctpu.ops.pallas_banded import build_banded, nearest_banded
    db = rng.uniform(0, 10, size=(2048, 3)).astype(np.float32)
    db[:, 0] *= 10  # make axis 0 the widest
    q = (db[:512] + rng.normal(scale=0.05, size=(512, 3))).astype(np.float32)
    q = q[np.argsort(q[:, 0])]  # tile coherence
    bdb = build_banded(jnp.asarray(db), block=256)
    d2, idx = nearest_banded(bdb, jnp.asarray(q), block=256,
                             window_blocks=4, query_tile=128,
                             interpret=True)
    ref = ((q[:, None, :] - db[None]) ** 2).sum(-1)
    ri = ref.argmin(1)
    # near-exact: queries are jittered db points, window is generous
    match = (np.asarray(idx) == ri).mean()
    assert match > 0.95
    np.testing.assert_allclose(np.asarray(d2)[np.asarray(idx) == ri],
                               ref.min(1)[np.asarray(idx) == ri], rtol=1e-5)


def test_nearest_banded_respects_mask(rng):
    from pctpu.ops.pallas_banded import build_banded, nearest_banded
    db = rng.uniform(0, 10, size=(1024, 3)).astype(np.float32)
    mask = np.zeros(1024, bool)
    mask[:700] = True
    q = db[:128]
    bdb = build_banded(jnp.asarray(db), jnp.asarray(mask), block=256)
    d2, idx = nearest_banded(bdb, jnp.asarray(q), block=256,
                             window_blocks=4, query_tile=128,
                             interpret=True)
    assert np.all(np.asarray(idx) < 700)
