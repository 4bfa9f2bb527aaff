"""Pallas BCJR kernel vs the XLA windowed max-log-MAP oracle."""
import numpy as np
import pytest


def _rand_llrs(K, B, seed=0):
    import jax.numpy as jnp

    from dectnrp_tpu.phy.fec.turbo_jax import turbo_encode

    rng = np.random.default_rng(seed)
    c = rng.integers(0, 2, (B, K)).astype(np.uint8)
    d = np.asarray(turbo_encode(jnp.asarray(c), K)).astype(np.float32)
    llr = (2.0 * d - 1.0) * 4.0 + rng.standard_normal(d.shape).astype(np.float32)
    return c, jnp.asarray(llr)


@pytest.mark.parametrize("K,B", [(512, 3), (1056, 2), (2048, 1)])
def test_bcjr_pallas_matches_windowed(K, B):
    import jax.numpy as jnp

    from dectnrp_tpu.phy.fec.bcjr_pallas import bcjr_posterior_pallas
    from dectnrp_tpu.phy.fec.turbo_jax import _bcjr_posterior_windowed

    rng = np.random.default_rng(K)
    Ls = jnp.asarray(rng.standard_normal((B, K + 3)).astype(np.float32) * 3)
    Lp = jnp.asarray(rng.standard_normal((B, K + 3)).astype(np.float32) * 3)
    La = jnp.asarray(rng.standard_normal((B, K)).astype(np.float32))

    ref = np.asarray(_bcjr_posterior_windowed(Ls, Lp, La, K, Lw=128, D=32))
    got = np.asarray(bcjr_posterior_pallas(Ls, Lp, La, K, Lw=128, D=32,
                                           interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


def test_turbo_decode_pallas_impl_roundtrip():
    """Full turbo decode through the kernel path decodes cleanly."""
    import jax.numpy as jnp

    from dectnrp_tpu.phy.fec.turbo_jax import turbo_decode

    K, B = 1056, 2
    c, llr = _rand_llrs(K, B, seed=5)
    bits, _ = turbo_decode(llr, K, n_iter=4, impl="pallas_interpret")
    np.testing.assert_array_equal(np.asarray(bits), c)
    bits_x, _ = turbo_decode(llr, K, n_iter=4, impl="xla")
    np.testing.assert_array_equal(np.asarray(bits_x), c)
