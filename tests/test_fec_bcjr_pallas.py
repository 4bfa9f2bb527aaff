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


def test_bf16_packed_kernel_matches_f32(sigma=1.0):
    """The sublane-packed bf16 BCJR variant (a measured NEGATIVE result on
    perf — see its docstring — kept as a correct second implementation)
    must decode like the f32 paths: bit-exact on clean LLRs, statistically
    identical at the waterfall edge."""
    import jax
    import jax.numpy as jnp

    from dectnrp_tpu.phy.fec.turbo_jax import turbo_decode, turbo_encode

    K, Bc = 6144, 4
    rng = np.random.default_rng(0)
    bits = jnp.asarray(rng.integers(0, 2, (Bc, K)), jnp.uint8)
    d = np.asarray(jax.jit(lambda b: turbo_encode(b, K))(bits))
    llr = jnp.asarray(np.where(d > 0, 4.0, -4.0).astype(np.float32))
    out = np.asarray(turbo_decode(llr, K, n_iter=2,
                                  impl="pallas_bf16_interpret")[0])
    np.testing.assert_array_equal(out, np.asarray(bits))
    x = np.where(d > 0, 1.0, -1.0)
    y = x + sigma * rng.standard_normal(x.shape)
    lln = jnp.asarray((2.0 / sigma ** 2 * y).astype(np.float32))
    o_b = np.asarray(turbo_decode(lln, K, n_iter=4,
                                  impl="pallas_bf16_interpret")[0])
    o_x = np.asarray(turbo_decode(lln, K, n_iter=4, impl="xla")[0])
    # same decoded blocks at a comfortably-decodable noise level
    np.testing.assert_array_equal(o_b, o_x)
