"""Turbo codec tests: numpy/JAX encoder equality, decode round trips, AWGN."""
import numpy as np
import pytest

from dectnrp_tpu.phy.fec import turbo_np
from dectnrp_tpu.phy.fec.qpp import F1_F2, interleaver
from dectnrp_tpu.phy.fec.rate_match import (
    cb_e_sizes, rx_rate_dematch, sel_indices, tx_rate_match)


def test_qpp_all_permutations():
    for K in F1_F2:
        interleaver(K)  # asserts permutation property internally
    assert len(F1_F2) == 188


def test_qpp_spot_values():
    # K=40: f1=3, f2=10 -> Pi(0)=0, Pi(1)=13, Pi(2)=(6+40)%40=6
    pi = interleaver(40)
    assert pi[0] == 0 and pi[1] == 13 and pi[2] == 6


def test_np_encoder_terminates():
    rng = np.random.default_rng(0)
    for K in (40, 96, 320):
        c = rng.integers(0, 2, K).astype(np.uint8)
        d = turbo_np.turbo_encode(c)
        assert d.shape == (3, K + 4)
        np.testing.assert_array_equal(d[0, :K], c)


def test_jax_encoder_matches_numpy():
    import jax.numpy as jnp

    from dectnrp_tpu.phy.fec.turbo_jax import turbo_encode
    rng = np.random.default_rng(1)
    for K in (40, 56, 96, 320, 2048):
        c = rng.integers(0, 2, (3, K)).astype(np.uint8)
        d_jax = np.asarray(turbo_encode(jnp.asarray(c), K))
        for b in range(3):
            d_np = turbo_np.turbo_encode(c[b])
            np.testing.assert_array_equal(d_jax[b], d_np, err_msg=f"K={K} b={b}")


def test_rate_match_roundtrip_properties():
    for K in (40, 96, 320):
        for rv in (0, 1, 2, 3):
            E = 2 * (3 * (K + 4))  # with repetition
            sel = sel_indices(K, E, rv)
            assert sel.min() >= 0 and sel.max() < 3 * (K + 4)
            # one full cycle covers every position
            assert np.unique(sel[:3 * (K + 4)]).size == 3 * (K + 4)


def test_rate_match_tx_rx_consistency():
    rng = np.random.default_rng(2)
    K = 96
    d = rng.integers(0, 2, (3, K + 4)).astype(np.uint8)
    e = tx_rate_match(d, 196, rv=0)
    llr = (2.0 * e - 1.0) * 4.0
    d_llr = rx_rate_dematch(llr, K, rv=0)
    # every position hit by the selection agrees in sign
    hit = d_llr != 0
    np.testing.assert_array_equal((d_llr[hit] > 0).astype(np.uint8), d[hit])


def test_cb_e_sizes():
    assert cb_e_sizes(644, 2, 1) == [644]
    sizes = cb_e_sizes(10000, 4, 3)
    assert sum(sizes) == 10000
    assert all(s % 4 == 0 for s in sizes)
    assert sizes == sorted(sizes)  # floor blocks first


@pytest.mark.parametrize("K", [40, 96, 320])
def test_turbo_decode_noiseless(K):
    import jax.numpy as jnp

    from dectnrp_tpu.phy.fec.turbo_jax import turbo_decode, turbo_encode
    rng = np.random.default_rng(3)
    c = rng.integers(0, 2, (4, K)).astype(np.uint8)
    d = np.asarray(turbo_encode(jnp.asarray(c), K)).astype(np.float32)
    llr = (2.0 * d - 1.0) * 5.0
    bits, _ = turbo_decode(jnp.asarray(llr), K, n_iter=4)
    np.testing.assert_array_equal(np.asarray(bits), c)


def test_turbo_decode_awgn():
    """Rate-1/3 turbo at ~1.5 dB Eb/N0 should decode short blocks reliably."""
    import jax.numpy as jnp

    from dectnrp_tpu.phy.fec.turbo_jax import turbo_decode, turbo_encode
    rng = np.random.default_rng(4)
    K, B = 320, 16
    c = rng.integers(0, 2, (B, K)).astype(np.uint8)
    d = np.asarray(turbo_encode(jnp.asarray(c), K)).astype(np.float64)
    x = 2.0 * d - 1.0
    ebn0_db = 1.5
    rate = K / (3 * (K + 4))
    sigma = np.sqrt(1.0 / (2 * rate * 10 ** (ebn0_db / 10)))
    y = x + sigma * rng.standard_normal(x.shape)
    llr = 2.0 * y / sigma**2
    bits, _ = turbo_decode(jnp.asarray(llr, dtype=jnp.float32), K, n_iter=8)
    ber = np.mean(np.asarray(bits) != c)
    assert ber < 1e-3, f"BER {ber} too high at {ebn0_db} dB Eb/N0"


def test_turbo_decode_early_stop_matches_fixed():
    """CRC-gated early stop (reference pdc_enc.cpp:367-401): converges in
    ~1 iteration at good SNR with bit-exact output; at garbage LLRs it runs
    to n_iter_max and reports CRC failure."""
    import jax
    import jax.numpy as jnp

    from dectnrp_tpu.phy.fec.crc import POLY_CRC24B, attach_crc, crc_matrix
    from dectnrp_tpu.phy.fec.turbo_jax import (turbo_decode,
                                               turbo_decode_early,
                                               turbo_encode)

    K, B = 1056, 8
    rng = np.random.default_rng(7)
    payload = rng.integers(0, 2, (B, K - 24)).astype(np.uint8)
    bits = np.stack([attach_crc(p, POLY_CRC24B) for p in payload])
    bj = jnp.asarray(bits, jnp.uint8)
    d = turbo_encode(bj, K)
    m = jnp.asarray(crc_matrix(K - 24, POLY_CRC24B))

    llr = jnp.asarray(np.where(np.asarray(d) > 0, 4.0, -4.0)
                      + rng.standard_normal(d.shape) * 1.5, jnp.float32)
    got, _, ok, n_it = jax.jit(
        lambda l: turbo_decode_early(l, m, K, n_iter_max=8))(llr)
    assert bool(jnp.all(ok)) and int(n_it) < 8
    np.testing.assert_array_equal(np.asarray(got), bits)

    # garbage input: must exhaust iterations and flag failure
    junk = jnp.asarray(rng.standard_normal(d.shape) * 0.1, jnp.float32)
    _, _, ok_j, n_it_j = jax.jit(
        lambda l: turbo_decode_early(l, m, K, n_iter_max=4))(junk)
    assert int(n_it_j) == 4 and not bool(jnp.all(ok_j))


def test_linear_encoder_equals_scan_encoder():
    """The MXU blocked-GF(2) encoder (turbo_encode) must be bit-exact vs the
    per-bit lax.scan oracle (turbo_encode_scan) across the K lattice incl.
    the production codeblock sizes Z=2048/6144."""
    import jax.numpy as jnp

    from dectnrp_tpu.phy.fec.turbo_jax import turbo_encode, turbo_encode_scan

    rng = np.random.default_rng(11)
    for K in (40, 56, 96, 512, 1056, 2048, 6144):
        c = jnp.asarray(rng.integers(0, 2, (4, K)), jnp.uint8)
        np.testing.assert_array_equal(
            np.asarray(turbo_encode(c, K)),
            np.asarray(turbo_encode_scan(c, K)), err_msg=f"K={K}")


def test_early_stop_min_iteration_gate():
    """n_iter_min=2 (reference SRSRAN_PDSCH_MIN_TDEC_ITERS) must reject
    iteration-1 CRC passes: acceptance only from iteration >= 2."""
    import jax
    import jax.numpy as jnp

    from dectnrp_tpu.phy.fec.crc import POLY_CRC24B, attach_crc, crc_matrix
    from dectnrp_tpu.phy.fec.turbo_jax import turbo_decode_early, turbo_encode

    K, B = 1056, 4
    rng = np.random.default_rng(23)
    payload = rng.integers(0, 2, (B, K - 24)).astype(np.uint8)
    bits = np.stack([attach_crc(p, POLY_CRC24B) for p in payload])
    d = turbo_encode(jnp.asarray(bits, jnp.uint8), K)
    m = jnp.asarray(crc_matrix(K - 24, POLY_CRC24B))
    llr = jnp.asarray(np.where(np.asarray(d) > 0, 8.0, -8.0), jnp.float32)

    # clean input: n_iter_min=1 can stop after iteration 1; n_iter_min=2 must
    # run at least 2 iterations, and both decode bit-exactly.
    g1, _, ok1, n1 = jax.jit(
        lambda l: turbo_decode_early(l, m, K, n_iter_max=8, n_iter_min=1))(llr)
    g2, _, ok2, n2 = jax.jit(
        lambda l: turbo_decode_early(l, m, K, n_iter_max=8, n_iter_min=2))(llr)
    assert int(n1) == 1 and int(n2) == 2
    assert bool(jnp.all(ok1)) and bool(jnp.all(ok2))
    np.testing.assert_array_equal(np.asarray(g1), bits)
    np.testing.assert_array_equal(np.asarray(g2), bits)
