"""HARQ soft combining: a TB that fails at low SNR decodes after combining
retransmissions (the reference's tb2pdc_awgn HARQ retx 0-3 oracle,
lib/src/phy/fec/test/tb2pdc_awgn.cpp:39-56)."""
import jax
import jax.numpy as jnp
import numpy as np

from dectnrp_tpu.phy.fec.chain import PdcPlan, pdc_encode
from dectnrp_tpu.phy.harq import (FinalizeRx, HarqProcessPool)
from dectnrp_tpu.phy.modulation import demap_llr, map_bits
from dectnrp_tpu.sections.part3.packet_sizes import PacketSizesDef, get_packet_sizes

NID = 0x12345678


def _llr_through_awgn(e_bits, snr_db, rng):
    """BPSK-ish channel on coded bits -> LLRs (convention L = log P(1)/P(0))."""
    x = 2.0 * np.asarray(e_bits, np.float32) - 1.0
    nv = 10 ** (-snr_db / 10)
    y = x + rng.standard_normal(x.shape).astype(np.float32) * np.sqrt(nv)
    return jnp.asarray(2.0 * y / nv)


def test_harq_combining_gain():
    psdef = PacketSizesDef(1, 1, 0, 4, 0, 4, 6144)
    ps = get_packet_sizes(psdef)
    plan = PdcPlan.get(ps.N_TB_bits, ps.G, ps.mcs.N_bps, psdef.Z)
    rng = np.random.default_rng(0)
    B = 4
    tb = jnp.asarray(rng.integers(0, 2, (B, ps.N_TB_bits)), jnp.uint8)

    pool = HarqProcessPool(n_tx=2, n_rx=2)
    proc = pool.get_process_rx(1, NID, psdef,
                               finalize=FinalizeRx.KEEP_FOR_RETRANSMISSION)
    assert proc is not None

    # SNR so low a single transmission fails for most packets
    snr = 1.0
    e0 = pdc_encode(tb, plan, NID, 1, rv=0)
    tb0, ok0 = proc.combine(_llr_through_awgn(e0, snr, rng))
    first_ok = int(np.sum(np.asarray(ok0)))

    # rv=1 retransmission into the same softbuffer
    proc.rv = 1
    e1 = pdc_encode(tb, plan, NID, 1, rv=1)
    tb1, ok1 = proc.combine(_llr_through_awgn(e1, snr, rng))
    second_ok = int(np.sum(np.asarray(ok1)))

    assert second_ok >= first_ok
    assert second_ok == B, (first_ok, second_ok)
    assert np.array_equal(np.asarray(tb1), np.asarray(tb))


def test_pool_leasing():
    psdef = PacketSizesDef(1, 1, 0, 2, 0, 2, 6144)
    pool = HarqProcessPool(n_tx=1, n_rx=1)
    p = pool.get_process_tx(1, NID, psdef)
    assert p is not None and p.leased
    assert pool.get_process_tx(1, NID, psdef) is None   # exhausted
    p.finalize_now()
    assert pool.get_process_tx(1, NID, psdef) is not None


def test_running_lease_cycle():
    psdef = PacketSizesDef(1, 1, 0, 2, 0, 2, 6144)
    pool = HarqProcessPool(n_rx=1)
    from dectnrp_tpu.phy.harq import FinalizeRx
    p = pool.get_process_rx(1, NID, psdef,
                            finalize=FinalizeRx.KEEP_FOR_RETRANSMISSION)
    pid = p.id
    assert pool.get_process_rx_running(pid, 1, FinalizeRx.RESET_AND_TERMINATE) is None
    p.finalize_now()                 # kept leased, not running
    assert p.leased
    p2 = pool.get_process_rx_running(pid, 1, FinalizeRx.RESET_AND_TERMINATE)
    assert p2 is p and p2.rv == 1
    p2.finalize_now()
    assert not p2.leased
