import numpy as np
import jax, jax.numpy as jnp
from dectnrp_tpu.common.benchtime import synced_ms
from dectnrp_tpu.phy.rx import build_rx
from dectnrp_tpu.phy.tx import build_tx
from dectnrp_tpu.sections.part3.packet_sizes import PacketSizesDef, get_packet_sizes
from dectnrp_tpu.simulation.channels import awgn
from dectnrp_tpu.phy.fec.chain import PdcPlan, pdc_decode, pcc_decode, pdc_encode, pcc_encode

psdef = PacketSizesDef(1, 16, 1, 4, 0, 4, 6144)
ps = get_packet_sizes(psdef)
plan = PdcPlan.get(ps.N_TB_bits, ps.G, ps.mcs.N_bps, psdef.Z)
tx = build_tx(psdef, 0x12345678, 1)
rx = build_rx(psdef, 0x12345678, 1)
B = 64
rng = np.random.default_rng(0)
plcf = jnp.asarray(rng.integers(0, 2, (B, 40)), jnp.uint8)
tb = jnp.asarray(rng.integers(0, 2, (B, ps.N_TB_bits)), jnp.uint8)
nv = jnp.float32(10.0 ** (-15.0 / 10.0))
flags = jnp.zeros((B,), bool)

def t(f, *a, n=5):
    return synced_ms(f, a, iters=n)

tx_j = jax.jit(lambda p, t_: tx(p, t_, flags, flags))
iq = tx_j(plcf, tb)
awgn_j = jax.jit(lambda k, x: awgn(k, x, nv))
y = awgn_j(jax.random.PRNGKey(0), iq)
rx_j = jax.jit(lambda y: rx(y, nv))
print(f"tx:         {t(tx_j, plcf, tb):8.2f} ms", flush=True)
print(f"awgn:       {t(awgn_j, jax.random.PRNGKey(1), iq):8.2f} ms", flush=True)
print(f"rx full:    {t(rx_j, y):8.2f} ms", flush=True)

# TX decomposition
enc_j = jax.jit(lambda t_: pdc_encode(t_, plan, 0x12345678, 1))
print(f"pdc_encode: {t(enc_j, tb):8.2f} ms", flush=True)
pccenc_j = jax.jit(lambda p: pcc_encode(p, flags, flags, 1))
print(f"pcc_encode: {t(pccenc_j, plcf):8.2f} ms", flush=True)

llr_g = jnp.asarray(rng.normal(0, 4, (B, ps.G)).astype(np.float32))
for impl in ("xla", "pallas"):
    pdc_j = jax.jit(lambda l, impl=impl: pdc_decode(l, plan, 0x12345678, 1,
                                                    n_iter=6)[1])
    # force the impl through turbo_decode_early's impl arg via env? simpler:
    # time fixed-iteration decode per impl
    from dectnrp_tpu.phy.fec.chain import pdc_dematch
    from dectnrp_tpu.phy.fec.turbo_jax import turbo_decode
    d_by_k = pdc_dematch(llr_g, plan, 0x12345678, 1)
    K = plan.cb_K[0]
    dk = d_by_k[K]
    dec_j = jax.jit(lambda d, impl=impl: turbo_decode(d, K, n_iter=6, impl=impl)[0])
    print(f"turbo6 [{impl:6s}] (B={dk.shape[0]},K={K}): {t(dec_j, dk):8.2f} ms", flush=True)

pdc_j = jax.jit(lambda l: pdc_decode(l, plan, 0x12345678, 1, n_iter=6)[1])
print(f"pdc_decode(random llr): {t(pdc_j, llr_g):8.2f} ms", flush=True)
llr_p = jnp.asarray(rng.normal(0, 4, (B, 196)).astype(np.float32))
pcc_j = jax.jit(lambda l: (pcc_decode(l, 1, 6)[1], pcc_decode(l, 2, 6)[1]))
print(f"pcc_decode: {t(pcc_j, llr_p):8.2f} ms", flush=True)
