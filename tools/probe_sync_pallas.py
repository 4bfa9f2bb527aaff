"""TPU probe: fused Pallas detection vs XLA prefix-sum sync, bench shapes.

Times build_sync at the u8b16 headline configuration (T=192512) and the
flagship u1b16 shape, xla vs pallas detect_impl, with the fetch-RTT-free
marginal timer. Also sanity-checks that the pallas path detects an
injected packet on silicon (non-interpret Mosaic lowering).
"""
from __future__ import annotations

import json
import sys
import os

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dectnrp_tpu.common.benchtime import synced_ms_marginal
    from dectnrp_tpu.common.cplx import cwrap_cached as _cw
    from dectnrp_tpu.phy.sync import build_sync
    from dectnrp_tpu.phy.tx import build_tx
    from dectnrp_tpu.sections.part3.packet_sizes import (PacketSizesDef,
                                                         get_packet_sizes)

    print(json.dumps({"platform": jax.devices()[0].platform}), flush=True)
    rng = np.random.default_rng(0)

    # correctness on silicon first: u8b16 packet in noise, pallas detect
    psdef = PacketSizesDef(8, 16, 1, 1, 0, 4, 6144)
    ps = get_packet_sizes(psdef)
    tx = _cw(build_tx(psdef, 0x12345678, 1))
    plcf = rng.integers(0, 2, (1, 40)).astype(np.uint8)
    tb = rng.integers(0, 2, (1, ps.N_TB_bits)).astype(np.uint8)
    fl = np.zeros((1,), bool)
    iq = tx(plcf, tb, fl, fl)[0]
    T = 192512
    off = 31000
    stream = (rng.standard_normal((1, 1, T))
              + 1j * rng.standard_normal((1, 1, T))).astype(np.complex64)
    stream *= np.sqrt(10 ** (-15 / 10) / 2)
    stream[0, :, off:off + iq.shape[-1]] += iq
    for impl in ("pallas", "xla"):
        s = _cw(build_sync(8, 16, T, detect_impl=impl))
        rep = s(stream)
        print(json.dumps({"impl": impl, "detected": bool(rep["detected"][0]),
                          "t_fine": int(rep["t_fine"][0]), "off": off,
                          "metric": round(float(rep["metric"][0]), 4)}),
              flush=True)

    # timing sweep
    rows = []
    for (u, b, B, T) in ((8, 16, 16, 192512), (8, 16, 64, 192512),
                         (8, 16, 128, 192512), (1, 16, 64, 192512)):
        x = (rng.standard_normal((B, 1, T))
             + 1j * rng.standard_normal((B, 1, T))).astype(np.complex64)
        xp = jnp.asarray(np.stack([x.real, x.imag]))
        for impl in ("pallas", "xla"):
            sync = build_sync(u, b, T, detect_impl=impl)

            @jax.jit
            def g(p, s=sync):
                return s((p[0] + 1j * p[1]).astype(jnp.complex64))["t_fine"]

            ms = synced_ms_marginal(g, (xp,), iters=8)
            row = {"u": u, "b": b, "B": B, "T": T, "impl": impl,
                   "marginal_ms": round(ms, 3),
                   "gbytes_s": round(B * T * 8 / (ms / 1e3) / 1e9, 1)}
            rows.append(row)
            print(json.dumps(row), flush=True)
    print("RESULT " + json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
