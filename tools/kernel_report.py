"""Per-kernel roofline report for the PHY hot ops on the current backend.

BASELINE.md target: "roofline efficiency reported for FFT + polyphase
resampler (+ correlator, equalizer) Pallas kernels per chip".  For each hot
op this measures wall time over `iters` steady-state runs and derives
achieved HBM bandwidth and FLOP rate against the chip's peaks (override via
DECTNRP_PEAK_GBPS / DECTNRP_PEAK_TFLOPS; defaults are TPU v5e: 819 GB/s HBM,
197 TFLOP/s bf16).

Usage:  python tools/kernel_report.py [--iters N] [--json out.json]
Prints one JSON line per kernel:
  {"kernel": ..., "ms": ..., "gbytes_s": ..., "gflops_s": ...,
   "bw_frac": ..., "flop_frac": ...}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PEAK_GBPS = float(os.environ.get("DECTNRP_PEAK_GBPS", 819.0))
PEAK_TFLOPS = float(os.environ.get("DECTNRP_PEAK_TFLOPS", 197.0))


def _bench(fn, args, iters):
    # fetch-synced: block_until_ready does not wait on the tunneled TPU
    # backend (see common/benchtime.py)
    from dectnrp_tpu.common.benchtime import synced_ms
    return synced_ms(fn, args, iters=iters) / 1e3


def _row(name, sec, bytes_moved, flops):
    gb = bytes_moved / sec / 1e9
    gf = flops / sec / 1e9
    return {
        "kernel": name,
        "ms": round(sec * 1e3, 4),
        "gbytes_s": round(gb, 2),
        "gflops_s": round(gf, 2),
        "bw_frac": round(gb / PEAK_GBPS, 4),
        "flop_frac": round(gf / (PEAK_TFLOPS * 1e3), 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--json", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dectnrp_tpu.phy.ops import use_pallas
    from dectnrp_tpu.phy.resampler import ResamplerPlan, build_resampler

    rows = []

    def add(r):
        rows.append(r)
        print(json.dumps(r), flush=True)

    rng = np.random.default_rng(0)
    on_tpu = use_pallas()

    # Complex64 cannot cross the device boundary on this backend
    # (common/cplx.py): inputs are pre-packed float32 [2, ...] planes merged
    # to complex INSIDE each benched jit; complex outputs are re-packed.
    def pack(x: np.ndarray) -> jax.Array:
        return jnp.asarray(np.stack([x.real, x.imag]).astype(np.float32))

    def cfjit(fn):
        @jax.jit
        def g(p):
            y = fn((p[0] + 1j * p[1]).astype(jnp.complex64))
            if jnp.iscomplexobj(y):
                y = jnp.stack([jnp.real(y), jnp.imag(y)])
            return y
        return g

    # ---- OFDM FFT (the per-symbol demod transform), b=16 flagship: N=1024
    B, S, N = 64, 64, 1024
    x = pack((rng.standard_normal((B, S, N))
              + 1j * rng.standard_normal((B, S, N))).astype(np.complex64))
    fft = cfjit(lambda a: jnp.fft.fft(a, axis=-1))
    sec = _bench(fft, (x,), args.iters)
    n_fft = B * S
    add(_row("fft1024_c64", sec, 2 * x.nbytes,
             n_fft * 5 * N * np.log2(N)))

    # ---- polyphase resampler 10/9 (DECT<->SDR bridge) per impl
    n_in = 9 * 4096
    xiq = pack((rng.standard_normal((B, n_in))
                + 1j * rng.standard_normal((B, n_in))).astype(np.complex64))
    plan = ResamplerPlan(10, 9)
    from dectnrp_tpu.phy.resampler import _design
    G, _, W = _design(plan)
    impls = ["gather", "xla_sf"] + (["pallas"] if on_tpu else [])
    for impl in impls:
        rs = cfjit(build_resampler(plan, n_in, impl=impl))
        sec = _bench(rs, (xiq,), args.iters)
        n_out = -(-n_in * 10 // 9)
        # complex in + complex out; FLOPs = 2 (re,im) * 2 (mul+add) * W/frame
        add(_row(f"polyphase_10_9[{impl}]", sec,
                 xiq.nbytes + B * n_out * 8,
                 B * (n_out // 10 + 1) * 2 * 2 * W * 10))

    # ---- crosscorrelator fine-search matmul (sync showcase), u=1 b=1
    from dectnrp_tpu.phy.sync import build_sync
    T = 4096
    sync = build_sync(1, 1, T)
    siq = pack((rng.standard_normal((B, 2, T))
                + 1j * rng.standard_normal((B, 2, T))).astype(np.complex64))
    sec = _bench(cfjit(lambda a: sync(a)["t_fine"]), (siq,), args.iters)
    L, D, M = 112, 33, 4
    add(_row("sync_chain_u1b1", sec, 2 * siq.nbytes,
             B * 2 * (6 * T + D * L * M * 8)))

    # ---- turbo decoder (max-log-MAP, 8 iter) at K=6144
    from dectnrp_tpu.phy.fec.turbo_jax import turbo_decode, turbo_encode
    K, Bc = 6144, 16
    bits = jnp.asarray(rng.integers(0, 2, (Bc, K)), jnp.uint8)
    # all device work must be jit-dispatched: eager ops deadlock on the
    # tunneled TPU backend (common/benchtime.py)
    enc = jax.jit(lambda b: turbo_encode(b, K))
    d = np.asarray(enc(bits))
    llr = jnp.asarray(np.where(d > 0, 4.0, -4.0).astype(np.float32))
    dec_impls = ["xla"] + (["pallas"] if on_tpu else [])
    for impl in dec_impls:
        dec = jax.jit(lambda l, impl=impl: turbo_decode(l, K, n_iter=8,
                                                        impl=impl)[0])
        sec = _bench(dec, (llr,), args.iters)
        # ~8 iter x 2 BCJR x (gamma 16 + alpha/beta 32 + post 32) flops/bit
        add(_row(f"turbo_maxlogmap_K6144[{impl}]", sec,
                 llr.nbytes + bits.nbytes, Bc * K * 8 * 2 * 80))

    # ---- MXU GF(2) turbo encoder at the flagship codeblock size
    sec = _bench(enc, (bits,), args.iters)
    add(_row("turbo_encode_K6144", sec,
             bits.nbytes + Bc * 3 * (K + 4),
             Bc * 2 * 2 * K * (512 + 3)))

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"backend": jax.default_backend(), "rows": rows}, f,
                      indent=1)


if __name__ == "__main__":
    main()
