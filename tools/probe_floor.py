"""Measure the per-program dispatch/sync floor of the tunneled TPU backend.

VERDICT r04 weak #1: every small kernel-report sweep point sits at ~4 ms
regardless of workload, so a constant per-program floor — never itself
measured — dominated the kernel rows and the device latency story. This
probe measures it directly:

  * empty      — jit of identity on a [1] float32 (zero compute, zero
                 meaningful traffic): synced_ms = the pipelined per-program
                 floor; host_ms = the full dispatch+compute+readback RTT.
  * tiny_add   — one VPU tile op ([8,128] add): floor + epsilon.
  * copy_100mb — 100 MB HBM->HBM copy (x+1.0): floor + ~0.26 ms of
                 bandwidth at 819 GB/s peak -> separates bandwidth from
                 floor with a workload large enough to escape it.
  * chain_k    — k copies of the tiny add fused in ONE jit vs k separate
                 jits: distinguishes per-PROGRAM floor from per-OP cost.

Writes JSON to stdout; used by tools/kernel_report.py prose and the
BENCH latency decomposition (reference headline <250 us, README.md:9 —
the honest comparison needs RTT and floor split out).
"""
from __future__ import annotations

import json
import sys
import os
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from dectnrp_tpu.common.benchtime import fetch, synced_ms

    dev = jax.devices()[0]
    rows = {}

    def host_ms(f, args, reps=20):
        fetch(f(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(f(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) * 1e3

    def both(name, f, args, iters=50):
        d = {"synced_ms": round(synced_ms(f, args, iters=iters), 4),
             "host_ms": round(host_ms(f, args), 4)}
        rows[name] = d
        print(json.dumps({name: d}), flush=True)

    one = jnp.ones((1,), jnp.float32)
    both("empty", jax.jit(lambda x: x), (one,))

    t8 = jnp.ones((8, 128), jnp.float32)
    both("tiny_add", jax.jit(lambda x: x + 1.0), (t8,))

    big = jnp.ones((50 * 1024, 256), jnp.float32)          # 50 MB in
    both("copy_50mb", jax.jit(lambda x: x + 1.0), (big,), iters=30)
    big2 = jnp.ones((200 * 1024, 256), jnp.float32)        # 200 MB in
    both("copy_200mb", jax.jit(lambda x: x + 1.0), (big2,), iters=30)

    # per-op vs per-program: 64 dependent tile ops in one program
    @jax.jit
    def chain(x):
        for i in range(64):
            x = x * 1.0001 + 0.001
        return x
    both("chain64_1prog", chain, (t8,))

    # the same total op count as 8 separate programs, queued back to back
    f1 = jax.jit(lambda x: x * 1.0001 + 0.001)
    fetch(f1(t8))
    t0 = time.perf_counter()
    y = t8
    for _ in range(50):
        for _ in range(8):
            y = f1(y)
    fetch(y)
    rows["tiny8_8prog_pipelined_ms"] = round(
        (time.perf_counter() - t0) / 50 * 1e3, 4)
    print(json.dumps({"tiny8_8prog_pipelined_ms":
                      rows["tiny8_8prog_pipelined_ms"]}), flush=True)

    out = {"platform": dev.platform, "rows": rows}
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
