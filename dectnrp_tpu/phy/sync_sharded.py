"""Time-axis sharded sync: the SURVEY par. 2.9 centerpiece mapping.

The reference parallelizes the STF search by time-interleaving chunks of the
RX ring across sync worker threads with an overlap region of 4 STF lengths
(lib/src/phy/worker_pool.cpp:249-324, sync_param.hpp:77, baton-ordered, with
a unique-sync-time filter against double detections in the overlap). The
TPU-native mapping: block the IQ stream into contiguous chunks along a mesh
axis, halo-exchange the `overlap` head samples of the NEXT shard with one
`ppermute` (ring pattern over ICI), and run the dense per-chunk sync
(phy/sync.py: cumsum metric + matmul fine search) vmapped over each shard's
local chunks. Double detections in the halos are resolved by the same
unique-time rule as the reference baton, applied host-side to the gathered
report arrays (`dedup_reports`).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..sections.part3.transmission_packet_structure import get_N_samples_STF
from .sync import SyncParams, build_sync


def build_sync_sharded(u: int, b: int, chunk: int, n_chunks: int, mesh,
                       axis: str = "t", n_rx: int = 1,
                       params: SyncParams = SyncParams()):
    """Returns jitted f(iq [R, n_chunks*chunk]) -> report dict of [n_chunks]
    arrays (detected, t_global, cfo, n_eff_tx, metric, rms).

    iq's time axis is sharded over `axis` as n_chunks contiguous chunks
    (n_chunks % mesh.shape[axis] == 0). Each chunk is searched with
    `overlap = 4 STF` lookahead; the lookahead of a shard's last chunk is the
    next shard's first samples, fetched with one ppermute (the last shard's
    halo wraps to shard 0 and its tail detections are masked invalid).
    """
    n_dev = mesh.shape[axis]
    assert n_chunks % n_dev == 0
    c_loc = n_chunks // n_dev
    overlap = 4 * get_N_samples_STF(u, b)
    assert overlap < chunk, "chunk must exceed the overlap region"
    sync = build_sync(u, b, chunk + overlap, params=params)
    perm = [((i + 1) % n_dev, i) for i in range(n_dev)]  # receive from next

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    @jax.jit
    def f(iq: jax.Array) -> dict:
        R = iq.shape[0]

        # strided window index map, built once at trace time: the per-shard
        # program is O(1) in c_loc (one gather), not a c_loc-long slice chain
        win_idx = (np.arange(c_loc)[:, None] * chunk
                   + np.arange(chunk + overlap)[None, :])

        def local(x):
            # x [R, c_loc*chunk]: this shard's contiguous slice of the stream
            halo = jax.lax.ppermute(x[:, :overlap], axis, perm)
            ext = jnp.concatenate([x, halo], axis=-1)
            wins = ext[:, jnp.asarray(win_idx)].transpose(1, 0, 2)
            rep = sync(wins)                               # [c_loc, R, ...]
            base = (jax.lax.axis_index(axis) * c_loc
                    + jnp.arange(c_loc)) * chunk            # global chunk starts
            # a detection belongs to this chunk only if it starts inside it
            # (the overlap re-finds packets owned by the next chunk)
            own = rep["t_fine"] < chunk
            # the last chunk's halo wraps around the stream end: mask
            # detections whose correlation support reaches into the wrapped
            # samples (reference: the ring has no wrap in time)
            is_last = base + chunk >= n_chunks * chunk
            own = own & (~is_last | (rep["t_fine"] <= chunk - overlap))
            return {
                "detected": rep["detected"] & own,
                "t_global": (base + rep["t_fine"]).astype(jnp.int32),
                "cfo": rep["cfo"],
                "n_eff_tx": rep["n_eff_tx"],
                "metric": rep["metric"],
                "rms": rep["rms"],
            }

        return shard_map(
            local, mesh=mesh,
            in_specs=P(None, axis),
            out_specs=P(axis), check_vma=False)(iq)

    return f


def dedup_reports(rep: dict, u: int, b: int) -> list[dict]:
    """Host-side unique-sync-time filter over gathered chunk reports
    (reference baton_t::is_sync_time_unique, worker_pool.cpp:299-324)."""
    stf = get_N_samples_STF(u, b)
    det = np.asarray(rep["detected"])
    t = np.asarray(rep["t_global"])
    out, last = [], None
    for i in np.argsort(t):
        if not det[i]:
            continue
        if last is not None and abs(int(t[i]) - last) < stf:
            continue
        last = int(t[i])
        out.append({k: np.asarray(v)[i].item() for k, v in rep.items()})
    return out
