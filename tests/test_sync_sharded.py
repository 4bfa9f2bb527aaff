"""Time-axis sharded sync over the 8-device CPU mesh.

Oracle: the reference's chunked sync workers with 4-STF overlap and
unique-time double-detection rejection (worker_pool.cpp:249-324,
sync_chunk.cpp:63-69). The sharded search must find exactly the packets a
dense serial search finds, with identical timing.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from dectnrp_tpu.phy.sync import build_sync
from dectnrp_tpu.phy.sync_sharded import build_sync_sharded, dedup_reports
from dectnrp_tpu.phy.tx import build_tx
from dectnrp_tpu.sections.part3.packet_sizes import PacketSizesDef, get_packet_sizes

NID = 0x12345678
U, B_ = 1, 1
CHUNK = 2048


def _stream_with_packets(offsets, T, snr_db=12.0, seed=0):
    psdef = PacketSizesDef(U, B_, 0, 2, 0, 2, 6144)
    ps = get_packet_sizes(psdef)
    tx = build_tx(psdef, NID, 1)
    rng = np.random.default_rng(seed)
    n = len(offsets)
    plcf = jnp.asarray(rng.integers(0, 2, (n, 40)), jnp.uint8)
    tb = jnp.asarray(rng.integers(0, 2, (n, ps.N_TB_bits)), jnp.uint8)
    fl = jnp.zeros((n,), bool)
    iq = np.asarray(tx(plcf, tb, fl, fl))
    sig = np.mean(np.abs(iq) ** 2)
    nv = sig / 10 ** (snr_db / 10)
    stream = (rng.standard_normal((1, T)) + 1j * rng.standard_normal((1, T)))
    stream *= np.sqrt(nv / 2)
    for i, off in enumerate(offsets):
        stream[:, off:off + iq.shape[-1]] += iq[i]
    return stream.astype(np.complex64)


def test_sharded_sync_matches_serial():
    n_chunks = 16                       # 2 chunks per device on the 8-dev mesh
    T = n_chunks * CHUNK
    # one packet well inside a chunk, one straddling a chunk boundary, one
    # straddling a DEVICE boundary (chunk 7->8 with 8 devices x 2 chunks)
    offsets = [1000, 3 * CHUNK - 300, 8 * CHUNK - 400, 12 * CHUNK + 500]
    stream = _stream_with_packets(offsets, T)

    mesh = Mesh(np.array(jax.devices()[:8]), ("t",))
    f = build_sync_sharded(U, B_, CHUNK, n_chunks, mesh)
    rep = f(jnp.asarray(stream))
    hits = dedup_reports(rep, U, B_)
    found = sorted(h["t_global"] for h in hits)
    assert len(found) == len(offsets), (found, offsets)
    assert np.all(np.abs(np.array(found) - np.array(sorted(offsets))) <= 2)

    # serial oracle: the dense per-chunk loop (NodeRuntime's search)
    sync = build_sync(U, B_, CHUNK + 4 * 112)   # overlap = 4 STF (112 @ b=1)
    serial = []
    ov = 4 * 112
    for c in range(n_chunks - 1):
        w = stream[None, :, c * CHUNK:(c + 1) * CHUNK + ov]
        r = sync(jnp.asarray(w))
        if bool(r["detected"][0]) and int(r["t_fine"][0]) < CHUNK:
            serial.append(c * CHUNK + int(r["t_fine"][0]))
    ded = []
    for t in sorted(serial):
        if not ded or t - ded[-1] >= 112:
            ded.append(t)
    assert np.all(np.abs(np.array(found) - np.array(ded)) <= 2), (found, ded)


def test_sharded_sync_no_false_alarms():
    # pure noise occasionally grazes the default 0.25 gate (the serial search
    # fires identically — verified); at 0.35 the false-alarm rate is nil
    from dectnrp_tpu.phy.sync import SyncParams
    n_chunks = 8
    T = n_chunks * CHUNK
    rng = np.random.default_rng(3)
    noise = (rng.standard_normal((1, T)) + 1j * rng.standard_normal((1, T)))
    mesh = Mesh(np.array(jax.devices()[:8]), ("t",))
    f = build_sync_sharded(U, B_, CHUNK, n_chunks, mesh,
                           params=SyncParams(metric_threshold=0.35))
    rep = f(jnp.asarray(noise.astype(np.complex64)))
    assert not dedup_reports(rep, U, B_)


def test_sharded_sync_large_chunk():
    """chunk=8192 (the SCALING_r04 configuration: window redundancy 5.5%,
    ICI halo 0.68% at 8 devices) finds packets across shard boundaries just
    like the default 2048 chunk."""
    import jax
    import jax.numpy as jnp

    from dectnrp_tpu.phy.sync_sharded import build_sync_sharded, dedup_reports
    from jax.sharding import Mesh

    chunk, n_chunks = 8192, 8
    T = chunk * n_chunks
    mesh = Mesh(np.array(jax.devices()[:4]), ("t",))
    f = build_sync_sharded(1, 1, chunk, n_chunks, mesh)
    offs = [chunk + 100, 4 * chunk - 240, 7 * chunk + 500]
    stream = _stream_with_packets(offs, T)
    rep = f(jnp.asarray(stream))
    hits = dedup_reports(rep, 1, 1)
    found = sorted(h["t_global"] for h in hits)
    assert len(found) == len(offs), (found, offs)
    for t, o in zip(found, sorted(offs)):
        assert abs(t - o) <= 2, (found, offs)
