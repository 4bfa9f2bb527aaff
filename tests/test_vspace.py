"""Virtual space: superposition, pathloss, leakage, noise, mesh parity.

Oracle: reference vspace.cpp:195-253 semantics -- each node receives the
pathloss-weighted sum of all other nodes' TX plus leakage and noise; the
mesh-sharded tick must produce the same ether as the single-device one.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dectnrp_tpu.simulation.topology import Position, Trajectory, fspl_db
from dectnrp_tpu.simulation.vspace import (VNodeConfig, VSpace, VSpaceConfig,
                                           noise_var_from_snr_net_bw,
                                           tick_sharded)


def _mk(n_nodes=3, channel="awgn", noise=0.0, leak_db=float("inf"), d=10.0):
    nodes = [VNodeConfig(n_ant=1,
                         trajectory=Trajectory(Position(d * i, 0, 0)),
                         tx_leakage_db=leak_db)
             for i in range(n_nodes)]
    cfg = VSpaceConfig(samp_rate=1_728_000.0, spp_len=256, freq_hz=1.9e9,
                       channel_inter=channel, noise_var=noise)
    return VSpace(cfg, nodes)


def test_superposition_and_pathloss():
    vs = _mk(3)
    tx = np.zeros((3, 1, 256), np.complex64)
    tx[0, 0, :] = 1.0                      # only node 0 transmits
    rx = np.asarray(vs.tick(jnp.asarray(tx)))
    # node 0 hears nothing (no leakage), nodes 1/2 hear pathloss-scaled signal
    assert np.allclose(rx[0], 0.0)
    g01 = 10 ** (-fspl_db(10.0, 1.9e9) / 20)
    g02 = 10 ** (-fspl_db(20.0, 1.9e9) / 20)
    assert np.allclose(np.abs(rx[1]), g01, rtol=1e-4)
    assert np.allclose(np.abs(rx[2]), g02, rtol=1e-4)
    assert vs.now == 256


def test_leakage():
    vs = _mk(2, leak_db=40.0)
    tx = np.zeros((2, 1, 256), np.complex64)
    tx[0, 0, :] = 1.0
    rx = np.asarray(vs.tick(jnp.asarray(tx)))
    assert np.allclose(np.abs(rx[0]), 10 ** (-40 / 20), rtol=1e-4)


def test_noise_variance():
    nv = noise_var_from_snr_net_bw(10.0, 0.875)
    vs = _mk(2, noise=nv)
    tx = np.zeros((2, 1, 256), np.complex64)
    rx = np.asarray(vs.tick(jnp.asarray(tx)))
    meas = np.mean(np.abs(rx) ** 2)
    assert 0.5 * nv < meas < 2.0 * nv


def test_flat_channel_reciprocity():
    vs = _mk(2, channel="flat", d=1.0)
    H = np.asarray(vs._edge_H)
    assert np.allclose(H[0, 1], H[1, 0].T)


def test_doubly_channel_runs():
    vs = _mk(2, channel="doubly_0_363_222", d=1.0)
    rng = np.random.default_rng(0)
    tx = (rng.standard_normal((2, 1, 256)) + 1j * rng.standard_normal((2, 1, 256))
          ).astype(np.complex64)
    rx = np.asarray(vs.tick(jnp.asarray(tx)))
    assert rx.shape == (2, 1, 256)
    assert np.all(np.isfinite(rx))


def test_mesh_tick_matches_dense():
    from jax.sharding import Mesh
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.array(devs[:4]), ("node",))
    N, A, S = 4, 1, 128
    rng = np.random.default_rng(1)
    tx = (rng.standard_normal((N, A, S)) + 1j * rng.standard_normal((N, A, S))
          ).astype(np.complex64)
    gain = rng.random((N, N)).astype(np.float32)
    key = jax.random.PRNGKey(3)
    got = np.asarray(tick_sharded(mesh, jnp.asarray(tx), jnp.asarray(gain),
                                  0.0, key))
    want = np.einsum("ji,jas->ias", gain, tx)
    np.testing.assert_allclose(got, want, atol=1e-4)
