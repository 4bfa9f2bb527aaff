"""Simulated hardware effects: clipping, quantization, noise figures.

Parity: reference lib/src/simulation/hardware/{clip,quantize}.cpp and
hw_simulator clip_and_quantize (radio/hw_simulator.hpp:80-92).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def clip(iq: jax.Array, limit: float = 1.0) -> jax.Array:
    """Clip I and Q independently to [-limit, limit] (ADC/DAC rails)."""
    return (jnp.clip(jnp.real(iq), -limit, limit)
            + 1j * jnp.clip(jnp.imag(iq), -limit, limit)).astype(iq.dtype)


def quantize(iq: jax.Array, n_bits: int, limit: float = 1.0) -> jax.Array:
    """Uniform mid-rise quantization of I/Q to n_bits over [-limit, limit]."""
    step = 2.0 * limit / (2 ** n_bits)
    q = lambda x: (jnp.floor(x / step) + 0.5) * step
    return (q(jnp.real(iq)) + 1j * q(jnp.imag(iq))).astype(iq.dtype)


def clip_and_quantize(iq: jax.Array, n_bits: int = 12,
                      limit: float = 1.0) -> jax.Array:
    return quantize(clip(iq, limit), n_bits, limit)
