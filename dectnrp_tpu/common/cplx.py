"""Complex-free device boundaries for the tunneled TPU backend.

The TPU backend used here rejects complex64 crossing the host<->device
boundary in either direction (UNIMPLEMENTED on transfer/execution), while
complex arithmetic *inside* a jitted program is fine.  `cwrap(fn)` makes any
jit-able function with complex leaves in its arguments or results safe to
call from the host:

  host in :  complex ndarray  -> CF(stacked float32 [2, ...])   (real, imag)
  device   :  CF -> complex64 -> fn -> complex -> CF
  host out:  CF -> numpy complex64 (other leaves stay device arrays)

The reference has no such issue (everything is host memory); this is the
TPU-native replacement for passing cf32 pointers around (e.g. reference
radio/buffer_rx.hpp get_ant_streams): IQ crosses the PCIe/ICI boundary as
two float32 planes, exactly like phy/ops/polyphase.py's
split_complex_rows/merge_complex_rows does inside its kernels.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import tree_util


@tree_util.register_pytree_node_class
@dataclasses.dataclass
class CF:
    """A complex leaf in transit: stacked float32 [2, ...] = (real, imag)."""
    ri: object

    def tree_flatten(self):
        return (self.ri,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


def _is_cf(x) -> bool:
    return isinstance(x, CF)


def _iscomplex(x) -> bool:
    dt = getattr(x, "dtype", None)
    return dt is not None and np.issubdtype(dt, np.complexfloating)


def encode_host(tree):
    """Host side: complex leaves -> CF(float32 [2, ...]); rest untouched."""
    def f(x):
        if _is_cf(x):
            return x
        if _iscomplex(x):
            x = np.asarray(x)
            return CF(np.stack([x.real, x.imag]).astype(np.float32))
        return x
    return tree_util.tree_map(f, tree, is_leaf=_is_cf)


def decode_host(tree):
    """Host side: CF leaves -> numpy complex64; rest untouched."""
    def f(x):
        if _is_cf(x):
            ri = np.asarray(x.ri)
            return (ri[0] + 1j * ri[1]).astype(np.complex64)
        return x
    return tree_util.tree_map(f, tree, is_leaf=_is_cf)


def decode_device(tree):
    """Inside jit: CF leaves -> complex64 arrays."""
    def f(x):
        if _is_cf(x):
            return (x.ri[0] + 1j * x.ri[1]).astype(jnp.complex64)
        return x
    return tree_util.tree_map(f, tree, is_leaf=_is_cf)


def encode_device(tree):
    """Inside jit: complex leaves -> CF(stacked float32)."""
    def f(x):
        if _iscomplex(x):
            return CF(jnp.stack([jnp.real(x), jnp.imag(x)]).astype(jnp.float32))
        return x
    return tree_util.tree_map(f, tree)


def cwrap(fn, static_argnums=()):
    """Wrap jit-able `fn` so complex64 never crosses the device boundary.

    Returns a callable with fn's signature: complex array arguments may be
    numpy or device arrays; complex results come back as numpy complex64.
    Non-complex results stay (lazy) device arrays.  `fn` itself may already
    be jitted (nested jit inlines under trace).
    """
    static_argnums = tuple(static_argnums)

    @partial(jax.jit, static_argnums=(0,))
    def inner(statics, args, kwargs):
        args = list(decode_device(args))
        for i, v in zip(static_argnums, statics):
            args.insert(i, v)
        out = fn(*args, **decode_device(kwargs))
        return encode_device(out)

    def call(*args, **kwargs):
        statics = tuple(args[i] for i in static_argnums)
        dyn = [a for i, a in enumerate(args) if i not in static_argnums]
        out = inner(statics, encode_host(tuple(dyn)), encode_host(kwargs))
        return decode_host(out)

    return call


_CW_CACHE: dict[int, tuple] = {}


def cwrap_cached(fn, static_argnums=()):
    """Memoized cwrap keyed on id(fn) (holds fn to keep the id alive).

    Use for functions that are themselves cached (lru_cache builders) so the
    wrapper's jit is traced once per underlying function.
    """
    hit = _CW_CACHE.get(id(fn))
    if hit is None or hit[0] is not fn or hit[2] != tuple(static_argnums):
        hit = (fn, cwrap(fn, static_argnums), tuple(static_argnums))
        _CW_CACHE[id(fn)] = hit
    return hit[1]


def to_device_floats(x: np.ndarray) -> jax.Array:
    """Host complex [..., T] -> device float32 [2, ..., T] (explicit put)."""
    x = np.asarray(x)
    return jnp.asarray(np.stack([x.real, x.imag]).astype(np.float32))


def from_device_floats(ri: jax.Array) -> np.ndarray:
    """Device float32 [2, ..., T] -> host complex64 [..., T]."""
    ri = np.asarray(ri)
    return (ri[0] + 1j * ri[1]).astype(np.complex64)
