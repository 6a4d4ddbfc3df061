"""Ciphertext / Plaintext containers (JAX pytrees).

Device layout: uint32 arrays in Montgomery form, NTT evaluation domain
(bit-reversed order), shaped [degree+1, level+1, N] for ciphertexts and
[level+1, N] for dense plaintexts.  `level` = number of remaining rescales,
mirroring desilofhe's Ciphertext.level (/root/reference/xor_service.py:274-276).

ScalarPlaintext is a virtual plaintext for slot-constant complex values: its
polynomial has only two nonzero coefficients (X^0, X^(N/2)), so services that
cache hundreds of LUT coefficient plaintexts (CoefficientCache,
/root/reference/xor_service.py:184-196) cost O(1) memory here instead of a
dense [L, N] array each.
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
@dataclass
class Ciphertext:
    data: Any          # uint32 [degree+1, level+1, N], Montgomery, eval domain
    scale: float

    @property
    def level(self) -> int:
        return self.data.shape[1] - 1

    @property
    def degree(self) -> int:
        return self.data.shape[0] - 1

    @property
    def n(self) -> int:
        return self.data.shape[2]

    def tree_flatten(self):
        return (self.data,), (self.scale,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])


@jax.tree_util.register_pytree_node_class
@dataclass
class Plaintext:
    """Dense plaintext: uint32 [level+1, N] Montgomery eval domain."""
    data: Any
    scale: float

    @property
    def level(self) -> int:
        return self.data.shape[0] - 1

    def tree_flatten(self):
        return (self.data,), (self.scale,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux[0])


@dataclass(frozen=True)
class ScalarPlaintext:
    """Slot-constant complex plaintext, stored symbolically (host side)."""
    value: complex
    scale: float
