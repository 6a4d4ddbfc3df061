"""Batched (vmapped) homomorphic evaluation over a device mesh.

Slot-batch data parallelism: a stack of independent ciphertexts evaluated by
one vmapped circuit, with the batch axis sharded over the mesh 'data' axis
and the RNS-limb axis sharded over 'limb'.  Because every engine primitive
is pure XLA over [k, L, N] arrays (core/ops_impl), jax.vmap composes the
whole service-level circuit and GSPMD partitions it; this is the TPU
replacement for the reference's "run more processes" non-answer
(SURVEY.md section 2.3).
"""
from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh

from ..core.ciphertext import Ciphertext
from . import mesh as mesh_mod


def vmap_circuit(circuit: Callable, scale: float):
    """Lift a Ciphertext->Ciphertext circuit to batched data arrays.

    circuit: function (Ciphertext, ...) -> Ciphertext built from engine ops.
    Returns fn(batch_data [B, k, L, N], *consts) -> [B, k', L', N].
    """
    def one(data, *consts):
        out = circuit(Ciphertext(data, scale), *consts)
        return out.data

    return jax.vmap(one)


def jit_sharded_circuit(circuit: Callable, scale: float, mesh: Mesh):
    """vmap + jit with batch/limb shardings over the mesh."""
    fn = vmap_circuit(circuit, scale)
    sharding = mesh_mod.ct_sharding(mesh, batched=True)
    return jax.jit(fn, in_shardings=(sharding,),
                   out_shardings=sharding), sharding
