"""Device-mesh configuration and sharding layouts.

The reference has no distribution story at all (single device_id, CPU
threads inside desilofhe; SURVEY.md section 2.3).  The TPU-native
parallelism axes for CKKS are:

  data  -- slot-batch data parallelism: independent ciphertexts (batches of
           AES blocks) across chips; embarrassingly parallel.
  limb  -- RNS-limb parallelism (the tensor-parallel analogue): the L axis
           of [k, L, N] ciphertext arrays sharded across chips.  Pointwise
           ops and per-limb NTTs stay local; key-switch basis extension and
           rescale lifts induce cross-limb collectives, which GSPMD inserts
           from the sharding constraints (all ops in core/ops_impl are
           plain-XLA and therefore partitionable).

Use jax.sharding.Mesh + NamedSharding; no manual collectives needed for
correctness, shard_map kernels come in for the tuned paths.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, limb: int = 1,
              devices: Sequence | None = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = data * limb
    assert len(devices) >= need, f"need {need} devices, have {len(devices)}"
    arr = np.asarray(devices[:need]).reshape(data, limb)
    return Mesh(arr, axis_names=("data", "limb"))


def ct_sharding(mesh: Mesh, batched: bool = True) -> NamedSharding:
    """Sharding for ciphertext arrays.

    batched: [B, k, L, N] -- batch over 'data', limbs over 'limb'.
    unbatched: [k, L, N]  -- limbs over 'limb' only.
    """
    if batched:
        return NamedSharding(mesh, P("data", None, "limb", None))
    return NamedSharding(mesh, P(None, "limb", None))


def key_sharding(mesh: Mesh) -> NamedSharding:
    """Switch keys [dnum, L_tot, N]: replicate over 'data', shard limbs."""
    return NamedSharding(mesh, P(None, "limb", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
