"""MeshEngine: the full CKKS Engine API executed over a device mesh.

The reference's engine is pinned to one device
(/root/reference/engine_context.py:38: a single `device_id`); this class is
the TPU-native answer (SURVEY.md section 2.3, section 7 step 7): an Engine
subclass whose key-switch-bearing primitives — relinearize (hence every
ct x ct multiply and inner_product), rotate, conjugate, and the hoisted
rotation batches — run DIGIT-SHARDED over a jax.sharding.Mesh through
parallel.dist_keyswitch.DistKeySwitch:

  - each chip persistently holds 1/D of every switch key (keys are the
    largest buffers in CKKS; DistKeySwitch.key_shards places them once with
    NamedSharding over the mesh axis),
  - each chip basis-extends + NTTs + key-multiplies only its own digits,
  - one jax.lax.psum over ICI reduces the partial products (exact: uint32
    modular arithmetic splits into two sub-2^31 halves for the reduction).

Everything else (pointwise ct arithmetic, rescale, encode) is plain XLA and
replicates/shards under GSPMD as usual.  Because the modular adds are exact,
every MeshEngine result is BIT-IDENTICAL to the single-device Engine — the
contract tests/test_parallel.py asserts at two levels, and that
__graft_entry__.dryrun_multichip asserts for a full bit-sliced AES round.

Usage:
    mesh = Mesh(np.asarray(jax.devices())[:8], ("limb",))
    eng = MeshEngine(params, mesh=mesh)            # drop-in Engine
    ctx = EngineContext(params=params, mesh=mesh)  # or via the context
"""
from __future__ import annotations

from jax.sharding import Mesh

from ..core.engine import Engine
from ..core.keys import SwitchKey
from ..core.params import CKKSParams
from .dist_keyswitch import DistKeySwitch


class MeshEngine(Engine):
    """Engine whose key-switches are digit-parallel collectives over `mesh`.

    `axis` names the mesh axis the key-switch digit dimension shards over
    (default "limb", matching parallel.mesh.make_mesh).  All four routing
    hooks of the base Engine (core/engine.py "key-switch routing hooks")
    are overridden, so the entire public API — multiply/relinearize/rotate/
    conjugate/hoisted_rotations/make_power_basis/inner_product/bootstrap —
    transparently distributes with no circuit changes.
    """

    def __init__(self, params: CKKSParams | None = None, *, mesh: Mesh,
                 axis: str = "limb", **kw):
        super().__init__(params, **kw)
        self.mesh = mesh
        self.axis = axis
        self.dks = DistKeySwitch(self.params, self.tabs, mesh, axis=axis)

    # -- key-switch routing hooks (collective overrides) -----------------
    def _relin_data(self, data, key: SwitchKey):
        return self.dks.relin(data, key)

    def _galois_data(self, data, g: int, key: SwitchKey):
        return self.dks.galois(data, self._perm_dev(g), key)

    def _hoist_decompose(self, c1):
        return self.dks.decompose(c1)

    def _hoist_apply(self, data, d_eval, g: int, key: SwitchKey):
        return self.dks.hoisted_apply(data, d_eval, self._perm_dev(g), key)
