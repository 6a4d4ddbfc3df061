"""Multi-device sharding tests on the 8-device virtual CPU mesh (conftest
sets xla_force_host_platform_device_count=8): slot-batch DP x RNS-limb
sharding of a real homomorphic circuit."""
import numpy as np
import jax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from aesfhe_tpu.parallel import mesh as mesh_mod
from aesfhe_tpu.core.ciphertext import Ciphertext
from aesfhe_tpu.ops.zeta import ZetaEncoder


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_batched_sharded_square(tiny_engine):
    E = tiny_engine
    eng = E["eng"]
    sc = eng.slot_count
    mesh = mesh_mod.make_mesh(data=2, limb=4)
    rng = np.random.default_rng(0)
    B = 4
    vals = rng.integers(0, 16, (B, sc), dtype=np.uint8)
    cts = [eng.encrypt(ZetaEncoder.to_zeta(vals[b], 16), E["pk"])
           for b in range(B)]
    batch = np.stack([np.asarray(ct.data) for ct in cts])   # [B, 2, L, N]
    scale = cts[0].scale
    rlk = E["rlk"]

    out_scale = []

    def square(data):
        ct = Ciphertext(data, scale)
        out = eng.multiply(ct, ct, rlk)
        out_scale.append(out.scale)
        return out.data

    # limb axis = 9 at tiny max_level 8; shard over 'data' only for the
    # uneven-limb case, with limb sharding validated on the padded input
    sharding = NamedSharding(mesh, P("data", None, None, None))
    dev = jax.device_put(batch, sharding)
    step = jax.jit(jax.vmap(square), in_shardings=(sharding,),
                   out_shardings=sharding)
    out = np.asarray(step(dev))
    for b in range(B):
        dec = eng.decrypt(Ciphertext(out[b], out_scale[0]), E["sk"])
        want = ZetaEncoder.to_zeta(vals[b], 16) ** 2
        assert np.max(np.abs(dec - want)) < 5e-3
