"""Multi-host (DCN) execution: jax.distributed-initialized global meshes.

The reference has no distributed communication backend at all — its engine
is pinned to one device (/root/reference/engine_context.py:38) and its only
concurrency is desilofhe's in-process thread pool
(/root/reference/xor_service.py:25-26).  This module is the TPU-native
answer (SURVEY.md §5 "distributed communication backend"): each host
process calls :func:`init_multihost`, after which ``jax.devices()`` spans
every process and one logical `Mesh` covers the whole slice/pod — XLA then
rides ICI for collectives within a slice and DCN across hosts, with no
NCCL/MPI-style code here.

The same code path is testable without a pod: two CPU processes with
4 virtual devices each form a 2-host x 4-device logical mesh
(tests/test_multihost.py drives scripts/run_multihost.py exactly that way,
executing the sharded 4-step NTT of parallel.dist_ntt bit-exactly across
the process boundary).
"""
from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Join (or create) the jax.distributed cluster.

    Arguments default to the AESFHE_COORDINATOR / AESFHE_NUM_PROCESSES /
    AESFHE_PROCESS_ID environment variables so a launcher (mpirun, SLURM,
    GKE, or the plain-subprocess test harness) can configure processes
    uniformly.  On managed TPU pods all three may be None: jax.distributed
    auto-detects the topology from the TPU runtime metadata.
    """
    coordinator = coordinator or os.environ.get("AESFHE_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("AESFHE_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("AESFHE_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis: str = "limb", ndev: int | None = None) -> Mesh:
    """One-axis mesh over ALL global devices (every process's chips)."""
    devs = np.asarray(jax.devices()[: ndev or len(jax.devices())])
    return Mesh(devs, (axis,))


def replicated_global(mesh: Mesh, host_value: np.ndarray):
    """Lift a host array (identical on every process) to a global
    replicated jax.Array without any data motion beyond the local copy."""
    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_callback(host_value.shape, sharding,
                                        lambda idx: host_value[idx])


def sharded_global(mesh: Mesh, spec: P, host_value: np.ndarray):
    """Lift a host array (every process holds the FULL logical value) to a
    global array sharded by `spec`; each process copies only the shards its
    local devices own."""
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(host_value.shape, sharding,
                                        lambda idx: host_value[idx])


def fetch_global(x) -> np.ndarray:
    """Gather a (possibly non-fully-addressable) global array onto every
    process as a host numpy array."""
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def multihost_ntt_check(profile: str = "tiny", axis: str = "limb",
                        seed: int = 3) -> dict:
    """Run the sharded 4-step NTT (dist_ntt) over the CURRENT global mesh
    (all processes) and verify fwd against the single-device transform and
    inv(fwd(x)) == x, all bit-exact.  Returns a summary dict; raises on
    mismatch.  Callable only after init_multihost() on every process.
    """
    import jax.numpy as jnp
    from ..core.params import get_params
    from ..core import ops_impl
    from .dist_ntt import DistNTT

    params = get_params(profile)
    mesh = global_mesh(axis)
    d = DistNTT(params, mesh, axis=axis)

    nrows = params.num_q
    rng = np.random.default_rng(seed)
    x = np.stack([rng.integers(0, int(q), params.n, dtype=np.uint32)
                  for q in params.q_primes[:nrows]])

    # single-device reference on the first LOCAL device (identical on every
    # process because the input is seed-replicated)
    tabs = ops_impl.DeviceTables.build(params)
    tr = ops_impl._tabs_rows(tabs, np.arange(nrows, dtype=np.int32))
    with jax.default_device(jax.local_devices()[0]):
        want = np.asarray(ops_impl.ntt_rows(jnp.asarray(x), tr))

    # explicit global arrays for input AND twiddle tables: in multi-process
    # mode every jit input that spans processes must be a global jax.Array
    xg = sharded_global(mesh, P(None, None, axis), np.asarray(d.pack(x)))
    tw = sharded_global(mesh, P(None, None, axis), d.mx["t_w"])
    tsh = sharded_global(mesh, P(None, None, axis), d.mx["t_sh"])
    tiw = sharded_global(mesh, P(None, axis, None), d.mx["ti_w"])
    tish = sharded_global(mesh, P(None, axis, None), d.mx["ti_sh"])
    yg = d._fwd(xg, tw, tsh)
    got = fetch_global(yg).reshape(nrows, params.n)
    if not np.array_equal(got, want):
        raise AssertionError("multihost sharded NTT fwd mismatch")
    back = fetch_global(d._inv(yg, tiw, tish)).reshape(x.shape)
    if not np.array_equal(back, x):
        raise AssertionError("multihost sharded NTT roundtrip mismatch")
    return {
        "processes": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": len(jax.devices()),
        "n": params.n,
        "limbs": int(nrows),
        "fwd_exact": True,
        "roundtrip_exact": True,
    }
