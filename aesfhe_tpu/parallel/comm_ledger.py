"""Static collective-communication ledger: measured bytes/counts per program.

BASELINE.md's multi-chip scaling claim rested on an analytic model only
(PERF.md "Scaling": ~14 MB per key-switch, ~0.3 ms ICI); this module
MEASURES the collectives of any compiled program by walking its jaxpr —
every `psum` / `all_to_all` / `ppermute` / `all_gather` primitive, with the
operand bytes each moves — so tests can assert the numbers and drift breaks
the build (VERDICT r4 next-step #5).

The jaxpr walk recurses through pjit / shard_map / scan / cond bodies, so a
single `collective_stats(fn, *args)` covers the real dispatch path.  Counts
are per EXECUTION of the traced program (traced once, executed per op);
wire-level bytes depend on the backend's algorithm — for a D-device ring
all-reduce each chip sends ~2*(D-1)/D of the operand bytes, for an
all-to-all each chip sends (D-1)/D of its shard — helpers below convert.

The reference has no distributed path at all (its engine is single-device,
/root/reference/engine_context.py:38), so there is no upstream ledger to
mirror; the contract is internal consistency with PERF.md's model.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.extend.core as _jcore

_PSUM_NAMES = ("psum", "psum_invariant", "psum2")     # jax-version spellings
COLLECTIVES = _PSUM_NAMES + ("all_to_all", "ppermute", "all_gather",
                             "reduce_scatter", "psum_scatter")
_CANON = {n: "psum" for n in _PSUM_NAMES}


@dataclass
class CollectiveStats:
    """counts[prim] = invocations; bytes_in[prim] = summed operand bytes
    (per execution of the traced program)."""
    counts: dict = field(default_factory=dict)
    bytes_in: dict = field(default_factory=dict)

    def add(self, prim: str, nbytes: int):
        self.counts[prim] = self.counts.get(prim, 0) + 1
        self.bytes_in[prim] = self.bytes_in.get(prim, 0) + nbytes

    @property
    def total_bytes(self) -> int:
        return sum(self.bytes_in.values())

    @property
    def total_count(self) -> int:
        return sum(self.counts.values())

    def merge(self, other: "CollectiveStats", times: int = 1):
        for k, v in other.counts.items():
            self.counts[k] = self.counts.get(k, 0) + v * times
        for k, v in other.bytes_in.items():
            self.bytes_in[k] = self.bytes_in.get(k, 0) + v * times
        return self

    def as_dict(self) -> dict:
        return {"counts": dict(self.counts),
                "bytes": dict(self.bytes_in),
                "total_bytes": self.total_bytes}


def _avals_bytes(avals) -> int:
    tot = 0
    for a in avals:
        shape = getattr(a, "shape", None)
        dtype = getattr(a, "dtype", None)
        if shape is None or dtype is None:
            continue
        tot += int(np.prod(shape)) * np.dtype(dtype).itemsize
    return tot


def _walk(jaxpr, stats: CollectiveStats):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in COLLECTIVES:
            stats.add(_CANON.get(name, name),
                      _avals_bytes([v.aval for v in eqn.invars]))
        for v in eqn.params.values():
            _walk_param(v, stats)


def _walk_param(v, stats):
    # nested program bodies hide under many param spellings: pjit's `jaxpr`,
    # shard_map's `jaxpr`, scan/while's `jaxpr`/`cond_jaxpr`/`body_jaxpr`,
    # cond's `branches` tuple
    if isinstance(v, (tuple, list)):
        for x in v:
            _walk_param(x, stats)
        return
    if isinstance(v, _jcore.ClosedJaxpr) or hasattr(v, "jaxpr"):
        _walk(v.jaxpr, stats)
    elif isinstance(v, _jcore.Jaxpr) or hasattr(v, "eqns"):
        _walk(v, stats)


def collective_stats(fn, *args, **kwargs) -> CollectiveStats:
    """Trace fn(*args) abstractly (no FLOPs, no devices needed beyond the
    mesh already captured in fn) and return its collective ledger."""
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    stats = CollectiveStats()
    _walk(closed.jaxpr, stats)
    return stats


# -- wire-level conversions (per chip, standard ring algorithms) -------------

def allreduce_wire_bytes(operand_bytes: int, d: int) -> float:
    """Ring all-reduce: each chip sends 2*(D-1)/D of the operand."""
    return operand_bytes * 2 * (d - 1) / d


def alltoall_wire_bytes(global_bytes: int, d: int) -> float:
    """All-to-all over a D-sharded global array: each chip sends (D-1)/D of
    its 1/D shard; `global_bytes` is the UNsharded logical array."""
    return global_bytes / d * (d - 1) / d
