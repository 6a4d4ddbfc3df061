"""CKKS bootstrapping: ModRaise -> CoeffToSlot -> EvalMod -> SlotToCoeff.

Replaces desilofhe's engine.bootstrap (/root/reference/xor_service.py:120-129,
engine_context.py:70-73).  Implementation lands in stages; until EvalMod is in
place, `bootstrap` raises so callers can plan level budgets explicitly.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any


@dataclass
class BootstrapKey:
    small: bool
    galois: Any = None     # rotation keys for the linear transforms
    payload: Any = None


def create_bootstrap_key(engine, sk, small: bool = False) -> BootstrapKey:
    # Placeholder key object; the linear-transform rotation keys are created
    # lazily when bootstrap() is first implemented/used.
    return BootstrapKey(small=small)


def bootstrap(engine, ct, relin_key, conj_key, bootstrap_key):
    raise NotImplementedError(
        "CKKS bootstrap is not yet wired up in this build; "
        "plan circuits within max_level or raise max_level")
