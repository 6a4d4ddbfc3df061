"""Test configuration: force CPU with an 8-device virtual mesh so sharding
tests exercise multi-chip layouts without TPU hardware (the driver separately
dry-runs the multi-chip path; see __graft_entry__.dryrun_multichip)."""
import os
import sys

# Force CPU: the container may pin JAX_PLATFORMS=axon (TPU tunnel) via a
# sitecustomize hook that overrides the env var at interpreter start, so the
# jax config itself must be updated (before any backend initialization).
os.environ["JAX_PLATFORMS"] = os.environ.get("AESFHE_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms",
                  os.environ.get("AESFHE_TEST_PLATFORM", "cpu"))
# persistent compile cache: the op set is stable across runs, so reruns skip
# XLA compilation (the dominant cost of a cold suite on the 2-CPU host)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("AESFHE_JAX_CACHE", "/root/.cache/jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest

from aesfhe_tpu.core import keys as keys_mod
from aesfhe_tpu.core.params import get_params
from aesfhe_tpu.core.engine import Engine


# key cache: keygen is the dominant fixed cost of a warm suite run (compiles
# are covered by the persistent jax cache above). Opt-in via env so a clean
# run is still possible with AESFHE_KEY_CACHE="".
os.environ.setdefault("AESFHE_KEY_CACHE", "/root/.cache/aesfhe_keys")


@pytest.fixture(scope="session", autouse=True)
def _seed():
    keys_mod.seed_keygen(0)


def _engine_fixture(profile: str) -> dict:
    """One keygen per test session per profile (mirrors the reference's
    module-scoped engine fixtures, /root/reference/test/test_xor_service.py:
    15-28), load-or-generate through the on-disk key cache."""
    eng = Engine(get_params(profile))
    cache_dir = os.environ.get("AESFHE_KEY_CACHE")
    if cache_dir:
        from aesfhe_tpu.utils.serialization import cached_key_family
        fam = cached_key_family(eng, cache_dir)
        return dict(eng=eng, sk=fam["secret"], pk=fam["public"],
                    rlk=fam["relin"], conj=fam["conj"], rot=fam["rotation"])
    sk = eng.create_secret_key()
    return dict(eng=eng, sk=sk, pk=eng.create_public_key(sk),
                rlk=eng.create_relinearization_key(sk),
                conj=eng.create_conjugation_key(sk),
                rot=eng.create_rotation_key(sk))


@pytest.fixture(scope="session")
def tiny_engine():
    """Small-ring engine."""
    return _engine_fixture("tiny")


@pytest.fixture(scope="session")
def deep_engine():
    """Long-chain insecure ring for the deep AES-round circuits."""
    return _engine_fixture("deep")


@pytest.fixture(scope="session")
def hp_engine():
    """High-precision (2^52 scale) ring for byte-domain deg-255 LUT circuits."""
    return _engine_fixture("hp")


@pytest.fixture(scope="session")
def test_engine():
    """Mid-size engine (N=2^12, 16 levels) for deep circuits (S-box etc.)."""
    return _engine_fixture("test")
