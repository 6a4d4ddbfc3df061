"""Checkpoint / resume: serialize keys and ciphertexts to disk.

The reference never persists anything -- keys are regenerated every run and
ciphertexts never leave memory (/root/reference/engine_context.py:62-73;
SURVEY.md section 5 "Checkpoint/resume: none").  Here the RNS limb arrays
and scale/level metadata round-trip through .npz files so a multi-round
evaluation can resume per round and keygen cost is paid once.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import numpy as np
import jax.numpy as jnp

from ..core.ciphertext import Ciphertext, Plaintext
from ..core.keys import SecretKey, PublicKey, SwitchKey, GaloisKeySet


def save_ciphertext(path: Path, ct: Ciphertext):
    np.savez_compressed(path, data=np.asarray(ct.data), scale=ct.scale,
                        kind="ciphertext")


def load_ciphertext(path: Path) -> Ciphertext:
    z = np.load(path)
    return Ciphertext(jnp.asarray(z["data"]), float(z["scale"]))


def save_keys(path: Path, *, secret: SecretKey | None = None,
              public: PublicKey | None = None,
              relin: SwitchKey | None = None,
              conj: SwitchKey | None = None,
              rotation: GaloisKeySet | None = None):
    """Persist any subset of the key family into one .npz."""
    arrays: dict[str, np.ndarray] = {}
    meta: dict[str, Any] = {"galois_elts": []}
    if secret is not None:
        arrays["secret_s_eval"] = np.asarray(secret.s_eval)
        arrays["secret_s_coeff"] = secret.s_coeff
    if public is not None:
        arrays["public_b"] = np.asarray(public.b)
        arrays["public_a"] = np.asarray(public.a)
    if relin is not None:
        arrays["relin_b"] = np.asarray(relin.b)
        arrays["relin_a"] = np.asarray(relin.a)
    if conj is not None:
        arrays["conj_b"] = np.asarray(conj.b)
        arrays["conj_a"] = np.asarray(conj.a)
    if rotation is not None:
        meta["caps"] = {}
        for g, k in rotation.keys.items():
            arrays[f"rot_{g}_b"] = np.asarray(k.b)
            arrays[f"rot_{g}_a"] = np.asarray(k.a)
            meta["galois_elts"].append(g)
            if k.cap is not None:
                meta["caps"][str(g)] = int(k.cap)
    arrays["_meta"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def params_fingerprint(params) -> str:
    """Stable fingerprint of everything keygen depends on: the ring, the
    full prime basis, and the digit-group structure."""
    import hashlib
    h = hashlib.sha256()
    h.update(repr((params.n, params.max_level, params.scale_bits,
                   params.secret_hamming, params.alpha,
                   params.all_primes)).encode())
    return h.hexdigest()[:16]


def cached_key_family(engine, cache_dir, rotation_steps=None) -> dict:
    """Load the (secret, public, relin, conj, rotation) key family for
    `engine` from `cache_dir`, generating and persisting it on first use.

    Keys are fingerprinted by the full parameter set (and the explicit
    rotation-step set, when given), so a params change transparently
    regenerates.  This is an explicit opt-in (the secret key touches disk):
    production callers keep the reference's regenerate-every-run behavior
    (/root/reference/engine_context.py:62-73) unless AESFHE_KEY_CACHE is set.

    `rotation_steps` mirrors EngineContext: None -> the power-of-two ladder;
    a sequence -> only those fixed steps (possibly none).

    Families whose switch keys exceed ~AESFHE_KEY_CACHE_MAX_MB (default
    1024) are generated but NOT persisted: at full-ring production sizes
    the arrays are multi-GB of incompressible uniform randomness, and
    device keygen (native host NTT kernels) beats the disk round-trip.
    """
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    fp = params_fingerprint(engine.params)
    if rotation_steps is not None:
        import hashlib
        h = hashlib.sha256((fp + repr(sorted(set(
            int(s) for s in rotation_steps)))).encode())
        fp = h.hexdigest()[:16]
    path = cache_dir / f"keys_{fp}.npz"
    if path.exists():
        try:
            k = load_keys(path)
            need = {"secret", "public", "relin", "conj"}
            # 'rotation' may be absent only when the caller explicitly asked
            # for a fixed (possibly empty) step set; a rotation_steps=None
            # caller expects the power-of-two ladder, so a cache file missing
            # it (partial/hand-pruned write) must regenerate instead of
            # silently returning an empty GaloisKeySet that fails at rotate
            # time (ADVICE r3)
            if rotation_steps is None:
                need = need | {"rotation"}
            if need <= set(k):
                k.setdefault("rotation", GaloisKeySet(keys={}))
                return k
        except Exception:
            path.unlink(missing_ok=True)
    sk = engine.create_secret_key()
    if rotation_steps is None:
        rot = engine.create_rotation_key(sk)
    elif rotation_steps:
        rot = engine.create_fixed_rotation_key(sk, list(rotation_steps))
    else:
        rot = GaloisKeySet(keys={})
    out = dict(secret=sk,
               public=engine.create_public_key(sk),
               relin=engine.create_relinearization_key(sk),
               conj=engine.create_conjugation_key(sk),
               rotation=rot)
    p = engine.params
    switch_mb = (2 + len(rot.keys)) * 2 * p.dnum * p.L_tot * p.n * 4 / 2**20
    cap_mb = float(__import__("os").environ.get(
        "AESFHE_KEY_CACHE_MAX_MB", "1024"))
    if switch_mb > cap_mb:
        return out
    tmp = path.with_suffix(".tmp.npz")
    save_keys(tmp, secret=out["secret"], public=out["public"],
              relin=out["relin"], conj=out["conj"],
              rotation=out["rotation"])
    tmp.replace(path)
    return out


def load_keys(path: Path) -> dict:
    z = np.load(path)
    meta = json.loads(bytes(z["_meta"]).decode()) if "_meta" in z else {}
    out: dict[str, Any] = {}
    if "secret_s_eval" in z:
        out["secret"] = SecretKey(jnp.asarray(z["secret_s_eval"]),
                                  z["secret_s_coeff"])
    if "public_b" in z:
        out["public"] = PublicKey(jnp.asarray(z["public_b"]),
                                  jnp.asarray(z["public_a"]))
    if "relin_b" in z:
        out["relin"] = SwitchKey(jnp.asarray(z["relin_b"]),
                                 jnp.asarray(z["relin_a"]))
    if "conj_b" in z:
        out["conj"] = SwitchKey(jnp.asarray(z["conj_b"]),
                                jnp.asarray(z["conj_a"]))
    elts = meta.get("galois_elts", [])
    if elts:
        caps = meta.get("caps", {})
        out["rotation"] = GaloisKeySet(keys={
            g: SwitchKey(jnp.asarray(z[f"rot_{g}_b"]),
                         jnp.asarray(z[f"rot_{g}_a"]),
                         cap=caps.get(str(g))) for g in elts})
    return out


def cached_bootstrap_key(engine, sk, cache_dir, *, small: bool = False,
                         factored: bool | None = None,
                         hi_prec: bool | None = None):
    """create_bootstrap_key with its Galois key set cached on disk.

    The plans/flavor config are cheap host numpy; the cost is
    gen_rotation_keys over the factored plans' step set (~40 switch keys of
    per-level NTT work), which this round-trips through save_keys/load_keys.
    The fingerprint binds the cache entry to the full parameter set, the
    flavor knobs, AND the secret key's coefficient vector -- a rotation key
    for a different secret would decrypt to garbage, not fail loudly.
    Size-capped like cached_key_family (AESFHE_KEY_CACHE_MAX_MB): full-ring
    production sets are multi-GB of incompressible randomness where device
    keygen beats the disk round-trip."""
    import hashlib
    import os
    from .. import bootstrap as bs
    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    h = hashlib.sha256((params_fingerprint(engine.params) +
                        f"|boot|{small}|{factored}|{hi_prec}").encode())
    h.update(np.ascontiguousarray(sk.s_coeff).tobytes())
    path = cache_dir / f"bootrot_{h.hexdigest()[:16]}.npz"
    rot = None
    if path.exists():
        try:
            rot = load_keys(path).get("rotation")
        except Exception:
            path.unlink(missing_ok=True)
    had_cache = rot is not None
    bk = bs.create_bootstrap_key(engine, sk, small=small, factored=factored,
                                 rot=rot, hi_prec=hi_prec)
    if not had_cache and bk.rot is not None and bk.rot.keys:
        cap_mb = float(os.environ.get("AESFHE_KEY_CACHE_MAX_MB", "1024"))
        if bs.rotation_keys_mb(bk.rot) <= cap_mb:
            tmp = path.with_suffix(".tmp.npz")
            save_keys(tmp, rotation=bk.rot)
            tmp.replace(path)
    return bk
