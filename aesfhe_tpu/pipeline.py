"""Full homomorphic AES-128: key expansion + 10 rounds over SIMD-packed
blocks, end to end in the nibble-pair domain.

This is the component the reference never finished: its round driver does
AddRoundKey only (/root/reference/new.py:186-227), its MixColumns is
incomplete (new.py:150-184) and its key schedule is an empty file.  Here one
logical evaluation packs slot_count/16 AES blocks (2048 at N=2^16, matching
the reference's "2K AES blocks per ciphertext" claim, /root/reference/
README.md:29) laid out column-major per 16-slot block.

Round structure (FIPS-197): ARK(rk0); 9 x [SubBytes, ShiftRows+MixColumns,
ARK]; final [SubBytes, ShiftRows, ARK].  Everything stays on (zeta16^hi,
zeta16^lo) nibble pairs: SubBytes and the GF multipliers are 16x16 2D LUT
pairs, XOR-with-plaintext-key costs only plaintext multiplies, and ShiftRows
is a pure slot permutation applied to both nibbles.

Level budget: one middle round is ~30 multiplicative levels, so multi-round
evaluation calls `refresh` between rounds -- CKKS bootstrap once
aesfhe_tpu.bootstrap lands, or (interim) a decrypt-free level reset is NOT
possible; `max_rounds_without_bootstrap` reports what fits the chain.
"""
from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

from .core.ciphertext import Ciphertext
from .keyexp import expand_key_128
from .ops.xor_service import XORService, EngineWrapper, CoefficientCache
from .ops.mixcolumns_service import AESFHETransformer, NibblePair
from .ops.shiftrows_service import AESFHEShiftRows
from .ops.zeta import ZetaEncoder, split_nibbles
from .utils.aes_utils import pkcs7_pad, pkcs7_unpad, chunk_bytes
from .coeffs import generate as coeffgen

COEFF_DIR = coeffgen.COEFF_DIR


class AESFHE128:
    def __init__(self, eng_wrap: EngineWrapper, xor_svc: XORService,
                 transformer: AESFHETransformer,
                 shiftrows: AESFHEShiftRows,
                 key: bytes | np.ndarray,
                 refresh: Optional[Callable[[Ciphertext], Ciphertext]] = None):
        self.eng = eng_wrap
        self.xor = xor_svc
        self.tf = transformer
        self.sr = shiftrows
        self.round_keys = expand_key_128(key)           # [11, 16]
        self.refresh = refresh
        # post-refresh cleanse count: boot_tiny's measured ladder needs 4
        # (error 0.034 entering at the m*e^2 convergence boundary); prod-
        # shaped hi_prec chains refresh at ~1e-3 and need only 2 -- see
        # DESIGN_NOTES "zeta-at-production depth wall"
        self.post_boot_cleanses = self.POST_BOOT_CLEANSES
        # segment-refresh scheduling: bootstrap INSIDE the round between
        # LUT stages instead of once per round segment.  Required on
        # production-shaped chains whose post-refresh budget (~19 levels at
        # prod_boot) cannot hold a 14-23 level round segment; each LUT
        # stage (<= 7 levels) then runs right after a refresh+cleanse.
        self.segment_refresh = False
        self._sbox2d = (
            CoefficientCache(COEFF_DIR / "sbox_hi2d_coeffs.json"),
            CoefficientCache(COEFF_DIR / "sbox_lo2d_coeffs.json"))
        self._inv_sbox2d = (
            CoefficientCache(COEFF_DIR / "inv_sbox_hi2d_coeffs.json"),
            CoefficientCache(COEFF_DIR / "inv_sbox_lo2d_coeffs.json"))

    # ------------------------------------------------------------------
    @property
    def blocks_per_ct(self) -> int:
        return self.eng.engine.slot_count // 16

    def pack_blocks(self, data: bytes) -> np.ndarray:
        """PKCS#7-pad, chunk into 16-byte blocks, lay out column-major per
        block, tile across slots."""
        padded = pkcs7_pad(bytes(data))
        blocks = chunk_bytes(padded)
        sc = self.eng.engine.slot_count
        assert len(blocks) <= self.blocks_per_ct, "too many blocks for one ct"
        flat = np.zeros(sc, dtype=np.uint8)
        for b, blk in enumerate(blocks):
            arr = np.frombuffer(blk, dtype=np.uint8)
            flat[16 * b:16 * b + 16] = arr    # column-major == byte order
        return flat, len(blocks)

    def encrypt_state(self, state_bytes: np.ndarray) -> NibblePair:
        hi, lo = split_nibbles(np.asarray(state_bytes, dtype=np.uint8))
        return NibblePair(self.eng.encrypt(ZetaEncoder.to_zeta(hi, 16)),
                          self.eng.encrypt(ZetaEncoder.to_zeta(lo, 16)))

    def decrypt_state(self, pair: NibblePair) -> np.ndarray:
        hi = ZetaEncoder.from_zeta(self.eng.decrypt(pair.hi), 16)
        lo = ZetaEncoder.from_zeta(self.eng.decrypt(pair.lo), 16)
        return ((hi.astype(np.uint8) << 4) | lo.astype(np.uint8))

    # ------------------------------------------------------------------
    def _tile_key(self, rk: np.ndarray) -> np.ndarray:
        sc = self.eng.engine.slot_count
        reps = sc // 16
        return np.tile(rk, reps)

    def add_round_key(self, pair: NibblePair, round_idx: int) -> NibblePair:
        rk = self._tile_key(self.round_keys[round_idx])
        k_hi, k_lo = split_nibbles(rk)
        return NibblePair(self.xor._xor_with_plain_nibbles(pair.hi, k_hi),
                          self.xor._xor_with_plain_nibbles(pair.lo, k_lo))

    def sub_bytes(self, pair: NibblePair, inverse: bool = False,
                  cleanse: bool = True) -> NibblePair:
        caches = self._inv_sbox2d if inverse else self._sbox2d
        bases = (self.xor._build_power_basis(pair.hi),
                 self.xor._build_power_basis(pair.lo))
        hi = self.tf._bilinear(bases[0], bases[1], caches[0].load_coeffs())
        lo = self.tf._bilinear(bases[0], bases[1], caches[1].load_coeffs())
        if cleanse:
            # squash accumulated noise before MixColumns' deep XOR tree
            # amplifies it past the zeta16 decode margin
            hi = self.xor.cleanse(hi)
            lo = self.xor.cleanse(lo)
        return NibblePair(hi, lo)

    def shift_rows(self, pair: NibblePair, inverse: bool = False) -> NibblePair:
        return NibblePair(self.sr.shift_rows_simd(pair.hi, inverse=inverse),
                          self.sr.shift_rows_simd(pair.lo, inverse=inverse))

    def shift_mix(self, pair: NibblePair, inverse: bool = False) -> NibblePair:
        hook = self._refresh if self.segment_refresh else None
        return self.tf.merged_shift_mix_pairs(pair, inverse=inverse,
                                              refresh=hook)

    # multiplicative-depth cost of each round op (rescale units), used to
    # refresh *before* an op would exhaust the chain -- the generalization of
    # the reference's level<8 trigger (/root/reference/xor_service.py:274-277).
    # Measured per stage on the deep profile (scripts/boot_forensics.py round_noise):
    # ARK 48->43, SubBytes+cleanse 43->29, merged shift-mix 29->6
    SUB_DEPTH = 14
    MIX_DEPTH = 23
    ARK_DEPTH = 5
    POST_BOOT_CLEANSES = 4

    def _refresh(self, pair: NibblePair, need: int) -> NibblePair:
        """Bootstrap both nibbles if fewer than `need` depth units remain.
        `refresh` is any Ciphertext->Ciphertext rejuvenator -- engine
        bootstrap via EngineWrapper.bootstrap, or a recrypt oracle in tests.
        FOUR root-of-unity cleanses follow each real bootstrap: EvalMod
        leaves ~0.03 absolute on the zeta16 circle -- at the cleanse's
        m*e^2 convergence boundary, so the measured ladder is 0.034 ->
        0.0085 -> 6e-4 -> 3e-6 (scripts/boot_forensics.py q0) -- and the merged
        shift-mix's WORST-CASE LUT gain is ~2e3 (typical ~250x), so the
        refreshed error must reach ~1e-5 before the next segment."""
        if self.refresh is None:
            return pair
        r = self.eng.engine.params.rescale_primes

        def one(ct):
            if ct.level < need * r + 2:
                ct = self.refresh(ct)
                for _ in range(self.post_boot_cleanses):
                    ct = self.xor.cleanse(ct)
            elif self.segment_refresh and ct.level >= (need + 6) * r + 2:
                # segment mode removed the in-round cleanses (they do not
                # fit the post-refresh budget), so the top-of-chain
                # TRANSIENT -- a fresh state descending 30+ levels before
                # the first bootstrap fires -- must cleanse at each stage
                # boundary while levels are plentiful, or the per-stage LUT
                # gain (~30-100x) compounds the error past the zeta16
                # decode margin before any refresh runs (measured:
                # 2.6e-4 -> 0.1 across round 1, scripts/boot_forensics.py zeta_seg)
                ct = self.xor.cleanse(ct)
            return ct

        return NibblePair(one(pair.hi), one(pair.lo))

    # per-stage depth need in segment-refresh mode: one 2D LUT stage is
    # basis (3) + bilinear (2).  Kept at the exact stage cost (no margin):
    # the post-refresh budget after two cleanses is ~8 levels, and a looser
    # trigger (need+2 heuristic inside _refresh) would re-bootstrap after
    # every single stage
    SEG_STAGE_DEPTH = 5

    # ------------------------------------------------------------------
    def encrypt_rounds(self, pair: NibblePair, rounds: int = 10) -> NibblePair:
        """ARK(rk0) then AES rounds 1..rounds (round 10, when reached, uses
        plain ShiftRows per FIPS-197); refresh (bootstrap) between rounds
        when configured.  rounds < 10 gives a partial evaluation for level-
        budget-constrained runs."""
        seg = self.segment_refresh
        pair = self.add_round_key(pair, 0)
        for r in range(1, rounds + 1):
            pair = self._refresh(pair, self.SEG_STAGE_DEPTH if seg
                                 else self.SUB_DEPTH)
            # in segment mode the refresh's own cleanse ladder replaces the
            # post-SubBytes cleanse (11 levels would not fit the budget)
            pair = self.sub_bytes(pair, cleanse=not seg)
            if r == 10:
                pair = self.shift_rows(pair)
            else:
                if not seg:
                    pair = self._refresh(pair, self.MIX_DEPTH)
                pair = self.shift_mix(pair)
            pair = self._refresh(pair, self.SEG_STAGE_DEPTH if seg
                                 else self.ARK_DEPTH)
            pair = self.add_round_key(pair, r)
        return pair

    def decrypt_rounds(self, pair: NibblePair, rounds: int = 10) -> NibblePair:
        """Inverse cipher (FIPS-197 equivalent-inverse order): undo rounds
        `rounds`..1 then ARK(rk0).  The reference has no decryption path at
        all (its inverse transformer raises NotImplementedError,
        /root/reference/mixcolumns_service.py:85-88)."""
        for r in range(rounds, 0, -1):
            pair = self._refresh(pair, self.ARK_DEPTH + self.MIX_DEPTH)
            pair = self.add_round_key(pair, r)
            if r == 10:
                pair = self.shift_rows(pair, inverse=True)
            else:
                pair = self.shift_mix(pair, inverse=True)
            pair = self._refresh(pair, self.SUB_DEPTH)
            pair = self.sub_bytes(pair, inverse=True)
        return self.add_round_key(pair, 0)

    def encrypt_bytes(self, data: bytes, rounds: int = 10) -> bytes:
        """Host bytes in, homomorphically AES-encrypted host bytes out."""
        flat, nblocks = self.pack_blocks(data)
        pair = self.encrypt_state(flat)
        pair = self.encrypt_rounds(pair, rounds=rounds)
        out = self.decrypt_state(pair)
        return bytes(out[:16 * nblocks])


class AESFHE128Bitsliced:
    """Full AES-128 on the bit-sliced Walsh pipeline (ops/bitplane.py).

    One middle round = AddRoundKey (1 level; 8 cached plaintext multiplies)
    + SubBytes (4) + ShiftRows (1) + MixColumns (4-5) + sign-cleanse (3)
    ~= 14 levels -- 3.4x shallower than the zeta nibble-pair pipeline's ~47.
    The final round folds its AddRoundKey into the ShiftRows mask weights
    (cached per key) for free.

    AddRoundKey runs as explicit xor_plain rather than the Walsh-coefficient
    fold (sub_bytes(round_key=...)): the fold saves its 1 level but needs
    256 per-slot dense weight vectors per round, each host-encoded and
    re-uploaded per call -- on a remote TPU that traffic dominates the whole
    round, while xor_plain's 8 sign plaintexts are encoded once per key and
    sliced at every level."""

    ROUND_DEPTH = 14          # rescale units consumed by one middle round

    def __init__(self, eng_wrap: EngineWrapper, key: bytes | np.ndarray,
                 refresh: Optional[Callable[[Ciphertext], Ciphertext]] = None):
        from .ops.bitplane import BitSliceService
        self.eng = eng_wrap
        self.svc = BitSliceService(eng_wrap)
        self.round_keys = expand_key_128(key)
        self.refresh = refresh

    def encrypt_state(self, state_bytes: np.ndarray):
        return self.svc.encrypt_state(state_bytes)

    def decrypt_state(self, st) -> np.ndarray:
        return self.svc.decrypt_state(st)

    def _refresh(self, st, need_levels: int):
        """Pair-packed bootstrap: planes are REAL (+-1), so two planes ride
        ONE complex bootstrap as p0 + i*p1 (the i-multiply is exact via the
        per-prime zeta4 root: no level, no noise).  4 bootstraps instead of
        8 -- bootstrap dominates the 10-round wall-clock.  Unpacking is one
        conjugation + two fused 2-term combines per pair; the sign-cleanse
        that follows squashes EvalMod noise below the round's fixed point
        before the Walsh combine amplifies it."""
        if self.refresh is None:
            return st
        from .ops.bitplane import BitState
        eng = self.eng.engine
        conj_key = self.eng.conj_key
        r = eng.params.rescale_primes
        need = need_levels * r + 2
        if min(b.level for b in st.bits) >= need:
            return st
        out = [None] * len(st.bits)
        for p in range(0, len(st.bits), 2):
            packed = eng.add(st.bits[p], eng.multiply_i(st.bits[p + 1]))
            z = self.refresh(packed)
            zc = eng.conjugate(z, conj_key)
            out[p] = eng.linear_combination([z, zc], [0.5, 0.5])
            out[p + 1] = eng.linear_combination([z, zc], [-0.5j, 0.5j])
        return self.svc.cleanse(BitState(out))

    def encrypt_rounds(self, st, rounds: int = 10,
                       checkpoint_dir: str | None = None):
        """FIPS-197 order: ARK(rk_{r-1}) + SubBytes + ShiftRows(+MixColumns)
        per round; the final round (r=10) folds ARK(rk10) into the ShiftRows
        mask weights.  Partial evaluations (rounds < 10) close with an
        explicit AddRoundKey so the result matches the FIPS oracle prefix
        (tests/aes_oracle.aes128_partial).

        `checkpoint_dir` persists the 8 plane ciphertexts after each round
        and resumes from the deepest saved round on re-entry -- the
        checkpoint/resume subsystem the reference lacks entirely
        (SURVEY.md section 5: keys regenerated and state lost every run)."""
        svc = self.svc
        start = 1
        if checkpoint_dir:
            st2, done = self._load_checkpoint(checkpoint_dir, rounds)
            if done:
                st, start = st2, done + 1
        for r in range(start, rounds + 1):
            st = self._refresh(st, self.ROUND_DEPTH)
            st = svc.xor_plain(st, self.round_keys[r - 1])
            st = svc.sub_bytes(st)
            if r == 10:
                st = svc.shift_rows(st, fold_key=self.round_keys[10])
            else:
                st = svc.shift_rows(st)
                st = svc.mix_columns(st)
                st = svc.cleanse(st)
            if checkpoint_dir:
                self._save_checkpoint(checkpoint_dir, r, st)
        if rounds < 10:
            st = svc.xor_plain(st, self.round_keys[rounds])
        return st

    # -- per-round checkpoint / resume ------------------------------------
    @staticmethod
    def _ckpt_path(checkpoint_dir, r: int, k: int):
        from pathlib import Path
        return Path(checkpoint_dir) / f"round{r:02d}_plane{k}.npz"

    def _run_digest(self) -> str:
        """Digest binding a checkpoint dir to THIS evaluation: the expanded
        round keys plus everything keygen/encode depend on.  A reused dir
        from a run with a different AES key or params would otherwise be
        silently resumed into wrong ciphertext."""
        import hashlib
        from .utils.serialization import params_fingerprint
        h = hashlib.sha256()
        h.update(params_fingerprint(self.eng.engine.params).encode())
        for rk in self.round_keys:
            h.update(bytes(np.asarray(rk, dtype=np.uint8)))
        return h.hexdigest()[:16]

    def _save_checkpoint(self, checkpoint_dir, r: int, st) -> None:
        """Atomic per-plane writes + a round-complete marker written LAST,
        so a crash mid-save can never present a truncated round as
        resumable."""
        import os
        from pathlib import Path
        from .utils.serialization import save_ciphertext
        d = Path(checkpoint_dir)
        d.mkdir(parents=True, exist_ok=True)
        manifest = d / "manifest.json"
        if not manifest.exists():
            tmp = manifest.with_suffix(".tmp")
            tmp.write_text(json.dumps({"digest": self._run_digest()}))
            os.replace(tmp, manifest)
        for k, ct in enumerate(st.bits):
            path = self._ckpt_path(checkpoint_dir, r, k)
            # tmp must keep the .npz suffix: np.savez appends it otherwise
            tmp = path.with_name("tmp_" + path.name)
            save_ciphertext(tmp, ct)
            os.replace(tmp, path)
        marker = d / f"round{r:02d}.complete"
        tmp = marker.with_suffix(".tmp")
        tmp.write_text("ok")
        os.replace(tmp, marker)

    def _load_checkpoint(self, checkpoint_dir, max_round: int):
        """Deepest complete round <= max_round, or (None, 0).  Refuses to
        resume from a dir whose manifest digest does not match this run's
        (round keys + params)."""
        from pathlib import Path
        from .ops.bitplane import BitState
        from .utils.serialization import load_ciphertext
        d = Path(checkpoint_dir)
        manifest = d / "manifest.json"
        if not manifest.exists():
            if any(d.glob("round*_plane*.npz")):
                raise RuntimeError(
                    f"checkpoint dir {d} has round files but no manifest; "
                    "refusing to resume unverifiable state")
            return None, 0
        digest = json.loads(manifest.read_text()).get("digest")
        if digest != self._run_digest():
            raise RuntimeError(
                f"checkpoint dir {d} belongs to a different run (manifest "
                "digest mismatch: AES key, input params, or profile differ); "
                "use a fresh checkpoint_dir")
        for r in range(max_round, 0, -1):
            if not (d / f"round{r:02d}.complete").exists():
                continue
            paths = [self._ckpt_path(checkpoint_dir, r, k) for k in range(8)]
            if all(p.exists() for p in paths):
                return BitState([load_ciphertext(p) for p in paths]), r
        return None, 0

    def decrypt_rounds(self, st, rounds: int = 10):
        """Inverse cipher: undo rounds `rounds`..1 then ARK(rk0) (the
        reference's inverse transformer raises NotImplementedError,
        /root/reference/mixcolumns_service.py:85-88)."""
        svc = self.svc
        for r in range(rounds, 0, -1):
            st = self._refresh(st, self.ROUND_DEPTH + 4)
            st = svc.xor_plain(st, self.round_keys[r])
            if r != 10:
                st = svc.mix_columns(st, inverse=True)
                st = svc.cleanse(st)
            st = svc.shift_rows(st, inverse=True)
            st = svc.sub_bytes(st, inverse=True)
            st = svc.cleanse(st)
        return svc.xor_plain(st, self.round_keys[0])
