"""CKKS bootstrapping: ModRaise -> CoeffToSlot -> EvalMod -> SlotToCoeff.

Replaces desilofhe's engine.bootstrap (/root/reference/xor_service.py:120-129,
engine_context.py:70-73).  The reference leans on bootstrap freely (4 per
merged shift-mix, level<8 checks inside every XOR); this implements it from
scratch:

  ModRaise     reinterpret the bottom-prime residues as integers over the
               full chain: decrypts to m + q0*I with |I| <~ hamming/2
               (sparse secret; params.secret_hamming)
  CoeffToSlot  homomorphic inverse-embedding: two ciphertexts whose slots
               hold the polynomial coefficients, via BSGS diagonal
               matrix-vector products (closed-form diagonals, no dense
               matrix materialization) + a conjugation for 2*Re
  EvalMod      x -> (q0/Delta)*sin(2*pi*x*Delta/q0)/(2*pi) approximated by a
               Chebyshev expansion of cos at reduced range + r double-angle
               squarings (sin(t) = cos(t - pi/2))
  SlotToCoeff  forward embedding back to coefficient placement

Linear transforms come in two flavors:
  - dense BSGS over closed-form diagonals (quadratic in slot count; fine to
    N <= 2^13, kept as the reference/fallback), and
  - FACTORED FFT-stage transforms (default): the decode matrix E[j,k] =
    psi_C^(e_j*k) factors by decimation-in-time over the 5^j evaluation
    orbit into log2(sc) two-diagonal butterfly stages, E = S_1...S_L * BR.
    The trailing bit-reversal BR cancels between CoeffToSlot and SlotToCoeff
    because EvalMod is slot-wise, so neither is ever applied.  Stages merge
    into radix-2^r groups (<= 2^(r+1)-1 rotation-diagonals, all multiples of
    one power-of-two granularity) evaluated with hoisted-BSGS; the CTS
    groups are exactly the conjugate transposes of the STC groups.  Both
    coefficient halves ride ONE chain as c_k + i*c_{k+sc} (m_a = y + conj y,
    m_b = -i*(y - conj y)), halving the linear work vs the 4-map dense form.
"""
from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List

import numpy as np
import jax
import jax.numpy as jnp
from jax._src.core import trace_state_clean as _core_trace_clean

from .core.ciphertext import Ciphertext
from .core import rns, ops_impl
from .core.keys import GaloisKeySet, SwitchKey, gen_rotation_keys


@dataclass
class BootstrapKey:
    small: bool
    rot: GaloisKeySet | None = None
    baby: int = 0
    giant: int = 0
    K: float = 0.0            # EvalMod input range |t| <= K
    cheb_deg: int = 31
    double_angles: int = 2    # each doubling amplifies noise ~4x, keep low
    # CTS noise prescaling: run the CoeffToSlot chain on values f x larger
    # (a_scale * f before the chain) and fold 1/f into the LAST group's
    # diagonals.  Key-switch noise is additive in absolute coefficient
    # units, so dividing signal+noise back down shrinks the rotation noise
    # relative to the EvalMod input by ~f -- the noise then stops being
    # amplified into garbage by the cos(theta_max * u) derivative
    # (theta_max ~ 79 at prod_boot's h=192).  Bounded by modulus headroom
    # (values ~K*f vs q_chain) and by multiply_plain quantization, which
    # DOES scale with the value; f ~ 16-64 measured optimal.
    prescale: float = 16.0
    # High-precision CTS+EvalMod: run the bootstrap's noise-critical segment
    # at an effective PAIRED-prime scale ~2^54 (plaintexts encoded at 2^54,
    # every product rescaled by TWO chain primes).  The Chebyshev squaring
    # ladder amplifies the per-op noise floor by ~theta_max^2 (~6e3 at
    # h=192) and the STC aggregation adds another sqrt(slot_count), so the
    # single-prime Delta=2^27 floor (~3e-6/op) lands at ~0.5 absolute error
    # at N=2^16 -- unusable.  At 2^54 the floor is ~1e-13 and the residual
    # is approximation-dominated.  This is the uint32-backend equivalent of
    # HEaaN-class bootstraps running EvalMod at Delta ~ 2^45-2^60.  Costs
    # ~2x levels on CTS+EvalMod (~34 total at prod_boot).
    hi_prec: bool = False
    factored: bool = True
    # factored-transform plans: list of per-group dicts (see _group_plan)
    stc_plan: list = field(default_factory=list)
    cts_plan: list = field(default_factory=list)
    # nominal paired-prime scale tier for the hi_prec segment; derived by
    # create_bootstrap_key from the params' top rescale-prime pair (exact
    # scale tracking absorbs the difference from a power of two)
    hi_scale: float = float(2 ** 54)


def _bsgs_split(n_slots: int) -> tuple[int, int]:
    b = 1
    while b * b < n_slots:
        b *= 2
    return b, n_slots // b


# ---------------------------------------------------------------------------
# Factored FFT-stage machinery (host-side numpy; diagonal-dict matrices)
#
# A linear map M on C^sc is stored as {delta: u} meaning
#   (M x)[k] = sum_delta u[k] * x[(k + delta) mod sc],
# i.e. u is the rotation-diagonal at column offset delta; homomorphically
# each term is multiply_plain(rotate(ct, -delta), u).
# ---------------------------------------------------------------------------

def _fft_stages(params) -> list[dict]:
    """Butterfly stages of the decode map: E = S_1 * S_2 * ... * S_L * BR.

    Stage s has 2^(s-1) identical blocks of size t = sc/2^(s-1); block rows
    (i < h | i >= h), h = t/2, combine as u[i] +- tw[i]*u[i+h] with
    tw[j] = psi_C^(2^(s-1) * 5^j mod 2N) (decimation-in-time over the 5^j
    orbit; the 5^(sc/2) = 1+N identity makes the paired evaluation points
    negatives of each other, standard special-FFT structure)."""
    sc = params.slot_count
    n = params.n
    two_n = 2 * n
    L = sc.bit_length() - 1
    stages = []
    k = np.arange(sc)
    for s in range(1, L + 1):
        t = sc >> (s - 1)
        h = t >> 1
        j = np.arange(h, dtype=np.int64)
        e = np.ones(h, dtype=np.int64)
        acc = 1
        for jj in range(h):
            e[jj] = acc
            acc = acc * 5 % two_n
        tw = np.exp(1j * np.pi * (((1 << (s - 1)) * e) % two_n) / n)
        i = k % t
        u0 = np.where(i < h, 1.0 + 0j, -tw[(i - h) % h])
        up = np.where(i < h, tw[i % h], 0j)          # (k, k+h)
        um = np.where(i >= h, 1.0 + 0j, 0j)          # (k, k-h)
        st: Dict[int, np.ndarray] = {0: u0}
        for d, u in ((h % sc, up), ((-h) % sc, um)):
            # stage 1 has h = sc/2 where +h and -h coincide mod sc: accumulate
            st[d] = st[d] + u if d in st else u
        stages.append(st)
    return stages


def _diag_mul(A: dict, B: dict, sc: int) -> dict:
    """Compose A*B (apply B first) in rotation-diagonal form."""
    out: Dict[int, np.ndarray] = {}
    for a, ua in A.items():
        for b, vb in B.items():
            d = (a + b) % sc
            term = ua * np.roll(vb, -a)
            if d in out:
                out[d] = out[d] + term
            else:
                out[d] = term.copy()
    return {d: u for d, u in out.items() if np.max(np.abs(u)) > 1e-14}


def _diag_transpose_conj(A: dict, sc: int) -> dict:
    """conj(A)^T: entry (k, k+d) -> (k+d, k): offset -d, value rolled by d."""
    return {(-d) % sc: np.roll(np.conj(u), d) for d, u in A.items()}


def _diag_apply_host(A: dict, x: np.ndarray) -> np.ndarray:
    out = np.zeros_like(x, dtype=np.complex128)
    for d, u in A.items():
        out += u * np.roll(x, -d)
    return out


def _group_sizes(L: int, r: int = 5) -> list[int]:
    m = -(-L // r)
    base = L // m
    rem = L % m
    return [base + (1 if i < rem else 0) for i in range(m)]


def _pow2_hops(gamma: int) -> list[int]:
    """Signed power-of-two decomposition of a giant multiplier (shortest
    greedy/NAF form): gamma = sum(hops), each hop +-2^k.

    Every switch key costs ~231 MB of HBM at prod_boot; restricting giant
    rotations to power-of-two multiples of the stride g*B eliminates the
    gamma=+-3 keys entirely (4 full-height keys per prod_boot plan set) at
    the price of ONE extra key-switch on the affected per-gamma inner sums."""
    hops = []
    g = gamma
    while g:
        p = 1 << (abs(g).bit_length() - 1)
        if abs(g) - p > 2 * p - abs(g):
            p <<= 1
        p = p if g > 0 else -p
        hops.append(p)
        g -= p
    return hops


def _group_plan(mat: dict, sc: int) -> dict:
    """BSGS plan for one grouped diagonal matrix: all offsets are multiples
    of a power-of-two granularity g; delta = g*(beta + B*gamma).  Giant
    rotations are applied as power-of-two hop chains (see _pow2_hops), so
    `giant_steps` only lists +-g*B*2^k steps."""
    offs = sorted(mat.keys())
    nz = [d for d in offs if d != 0]
    g = 0
    for d in nz:
        g = np.gcd(g, d)
    g = int(g) if g else 1
    count = len(offs)
    B = 1
    while B * B < count:
        B *= 2
    entries = []
    baby_steps = set()
    giant_steps = set()
    for d, u in mat.items():
        m = d // g
        # signed giant split: beta in [0,B), gamma = round toward -inf
        beta = m % B
        gamma = (m - beta) // B
        # offsets near sc wrap: prefer the signed representative
        m_signed = m if m <= (sc // g) // 2 else m - sc // g
        beta_s = m_signed % B
        gamma_s = (m_signed - beta_s) // B
        if abs(gamma_s) < abs(gamma):
            beta, gamma = beta_s, gamma_s
        entries.append(dict(delta=d, u=u, beta=int(beta), gamma=int(gamma)))
        baby_steps.add(-g * int(beta))
        for h in _pow2_hops(int(gamma)):
            giant_steps.add(-g * B * h)
    return dict(g=g, B=B, entries=entries,
                baby_steps=sorted(baby_steps), giant_steps=sorted(giant_steps))


def build_factored_plans(params, radix: int = 5):
    """(stc_plan, cts_plan): per-group BSGS plans, STC applied last-group-
    first; CTS groups are conjugate transposes applied in reverse order with
    1/n distributed evenly."""
    sc = params.slot_count
    stages = _fft_stages(params)
    L = len(stages)
    sizes = _group_sizes(L, radix)
    groups = []
    idx = 0
    for sz in sizes:
        G = stages[idx]
        for s in range(idx + 1, idx + sz):
            G = _diag_mul(G, stages[s], sc)
        groups.append(G)
        idx += sz
    # STC: E~ = G_0 G_1 ... G_{m-1}; application order reversed
    stc_groups = list(reversed(groups))
    # CTS: F~ = (1/n) conjT(G_{m-1}) ... conjT(G_0); applied conjT(G_0) first
    m = len(groups)
    scale = (1.0 / params.n) ** (1.0 / m)
    cts_groups = []
    for G in groups:
        Gt = _diag_transpose_conj(G, sc)
        cts_groups.append({d: u * scale for d, u in Gt.items()})
    stc_plan = [_group_plan(G, sc) for G in stc_groups]
    cts_plan = [_group_plan(G, sc) for G in cts_groups]
    return stc_plan, cts_plan


def _flavor_config(params, small: bool):
    """(K, double_angles, cheb_deg) for a bootstrap flavor.

    Noise through the double-angle chain grows ~4^r, so keep r small and
    pay with Chebyshev degree instead ("small" trades accuracy for cost).
    Empirical scan (n=2^9, h=16): (scale 2^27, q0 2^30, da=1) -> err 0.012
    vs 0.05+ for da=2 or scale 2^26."""
    h = params.secret_hamming or params.n // 2
    # |I| concentrates around sqrt(h)/2; 1.5*sqrt(h)+4 leaves ~5+ sigma
    K = 1.5 * np.sqrt(h) + 4
    da = 2 if small else 1
    theta_max = (2 * np.pi * K + np.pi / 2) / (2 ** da)
    deg = int(1.3 * theta_max) + 24
    return K, da, deg


def _probe_rotation_levels(engine, steps, stc_plan, cts_plan, hi_prec: bool,
                           hi_scale: float,
                           flavors) -> Dict[str, Dict[int, int]]:
    """{phase: {rotation step -> max ciphertext level used}}, phase in
    {"cts", "stc"}, measured by ABSTRACTLY tracing the real bootstrap
    (jax.eval_shape: no FLOPs, no device memory) with full-shape dummy zero
    keys.  Levels are static shape metadata under the trace, so the ledger
    is exact for the traced configuration; `flavors` lists the `small`
    values that will share the resulting key sets (both flavors when the
    context shares one set, context.py)."""
    params = engine.params
    # one virtually-allocated zero array backs every dummy key (b and a):
    # nothing is ever transferred or computed under eval_shape
    zeros = np.zeros((params.dnum, params.L_tot, params.n), dtype=np.uint32)
    dummy = SwitchKey(b=zeros, a=zeros, cap=None)
    rot = GaloisKeySet(keys={params.rot_galois_elt(s): dummy for s in steps})
    ledger: Dict[str, Dict[int, int]] = {"cts": {}, "stc": {}}
    for small in flavors:
        K, da, deg = _flavor_config(params, small)
        bk = BootstrapKey(small=small, rot=rot, K=K,
                          cheb_deg=deg, double_angles=da, factored=True,
                          hi_prec=hi_prec, hi_scale=hi_scale,
                          prescale=1.0 if hi_prec else 16.0,
                          stc_plan=stc_plan, cts_plan=cts_plan)
        bk._level_ledger = ledger

        def run(data):
            ct = Ciphertext(data, engine.params.scale)
            return bootstrap(engine, ct, dummy, dummy, bk).data

        jax.eval_shape(run, jax.ShapeDtypeStruct((2, 3, params.n),
                                                 jnp.uint32))
    return ledger


def rotation_keys_mb(rot: GaloisKeySet) -> float:
    """Actual HBM footprint of a Galois key set (caps included)."""
    return sum(k.b.size + k.a.size for k in rot.keys.values()) * 4 / 2 ** 20


def create_bootstrap_key(engine, sk, small: bool = False,
                         factored: bool | None = None,
                         rot: GaloisKeySet | None = None,
                         hi_prec: bool | None = None) -> BootstrapKey:
    """`rot` injects an existing Galois key set instead of generating one:
    the rotation steps depend only on params (the factored plans), so the
    small and regular bootstrap keys can share one set -- at prod_boot each
    set is ~38 keys x 220 MB, so regenerating it per flavor would double
    the dominant key-memory footprint."""
    params = engine.params
    if params.rescale_primes != 1:
        # byte-domain hp profiles bootstrap via the nibble pipeline instead
        raise NotImplementedError(
            "bootstrap currently targets single-prime-rescale profiles")
    sc = params.slot_count
    if factored is None:
        factored = sc >= 8
    K, da, deg = _flavor_config(params, small)
    # hi_prec default: big rings NEED the paired-prime noise floor (see the
    # field docstring); tiny CI rings keep the cheaper single-prime path
    # their 82-level profiles and cleanse ladders were tuned around.  The
    # explicit parameter overrides the heuristic (ADVICE r3: testable on
    # small rings, disableable on big ones).
    if hi_prec is None:
        hi_prec = params.n >= 4096
    tl = params.top_level
    hi_scale = float(params.q_primes[tl]) * float(params.q_primes[tl - 1])
    if factored:
        stc_plan, cts_plan = build_factored_plans(params)
        steps = set()
        for plan in stc_plan + cts_plan:
            steps |= {s % sc for s in plan["baby_steps"]}
            steps |= {s % sc for s in plan["giant_steps"]}
        steps.discard(0)
        if rot is None:
            # NB the step set is deliberately small: giant rotations are
            # power-of-two hop chains (_pow2_hops), so no key is spent on
            # composite multiples like gamma=+-3 -- at prod_boot that is 4
            # fewer full-height keys (~0.9 GB of HBM) for one extra switch
            # on each affected per-gamma sum.  CTS and STC share the same
            # symmetric step set; the keys serve both phases.
            rot = gen_rotation_keys(params, engine.tabs, sk, sorted(steps))
        return BootstrapKey(small=small, rot=rot, K=K,
                            cheb_deg=deg, double_angles=da, factored=True,
                            hi_prec=hi_prec, hi_scale=hi_scale,
                            prescale=1.0 if hi_prec else 16.0,
                            stc_plan=stc_plan, cts_plan=cts_plan)
    baby, giant = _bsgs_split(sc)
    steps = set(range(1, baby))
    steps |= {g * baby for g in range(1, giant)}
    if rot is None:
        rot = gen_rotation_keys(params, engine.tabs, sk, sorted(steps))
    return BootstrapKey(small=small, rot=rot, baby=baby, giant=giant, K=K,
                        cheb_deg=deg, double_angles=da, factored=False)


# ---------------------------------------------------------------------------
# ModRaise
# ---------------------------------------------------------------------------

def _mod_raise(engine, ct: Ciphertext) -> Ciphertext:
    """Bottom-prime ciphertext -> full-level ciphertext of m + q0*I."""
    params = engine.params
    tabs = engine.tabs
    data0 = ops_impl.ct_drop_to(params, ct.data, 0)     # [k, 1, N]
    raised = ops_impl.mod_raise_core(params, tabs, data0)
    return Ciphertext(raised, ct.scale)


# ---------------------------------------------------------------------------
# Homomorphic linear transforms (dense BSGS over closed-form diagonals)
# ---------------------------------------------------------------------------

class _DiagCache:
    """Per-(map, level) encoded diagonal plaintexts."""

    def __init__(self):
        self.store: Dict[Any, Any] = {}


_diag_cache = _DiagCache()


class _ResidentCache:
    """Budget-capped DEVICE-resident cache of materialized hi-diagonal
    plaintext stacks ([K, lvl+1, N] Montgomery eval, one per gamma-group).

    The round-4 frontier measurement (PERF.md "memory/speed frontier"):
    with diagonals resident the warm prod_boot bootstrap free-runs at
    0.38-0.65 s, vs 5-7 s when every gamma-group re-uploads its ~10 MB
    payload through the relay (~25 ms RPC each).  Unbounded device caching
    OOMs because the axon backend accumulates loaded executables across
    client runs, so this cache spends a fixed byte budget
    (AESFHE_RESIDENT_MB, default 2300 MB ~= the CTS groups at prod_boot)
    hot-first and lets the overflow ride the streamed-payload path.
    A second, much smaller budget (AESFHE_RESIDENT_PAYLOAD_MB, default
    400 MB) keeps the overflow's RAW [K, 5, N] digit stacks device-side
    (~12x smaller), so a budget miss still skips the relay RPC and pays
    only the digit-CRT+NTT re-materialization program.

    Sizing at prod_boot (measured, scripts/ budget probe r5): the full hi
    set is ~2.47 GB of materialized stacks (cts0 440 + cts1 835 + cts2
    803 + stc0 ~394 MB) and ~276 MB of raw digit stacks; the 2600 MB
    default holds everything with the uniform-work-level flagship, whose
    group levels repeat exactly across all refreshes."""

    def __init__(self):
        self.store: Dict[Any, Any] = {}
        self.bytes = 0
        self.pay_store: Dict[Any, Any] = {}
        self.pay_bytes = 0

    @property
    def budget(self) -> int:
        return int(float(os.environ.get("AESFHE_RESIDENT_MB", "2600"))
                   * 2 ** 20)

    @property
    def pay_budget(self) -> int:
        return int(float(os.environ.get("AESFHE_RESIDENT_PAYLOAD_MB", "520"))
                   * 2 ** 20)

    def get(self, key):
        return self.store.get(key)

    def put(self, key, arr) -> bool:
        if isinstance(arr, jax.core.Tracer):
            return False
        nb = int(arr.size) * arr.dtype.itemsize
        if self.bytes + nb > self.budget:
            return False
        self.store[key] = arr
        self.bytes += nb
        return True

    def get_pay(self, key):
        return self.pay_store.get(key)

    def drop_pay(self, key):
        arr = self.pay_store.pop(key, None)
        if arr is not None:
            self.pay_bytes -= int(arr.size) * arr.dtype.itemsize

    def put_pay(self, key, arr) -> bool:
        if isinstance(arr, jax.core.Tracer):
            return False
        nb = int(arr.size) * arr.dtype.itemsize
        if self.pay_bytes + nb > self.pay_budget:
            return False
        self.pay_store[key] = arr
        self.pay_bytes += nb
        return True

    def clear(self):
        self.store.clear()
        self.pay_store.clear()
        self.bytes = 0
        self.pay_bytes = 0


_resident = _ResidentCache()

# Diagonal routing hooks for the FUSED bootstrap (one jitted program per
# bootstrap instead of ~1300 per-op dispatches -- launch overhead through
# the relay is ~3 ms/op, i.e. MOST of the warm bootstrap wall, measured
# r5 phase probe).  Under tracing the diagonal stacks must be ARGUMENTS,
# not captured constants (2.5+ GB of constants breaks the relay upload):
#   _diag_recorder: dict filled by one eager capture run with every
#       (tag, gamma) -> materialized stack, bypassing the byte budget
#   _diag_provider: dict consulted INSTEAD of the caches while tracing;
#       the jitted wrapper passes the recorded stacks as args in order
_diag_recorder: Dict[Any, Any] | None = None
_diag_provider: Dict[Any, Any] | None = None


def _apply_linear_map(engine, ct: Ciphertext, diag_fn, tag: str,
                      bk: BootstrapKey) -> Ciphertext:
    """out_slots = M @ in_slots with diag_fn(d) -> complex [sc] diagonal
    diag_d[k] = M[k, (k-d) mod sc]; BSGS: out = sum_g rot(sum_b pt*rot(ct,b), gB).
    """
    params = engine.params
    sc = params.slot_count
    B, G = bk.baby, bk.giant
    # hoisted baby rotations: one shared digit decomposition for all B steps
    babies = engine.hoisted_rotations(ct, bk.rot, list(range(B)))
    out = None
    for g in range(G):
        acc = None
        for b in range(B):
            d = g * B + b
            key = (id(params), tag, d, babies[b].level)
            pt = _diag_cache.store.get(key)
            if pt is None:
                diag = diag_fn(d)
                # pre-rotate for the outer rotation: diag'_{g,b} = roll(diag, -gB)
                pt = engine.encode(np.roll(diag, -g * B),
                                   level=babies[b].level)
                # tracer guard: a tracer cached under eval_shape/jit would
                # leak out of the trace (see Engine._perm_dev)
                if not isinstance(pt.data, jax.core.Tracer):
                    _diag_cache.store[key] = pt
            term = engine.multiply_plain(babies[b], pt)
            acc = term if acc is None else engine.add(acc, term)
        if g:
            acc = engine.rotate(acc, bk.rot, g * B)
        out = acc if out is None else engine.add(out, acc)
    return out


def _apply_group(engine, ct: Ciphertext, plan: dict, tag: str,
                 bk: BootstrapKey, scalar: complex = 1.0,
                 hi: bool = False,
                 out_scale: float | None = None,
                 rot: GaloisKeySet | None = None) -> Ciphertext:
    """Apply one grouped FFT-stage matrix (optionally scaled) with
    hoisted-BSGS.

    plan entries carry delta = g*(beta + B*gamma); babies rot(ct, -g*beta)
    share one key-switch decomposition, giants rotate the per-gamma inner
    sums with pre-rolled diagonals.  `scalar` multiplies every diagonal
    (used to fold the -i of the CTS half-split into the last group for
    free instead of spending a level on a scalar multiply).  `hi` encodes
    the diagonals at the paired-prime hi_scale and rescales each product
    twice (2 levels per group, ~2^-54 noise floor)."""
    params = engine.params
    sc = params.slot_count
    g, B = plan["g"], plan["B"]
    baby_steps = plan["baby_steps"]
    rot = rot if rot is not None else bk.rot
    led = getattr(bk, "_level_ledger", None)
    if led is not None:
        # key-level probe (see _probe_rotation_levels): babies switch at the
        # group's entry level, giants 1-2 levels lower; record entry for
        # both, keyed by phase (CTS and STC share steps but not heights)
        phase = "stc" if tag.startswith("fstc") else "cts"
        for s in list(plan["baby_steps"]) + list(plan["giant_steps"]):
            s = s % sc
            if s:
                led[phase][s] = max(led[phase].get(s, -1), ct.level)
    babies = engine.hoisted_rotations(ct, rot, baby_steps)
    baby_map = dict(zip(baby_steps, babies))
    by_gamma: Dict[int, list] = {}
    for ent in plan["entries"]:
        by_gamma.setdefault(ent["gamma"], []).append(ent)
    # hi: encode diagonals at the scale that makes the TWO rescales land on
    # exactly out_scale (default hi_scale) -- per-group drift correction
    # (see _cheb_eval_ps's drift note); the babies share ct's level and
    # scale.  out_scale lets a group change precision tier for free: the
    # first CTS group lifts Delta -> hi_scale (absorbing a_scale), the
    # first STC group drops hi_scale -> Delta (absorbing q0/(2 pi Delta)).
    if hi:
        lvl = ct.level
        tgt = bk.hi_scale if out_scale is None else out_scale
        enc_scale = (tgt * float(params.q_primes[lvl]) *
                     float(params.q_primes[lvl - 1]) / ct.scale)
    else:
        enc_scale = None
    # hi-tier cache keying: the payload CONTENT is roll(u * scalar) encoded
    # at enc_scale, so the key must capture both (ADVICE r4: the fstc0drop
    # scalar depends on the bootstrap INPUT's scale -- two inputs at
    # different scales in one process must not share payloads)
    if hi:
        sc_key = (round(np.log2(abs(scalar)) * 1e6) if scalar != 0 else 0,
                  round(np.angle(scalar) * 1e6),
                  round(np.log2(enc_scale) * 1e6))

    else:
        # non-hi cache key: content is roll(u * scalar) at scale Delta
        lvl = ct.level
        enc_scale = engine.params.scale
        sc_key = (round(np.log2(abs(scalar)) * 1e6) if scalar != 0 else 0,
                  round(np.angle(scalar) * 1e6))

    def _host_payloads(ents, shift):
        pays = []
        for ent in ents:
            key = (id(params), tag, ent["delta"], lvl, sc_key)
            hit = _diag_cache.store.get(key)
            if hit is None:
                hit = engine.encode_payload(
                    np.roll(ent["u"] * scalar, shift), enc_scale)
                _diag_cache.store[key] = hit
            pays.append(hit)
        return pays

    # PREFETCH: issue the uploads for every non-resident gamma-group
    # BEFORE any compute, so group k+1's ~10 MB stack rides the relay
    # behind group k's multiply-accumulate instead of stalling it
    # (the relay pipelines ~40 async ops; a synchronous upload per
    # group cost ~5 s of each warm prod_boot bootstrap, PERF.md r4).
    # With a recorder active, build the stacks for EVERY gamma: the fused
    # programs take the RAW [K, 5, N] digit stacks as args (~12x smaller
    # than materialized plaintexts -- the difference between fitting and
    # RESOURCE_EXHAUSTED next to 7.5 GB of keys) and re-materialize
    # inside the program.
    prefetched: Dict[int, Any] = {}
    if _diag_provider is None:
        for gamma, ents in sorted(by_gamma.items()):
            gkey = (id(params), tag, gamma, lvl, sc_key)
            if _resident.get(gkey) is None or _diag_recorder is not None:
                stackp = _resident.get_pay(gkey)
                if stackp is None:
                    pays = _host_payloads(ents, g * B * gamma)
                    stackp = np.stack(pays)
                    if _core_trace_clean():
                        # device_put under an ACTIVE trace is a traced
                        # primitive -- it would hand the recorder a tracer
                        # (the abstract eval_shape capture hits this); keep
                        # the stack as host numpy there and let the fused
                        # program's arg transfer upload it once
                        stackp = jax.device_put(stackp)
                    _resident.put_pay(gkey, stackp)
                prefetched[gamma] = stackp
                if _diag_recorder is not None:
                    _diag_recorder[(tag, gamma)] = stackp
    out = None
    for gamma, ents in sorted(by_gamma.items()):
        shift = g * B * gamma
        # gamma-group terms share (level, scale) by construction, so the
        # whole group fuses into ONE multiply-accumulate kernel with the
        # rescale(s) applied to the SUM: one rounding instead of len(ents),
        # and len(ents)-1 fewer full-height rescale programs -- the warm
        # prod_boot bootstrap spent ~half its wall in per-diagonal rescales
        # before this (PERF.md round-4 warm breakdown)
        b_cts = [baby_map[-g * ent["beta"]] for ent in ents]
        # diagonals: budget-capped DEVICE-resident materialized stacks
        # (tier A), device-resident raw digit stacks (tier B), host
        # payload streaming (tier C) -- see _ResidentCache.  Under a
        # fused-bootstrap trace the provider serves the RAW digit stack
        # and the digit-CRT+NTT materialization happens INSIDE the traced
        # program (small extra compute, 12x less HBM than tier A).  The
        # host payload cache is trace-safe by construction (numpy only);
        # the resident tiers refuse tracers.
        gkey = (id(params), tag, gamma, lvl, sc_key)
        if _diag_provider is not None:
            ptd = engine.materialize_payloads(_diag_provider[(tag, gamma)],
                                              lvl)
        else:
            ptd = _resident.get(gkey)
            if ptd is None:
                ptd = engine.materialize_payloads(prefetched[gamma], lvl)
                if _resident.put(gkey, ptd) and _diag_recorder is None:
                    # tier A holds the materialized stack; the raw digit
                    # copy in tier B is only needed while recording
                    _resident.drop_pay(gkey)
        acc = engine.fused_ptd_sum(b_cts, ptd, enc_scale,
                                   rescales=2 if hi else 1)
        # giant rotation as power-of-two hops: non-pow2 gammas have no
        # direct key (see _pow2_hops -- each dropped key is ~231 MB of HBM
        # at prod_boot); the hop chain costs one extra switch per composite
        # gamma on the single accumulated sum
        for h in _pow2_hops(gamma):
            acc = engine.rotate(acc, rot, (-g * B * h) % sc)
        out = acc if out is None else engine.add(out, acc)
    return out


def _apply_chain(engine, ct: Ciphertext, plans: list, tag: str,
                 bk: BootstrapKey, hi: bool = False,
                 rot: GaloisKeySet | None = None) -> Ciphertext:
    for i, plan in enumerate(plans):
        ct = _apply_group(engine, ct, plan, f"{tag}{i}", bk, hi=hi, rot=rot)
    return ct


def _cts_diag(params, half: int):
    """CoeffToSlot diagonals: F[k, j] = psi_C^(-e_j * (k + offset)) / N,
    out_k = 2*Re((F z)_k) -> handled by caller with conj; the 2/N is folded
    here as 1/N (2Re = x + conj(x))."""
    sc = params.slot_count
    n = params.n
    two_n = 2 * n
    e = params.slot_exp                     # [sc]

    def diag_fn_factory(offset):
        def diag_fn(d):
            k = np.arange(sc)
            j = (k - d) % sc
            expnt = (-(e[j] * (k + offset))) % two_n
            return np.exp(1j * np.pi * expnt / n) / n
        return diag_fn

    return diag_fn_factory(0), diag_fn_factory(half)


def _stc_diag(params, half: int):
    """SlotToCoeff diagonals: E[j, k] = psi_C^(e_j * (k + offset))."""
    sc = params.slot_count
    n = params.n
    two_n = 2 * n
    e = params.slot_exp

    def diag_fn_factory(offset):
        def diag_fn(d):
            j = np.arange(sc)
            k = (j - d) % sc
            expnt = (e[j] * (k + offset)) % two_n
            return np.exp(1j * np.pi * expnt / n)
        return diag_fn

    return diag_fn_factory(0), diag_fn_factory(half)


# ---------------------------------------------------------------------------
# EvalMod: Chebyshev cos + double angles
# ---------------------------------------------------------------------------

def _chebyshev_coeffs(f, deg: int) -> np.ndarray:
    import numpy.polynomial.chebyshev as C
    k = np.arange(deg + 1)
    nodes = np.cos(np.pi * (k + 0.5) / (deg + 1))
    vals = f(nodes)
    coeffs = np.zeros(deg + 1)
    for m in range(deg + 1):
        coeffs[m] = 2.0 / (deg + 1) * np.sum(vals * np.cos(np.pi * m *
                                                           (k + 0.5) /
                                                           (deg + 1)))
    coeffs[0] /= 2
    return coeffs


def _cheb_basis(engine, u: Ciphertext, deg: int, rlk) -> List[Ciphertext]:
    """[T_1(u), ..., T_deg(u)] with binary-depth products:
    T_{2k} = 2 T_k^2 - 1; T_{2k+1} = 2 T_k T_{k+1} - T_1.

    Dense basis -- superseded by _cheb_eval_ps for EvalMod (the sequential
    odd recurrence wastes both multiplies and scale-alignment levels); kept
    for tests and small degrees."""
    T: Dict[int, Ciphertext] = {1: u}
    for m in range(2, deg + 1):
        if m % 2 == 0:
            k = m // 2
            t = engine.multiply(T[k], T[k], rlk)
            t = engine.add(t, t)
            T[m] = engine.add_plain(t, -1.0)
        else:
            k = m // 2
            t = engine.multiply(T[k], T[k + 1], rlk)
            t = engine.add(t, t)
            T[m] = engine.sub(t, T[1])
    return [T[m] for m in range(1, deg + 1)]


def _cheb_eval_ps(engine, coeffs: np.ndarray, u: Ciphertext, rlk,
                  baby: int = 8, hi: bool = False) -> Ciphertext:
    """Paterson-Stockmeyer/BSGS evaluation of sum_i coeffs[i] * T_i(u).

    Materializes babies T_1..T_{baby-1} and power-of-two giants
    T_{2^j} (baby <= 2^j <= deg), then splits recursively with
    T_{m+j} = 2 T_j T_m - T_{m-j}:  p = low + T_m * (2*q), deg(q) < m.
    ~2*sqrt(deg) multiplies at depth ~log2(deg)+1, replacing the reference-
    style dense power basis (255 sequential mults for the S-box,
    /root/reference/sbox/sbox_service.py:93; SURVEY.md section 7 item 6).

    `hi`: operands ride a paired-prime scale; every ct*ct product rescales
    twice so the squaring ladder's ~deg^2 noise amplification acts on a
    ~2^-54 floor instead of 2^-27 (see BootstrapKey.hi_prec).  The ladder
    steps fold the x2 doubling into a renormalizing scalar multiply that
    re-targets the EXACT input scale: without it the tracked scale drifts
    multiplicatively (s -> s^2/(q*q') per squaring), and on prime chains
    whose pairs sit systematically off 2^54 (the sparse 2N | p-1 pool at
    N=2^16) six sequential squarings collapsed the scale by 2^6+ and the
    compounding constant-encode quantization pushed T_k out of [-1, 1] —
    2*T^2 - gamma with gamma != 1 diverges — which is how the first
    full-ring hi_prec bootstrap still failed while n=2^10 (denser prime
    pool, milder drift) passed."""
    def mul(a, b):
        # hi: ONE fused pair-drop rescale (multiply_pair) instead of the
        # multiply's rescale + a second _rescale -- halves the rescale-
        # kernel count of the squaring ladder (VERDICT r4 weak #2)
        if hi:
            return engine.multiply_pair(a, b, rlk)
        return engine.multiply(a, b, rlk)

    def step2(a, b):
        """2*a*b: multiply (+ extra paired rescale when hi), then double.
        The tracked scale drifts multiplicatively (s -> s^2/(q*q') per
        squaring) but the ENGINE tracks it truthfully (exact integer-based
        scale accounting in _mul_scalar/_adjust_scale), so the -1 constants
        and cross-scale adds stay correct; re-targeting the scale here with
        a renormalizing multiply would need an encode scale ~1 (the product
        is only one prime above the ladder scale), whose integer rounding
        IS a scale lie -- measured as T_k escaping [-1,1] and a garbage
        bootstrap."""
        t = mul(a, b)
        return engine.add(t, t)

    deg = len(coeffs) - 1
    while deg > 0 and abs(coeffs[deg]) < 1e-14:
        deg -= 1
    T: Dict[int, Ciphertext] = {1: u}
    for m in range(2, baby):
        k = m // 2
        if m % 2 == 0:
            T[m] = engine.add_plain(step2(T[k], T[k]), -1.0)
        else:
            T[m] = engine.sub(step2(T[k], T[k + 1]), T[1])
    m = baby
    # giants by repeated doubling (baby must be a power of two)
    g = 1
    while g < baby:
        g *= 2
        if g not in T:
            k = g // 2
            T[g] = engine.add_plain(step2(T[k], T[k]), -1.0)
    while g * 2 <= deg:
        g *= 2
        k = g // 2
        T[g] = engine.add_plain(step2(T[k], T[k]), -1.0)

    def rec(c: Dict[int, float]):
        """-> (ciphertext | None, constant): value = ct + constant."""
        nz = {k: v for k, v in c.items() if abs(v) > 1e-14}
        const = nz.pop(0, 0.0)
        direct = {k: v for k, v in nz.items() if k in T}
        rest = {k: v for k, v in nz.items() if k not in T}
        parts = []
        if direct:
            ks = sorted(direct)
            parts.append(engine.linear_combination(
                [T[k] for k in ks], [direct[k] for k in ks]))
        if rest:
            # every power of two <= deg is materialized, so d is not a power
            # of two, mm < d strictly, and rest has no T_mm coefficient
            d = max(rest)
            mm = 1
            while mm * 2 <= d:
                mm *= 2
            q = {j: 2.0 * rest.get(mm + j, 0.0)
                 for j in range(1, d - mm + 1)}
            low: Dict[int, float] = {}
            for i, v in rest.items():
                if i < mm:
                    low[i] = low.get(i, 0.0) + v
            for j in range(1, d - mm + 1):
                low[mm - j] = low.get(mm - j, 0.0) - rest.get(mm + j, 0.0)
            q_ct, q_k = rec(q)
            if q_ct is not None:
                parts.append(mul(T[mm], q_ct))
            if abs(q_k) > 1e-14:
                parts.append(engine.multiply(T[mm], q_k))
            lo_ct, lo_k = rec(low)
            const += lo_k
            if lo_ct is not None:
                parts.append(lo_ct)
        if not parts:
            return None, const
        acc = parts[0]
        for p in parts[1:]:
            acc = engine.add(acc, p)
        return acc, const

    c0 = {i: float(coeffs[i]) for i in range(deg + 1)}
    out_ct, out_k = rec(c0)
    if abs(out_k) > 1e-14:
        out_ct = engine.add_plain(out_ct, out_k)
    return out_ct


def eval_mod_scales(bk: BootstrapKey, q0: int, delta: float):
    """(a_scale, b_shift): u = x*a_scale + b_shift maps x = (m+q0*I)/Delta
    onto the normalized Chebyshev domain u = (2 pi t - pi/2)/(2^r theta_max),
    t = x*Delta/q0.  a_scale is applied BEFORE CoeffToSlot so the linear
    transform works on O(1) values (keeps the CKKS noise floor relative to
    the small scale from being amplified by the q0*I magnitude)."""
    r = bk.double_angles
    theta_max = (2 * np.pi * bk.K + np.pi / 2) / (2 ** r)
    a_scale = (2 * np.pi * delta / q0) / (2 ** r) / theta_max
    b_shift = (-np.pi / 2) / (2 ** r) / theta_max
    return a_scale, b_shift, theta_max


def _eval_mod(engine, u_raw: Ciphertext, bk: BootstrapKey, rlk,
              q0: int, delta: float,
              final_mult: complex = 1.0) -> Ciphertext:
    """input slots u_raw = x*a_scale (pre-scaled coefficients); returns
    slots ~ m/Delta via Chebyshev cos + double angles + arcsine cubic.

    With bk.hi_prec, u_raw arrives on the paired-prime scale and every
    product rescales twice; the result is returned RAW (y = sin value, at
    the hi scale, final_mult ignored) -- the caller folds q0/(2 pi Delta)
    and the hi -> Delta drop into the first SlotToCoeff group's diagonals,
    saving the two renorm levels."""
    params = engine.params
    hi = bk.hi_prec
    K = bk.K
    r = bk.double_angles

    def mul(a, b):
        if hi:
            return engine.multiply_pair(a, b, rlk)
        return engine.multiply(a, b, rlk)

    _, b_shift, theta_max = eval_mod_scales(bk, q0, delta)
    u = engine.add_plain(u_raw, b_shift)
    coeffs = _chebyshev_coeffs(lambda v: np.cos(theta_max * v), bk.cheb_deg)
    y = _cheb_eval_ps(engine, coeffs, u, rlk, hi=hi)
    for _ in range(r):
        y2 = mul(y, y)
        y2 = engine.add(y2, y2)
        y = engine.add_plain(y2, -1.0)        # cos(2t) = 2cos^2 - 1
    # y = sin(2 pi m / q0); message ~ arcsin(y) * q0/(2 pi Delta).
    # The cubic arcsine correction y + y^3/6 removes the (2 pi m/q0)^3/6
    # bias — which scales as (Delta/(q0*sqrt(n)))^2 since CKKS coefficients
    # of unit-modulus slots concentrate at sigma ~ Delta/sqrt(n).  On big
    # rings (hi_prec) it is ~1e-7 relative, far below the CTS noise, so the
    # two multiplies (4 levels at paired-prime rescale) are pure waste.
    if hi:
        corr = y
    else:
        y2 = mul(y, y)
        y3 = mul(y2, y)
        # renormalizing scalar multiplies: the squaring chain drifts the
        # tracked scale (s -> s^2/q), and an add would drag the sum down to
        # the worst operand's scale; both needed scalar multiplies re-target
        # the scale
        corr = engine.add(y, engine.multiply_renorm(y3, 1.0 / 6.0,
                                                    target_scale=y.scale))
    if hi:
        return corr          # raw sin value at the hi scale (see docstring)
    fm = final_mult * q0 / (2 * np.pi * delta)
    return engine.multiply_renorm(corr, fm)


# ---------------------------------------------------------------------------
# Full bootstrap
# ---------------------------------------------------------------------------

class _PhaseTimer:
    """Opt-in per-phase wall/op-count profile of one bootstrap() call
    (AESFHE_BOOT_TIMES=1).  Each mark blocks on the phase's output, so it
    perturbs the async dispatch pipeline -- profiling runs only; the
    production path never syncs mid-bootstrap.

    State is PER-INSTANCE (one instance per bootstrap() call), so
    concurrent engines or re-entrant bootstraps cannot interleave a
    profile (ADVICE r4); `publish()` snapshots the finished profile onto
    the class attributes `enabled`/`records` for probe scripts that read
    the last completed call (scripts/prod_boot_probe.py)."""
    enabled = False
    records: list = []

    def __init__(self, engine):
        self.on = bool(int(os.environ.get("AESFHE_BOOT_TIMES", "0")))
        self.recs: list = []
        if self.on:
            self._eng = engine
            self._snap = dict(engine.counters)
            self._t0 = time.perf_counter()

    def mark(self, name, out):
        if not self.on:
            return
        val = out.data if hasattr(out, "data") else out
        if isinstance(val, jax.core.Tracer):
            return                     # fused-bootstrap trace: nothing to time
        jax.block_until_ready(val)
        now = time.perf_counter()
        cur = dict(self._eng.counters)
        delta = {k: cur[k] - self._snap[k] for k in cur
                 if cur[k] != self._snap[k]}
        self.recs.append((name, now - self._t0, delta))
        self._snap, self._t0 = cur, now

    def publish(self):
        _PhaseTimer.enabled = self.on
        if self.on:
            _PhaseTimer.records = self.recs

    @classmethod
    def report_str(cls) -> str:
        return "  ".join(f"{n}:{dt:.2f}s" for n, dt, _ in cls.records)


def _boot_front(engine, ct: Ciphertext, raised: Ciphertext, conj_key,
                bk: BootstrapKey, pt=None) -> tuple:
    """Factored-path front half: prescale + CoeffToSlot + conjugation
    half-split.  `ct` supplies the ORIGINAL input scale (for
    eval_mod_scales); `raised` is its ModRaise.  Returns (ct_a, ct_b),
    the two real coefficient-half ciphertexts EvalMod consumes."""
    params = engine.params
    q0 = int(params.q_primes[0])
    a_scale, _, _ = eval_mod_scales(bk, q0, ct.scale)
    hi = bk.hi_prec and bk.factored
    f = bk.prescale
    if not hi:
        raised = engine.multiply(raised, a_scale * f)
    plans = bk.cts_plan
    if hi:
        # a_scale rides the FIRST group's diagonals and the group's
        # exact-scale encode lifts Delta -> hi_scale: the dedicated
        # pre-normalization multiply costs zero levels
        yp = _apply_group(engine, raised, plans[0], "fcts0lift",
                          bk, scalar=a_scale * f, hi=True)
        if pt:
            pt.mark("cts0", yp)
        for i, plan in enumerate(plans[1:-1], 1):
            yp = _apply_group(engine, yp, plan, f"fcts{i}", bk, hi=True)
            if pt:
                pt.mark(f"cts{i}", yp)
    else:
        yp = _apply_chain(engine, raised, plans[:-1], "fcts", bk)
    last = plans[-1]
    y_a = _apply_group(engine, yp, last, f"fctsA{f:g}", bk,
                       scalar=1.0 / f, hi=hi)
    if pt:
        pt.mark("ctsLast", y_a)
    # y_b = (-i*G) x = -i * (G x): one EXACT zeta4 scalar multiply
    # (multiply_i: no level, no noise) replaces a second full group
    # evaluation -- and its ~63 cached dense diagonal plaintexts, which
    # at N=2^16 cost ~850 MB of HBM
    y_b = engine.negate(engine.multiply_i(y_a))
    ct_a = engine.add(y_a, engine.conjugate(y_a, conj_key))
    ct_b = engine.add(y_b, engine.conjugate(y_b, conj_key))
    if pt:
        pt.mark("conj_split", ct_b)
    return ct_a, ct_b


def _boot_back(engine, m_a: Ciphertext, m_b: Ciphertext, bk: BootstrapKey,
               in_scale: float, pt=None) -> Ciphertext:
    """Factored-path back half: half-recombine + SlotToCoeff."""
    params = engine.params
    q0 = int(params.q_primes[0])
    hi = bk.hi_prec and bk.factored
    if hi:
        v = engine.add(m_a, engine.multiply_i(m_b))
        fm = q0 / (2 * np.pi * in_scale)
        sp = bk.stc_plan
        # fm and the hi -> Delta paired drop fold into STC group 0
        v = _apply_group(engine, v, sp[0], "fstc0drop", bk,
                         scalar=fm, hi=True, out_scale=params.scale)
        if pt:
            pt.mark("stc0", v)
        out = _apply_chain(engine, v, sp[1:], "fstc1on", bk)
        if pt:
            pt.mark("stc_rest", out)
        return out
    v = engine.add(m_a, m_b)
    return _apply_chain(engine, v, bk.stc_plan, "fstc", bk)


class FusedBootstrap:
    """The whole bootstrap as ONE jitted XLA program.

    The per-op dispatch design (every engine primitive its own jitted
    program) costs ~3 ms of launch overhead per op through the axon relay;
    at ~1300 ops per bootstrap that launch overhead IS most of the measured
    4.2 s warm wall (r5 phase probe) -- the resident-diagonal cache already
    removed the uploads.  Tracing bootstrap() end-to-end collapses those
    launches into one and lets XLA fuse across op boundaries (intermediate
    [l+1, N] arrays never round-trip HBM between elementwise stages).

    Keys and diagonal stacks are passed as ARGUMENTS (pytrees), never
    captured as constants: 7.5 GB of rotation keys + 2.5 GB of diagonals
    as program constants would break the relay's upload path.  One eager
    capture run (per input signature) records every (tag, gamma) diagonal
    stack via _diag_recorder and the static output scale; the traced run
    then serves them back through _diag_provider.

    Static per instance: input (level, scale), params identity, key caps.
    The flagship's uniform work level means ONE instance serves all 36
    refresh bootstraps.  Engine counters only tick during the trace, so
    per-call op counts are not meaningful in fused mode.
    """

    def __init__(self, engine, relin_key, conj_key, bk: BootstrapKey,
                 sample_ct: Ciphertext):
        if not bk.factored:
            raise NotImplementedError("FusedBootstrap needs the factored "
                                      "transform path")
        global _diag_recorder
        params = engine.params
        q0 = int(params.q_primes[0])
        rec: Dict[Any, Any] = {}
        # ABSTRACT capture under jax.eval_shape: no FLOPs, no device
        # memory, no executables.  The first fused-boot build originally
        # ran the bootstrap EAGERLY to record diagonals -- ~1300 per-op
        # programs compiled AND up to ~2.6 GB of tier-A stacks churned
        # through a device already holding 8.9 GB of keys, which is what
        # tipped the r5 flagship warmup into RESOURCE_EXHAUSTED (the
        # backend accumulates executables; PERF.md frontier note).  The
        # diagonal payloads are HOST numpy by construction (fad6204), so
        # an abstract trace still records them concretely -- same
        # mechanism as _probe_rotation_levels' key-level ledger; only the
        # raw [K, 5, N] digit stacks (~0.4 GB) are device_put, and those
        # are exactly the arrays the fused programs need as args anyway.
        meta: Dict[str, Any] = {}
        _diag_recorder = rec
        try:
            engine._count("bootstrap")

            def _capture(data):
                ct_in = Ciphertext(data, float(sample_ct.scale))
                raised = _mod_raise(engine, ct_in)
                a, b = _boot_front(engine, ct_in, raised, conj_key, bk)
                ma = _eval_mod(engine, a, bk, relin_key, q0, ct_in.scale)
                mb = _eval_mod(engine, b, bk, relin_key, q0, ct_in.scale,
                               final_mult=1j)
                out = _boot_back(engine, ma, mb, bk, ct_in.scale)
                meta.update(a=(a.level, float(a.scale)),
                            b_scale=float(b.scale),
                            ma=(ma.level, float(ma.scale)),
                            mb_scale=float(mb.scale),
                            out_scale=float(out.scale))
                return out.data

            jax.eval_shape(_capture,
                           jax.ShapeDtypeStruct(sample_ct.data.shape,
                                                sample_ct.data.dtype))
        finally:
            _diag_recorder = None
        self.engine = engine
        self.in_level = sample_ct.level
        self.in_scale = float(sample_ct.scale)
        self.out_scale = meta["out_scale"]
        self.ref_out = None             # abstract capture: no eager result
        self.rot_elts = sorted(bk.rot.keys.keys())
        rot_caps = {g: getattr(bk.rot.keys[g], "cap", None)
                    for g in self.rot_elts}
        self.relin_key = relin_key
        self.conj_key = conj_key
        self.bk = bk
        hi = bk.hi_prec and bk.factored
        # front diagonals (fcts*) vs back (fstc*); served back in key order
        self.front_keys = sorted(k for k in rec if k[0].startswith("fcts"))
        self.back_keys = sorted(k for k in rec if k[0].startswith("fstc"))
        # the abstract capture records HOST stacks; upload each ONCE here
        # (outside any trace) so per-call dispatch passes device residents
        self.front_diags = [jax.device_put(rec[k]) for k in self.front_keys]
        self.back_diags = [jax.device_put(rec[k]) for k in self.back_keys]
        in_scale = self.in_scale
        rot_elts = self.rot_elts
        a_lvl, a_scale_c = meta["a"]
        b_scale_c = meta["b_scale"]
        ma_lvl, ma_scale = meta["ma"]
        mb_scale = meta["mb_scale"]

        # Each phase is its own jitted program: the WHOLE bootstrap as one
        # program SIGKILLs the backend's tpu_compile_helper at prod_boot
        # size (measured r5); three programs (front / EvalMod / back)
        # keep per-compile size bounded at 3-4 launches per bootstrap.
        # `tabs` (NTT twiddles + MXU matrices, ~430 MB) and every
        # key/diagonal are traced ARGS: as captured constants they ship
        # inside the remote_compile request body (HTTP 413).

        def _rotset(rot_flat):
            return GaloisKeySet(keys={
                g: SwitchKey(b=rb, a=ra, cap=rot_caps[g])
                for g, (rb, ra) in zip(rot_elts, rot_flat)})

        def front_fn(data, tabs, conj_ba, rot_flat, diags):
            global _diag_provider
            import dataclasses
            cj = SwitchKey(b=conj_ba[0], a=conj_ba[1],
                           cap=getattr(conj_key, "cap", None))
            bk2 = dataclasses.replace(bk, rot=_rotset(rot_flat))
            _diag_provider = dict(zip(self.front_keys, diags))
            old_tabs = engine.tabs
            engine.tabs = tabs
            try:
                ct_in = Ciphertext(data, in_scale)
                a, b = _boot_front(engine, ct_in, _mod_raise(engine, ct_in),
                                   cj, bk2)
            finally:
                engine.tabs = old_tabs
                _diag_provider = None
            return a.data, b.data

        def mid_fn(data, tabs, rlk_ba, scale=a_scale_c, fm=1.0):
            rlk = SwitchKey(b=rlk_ba[0], a=rlk_ba[1],
                            cap=getattr(relin_key, "cap", None))
            old_tabs = engine.tabs
            engine.tabs = tabs
            try:
                m = _eval_mod(engine, Ciphertext(data, scale), bk, rlk,
                              q0, in_scale, final_mult=fm)
            finally:
                engine.tabs = old_tabs
            return m.data

        def back_fn(ma, mb, tabs, rot_flat, diags):
            global _diag_provider
            import dataclasses
            bk2 = dataclasses.replace(bk, rot=_rotset(rot_flat))
            _diag_provider = dict(zip(self.back_keys, diags))
            old_tabs = engine.tabs
            engine.tabs = tabs
            try:
                out = _boot_back(engine, Ciphertext(ma, ma_scale),
                                 Ciphertext(mb, mb_scale), bk2, in_scale)
            finally:
                engine.tabs = old_tabs
                _diag_provider = None
            return out.data

        self._front = jax.jit(front_fn)
        self._back = jax.jit(back_fn)
        if hi:
            # hi EvalMod returns the raw sin (final_mult ignored) and both
            # halves share (level, scale): ONE compiled program serves both
            self._mid_a = self._mid_b = jax.jit(functools.partial(
                mid_fn, scale=a_scale_c, fm=1.0))
        else:
            self._mid_a = jax.jit(functools.partial(
                mid_fn, scale=a_scale_c, fm=1.0))
            self._mid_b = jax.jit(functools.partial(
                mid_fn, scale=b_scale_c, fm=1j))

    def __call__(self, ct: Ciphertext) -> Ciphertext:
        if ct.level != self.in_level:
            raise ValueError(
                f"fused bootstrap compiled for input level {self.in_level}, "
                f"got {ct.level}")
        # same tolerance as the engine's scale-equality checks: inputs
        # within _SCALE_ACCEPT share the program (and its tracked scales)
        if abs(ct.scale - self.in_scale) / self.in_scale > 1e-7:
            raise ValueError(
                f"fused bootstrap compiled for input scale {self.in_scale}, "
                f"got {ct.scale}")
        tabs = self.engine.tabs
        rot_flat = [(self.bk.rot.keys[g].b, self.bk.rot.keys[g].a)
                    for g in self.rot_elts]
        rlk_ba = (self.relin_key.b, self.relin_key.a)
        a, b = self._front(ct.data, tabs,
                           (self.conj_key.b, self.conj_key.a),
                           rot_flat, self.front_diags)
        ma = self._mid_a(a, tabs, rlk_ba)
        mb = self._mid_b(b, tabs, rlk_ba)
        data = self._back(ma, mb, tabs, rot_flat, self.back_diags)
        return Ciphertext(data, self.out_scale)


def bootstrap(engine, ct: Ciphertext, relin_key, conj_key,
              bootstrap_key: BootstrapKey) -> Ciphertext:
    if bootstrap_key is None or bootstrap_key.rot is None:
        raise NotImplementedError(
            "bootstrap keys missing: create them with "
            "engine.create_bootstrap_key(sk) on a bootstrappable profile "
            "(single-prime rescale, sparse secret)")
    params = engine.params
    engine._count("bootstrap")
    pt = _PhaseTimer(engine)
    q0 = int(params.q_primes[0])
    sc = params.slot_count
    half = sc

    raised = _mod_raise(engine, ct)
    pt.mark("mod_raise", raised)
    if bootstrap_key.factored:
        ct_a, ct_b = _boot_front(engine, ct, raised, conj_key,
                                 bootstrap_key, pt)
        m_a = _eval_mod(engine, ct_a, bootstrap_key, relin_key, q0, ct.scale)
        pt.mark("evalmod_a", m_a)
        # fold the *i of the half-recombine into EvalMod's final constant
        # (exact zeta4 multiply when hi: _eval_mod returned the raw sin)
        m_b = _eval_mod(engine, ct_b, bootstrap_key, relin_key, q0, ct.scale,
                        final_mult=1j)
        pt.mark("evalmod_b", m_b)
        out = _boot_back(engine, m_a, m_b, bootstrap_key, ct.scale, pt)
        pt.publish()
        return out
    # dense fallback: two maps per direction over closed-form diagonals
    a_scale, _, _ = eval_mod_scales(bootstrap_key, q0, ct.scale)
    raised = engine.multiply(raised, a_scale)
    f_a, f_b = _cts_diag(params, half)
    w_a = _apply_linear_map(engine, raised, f_a, "cts_a", bootstrap_key)
    w_b = _apply_linear_map(engine, raised, f_b, "cts_b", bootstrap_key)
    ct_a = engine.add(w_a, engine.conjugate(w_a, conj_key))
    ct_b = engine.add(w_b, engine.conjugate(w_b, conj_key))
    # EvalMod on both coefficient halves
    m_a = _eval_mod(engine, ct_a, bootstrap_key, relin_key, q0, ct.scale)
    m_b = _eval_mod(engine, ct_b, bootstrap_key, relin_key, q0, ct.scale)
    # SlotToCoeff
    e_a, e_b = _stc_diag(params, half)
    out = engine.add(
        _apply_linear_map(engine, m_a, e_a, "stc_a", bootstrap_key),
        _apply_linear_map(engine, m_b, e_b, "stc_b", bootstrap_key))
    return out
