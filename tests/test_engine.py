"""Engine-primitive tests: TPU-native port of the reference's engine sanity
suite (/root/reference/test/test_engine_rot.py) plus the wider desilofhe
contract (SURVEY.md section 2.1).

Tolerances are set by our parameter profiles' scale (2^26 / 2^27), not the
reference's (desilofhe uses ~2^40 scales, hence its 1e-6); the zeta-domain
payloads used by the AES pipeline only require ~1e-2 slot accuracy.
"""
import numpy as np
import pytest

ATOL = 1e-3


def test_encrypt_decrypt_identity(tiny_engine):
    # port of /root/reference/test/test_engine_rot.py:21-29
    E = tiny_engine
    eng = E["eng"]
    sc = eng.slot_count
    vec = np.linspace(0.0, 1.0, num=sc)
    ct = eng.encrypt(vec, E["pk"])
    dec = eng.decrypt(ct, E["sk"])
    assert np.allclose(dec.real, vec, atol=ATOL)
    assert np.max(np.abs(dec.imag)) < ATOL


def test_encrypt_pads_short_input(tiny_engine):
    # desilofhe auto-pads inputs shorter than slot_count
    # (/root/reference/test/test_xor_service.py:55-58)
    E = tiny_engine
    eng = E["eng"]
    vec = np.arange(16, dtype=np.float64)
    ct = eng.encrypt(vec, E["pk"])
    dec = eng.decrypt(ct, E["sk"])
    assert dec.shape[0] == eng.slot_count
    assert np.allclose(dec.real[:16], vec, atol=ATOL)
    assert np.allclose(dec.real[16:], 0.0, atol=ATOL)


def test_rotate_matches_roll(tiny_engine):
    # port of /root/reference/test/test_engine_rot.py:32-40:
    # positive steps == np.roll(+k) (right shift)
    E = tiny_engine
    eng = E["eng"]
    sc = eng.slot_count
    base = np.arange(sc, dtype=np.float64)
    ct = eng.encrypt(base, E["pk"])
    for k in (5, -3, 1, sc // 2):
        dec = eng.decrypt(eng.rotate(ct, E["rot"], k), E["sk"])
        assert np.allclose(dec.real, np.roll(base, k), atol=ATOL), k


def test_relinearize_noop_raises_and_after_mul(tiny_engine):
    # port of /root/reference/test/test_engine_rot.py:43-62: desilofhe raises
    # "should have 3 polynomials" on degree-1 input (the wrapper catches it)
    E = tiny_engine
    eng = E["eng"]
    sc = eng.slot_count
    vec = np.random.RandomState(0).rand(sc)
    ct = eng.encrypt(vec, E["pk"])
    with pytest.raises(RuntimeError, match="should have 3 polynomials"):
        eng.relinearize(ct, E["rlk"])
    ct_sq = eng.multiply(ct, ct, E["rlk"])
    dec = eng.decrypt(ct_sq, E["sk"])
    assert np.allclose(dec.real, vec * vec, atol=ATOL)


def test_conjugate(tiny_engine):
    E = tiny_engine
    eng = E["eng"]
    sc = eng.slot_count
    rng = np.random.default_rng(1)
    vec = rng.random(sc) + 1j * rng.random(sc)
    ct = eng.encrypt(vec, E["pk"])
    dec = eng.decrypt(eng.conjugate(ct, E["conj"]), E["sk"])
    assert np.allclose(dec, np.conj(vec), atol=ATOL)


def test_add_and_add_plain(tiny_engine):
    E = tiny_engine
    eng = E["eng"]
    sc = eng.slot_count
    rng = np.random.default_rng(2)
    a = rng.random(sc)
    b = rng.random(sc)
    ca = eng.encrypt(a, E["pk"])
    cb = eng.encrypt(b, E["pk"])
    assert np.allclose(eng.decrypt(eng.add(ca, cb), E["sk"]).real, a + b,
                       atol=ATOL)
    assert np.allclose(eng.decrypt(eng.add_plain(ca, 1.5), E["sk"]).real,
                       a + 1.5, atol=ATOL)
    assert np.allclose(eng.decrypt(eng.add_plain(ca, 0.5j), E["sk"]),
                       a + 0.5j, atol=ATOL)


def test_multiply_overloads(tiny_engine):
    # ct*ct (+relin), ct*plaintext-vector, ct*scalar incl. the multiply(ct, 0)
    # zero-ciphertext idiom (/root/reference/sbox/sbox_service.py:100)
    E = tiny_engine
    eng = E["eng"]
    sc = eng.slot_count
    rng = np.random.default_rng(3)
    a = rng.random(sc)
    b = rng.random(sc)
    ca = eng.encrypt(a, E["pk"])
    cb = eng.encrypt(b, E["pk"])
    assert np.allclose(eng.decrypt(eng.multiply(ca, cb, E["rlk"]), E["sk"]).real,
                       a * b, atol=ATOL)
    assert np.allclose(eng.decrypt(eng.multiply(ca, 0.25), E["sk"]).real,
                       0.25 * a, atol=ATOL)
    assert np.allclose(eng.decrypt(eng.multiply(ca, 0.0), E["sk"]).real,
                       np.zeros(sc), atol=ATOL)
    assert np.allclose(eng.decrypt(eng.multiply_plain(ca, b), E["sk"]).real,
                       a * b, atol=ATOL)
    mask = np.zeros(sc)
    mask[::4] = 1.0
    assert np.allclose(eng.decrypt(eng.multiply_plain(ca, mask), E["sk"]).real,
                       a * mask, atol=ATOL)


def test_level_tracking_and_auto_align(tiny_engine):
    E = tiny_engine
    eng = E["eng"]
    sc = eng.slot_count
    vec = np.full(sc, 0.9)
    ct = eng.encrypt(vec, E["pk"])
    assert ct.level == eng.max_level
    sq = eng.multiply(ct, ct, E["rlk"])
    assert sq.level == eng.max_level - 1
    # adding operands at different levels/scales must transparently align
    mixed = eng.add(sq, ct)
    assert np.allclose(eng.decrypt(mixed, E["sk"]).real, 0.9 ** 2 + 0.9,
                       atol=ATOL)


def test_make_power_basis(tiny_engine):
    # contract of /root/reference/xor_service.py:85-86: index i -> ct^(i+1)
    E = tiny_engine
    eng = E["eng"]
    sc = eng.slot_count
    z = np.exp(-2j * np.pi * np.arange(sc) / 16)
    ct = eng.encrypt(z, E["pk"])
    basis = eng.make_power_basis(ct, 8, E["rlk"])
    assert len(basis) == 8
    for i in (0, 2, 7):
        dec = eng.decrypt(basis[i], E["sk"])
        assert np.allclose(dec, z ** (i + 1), atol=5e-3), i


def test_evaluate_polynomial_complex_coeffs(tiny_engine):
    E = tiny_engine
    eng = E["eng"]
    sc = eng.slot_count
    rng = np.random.default_rng(4)
    x = rng.random(sc) * 0.5
    ct = eng.encrypt(x, E["pk"])
    coeffs = [0.3 + 0.1j, -0.5, 0.25j, 0.125]
    out = eng.decrypt(eng.evaluate_polynomial(ct, coeffs, E["rlk"]), E["sk"])
    ref = coeffs[0] + coeffs[1] * x + coeffs[2] * x ** 2 + coeffs[3] * x ** 3
    assert np.allclose(out, ref, atol=5e-3)


def test_deep_circuit_precision(tiny_engine):
    # repeated squaring of a root of unity stays decodable (phase accuracy)
    E = tiny_engine
    eng = E["eng"]
    sc = eng.slot_count
    z = np.exp(-2j * np.pi * np.arange(sc) / 16)
    ct = eng.encrypt(z, E["pk"])
    ref = z
    for _ in range(4):
        ct = eng.multiply(ct, ct, E["rlk"])
        ref = ref * ref
    dec = eng.decrypt(ct, E["sk"])
    assert np.max(np.abs(dec - ref)) < 5e-3


def test_fused_mod_down_matches_exact(tiny_engine):
    # The production key-switch mod-down is a fused one-shot approximate CRT
    # base conversion WITH a centered overshoot correction; its divergence
    # from the exact (sequential, rounding) division is <= ~1 coefficient
    # unit and ~zero-mean (ops_impl._mod_down_specials docstring -- the
    # uncorrected K/2-mean bias was the root cause of the round-3 full-ring
    # bootstrap failure).  Verify on a real key-switch accumulator state.
    import jax.numpy as jnp
    from aesfhe_tpu.core import ops_impl, rns
    E = tiny_engine
    eng = E["eng"]
    params = eng.params
    tabs = eng.tabs
    rng = np.random.RandomState(7)
    level = params.top_level
    lp1 = level + 1
    K = params.num_special
    rows = ops_impl._rows(params, level, True)
    qs = params.q_arr[rows].astype(np.uint32)
    x = (rng.randint(0, 1 << 30, size=(lp1 + K, params.n)).astype(np.uint64)
         % qs[:, None]).astype(np.uint32)
    fused = np.asarray(ops_impl._mod_down_specials(params, tabs,
                                                   jnp.asarray(x), level))
    exact = np.asarray(ops_impl._mod_down_specials_exact(params, tabs,
                                                         jnp.asarray(x),
                                                         level))
    # compare in plain coefficient domain: |fused - exact| <= K+1 mod q_i
    tr_q = ops_impl._tabs_rows(tabs, ops_impl._rows(params, level, False))
    def to_plain(v):
        c = ops_impl.intt_rows(jnp.asarray(v), tr_q)
        return np.asarray(rns.from_mont(c, tr_q["q"].reshape(-1, 1),
                                        tr_q["qinv"].reshape(-1, 1)))
    pf, pe = to_plain(fused), to_plain(exact)
    qcol = params.q_arr[:lp1].astype(np.int64)[:, None]
    diff = (pf.astype(np.int64) - pe.astype(np.int64)) % qcol
    diff = np.minimum(diff, qcol - diff)
    assert diff.max() <= 2, diff.max()
    # and the residual must be unbiased (the bias is what killed bootstrap)
    sdiff = (pf.astype(np.int64) - pe.astype(np.int64)) % qcol
    sdiff = np.where(sdiff > qcol // 2, sdiff - qcol, sdiff)
    assert abs(sdiff.mean()) < 0.5, sdiff.mean()


def test_linear_combination_dense_coeffs(tiny_engine):
    # per-slot vector coefficients (Plaintext / raw numpy) mix with scalars
    # and cost the same single rescale as the scalar path
    from aesfhe_tpu.core.ciphertext import Plaintext
    E = tiny_engine
    eng = E["eng"]
    sc = eng.slot_count
    rng = np.random.RandomState(3)
    x = rng.rand(sc) + 1j * rng.rand(sc)
    y = rng.rand(sc) - 0.5
    ct_x = eng.encrypt(x, E["pk"])
    ct_y = eng.encrypt(y, E["pk"])
    w = np.exp(2j * np.pi * rng.rand(sc))          # dense unit-modulus weights
    const_vec = rng.rand(sc)
    pt_w = eng.encode(w)
    lvl_before = ct_x.level
    out = eng.linear_combination([ct_x, ct_y], [pt_w, 0.5 - 0.25j],
                                 constant=const_vec)
    ref = w * x + (0.5 - 0.25j) * y + const_vec
    dec = eng.decrypt(out, E["sk"])
    assert np.max(np.abs(dec - ref)) < 5e-3
    assert out.level == lvl_before - 1            # one rescale total


def test_level_capped_rotation_key(tiny_engine):
    # A switch key generated with lvl_cap stores only q_0..q_cap + special
    # rows ((cap+1+K)/L_tot of the HBM) and must behave identically to a
    # full key at levels <= cap, and refuse use above it
    # (keys.SwitchKey.cap; used by the flagship to fit prod_boot in HBM).
    from aesfhe_tpu.core import keys as keys_mod
    E = tiny_engine
    eng, sk, pk = E["eng"], E["sk"], E["pk"]
    p = eng.params
    cap = p.max_level // 2
    capped = keys_mod.gen_rotation_keys(p, eng.tabs, sk, [3], lvl_cap=cap)
    rng = np.random.RandomState(3)
    z = rng.standard_normal(p.slot_count)
    ct = eng._drop(eng.encrypt(z, pk), cap)
    got = eng.decrypt(eng.rotate(ct, capped, 3), sk)
    assert np.abs(got - np.roll(z, 3)).max() < 1e-2
    hs = eng.hoisted_rotations(ct, capped, [3])
    assert np.abs(eng.decrypt(hs[0], sk) - np.roll(z, 3)).max() < 1e-2
    with pytest.raises(AssertionError):
        eng.rotate(eng.encrypt(z, pk), capped, 3)   # above the cap


def test_fused_pt_sum_matches_per_term(tiny_engine):
    # sum-then-rescale (Engine.fused_pt_sum, the bootstrap gamma-group
    # kernel) must agree with the per-term multiply_plain+rescale+add chain
    # and exit at the same (level, scale)
    E = tiny_engine
    eng = E["eng"]
    sc = eng.slot_count
    rng = np.random.RandomState(7)
    xs = [rng.rand(sc) + 1j * rng.rand(sc) for _ in range(3)]
    ws = [np.exp(2j * np.pi * rng.rand(sc)) for _ in range(3)]
    cts = [eng.encrypt(x, E["pk"]) for x in xs]
    pts = [eng.encode(w, level=cts[0].level) for w in ws]
    fused = eng.fused_pt_sum(list(zip(cts, pts)), rescales=1)
    ref_ct = None
    for ct, pt in zip(cts, pts):
        term = eng.multiply_plain(ct, pt)
        ref_ct = term if ref_ct is None else eng.add(ref_ct, term)
    want = sum(w * x for w, x in zip(ws, xs))
    dec = eng.decrypt(fused, E["sk"])
    assert np.max(np.abs(dec - want)) < 5e-3
    assert fused.level == ref_ct.level
    assert abs(fused.scale - ref_ct.scale) / ref_ct.scale < 1e-9
    assert np.max(np.abs(dec - eng.decrypt(ref_ct, E["sk"]))) < 5e-3


def test_fused_pt_sum_double_rescale(tiny_engine):
    # rescales=2 (the hi-precision paired-prime tier) drops two levels and
    # divides the scale by both primes
    E = tiny_engine
    eng = E["eng"]
    sc = eng.slot_count
    rng = np.random.RandomState(8)
    x = rng.rand(sc)
    ct = eng.encrypt(x, E["pk"])
    lvl = ct.level
    p = eng.params
    # encode at a scale chosen so two rescales land back on Delta
    enc_scale = (p.scale * float(p.q_primes[lvl]) *
                 float(p.q_primes[lvl - 1]) / ct.scale)
    pt = eng.encode(np.full(sc, 0.5), level=lvl, scale=enc_scale)
    out = eng.fused_pt_sum([(ct, pt)], rescales=2)
    assert out.level == lvl - 2
    assert abs(out.scale - p.scale) / p.scale < 1e-6
    dec = eng.decrypt(out, E["sk"])
    assert np.max(np.abs(dec - 0.5 * x)) < 5e-3


def test_digit_crt_encode_bit_exact(tiny_engine):
    # engine.encode's device-completed digit CRT (_digits_encode_core) must
    # be BIT-identical to the all-host reduction (encoding.coeffs_to_rns +
    # _encode_core) -- including the big-coefficient (>2^62) branch used by
    # the hi-precision bootstrap's scale-lifting diagonals
    import jax.numpy as jnp
    from aesfhe_tpu.core import encoding
    from aesfhe_tpu.core.engine import _encode_core, _digits_encode_core
    E = tiny_engine
    eng = E["eng"]
    p = eng.params
    rng = np.random.RandomState(11)
    z = np.exp(2j * np.pi * rng.rand(p.slot_count))
    for scale in (p.scale, 2.0 ** 54, 2.0 ** 71):
        c = encoding.slots_to_coeffs(z, p, scale)
        old = _encode_core(p, eng.tabs, jnp.asarray(
            encoding.coeffs_to_rns(
                c, p.active_primes(p.top_level)).astype(np.uint32)),
            p.top_level)
        new = eng.encode(z, scale=scale)
        assert np.array_equal(np.asarray(old), np.asarray(new.data)), scale


def test_rescale_pair_exact_oracle(tiny_engine):
    # the fused two-prime rescale (ops_impl.ct_rescale_pair, the kernel
    # behind every hi-precision product) must equal the EXACT integer
    # oracle round_nearest(v / (q_a*q_b)) -- the single-rounding division
    # the two sequential ct_rescale programs only approximate (each does
    # its own rounding; they may differ from the oracle by 1)
    import jax.numpy as jnp
    from aesfhe_tpu.core import ops_impl, rns
    from aesfhe_tpu.core import keys as keys_mod
    E = tiny_engine
    eng = E["eng"]
    p = eng.params
    lvl = p.top_level
    qa, qb = int(p.q_primes[lvl]), int(p.q_primes[lvl - 1])
    qprod = 1
    for q in p.q_primes[:lvl + 1]:
        qprod *= int(q)
    rng = np.random.RandomState(13)
    # random centered big integers across the whole modulus range
    v = np.array([(int(rng.randint(0, 1 << 62)) * int(rng.randint(0, 1 << 60))
                   + int(rng.randint(0, 1 << 30))) % qprod
                  for _ in range(p.n)], dtype=object)
    rows = np.arange(lvl + 1, dtype=np.int32)
    res = np.zeros((lvl + 1, p.n), dtype=np.uint32)
    for i in range(lvl + 1):
        res[i] = np.array([int(x) % int(p.q_primes[i]) for x in v],
                          dtype=np.uint32)
    a_eval = keys_mod._to_eval(p, eng.tabs, res, rows)[None]  # [1, l+1, N]
    out = np.asarray(ops_impl.ct_rescale_pair(p, eng.tabs, a_eval))
    # back to plain coefficients
    tr = ops_impl._tabs_rows(eng.tabs, rows[:-2])
    coeff = np.asarray(rns.from_mont(
        ops_impl.intt_rows(jnp.asarray(out), tr),
        tr["q"].reshape(1, -1, 1), tr["qinv"].reshape(1, -1, 1)))[0]
    # oracle: centered v, exact nearest-integer division by qa*qb,
    # compared against the FULL CRT reconstruction of the output limbs
    prs = [int(q) for q in p.q_primes[:lvl - 1]]
    M = 1
    for q in prs:
        M *= q
    for j in rng.choice(p.n, 64, replace=False):
        vc = int(v[j])
        if vc > qprod // 2:
            vc -= qprod
        want = (2 * vc + qa * qb) // (2 * qa * qb)  # round-nearest, qaqb odd
        got = 0
        for i, q in enumerate(prs):
            Mi = M // q
            got = (got + int(coeff[i, j]) * Mi * pow(Mi, -1, q)) % M
        if got > M // 2:
            got -= M
        assert got == want, (j, got, want)


def test_multiply_pair_matches_sequential(tiny_engine):
    # engine.multiply_pair (fused pair-drop product of the hi tier) is
    # bit-exactly the sequential multiply + one extra _rescale on real
    # prime chains (the two roundings and the fused single rounding only
    # diverge on adversarial half-way values; see the exact oracle test),
    # at the same (level, scale).  Decode correctness of the pair drop at
    # a REPRESENTATIVE hi scale is covered by
    # test_fused_pt_sum_double_rescale; a Delta-scale product double-
    # rescaled lands at scale ~1 by design, so no value check here.
    E = tiny_engine
    eng = E["eng"]
    sc = eng.slot_count
    rng = np.random.RandomState(17)
    x = rng.rand(sc) - 0.5
    y = rng.rand(sc) - 0.5
    a = eng.encrypt(x, E["pk"])
    b = eng.encrypt(y, E["pk"])
    fused = eng.multiply_pair(a, b, E["rlk"])
    seq = eng._rescale(eng.multiply(a, b, E["rlk"]))
    assert fused.level == seq.level
    assert abs(fused.scale - seq.scale) / seq.scale < 1e-12
    assert np.array_equal(np.asarray(fused.data), np.asarray(seq.data))
