"""Failure detection / elastic recovery (SURVEY.md section 5; the reference
has none of this -- keys regenerated and state lost every run).

Covers: heartbeat staleness detection, watchdog deadline firing (with fault
injection via a deliberately slow step), and elastic restart resuming from
the pipeline's per-round checkpoints after an injected mid-run crash."""
import time

import numpy as np
import pytest

from aesfhe_tpu.parallel.failure import Heartbeat, Watchdog, run_elastic


def test_heartbeat_staleness(tmp_path):
    hb0 = Heartbeat(tmp_path, 0, interval_s=0.05).start()
    hb1 = Heartbeat(tmp_path, 1, interval_s=0.05).start()
    try:
        time.sleep(0.2)
        assert hb0.stale(max_age_s=1.0, expect=[0, 1]) == []
        # kill proc 1's beater: it must go stale while proc 0 stays live
        hb1.stop()
        time.sleep(0.5)
        assert hb0.stale(max_age_s=0.3, expect=[0, 1]) == [1]
        # a never-started peer is reported missing
        assert 2 in hb0.stale(max_age_s=0.3, expect=[0, 1, 2])
    finally:
        hb0.stop()
        hb1.stop()


def test_watchdog_fires_on_wedged_step():
    fired = []
    wd = Watchdog(0.1, on_timeout=fired.append)
    with wd.step("hung-collective"):
        time.sleep(0.4)                  # injected wedge
    assert fired == ["hung-collective"]
    assert wd.fired == "hung-collective"
    # a fast step must NOT fire
    fired2 = []
    wd2 = Watchdog(5.0, on_timeout=fired2.append)
    with wd2.step("ok"):
        pass
    assert fired2 == []


def test_run_elastic_retries_then_succeeds():
    calls = []

    def step(attempt):
        calls.append(attempt)
        if attempt < 2:
            raise RuntimeError("injected fault")
        return "done"

    assert run_elastic(step, max_restarts=3) == "done"
    assert calls == [0, 1, 2]
    with pytest.raises(RuntimeError, match="failed after 2 attempts"):
        run_elastic(lambda a: (_ for _ in ()).throw(ValueError("x")),
                    max_restarts=1)


def test_elastic_resume_from_round_checkpoint(tmp_path, deep_engine):
    """Injected crash after round 1 + elastic restart: the second attempt
    must RESUME from the checkpoint (round 2 onward), not recompute round 1,
    and the final state must match an uninterrupted 2-round run."""
    from tests.test_tracer_safety import _CtxShim
    from aesfhe_tpu.ops.xor_service import EngineWrapper
    from aesfhe_tpu.pipeline import AESFHE128Bitsliced

    wrap = EngineWrapper(ctx=_CtxShim(deep_engine))
    key = bytes(range(16))
    sc = wrap.engine.slot_count
    rng = np.random.default_rng(0)
    state = rng.integers(0, 256, sc, dtype=np.uint8)

    rounds_run = []

    class _Crashing(AESFHE128Bitsliced):
        def _save_checkpoint(self, d, r, st):
            super()._save_checkpoint(d, r, st)
            rounds_run.append(r)
            if r == 1 and len([x for x in rounds_run if x == 1]) == 1:
                raise RuntimeError("injected crash after round 1")

    aes = _Crashing(wrap, key)
    st0 = aes.encrypt_state(state)
    ckpt = tmp_path / "ckpt"

    out = run_elastic(
        lambda attempt: aes.encrypt_rounds(st0, rounds=2,
                                           checkpoint_dir=str(ckpt)),
        max_restarts=1)
    # round 1 executed once (resumed, not recomputed); round 2 completed
    assert rounds_run == [1, 2]
    want = AESFHE128Bitsliced(wrap, key).encrypt_rounds(st0, rounds=2)
    for a, b in zip(out.bits, want.bits):
        assert np.array_equal(np.asarray(a.data), np.asarray(b.data))
