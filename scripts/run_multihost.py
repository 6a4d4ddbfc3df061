"""Multi-host runner: every host process executes this same script; the
global mesh spans all of them (ICI within a slice, DCN across hosts).

    # host 0                                # host 1
    AESFHE_COORDINATOR=h0:9911 \
    AESFHE_NUM_PROCESSES=2 \
    AESFHE_PROCESS_ID=0 python scripts/run_multihost.py   # ...PROCESS_ID=1

On a managed TPU pod all three env vars may be omitted (auto-detected).
Runs the sharded 4-step NTT (parallel.dist_ntt) over the global mesh and
verifies it bit-exactly on every process; prints MULTIHOST OK on success.
The reference has no multi-device path at all
(/root/reference/engine_context.py:38: one device_id).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aesfhe_tpu.parallel import multihost


def main():
    multihost.init_multihost()
    import jax
    print(f"proc {jax.process_index()}/{jax.process_count()}: "
          f"{jax.local_device_count()} local / "
          f"{len(jax.devices())} global devices", flush=True)
    # failure detection (parallel/failure.py): per-process heartbeat files
    # plus a deadline watchdog around the collective step -- a hung psum
    # (peer died) aborts with exit 87 so the launcher restarts from
    # checkpoints instead of wedging the whole job forever
    from aesfhe_tpu.parallel.failure import Heartbeat, Watchdog
    hb_dir = os.environ.get("AESFHE_HEARTBEAT_DIR")
    hb = (Heartbeat(hb_dir, jax.process_index()).start()
          if hb_dir else None)
    wd = Watchdog(float(os.environ.get("AESFHE_STEP_TIMEOUT_S", "600")))
    try:
        with wd.step("multihost_ntt_check"):
            summary = multihost.multihost_ntt_check(
                profile=os.environ.get("AESFHE_MULTIHOST_PROFILE", "tiny"))
        if hb is not None:
            stale = hb.stale(max_age_s=30.0,
                             expect=range(jax.process_count()))
            summary["stale_processes"] = stale
        if jax.process_index() == 0:
            print(json.dumps(summary), flush=True)
        print("MULTIHOST OK", flush=True)
    finally:
        if hb is not None:
            hb.stop()


if __name__ == "__main__":
    main()
