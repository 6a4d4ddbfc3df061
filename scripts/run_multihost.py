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
    summary = multihost.multihost_ntt_check(
        profile=os.environ.get("AESFHE_MULTIHOST_PROFILE", "tiny"))
    if jax.process_index() == 0:
        print(json.dumps(summary), flush=True)
    print("MULTIHOST OK", flush=True)


if __name__ == "__main__":
    main()
