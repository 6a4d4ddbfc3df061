"""Bootstrap / noise forensics driver: one entry point for the measured
debugging harnesses behind PERF.md's and DESIGN_NOTES' numbers.

Each subcommand is a standalone harness in scripts/forensics/ (they grew as
one-offs during the round-3 full-ring bootstrap war; consolidated per the
round-3 review).  The measured conclusions live in PERF.md ("Round 3:
full-ring bootstrap forensics") and DESIGN_NOTES #15/#18/#20-23 -- run these
only to REPRODUCE or extend those measurements.

Usage:
  python scripts/boot_forensics.py <subcommand> [args...]
  python scripts/boot_forensics.py --list

Subcommands map 1:1 onto scripts/forensics/<name>.py:
  q0            EvalMod residual vs q0/Delta ratio ladder + cleanse ladder
  acc           Chebyshev degree / double-angle accuracy scan (boot_tiny)
  scale         scale-tier scan at prod_boot knobs on a small ring
  stages        per-stage CTS/EvalMod/STC error vs host-ideal transforms
  sub           SubBytes-after-bootstrap magnitude/scale diagnostics
  rounds        3 bootstrapped zeta rounds, per-round error (boot_tiny)
  noise_src     multiply_plain vs hoisted-rotation noise split
  moddown_noise fused mod-down vs exact centered-lift oracle
  evalmod       EvalMod-only synthetic-input harness
  round_noise   zeta one-round per-stage noise margins (deep profile)
  shiftmix_level merged shift-mix level/depth ledger
  zeta_seg      segment-refreshed zeta pipeline per-stage errors (round 4)
"""
import runpy
import sys
from pathlib import Path

_DIR = Path(__file__).resolve().parent / "forensics"
_ALIASES = {name.removeprefix("boot_"): name
            for name in (p.stem for p in _DIR.glob("*.py"))}
_ALIASES.update({p.stem: p.stem for p in _DIR.glob("*.py")})


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("--list", "-l", "--help", "-h"):
        print(__doc__)
        print("available:", ", ".join(sorted({p.stem for p in
                                              _DIR.glob('*.py')})))
        return 0
    cmd = sys.argv[1]
    name = _ALIASES.get(cmd)
    if name is None:
        print(f"unknown subcommand {cmd!r}; try --list", file=sys.stderr)
        return 2
    # the harness sees its own argv (they parse positionals/env themselves)
    sys.argv = [str(_DIR / f"{name}.py")] + sys.argv[2:]
    runpy.run_path(sys.argv[0], run_name="__main__")
    return 0


if __name__ == "__main__":
    sys.exit(main())
