"""Randomized VP8 inter-frame property sweeps — the standing large-N
companions of tests/test_vp8_inter.py's property tests. Two families:

- full-pel (default): mixed-mode frames (zero/new/nearest/near/split/
  intra) whose MVs are multiples of 16 eighth-pels; decoded pixels
  must equal independent numpy-shift expectations built from the
  encoder's resolved motion
  (run_fullpel_property_seed).
- --subpel (r13): QUARTER-pel MVs (RFC 6386 §14.2 — where real
  encoder streams spend most MBs) with random residuals, random
  per-segment quantizers and random LF-delta state; every luma and
  chroma 4x4 is checked against the independent per-pixel six-tap
  reimplementation (run_subpel_property_seed).
- --bilinear (r13): the same randomized space on VERSION-1 frames
  (bilinear reconstruction filter), expectations via the independent
  two-tap reimplementation (run_bilinear_property_seed).

Each seed exercises a random neighbor configuration of the §16.3
candidate survey, sub-MV contexts and partition fills; any
encoder/decoder disagreement desynchronizes the §7 arithmetic and
fails loudly.

Usage: python scripts/randomized_sweep_vp8_inter.py
           [--subpel | --bilinear] [n_seeds] [base]
Defaults: 500 seeds from base 1000. One summary line; non-zero exit
on any failure. Requires libwebp (the initial key frame is a real
encode) — exits 0 with a SKIP line when absent.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def run(n_seeds: int, base: int, family: str) -> int:
    from test_vp8_inter import (_keyframe_and_planes,
                                run_bilinear_property_seed,
                                run_fullpel_property_seed,
                                run_subpel_property_seed)
    from test_webp_config_sweep import _libwebp
    if _libwebp() is None:  # pragma: no cover
        print("vp8-inter sweep: SKIP (libwebp unavailable)")
        return 0
    payload, seq, kf = _keyframe_and_planes(w=48, h=32)
    runner = {"subpel": run_subpel_property_seed,
              "bilinear": run_bilinear_property_seed,
              "fullpel": run_fullpel_property_seed}[family]
    fam = family
    t0 = time.time()
    failures = 0
    for seed in range(base, base + n_seeds):
        try:
            runner(seed, seq, payload, kf)
        except AssertionError as exc:  # noqa: PERF203 - sweep loop
            failures += 1
            print(f"FAIL family={fam} seed={seed}: {exc}",
                  file=sys.stderr)
    dt = time.time() - t0
    print(f"vp8-inter sweep [{fam}]: seeds={base}.."
          f"{base + n_seeds - 1} failures={failures} "
          f"elapsed={dt:.1f}s")
    return 1 if failures else 0


if __name__ == "__main__":
    from scripts._argv import parse_int_args
    argv = list(sys.argv[1:])
    family = "fullpel"
    for flag, name in (("--subpel", "subpel"),
                       ("--bilinear", "bilinear")):
        if flag in argv:
            family = name
            argv.remove(flag)
    n, b = parse_int_args(__doc__, [("n_seeds", 500),
                                    ("base_seed", 1000)], argv=argv)
    sys.exit(run(n, b, family))
