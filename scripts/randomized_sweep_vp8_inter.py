"""Randomized VP8 inter-frame property sweep (r12): mixed-mode
full-pel frames (zero/new/nearest/near/split/intra) whose decoded
pixels must equal independent numpy-shift expectations built from the
encoder's resolved motion — the standing large-N companion of
tests/test_vp8_inter.py::test_randomized_fullpel_inter_property_sweep.
Each seed exercises a random neighbor configuration of the §16.3
candidate survey, sub-MV contexts and partition fills; any
encoder/decoder disagreement desynchronizes the §7 arithmetic and
fails loudly.

Usage: python scripts/randomized_sweep_vp8_inter.py [n_seeds] [base]
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


def run(n_seeds: int, base: int) -> int:
    from test_vp8_inter import (_keyframe_and_planes,
                                run_fullpel_property_seed)
    from test_webp_config_sweep import _libwebp
    if _libwebp() is None:  # pragma: no cover
        print("vp8-inter sweep: SKIP (libwebp unavailable)")
        return 0
    payload, seq, kf = _keyframe_and_planes(w=48, h=32)
    t0 = time.time()
    failures = 0
    for seed in range(base, base + n_seeds):
        try:
            run_fullpel_property_seed(seed, seq, payload, kf)
        except AssertionError as exc:  # noqa: PERF203 - sweep loop
            failures += 1
            print(f"FAIL seed={seed}: {exc}", file=sys.stderr)
    dt = time.time() - t0
    print(f"vp8-inter sweep: seeds={base}..{base + n_seeds - 1} "
          f"failures={failures} elapsed={dt:.1f}s")
    return 1 if failures else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    sys.exit(run(n, b))
