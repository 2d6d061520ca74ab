"""Randomized MJPEG-in-AVI property sweep (r14): thousands of seeded
random streams through tests/test_multimodal.py::run_avi_property_seed
— random dims/levels (gray + 4:2:0 color), random stream layout
(audio-first numbering, rec grouping, dc/db chunk ids, dropped
frames), every decoded frame differentialed against the clean-room
JPEG codec run directly on the movi chunk bytes.

Pass ``--audio`` to run the AVI-AUDIO differential family instead
(run_avi_audio_property_seed: random PCM/float/G.711 formats and
chunkings vs an equivalent RIFF/WAVE through the standalone WAV
decoder / the shared G.711 tables).

Usage: python scripts/randomized_sweep_avi_mjpeg.py [--audio] [n_seeds] [base_seed]
Defaults: 2000 seeds from base 1000. Prints one summary line;
non-zero exit on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> None:
    from scripts._argv import parse_int_args
    argv = list(sys.argv[1:])
    family = "video"
    if "--audio" in argv:
        family = "audio"
        argv.remove("--audio")
    n, base = parse_int_args(__doc__, [("n_seeds", 2000),
                                       ("base_seed", 1000)],
                             argv=argv)
    from test_multimodal import (run_avi_audio_property_seed,
                                 run_avi_property_seed)
    runner = (run_avi_audio_property_seed if family == "audio"
              else run_avi_property_seed)
    t0 = time.time()
    failures = 0
    for seed in range(base, base + n):
        try:
            runner(seed)
        except AssertionError as exc:  # noqa: PERF203 - sweep loop
            failures += 1
            print(f"FAIL seed={seed}: {exc}", file=sys.stderr)
            if failures >= 5:
                break
    print(f"avi-mjpeg sweep [{family}]: seeds={base}..{base + n - 1} "
          f"failures={failures} elapsed={time.time() - t0:.1f}s")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
