"""Probe the host's two bench covariates without running the suite.

Runs bench.py's own ``_calibrate`` (fixed-work matmul, ms) and
``_calibrate_io`` (32 MB write+fsync+read in the staging tempdir, ms) and
prints one line. Use it to decide whether a full ``python bench.py`` run
is worth the ~17 minutes:

- matmul <= 13  -> the clean-host parity window; run and pin BENCH_FULL.
- matmul ~36 AND io < 80 -> a better-than-record window is plausible
  (the 8.466/8.504 s record pair sat at calib ~37 / io ~74.6).
- anything else -> drifted host; a run only documents the bracket, and
  bench.py will OVERWRITE BENCH_FULL.json with the worse window
  (``git checkout -- BENCH_FULL.json`` restores the record).

Usage: python tools/probe_host.py [--watch SECONDS]
  --watch re-probes every SECONDS (default one-shot) until interrupted,
  printing a timestamped line per probe.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _calibrate, _calibrate_io  # noqa: E402


def probe_line() -> str:
    matmul = _calibrate()
    io = _calibrate_io()
    if matmul <= 13:
        verdict = "PARITY window — run bench.py and pin BENCH_FULL"
    elif matmul <= 40 and io < 80:
        verdict = "good window — a full run may beat the record"
    else:
        verdict = "drifted — skip the full run"
    return f"matmul={matmul}ms io_32mb={io}ms  [{verdict}]"


def main() -> None:
    interval = 0.0
    argv = sys.argv[1:]
    if argv and argv[0] == "--watch":
        interval = float(argv[1]) if len(argv) > 1 else 600.0
    while True:
        stamp = time.strftime("%H:%M:%S")
        print(f"{stamp}  {probe_line()}", flush=True)
        if not interval:
            break
        time.sleep(interval)


if __name__ == "__main__":
    main()
