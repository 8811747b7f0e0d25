#!/usr/bin/env python3
"""Driver benchmark entry point: prints JSON lines on stdout.

The headline line ``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``
is printed and flushed the moment it is measured; every completed extra
sub-bench re-prints the full (headline + extras-so-far) object as a fresh
line.  Whether the driver keeps the first or the last parseable line, it
always gets a complete, honest result — round 3's rc-124 timeout captured
nothing because the single line only printed after every extra finished.

A watchdog *thread* (not SIGALRM: a wedged tunnel compile blocks the main
thread inside C and signal handlers would never run) hard-exits the process
after ``PTX_BENCH_WATCHDOG_S`` once the headline has been emitted, so a hung
sub-bench can never swallow the result.
"""

import json
import os
import sys
import threading
import time

WATCHDOG_S = float(os.environ.get("PTX_BENCH_WATCHDOG_S", "500"))
# If the headline itself hasn't landed at the watchdog, keep waiting in
# grace increments up to this hard limit before giving up (exit 1).
HARD_S = float(os.environ.get("PTX_BENCH_HARD_S", "570"))

_emitted = threading.Event()
_t0 = time.monotonic()


def _ordered(result: dict) -> dict:
    out = dict(result)
    return {
        "metric": out.pop("metric"),
        "value": out.pop("value"),
        "unit": out.pop("unit"),
        "vs_baseline": out.pop("vs_baseline"),
        **out,
    }


def _emit(result: dict) -> None:
    print(json.dumps(_ordered(result)), flush=True)
    _emitted.set()


def _watchdog() -> None:
    while True:
        now = time.monotonic() - _t0
        if _emitted.is_set() and now >= WATCHDOG_S:
            # Headline (and any finished extras) already on stdout.
            print(f"[bench] watchdog: exiting at {now:.0f}s", file=sys.stderr)
            sys.stderr.flush()
            os._exit(0)
        if now >= HARD_S:
            print(f"[bench] watchdog: no headline by {now:.0f}s, giving up",
                  file=sys.stderr)
            sys.stderr.flush()
            os._exit(1)
        time.sleep(min(5.0, max(WATCHDOG_S - now, 1.0)))


def main() -> int:
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    # Persistent compile cache: first-compiles through the TPU tunnel run
    # 20-40 s each; repeat driver/bench invocations hit the disk cache.
    from ptx.utils import enable_compile_cache

    enable_compile_cache(jax)

    from ptx.bench import run_bench

    # Leave the watchdog a margin: extras stop *starting* before it fires.
    deadline = _t0 + WATCHDOG_S - 20.0
    run_bench(emit=_emit, deadline=deadline)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
