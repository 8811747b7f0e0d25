#!/usr/bin/env python3
"""Driver benchmark entry point: prints ONE JSON line.

{"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
"""

import json
import sys


def main() -> int:
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from ptx.bench import run_bench

    result = run_bench()
    print(
        json.dumps(
            {
                "metric": result["metric"],
                "value": result["value"],
                "unit": result["unit"],
                "vs_baseline": result["vs_baseline"],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
