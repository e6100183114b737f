"""Run several bench.py configurations inside ONE process/session: the
transport mode-flip (minutes on the axon link) and the jax runtime are paid
once, and each config's JSON line is written to its own file.

Usage:
  python scripts/bench_batch.py --out /tmp/prefix \
      "h128=--n 128 --reps 30" "h512x=--n 512" ...

Writes /tmp/prefix.<name>.json (stdout JSON line) per config; stderr logging
is shared (this script's stderr).
"""

import contextlib
import io
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    argv = sys.argv[1:]
    assert argv and argv[0] == "--out", "first args must be --out <prefix>"
    prefix = argv[1]
    configs = []
    for spec in argv[2:]:
        name, _, rest = spec.partition("=")
        configs.append((name, rest.split()))

    import bench

    for name, cargs in configs:
        print(f"===== {name}: {' '.join(cargs)}", file=sys.stderr, flush=True)
        sys.argv = ["bench.py"] + cargs
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                bench.main()
        except SystemExit:
            pass
        except Exception as e:
            print(f"{name} FAILED: {e!r}", file=sys.stderr, flush=True)
            continue
        out = buf.getvalue()
        with open(f"{prefix}.{name}.json", "w") as f:
            f.write(out)
        print(f"===== {name} done: {out.strip()[:200]}", file=sys.stderr,
              flush=True)


if __name__ == "__main__":
    main()
