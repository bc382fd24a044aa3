"""parse a jax.profiler Chrome trace for per-step device op costs.

Usage:
    # capture (see detect_to_track_tpu.config.Config.PROFILE_DIR or
    # jax.profiler.trace(...) around a few steps), then:
    python tools/parse_trace.py /path/to/tracedir [n_steps]

Works through the axon tunnel (device events are recorded remotely and land
in vm.trace.json.gz).
"""

import collections
import glob
import gzip
import json
import sys


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    paths = sorted(glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        sys.exit(f"no trace under {root}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)

    events = data["traceEvents"]
    names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e and "TPU" in names.get(e.get("pid"), ""):
            dur[e["name"]] += e["dur"]
            cnt[e["name"]] += 1

    print(f"{'ms/step':>10}  {'count':>6}  op")
    for name, d in dur.most_common(40):
        print(f"{d / n_steps / 1e3:10.2f}  {cnt[name] // n_steps:6d}  {name[:100]}")


if __name__ == "__main__":
    main()
