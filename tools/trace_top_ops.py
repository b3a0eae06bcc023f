"""Parse a jax.profiler trace (xplane.pb) and print device-side op timings.

Usage:
    python tools/trace_top_ops.py /tmp/trace_dir [--top 30]

Pairs with `tools/profile_step.py --trace DIR` (or any perf.trace capture):
sums self-time per op name on the TPU device planes so kernel-level hot
spots are measured, not guessed. Works offline via jax.profiler.ProfileData
— no tensorboard UI needed.
"""

import argparse
import collections
import glob
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    from jax.profiler import ProfileData

    paths = sorted(glob.glob(os.path.join(
        args.trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no .xplane.pb under {args.trace_dir}")
    pd = ProfileData.from_file(paths[-1])

    for plane in pd.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        totals = collections.defaultdict(float)
        counts = collections.defaultdict(int)
        total = 0.0
        for line in plane.lines:
            if "XLA Ops" not in line.name and "Steps" not in line.name \
                    and "XLA Modules" not in line.name:
                # op-level lines differ by runtime; accept op-ish lines only
                pass
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                name = ev.name
                if line.name.startswith("XLA Ops") or "Ops" in line.name:
                    totals[name] += dur
                    counts[name] += 1
                    total += dur
        if not totals:
            continue
        print(f"\n=== plane: {plane.name} (op time {total:.2f} ms) ===")
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[: args.top]:
            print(f"  {ms:9.3f} ms  x{counts[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
