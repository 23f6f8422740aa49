#!/usr/bin/env python3
"""Generate tools/bench_quiet_reference.json from a full QUIET-WINDOW
bench run's output (the log with the verbose per-query lines, or a
bench_artifact.json whose canaries read quiet).

The reference feeds Bench's degraded-window detection and downshift
sizing (Bench.scala scaladoc #6): canary medians are the drift
yardstick, cold_total the uniform-slowness envelope, per-query medians
the weights for sizing the sensitive warm subset. Regenerate whenever
BASELINE.md re-baselines (a stale reference only mis-sizes the
downshift; detection thresholds are 2x, so small drift is harmless).

Usage: tools/make_quiet_ref.py [--force] <bench-log-or-artifact> [out.json]
Refuses when the run's own canaries read >2x max/med drifted — a
degraded run must never become the quiet yardstick. --force overrides
for runs whose MEDIANS are demonstrably quiet (isolated stall slots
inflate max/med while every med the reference uses is robust to them);
record the justification in BASELINE.md when you use it.
"""
import json
import re
import sys


def main():
    args = [a for a in sys.argv[1:] if a != "--force"]
    force = "--force" in sys.argv[1:]
    if not args:
        raise SystemExit(__doc__)
    out = args[1] if len(args) > 1 else "tools/bench_quiet_reference.json"
    text = open(args[0]).read()

    def canary(key):
        best = None
        for m in re.finditer('"%s":(\\{[^{}]*?\\})' % key, text):
            try:
                d = json.loads(m.group(1))
            except json.JSONDecodeError:
                continue
            if best is None or ("times" in d and "times" not in best):
                best = d
        if not best or not best.get("med"):
            raise SystemExit(f"no {key} med found in {args[0]}")
        drift = best.get("max", 0.0) / best["med"]
        if drift > 2.0 and not force:
            raise SystemExit(
                f"{key} drift {drift:.2f}x > 2x — this run is NOT a quiet "
                "window; refuse to bake it into the reference "
                "(--force if the medians are verifiably quiet)")
        return best["med"]

    cold = None
    for m in re.finditer(r'"cold_total_sec":([0-9.]+)', text):
        cold = float(m.group(1))
    if cold is None:
        raise SystemExit("no cold_total_sec found")

    sf = None
    for m in re.finditer(r'"sf":"([^"]*)"', text):
        sf = m.group(1).rstrip("/").split("/")[-1]
    if not sf:
        raise SystemExit("no sf found")

    # cold-phase canary pairs (r17+ artifacts): detection compares
    # same-phase to same-phase because cold pairs carry JIT tax
    cold_pairs = None
    for m in re.finditer(r'"canary_cold":(\[(?:[^\[\]])*\])', text):
        try:
            cold_pairs = json.loads(m.group(1))
        except json.JSONDecodeError:
            continue

    def med(xs):
        xs = sorted(xs)
        n = len(xs)
        return (xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2)

    meds = {}
    for m in re.finditer(
            r'\{"q":"([A-Za-z0-9_]+)","min":[0-9.-]+,"med":([0-9.-]+)', text):
        v = float(m.group(2))
        if v >= 0:
            meds[m.group(1)] = v
    if len(meds) < 100:
        raise SystemExit(f"only {len(meds)} per-query medians found — "
                         "need the verbose lines of a full run")

    # per-query COLD times (short-id dict from the artifact): the
    # query-shaped detector — the r16 driver window taxed queries 4.5x
    # while its scan canary MEDIANS read near-quiet, so canaries alone
    # can miss the class; a running median of coldTime/quietCold over
    # the queries themselves cannot
    colds = {}
    for m in re.finditer(r'"cold":\{([^{}]*)\}', text):
        pairs = dict(re.findall(
            r'"([A-Za-z][A-Za-z0-9]*)":([0-9.]+)', m.group(1)))
        if len(pairs) > len(colds):
            colds = pairs

    ref = {
        "cold_queries": {k: float(v) for k, v in sorted(colds.items())},
        "sf": sf,
        "canary_scan": round(canary("canary"), 3),
        "canary_iter": round(canary("canary_iter"), 3),
        "cold_total": round(cold, 1),
        "queries": [{"q": k, "med": round(v, 3)}
                    for k, v in sorted(meds.items())],
    }
    if cold_pairs:
        # the raw ordinal sequence is what Bench's detection compares
        # against (pair k vs quiet pair k — the JIT-decay profile);
        # the meds are kept for human reading only
        ref["canary_cold_pairs"] = [
            {"scan": round(p["scan"], 3), "iter": round(p["iter"], 3)}
            for p in cold_pairs]
        ref["canary_cold_scan"] = round(med([p["scan"] for p in cold_pairs]), 3)
        ref["canary_cold_iter"] = round(med([p["iter"] for p in cold_pairs]), 3)
    with open(out, "w") as f:
        json.dump(ref, f, separators=(",", ":"))
        f.write("\n")
    print(f"wrote {out}: canary {ref['canary_scan']}/{ref['canary_iter']}, "
          f"cold {ref['cold_total']}, {len(meds)} query meds")


if __name__ == "__main__":
    main()
