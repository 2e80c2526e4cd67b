#!/usr/bin/env python3
"""Mechanical two-run bench adjudication (BASELINE.md steps 2 + 6).

Usage:
  python3 scripts/bench_compare.py PRIOR.json RUN_A.json RUN_B.json \
      [--threshold 1.3]

PRIOR is the previous round's committed full artifact (the bar);
RUN_A / RUN_B are the current round's two committed canonical runs.
A row BREACHES only if its min exceeds threshold x prior-min in BOTH
current runs; a single-run exceedance is ambient spread, already
cleared by the two-run rule. Output is the markdown adjudication
table SCALE.md records per round, led by the `_canary_host`
calibration row so host-condition skew (the step-5 "everything moved
together" signature) is readable before any per-row verdict.
"""
import argparse
import json
import signal
import sys

signal.signal(signal.SIGPIPE, signal.SIG_DFL)  # clean exit under `| head`


def load_queries(path):
    with open(path) as f:
        d = json.loads(f.read().strip())
    return (d.get("queries", {}), d.get("failed_queries", []),
            d.get("tables", {}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prior")
    ap.add_argument("run_a")
    ap.add_argument("run_b")
    ap.add_argument("--threshold", type=float, default=1.3)
    args = ap.parse_args()

    prior, prior_failed, tab_p = load_queries(args.prior)
    run_a, failed_a, tab_a = load_queries(args.run_a)
    run_b, failed_b, tab_b = load_queries(args.run_b)
    thr = args.threshold

    # Calibration rows lead every artifact: _canary_host (pure-CPU
    # codegen — co-tenant CPU load) and _canary_io (fixed shuffle +
    # parquet round-trip — memory-bandwidth/disk contention, the
    # channel round 14's +25% skew used while the CPU leg read quiet).
    # Any `_`-prefixed row is calibration: excluded from per-row
    # adjudication, printed up front.
    canaries = sorted(k for k in (set(run_a) | set(run_b) | set(prior))
                      if k.startswith("_"))
    print(f"## Bench adjudication — threshold {thr}x, two-run rule\n")
    print(f"prior: `{args.prior}`  run A: `{args.run_a}`  "
          f"run B: `{args.run_b}`\n")

    # --- host-noise calibration first -------------------------------
    skewed = False
    for canary in canaries:
        if canary in prior and canary in run_a and canary in run_b:
            ca = run_a[canary] / prior[canary]
            cb = run_b[canary] / prior[canary]
            print(f"Canary `{canary}`: prior {prior[canary]:.3f} s -> "
                  f"A {run_a[canary]:.3f} ({ca:.2f}x), "
                  f"B {run_b[canary]:.3f} ({cb:.2f}x).")
            skewed = skewed or max(ca, cb) > 1.15
        elif canary in run_a and canary in run_b:
            print(f"Canary `{canary}` (no prior reading): "
                  f"A {run_a[canary]:.3f} s, "
                  f"B {run_b[canary]:.3f} s — anchor for next round.")
    if skewed:
        print("**Host-condition skew detected** — calibration rows are "
              "data-independent, so a moved canary means the box, "
              "not the plans; read per-row ratios against it.")
    if canaries:
        print()

    # --- data identity (round 15): fingerprints separate "the box
    # changed" from "the testdata regenerated" without a cross-code
    # control experiment. Same bytes -> ratios are host/plan; moved
    # fingerprints -> the bar itself moved, re-baseline.
    # Round-16 format adds a third element (sum-mod-2^64) per table;
    # compare the common prefix so a 2-element pre-round-16 artifact
    # still pairs with a 3-element one on count+xor.
    def fp_diff(t1, t2):
        def common(v1, v2):
            n = min(len(v1), len(v2))
            return tuple(v1[:n]) == tuple(v2[:n])
        return sorted(k for k in set(t1) | set(t2)
                      if k not in t1 or k not in t2
                      or not common(t1[k], t2[k]))

    if tab_a and tab_b:
        diff = fp_diff(tab_a, tab_b)
        if diff:
            # exit immediately: adjudicating ratios between runs that
            # read different bytes produces meaningless breach/improve
            # verdicts someone might act on (round-15 advice)
            print("**Run A and run B read DIFFERENT data** ("
                  + ", ".join(diff) + ") — the pair is not a pair; "
                  "re-run on one dataset. No adjudication.\n")
            sys.exit(2)
        elif not tab_p:
            print("Data: run pair fingerprints match each other; prior "
                  "has no fingerprint (pre-round-15 artifact) — "
                  "data identity vs prior UNKNOWN, prefer the "
                  "cross-code control if ratios look uniform.\n")
        elif not fp_diff(tab_p, tab_a):
            print("Data: IDENTICAL to prior (all "
                  f"{len(tab_a)} table fingerprints match) — read "
                  "ratios as host/plan.\n")
        else:
            print("**Data CHANGED vs prior** ("
                  + ", ".join(fp_diff(tab_p, tab_a))
                  + ") — per-row bars moved with the data; "
                  "re-baseline rather than chase breaches.\n")

    common = sorted(set(prior) & set(run_a) & set(run_b)
                    - set(canaries))
    rows = []
    for q in common:
        p = prior[q]
        if p <= 0:
            continue
        ra, rb = run_a[q] / p, run_b[q] / p
        if ra > thr and rb > thr:
            verdict = "BREACH"
        elif ra > thr or rb > thr:
            verdict = "ambient"
        elif max(ra, rb) < 1 / thr:
            verdict = "improved"
        else:
            verdict = "ok"
        rows.append((q, p, run_a[q], run_b[q], ra, rb, verdict))

    breaches = [r for r in rows if r[6] == "BREACH"]
    ambient = [r for r in rows if r[6] == "ambient"]
    improved = [r for r in rows if r[6] == "improved"]
    movers = sorted(
        (r for r in rows if r[6] != "ok"), key=lambda r: -max(r[4], r[5]))

    new_rows = sorted(
        (set(run_a) & set(run_b)) - set(prior) - set(canaries))
    gone_rows = sorted(
        set(prior) - set(run_a) - set(run_b) - set(canaries))
    failed = sorted(set(failed_a) | set(failed_b))

    print(f"{len(common)} common rows: **{len(breaches)} breach**, "
          f"{len(ambient)} ambient (one-run-only), "
          f"{len(improved)} improved, "
          f"{len(common) - len(movers)} flat. "
          f"{len(new_rows)} new, {len(gone_rows)} removed, "
          f"{len(failed)} failed.\n")

    if movers:
        print("| query | prior | run A | run B | A/prior | B/prior "
              "| verdict |")
        print("|---|---|---|---|---|---|---|")
        for q, p, a, b, ra, rb, v in movers:
            print(f"| {q} | {p:.3f} | {a:.3f} | {b:.3f} | {ra:.2f}x "
                  f"| {rb:.2f}x | {v} |")
        print()
    if new_rows:
        print("New rows (no prior bar): " + ", ".join(new_rows) + "\n")
    if gone_rows:
        print("Removed rows: " + ", ".join(gone_rows) + "\n")
    if failed:
        print("FAILED rows (zero completed attempts): "
              + ", ".join(failed) + "\n")
    sys.exit(1 if breaches or failed else 0)


if __name__ == "__main__":
    main()
