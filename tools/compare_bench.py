#!/usr/bin/env python3
"""Compare two bench snapshots (raw `graft.Bench` stdout, e.g.
tools/bench_snapshots/r14_sf0.1.json) query by query.

Usage: compare_bench.py <old> <new> [topN=15]

Prints shared-query totals, the RAW ratio and the CALIB-NORMALIZED
ratio, and the largest regressions / improvements — the
round-over-round discipline the judge reads.

Calib normalization (r15 verdict task #4): both snapshots time the same
fixed calibration query 3x; dividing the raw shared-total ratio by the
calib ratio (median new / median old) separates machine-state drift
(GC, page cache, sandbox contention — which moves calib and queries
alike) from real plan changes (which move only their queries). A raw
drift that disappears under normalization is environmental; one that
survives is real. Per-query full-materialization times (the `full`
column for count()-elided queries, r15 verdict task #2) are compared
separately when both snapshots carry them.
"""
import json, re, sys

def median(xs):
    s = sorted(xs)
    return s[len(s) // 2]

def load(path):
    with open(path) as f:
        text = f.read()
    m = re.search(r'\{"metric".*\}', text)
    if not m:
        raise SystemExit(f"{path}: no bench JSON line found")
    return json.loads(m.group(0))

def main(old_path, new_path, top_n=15):
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    so = sum(oq[q] for q in shared)
    sn = sum(nq[q] for q in shared)
    print(f"old: {len(oq)} queries, calib {old.get('calib')}")
    print(f"new: {len(nq)} queries, calib {new.get('calib')}")
    raw = sn / so
    line = f"shared {len(shared)}: {so:.2f}s -> {sn:.2f}s = {raw:.3f}x raw"
    if old.get("calib") and new.get("calib"):
        cr = median(new["calib"]) / median(old["calib"])
        line += f", calib {cr:.3f}x, normalized {raw / cr:.3f}x"
    # calib_mt (r17): the all-cores gauge. Queries run 32-way, so a
    # co-tenant eating cores inflates them while the pinned
    # single-thread calib stays flat (the r16 snapshot's 1.32x "drift"
    # at calib 1.007x). When both snapshots carry calib_mt, ITS
    # normalization is the honest one.
    if old.get("calib_mt") and new.get("calib_mt"):
        cm = median(new["calib_mt"]) / median(old["calib_mt"])
        line += f", calib_mt {cm:.3f}x, mt-normalized {raw / cm:.3f}x"
    print(line)
    # STANDING drift protocol (r19 verdict task #5): beyond ~1.15x raw
    # drift the calib gauges are not trustworthy on their own (r19:
    # calib and calib_mt moved in OPPOSITE directions under a 1.27x
    # environmental drift) — the honest instrument is the git-worktree
    # same-machine A/B of the two code states, automated in
    # tools/bench_ab.py. Record its table in the round's cmp file.
    if raw > 1.15 or raw < 1 / 1.15:
        print(f"DRIFT PROTOCOL: raw {raw:.3f}x exceeds the 1.15x "
              f"adjudication threshold — run\n"
              f"  tools/bench_ab.py <old_snapshot_commit> HEAD "
              f"--snapshots {old_path} {new_path}\n"
              f"and paste the A/B table into the cmp file (code-state "
              f"ratios ~1x => drift is environmental).")
    for side, d in (("old", old), ("new", new)):
        if d.get("failed"):
            print(f"FAILED queries in {side}: {', '.join(d['failed'])}")
        if d.get("full_failed"):
            print(f"FULL-pass failures in {side}: "
                  + ", ".join(d["full_failed"]))
    if only_old:
        print(f"dropped ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        t = sum(nq[q] for q in only_new)
        print(f"added ({len(only_new)}, {t:.2f}s): "
              + ", ".join(f"{q}={nq[q]:.3f}" for q in sorted(
                  only_new, key=lambda q: -nq[q])))
    ratios = sorted(((nq[q] / oq[q], q) for q in shared if oq[q] > 0),
                    reverse=True)
    print(f"\nworst {top_n} regressions (new/old):")
    for r, q in ratios[:top_n]:
        print(f"  {q:32s} {oq[q]:7.3f} -> {nq[q]:7.3f}  {r:.2f}x")
    print(f"\nbest {top_n} improvements:")
    for r, q in ratios[-top_n:][::-1]:
        print(f"  {q:32s} {oq[q]:7.3f} -> {nq[q]:7.3f}  {r:.2f}x")
    of, nf = old.get("full") or {}, new.get("full") or {}
    if nf:
        fshared = sorted(set(of) & set(nf))
        print(f"\nfull-materialization column (count()-elided queries): "
              f"old {len(of)}, new {len(nf)}, shared {len(fshared)}")
        if fshared:
            fo, fn_ = sum(of[q] for q in fshared), sum(nf[q] for q in fshared)
            print(f"  shared full totals: {fo:.2f}s -> {fn_:.2f}s "
                  f"= {fn_ / fo:.3f}x")
            for q in sorted(fshared, key=lambda q: -(nf[q] / of[q])):
                print(f"  {q:32s} {of[q]:7.3f} -> {nf[q]:7.3f}  "
                      f"{nf[q] / of[q]:.2f}x")
        only = sorted(set(nf) - set(of))
        if only:
            print("  new-only full rows: "
                  + ", ".join(f"{q}={nf[q]:.3f}" for q in only))
    return 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  int(sys.argv[3]) if len(sys.argv) > 3 else 15))
