#!/usr/bin/env python3
"""Same-code / cross-commit bench A/B via git worktrees — the STANDING
drift-adjudication protocol (r19 verdict task #5).

Round-over-round raw bench drift on this shared sandbox is frequently
ENVIRONMENTAL (co-tenant CPU/page-cache pressure), and r19 proved both
calibration gauges can lie in the same round (calib 1.05x up while
calib_mt 0.87x down under a 1.27x raw drift). The one honest
instrument is a back-to-back A/B of the two CODE STATES on the SAME
machine minutes apart: check out the previous round's snapshot commit
and HEAD in separate git worktrees, time the worst-moving queries in
both, interleaved. Code-state ratios within ~±10-15% while the
snapshot ratio is much larger = the drift is the machine, not the
code (r14/r15 and r18/r19 both adjudicated this way).

compare_bench.py prints the trigger: when the shared-query raw ratio
exceeds 1.15x (either direction), run this script and paste its table
into tools/bench_snapshots/cmp_r{N-1}_r{N}.txt.

Usage:
  bench_ab.py <old_ref> <new_ref> --queries q1,q2,...  [options]
  bench_ab.py <old_ref> <new_ref> --snapshots old.json new.json [options]

With --snapshots, the N biggest shared movers IN EITHER DIRECTION
(max of new/old and old/new — the protocol fires on improvements too)
are picked automatically. Options: --passes (default 4; min is reported),
--top (default 5, with --snapshots), --sfdir (default
/root/testdata/sf0.1), --full (time via -full materialization).

Worktrees land at /tmp/graft_ab_<ref> and are REUSED if present
(compile is the slow step); remove them with `git worktree remove`
when done. Each (ref, query) runs one fresh JVM (TimeQuery), old/new
interleaved per query so machine drift cannot masquerade as a code
delta.
"""
import argparse
import os
import re
import subprocess
import sys

JVM_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


def sh(cmd, **kw):
    print(f"+ {' '.join(cmd)}", file=sys.stderr)
    return subprocess.run(cmd, check=True, **kw)


_TOOLS_DIR = os.path.dirname(os.path.abspath(__file__))
if _TOOLS_DIR not in sys.path:
    sys.path.insert(0, _TOOLS_DIR)


def load_snapshot(path):
    """One bench-JSON-line extractor for the tools/ scripts: reuse
    compare_bench.load so a Bench stdout format change cannot break
    the auto-picker and the comparator out of step."""
    from compare_bench import load
    return load(path)


def worst_movers(old_path, new_path, top):
    """Biggest movers in EITHER direction (max(r, 1/r)): the drift
    protocol fires on improvements too (raw < 1/1.15x — r20's 0.80x
    was exactly that), and for a downward drift the queries worth
    adjudicating are the big improvers, which a slowdown-only sort
    would bury at the bottom."""
    oq = load_snapshot(old_path)["queries"]
    nq = load_snapshot(new_path)["queries"]
    # a 0-second timing in either snapshot is a broken measurement, not
    # a mover to skip silently — refuse to adjudicate around it (the
    # no-silent-caps discipline: an excluded query would escape A/B
    # adjudication with no notice)
    broken = sorted(q for q in oq if q in nq
                    and (oq[q] <= 0 or nq[q] <= 0))
    if broken:
        raise SystemExit(
            f"snapshot has non-positive timings for {', '.join(broken)}"
            " — fix the snapshot (re-bench) before adjudicating")
    shared = [q for q in oq if q in nq]
    ranked = sorted(shared, key=lambda q: -max(
        nq[q] / oq[q], oq[q] / nq[q]))
    return ranked[:top]


def prepare_worktree(repo, ref):
    # resolve the ref FIRST (check=True): a typo'd ref must fail here,
    # not masquerade as a stale-worktree complaint below. Peel to the
    # COMMIT (^{commit}): an annotated tag's rev-parse is the tag
    # object SHA, which would never equal the worktree's HEAD commit
    # and falsely reject a correct reused worktree.
    want = sh(["git", "-C", repo, "rev-parse", "--verify",
               f"{ref}^{{commit}}"],
              capture_output=True, text=True).stdout.strip()
    safe = re.sub(r"[^A-Za-z0-9_.-]", "_", ref)
    wt = f"/tmp/graft_ab_{safe}"
    if not os.path.isdir(wt):
        sh(["git", "-C", repo, "worktree", "add", "--detach", wt, ref])
    head = subprocess.run(["git", "-C", wt, "rev-parse", "HEAD"],
                          capture_output=True, text=True).stdout.strip()
    if head != want:
        raise SystemExit(
            f"{wt} exists but sits at {head[:9]}, not {ref} ({want[:9]})"
            f" — remove it (git worktree remove {wt}) and re-run")
    # always (re)compile: sbt is a no-op when up to date, while a
    # non-empty classes dir left by a compile that died midway would
    # otherwise be trusted and every TimeQuery run would die with
    # NoClassDefFoundError surfaced only as "produced no timings"
    sh(["sbt", "-batch", "compile"], cwd=wt)
    return wt


def time_query(wt, query, passes, sfdir, full):
    cp = f"{wt}/target/scala-2.13/classes:/opt/spark/jars/*"
    cmd = ["java", "-Xmx16g"]
    for p in JVM_OPENS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += ["-Dspark.ui.enabled=false",
            "-Dspark.sql.session.timeZone=UTC", "-cp", cp,
            "graft.tools.TimeQuery"]
    if full:
        cmd.append("-full")
    cmd += [query, str(passes)]
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sfdir)
    r = subprocess.run(cmd, capture_output=True, text=True, env=env)
    times = [float(m.group(1)) for m in re.finditer(
        r"pass \d+: ([0-9.]+) s", r.stdout)]
    if not times:
        print(r.stdout[-2000:], file=sys.stderr)
        print(r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"TimeQuery produced no timings for {query} "
                         f"in {wt} (rc={r.returncode})")
    # a JVM that died mid-run (OOM after pass 1) would otherwise
    # silently contribute a cold-only min — refuse to adjudicate on a
    # crashed measurement
    if r.returncode != 0 or len(times) < passes:
        print(r.stdout[-2000:], file=sys.stderr)
        print(r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(
            f"TimeQuery for {query} in {wt} completed only "
            f"{len(times)}/{passes} passes (rc={r.returncode}) — "
            f"partial timings are cold-biased; fix the crash and "
            f"re-run")
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old_ref")
    ap.add_argument("new_ref")
    ap.add_argument("--queries")
    ap.add_argument("--snapshots", nargs=2,
                    metavar=("OLD_JSON", "NEW_JSON"))
    ap.add_argument("--top", type=int, default=5)
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--sfdir", default="/root/testdata/sf0.1")
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--repo", default=".")
    a = ap.parse_args()

    if a.queries:
        queries = a.queries.split(",")
    elif a.snapshots:
        queries = worst_movers(a.snapshots[0], a.snapshots[1], a.top)
        print(f"worst {a.top} movers from snapshots: "
              f"{', '.join(queries)}")
    else:
        ap.error("need --queries or --snapshots")

    old_wt = prepare_worktree(a.repo, a.old_ref)
    new_wt = prepare_worktree(a.repo, a.new_ref)

    rows = []
    for q in queries:
        to = time_query(old_wt, q, a.passes, a.sfdir, a.full)
        tn = time_query(new_wt, q, a.passes, a.sfdir, a.full)
        rows.append((q, to, tn, tn / to))
        print(f"  {q}: old {to:.3f}s new {tn:.3f}s = {tn / to:.2f}x")

    print(f"\nworktree A/B ({a.old_ref} vs {a.new_ref}, "
          f"min-of-{a.passes}, sf={a.sfdir}"
          + (", -full" if a.full else "") + "):")
    print(f"  {'query':32s} {'old_s':>8s} {'new_s':>8s} {'ratio':>6s}")
    for q, to, tn, r in rows:
        print(f"  {q:32s} {to:8.3f} {tn:8.3f} {r:5.2f}x")
    so, sn = sum(r[1] for r in rows), sum(r[2] for r in rows)
    print(f"  {'TOTAL':32s} {so:8.3f} {sn:8.3f} {sn / so:5.2f}x")
    print("\nadjudication guide: code-state ratios within ~±10-15% "
          "(the same-code re-run noise bound measured in r19) while "
          "the snapshot ratio is much larger => the snapshot drift is "
          "ENVIRONMENTAL; a query whose A/B ratio REPRODUCES its "
          "snapshot ratio is a REAL code regression — paste this "
          "table into the round's cmp file either way.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
