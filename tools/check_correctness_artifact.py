#!/usr/bin/env python3
"""Guard the driver-side correctness artifact (r17 verdict task #5).

`CORRECTNESS_r{N}.json` — the driver's per-query gate output — shipped
as a literal `{}` in r15 and again in r17 while the queries themselves
were green, so the round's nominal hard signal silently carried zero
rows. The repo-side mechanism is not observable from here (the file is
written by the driver after the builder's turns end; both empty
artifacts coincided with rounds whose Verify output was healthy and
whose committed fallback snapshot says "N/N queries match", so the
failure is in the driver's oracle-compare step or its JSON dump, not
in `graft.Verify`). What the repo CAN do is make the discrepancy loud:

  * fail when the artifact is missing, unparseable, or EMPTY;
  * fail when it disagrees with the committed fallback snapshot
    `tools/correctness_snapshots/r{N}_sf0.01.txt` (per-query OK/FAIL
    lines from tools/check_oracle.py) — fewer queries, a query the
    snapshot saw green reported failing, or vice versa.

Round 19 (r18 verdict task #2) distinguishes TWO failure classes in
artifact rows: a hash/row/schema MISMATCH (the query is wrong — always
fatal) vs an ORACLE-INFRA flake — the row's `err` carries a DuckDB
infrastructure signature (OutOfMemory / allocation failure / thread
creation / EAGAIN — the class tools/check_oracle.py documents: the
driver's compare step races a dying Spark JVM for memory). An infra
flake is NOT evidence the query is wrong, but it is not evidence it is
right either: the guard demands a LOCAL RE-RUN verdict, recorded in
`tools/correctness_snapshots/r{N}_adjudications.txt` as lines

    FLAKE <query> re-run OK <free-form note>

(committed with the round). A flaky row with a matching re-run-OK
adjudication line passes the guard with an ADJUDICATED note; without
one it fails with instructions, never conflated with a mismatch.

Run standalone (`tools/check_correctness_artifact.py 18`) or as the
last step of the round's snapshot discipline. Exit 0 = artifact sound.
"""
import json
import os
import re
import sys

# the oracle-infra failure signatures check_oracle.py:19-24 documents —
# DuckDB resource errors, not wrong answers
INFRA_RE = re.compile(
    r"OutOfMemory|Out of Memory|Failed to allocate|bad allocation|"
    r"cannot allocate|could not allocate|Resource temporarily "
    r"unavailable|EAGAIN|unable to create.*thread|pthread_create",
    re.IGNORECASE)


def parse_snapshot(path):
    """OK/FAIL lines -> {query: bool}."""
    res = {}
    with open(path) as f:
        for line in f:
            m = re.match(r"(OK|FAIL)\s+(\S+)", line.strip())
            if m:
                res[m.group(2).rstrip(":")] = m.group(1) == "OK"
    return res


def parse_adjudications(path):
    """`FLAKE <query> re-run OK ...` lines -> {query} (re-run green)."""
    ok = set()
    if not os.path.exists(path):
        return ok
    with open(path) as f:
        for line in f:
            m = re.match(r"FLAKE\s+(\S+)\s+re-run\s+OK\b", line.strip())
            if m:
                ok.add(m.group(1))
    return ok


def main(round_n, repo="."):
    art_path = os.path.join(repo, f"CORRECTNESS_r{round_n}.json")
    snap_path = os.path.join(
        repo, "tools", "correctness_snapshots", f"r{round_n}_sf0.01.txt")
    errs = []

    art = None
    if not os.path.exists(art_path):
        errs.append(f"{art_path} does not exist")
    else:
        raw = open(art_path).read().strip()
        try:
            art = json.loads(raw)
        except json.JSONDecodeError as e:
            errs.append(f"{art_path} is not valid JSON: {e}")
        if art is not None and not art:
            errs.append(
                f"{art_path} is EMPTY ({raw!r}) — the r15/r17 failure "
                "mode: the driver gate ran but recorded nothing")

    snap = None
    if not os.path.exists(snap_path):
        errs.append(f"fallback snapshot {snap_path} missing — commit "
                    "check_oracle.py stdout there (round discipline)")
    else:
        snap = parse_snapshot(snap_path)
        if not snap:
            errs.append(f"{snap_path} holds no OK/FAIL lines")

    adjudicated = []
    if art and snap:
        art_ok = {q: bool(v.get("rows_match")) and
                  bool(v.get("schema_match")) and
                  bool(v.get("hash_match"))
                  for q, v in art.items() if isinstance(v, dict)}
        # rows whose failure is an oracle-INFRA error, not a mismatch
        infra = {q for q, v in art.items() if isinstance(v, dict)
                 and not art_ok.get(q)
                 and v.get("err") and INFRA_RE.search(str(v["err"]))}
        rerun_ok = parse_adjudications(os.path.join(
            repo, "tools", "correctness_snapshots",
            f"r{round_n}_adjudications.txt"))
        missing = sorted(set(snap) - set(art_ok))
        extra = sorted(set(art_ok) - set(snap))
        if missing:
            errs.append(f"artifact missing {len(missing)} snapshot "
                        f"queries, e.g. {missing[:5]}")
        if extra:
            errs.append(f"artifact has {len(extra)} queries the "
                        f"snapshot lacks, e.g. {extra[:5]}")
        for q in sorted(set(snap) & set(art_ok)):
            if snap[q] == art_ok[q]:
                continue
            if q in infra and q in rerun_ok:
                adjudicated.append(q)
            elif q in infra:
                errs.append(
                    f"{q}: oracle-infra flake (err matches the DuckDB "
                    f"resource-error class) — local re-run REQUIRED: "
                    f"run graft.Verify + tools/check_oracle.py for it, "
                    f"then record 'FLAKE {q} re-run OK <note>' in "
                    f"tools/correctness_snapshots/"
                    f"r{round_n}_adjudications.txt")
            else:
                errs.append(
                    f"{q}: artifact and snapshot DISAGREE and the "
                    f"artifact error is not an infra signature — a "
                    f"real mismatch, not adjudicable")

    if errs:
        for e in errs:
            print(f"ARTIFACT-GUARD FAIL: {e}")
        return 1
    n = len(art)
    adj = (f"; {len(adjudicated)} oracle-infra flake(s) adjudicated "
           f"green by committed re-run: {adjudicated}"
           if adjudicated else "")
    print(f"ARTIFACT-GUARD OK: CORRECTNESS_r{round_n}.json carries "
          f"{n} queries, consistent with the committed snapshot{adj}")
    return 0


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], *(sys.argv[2:3])))
