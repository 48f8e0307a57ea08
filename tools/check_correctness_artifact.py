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
`tools/correctness_snapshots/r{N}_adjudications.txt`.

Round 20 (r19 ADVICE) hardens both halves of the adjudication path,
which previously could be satisfied by self-attestation:

  * the infra class is restricted to rows where the comparison NEVER
    COMPLETED — all three match keys (`rows_match`/`schema_match`/
    `hash_match`) absent or null. A row carrying ANY explicit match
    boolean recorded a real comparison outcome; an infra-looking
    substring in its `err` (e.g. a DuckDB message that happens to
    contain "EAGAIN") no longer makes a genuine mismatch adjudicable.
  * adjudication lines must carry VERIFIABLE re-run evidence that the
    guard cross-checks against the committed snapshot:

        FLAKE <query> re-run OK rows=<n> md5=<hex> <free-form note>

    where rows/md5 must equal the `(N rows, md5 H)` the snapshot's OK
    line records for that query (tools/check_oracle.py prints both
    since r20). A bare `FLAKE <q> re-run OK` line — or one whose
    evidence disagrees with the snapshot — fails the guard.

A flaky row with a matching evidence-checked adjudication passes with
an ADJUDICATED note; without one it fails with instructions, never
conflated with a mismatch.

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


def parse_snapshot_evidence(path):
    """r20+ OK lines `OK <q> (<n> rows, md5 <hex>)` ->
    {query: (rows, md5)} — the reference an adjudication's re-run
    evidence is cross-checked against."""
    ev = {}
    with open(path) as f:
        for line in f:
            m = re.match(
                r"OK\s+(\S+)\s+\((\d+) rows, md5 ([0-9a-f]+)\)",
                line.strip())
            if m:
                ev[m.group(1)] = (int(m.group(2)), m.group(3))
    return ev


def parse_adjudications(path):
    """`FLAKE <query> re-run OK rows=<n> md5=<hex> ...` lines ->
    {query: (rows, md5)}. Legacy bare lines (no evidence) parse to
    {query: None} so the caller can fail them with instructions
    rather than silently ignoring them."""
    ok = {}
    if not os.path.exists(path):
        return ok
    with open(path) as f:
        for line in f:
            m = re.match(
                r"FLAKE\s+(\S+)\s+re-run\s+OK\s+rows=(\d+)\s+"
                r"md5=([0-9a-f]+)\b", line.strip())
            if m:
                ok[m.group(1)] = (int(m.group(2)), m.group(3))
                continue
            m = re.match(r"FLAKE\s+(\S+)\s+re-run\s+OK\b", line.strip())
            if m:
                ok.setdefault(m.group(1), None)
    return ok


def comparison_never_completed(row):
    """True iff the artifact row records NO comparison outcome — all
    three match keys absent or null (r19 ADVICE: an explicit False is
    a real recorded mismatch and must never become adjudicable just
    because `err` contains an infra-looking substring)."""
    return all(row.get(k) is None
               for k in ("rows_match", "schema_match", "hash_match"))


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
        # rows whose failure is an oracle-INFRA error, not a mismatch:
        # the err carries an infra signature AND the comparison never
        # completed (no match key recorded — r19 ADVICE: an explicit
        # rows_match/hash_match False is a real outcome, never
        # adjudicable however infra-flavored its err string)
        infra = {q for q, v in art.items() if isinstance(v, dict)
                 and not art_ok.get(q)
                 and v.get("err") and INFRA_RE.search(str(v["err"]))
                 and comparison_never_completed(v)}
        rerun_ok = parse_adjudications(os.path.join(
            repo, "tools", "correctness_snapshots",
            f"r{round_n}_adjudications.txt"))
        snap_ev = parse_snapshot_evidence(snap_path)
        missing = sorted(set(snap) - set(art_ok))
        extra = sorted(set(art_ok) - set(snap))
        if missing:
            errs.append(f"artifact missing {len(missing)} snapshot "
                        f"queries, e.g. {missing[:5]}")
        if extra:
            errs.append(f"artifact has {len(extra)} queries the "
                        f"snapshot lacks, e.g. {extra[:5]}")
        ask = (f"record 'FLAKE {{q}} re-run OK rows=<n> md5=<hex> "
               f"<note>' in tools/correctness_snapshots/"
               f"r{round_n}_adjudications.txt, where rows/md5 quote "
               f"the local re-run and must match the snapshot's OK "
               f"line")
        for q in sorted(set(snap) & set(art_ok)):
            if snap[q] == art_ok[q]:
                continue
            if q in infra and rerun_ok.get(q) is not None:
                if q not in snap_ev:
                    errs.append(
                        f"{q}: adjudication carries evidence but the "
                        f"snapshot OK line has no rows/md5 (pre-r20 "
                        f"format?) — regenerate the snapshot with the "
                        f"current tools/check_oracle.py")
                elif rerun_ok[q] != snap_ev[q]:
                    errs.append(
                        f"{q}: adjudication evidence {rerun_ok[q]} "
                        f"disagrees with the snapshot's {snap_ev[q]} — "
                        f"the claimed re-run did not reproduce the "
                        f"snapshot result")
                else:
                    adjudicated.append(q)
            elif q in infra and q in rerun_ok:
                errs.append(
                    f"{q}: adjudication line lacks machine-checkable "
                    f"evidence (r19 ADVICE) — " + ask.format(q=q))
            elif q in infra:
                errs.append(
                    f"{q}: oracle-infra flake (err matches the DuckDB "
                    f"resource-error class and no comparison outcome "
                    f"was recorded) — local re-run REQUIRED: run "
                    f"graft.Verify + tools/check_oracle.py for it, "
                    f"then " + ask.format(q=q))
            else:
                errs.append(
                    f"{q}: artifact and snapshot DISAGREE and the "
                    f"artifact row is not an incomplete-comparison "
                    f"infra flake — a real mismatch, not adjudicable")

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
