#!/usr/bin/env python3
"""Independent Delta Lake log validator.

Reads a `_delta_log/` directory written by graft's DeltaExport using ONLY
the public Delta transaction-log protocol (delta-io/delta PROTOCOL.md):
replays the newline-delimited-JSON commits in version order, checks
structural invariants, rebuilds the live file set, re-reads every live
parquet file through DuckDB, cross-checks per-file `stats.numRecords` and
`size` against the actual parquet footers, and prints one JSON line:

    {"rows": N, "hash": "...", "version": V, "errors": 0}

Shares zero code with the Scala writer/reader pair — a spec-
interpretation bug the Scala reader compensates for surfaces here.

Usage:
    delta_validate.py <exportDir> [--at V] [--expect-rows N]
"""
import json
import os
import re
import sys
import glob
import hashlib
import urllib.parse

import duckdb


def local_path(p):
    """Decode a percent-encoded add/remove path (protocol: RFC 2396) and
    strip a file: scheme for local reads."""
    d = urllib.parse.unquote(p)
    return d[len("file:"):] if d.startswith("file:") else d


def fail(msg):
    print(json.dumps({"error": msg}))
    sys.exit(1)


def main():
    export_dir = sys.argv[1]
    at = None
    expect_rows = None
    args = sys.argv[2:]
    while args:
        a = args.pop(0)
        if a == "--at":
            at = int(args.pop(0))
        elif a == "--expect-rows":
            expect_rows = int(args.pop(0))
        else:
            fail(f"unknown arg {a}")

    log_dir = os.path.join(export_dir, "_delta_log")
    commits = sorted(
        p for p in glob.glob(os.path.join(log_dir, "*.json"))
        if re.fullmatch(r"\d{20}\.json", os.path.basename(p)))
    if not commits:
        fail(f"no delta log under {export_dir}")
    versions = [int(os.path.basename(p)[:-5]) for p in commits]
    errors = []
    if versions != list(range(len(versions))):
        errors.append(f"log versions not contiguous from 0: {versions}")
    if at is not None:
        if at not in versions:
            fail(f"version {at} not in log")
        commits = commits[: versions.index(at) + 1]

    # checkpoint (if present and within range): validated below against the
    # pure-JSON replay — the two state sources must agree exactly
    ck_version = None
    lc_path = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(lc_path):
        lc = json.load(open(lc_path))
        ck_version = lc["version"]
        ck_file = os.path.join(log_dir, f"{ck_version:020d}.checkpoint.parquet")
        if not os.path.exists(ck_file):
            errors.append(f"_last_checkpoint points at missing {ck_file}")
            ck_version = None
        elif at is not None and ck_version > at:
            ck_version = None  # out of replayed range; nothing to compare

    schema_str = None
    table_id = None
    protocol_seen = False
    files = {}   # path -> add action
    state_at_ck = None
    for p in commits:
        v = int(os.path.basename(p)[:-5])
        for line in open(p, encoding="utf-8"):
            line = line.strip()
            if not line:
                continue
            act = json.loads(line)
            if "protocol" in act:
                protocol_seen = True
                pr = act["protocol"]
                if pr["minReaderVersion"] > 1:
                    errors.append("reader version above 1 for a plain parquet log")
            elif "metaData" in act:
                m = act["metaData"]
                if table_id is not None and m["id"] != table_id:
                    errors.append("table id changed across commits")
                table_id = m["id"]
                schema_str = m["schemaString"]
                if m["format"]["provider"] != "parquet":
                    errors.append(f"unexpected format {m['format']['provider']}")
                if m["partitionColumns"]:
                    errors.append("unexpected partition columns")
            elif "add" in act:
                a = act["add"]
                if a["path"] in files:
                    errors.append(f"duplicate add without remove: {a['path']}")
                for req in ("size", "modificationTime", "dataChange"):
                    if req not in a:
                        errors.append(f"add missing required field {req}")
                files[a["path"]] = a
            elif "remove" in act:
                r = act["remove"]
                if r["path"] not in files:
                    errors.append(f"remove of file never added: {r['path']}")
                files.pop(r["path"], None)
            elif "commitInfo" in act:
                pass
            else:
                errors.append(f"unknown action in v{v}: {list(act.keys())}")
        if v == 0 and not protocol_seen:
            errors.append("version 0 carries no protocol action")
        if v == 0 and schema_str is None:
            errors.append("version 0 carries no metaData action")
        if ck_version is not None and v == ck_version:
            state_at_ck = (dict(files), schema_str, table_id)

    if ck_version is not None and state_at_ck is not None:
        con0 = duckdb.connect()
        ck_local = os.path.join(log_dir, f"{ck_version:020d}.checkpoint.parquet")
        rows = con0.sql(
            f"SELECT txn, protocol, metaData, add, remove "
            f"FROM read_parquet('{ck_local}')").fetchall()
        ck_files = {}
        ck_schema = None
        ck_id = None
        ck_proto = False
        for txn, proto, md, add, rem in rows:
            if proto is not None:
                ck_proto = True
            if md is not None:
                ck_id = md["id"]
                ck_schema = md["schemaString"]
            if add is not None:
                ck_files[add["path"]] = add["size"]
        jf, js, jid = state_at_ck
        if not ck_proto:
            errors.append("checkpoint carries no protocol action")
        if ck_schema != js:
            errors.append("checkpoint schemaString differs from JSON replay at same version")
        if ck_id != jid:
            errors.append("checkpoint table id differs from JSON replay")
        json_set = {p: a["size"] for p, a in jf.items()}
        if ck_files != json_set:
            only_ck = set(ck_files) - set(json_set)
            only_js = set(json_set) - set(ck_files)
            errors.append(
                f"checkpoint file set diverges from JSON replay at v{ck_version}: "
                f"+ck={sorted(only_ck)[:3]} +json={sorted(only_js)[:3]}")

    if schema_str is None:
        fail("no metaData in replayed range")
    schema = json.loads(schema_str)
    cols = [f["name"] for f in schema["fields"]]

    con = duckdb.connect()
    total = 0
    for path, a in files.items():
        local = local_path(path)
        meta = con.sql(
            f"select num_rows from parquet_file_metadata('{local}')").fetchone()
        n = meta[0]
        stats = json.loads(a.get("stats", "{}")) if a.get("stats") else {}
        if "numRecords" in stats and stats["numRecords"] != n:
            errors.append(f"stats.numRecords {stats['numRecords']} != parquet {n}: {path}")
        actual_size = os.path.getsize(local)
        if a["size"] != actual_size:
            errors.append(f"size {a['size']} != actual {actual_size}: {path}")
        total += n

    # rebuild the live rows through DuckDB and hash deterministically
    if files:
        paths = [local_path(p) for p in sorted(files)]
        collist = ", ".join(f'"{c}"' for c in cols)
        df = con.sql(
            f"SELECT {collist} FROM read_parquet({paths!r}, union_by_name=true) "
            f"ORDER BY ALL").fetchall()
        h = hashlib.md5(repr(df).encode()).hexdigest()
        rows = len(df)
    else:
        h = hashlib.md5(b"[]").hexdigest()
        rows = 0
    if rows != total:
        errors.append(f"row recount {rows} != footer total {total}")
    if expect_rows is not None and rows != expect_rows:
        errors.append(f"expected {expect_rows} rows, got {rows}")

    out = {"rows": rows, "hash": h,
           "version": int(os.path.basename(commits[-1])[:-5]),
           "table_id": table_id, "errors": len(errors)}
    if errors:
        out["error_list"] = errors[:10]
    print(json.dumps(out))
    sys.exit(0 if not errors else 1)


if __name__ == "__main__":
    main()
