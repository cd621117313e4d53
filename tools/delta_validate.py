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


def parse_roaring32(buf, pos):
    """Parse one standard-portable 32-bit RoaringBitmap starting at pos.
    Returns (sorted values, next position). Independent implementation of
    the public RoaringFormatSpec (array, bitmap and run containers)."""
    import struct
    cookie = struct.unpack_from("<I", buf, pos)[0]
    has_run = (cookie & 0xFFFF) == 12347
    if has_run:
        size = (cookie >> 16) + 1
        pos += 4
        runbits = buf[pos: pos + (size + 7) // 8]
        pos += (size + 7) // 8
        run_flags = [(runbits[i // 8] >> (i % 8)) & 1 for i in range(size)]
    elif cookie == 12346:
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        pos += 8
        run_flags = [0] * size
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    keys, cards = [], []
    for _ in range(size):
        k, c = struct.unpack_from("<HH", buf, pos)
        keys.append(k)
        cards.append(c + 1)
        pos += 4
    if (not has_run) or size >= 4:
        pos += 4 * size  # offset headers (parse sequentially instead)
    values = []
    for i in range(size):
        base = keys[i] << 16
        if run_flags[i]:
            n_runs = struct.unpack_from("<H", buf, pos)[0]
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base | v for v in range(start, start + length + 1))
        elif cards[i] <= 4096:
            for _ in range(cards[i]):
                values.append(base | struct.unpack_from("<H", buf, pos)[0])
                pos += 2
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base | (wi * 64 + b.bit_length() - 1))
                    w ^= b
    return values, pos


def read_deletion_vector(dv, errors):
    """Decode a deletionVector descriptor (storageType 'p') into the set
    of deleted row indexes, checking the PROTOCOL.md framing: version
    byte 1, <int32 BE size><data><int32 BE crc32>, data = <magic
    1681511377 LE><int64 LE bitmap count><portable 32-bit bitmaps>."""
    import struct
    import zlib
    if dv.get("storageType") != "p":
        errors.append(f"unsupported DV storageType {dv.get('storageType')}")
        return set()
    path = local_path(dv["pathOrInlineDv"])
    if not os.path.exists(path):
        errors.append(f"DV file missing: {path}")
        return set()
    blob = open(path, "rb").read()
    if blob[0] != 1:
        errors.append(f"DV file format version {blob[0]} != 1: {path}")
    off = int(dv.get("offset", 0))
    size = struct.unpack_from(">i", blob, off)[0]
    if size != dv["sizeInBytes"]:
        errors.append(f"DV size {size} != descriptor {dv['sizeInBytes']}: {path}")
    data = blob[off + 4: off + 4 + size]
    crc = struct.unpack_from(">I", blob, off + 4 + size)[0]
    if crc != (zlib.crc32(data) & 0xFFFFFFFF):
        errors.append(f"DV checksum mismatch: {path}")
    magic = struct.unpack_from("<I", data, 0)[0]
    if magic != 1681511377:
        errors.append(f"DV bitmap magic {magic} != 1681511377: {path}")
        return set()
    n_bitmaps = struct.unpack_from("<q", data, 4)[0]
    pos = 12
    out = set()
    for hi in range(n_bitmaps):
        vals, pos = parse_roaring32(data, pos)
        out.update((hi << 32) | v for v in vals)
    if len(out) != dv["cardinality"]:
        errors.append(
            f"DV cardinality {dv['cardinality']} != decoded {len(out)}: {path}")
    return out


def _murmur3_x86_32(data, seed=0):
    """Canonical murmur3_x86_32 — independent reimplementation used to
    recompute published bucket partition values (Iceberg bucket[N]
    transform; the Scala writer shares no code with this)."""
    c1, c2 = 0xcc9e2d51, 0x1b873593
    h = seed
    length = len(data)
    rounded = length & ~3
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & 0xffffffff
        k = ((k << 15) | (k >> 17)) & 0xffffffff
        k = (k * c2) & 0xffffffff
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xffffffff
        h = (h * 5 + 0xe6546b64) & 0xffffffff
    tail = data[rounded:]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xffffffff
        k = ((k << 15) | (k >> 17)) & 0xffffffff
        k = (k * c2) & 0xffffffff
        h ^= k
    h ^= length
    h ^= h >> 16
    h = (h * 0x85ebca6b) & 0xffffffff
    h ^= h >> 13
    h = (h * 0xc2b2ae35) & 0xffffffff
    h ^= h >> 16
    return h


def iceberg_bucket(value, spark_type, n):
    """bucket[n](value) with the Iceberg spec's byte encodings, keyed by
    the SPARK type name from Delta's schemaString."""
    if value is None:
        return None
    if spark_type == "string":
        b = str(value).encode("utf-8")
    elif spark_type in ("long", "integer", "short", "byte", "date",
                        "timestamp", "timestamp_ntz"):
        b = int(value).to_bytes(8, "little", signed=True)
    elif spark_type == "binary":
        b = bytes(value)
    else:
        return None  # unsupported source type: caller skips the check
    return (_murmur3_x86_32(b) & 0x7FFFFFFF) % n


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
    configuration = {}
    pcols = []
    files = {}      # path -> add action
    removed = {}    # path -> deletionTimestamp (tombstones)
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
                    feats = pr.get("readerFeatures") or []
                    if not (pr["minReaderVersion"] == 3
                            and "deletionVectors" in feats):
                        errors.append(
                            f"reader version {pr['minReaderVersion']} without "
                            f"a matching reader feature: {feats}")
            elif "metaData" in act:
                m = act["metaData"]
                if table_id is not None and m["id"] != table_id:
                    errors.append("table id changed across commits")
                table_id = m["id"]
                schema_str = m["schemaString"]
                configuration = m.get("configuration", {})
                if m["format"]["provider"] != "parquet":
                    errors.append(f"unexpected format {m['format']['provider']}")
                new_pcols = m.get("partitionColumns", [])
                if pcols and new_pcols != pcols:
                    errors.append(
                        f"partition columns changed mid-log: {pcols} -> {new_pcols}")
                pcols = new_pcols
                sch = json.loads(schema_str)
                for pc in pcols:
                    if pc not in [f["name"] for f in sch["fields"]]:
                        errors.append(
                            f"partition column {pc} not in schemaString")
            elif "add" in act:
                a = act["add"]
                if a["path"] in files:
                    errors.append(f"duplicate add without remove: {a['path']}")
                for req in ("size", "modificationTime", "dataChange"):
                    if req not in a:
                        errors.append(f"add missing required field {req}")
                pv = a.get("partitionValues", {})
                if set(pv) != set(pcols):
                    errors.append(
                        f"add partitionValues keys {sorted(pv)} != "
                        f"partitionColumns {sorted(pcols)}: {a['path']}")
                files[a["path"]] = a
                removed.pop(a["path"], None)
            elif "remove" in act:
                r = act["remove"]
                if r["path"] not in files:
                    errors.append(f"remove of file never added: {r['path']}")
                files.pop(r["path"], None)
                removed[r["path"]] = r.get("deletionTimestamp", 0)
            elif "commitInfo" in act:
                pass
            else:
                errors.append(f"unknown action in v{v}: {list(act.keys())}")
        if v == 0 and not protocol_seen:
            errors.append("version 0 carries no protocol action")
        if v == 0 and schema_str is None:
            errors.append("version 0 carries no metaData action")
        if ck_version is not None and v == ck_version:
            state_at_ck = (dict(files), schema_str, table_id, dict(removed))

    if ck_version is not None and state_at_ck is not None:
        con0 = duckdb.connect()
        ck_local = os.path.join(log_dir, f"{ck_version:020d}.checkpoint.parquet")
        rows = con0.sql(
            f"SELECT txn, protocol, metaData, add, remove "
            f"FROM read_parquet('{ck_local}')").fetchall()
        ck_files = {}
        ck_removes = {}
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
            if rem is not None:
                ck_removes[rem["path"]] = rem["deletionTimestamp"]
        jf, js, jid, jremoved = state_at_ck
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
        # protocol: a checkpoint must CARRY unexpired remove tombstones —
        # they must be real tombstones (removed in the JSON history, not
        # live), and every tombstone removed at-or-near the checkpoint's
        # own commit must be present (older ones may legally be expired)
        for pth in ck_removes:
            if pth in json_set:
                errors.append(f"checkpoint tombstone for LIVE file: {pth}")
            elif pth not in jremoved:
                errors.append(f"checkpoint tombstone never removed in log: {pth}")
        fresh = {p for p, ts in jremoved.items()
                 if ts == max(jremoved.values(), default=0)}
        missing = fresh - set(ck_removes)
        if jremoved and missing:
            errors.append(
                f"checkpoint omits fresh remove tombstones: {sorted(missing)[:3]}")

    if schema_str is None:
        fail("no metaData in replayed range")
    schema = json.loads(schema_str)
    cols = [f["name"] for f in schema["fields"]]
    types = {f["name"]: f["type"] for f in schema["fields"]}
    data_cols = [c for c in cols if c not in pcols]

    # bucket-partition recompute: graft's documented convention records
    # the transform parameters in metaData.configuration — every add's
    # partition value must equal the murmur3 bucket of EVERY key in its
    # file (a wrong value silently mis-prunes external point lookups)
    bsrc = configuration.get("graft.bucket.source")
    bn = configuration.get("graft.bucket.n")

    con = duckdb.connect()
    total = 0
    dv_positions = {}  # path -> set of deleted row indexes
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
        if a.get("deletionVector"):
            pos = read_deletion_vector(a["deletionVector"], errors)
            dv_positions[path] = pos
            if any(p >= n for p in pos):
                errors.append(f"DV position beyond file row count {n}: {path}")
            total -= len(pos)  # live rows, not physical rows
        if pcols and bsrc and bn:
            pv = a.get("partitionValues", {}).get(f"{bsrc}_bucket")
            declared = None if pv is None else int(pv)
            keys = [r[0] for r in con.sql(
                f'SELECT DISTINCT "{bsrc}" FROM read_parquet(\'{local}\')').fetchall()]
            for kv in keys:
                got = iceberg_bucket(kv, str(types.get(bsrc)), int(bn))
                if got != declared:
                    errors.append(
                        f"partition value {declared} but key {kv!r} buckets "
                        f"to {got}: {path}")
                    break

    # rebuild the live rows through DuckDB — partition columns are NOT in
    # the parquet files (protocol: their data lives in the log), so each
    # file's partition values materialize as literals — and hash
    # deterministically
    def duck_type(t):
        m = {"long": "BIGINT", "integer": "INT", "short": "SMALLINT",
             "byte": "TINYINT", "string": "VARCHAR", "boolean": "BOOLEAN",
             "double": "DOUBLE", "float": "FLOAT", "date": "DATE",
             "timestamp": "TIMESTAMP", "binary": "BLOB"}
        if isinstance(t, str) and t.startswith("decimal"):
            return t.upper()
        return m.get(t, "VARCHAR")

    if files:
        selects = []
        for path in sorted(files):
            a = files[path]
            local = local_path(path)
            # files written before an ADD COLUMN lack the new columns —
            # the protocol reads them as NULL (same as Spark's
            # union_by_name), so missing columns materialize as typed NULLs
            have = {r[0] for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{local}')").fetchall()}
            parts = [f'"{c}"' if c in have else
                     f'CAST(NULL AS {duck_type(types[c])}) AS "{c}"'
                     for c in data_cols]
            for pc in pcols:
                v = a.get("partitionValues", {}).get(pc)
                parts.append("CAST(NULL AS INT) AS \"%s\"" % pc if v is None
                             else "CAST(%s AS INT) AS \"%s\"" % (int(v), pc))
            # deletion vector: suppress the named row indexes
            dv = sorted(dv_positions.get(path, ()))
            if dv:
                selects.append(
                    f"SELECT {', '.join(parts)} FROM read_parquet('{local}', "
                    f"file_row_number=true) WHERE file_row_number NOT IN "
                    f"({', '.join(map(str, dv))})")
            else:
                selects.append(
                    f"SELECT {', '.join(parts)} FROM read_parquet('{local}')")
        collist = ", ".join(f'"{c}"' for c in cols)
        df = con.sql(
            f"SELECT {collist} FROM ({' UNION ALL '.join(selects)}) "
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
