#!/usr/bin/env python3
"""Independent Apache Iceberg v2 export validator.

Reads an export directory written by graft's IcebergExport using ONLY the
public specs — the Avro 1.x object-container/binary-encoding spec and the
Apache Iceberg table spec — with no Avro library and zero shared code
with the Scala writer/reader pair. This is the closest offline substitute
for the live-catalog round-trip the reference performs with Trino: a
second, independently-written implementation consuming the metadata
chain (version-hint -> vN.metadata.json -> manifest list -> manifests ->
data/delete files) and reconstructing the live rows via DuckDB.

Checks (each violation is printed as "ERROR: ..." and fails the run):
  - metadata.json structural invariants: format-version 2, current
    snapshot present, current-schema-id resolvable, field ids unique and
    <= last-column-id, refs.main -> current snapshot, snapshot-log tail
    == current snapshot, every retained snapshot's manifest list exists;
  - manifest-list rows: added/existing/deleted file and row counts match
    a recount of the manifest's actual entries; min_sequence_number <=
    every entry's sequence number; manifest_length matches the file;
  - manifest entries: legal status/content kinds, live files exist with
    the recorded file_size_in_bytes, record_count matches an actual
    DuckDB recount of each parquet file, equality_ids resolve to a known
    field id, decoded lower_bounds <= upper_bounds and every bounded
    parquet file's actual column min/max within [lower, upper];
  - live-row reconstruction (parquet tables): data files of the chosen
    snapshot minus equality deletes (strictly-greater delete sequence)
    and position deletes (>= sequence), executed in DuckDB.
    --expect-rows asserts the count; --dump writes {"rows": N,
    "hash": "..."} where hash is an order-insensitive md5 over sorted
    row reprs, comparable from the Scala side.

ORC data files get the structural checks only (DuckDB carries no ORC
reader); reconstruction then reports rows = -1.

Usage:
  iceberg_validate.py EXPORT_DIR [--at SNAPSHOT_ID] [--expect-rows N]
                      [--dump OUT.json] [--quiet]
"""
import hashlib
import json
import os
import struct
import sys
import zlib

# --------------------------------------------------------------- avro codec


class AvroReader:
    """Avro binary decoder driven by the writer schema (no resolution —
    the container file carries its own writer schema, which is all a
    validator needs). Implements the subset of the Avro spec used by
    Iceberg manifests: null/boolean/int/long/float/double/bytes/string,
    record, union, array, map, fixed, enum.
    """

    def __init__(self, buf):
        self.buf = buf
        self.pos = 0

    def read(self, n):
        if self.pos + n > len(self.buf):
            raise EOFError("avro: truncated input")
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b

    def read_long(self):
        """zigzag varint (spec: int and long share this encoding)."""
        shift, acc = 0, 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self):
        return bytes(self.read(self.read_long()))

    def read_value(self, schema, names):
        if isinstance(schema, str):
            if schema in names:  # named-type reference
                return self.read_value(names[schema], names)
            t = schema
        elif isinstance(schema, list):  # union: branch index then value
            return self.read_value(schema[self.read_long()], names)
        else:
            t = schema["type"]
        if t == "null":
            return None
        if t == "boolean":
            return self.read(1)[0] != 0
        if t in ("int", "long"):
            return self.read_long()
        if t == "float":
            return struct.unpack("<f", self.read(4))[0]
        if t == "double":
            return struct.unpack("<d", self.read(8))[0]
        if t == "bytes":
            return self.read_bytes()
        if t == "string":
            return self.read_bytes().decode("utf-8")
        if t == "fixed":
            return bytes(self.read(schema["size"]))
        if t == "enum":
            return schema["symbols"][self.read_long()]
        if t == "record":
            if "name" in schema:
                names[schema["name"]] = schema
            out = {}
            for f in schema["fields"]:
                out[f["name"]] = self.read_value(f["type"], names)
            return out
        if t == "array":
            items = []
            while True:
                n = self.read_long()
                if n == 0:
                    break
                if n < 0:  # block form carries a byte-size prefix
                    n = -n
                    self.read_long()
                for _ in range(n):
                    items.append(self.read_value(schema["items"], names))
            return items
        if t == "map":
            out = {}
            while True:
                n = self.read_long()
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    self.read_long()
                for _ in range(n):
                    k = self.read_bytes().decode("utf-8")
                    out[k] = self.read_value(schema["values"], names)
            return out
        raise ValueError(f"avro: unsupported type {t!r}")


def read_avro_container(path):
    """Decode one Avro object-container file -> (file metadata dict,
    [records]). Spec: magic 'Obj\\x01', file-metadata map, 16-byte sync,
    then blocks of (count, size, data, sync). Codecs: null, deflate.
    """
    with open(path, "rb") as f:
        data = f.read()
    r = AvroReader(data)
    if bytes(r.read(4)) != b"Obj\x01":
        raise ValueError(f"{path}: not an Avro object container file")
    meta = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    sync = bytes(r.read(16))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    records = []
    while r.pos < len(data):
        count = r.read_long()
        size = r.read_long()
        block = bytes(r.read(size))
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"{path}: unsupported avro codec {codec!r}")
        if bytes(r.read(16)) != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
        br = AvroReader(block)
        for _ in range(count):
            records.append(br.read_value(schema, {}))
        if br.pos != len(block):
            raise ValueError(f"{path}: trailing bytes in block")
    return meta, records


# ----------------------------------------------------------- iceberg chain


def local_path(uri):
    """file:/x, file:///x or plain path -> filesystem path."""
    if uri.startswith("file:"):
        p = uri[5:]
        while p.startswith("//"):
            p = p[1:]
        return p
    return uri


def sq(s):
    """SQL single-quote a literal (paths never need more)."""
    return "'" + s.replace("'", "''") + "'"


ERRORS = []


def err(msg):
    ERRORS.append(msg)
    print(f"ERROR: {msg}", file=sys.stderr)


def decode_bound(type_name, raw):
    """Iceberg binary single-value serialization -> comparable python
    value, for the numeric types the exporter writes bounds for."""
    if type_name == "int" and len(raw) == 4:
        return struct.unpack("<i", raw)[0]
    if type_name == "long" and len(raw) == 8:
        return struct.unpack("<q", raw)[0]
    if type_name == "float" and len(raw) == 4:
        return struct.unpack("<f", raw)[0]
    if type_name == "double" and len(raw) == 8:
        return struct.unpack("<d", raw)[0]
    return None


def bounds_map(value):
    """Avro-decoded lower/upper bounds (array of {key,value} records, the
    spec's k*_v* map encoding) -> {field_id: bytes}."""
    if value is None:
        return {}
    return {e["key"]: e["value"] for e in value}


def load_metadata(export_dir):
    meta_dir = os.path.join(export_dir, "metadata")
    hint_path = os.path.join(meta_dir, "version-hint.text")
    if not os.path.isfile(hint_path):
        err(f"missing {hint_path}")
        return None
    with open(hint_path) as f:
        hint = f.read().strip()
    meta_path = os.path.join(meta_dir, f"v{hint}.metadata.json")
    if not os.path.isfile(meta_path):
        err(f"version-hint names {meta_path} which does not exist")
        return None
    with open(meta_path) as f:
        return json.load(f)


def _murmur3_x86_32(data, seed=0):
    """Canonical murmur3_x86_32 (public algorithm, Appendix B of the
    Iceberg spec names it for the bucket transform). Independent
    reimplementation — shares no code with the Scala writer."""
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


def iceberg_bucket(value, type_name, n):
    """bucket[n](value) per the Iceberg spec's per-type byte encodings;
    None for a null value (null transform result)."""
    if value is None:
        return None
    if type_name == "string":
        b = str(value).encode("utf-8")
    elif type_name in ("int", "long", "date", "timestamp", "timestamptz"):
        b = int(value).to_bytes(8, "little", signed=True)
    elif type_name == "binary":
        b = bytes(value)
    elif type_name.startswith("decimal"):
        import decimal
        unscaled = int(decimal.Decimal(value).scaleb(
            int(type_name.split(",")[1].rstrip(") "))))
        blen = max(1, (unscaled.bit_length() + 8) // 8)
        b = unscaled.to_bytes(blen, "big", signed=True)
    else:
        return None  # unsupported source type: caller skips the check
    return (_murmur3_x86_32(b) & 0x7FFFFFFF) % n


def partition_specs_of(meta):
    """spec-id -> list of partition field dicts; also checks the default
    spec exists."""
    specs = {s["spec-id"]: s.get("fields", [])
             for s in meta.get("partition-specs", [])}
    if meta.get("default-spec-id", 0) not in specs:
        err(f"default-spec-id {meta.get('default-spec-id')} not in "
            f"partition-specs {sorted(specs)}")
    return specs


def validate_metadata(meta):
    """Structural TableMetadata checks; returns field id -> (name, type)
    across all published schemas."""
    if meta.get("format-version") != 2:
        err(f"format-version is {meta.get('format-version')}, expected 2")
    ids = {}
    for s in meta.get("schemas", []):
        for f in s.get("fields", []):
            fid, name = f["id"], f["name"]
            if fid in ids and ids[fid][0] != name:
                err(f"field id {fid} bound to both '{ids[fid][0]}' and "
                    f"'{name}' — column identity violation")
            ids[fid] = (name, f["type"])
    last_col = meta.get("last-column-id", -1)
    for fid in ids:
        if fid > last_col:
            err(f"field id {fid} exceeds last-column-id {last_col}")
    cur_schema = meta.get("current-schema-id")
    if cur_schema not in {s.get("schema-id") for s in meta.get("schemas", [])}:
        err(f"current-schema-id {cur_schema} not present in schemas")
    cur = meta.get("current-snapshot-id")
    snap_ids = {s["snapshot-id"] for s in meta.get("snapshots", [])}
    if cur not in snap_ids:
        err(f"current-snapshot-id {cur} not present in snapshots")
    main_ref = meta.get("refs", {}).get("main", {})
    if main_ref.get("snapshot-id") != cur:
        err(f"refs.main points at {main_ref.get('snapshot-id')}, "
            f"current is {cur}")
    log = meta.get("snapshot-log", [])
    if log and log[-1]["snapshot-id"] != cur:
        err(f"snapshot-log tail {log[-1]['snapshot-id']} != current {cur}")
    seqs = [s.get("sequence-number", 0) for s in meta.get("snapshots", [])]
    if seqs and meta.get("last-sequence-number", -1) < max(seqs):
        err(f"last-sequence-number {meta.get('last-sequence-number')} < "
            f"max snapshot sequence {max(seqs)}")
    for s in meta.get("snapshots", []):
        ml = local_path(s["manifest-list"])
        if not os.path.isfile(ml):
            err(f"snapshot {s['snapshot-id']}: manifest-list {ml} missing")
    return ids


def validate_snapshot(snap, field_ids, specs, con):
    """Walk one snapshot's manifest list + manifests; validate counts and
    per-file facts. Returns (data_files, eq_deletes, pos_deletes):
    data file = (uri, local, record_count, seq, format, lower, upper);
    eq delete = (local, seq, [field ids]); pos delete = (local, seq)."""
    data_files, eq_deletes, pos_deletes = [], [], []
    ml_path = local_path(snap["manifest-list"])
    if not os.path.isfile(ml_path):
        return data_files, eq_deletes, pos_deletes
    _, manifests = read_avro_container(ml_path)
    for mf in manifests:
        mpath = local_path(mf["manifest_path"])
        if not os.path.isfile(mpath):
            err(f"manifest {mpath} missing")
            continue
        actual_len = os.path.getsize(mpath)
        if mf["manifest_length"] != actual_len:
            err(f"{mpath}: manifest_length {mf['manifest_length']} != "
                f"actual {actual_len}")
        if mf["content"] not in (0, 1):
            err(f"{mpath}: illegal manifest content {mf['content']}")
        spec_id = mf.get("partition_spec_id", 0)
        if spec_id not in specs:
            err(f"{mpath}: partition_spec_id {spec_id} not declared in "
                f"partition-specs")
        spec_fields = specs.get(spec_id, [])
        _, entries = read_avro_container(mpath)
        counts = {0: 0, 1: 0, 2: 0}
        rows = {0: 0, 1: 0, 2: 0}
        entry_seqs = []
        for e in entries:
            st = e["status"]
            if st not in (0, 1, 2):
                err(f"{mpath}: illegal entry status {st}")
                continue
            df = e["data_file"]
            counts[st] += 1
            rows[st] += df["record_count"]
            seq = e.get("sequence_number") or 0
            entry_seqs.append(seq)
            content = df["content"]
            if mf["content"] == 0 and content != 0:
                err(f"{mpath}: data manifest holds content={content} file "
                    f"{df['file_path']}")
            if mf["content"] == 1 and content not in (1, 2):
                err(f"{mpath}: delete manifest holds content={content} "
                    f"file {df['file_path']}")
            if st == 2:
                continue  # tombstone: the file may legally be gone
            uri = df["file_path"]
            fpath = local_path(uri)
            if not os.path.isfile(fpath):
                err(f"{uri}: live file missing on disk")
                continue
            size = os.path.getsize(fpath)
            if df["file_size_in_bytes"] != size:
                err(f"{fpath}: file_size_in_bytes {df['file_size_in_bytes']}"
                    f" != actual {size}")
            fmt = df["file_format"].upper()
            if fmt == "PARQUET":
                n = con.execute("SELECT count(*) FROM read_parquet("
                                + sq(fpath) + ")").fetchone()[0]
                if df["record_count"] != n:
                    err(f"{fpath}: record_count {df['record_count']} != "
                        f"actual rows {n}")
            lower = bounds_map(df.get("lower_bounds"))
            upper = bounds_map(df.get("upper_bounds"))
            for fid in set(lower) | set(upper):
                if fid not in field_ids:
                    err(f"{fpath}: bounds key {fid} is not a known field id")
            for fid in set(lower) & set(upper):
                name, ftype = field_ids.get(fid, (None, None))
                lo = decode_bound(ftype, lower[fid])
                hi = decode_bound(ftype, upper[fid])
                if lo is not None and hi is not None:
                    if lo > hi:
                        err(f"{fpath}: field {fid} lower bound {lo} > "
                            f"upper bound {hi}")
                    elif fmt == "PARQUET":
                        amin, amax = con.execute(
                            f'SELECT min("{name}"), max("{name}") FROM '
                            "read_parquet(" + sq(fpath) + ")").fetchone()
                        if amin is not None and (amin < lo or amax > hi):
                            err(f"{fpath}: actual [{amin}, {amax}] of "
                                f"'{name}' outside manifest bounds "
                                f"[{lo}, {hi}]")
            # partition tuple must carry exactly the manifest spec's
            # fields, and a bucket[N] value must be the REAL bucket of
            # every key in the file — recomputed here with an independent
            # murmur3 (a wrong tuple silently loses rows for every pruning
            # external reader). Applies to DATA files and bucket-scoped
            # EQUALITY-DELETE files alike (both carry the key column).
            if content in (0, 2):
                pt = df.get("partition") or {}
                want = {f["name"] for f in spec_fields}
                if set(pt) != want:
                    err(f"{fpath}: partition tuple fields {sorted(pt)} != "
                        f"spec fields {sorted(want)}")
                for f in spec_fields:
                    tr = f.get("transform", "")
                    if not tr.startswith("bucket["):
                        continue
                    n = int(tr[len("bucket["):-1])
                    v = pt.get(f["name"])
                    if v is not None and not (0 <= v < n):
                        err(f"{fpath}: bucket value {v} outside [0, {n})")
                    src = field_ids.get(f.get("source-id"))
                    if src is None:
                        err(f"{fpath}: bucket source-id {f.get('source-id')}"
                            f" is not a known field id")
                        continue
                    sname, stype = src
                    if fmt != "PARQUET":
                        continue
                    vals = [r[0] for r in con.execute(
                        f'SELECT DISTINCT "{sname}" FROM read_parquet('
                        + sq(fpath) + ")").fetchall()]
                    for kv in vals:
                        got = iceberg_bucket(kv, stype, n)
                        if got != v:
                            err(f"{fpath}: key {kv!r} has bucket {got} but "
                                f"partition tuple says {v}")
                            break
            if content == 0:
                data_files.append((uri, fpath, df["record_count"], seq, fmt,
                                   lower, upper))
            elif content == 2:
                eq_ids = df.get("equality_ids") or []
                if not eq_ids:
                    err(f"{fpath}: equality-delete file without equality_ids")
                for fid in eq_ids:
                    if fid not in field_ids:
                        err(f"{fpath}: equality id {fid} unknown")
                eq_deletes.append((fpath, seq, eq_ids))
            elif content == 1:
                pos_deletes.append((fpath, seq))
        if (mf["added_files_count"], mf["existing_files_count"],
                mf["deleted_files_count"]) != (counts[1], counts[0], counts[2]):
            err(f"{mpath}: manifest-list counts (a/e/d)=("
                f"{mf['added_files_count']},{mf['existing_files_count']},"
                f"{mf['deleted_files_count']}) != recount ({counts[1]},"
                f"{counts[0]},{counts[2]})")
        if (mf["added_rows_count"], mf["existing_rows_count"],
                mf["deleted_rows_count"]) != (rows[1], rows[0], rows[2]):
            err(f"{mpath}: manifest-list row counts != recount")
        if entry_seqs and mf["min_sequence_number"] > min(entry_seqs):
            err(f"{mpath}: min_sequence_number {mf['min_sequence_number']} "
                f"> smallest entry sequence {min(entry_seqs)}")
    return data_files, eq_deletes, pos_deletes


def reconstruct_rows(con, schema_fields, field_ids, data_files, eq_deletes,
                     pos_deletes):
    """Live rows per the v2 spec: each data file minus equality deletes
    with STRICTLY greater data sequence and position deletes with >=
    sequence. Returns (row_count, order-insensitive md5), or (-1, None)
    when a non-parquet data file blocks DuckDB reconstruction."""
    if any(fmt != "PARQUET" for _, _, _, _, fmt, _, _ in data_files):
        return -1, None
    if not data_files:
        return 0, md5_of([])
    cols = ", ".join(f't."{f["name"]}"' for f in schema_fields)
    parts = []
    for uri, fpath, _, seq, _, _, _ in data_files:
        base = ("SELECT *, file_row_number AS _pos FROM read_parquet("
                + sq(fpath) + ", file_row_number=true)")
        conds = []
        for dpath, dseq, eq_ids in eq_deletes:
            if dseq > seq:  # spec: equality deletes apply to seq < theirs
                keys = [field_ids[fid][0] for fid in eq_ids
                        if fid in field_ids]
                if keys:
                    on = " AND ".join(
                        f'd."{k}" IS NOT DISTINCT FROM t."{k}"' for k in keys)
                    conds.append("NOT EXISTS (SELECT 1 FROM read_parquet("
                                 + sq(dpath) + f") d WHERE {on})")
        for dpath, dseq in pos_deletes:
            if dseq >= seq:  # spec: position deletes apply to seq <= theirs
                conds.append("NOT EXISTS (SELECT 1 FROM read_parquet("
                             + sq(dpath) + ") d WHERE d.file_path = "
                             + sq(uri) + " AND d.pos = t._pos)")
        where = (" WHERE " + " AND ".join(conds)) if conds else ""
        parts.append(f"SELECT {cols} FROM ({base}) t{where}")
    rows = con.execute(" UNION ALL ".join(parts)).fetchall()
    return len(rows), md5_of(rows)


def md5_of(rows):
    h = hashlib.md5()
    for r in sorted(repr(tuple(r)) for r in rows):
        h.update(r.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    import argparse
    ap = argparse.ArgumentParser(
        description="independent Iceberg v2 export validator")
    ap.add_argument("export_dir")
    ap.add_argument("--at", type=int, default=None,
                    help="snapshot id to read (default: current)")
    ap.add_argument("--expect-rows", type=int, default=None)
    ap.add_argument("--dump", default=None,
                    help="write {rows, hash} JSON here")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()

    import duckdb
    con = duckdb.connect()

    meta = load_metadata(args.export_dir)
    if meta is None:
        print(json.dumps({"rows": -1, "errors": len(ERRORS)}))
        sys.exit(1)
    field_ids = validate_metadata(meta)
    specs = partition_specs_of(meta)

    # deep-validate EVERY retained snapshot's manifests; reconstruct rows
    # for the requested one
    target_id = (args.at if args.at is not None
                 else meta.get("current-snapshot-id"))
    result = None
    for snap in meta.get("snapshots", []):
        d, eq, pos = validate_snapshot(snap, field_ids, specs, con)
        if snap["snapshot-id"] == target_id:
            schema_id = snap.get("schema-id", meta["current-schema-id"])
            schema = next(s for s in meta["schemas"]
                          if s["schema-id"] == schema_id)
            result = reconstruct_rows(con, schema["fields"], field_ids,
                                      d, eq, pos)
    if result is None:
        err(f"snapshot {target_id} not found in retained history")
        print(json.dumps({"rows": -1, "errors": len(ERRORS)}))
        sys.exit(1)
    rows, row_hash = result
    if args.expect_rows is not None and rows != args.expect_rows:
        err(f"live-row count {rows} != expected {args.expect_rows}")
    out = {"rows": rows, "hash": row_hash,
           "snapshot_id": target_id, "errors": len(ERRORS)}
    if args.dump:
        with open(args.dump, "w") as f:
            json.dump(out, f)
    if not args.quiet:
        print(json.dumps(out))
    sys.exit(1 if ERRORS else 0)


if __name__ == "__main__":
    main()
