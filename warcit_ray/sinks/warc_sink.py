"""WARC/1.0 physical serialization.

Implements the WARC 1.0 record grammar from the public ISO 28500 spec
(the format warcio writes for the reference at warcit.py:409-422):
``WARC/1.0`` version line, CRLF headers, blank line, payload block,
two trailing CRLFs; when gzip is on, each record is its own gzip
member (the standard .warc.gz framing).

Two writers:
- :func:`write_warc_file` — ONE output file, exclusive-create /
  overwrite / append modes exactly like the reference ('xb'/'wb'/'ab',
  warcit.py:143-148,409-419; EEXIST is an error in default mode).
  Streams `iter_batches` in seq order, so the driver holds one batch.
- :func:`write_warc_shards` — the scale path: one .warc.gz per block,
  named by the block's minimum seq (zero-padded, so lexicographic
  filename order == record order), plus a manifest for resume.
"""

from __future__ import annotations

import glob
import gzip
import io
import os

import pyarrow as pa

REVISIT_PROFILE = "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"


def serialize_record(row: dict, gzip_member: bool = True) -> bytes:
    """One WARC record -> bytes (optionally a standalone gzip member)."""
    rtype = row["record_type"]
    warc_type = "resource" if rtype not in (
        "warcinfo", "revisit", "conversion", "metadata", "response", "request", "resource"
    ) else rtype
    headers: list[tuple[str, str]] = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", row["record_id"]),
        ("WARC-Date", row["warc_date"]),
    ]
    if rtype == "warcinfo":
        headers.append(("WARC-Filename", row["target_uri"]))
    else:
        headers.append(("WARC-Target-URI", row["target_uri"]))
    if row.get("creation_date"):
        headers.append(("WARC-Creation-Date", row["creation_date"]))
    if row.get("source_uri"):
        headers.append(("WARC-Source-URI", row["source_uri"]))
    if rtype == "revisit":
        headers.append(("WARC-Profile", REVISIT_PROFILE))
        if row.get("refers_to_uri"):
            headers.append(("WARC-Refers-To-Target-URI", row["refers_to_uri"]))
        if row.get("refers_to_date"):
            headers.append(("WARC-Refers-To-Date", row["refers_to_date"]))
    else:
        if row.get("refers_to_id"):
            headers.append(("WARC-Refers-To", row["refers_to_id"]))
        if row.get("refers_to_uri"):
            headers.append(("WARC-Refers-To-Target-URI", row["refers_to_uri"]))
        if row.get("refers_to_date"):
            headers.append(("WARC-Refers-To-Target-Date", row["refers_to_date"]))
    if row.get("json_metadata"):
        headers.append(("WARC-JSON-Metadata", row["json_metadata"]))
    payload = row.get("payload") or b""
    if row.get("payload_digest"):
        headers.append(("WARC-Payload-Digest", row["payload_digest"]))
        if rtype != "revisit":
            headers.append(("WARC-Block-Digest", row["payload_digest"]))
    if row.get("content_type") and rtype != "revisit":
        headers.append(("Content-Type", row["content_type"]))
    headers.append(("Content-Length", str(len(payload))))

    buf = io.BytesIO()
    buf.write(b"WARC/1.0\r\n")
    for k, v in headers:
        buf.write(("%s: %s\r\n" % (k, v)).encode("utf-8"))
    buf.write(b"\r\n")
    buf.write(payload)
    buf.write(b"\r\n\r\n")
    raw = buf.getvalue()
    if gzip_member:
        out = io.BytesIO()
        with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as gz:
            gz.write(raw)
        return out.getvalue()
    return raw


def serialize_batch(batch: pa.Table, gzip_members: bool = True) -> bytes:
    chunks = []
    for row in batch.to_pylist():
        chunks.append(serialize_record(row, gzip_members))
    return b"".join(chunks)


def _open_mode(path: str, mode: str):
    """Reference tri-mode (warcit.py:143-148,409-419): default 'xb'
    create-exclusive (EEXIST -> error), '-a' append, '-o' overwrite."""
    if mode not in ("xb", "wb", "ab"):
        raise ValueError("mode must be xb/wb/ab")
    return open(path, mode)


def write_warc_file(ds, path: str, mode: str = "xb", gzip_members: bool = True,
                    batch_size: int = 256) -> int:
    """Stream the record Dataset (already carrying seq) into one WARC
    file in seq order. Returns the record count."""
    n = 0
    with _open_mode(path, mode) as fh:
        for batch in ds.sort("seq").iter_batches(batch_size=batch_size, batch_format="pyarrow"):
            fh.write(serialize_batch(batch, gzip_members))
            n += batch.num_rows
    return n


_SHARD_SEQ_BIAS = 1 << 32  # keeps shard ids non-negative for any seq


def write_warc_shards(ds, out_dir: str, mode: str = "xb",
                      gzip_members: bool = True,
                      rows_per_shard: int = 1024) -> list[str]:
    """Distributed sharded writer with DETERMINISTIC shard boundaries:
    records partition on fixed seq ranges (``(seq + bias) //
    rows_per_shard``), so a rerun under any CPU count / block split
    produces byte-identical parts and the skip-if-exists resume is
    safe — skipping by Ray block boundaries would silently drop or
    duplicate records whenever a rerun split blocks differently. Each
    part is ``<out_dir>/part-<shard:020d>.warc.gz`` written atomically
    (tmp + rename); lexicographic filename order == record order.
    A ``_shards.json`` meta pin records (rows_per_shard, gzip) so a
    resume/append with mismatched parameters fails loudly instead of
    mis-skipping.

    ``mode='ab'`` = resume/append. Every part carries a sidecar
    ``part-<shard>.meta.json`` (records, max_seq, sha256) written
    atomically with it, so append is SAFE, not skip-blind: for a group
    landing on an existing part, the rows at or below the part's
    recorded ``max_seq`` are re-serialized and digest-verified against
    the on-disk prefix (identical rerun -> skip), and rows with HIGHER
    seq are appended to the part (gzip members / records concatenate,
    so append preserves in-part seq order). A digest mismatch — the
    input rows for an already-written range changed — raises instead
    of silently keeping the stale part (the reference's single-file
    'ab' appends everything; an immutable seq-ranged part cannot
    interleave, so mutation of written ranges is an error here).
    Appends are retry-idempotent: a rerun of an already-applied delta
    byte-verifies the on-disk suffix and no-ops, and a crash between
    the part rename and the meta rename is healed on retry (the stale
    meta's digest matches the on-disk prefix and the extra bytes match
    the delta, so only the meta is rewritten — never a double append)."""
    import hashlib
    import json

    import pyarrow.compute as pc

    out_dir = os.path.abspath(out_dir)  # workers have their own CWD
    if mode == "xb" and os.path.isdir(out_dir) and glob.glob(os.path.join(out_dir, "*.warc*")):
        raise FileExistsError(out_dir + " already contains WARC shards (use mode='wb'/'ab')")
    if mode == "wb" and os.path.isdir(out_dir):
        for f in glob.glob(os.path.join(out_dir, "*.warc*")) + glob.glob(
                os.path.join(out_dir, "part-*.meta.json")):
            os.remove(f)
        meta_p = os.path.join(out_dir, "_shards.json")
        if os.path.exists(meta_p):
            os.remove(meta_p)
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_members else ".warc"

    meta = {"rows_per_shard": int(rows_per_shard), "gzip": bool(gzip_members)}
    meta_path = os.path.join(out_dir, "_shards.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            old = json.load(fh)
        if old != meta:
            raise ValueError(
                "existing shard layout %r does not match requested %r — "
                "resume would mis-skip; use mode='wb' to rewrite" % (old, meta))
    else:
        with open(meta_path, "w") as fh:
            json.dump(meta, fh)

    def add_shard(t: pa.Table) -> pa.Table:
        shard = pc.divide(
            pc.add(pc.cast(t["seq"], pa.int64()), pa.scalar(_SHARD_SEQ_BIAS)),
            pa.scalar(int(rows_per_shard), type=pa.int64()))
        return t.append_column("__shard", pc.cast(shard, pa.int64()))

    def _part_meta_path(shard_id: int) -> str:
        return os.path.join(out_dir, "part-%020d.meta.json" % shard_id)

    def _write_meta(shard_id: int, records: int, max_seq: int,
                    sha256: str) -> None:
        mtmp = _part_meta_path(shard_id) + ".tmp"
        with open(mtmp, "w") as fh:
            json.dump({"records": records, "max_seq": max_seq,
                       "sha256": sha256}, fh)
        os.replace(mtmp, _part_meta_path(shard_id))

    def _write_part(name: str, shard_id: int, payload: bytes,
                    records: int, max_seq: int) -> None:
        tmp = name + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(payload)
        os.replace(tmp, name)         # part first, then meta: a missing
        _write_meta(shard_id, records, max_seq,   # meta is recoverable
                    hashlib.sha256(payload).hexdigest())

    def write_shard(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"path": pa.array([], type=pa.string()),
                             "records": pa.array([], type=pa.int64())})
        shard_id = g.column("__shard")[0].as_py()
        g = g.drop_columns(["__shard"]).sort_by("seq")
        name = os.path.join(out_dir, "part-%020d%s" % (shard_id, ext))
        seqs = g.column("seq").to_pylist()
        if not os.path.exists(name):
            _write_part(name, shard_id, serialize_batch(g, gzip_members),
                        g.num_rows, int(seqs[-1]))
            return pa.table({"path": [name], "records": [g.num_rows]})
        # part exists: verify-then-append (never skip-blind — every
        # branch below checks on-disk bytes before writing or no-op'ing)
        pmeta = _part_meta_path(shard_id)
        if os.path.exists(pmeta):
            with open(pmeta) as fh:
                old = json.load(fh)
            n_old = sum(1 for s in seqs if s <= old["max_seq"])
            # disk bytes load lazily: the common pure-no-op resume
            # (prefix hash matches the sidecar, nothing to append)
            # writes nothing, so it need not read+hash a multi-GB part
            # — a desync would be caught by the next actual append
            _disk: list = []

            def _load_disk() -> tuple:
                if not _disk:
                    with open(name, "rb") as fh:
                        data = fh.read()
                    _disk.append((data, hashlib.sha256(data).hexdigest()))
                return _disk[0]

            if n_old:
                prefix = serialize_batch(g.slice(0, n_old), gzip_members)
                if hashlib.sha256(prefix).hexdigest() != old["sha256"]:
                    # retry of an ALREADY-APPLIED delta: the supplied
                    # "overlap" rows are the part's suffix (appended by
                    # the prior run, whose meta now covers them), not
                    # its prefix — a byte-verified no-op, not an error
                    existing, disk_sha = _load_disk()
                    if not (disk_sha == old["sha256"]
                            and existing.endswith(prefix)):
                        raise ValueError(
                            "%s: rows for already-written seq range <= %d "
                            "differ from the on-disk part (changed input or "
                            "shifted walk order) — refusing to append; use "
                            "mode='wb' to rewrite" % (name, old["max_seq"]))
            if n_old < g.num_rows:  # genuinely new higher-seq rows: append
                tail = serialize_batch(g.slice(n_old), gzip_members)
                existing, disk_sha = _load_disk()
                if disk_sha != old["sha256"]:
                    # part/meta desync — a crash landed between the part
                    # rename and the meta rename. Recoverable IFF the
                    # on-disk extra bytes are exactly this delta's tail
                    # (the append already happened): heal the meta and
                    # do NOT append the same records a second time.
                    if (existing.endswith(tail)
                            and hashlib.sha256(
                                existing[: len(existing) - len(tail)]
                            ).hexdigest() == old["sha256"]):
                        _write_meta(shard_id,
                                    old["records"] + (g.num_rows - n_old),
                                    int(seqs[-1]), disk_sha)
                    else:
                        raise ValueError(
                            "%s: on-disk bytes do not match the recorded "
                            "sha256 and do not end with this run's delta — "
                            "part/meta desync from an unrelated write; use "
                            "mode='wb' to rewrite" % name)
                else:
                    _write_part(name, shard_id, existing + tail,
                                old["records"] + (g.num_rows - n_old),
                                int(seqs[-1]))
        else:
            # part without sidecar: identical rerun skips, any
            # difference is an error (no way to know what's already in it)
            with open(name, "rb") as fh:
                existing = fh.read()
            if existing != serialize_batch(g, gzip_members):
                raise ValueError(
                    "%s exists without a .meta.json sidecar and its bytes "
                    "differ from this run's records — refusing to guess; "
                    "use mode='wb' to rewrite" % name)
            # identical initial write whose meta rename was lost to a
            # crash (part-then-meta protocol): heal the sidecar now, or
            # every future delta append to this shard dead-ends on the
            # missing-meta error above
            _write_meta(shard_id, g.num_rows, int(seqs[-1]),
                        hashlib.sha256(existing).hexdigest())
        return pa.table({"path": [name], "records": [g.num_rows]})

    manifest = (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(write_shard, batch_format="pyarrow")
        .to_pandas()
    )
    return sorted(manifest["path"].tolist())


# --- parser (for round-trip tests) ------------------------------------------

def parse_warc(data: bytes) -> list[dict]:
    """Parse .warc / .warc.gz bytes back into header-dict + payload rows."""
    if data[:2] == b"\x1f\x8b":
        # concatenated gzip members
        data = gzip.decompress(data)
    records = []
    pos = 0
    while pos < len(data):
        nl = data.index(b"\r\n", pos)
        version = data[pos:nl].decode()
        if not version.startswith("WARC/"):
            raise ValueError("bad record start at %d: %r" % (pos, version))
        pos = nl + 2
        headers: dict[str, str] = {}
        while True:
            nl = data.index(b"\r\n", pos)
            line = data[pos:nl].decode("utf-8")
            pos = nl + 2
            if not line:
                break
            k, v = line.split(": ", 1)
            headers[k] = v
        length = int(headers["Content-Length"])
        payload = data[pos: pos + length]
        pos += length + 4  # two CRLFs
        records.append({"headers": headers, "payload": payload})
    return records


def read_warc_dir(out_dir: str) -> list[dict]:
    recs = []
    for path in sorted(glob.glob(os.path.join(out_dir, "part-*.warc*"))):
        with open(path, "rb") as fh:
            recs.extend(parse_warc(fh.read()))
    return recs
