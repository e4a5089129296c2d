"""file/ZIP -> WARC as a Ray Data pipeline.

Reference lifecycle reproduced (warcit.py:395-448) as:

    enumerate_seeds (driver, ordering frozen into `seq`)
      -> Dataset
      -> map_batches(PayloadLoader)        # actor pool, zip handles cached
      -> map_batches(RecordBuilder(cfg))   # resource/revisit/conversion/
                                           # transclusion expansion
      -> union(warcinfo row)
      -> [sort('seq')] only at physical WARC emission; the Parquet sink
         keeps the seq column instead (SURVEY §2.5 ordering note).
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..config import WarcitConfig
from ..sources.seeds import PayloadLoader, seeds_dataset
from ..stages.build_records import RecordBuilder, warcinfo_row


def build_warc_dataset(cfg: WarcitConfig, *, payload_concurrency: int = 4,
                       build_concurrency: int = 4, batch_size: int = 64):
    """The record Dataset (lazy). Batch size is small because payload
    rows are wide (binary blobs); blocks stay within the object-store
    target block size."""
    import ray.data as rd

    ds = seeds_dataset(cfg.inputs, cfg.url_prefix, strict=False)
    ds = ds.map_batches(
        PayloadLoader,
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=payload_concurrency,
    )
    ds = ds.map_batches(
        RecordBuilder,
        fn_constructor_args=(cfg,),
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=build_concurrency,
    )
    if cfg.warcinfo:
        ds = rd.from_arrow(warcinfo_row(cfg)).union(ds)
    return ds


LOGFILE_COLUMNS = ["file", "Record-Type", "URL", "timestamp",
                   "Content-Type", "mime", "charset"]


def logfile_dataset(records_ds):
    """The CSV logfile projection (warcit.py:316-330) as a DISTRIBUTED
    Dataset: fixed 7 columns plus the ``seq`` ordering key, one row per
    written record except warcinfo. The projection runs inside
    map_batches — the full table never lands on the driver (VERDICT r3
    #2: at 10^10 records the K3 log is corpus-sized). Consume with
    :func:`write_logfile_shards` (sharded, resumable), stream with
    :func:`write_logfile_csv` (single file, one batch in memory), or
    small-collect with :func:`logfile_table` (fixture/test scale)."""
    cols = ["seq", "log_file", "record_type", "target_uri", "warc_date",
            "content_type", "mime", "charset"]

    def project(t: pa.Table) -> pa.Table:
        # all-Arrow projection (zero pandas transit in the K3 hot path)
        import pyarrow.compute as pc

        rt = pc.cast(t.column("record_type"), pa.string())
        t = t.filter(pc.fill_null(pc.invert(pc.equal(rt, "warcinfo")), True))
        rt = pc.cast(t.column("record_type"), pa.string())
        # revisit/metadata rows only log file/type/url/timestamp
        # (warcit.py:558-566,609-618); null-safe like the pandas
        # predicate this replaces (null -> not a meta row)
        meta_mask = pc.or_(
            pc.fill_null(pc.equal(rt, "revisit"), False),
            pc.fill_null(
                pc.equal(pc.cast(t.column("log_file"), pa.string()), "-"),
                False))
        empty = pa.scalar("", type=pa.string())

        def blank(col: str):
            return pc.if_else(meta_mask, empty,
                              pc.cast(t.column(col), pa.string()))

        return pa.table({
            "seq": t.column("seq"),
            "file": t.column("log_file"),
            "Record-Type": rt,
            "URL": t.column("target_uri"),
            "timestamp": t.column("warc_date"),
            "Content-Type": blank("content_type"),
            "mime": blank("mime"),
            "charset": blank("charset"),
        })

    return records_ds.select_columns(cols).map_batches(
        project, batch_format="pyarrow")


def logfile_table(records_ds) -> "pa.Table":
    """Small-collect convenience over :func:`logfile_dataset` (CLI
    single-file mode and the fixture oracle query): sorts by seq and
    drops the key. Collects on the driver — test/fixture scale only;
    the scale path is :func:`write_logfile_shards`."""
    t = logfile_dataset(records_ds).sort("seq").to_pandas()
    return pa.Table.from_pandas(t.drop(columns=["seq"]).reset_index(drop=True),
                                preserve_index=False)


def write_logfile_csv(records_ds, path: str) -> int:
    """Stream the logfile projection into ONE CSV in seq order
    (DictWriter-parity: QUOTE_MINIMAL, CRLF — warcit.py:316-330). The
    driver holds one batch at a time (same discipline as
    write_warc_file). Returns the row count."""
    import csv

    n = 0
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(LOGFILE_COLUMNS)
        for batch in logfile_dataset(records_ds).sort("seq").iter_batches(
                batch_size=4096, batch_format="pandas"):
            w.writerows(batch[LOGFILE_COLUMNS].itertuples(index=False,
                                                          name=None))
            n += len(batch)
    return n


_LOG_SEQ_BIAS = 1 << 32


def write_logfile_shards(records_ds, out_dir: str,
                         rows_per_shard: int = 65536) -> list:
    """Distributed sharded K3 sink with DETERMINISTIC shard boundaries
    (the write_warc_shards discipline, warc_sink.py): rows partition on
    fixed seq ranges, each part ``part-<shard:020d>.csv`` (header + rows
    in seq order) written atomically via tmp+rename; lexicographic
    filename order == record order. A rerun reproduces byte-identical
    parts, so resume skips existing identical parts and raises on a
    content mismatch instead of mis-skipping. A ``_shards.json``
    sidecar pins rows_per_shard on first write (the write_warc_shards
    discipline): resuming with a different value would write a second,
    overlapping set of part files under different names — refused."""
    import json

    import pyarrow.compute as pc

    out_dir = os.path.abspath(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    meta = {"rows_per_shard": int(rows_per_shard)}
    meta_path = os.path.join(out_dir, "_shards.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            old = json.load(fh)
        if old != meta:
            raise ValueError(
                "existing logfile shard layout %r does not match requested "
                "%r — a resume would write overlapping parts under "
                "different names" % (old, meta))
    else:
        # no sidecar but parts present = a dir written before the
        # sidecar existed (or by something else): silently pinning the
        # REQUESTED value would bless whatever layout the caller asked
        # for and let a mismatched resume write overlapping parts under
        # different names with no error — refuse instead
        stale = [f for f in os.listdir(out_dir)
                 if f.startswith("part-") and f.endswith(".csv")]
        if stale:
            raise ValueError(
                "%s contains logfile parts but no _shards.json sidecar "
                "(predates the layout pin) — cannot verify rows_per_shard; "
                "delete the parts or write the sidecar manually" % out_dir)
        with open(meta_path, "w") as fh:
            json.dump(meta, fh)

    def add_shard(t: pa.Table) -> pa.Table:
        shard = pc.divide(
            pc.add(pc.cast(t["seq"], pa.int64()), pa.scalar(_LOG_SEQ_BIAS)),
            pa.scalar(int(rows_per_shard), type=pa.int64()))
        return t.append_column("__shard", pc.cast(shard, pa.int64()))

    def write_shard(g: "pd.DataFrame"):
        import csv
        import io

        import pandas as pd  # noqa: F401 (batch_format)

        if len(g) == 0:
            return pd.DataFrame({"path": [], "records": []})
        shard_id = int(g["__shard"].iloc[0])
        g = g.sort_values("seq")
        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow(LOGFILE_COLUMNS)
        w.writerows(g[LOGFILE_COLUMNS].itertuples(index=False, name=None))
        payload = buf.getvalue().encode("utf-8")
        name = os.path.join(out_dir, "part-%020d.csv" % shard_id)
        if os.path.exists(name):
            with open(name, "rb") as fh:
                if fh.read() == payload:
                    return pd.DataFrame({"path": [name], "records": [len(g)]})
            raise ValueError(
                "%s exists with different content (changed input or walk "
                "order) — refusing to overwrite on resume" % name)
        tmp = name + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(payload)
        os.replace(tmp, name)
        return pd.DataFrame({"path": [name], "records": [len(g)]})

    import pandas as pd  # noqa: F401

    manifest = (
        logfile_dataset(records_ds)
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()
    )
    return sorted(manifest["path"].tolist())


def run_warcit(cfg: WarcitConfig, output_path: str | None = None, mode: str = "xb",
               **kw) -> dict:
    """Full run: build records, optionally serialize physical WARC,
    return summary counts (the reference's 'Wrote N resources' line,
    warcit.py:444, as data)."""
    from ..sinks.warc_sink import write_warc_file

    ds = build_warc_dataset(cfg, **kw)
    if output_path:
        n = write_warc_file(ds, output_path, mode=mode, gzip_members=cfg.gzip)
    else:
        n = ds.count()
    n_resources = n - (1 if cfg.warcinfo else 0)
    return {"records_written": n, "resources": n_resources, "name": cfg.name}
