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


def logfile_table(records_ds) -> "pa.Table":
    """The CSV logfile projection (warcit.py:316-330): fixed 7 columns,
    one row per written record except warcinfo, in seq order."""
    cols = ["seq", "log_file", "record_type", "target_uri", "warc_date",
            "content_type", "mime", "charset"]
    t = (
        records_ds.select_columns(cols)
        .sort("seq")
        .to_pandas()
    )
    t = t[t["record_type"] != "warcinfo"]
    # revisit/metadata rows only log file/type/url/timestamp (warcit.py:558-566,609-618)
    meta_mask = t["record_type"].isin(["revisit"]) | t["log_file"].eq("-")
    for col in ("content_type", "mime", "charset"):
        t.loc[meta_mask, col] = ""
    t = t.drop(columns=["seq"]).rename(
        columns={
            "log_file": "file", "record_type": "Record-Type", "target_uri": "URL",
            "warc_date": "timestamp", "content_type": "Content-Type",
        }
    )
    return pa.Table.from_pandas(t.reset_index(drop=True), preserve_index=False)


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
