"""Sinks: WARC serialization (.warc / .warc.gz), CSV logfile projection,
partitioned Parquet layouts."""
