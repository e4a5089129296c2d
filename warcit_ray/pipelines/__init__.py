"""End-to-end pipelines: file/zip -> WARC build, the crawl-frontier
generation loop, and checkpoint/resume."""
