"""Engine configuration — the distributed analogue of WARCIT.__init__
(warcit.py:175-256): every CLI knob normalized once on the driver and
broadcast into the stages.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from .functions.mime import MimeOverrides
from .functions.timestamps import iso_now, normalize_fixed_dt


@dataclass
class WarcitConfig:
    url_prefix: str = ""
    inputs: list = field(default_factory=list)
    name: str = "out.warc.gz"
    fixed_dt: Optional[str] = None            # normalized below
    index_files: str = "index.html,index.htm"  # warcit.py:112-116 default
    mime_method: str = "filename"              # 'filename' | 'magic'
    mime_overrides: Optional[object] = None    # dict | 'pat=mime,...' | None
    no_xhtml: bool = False
    charset: Optional[str] = None              # None | 'detect' | literal
    include: Optional[str] = None
    exclude: Optional[str] = None
    mapfile: Optional[list] = None             # pre-loaded rows (sidetables.load_mapfile)
    conversions: Optional[dict] = None         # url -> [result dicts]
    transclusions: Optional[dict] = None       # url -> [tc dicts]
    warcinfo: bool = True
    gzip: bool = True
    creation_date: Optional[str] = None        # injected clock (tests pin it)
    cmdline: str = "warcit-ray"

    def __post_init__(self):
        self.fixed_dt = normalize_fixed_dt(self.fixed_dt)
        if self.index_files:
            self.index_files_tuple = tuple(
                "/" + x.lower() for x in self.index_files.split(",")
            )
        else:
            self.index_files_tuple = tuple()
        self.overrides = MimeOverrides(self.mime_overrides) if self.mime_overrides else None
        if self.creation_date is None:
            self.creation_date = iso_now()
