"""14-digit WARC timestamps and ISO-8601 rendering.

Reimplements (from the published WARC/CDX conventions, matching the
reference's observable behavior — warcit.py:262-269 normalizes
``--fixed-dt`` by stripping ``[-:T ]`` separators, padding a partial
timestamp DOWN to 14 digits, and rendering ISO-8601 with 'Z'; the
golden test expects ``2010-12-26T10:11:12Z`` from
``-d 2010-12-26T10:11:12`` — test_warcit.py:88-95).
"""

from __future__ import annotations

import datetime
import re

DATE_TIMESPLIT = re.compile(r"[-:T ]")

# Pad-down filler: missing fields take their minimum value
# (month/day -> 01, time -> 00). A bare year pads with this template.
PAD_14_DOWN = "10000101000000"
TIMESTAMP_14 = "%Y%m%d%H%M%S"
ISO_FMT = "%Y-%m-%dT%H:%M:%SZ"


def pad_timestamp(ts: str, pad: str = PAD_14_DOWN) -> str:
    """Pad a partial digit-string timestamp to 14 digits."""
    return ts + pad[len(ts):]


def timestamp_to_datetime(ts14: str) -> datetime.datetime:
    return datetime.datetime.strptime(pad_timestamp(ts14), TIMESTAMP_14)


def datetime_to_iso_date(dt: datetime.datetime) -> str:
    return dt.strftime(ISO_FMT)


def timestamp_to_iso_date(ts: str) -> str:
    return datetime_to_iso_date(timestamp_to_datetime(str(ts)))


def iso_date_to_timestamp(iso: str) -> str:
    return datetime.datetime.strptime(iso, ISO_FMT).strftime(TIMESTAMP_14)


def normalize_fixed_dt(fixed_dt: str | None) -> str | None:
    """warcit.py:262-269: separator strip -> pad down -> ISO."""
    if not fixed_dt:
        return None
    digits = DATE_TIMESPLIT.sub("", str(fixed_dt))
    return timestamp_to_iso_date(pad_timestamp(digits))


def epoch_to_iso_date(epoch_s: float) -> str:
    """File-mtime fallback (base.py:94-97 + warcit.py:501): UTC, second
    precision, ISO with Z."""
    dt = datetime.datetime.utcfromtimestamp(epoch_s)
    return datetime_to_iso_date(dt.replace(microsecond=0))


def timestamp_now() -> str:
    """14-digit wall-clock timestamp (converter.py:242 behavior)."""
    return datetime.datetime.utcnow().strftime(TIMESTAMP_14)


def iso_now() -> str:
    return datetime.datetime.utcnow().strftime(ISO_FMT)
