"""Byte-exact golden for the WARC/1.0 serializer (fixed clock, fixed
payload) — guards the physical format against regressions."""

import gzip

from warcit_ray.functions.digests import record_id, sha1_b32
from warcit_ray.sinks.warc_sink import parse_warc, serialize_record


def _row():
    payload = b"hello warc\n"
    return {
        "record_type": "resource",
        "target_uri": "http://ex.com/a%20b.txt",
        "warc_date": "2020-01-02T03:04:05Z",
        "creation_date": "2026-01-01T00:00:00Z",
        "source_uri": "file:///tmp/a b.txt",
        "content_type": "text/plain; charset=UTF-8",
        "payload": payload,
        "payload_digest": sha1_b32(payload),
        "record_id": record_id("http://ex.com/a%20b.txt",
                               "2020-01-02T03:04:05Z", sha1_b32(payload),
                               "resource", 7),
    }


EXPECTED = (
    b"WARC/1.0\r\n"
    b"WARC-Type: resource\r\n"
    b"WARC-Record-ID: <urn:uuid:808f128c-c988-5494-8993-e05593deb3d8>\r\n"
    b"WARC-Date: 2020-01-02T03:04:05Z\r\n"
    b"WARC-Target-URI: http://ex.com/a%20b.txt\r\n"
    b"WARC-Creation-Date: 2026-01-01T00:00:00Z\r\n"
    b"WARC-Source-URI: file:///tmp/a b.txt\r\n"
    b"WARC-Payload-Digest: sha1:QYOKKXUYJWVJWLQNLKZANBPUTOMVEG7G\r\n"
    b"WARC-Block-Digest: sha1:QYOKKXUYJWVJWLQNLKZANBPUTOMVEG7G\r\n"
    b"Content-Type: text/plain; charset=UTF-8\r\n"
    b"Content-Length: 11\r\n"
    b"\r\n"
    b"hello warc\n"
    b"\r\n\r\n"
)


def test_serialize_record_golden_bytes():
    raw = serialize_record(_row(), gzip_member=False)
    assert raw == EXPECTED


def test_gzip_member_framing():
    gz = serialize_record(_row(), gzip_member=True)
    assert gz[:2] == b"\x1f\x8b"
    assert gzip.decompress(gz) == EXPECTED
    # two members concatenated parse as two records
    recs = parse_warc(gz + gz)
    assert len(recs) == 2
    assert recs[0]["payload"] == b"hello warc\n"
    assert recs[0]["headers"]["WARC-Payload-Digest"].startswith("sha1:")
