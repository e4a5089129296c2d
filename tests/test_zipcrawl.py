"""zip:// pseudo-URL crawl over the reference's own 22-file corpus —
the frontier machinery (seen-set, politeness, robots, priority) driving
local archive content, per the north rule."""

import os

import pyarrow.parquet as pq

from warcit_ray.pipelines.zipcrawl import (
    crawl_zip,
    extract_links,
    resolve_member,
    zip_url,
)

from .conftest import IANA_ZIP

ROOT = "www.iana.org"


def test_extract_links_resolution():
    html = '<a href="/domains">d</a> <a href="about/">a</a> ' \
           '<img src="../_img/x.png"> <a href="http://ext.example/">e</a>' \
           '<a href="page.html?q=1#frag">p</a>'
    links = extract_links(html, ROOT + "/sub/index.html", ROOT)
    assert links == [
        ROOT + "/domains",
        ROOT + "/sub/about",   # normpath drops the trailing slash form
        ROOT + "/_img/x.png",
        ROOT + "/sub/page.html",
    ]


def test_resolve_member_variants():
    import zipfile

    zp = zipfile.ZipFile(IANA_ZIP)
    assert resolve_member(zp, ROOT + "/index.html") == ROOT + "/index.html"
    # directory link -> index.html
    assert resolve_member(zp, ROOT + "/about") == ROOT + "/about/index.html"
    assert resolve_member(zp, ROOT + "/nope") is None
    # extensionless page resolves directly
    assert resolve_member(zp, ROOT + "/domains/idn-tables") == ROOT + "/domains/idn-tables"
    zp.close()


def test_crawl_zip_end_to_end(tmp_path):
    ck = str(tmp_path / "ck")
    res = crawl_zip(IANA_ZIP, ROOT, [ROOT + "/index.html"],
                    checkpoint_dir=ck, max_generations=40)
    visited = {u for _, _, u in res["visit_log"]}
    # the seed and its direct assets are reached
    assert zip_url(IANA_ZIP, ROOT + "/index.html") in visited
    assert zip_url(IANA_ZIP, ROOT + "/_css/2015.1/screen.css") in visited
    # a healthy portion of the 22-file corpus is reachable by links
    assert len(visited) >= 10
    # single host -> politeness caps per-generation admissions at capacity
    per_gen: dict = {}
    for g, h, u in res["visit_log"]:
        per_gen.setdefault(g, 0)
        per_gen[g] += 1
    assert max(per_gen.values()) <= 16
    # records on disk: digests + payloads verify against the zip itself
    import hashlib
    import zipfile
    import base64

    zp = zipfile.ZipFile(IANA_ZIP)
    rows = []
    for g in sorted(os.listdir(ck)):
        d = os.path.join(ck, g, "records")
        if os.path.isdir(d):
            for f in sorted(os.listdir(d)):
                rows.extend(pq.read_table(os.path.join(d, f)).to_pylist())
    ok = [r for r in rows if r["status"] == 200]
    assert len(ok) >= 10
    for r in ok[:20]:
        member = r["target_uri"].split("!", 1)[1]
        payload = bytes(r["payload"])
        expected = "sha1:" + base64.b32encode(hashlib.sha1(payload).digest()).decode()
        assert r["payload_digest"] == expected
        assert len(payload) == r["content_length"]
    zp.close()
    # determinism: a second run visits the identical URL set in the same
    # per-generation grouping
    res2 = crawl_zip(IANA_ZIP, ROOT, [ROOT + "/index.html"],
                     max_generations=40)
    assert sorted(res["visit_log"]) == sorted(res2["visit_log"])


def test_crawl_zip_robots_gate(tmp_path):
    # synthesize an archive with a robots-disallowed subtree
    import zipfile

    arch = str(tmp_path / "site.zip")
    with zipfile.ZipFile(arch, "w") as zp:
        zp.writestr("site/robots.txt", "User-agent: *\nDisallow: /secret/\n")
        zp.writestr("site/index.html",
                    '<a href="/secret/x.html">s</a><a href="/ok.html">o</a>')
        zp.writestr("site/secret/x.html", "<html>hidden</html>")
        zp.writestr("site/ok.html", "<html>fine</html>")
    res = crawl_zip(arch, "site", ["site/index.html"], max_generations=10)
    visited = {u.split("!", 1)[1] for _, _, u in res["visit_log"]}
    assert "site/ok.html" in visited
    assert "site/secret/x.html" not in visited
    assert res["robots_blocked"] >= 1


def test_crawl_zip_resume(tmp_path):
    full_ck = str(tmp_path / "full")
    crawl_zip(IANA_ZIP, ROOT, [ROOT + "/index.html"],
              checkpoint_dir=full_ck, max_generations=12)
    part_ck = str(tmp_path / "part")
    crawl_zip(IANA_ZIP, ROOT, [ROOT + "/index.html"],
              checkpoint_dir=part_ck, max_generations=3)
    crawl_zip(IANA_ZIP, ROOT, [ROOT + "/index.html"],
              checkpoint_dir=part_ck, max_generations=12, resume=True)

    def all_visited(root):
        out = []
        for g in sorted(os.listdir(root)):
            d = os.path.join(root, g, "records")
            if os.path.isdir(d):
                for f in sorted(os.listdir(d)):
                    out.extend(r["target_uri"]
                               for r in pq.read_table(os.path.join(d, f)).to_pylist())
        return sorted(out)

    assert all_visited(full_ck) == all_visited(part_ck)
