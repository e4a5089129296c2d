"""Minimal robots.txt semantics for the crawl gate: User-agent: * groups,
Disallow path prefixes (empty Disallow = allow all). Standard public
robots exclusion protocol subset — enough to gate a frontier."""

from __future__ import annotations

from urllib.parse import urlsplit


def parse_robots(text: str) -> list[str]:
    """Extract Disallow prefixes that apply to User-agent: * ."""
    disallows: list[str] = []
    applies = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            applies = val == "*"
        elif key == "disallow" and applies and val:
            disallows.append(val)
    return disallows


def url_path(url: str) -> str:
    if url.startswith(("zip://", "file://")):
        return "/" + url.split("://", 1)[1].split("/", 1)[-1]
    try:
        return urlsplit(url).path or "/"
    except ValueError:
        return "/"


def allowed(url: str, disallows: list[str] | tuple[str, ...]) -> bool:
    if not disallows:
        return True
    path = url_path(url)
    return not any(path.startswith(d) for d in disallows)
