"""Release-metadata parsers — tiny driver-side reads.

Reference parity:
* metalink XML (``parsers/uniprot/metalink.py:24-96``): version / publisher
  / license + per-file checksums;
* release-notes regex extraction (``parsers/uniprot/relnotes.py:44-111``):
  release version, date, per-dataset entry counts.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


@dataclass
class MetalinkInfo:
    version: str | None = None
    publisher: str | None = None
    license_url: str | None = None
    files: dict[str, dict] = field(default_factory=dict)  # name -> {size, checksums}


def parse_metalink(payload: str | bytes) -> MetalinkInfo:
    """Metalink XML -> version/publisher/license + file checksum map."""
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8")
    root = ET.fromstring(payload)
    info = MetalinkInfo()
    for el in root.iter():
        tag = _local(el.tag)
        if tag == "version" and info.version is None:
            info.version = (el.text or "").strip() or None
        elif tag == "publisher":
            for c in el:
                if _local(c.tag) == "name":
                    info.publisher = (c.text or "").strip() or None
        elif tag == "license":
            for c in el:
                if _local(c.tag) == "url":
                    info.license_url = (c.text or "").strip() or None
        elif tag == "file":
            name = el.get("name") or ""
            entry: dict = {"checksums": {}}
            for c in el.iter():
                ctag = _local(c.tag)
                if ctag == "size":
                    try:
                        entry["size"] = int((c.text or "0").strip())
                    except ValueError:
                        pass
                elif ctag in ("hash", "verification"):
                    htype = c.get("type")
                    if htype and c.text:
                        entry["checksums"][htype] = c.text.strip()
            if name:
                info.files[name] = entry
    return info


_RELEASE_RE = re.compile(r"Release\s+(\d{4}_\d{2})\s+of\s+(\d{2}-\w{3}-\d{4})")
_COUNT_RE = re.compile(
    r"([\w/ -]+?)\s+contains\s+([\d,]+)\s+(?:sequence\s+)?entr(?:y|ies)",
    re.IGNORECASE,
)


@dataclass
class ReleaseNotes:
    release: str | None = None
    date: str | None = None
    entry_counts: dict[str, int] = field(default_factory=dict)


def parse_relnotes(payload: str | bytes) -> ReleaseNotes:
    """Release-notes text -> version, date, per-dataset entry counts."""
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8")
    out = ReleaseNotes()
    m = _RELEASE_RE.search(payload)
    if m:
        out.release, out.date = m.group(1), m.group(2)
    for name, count in _COUNT_RE.findall(payload):
        out.entry_counts[name.strip()] = int(count.replace(",", ""))
    return out
