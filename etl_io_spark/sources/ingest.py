"""Driver-side ingest utilities (SURVEY.md §2.1, S10-S12).

The reference downloads O*NET zips over HTTP, extracts them into a local
versioned cache, and resolves "newest version" by parsing directory names
(etl_io.py:653-736). These are driver-side utilities, not Spark operators —
at scale the download lands in object storage and executors read from
there — so they live outside the operator modules and gate their network
dependency behind an import-try (this container has no network).

Note the reference's update path contains a crash bug — it calls the
misspelled ``self.donwload_data`` (etl_io.py:732). We implement the intent.
"""

from __future__ import annotations

import os
import re
import zipfile
from html.parser import HTMLParser


def parse_version(name: str, prefix: str = "db_", suffix: str = "_text") -> float | None:
    """Version-float from a directory name (S12/F9; etl_io.py:672, 725):
    ``db_25_3_text`` -> 25.3. Returns None when the pattern doesn't match."""
    m = re.search(rf"{re.escape(prefix)}(\d+)_(\d+){re.escape(suffix)}", name)
    if not m:
        return None
    return float(f"{m.group(1)}.{m.group(2)}")


def latest_version_dir(cache_dir: str) -> str | None:
    """Pick the newest versioned, already-extracted directory in the cache
    (S12; etl_io.py:662-672: max over non-zip entries)."""
    best: tuple[float, str] | None = None
    if not os.path.isdir(cache_dir):
        return None
    for entry in os.listdir(cache_dir):
        if entry.endswith(".zip"):
            continue
        v = parse_version(entry)
        if v is not None and (best is None or v > best[0]):
            best = (v, entry)
    return os.path.join(cache_dir, best[1]) if best else None


class _ReleasePageParser(HTMLParser):
    """Minimal release-listing parser (stdlib only, no BeautifulSoup):
    collects every <h2>'s text and every <a>'s href."""

    def __init__(self) -> None:
        super().__init__()
        self.h2_texts: list[str] = []
        self.hrefs: list[str] = []
        self._in_h2 = 0
        self._h2_buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "h2":
            self._in_h2 += 1
            self._h2_buf = []
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)

    def handle_endtag(self, tag):
        if tag == "h2" and self._in_h2:
            self._in_h2 -= 1
            self.h2_texts.append("".join(self._h2_buf))

    def handle_data(self, data):
        if self._in_h2:
            self._h2_buf.append(data)


def scrape_release_page(
    html: str,
    heading_prefix: str = "O*NET ",
    zip_marker: str = "text.zip",
) -> tuple[float | None, str | None]:
    """Version discovery from a release-listing HTML page (S11;
    etl_io.py:710-736 ``get_new_database``): the newest version number is
    the first token after ``heading_prefix`` in the FIRST ``<h2>``, and
    the download target is the FIRST anchor whose href contains
    ``zip_marker`` — the reference's BeautifulSoup logic, reproduced with
    the stdlib ``html.parser`` so it is testable offline.

    Returns ``(version, href)``; either may be None when the page doesn't
    match (the reference would raise — we surface absence instead, and
    ``check_for_update`` treats None as "no update")."""
    p = _ReleasePageParser()
    p.feed(html)
    version: float | None = None
    for text in p.h2_texts:
        if heading_prefix in text:
            tok = text.split(heading_prefix, 1)[1].split()
            try:
                version = float(tok[0]) if tok else None
            except ValueError:
                version = None
            break
    href = next((h for h in p.hrefs if zip_marker in h), None)
    return version, href


def check_for_update(
    html: str, current_version: float, base_url: str = ""
) -> str | None:
    """S11 update gate: returns the absolute zip URL when the release page
    advertises a version newer than ``current_version``, else None (the
    reference prints 'database up to date'; etl_io.py:726-728). The
    download itself goes through :func:`download_and_extract`. (The
    reference's own update path then crashes on a misspelled
    ``self.donwload_data`` — intent, not the typo, implemented.)"""
    version, href = scrape_release_page(html)
    if version is None or href is None or current_version >= version:
        return None
    return f"{base_url}{href}"


def download_and_extract(url: str, cache_dir: str, chunk_size: int = 1 << 20) -> str:
    """HTTP download + unzip into the cache (S10; etl_io.py:679-708).

    Chunked streaming download (1 MiB chunks, not the reference's 1 KiB),
    then extract. Requires ``requests`` + network — gated so the engine
    imports cleanly in offline environments."""
    try:
        import requests
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "download_and_extract requires the 'requests' package"
        ) from e
    os.makedirs(cache_dir, exist_ok=True)
    zip_path = os.path.join(cache_dir, url.rsplit("/", 1)[-1])
    with requests.get(url, stream=True, timeout=60) as r:  # pragma: no cover
        r.raise_for_status()
        with open(zip_path, "wb") as f:
            for chunk in r.iter_content(chunk_size=chunk_size):
                f.write(chunk)
    out_dir = zip_path[: -len(".zip")] if zip_path.endswith(".zip") else zip_path + "_x"
    with zipfile.ZipFile(zip_path) as z:  # pragma: no cover
        z.extractall(out_dir)
    return out_dir


def extract_zip(zip_path: str, out_dir: str | None = None) -> str:
    """Offline-testable half of S10: unzip an already-downloaded archive."""
    out = out_dir or (
        zip_path[: -len(".zip")] if zip_path.endswith(".zip") else zip_path + "_x"
    )
    with zipfile.ZipFile(zip_path) as z:
        z.extractall(out)
    return out
