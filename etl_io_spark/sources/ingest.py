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
