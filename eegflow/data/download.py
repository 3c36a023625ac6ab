"""OpenNeuro ds004148 downloader (ref download_dataset.py).

Same behavior contract as the reference: enumerate 60 subjects x 3 sessions x
2 tasks x {.vhdr, .vmrk, .eeg} S3 URLs, skip files already on disk (>200 B),
retry 3x with exponential backoff, sequential or 4-thread parallel mode, and
a single-file smoke test before committing to the full download. Network
access is environment-dependent; everything degrades to clear errors.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor, as_completed
from pathlib import Path
from typing import Dict, List, Optional

S3_BASE = "https://s3.amazonaws.com/openneuro.org/ds004148"

N_SUBJECTS = 60
SESSIONS = ("session1", "session2", "session3")
TASKS = ("eyesopen", "eyesclosed")
EXTENSIONS = (".vhdr", ".vmrk", ".eeg")
MIN_REAL_SIZE = 200  # bytes; git-annex placeholders are tiny


def enumerate_files(
    out_dir: str | Path,
    n_subjects: int = N_SUBJECTS,
    sessions=SESSIONS,
    tasks=TASKS,
) -> List[Dict[str, object]]:
    """All (url, local path) pairs for the dataset (ref download_dataset.py:41-68)."""
    out_dir = Path(out_dir)
    files = []
    for s in range(1, n_subjects + 1):
        sub = f"sub-{s:02d}"
        for ses in sessions:
            for task in tasks:
                for ext in EXTENSIONS:
                    rel = (f"{sub}/ses-{ses}/eeg/"
                           f"{sub}_ses-{ses}_task-{task}_eeg{ext}")
                    files.append({
                        "url": f"{S3_BASE}/{rel}",
                        "path": out_dir / rel,
                        "subject": sub, "session": ses, "task": task,
                    })
    return files


def download_file(
    file_info: Dict[str, object], retries: int = 3, timeout: float = 60.0
) -> Dict[str, object]:
    """Download one file with retry + exponential backoff + skip-if-exists
    (ref download_dataset.py:71-116)."""
    import requests

    path: Path = Path(file_info["path"])
    if path.exists() and path.stat().st_size > MIN_REAL_SIZE:
        return {**file_info, "status": "skipped", "size": path.stat().st_size}
    path.parent.mkdir(parents=True, exist_ok=True)

    last_error: Optional[str] = None
    for attempt in range(retries):
        try:
            with requests.get(str(file_info["url"]), stream=True,
                              timeout=timeout) as r:
                r.raise_for_status()
                tmp = path.with_suffix(path.suffix + ".part")
                with open(tmp, "wb") as f:
                    for chunk in r.iter_content(chunk_size=1 << 20):
                        f.write(chunk)
                tmp.rename(path)
            return {**file_info, "status": "downloaded",
                    "size": path.stat().st_size}
        except Exception as e:  # noqa: BLE001 — network errors are expected
            last_error = f"{type(e).__name__}: {e}"
            time.sleep(2.0**attempt)
    return {**file_info, "status": "failed", "error": last_error}


def download_all(
    out_dir: str | Path,
    n_subjects: int = N_SUBJECTS,
    parallel: bool = False,
    max_workers: int = 4,
    progress: bool = True,
) -> List[Dict[str, object]]:
    """Full dataset download, sequential (default, like the shipped reference
    path) or 4-thread parallel (ref download_dataset.py:119-147)."""
    files = enumerate_files(out_dir, n_subjects)
    results = []
    if parallel:
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            futures = {ex.submit(download_file, f): f for f in files}
            for fut in as_completed(futures):
                results.append(fut.result())
    else:
        iterator = files
        if progress:
            try:
                from tqdm import tqdm

                iterator = tqdm(files, desc="Downloading ds004148")
            except ImportError:
                pass
        for f in iterator:
            results.append(download_file(f))
    return results


def test_single_download(out_dir: str | Path) -> bool:
    """Smoke-test one small file before the full download
    (ref download_dataset.py:216-238)."""
    files = enumerate_files(out_dir, n_subjects=1)
    vhdr = next(f for f in files if str(f["path"]).endswith(".vhdr"))
    result = download_file(vhdr, retries=1, timeout=15.0)
    return result["status"] in ("downloaded", "skipped")
