"""Model-artifact fetch: path-or-URL resolve, cached download, tar.gz
extract (SURVEY.md §2 S7).

Mirrors the behavior of the reference's model-zoo plumbing
(geo_inference/utils/helpers.py:104-196 — ``get_directory`` /
``download_file_from_url`` / ``extract_tar_gz`` / ``get_model``),
re-expressed for a Spark deployment:

* stdlib ``urllib`` instead of ``requests`` (zero-dependency, and
  ``file://`` URLs make the whole path testable offline);
* bearer-token auth via the same Authorization header;
* download failures RAISE instead of logging-and-continuing — on a
  cluster a silently missing model file fails hundreds of executors
  later with a worse error;
* the DRIVER resolves/downloads once into a local cache, then ships
  the artifact to executors via ``spark-submit --archives``/
  ``--files`` (SparkFiles) — workers never each hit the zoo, which at
  1000 executors would be a thundering herd against the model host.

Extraction flattens member paths to their basename exactly like the
reference (a zoo tarball is a flat bundle), which also neutralizes
path-traversal names; non-regular members (symlinks, devices) are
skipped.
"""

from __future__ import annotations

import os
import tarfile
from pathlib import Path
from urllib.parse import urlparse
from urllib.request import Request, urlopen

_CHUNK = 1 << 16


def get_directory(work_directory: str | Path | None = None) -> Path:
    """The artifact cache dir: the user's path, or
    ``~/.cache/geo-inference-spark`` (reference helpers.py:126-144)."""
    if work_directory:
        work = Path(work_directory)
    else:
        work = Path.home() / ".cache" / "geo-inference-spark"
    work.mkdir(parents=True, exist_ok=True)
    return work


def download_file(
    url: str, save_path: str | Path, access_token: str | None = None
) -> Path:
    """Stream ``url`` to ``save_path``; optional bearer token
    (reference helpers.py:148-169, but failures raise)."""
    headers = {}
    if access_token is not None:
        headers["Authorization"] = f"Bearer {access_token}"
    req = Request(url, headers=headers)
    save_path = Path(save_path)
    tmp = save_path.with_suffix(save_path.suffix + ".part")
    try:
        with urlopen(req) as resp:
            # http(s) responses carry a status; file:// has none
            # (urlopen raises URLError/HTTPError on failures anyway)
            status = getattr(resp, "status", None)
            if status is not None and status != 200:
                raise RuntimeError(
                    f"failed to download {url}: status {status}"
                )
            with open(tmp, "wb") as f:
                while True:
                    chunk = resp.read(_CHUNK)
                    if not chunk:
                        break
                    f.write(chunk)
        os.replace(tmp, save_path)  # atomic: no half-written cache hits
    except Exception:
        tmp.unlink(missing_ok=True)
        raise
    return save_path


def extract_tar_gz(
    tar_gz_file: str | Path, target_directory: str | Path,
    remove_archive: bool = True,
) -> list[Path]:
    """Extract regular members of a ``.tar.gz`` flattened to their
    basenames into ``target_directory``; remove the archive after
    (reference helpers.py:104-123). Returns the extracted paths."""
    target = Path(target_directory)
    target.mkdir(parents=True, exist_ok=True)
    out: list[Path] = []
    with tarfile.open(tar_gz_file, "r:gz") as tar:
        for member in tar.getmembers():
            if not member.isreg():
                continue
            name = os.path.basename(member.name)
            if not name:
                continue
            src = tar.extractfile(member)
            dst = target / name
            with open(dst, "wb") as f:
                while True:
                    chunk = src.read(_CHUNK)
                    if not chunk:
                        break
                    f.write(chunk)
            out.append(dst)
    if remove_archive:
        Path(tar_gz_file).unlink()
    return out


def get_model(
    model_path_or_url: str,
    work_dir: str | Path | None = None,
    access_token: str | None = None,
) -> Path:
    """Resolve a model spec to a local file (reference
    helpers.py:172-196): a URL is downloaded into the cache dir keyed
    by basename (re-fetch skipped when cached); a local path must
    exist. A ``.tar.gz`` artifact (local or fetched) is extracted into
    a sibling cache subdir and the single model file inside is
    returned (multi-file bundles return the first entry, sorted)."""
    work = get_directory(work_dir)
    parsed = urlparse(str(model_path_or_url))
    if parsed.scheme and not os.path.exists(model_path_or_url):
        name = os.path.basename(parsed.path)
        if not name:
            raise ValueError(
                f"cannot derive a file name from {model_path_or_url!r}"
            )
        local = work / name
        if not local.is_file():
            download_file(model_path_or_url, local, access_token)
    else:
        local = Path(model_path_or_url)
        if not local.is_file():
            raise ValueError(f"model {model_path_or_url!r} not found")
    if local.name.endswith(".tar.gz"):
        bundle = work / (local.name[: -len(".tar.gz")] + ".d")
        if not bundle.is_dir():
            extract_tar_gz(local, bundle, remove_archive=False)
        files = sorted(p for p in bundle.iterdir() if p.is_file())
        if not files:
            raise ValueError(f"empty model bundle {model_path_or_url!r}")
        return files[0]
    return local
