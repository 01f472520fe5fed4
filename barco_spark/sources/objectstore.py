"""Scheme-generic filesystem helpers for object-store log roots.

Everything here goes through ``pyarrow.fs.FileSystem.from_uri`` — one
code path serves ``file://`` (the tested scheme in this repo's suite),
``s3://``, ``gs://``, and ``hdfs://``. The local-path branches of
EventLog never come here; these helpers exist so the maintenance
surfaces (compaction, retention, membership) work on roots where
POSIX renames don't exist.

Design constraints honored throughout:
- no renames: object stores have none; visibility flips ride either a
  single small-object PUT (the per-topic epoch manifest) or the
  latest-wins semantics of an append-only log (consumer offsets);
- deletes are always of files whose content has already been rewritten
  or aged out, so any crash window leaves only harmless duplicates or
  invisible orphans, never data loss.
"""

from __future__ import annotations

import json
from typing import Any


def fs_for(uri: str):
    """(filesystem, path) for a URI; works for file:// and object
    stores alike. Raw paths may contain characters a URI parser
    rejects (spaces in consumer ids), so the path portion is percent-
    encoded for parsing — pyarrow hands back the decoded path."""
    from urllib.parse import quote

    from pyarrow import fs as pafs

    return pafs.FileSystem.from_uri(quote(uri, safe=":/"))


def read_json(uri: str) -> dict[str, Any] | None:
    """Small-object JSON GET; None when the object does not exist."""
    f, path = fs_for(uri)
    try:
        with f.open_input_stream(path) as stream:
            return json.loads(stream.read().decode("utf-8"))
    except (FileNotFoundError, OSError):
        return None


def write_json(uri: str, obj: dict[str, Any]) -> None:
    """Small-object JSON PUT — the atomic visibility flip on object
    stores (a PUT replaces the whole object or nothing)."""
    f, path = fs_for(uri)
    parent = path.rsplit("/", 1)[0]
    f.create_dir(parent, recursive=True)
    with f.open_output_stream(path) as stream:
        stream.write(json.dumps(obj).encode("utf-8"))


def delete_file(uri: str) -> bool:
    f, path = fs_for(uri)
    try:
        f.delete_file(path)
        return True
    except (FileNotFoundError, OSError):
        return False


def list_files(uri: str, suffix: str = "") -> list[tuple[str, float, int]]:
    """Recursive file listing under a URI prefix: (full_uri, mtime_s,
    size) per file. Missing prefix -> []."""
    from pyarrow import fs as pafs

    f, path = fs_for(uri)
    scheme = uri.split("://", 1)[0]
    try:
        infos = f.get_file_info(pafs.FileSelector(path, recursive=True))
    except (FileNotFoundError, OSError):
        return []
    out = []
    for info in infos:
        if info.type != pafs.FileType.File:
            continue
        if suffix and not info.path.endswith(suffix):
            continue
        mtime = info.mtime.timestamp() if info.mtime is not None else 0.0
        out.append((f"{scheme}://{info.path}", mtime, info.size or 0))
    return sorted(out)


def list_subdirs(uri: str) -> list[str]:
    """Immediate child directory NAMES under a URI prefix ([] if the
    prefix is missing)."""
    from pyarrow import fs as pafs

    f, path = fs_for(uri)
    try:
        infos = f.get_file_info(pafs.FileSelector(path, recursive=False))
    except (FileNotFoundError, OSError):
        return []
    return sorted(
        info.path.rsplit("/", 1)[-1]
        for info in infos
        if info.type == pafs.FileType.Directory
    )


def exists(uri: str) -> bool:
    from pyarrow import fs as pafs

    f, path = fs_for(uri)
    try:
        return f.get_file_info(path).type != pafs.FileType.NotFound
    except (FileNotFoundError, OSError):
        return False


def delete_prefix(uri: str) -> int:
    """Delete every file under a prefix (the prefix itself may remain
    as an empty 'directory' on stores that materialize them). Returns
    files deleted."""
    n = 0
    for file_uri, _mtime, _size in list_files(uri):
        if delete_file(file_uri):
            n += 1
    return n
