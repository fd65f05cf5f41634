"""Atomic generation manifests for persisted index stores.

The persisted stores (``operators/search.py`` inverted index,
``operators/similarity.py`` IVF lists) are plain parquet directories. Two
of their lifecycle steps rewrite shared one-row or whole-directory state:

- incremental add rewrites the one-row stats parquet (previously a
  ``mode="overwrite"`` that DELETES the old file before the new one is
  visible — a concurrent loader in that window read a missing directory);
- compaction rewrites the postings/lists wholesale, which cannot be done
  in place at all without a window where readers see half a store.

The fix is the classic one: every mutable component of the store is a
VERSIONED directory (``stats_v3/``, ``postings_v7/``...), and one tiny
``MANIFEST`` JSON file names the current version of each. Writers build
the new generation fully, then flip the manifest with the POSIX-atomic
``os.replace`` (write to a temp name in the same directory, rename over).
Readers resolve every component through the manifest, so they observe
either the old complete generation or the new complete generation, never
a mix and never a missing directory. A crash before the flip leaves the
old generation fully intact; stale version directories are garbage, not
corruption, and are swept opportunistically after a successful flip.

Shared-filesystem requirement (same as ``sources/tar_shards.py``): the
manifest is read and written with driver-side ``os`` calls, so the store
path must be on a filesystem the driver sees POSIX-style (local disk,
NFS). Object-store paths (``s3://``, ``hdfs://``...) are rejected up
front — on those, atomic rename does not exist and this scheme would
silently not be atomic.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile

_MANIFEST_NAME = "MANIFEST"
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def require_posix_path(path: str, what: str = "store") -> None:
    """Fail fast on URI-scheme paths: the manifest protocol relies on
    POSIX atomic rename, which object stores do not provide."""
    if _SCHEME_RE.match(path):
        raise ValueError(
            f"{what} path {path!r} uses a URI scheme; the manifest "
            "protocol needs a POSIX filesystem the driver can rename on "
            "(local disk or a shared mount)"
        )


def dir_exists(spark, path: str) -> bool:
    """Existence check THROUGH Spark's Hadoop filesystem layer, so it is
    correct on every FS Spark can read (local, NFS, HDFS, s3a...) —
    driver-side ``os.path.exists`` silently answers False for any
    non-local URI, which would make optional store components (tombstone
    dirs, streamed fold partitions) invisible exactly where they matter."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def reset_generations(path: str, components: dict[str, str]) -> None:
    """Remove every manifest-protocol artifact under ``path`` — the
    MANIFEST file, versioned ``{component}_vN`` dirs, and the legacy
    component dirs themselves — so a from-scratch rebuild over an
    existing store cannot be shadowed by a stale manifest (pointing at
    generation dirs the rebuild never writes) or haunted by stale
    tombstones filtering the fresh data. No-op on a path the driver
    cannot see (object stores never acquire manifests in the first
    place: the writers that create them require POSIX paths)."""
    if not os.path.isdir(path):
        return
    mf = os.path.join(path, _MANIFEST_NAME)
    if os.path.exists(mf):
        os.unlink(mf)
    # match on the component DIRECTORY base names (dict values), not the
    # manifest keys: stores where key != dir name (e.g. the signature
    # store's "folds" -> "sigs_folds") would otherwise leave that
    # component's data behind for the rebuilt store to union back in
    for name in os.listdir(path):
        for base in set(components.values()):
            if name == base or name.startswith(f"{base}_v"):
                shutil.rmtree(os.path.join(path, name), ignore_errors=True)


def read_manifest(path: str, defaults: dict[str, str]) -> dict[str, str]:
    """Current component->directory mapping for the store at ``path``.
    A store written before manifests existed has no MANIFEST file; it
    reads as ``defaults`` (the legacy fixed directory names)."""
    mf = os.path.join(path, _MANIFEST_NAME)
    if not os.path.exists(mf):
        return dict(defaults)
    with open(mf) as f:
        out = dict(defaults)
        out.update(json.load(f))
        return out


def write_manifest(
    path: str,
    mapping: dict[str, str],
    expected: dict[str, str] | None = None,
) -> None:
    """Atomically publish a new generation: temp file + ``os.replace``.

    The store writers are SINGLE-WRITER by contract (like every
    log-structured store here: adds, deletes, compactions run from one
    maintenance process; readers are unlimited). ``expected`` is the
    cheap guard for accidental violations: pass the manifest snapshot
    the new mapping was DERIVED from, and the write re-reads the file
    just before the flip — if another writer flipped in between, raise
    instead of silently erasing their published generation (a
    read-modify-write lost update whose data the next GC would delete
    permanently). Not a lock — a true race within the final millisecond
    can still slip through — but it converts the realistic overlap
    (two humans, two schedulers) from silent data loss into an error."""
    require_posix_path(path)
    if expected is not None:
        current = read_manifest(path, expected)
        if current != expected:
            raise RuntimeError(
                f"manifest at {path!r} changed since it was read "
                f"(expected {expected}, found {current}) — another "
                "writer is active; these stores are single-writer: "
                "re-read and retry"
            )
    os.makedirs(path, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=path, prefix=".manifest-")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(mapping, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(path, _MANIFEST_NAME))
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def state_fingerprint(path: str, dirs: list[str]) -> str:
    """Content fingerprint of the given component directories under
    ``path`` — md5 over each directory's sorted (relative path, size)
    file listing, with an explicit marker for absent directories.

    This is how DERIVED artifacts (e.g. the dedup pair cache) detect
    that the state they were computed from has moved underneath them
    WITHOUT a manifest flip: tombstone appends and streaming fold
    partitions mutate their directories in place, so the manifest alone
    cannot witness them. Every Spark write creates uniquely-named part
    files (task/attempt ids in the name), so any append, overwrite or
    compaction changes the listing. Sizes are included so a same-named
    rewrite is still caught; mtimes are deliberately NOT (copying a
    store byte-for-byte must keep caches valid)."""
    import hashlib

    h = hashlib.md5()
    for d in sorted(dirs):
        full = os.path.join(path, d)
        if not os.path.isdir(full):
            h.update(f"absent:{d}\x00".encode())
            continue
        for root, subdirs, files in os.walk(full):
            subdirs.sort()
            rel = os.path.relpath(root, full)
            for name in sorted(files):
                size = os.path.getsize(os.path.join(root, name))
                h.update(f"{d}/{rel}/{name}:{size}\x00".encode())
    return h.hexdigest()


def split_dirs(value: str) -> list[str]:
    """A manifest component may reference SEVERAL directories (";"-joined)
    — the atomic-append encoding: each ``text_index_add`` publishes its
    batch as a fresh directory appended to the list in one manifest flip,
    so a crashed add leaves only unreferenced garbage, never a torn
    store. Compaction collapses the list back to one directory."""
    return [v for v in value.split(";") if v]


def join_dirs(dirs: list[str]) -> str:
    return ";".join(dirs)


def next_version(path: str, component: str, current: str) -> str:
    """Next unused versioned directory name for ``component`` (e.g.
    ``stats`` -> ``stats_v1`` when current is the legacy ``stats``,
    ``stats_v2`` after that). Scans for existing dirs so a crashed,
    never-published generation is skipped rather than overwritten."""
    n = 0
    current = split_dirs(current)[-1] if current else current
    if "_v" in current:
        try:
            n = int(current.rsplit("_v", 1)[1])
        except ValueError:
            n = 0
    while True:
        n += 1
        cand = f"{component}_v{n}"
        if not os.path.exists(os.path.join(path, cand)):
            return cand


def _newest_mtime(path: str) -> float:
    """Most recent modification time anywhere under ``path`` (the dir
    itself included) — 'how recently was this generation written'."""
    newest = os.path.getmtime(path)
    for root, _, files in os.walk(path):
        newest = max(newest, os.path.getmtime(root))
        for name in files:
            try:
                newest = max(newest, os.path.getmtime(os.path.join(root, name)))
            except OSError:
                continue
    return newest


def gc_store(
    path: str,
    components: dict[str, str],
    *,
    grace_seconds: float = 900.0,
) -> dict[str, list[str]]:
    """Out-of-band garbage collection: delete every generation directory
    NOT referenced by the current manifest. This is the reclaim step the
    writers deliberately skip (``sweep=False`` default keeps superseded
    generations readable for concurrent loaders); run it when no readers
    are active — after a deploy drain, in a maintenance window, from the
    same quiet slot that runs compactions with ``sweep=True``.

    Returns ``{component: [removed dirs]}`` for logging. Refuses
    URI-scheme paths like every other manifest operation. Idempotent and
    safe to run on a store with no manifest (nothing is unreferenced
    then: the legacy names ARE the current generation).

    ``grace_seconds`` (default 15 min) skips any directory written more
    recently than that: an in-flight add/compact builds its generation
    FULLY before the manifest flip, so for that window the directory is
    unreferenced-but-about-to-be-published — collecting it would make the
    subsequent flip publish a deleted directory. The grace period turns
    the documented quiet-window requirement into an enforced bound (no
    single writer stages a generation for 15 minutes without flipping;
    raise it if yours does). Pass 0 to restore the unguarded behavior."""
    import time as _time

    require_posix_path(path, "store")
    cutoff = _time.time() - float(grace_seconds)
    current = read_manifest(path, components)
    removed: dict[str, list[str]] = {}
    if not os.path.isdir(path):
        return removed
    for key, base in components.items():
        keep = set(split_dirs(current[key]))
        # never collect ANOTHER component that shares this component's
        # name as a prefix (e.g. 'sigs' vs 'sigs_folds'): skip names
        # that exactly match, or are a generation of, some other
        # current/declared component
        other_dirs = {
            d
            for k in components
            if k != key
            for d in split_dirs(current[k])
        }
        other_bases = [components[k] for k in components if k != key]
        gone = []
        for name in os.listdir(path):
            if name in keep:
                continue
            if name == base or name.startswith(f"{base}_v"):
                if name in other_dirs or any(
                    name == b or name.startswith(f"{b}_v")
                    for b in other_bases
                ):
                    continue
                full = os.path.join(path, name)
                if grace_seconds > 0 and _newest_mtime(full) > cutoff:
                    continue  # possibly mid-publish; see grace_seconds
                shutil.rmtree(full, ignore_errors=True)
                gone.append(name)
        if gone:
            removed[key] = sorted(gone)
    return removed


def sweep_stale(path: str, component: str, keep: str) -> None:
    """Best-effort removal of superseded ``{component}*`` generation dirs
    after a successful manifest flip (``keep`` may be a ";"-joined list).
    Readers already holding the old generation's DataFrames may error if
    their job runs across the sweep; callers that need long-lived readers
    should skip sweeping and GC out of band."""
    kept = set(split_dirs(keep))
    for name in os.listdir(path):
        if name in kept or not name.startswith(component):
            continue
        if name == component or name.startswith(f"{component}_v"):
            shutil.rmtree(os.path.join(path, name), ignore_errors=True)
