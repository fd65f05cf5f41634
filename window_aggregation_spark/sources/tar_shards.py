"""WebDataset-style tar-shard export/import for training corpora.

Multimodal and LLM trainers overwhelmingly stream *tar shards* — POSIX
tar files of ``{sample_id}.{ext}`` entries, a few hundred MB each, read
sequentially (the WebDataset convention popularized for PyTorch, and the
shape behind most large-scale image/text dataset releases). This module
is the physical half of the corpus-sharding story: ``corpus.pack_by_
token_budget``/``shard_manifest`` decide WHICH shard a document belongs
to; here the shards actually become tar bytes and come back.

Scale shape:
- ``assign_shards`` is one codegen projection (portable md5-derived
  hash mod ``n_shards`` — the same :func:`..operators.dedup.
  portable_hash64` the split/sample operators use, so shard membership
  is recomputable in any SQL engine, which is what the suite oracle
  checks).
- ``write_tar_shards`` hash-repartitions on the shard id (the ONE
  shuffle), sorts within partitions so each shard's rows are contiguous,
  and streams tar bytes per executor task via ``mapInPandas`` — no
  driver hop, no per-shard collect. A partition may hold several shards
  (hash collisions of shard ids are fine: contiguity makes the writer a
  sequential open/append/close per shard); a shard never spans
  partitions. Output rows are the per-shard manifest, so the write is an
  action-with-evidence rather than a silent side effect.
- Tars are byte-deterministic: USTAR format, entries in ``id_col``
  order, zeroed mtime/uid/gid — two runs over the same data produce
  bit-identical shards (pinned in tests), which makes exported artifacts
  content-addressable.
- ``read_tar_shards`` lists ``shard-*.tar`` through Spark's binaryFile
  source (one task per shard file — shard-parallel) and unpacks entries
  back to ``(shard, doc_id, payload[, meta])`` rows inside the same
  Arrow seam. Size shards like WebDataset does (100 MB–1 GB): each tar
  is materialized per-task, so the shard size — set by ``n_shards`` or
  the token budget — is the reader's memory unit, not the corpus size.

Reference parity: none — the reference engine has no binary sink; this
is training-pipeline extension surface (SURVEY §2's "beyond" list).
"""

from __future__ import annotations

import io
import json
import os
import re
import tarfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from window_aggregation_spark.operators.dedup import (
    portable_hash64,
    portable_hash64_duck,
)

_MANIFEST_SCHEMA = (
    "shard bigint, n_docs bigint, payload_bytes bigint, "
    "tar_bytes bigint, path string"
)
_READ_SCHEMA = "shard bigint, doc_id string, payload binary, meta string"


def assign_shards(
    df: DataFrame, id_col: str, n_shards: int, *, shard_col: str = "shard"
) -> DataFrame:
    """Deterministic shard id: ``portable_hash64(id) % n_shards``.

    Hash assignment (vs the contiguous token-budget packing of
    ``corpus.pack_by_token_budget``) is the right default for export:
    shards get statistically equal row counts with NO global sort or
    prefix sum — a pure projection, zero shuffles until the write."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    return df.withColumn(
        shard_col,
        F.pmod(
            portable_hash64(F.col(id_col).cast("string")), F.lit(n_shards)
        ).cast("long"),
    )


def assign_shards_oracle_expr(id_expr: str, n_shards: int) -> str:
    """DuckDB rendering of :func:`assign_shards`'s shard id."""
    return f"(({portable_hash64_duck(f'CAST({id_expr} AS VARCHAR)')}) % {n_shards})"


def _tar_info(name: str, size: int) -> tarfile.TarInfo:
    """A fully pinned tar header — the only varying bytes in a shard are
    the entry names and payloads, so shard bytes are run-independent."""
    ti = tarfile.TarInfo(name=name)
    ti.size = size
    ti.mtime = 0
    ti.uid = ti.gid = 0
    ti.uname = ti.gname = ""
    ti.mode = 0o644
    return ti


def write_tar_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str,
    payload_col: str,
    *,
    shard_col: str = "shard",
    meta_cols: tuple[str, ...] = (),
    ext: str = "bin",
) -> DataFrame:
    """Write one ``shard-{id:06d}.tar`` per distinct ``shard_col`` value;
    return the per-shard manifest (shard, n_docs, payload_bytes,
    tar_bytes, path) as a DataFrame.

    Entries are ``{id}.{ext}`` with the payload bytes, plus ``{id}.json``
    (sorted-key JSON of ``meta_cols``) when metadata is requested — the
    WebDataset same-basename convention. ``id_col`` values must be
    unique and must not contain ``/`` (they become archive member names).

    The manifest rows are produced by the SAME tasks that wrote the
    bytes, counting what was actually serialized — a writer that dropped
    or duplicated rows cannot produce a clean manifest. Each tar is
    written to a per-task-attempt temp name and atomically renamed on
    close, so a retried/speculative task attempt can never leave a
    half-written shard behind a clean manifest (the losing attempt's
    rename is simply overwritten by a complete file).

    ``ext="json"`` is rejected: the reader's WebDataset convention
    routes ``.json`` members to metadata, so JSON payloads would vanish
    from the roundtrip (and collide with ``meta_cols`` member names) —
    use ``ext="jsonl"`` or similar for JSON-document corpora.

    ``out_dir`` must be a POSIX path on a filesystem shared by the
    driver and every executor (local disk in local mode, NFS/shared
    mount on a cluster): the tars are written with plain ``os`` calls
    from executor tasks and the atomic close-rename relies on POSIX
    rename. Object-store URIs (``s3://``, ``hdfs://``...) are rejected
    up front — there the tasks would each write to executor-LOCAL disks
    and the manifest would point at files nobody can read. For object
    stores, write to a shared staging dir and upload the closed shards.
    """
    if ext == "json":
        raise ValueError(
            'ext="json" collides with the metadata member convention; '
            "payloads would be read back as meta — pick another extension"
        )
    if "://" in out_dir:
        raise ValueError(
            f"out_dir {out_dir!r} uses a URI scheme; write_tar_shards "
            "writes with executor-side os.* calls and needs a POSIX "
            "filesystem shared by driver and executors — stage locally "
            "and upload the closed shards instead"
        )
    os.makedirs(out_dir, exist_ok=True)
    cols = [shard_col, id_col, payload_col, *meta_cols]
    src = df.select(*cols).repartition(F.col(shard_col)).sortWithinPartitions(
        shard_col, id_col
    )

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else os.getpid()
        cur = None  # (shard, tarfile, tmp_path, final_path, n_docs, payload_bytes)
        out: list[tuple] = []

        def _close() -> None:
            nonlocal cur
            if cur is None:
                return
            shard, tf, tmp, path, n, pb = cur
            tf.close()
            os.rename(tmp, path)
            out.append((shard, n, pb, os.path.getsize(path), path))
            cur = None

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                shard = int(getattr(row, shard_col))
                rid = str(getattr(row, id_col))
                if "/" in rid:
                    raise ValueError(
                        f"id {rid!r} contains '/': not a valid tar member name"
                    )
                payload = bytes(getattr(row, payload_col))
                if cur is None or cur[0] != shard:
                    _close()
                    path = os.path.join(out_dir, f"shard-{shard:06d}.tar")
                    tmp = f"{path}.tmp-{attempt}"
                    tf = tarfile.open(
                        tmp, "w", format=tarfile.USTAR_FORMAT
                    )
                    cur = (shard, tf, tmp, path, 0, 0)
                shard_, tf, tmp, path, n, pb = cur
                tf.addfile(_tar_info(f"{rid}.{ext}", len(payload)),
                           io.BytesIO(payload))
                if meta_cols:
                    meta = json.dumps(
                        {c: _jsonable(getattr(row, c)) for c in meta_cols},
                        sort_keys=True,
                        separators=(",", ":"),
                    ).encode()
                    tf.addfile(_tar_info(f"{rid}.json", len(meta)),
                               io.BytesIO(meta))
                cur = (shard_, tf, tmp, path, n + 1, pb + len(payload))
        _close()
        yield pd.DataFrame(
            out,
            columns=["shard", "n_docs", "payload_bytes", "tar_bytes", "path"],
        )

    return src.mapInPandas(_write, schema=_MANIFEST_SCHEMA)


def _jsonable(v):
    """numpy scalars -> plain Python so json.dumps is engine-agnostic."""
    return v.item() if hasattr(v, "item") else v


def read_tar_shards(
    spark: SparkSession, in_dir: str, *, with_meta: bool = False
) -> DataFrame:
    """Rows back out of ``shard-*.tar``: (shard, doc_id, payload, meta).

    One binaryFile row (= one task after the source's default splitting)
    per shard file; entries unpack inside ``mapInPandas``. ``meta`` is
    the raw JSON string for ``.json`` companions (null when absent or
    ``with_meta=False``) — parsing it is the caller's schema decision.
    """
    files = spark.read.format("binaryFile").load(
        os.path.join(in_dir, "shard-*.tar")
    ).select("path", "content")

    def _unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                m = re.search(r"shard-(\d+)\.tar$", path)
                if not m:  # binaryFile glob already filters; belt+braces
                    continue
                shard = int(m.group(1))
                metas: dict[str, str] = {}
                payloads: dict[str, bytes] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tf:
                    for ti in tf.getmembers():
                        if not ti.isreg():
                            # externally-produced WebDataset tars often
                            # carry directory/link members; skip, don't
                            # crash (extractfile returns None for them)
                            continue
                        stem, dot, suffix = ti.name.rpartition(".")
                        data = tf.extractfile(ti).read()
                        if suffix == "json":
                            metas[stem] = data.decode()
                        else:
                            payloads[stem] = data
                for stem, payload in payloads.items():
                    rows.append(
                        (shard, stem, payload,
                         metas.get(stem) if with_meta else None)
                    )
            yield pd.DataFrame(
                rows, columns=["shard", "doc_id", "payload", "meta"]
            )

    return files.mapInPandas(_unpack, schema=_READ_SCHEMA)
