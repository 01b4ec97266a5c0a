"""Persisted-index store: materialize a trained subtree ONCE to parquet
and let every consumer read it back as a plain scan.

The round-2 plan audit carried three reviewed exceptions whose root
cause was the same: a trained artifact (IVF centroid assignment, TF-IDF
weighted postings, SemDeDup cluster assignment) appears as a SUBTREE
that multiple consumers inline, so Spark plans — and executes — the
training work two or three times per query. At 100 TB those artifacts
are tables you build once and serve (FAISS persists the index; search
engines persist postings); this module is that pattern at engine level.

Mechanics: the index is keyed by (sf_dir, name) under
``/tmp/spark_graft_index``; built on first use into a temp dir and
published with an atomic ``os.rename`` so concurrent builders (pytest
workers, the bench and a driver run) race safely — the loser's work is
discarded. Contents are deterministic functions of the input tables, so
a cached index is bit-identical to a rebuild; delete the root dir after
regenerating testdata (see .claude/skills/verify gotchas).
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_ROOT = "/tmp/spark_graft_index"


def corpus_fingerprint(sf_dir: str) -> str:
    """Cheap content key for a corpus directory: md5 over (file name,
    size, mtime) of every parquet file. The index path embeds it, so a
    REGENERATED corpus at the same path gets a fresh index instead of
    silently serving stale data — the failure mode a path-only key has
    when the driver rebuilds /root/testdata between rounds."""
    h = hashlib.md5()
    for f in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        st = os.stat(f)
        h.update(
            f"{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}".encode()
        )
    return h.hexdigest()[:12]


def index_path(sf_dir: str, name: str) -> str:
    sf_key = os.path.basename(os.path.abspath(sf_dir).rstrip("/")) or "sf"
    return os.path.join(
        _ROOT, f"{sf_key}-{corpus_fingerprint(sf_dir)}", name
    )


def persisted_index(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build,
) -> DataFrame:
    """Return ``name``'s index DataFrame for ``sf_dir``, building it
    with ``build()`` (a 0-arg callable returning a DataFrame) on first
    use. The returned plan is a parquet SCAN — consumers that use it N
    times cost N scans of the (small) index, not N executions of the
    training subtree."""
    path = index_path(sf_dir, name)
    if not os.path.isdir(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        build().write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            # lost a build race — another process published first; both
            # builds are deterministic so either copy is correct
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path)
