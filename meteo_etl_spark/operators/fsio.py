"""Metadata I/O for the atomic table, resolved per path scheme.

The atomic-manifest protocol (operators/atomic.py) needs seven small
filesystem operations: list, stat, read, publish-exclusive (the commit
arbiter), replace (the pointer update), and two deletes. On a plain
local path those are ``os.*`` calls; on a cluster the table lives at
``hdfs://`` (or another Hadoop-supported store), where Python's ``os``
cannot reach at all. This module gives the protocol one seam:

- ``LocalIO`` — the local fast path. Publish is tmp-write + fsync +
  ``os.link`` (atomic fail-if-exists WITH full content, POSIX).
- ``HadoopIO`` — any URI path, driven through the JVM's
  ``org.apache.hadoop.fs.FileSystem`` (the same handle Spark's own
  writers use, so credentials/conf are identical). Publish is
  tmp-write + close + no-overwrite ``rename`` — the commit scheme
  Delta's HDFSLogStore uses: on HDFS, rename is atomic and fails when
  the destination exists, so it both arbitrates racing writers and
  publishes full content in one namespace operation.

Store contracts (the same ones every table format states):

- HDFS / POSIX: rename/link are atomic → full protocol guarantees.
- S3 and plain object stores: rename is copy+delete and create is
  last-writer-wins, so single-writer-per-table discipline or an
  external commit service (DynamoDB-style log store, or S3
  conditional-put ``If-None-Match:*`` on the version object) is
  required for the concurrent-writer arbiter; readers and crash
  atomicity are unaffected (the manifest either exists whole or not).

``io_for(path, spark)`` picks the implementation: URI schemes
(``file://``, ``hdfs://``, ``s3a://``…) go through Hadoop; bare paths
take the local fast path.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

_URI_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def is_uri(path: str) -> bool:
    return bool(_URI_RE.match(path))


class LocalIO:
    """os.*-backed metadata I/O — the single-machine fast path."""

    def listdir(self, path: str) -> list[str]:
        try:
            return os.listdir(path)
        except NotADirectoryError:
            raise FileNotFoundError(path) from None

    def isfile(self, path: str) -> bool:
        return os.path.isfile(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def publish_exclusive(self, path: str, body: str) -> bool:
        """Atomically create ``path`` with ``body`` as full content.
        Returns False (without writing) if ``path`` already exists —
        the commit arbiter's lost-the-race signal."""
        staged = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        fd = os.open(staged, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
        with os.fdopen(fd, "w") as f:
            f.write(body)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(staged, path)  # atomic publish-with-content + arbiter
        except FileExistsError:
            return False
        finally:
            try:
                os.unlink(staged)
            except OSError:
                pass
        return True

    def replace(self, path: str, body: str) -> None:
        """Overwrite ``path`` with ``body`` atomically (readers see old
        or new, never partial)."""
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(body)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def unlink(self, path: str) -> None:
        os.unlink(path)

    def mkdirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def fsync_dir(self, path: str) -> None:
        # Durability of namespace ops across power loss needs the parent
        # dir flushed (POSIX). Best-effort on filesystems without dir fds.
        try:
            dfd = os.open(path, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        except OSError:
            pass


class HadoopIO:
    """Hadoop-FileSystem-backed metadata I/O for URI table paths.

    Resolved through the SparkSession's JVM and Hadoop configuration,
    so the same filesystem instance, credentials and scheme handlers
    Spark's own parquet writers use apply to the manifest too.
    """

    def __init__(self, spark, path: str):
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._IOUtils = jvm.org.apache.commons.io.IOUtils
        self._fs = self._Path(path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    def _p(self, path: str):
        return self._Path(path)

    @staticmethod
    def _is_jnf(exc: Exception) -> bool:
        # py4j surfaces java.io.FileNotFoundException as Py4JJavaError
        j = getattr(exc, "java_exception", None)
        return j is not None and "FileNotFoundException" in j.getClass().getName()

    def listdir(self, path: str) -> list[str]:
        try:
            return [
                st.getPath().getName() for st in self._fs.listStatus(self._p(path))
            ]
        except Exception as exc:
            if self._is_jnf(exc):
                raise FileNotFoundError(path) from None
            raise

    def isfile(self, path: str) -> bool:
        try:
            return self._fs.getFileStatus(self._p(path)).isFile()
        except Exception as exc:
            if self._is_jnf(exc):
                return False
            raise

    def isdir(self, path: str) -> bool:
        try:
            return self._fs.getFileStatus(self._p(path)).isDirectory()
        except Exception as exc:
            if self._is_jnf(exc):
                return False
            raise

    def read_text(self, path: str) -> str:
        try:
            stream = self._fs.open(self._p(path))
        except Exception as exc:
            if self._is_jnf(exc):
                raise FileNotFoundError(path) from None
            raise
        try:
            return self._IOUtils.toString(stream, "UTF-8")
        finally:
            stream.close()

    def mtime(self, path: str) -> float:
        try:
            return self._fs.getFileStatus(self._p(path)).getModificationTime() / 1000.0
        except Exception as exc:
            if self._is_jnf(exc):
                raise OSError(path) from None
            raise

    def _write(self, path: str, body: str, *, overwrite: bool) -> None:
        out = self._fs.create(self._p(path), overwrite)
        try:
            out.write(bytearray(body.encode("utf-8")))
        finally:
            out.close()

    def publish_exclusive(self, path: str, body: str) -> bool:
        """Delta-HDFSLogStore commit scheme: write the full body to a
        tmp file, close it, then no-overwrite rename onto the version
        path. On HDFS the rename is a single atomic namespace op that
        fails if the destination exists — arbiter + full-content
        publish in one step, no torn commit record observable."""
        staged = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        self._write(staged, body, overwrite=False)
        try:
            if self._fs.rename(self._p(staged), self._p(path)):
                return True
            # rename refused: destination exists (lost the race) — or a
            # missing parent, which create() above already rules out.
            return False
        finally:
            try:
                self._fs.delete(self._p(staged), False)
            except Exception:
                pass

    def replace(self, path: str, body: str) -> None:
        # The pointer is non-authoritative (readers resolve
        # max(pointer, newest version file)), so delete+rename is
        # acceptable here: a crash between the two leaves no pointer,
        # which resolution already handles.
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        self._write(tmp, body, overwrite=True)
        self._fs.delete(self._p(path), False)
        if not self._fs.rename(self._p(tmp), self._p(path)):
            self._fs.delete(self._p(tmp), False)
            raise OSError(f"rename {tmp} -> {path} refused")

    def unlink(self, path: str) -> None:
        self._fs.delete(self._p(path), False)

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def rmtree(self, path: str) -> None:
        self._fs.delete(self._p(path), True)

    def fsync_dir(self, path: str) -> None:
        pass  # namespace durability is the store's contract (HDFS journal)


def io_for(path: str, spark=None) -> LocalIO | HadoopIO:
    """Pick the I/O backend for ``path``: URI schemes go through the
    Hadoop FileSystem API, bare paths take the local ``os`` fast path.

    ``spark`` may be omitted for local paths; for URI paths the active
    session is used when not passed explicitly."""
    if not is_uri(path):
        return LocalIO()
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise ValueError(
                f"resolving {path!r} needs a SparkSession (Hadoop FileSystem API); "
                "none is active — pass spark explicitly"
            )
    return HadoopIO(spark, path)


def read_json(io, path: str) -> dict:
    """json.load through an IO backend; raises FileNotFoundError /
    json.JSONDecodeError exactly like the local open() idiom."""
    return json.loads(io.read_text(path))
