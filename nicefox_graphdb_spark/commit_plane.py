"""Commit plane — the small filesystem interface under DurableTableStore.

The durable store's DATA plane (parquet scans/writes, bucket pruning) runs
through Spark and is cluster-ready as-is. Its COMMIT plane — manifest
read/write, atomic CURRENT swing, staged-file moves, vacuum deletes — is a
handful of small-file metadata operations that must run where the table
root lives. This module isolates them behind ``CommitPlane`` so the store
is deployable beyond a shared local filesystem:

=====================  =====================  ===========================
store operation        LocalCommitPlane       object-store equivalent
=====================  =====================  ===========================
makedirs               os.makedirs            no-op (keys are flat)
exists / isdir         os.path.*              HEAD / LIST prefix
read_text              open().read()          GET
write_text_atomic      tmp + fsync + rename   HDFS: same (atomic rename);
                                              S3: PUT + If-None-Match, or
                                              a DynamoDB/conditional-put
                                              log (what Delta's
                                              LogStore abstracts)
listdir                os.listdir             LIST prefix
move                   os.replace             HDFS rename; S3 copy+delete
remove / rmtree        os.remove/shutil       DELETE / batch DELETE
=====================  =====================  ===========================

``HadoopCommitPlane`` routes the same nine operations through the Hadoop
FileSystem API on Spark's JVM (py4j) — the store then works against any
``hdfs://``/``file://``-style URI Spark itself can reach, with rename
atomicity inherited from the underlying FileSystem (atomic on HDFS and
local; NOT on raw S3A — there, use a consistent-rename layer or swap the
whole store for Delta/Iceberg, whose transaction log solves exactly this).
"""

from __future__ import annotations

import os
import shutil


class LocalCommitPlane:
    """Driver-local ``os.*`` implementation — the default. Correct whenever
    the driver sees the table root directly: local[n], NFS, or a
    DFS fuse mount."""

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        """Durable atomic publish: write a sibling tmp, fsync, rename over
        the target (POSIX rename atomicity)."""
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(text)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def listdir(self, path: str) -> list[str]:
        return sorted(os.listdir(path))

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def move(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def remove(self, path: str) -> None:
        os.remove(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)


class HadoopCommitPlane:
    """Hadoop-FileSystem implementation via Spark's JVM — one plane for
    every URI scheme Spark can reach (``file://``, ``hdfs://``, ...).

    Rename atomicity is the underlying FileSystem's: atomic on HDFS and
    RawLocalFileSystem, best-effort (copy+delete) on object stores — for
    raw S3 pair this with a consistent-rename layer, or use Delta.
    """

    def __init__(self, spark, base_uri: str):
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._jvm = jvm
        self._fs = self._Path(base_uri).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    def _p(self, path: str):
        return self._Path(path)

    def makedirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._p(path))

    def isdir(self, path: str) -> bool:
        p = self._p(path)
        return self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory()

    def read_text(self, path: str) -> str:
        in_ = self._fs.open(self._p(path))
        try:
            baos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                in_, baos, 4096, False
            )
            return baos.toString("UTF-8")
        finally:
            in_.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        tmp = path + ".tmp"
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
            out.hflush()
        finally:
            out.close()
        # overwrite-rename: FileSystem.rename refuses existing targets on
        # some schemes, so drop the target first (the tmp file is the
        # recovery point — a crash between delete and rename re-runs the
        # commit from the previous CURRENT, which is still listed)
        dst = self._p(path)
        if self._fs.exists(dst):
            self._fs.delete(dst, False)
        self._fs.rename(self._p(tmp), dst)

    def listdir(self, path: str) -> list[str]:
        return sorted(
            s.getPath().getName()
            for s in self._fs.listStatus(self._p(path))
        )

    def size(self, path: str) -> int:
        return self._fs.getFileStatus(self._p(path)).getLen()

    def move(self, src: str, dst: str) -> None:
        self._fs.rename(self._p(src), self._p(dst))

    def remove(self, path: str) -> None:
        self._fs.delete(self._p(path), False)

    def rmtree(self, path: str) -> None:
        self._fs.delete(self._p(path), True)
