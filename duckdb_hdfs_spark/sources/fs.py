"""Filesystem utilities over Spark's JVM Hadoop ``FileSystem`` —
the Spark-native counterpart of the reference's ``HadoopFileSystem``
C++ class (hadoopfs.hpp:143-252).

Parity map (reference method → here):

- ``Glob`` (hadoopfs.hpp:170)            → :meth:`HadoopFs.glob`
- ``ListFiles`` (hadoopfs.hpp:166)       → :meth:`HadoopFs.ls`
- ``FileExists`` / ``DirectoryExists``   → :meth:`HadoopFs.exists` /
  (hadoopfs.hpp:206/190)                   :meth:`HadoopFs.is_dir`
- ``CreateDirectory`` (hadoopfs.hpp:192) → :meth:`HadoopFs.mkdirs`
- ``RemoveDirectory``/``RemoveFile``     → :meth:`HadoopFs.rm`
- ``MoveFile`` (hadoopfs.hpp:196)        → :meth:`HadoopFs.mv`
- ``GetFileSize`` (hadoopfs.hpp:202)     → :meth:`HadoopFs.size`
- ``GetLastModifiedTime``                → :meth:`HadoopFs.mtime`
- ``OpenFile``+``Read`` (positional)     → :meth:`HadoopFs.read_bytes`
- ``Write``/``FileSync``                 → :meth:`HadoopFs.write_bytes`

These go through the same ``org.apache.hadoop.fs.FileSystem`` API the
executors use, so they work identically for ``file://``, ``hdfs://``
(incl. HA nameservices from :mod:`duckdb_hdfs_spark.conf`),
``viewfs://`` and ``webhdfs://``.  Driver-side use is metadata-scale
only (listings, small control files) — bulk data always flows through
DataFrame readers, never through these byte helpers.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class FileInfo:
    path: str
    size: int
    mtime_ms: int
    is_dir: bool


class HadoopFs:
    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._jvm = spark._jvm
        self._jsc = spark.sparkContext._jsc
        self._conf = self._jsc.hadoopConfiguration()

    def _jpath(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def _fs(self, path: str):
        return self._jpath(path).getFileSystem(self._conf)

    @staticmethod
    def _info(st) -> FileInfo:
        return FileInfo(
            path=st.getPath().toString(),
            size=st.getLen(),
            mtime_ms=st.getModificationTime(),
            is_dir=st.isDirectory(),
        )

    def glob(self, pattern: str) -> list[FileInfo]:
        """Expand ``*``, ``?``, ``[...]`` and ``{a,b}`` glob segments.

        Hadoop's globStatus has no ``**``; emulate the reference's
        recursive match (hadoopfs.hpp:150-152) by fanning ``**`` out
        to a bounded set of ``*/`` depths.
        """
        fs = self._fs(pattern)
        out: list[FileInfo] = []
        patterns = [pattern]
        if "**" in pattern:
            head, _, tail = pattern.partition("**")
            tail = tail.lstrip("/")
            patterns = [head + ("*/" * d) + tail for d in range(8)]
        for pat in patterns:
            statuses = fs.globStatus(self._jpath(pat))
            if statuses is not None:
                out.extend(self._info(s) for s in statuses)
        seen: set[str] = set()
        uniq = []
        for fi in sorted(out, key=lambda f: f.path):
            if fi.path not in seen:
                seen.add(fi.path)
                uniq.append(fi)
        return uniq

    def ls(self, directory: str) -> list[FileInfo]:
        fs = self._fs(directory)
        statuses = fs.listStatus(self._jpath(directory))
        return sorted((self._info(s) for s in statuses), key=lambda f: f.path)

    def exists(self, path: str) -> bool:
        return self._fs(path).exists(self._jpath(path))

    def is_dir(self, path: str) -> bool:
        p = self._jpath(path)
        fs = self._fs(path)
        return fs.exists(p) and fs.getFileStatus(p).isDirectory()

    def mkdirs(self, path: str) -> bool:
        return self._fs(path).mkdirs(self._jpath(path))

    def rm(self, path: str, recursive: bool = False) -> bool:
        return self._fs(path).delete(self._jpath(path), recursive)

    def mv(self, src: str, dst: str) -> bool:
        return self._fs(src).rename(self._jpath(src), self._jpath(dst))

    def size(self, path: str) -> int:
        return self._fs(path).getFileStatus(self._jpath(path)).getLen()

    def mtime_ms(self, path: str) -> int:
        return self._fs(path).getFileStatus(self._jpath(path)).getModificationTime()

    def read_bytes(self, path: str, offset: int = 0, length: int | None = None) -> bytes:
        """Positional read (reference: ``ReadFromHDFS``, hadoopfs.hpp:178)."""
        fs = self._fs(path)
        n = length if length is not None else self.size(path) - offset
        stream = fs.open(self._jpath(path))
        try:
            stream.seek(offset)
            buf = bytearray()
            while len(buf) < n:
                b = stream.read()
                if b < 0:
                    break
                buf.append(b)
            return bytes(buf)
        finally:
            stream.close()

    def write_bytes(self, path: str, data: bytes) -> None:
        """Create/overwrite + hsync (reference: Write+FileSync,
        hadoopfs.hpp:182-186). Control-file scale only."""
        fs = self._fs(path)
        out = fs.create(self._jpath(path), True)
        try:
            for byte in data:
                out.write(byte)
            out.hflush()
        finally:
            out.close()
