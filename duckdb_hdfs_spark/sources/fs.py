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
- ``Truncate`` (hadoopfs.hpp:188)        → :meth:`HadoopFs.truncate`

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

    #: maximum directory depth a ``**`` segment spans — each depth is
    #: one globStatus round-trip, so the cap bounds namenode load; a
    #: match deeper than this is NOT found (documented contract, was a
    #: silent magic 8 before the round-7 review)
    GLOB_RECURSIVE_MAX_DEPTH = 16

    def glob(self, pattern: str) -> list[FileInfo]:
        """Expand ``*``, ``?``, ``[...]`` and ``{a,b}`` glob segments.

        Hadoop's globStatus has no ``**``; emulate the reference's
        recursive match (hadoopfs.hpp:150-152) by fanning the ``**``
        out to ``*/`` chains of 0..GLOB_RECURSIVE_MAX_DEPTH levels.
        Exactly ONE ``**`` segment is supported — a second would be
        passed to globStatus as a literal ``**`` and silently match a
        single level, so it raises instead (round-7 review finding).
        """
        fs = self._fs(pattern)
        out: list[FileInfo] = []
        patterns = [pattern]
        if "**" in pattern:
            if pattern.count("**") > 1:
                raise NotImplementedError(
                    "glob supports a single '**' segment; "
                    f"got {pattern!r}"
                )
            head, _, tail = pattern.partition("**")
            tail = tail.lstrip("/")
            patterns = [
                head + ("*/" * d) + tail
                for d in range(self.GLOB_RECURSIVE_MAX_DEPTH + 1)
            ]
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
        """Positional read (reference: ``ReadFromHDFS``, hadoopfs.hpp:178).

        Buffer-based like the reference's ``hdfsPread`` loop: a single
        ``readNBytes`` fills a JVM-side buffer and returns byte[],
        which py4j ships back as Python bytes in ONE transfer — not
        one JVM round-trip per byte.  (py4j passes primitive arrays
        by VALUE, so readFully-into-a-Python-held-array silently reads
        into a copy — readNBytes' return-the-buffer shape is the only
        batched form visible from Python.)"""
        fs = self._fs(path)
        avail = self.size(path) - offset
        n = min(length, avail) if length is not None else avail
        if n <= 0:
            return b""
        stream = fs.open(self._jpath(path))
        try:
            stream.seek(offset)
            return bytes(stream.readNBytes(n))
        finally:
            stream.close()

    def write_bytes(self, path: str, data: bytes) -> None:
        """Create/overwrite + hsync (reference: Write+FileSync,
        hadoopfs.hpp:182-186). Control-file scale only.

        py4j converts ``bytes`` to a JVM byte[] in one transfer;
        ``hsync`` (not ``hflush``) matches FileSync's durability —
        flush to the OS on every datanode, not just client buffers."""
        fs = self._fs(path)
        out = fs.create(self._jpath(path), True)
        try:
            out.write(bytearray(data))
            out.hsync()
        finally:
            out.close()

    def truncate(self, path: str, new_length: int) -> bool:
        """Reference: ``HadoopFileSystem::Truncate`` (hadoopfs.hpp:188).

        Returns True if the file is immediately at ``new_length``;
        False means the truncate is in progress (HDFS crash-recovery
        path) — callers needing certainty poll ``size``.

        ``hdfs://`` (DistributedFileSystem) truncates natively.
        ``file://`` is a ChecksumFileSystem wrapper that rejects
        truncate — fall through to its raw filesystem and drop the
        now-stale checksum sidecar, preserving read-after-truncate."""
        jp = self._jpath(path)
        fs = self._fs(path)
        try:
            return fs.truncate(jp, new_length)
        except Exception as err:
            # ChecksumFileSystem (file://): truncate the raw file,
            # remove the stale .crc so subsequent reads don't fail
            # checksum verification.  Only FilterFileSystem subclasses
            # HAVE getRawFileSystem — on hdfs:// a truncate failure
            # (open lease, new_length > size, ...) must surface as the
            # ORIGINAL exception, not a confusing py4j method-missing
            # error from the fallback (round-7 review finding; py4j
            # resolves methods at CALL time, so the probe is the call).
            try:
                raw = fs.getRawFileSystem()
            except Exception:
                raise err
            ok = raw.truncate(jp, new_length)
            crc = fs.getChecksumFile(jp)
            if raw.exists(crc):
                raw.delete(crc, False)
            return ok
