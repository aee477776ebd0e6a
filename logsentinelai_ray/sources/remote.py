"""Remote text-line source — the reference's SSH reader as a Ray Data
datasource (reference core/ssh.py:81-161: stat for size/inode, positional
`dd` byte reads, line split + strip + drop-empty; core/monitoring.py:122-161
uses the inode+size fingerprint for rotation/truncation detection).

Architecture: the TRANSPORT (how bytes come back: ssh/dd, local IO, ...)
is injected; the DISTRIBUTION (split the byte range into chunk tasks,
align each task to line boundaries, emit Arrow blocks of stripped
non-empty lines with absolute byte offsets) is Ray-side and transport
agnostic. In this sandbox the SSH transport is a clearly-marked stub
(paramiko is not installed; its command strings mirror the reference and
are unit-tested), while ``LocalFileTransport`` exercises the whole
pipeline for real.

Line-boundary protocol (standard parallel text split): a task owning
``[start, end)`` emits exactly the lines whose FIRST byte lies in its
range — it skips a leading fragment whose line started before ``start``
(checked by reading the byte at ``start - 1``: only a preceding newline
makes the fragment a true line start) and reads past ``end`` to finish
its own last line.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_LINES_SCHEMA = pa.schema([("byte_offset", pa.int64()),
                           ("line", pa.string())])
# how far past a chunk boundary a task will look for its final newline
# before giving up (== the max supported line length)
_MAX_LINE_BYTES = 4 << 20


class LocalFileTransport:
    """Transport over local paths — the sandbox's 'remote'. Also the
    shape a real SSH transport must implement: ``stat`` and positional
    ``read``."""

    def stat(self, path: str) -> tuple[int, str]:
        """(size_bytes, identity). Identity = inode (the reference's
        rotation key, core/monitoring.py:122-161); ``fingerprint`` below
        adds the start-marker hash for recreate-with-reused-inode."""
        import os

        st = os.stat(path)
        return int(st.st_size), str(st.st_ino)

    def read(self, path: str, offset: int, nbytes: int) -> bytes:
        with open(path, "rb") as f:
            f.seek(offset)
            return f.read(nbytes)


class SSHTransport:
    """SSH transport STUB: command construction mirrors the reference
    (stat -c %s / stat -c %i / dd skip+count — core/ssh.py:86,102,136)
    and is unit-tested; actual execution needs paramiko, absent from
    this container, so ``__init__`` raises with guidance unless an
    ``exec_fn(command) -> bytes`` is injected (tests inject a local
    runner)."""

    def __init__(self, host: str, user: str, remote_sh: str = "sh",
                 exec_fn=None):
        self.host, self.user = host, user
        self.remote_sh = remote_sh
        if exec_fn is None:
            try:
                import paramiko  # noqa: F401
            except ImportError as e:
                raise ImportError(
                    "paramiko is not installed in this environment; "
                    "inject exec_fn(command)->bytes or use "
                    "LocalFileTransport (see module docstring)") from e

            def exec_fn(command: str) -> bytes:  # pragma: no cover
                raise NotImplementedError(
                    "real SSH execution is stubbed in this sandbox")
        self.exec_fn = exec_fn

    @staticmethod
    def size_command(path: str) -> str:
        return f"stat -c %s '{path}' 2>/dev/null || echo 0"

    @staticmethod
    def inode_command(path: str) -> str:
        return f"stat -c %i '{path}' 2>/dev/null || echo 0"

    @staticmethod
    def read_command(path: str, offset: int, nbytes: int) -> str:
        return (f"dd if='{path}' bs=1 skip={offset} count={nbytes} "
                "2>/dev/null || echo ''")

    def stat(self, path: str) -> tuple[int, str]:
        size = int(self.exec_fn(self.size_command(path)).strip() or b"0")
        inode = self.exec_fn(self.inode_command(path)).strip().decode()
        return size, inode

    def read(self, path: str, offset: int, nbytes: int) -> bytes:
        return self.exec_fn(self.read_command(path, offset, nbytes))


def _read_chunk(transport, path: str, start: int, end: int,
                global_offset: int) -> pa.Table:
    """Emit every line whose FIRST byte lies in [start, end)."""
    raw = transport.read(path, start, end - start)
    # extend past `end` until the final newline (bounded)
    tail_at = end
    while raw and not raw.endswith(b"\n"):
        ext = transport.read(path, tail_at, min(64 << 10, _MAX_LINE_BYTES))
        if not ext:
            break  # true EOF: last line has no newline, still ours
        cut = ext.find(b"\n")
        if cut >= 0:
            raw += ext[:cut + 1]
            break
        raw += ext
        tail_at += len(ext)
        if tail_at - end > _MAX_LINE_BYTES:
            raise ValueError(f"line exceeding {_MAX_LINE_BYTES} bytes "
                             f"at offset ~{end} in {path}")
    if not raw:
        return _LINES_SCHEMA.empty_table()
    # the first line fragment belongs to this task only when it truly
    # STARTS here: at the global offset, or right after a newline (a
    # chunk boundary can land exactly on a line start — skipping to the
    # first newline there would drop a whole owned line)
    skip_first = (start != global_offset
                  and transport.read(path, start - 1, 1) != b"\n")
    base = start
    if skip_first:
        first_nl = raw.find(b"\n")
        if first_nl < 0:  # whole chunk is the middle of one giant line
            return _LINES_SCHEMA.empty_table()
        base = start + first_nl + 1
        raw = raw[first_nl + 1:]
    if not raw:
        return _LINES_SCHEMA.empty_table()
    # vectorized split: byte offsets from 0x0A positions (a newline byte
    # can never be part of a multibyte UTF-8 sequence, so byte slots map
    # 1:1 to the decoded text's split slots), Arrow kernels for the
    # reference's strip + drop-empty filter — no Python loop over lines
    import pyarrow.compute as pc

    arr = np.frombuffer(raw, dtype=np.uint8)
    nl = np.flatnonzero(arr == 0x0A)
    starts_all = np.concatenate(([0], nl + 1)).astype(np.int64)
    vals = pc.list_flatten(pc.split_pattern(
        pa.array([raw.decode("utf-8", errors="ignore")]), "\n"))
    trimmed = pc.utf8_trim_whitespace(vals)
    keep = pc.not_equal(trimmed, "").to_numpy(zero_copy_only=False)
    return pa.table({
        "byte_offset": pa.array(base + starts_all[keep], pa.int64()),
        "line": pc.filter(trimmed, pa.array(keep))})


def read_remote_lines(transport, path: str, offset: int = 0,
                      chunk_bytes: int = 4 << 20,
                      parallelism: int | None = None):
    """Ray Dataset of (byte_offset, line) for the remote file's content
    from ``offset`` — the reference's ``read_from_position`` distributed:
    the byte range splits into chunk ReadTasks that each fetch their own
    slice through the transport (the driver never holds the file), align
    to line boundaries, and emit Arrow blocks. Empty/whitespace lines are
    dropped and lines stripped, like the reference."""
    import ray.data as rd
    from ray.data.block import BlockMetadata
    from ray.data.datasource import Datasource, ReadTask

    size, _fp = transport.stat(path)
    total = max(0, size - offset)

    class _RemoteLines(Datasource):
        def estimate_inmemory_data_size(self):
            return total

        def get_read_tasks(self, parallelism: int):
            n = max(1, min(parallelism,
                           -(-total // max(1, chunk_bytes))))
            bounds = np.linspace(offset, size, n + 1).astype(np.int64)
            tasks = []
            for i in range(n):
                s, e = int(bounds[i]), int(bounds[i + 1])
                if s >= e:
                    continue
                meta = BlockMetadata(num_rows=None, size_bytes=e - s,
                                     input_files=[path], exec_stats=None)
                tasks.append(ReadTask(
                    lambda s=s, e=e: [_read_chunk(transport, path, s, e,
                                                  offset)],
                    meta))
            return tasks

    par = parallelism if parallelism is not None \
        else max(1, -(-total // max(1, chunk_bytes)))
    return rd.read_datasource(_RemoteLines(), override_num_blocks=par)


_FILES_SCHEMA = pa.schema([("path", pa.string()), ("size", pa.int64()),
                           ("content", pa.string())])


def read_whole_files(transport, paths: list[str], parallelism=None):
    """Ray Dataset of (path, size, content) — one row per whole file,
    fetched through the injected transport (the reference's
    ``read_file_content`` legacy util, core/commons.py:964-989, which
    reads a file in one shot locally or recommends the SSH module for
    remote). Distribution is per-file: each ReadTask stats + reads its
    own file inside the task (the driver never holds file bytes), so a
    directory of many files fans out across the cluster while each file
    stays whole — the semantic the legacy util promises.

    For huge single files use ``read_remote_lines`` (chunk-parallel);
    this util is for the many-small-files shape (configs, single logs)
    where per-file atomicity matters more than intra-file parallelism.
    """
    import ray.data as rd
    from ray.data.block import BlockMetadata
    from ray.data.datasource import Datasource, ReadTask

    paths = sorted(paths)

    def _read_one(path: str) -> pa.Table:
        size, _ = transport.stat(path)
        raw = transport.read(path, 0, size) if size else b""
        return pa.table({
            "path": pa.array([path], pa.string()),
            "size": pa.array([size], pa.int64()),
            "content": pa.array([raw.decode("utf-8", errors="replace")],
                                pa.string())})

    class _WholeFiles(Datasource):
        def estimate_inmemory_data_size(self):
            return None

        def get_read_tasks(self, parallelism: int):
            tasks = []
            for p in paths:
                meta = BlockMetadata(num_rows=1, size_bytes=None,
                                     input_files=[p], exec_stats=None)
                tasks.append(ReadTask(lambda p=p: [_read_one(p)], meta))
            return tasks or [ReadTask(
                lambda: [_FILES_SCHEMA.empty_table()],
                BlockMetadata(num_rows=0, size_bytes=0, input_files=[],
                              exec_stats=None))]

    par = parallelism if parallelism is not None else max(1, len(paths))
    return rd.read_datasource(_WholeFiles(), override_num_blocks=par)


def fingerprint(transport, path: str, marker_bytes: int = 256) -> dict:
    """Rotation fingerprint: identity (inode), size, and a START-MARKER
    hash over the first ``min(marker_bytes, size)`` bytes with the
    hashed LENGTH pinned — appends to a small file must not flip it,
    while a recreate that reuses the inode does (the reference's
    inode+start-of-file protocol, core/monitoring.py:122-161)."""
    size, ident = transport.stat(path)
    n = min(marker_bytes, size)
    head = transport.read(path, 0, n) if n else b""
    return {"identity": ident, "size": size, "head_len": n,
            "head_hash": hashlib.sha256(head).hexdigest()[:16]}


def detect_rotation(transport, path: str, prev: dict) -> bool:
    """True when the file was rotated/truncated/recreated since ``prev``
    (a ``fingerprint`` result): identity change or start-marker change =
    rotation/recreate, shrinkage = truncation; growth alone is a normal
    append."""
    size, ident = transport.stat(path)
    if ident != prev["identity"]:
        return True
    if size < prev["size"]:
        return True
    head = transport.read(path, 0, prev["head_len"]) \
        if prev["head_len"] else b""
    return hashlib.sha256(head).hexdigest()[:16] != prev["head_hash"]
