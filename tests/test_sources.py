"""Remote line source (sources/remote.py): chunk-parallel line reads
through an injected transport, resume-from-offset, rotation detection,
and the SSH command stub (reference core/ssh.py:81-161 parity)."""

import os
import subprocess

import pytest

from logsentinelai_ray.sources import (LocalFileTransport, SSHTransport,
                                       detect_rotation, read_remote_lines)
from logsentinelai_ray.sources.remote import fingerprint


def _write(path, lines, end_newline=True):
    with open(path, "w") as f:
        f.write("\n".join(lines) + ("\n" if end_newline else ""))


def _expected(lines):
    return [ln.strip() for ln in lines if ln.strip()]


@pytest.mark.parametrize("chunk_bytes", [7, 64, 1 << 20])
@pytest.mark.parametrize("end_newline", [True, False])
def test_lines_exactly_once_across_chunk_boundaries(ray_session, tmp_path,
                                                    chunk_bytes,
                                                    end_newline):
    lines = [f"line number {i} with content" for i in range(50)]
    lines[7] = "   "          # whitespace-only: dropped
    lines[13] = ""            # empty: dropped
    lines[20] = "  padded  "  # stripped
    path = str(tmp_path / "log.txt")
    _write(path, lines, end_newline)
    ds = read_remote_lines(LocalFileTransport(), path,
                           chunk_bytes=chunk_bytes)
    got = ds.to_pandas().sort_values("byte_offset")
    assert got["line"].tolist() == _expected(lines)
    # offsets point at each line's first byte in the file
    raw = open(path, "rb").read()
    for off, line in zip(got["byte_offset"], got["line"]):
        assert raw[off:off + len(line.encode())].decode().strip() == line \
            or raw[off:].split(b"\n")[0].decode().strip() == line


def test_resume_from_offset_reads_only_the_tail(ray_session, tmp_path):
    path = str(tmp_path / "grow.txt")
    _write(path, ["old one", "old two"])
    size0 = os.path.getsize(path)
    with open(path, "a") as f:
        f.write("new three\nnew four\n")
    ds = read_remote_lines(LocalFileTransport(), path, offset=size0)
    got = ds.to_pandas().sort_values("byte_offset")
    assert got["line"].tolist() == ["new three", "new four"]


def test_rotation_detection(tmp_path):
    path = str(tmp_path / "rot.txt")
    _write(path, ["aaa", "bbb"])
    tr = LocalFileTransport()
    fp = fingerprint(tr, path)
    assert detect_rotation(tr, path, fp) is False
    with open(path, "a") as f:
        f.write("ccc\n")  # growth is a normal append, not rotation
    assert detect_rotation(tr, path, fp) is False
    _write(path, ["a"])  # truncation
    assert detect_rotation(tr, path, fp) is True
    _write(path, ["aaa", "bbb"])
    fp = fingerprint(tr, path)
    _write(path, ["xxx", "yyy"])  # recreate-in-place: same inode+size,
    assert detect_rotation(tr, path, fp) is True  # start marker flips


def test_ssh_transport_commands_and_local_exec(tmp_path):
    """Command strings mirror the reference's stat/dd protocol
    (core/ssh.py:86,102,136); execution through an injected local shell
    proves the transport seam end-to-end without paramiko/network."""
    path = str(tmp_path / "ssh.txt")
    _write(path, ["alpha", "beta", "gamma"])

    assert SSHTransport.size_command("/l") \
        == "stat -c %s '/l' 2>/dev/null || echo 0"
    assert SSHTransport.inode_command("/l") \
        == "stat -c %i '/l' 2>/dev/null || echo 0"
    assert SSHTransport.read_command("/l", 5, 9) \
        == "dd if='/l' bs=1 skip=5 count=9 2>/dev/null || echo ''"

    def local_exec(cmd: str) -> bytes:
        return subprocess.run(["sh", "-c", cmd],
                              capture_output=True).stdout

    tr = SSHTransport("host", "user", exec_fn=local_exec)
    size, fp = tr.stat(path)
    assert size == os.path.getsize(path)
    assert tr.read(path, 6, 4) == open(path, "rb").read()[6:10]


def test_ssh_transport_raises_cleanly_without_paramiko():
    try:
        import paramiko  # noqa: F401
        pytest.skip("paramiko unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="paramiko"):
        SSHTransport("host", "user")


def test_whole_file_read_roundtrip(ray_session, tmp_path):
    """read_whole_files (reference core/commons.py:964-989): one row per
    file, whole content + byte size, through the transport seam."""
    from logsentinelai_ray.sources import read_whole_files

    texts = {"a.txt": "hello\nworld\n", "b.txt": "",
             "c.txt": "unicode éè content",
             "d.txt": "x" * 100_000}
    paths = []
    for name, txt in texts.items():
        p = str(tmp_path / name)
        with open(p, "w", encoding="utf-8") as f:
            f.write(txt)
        paths.append(p)
    got = read_whole_files(LocalFileTransport(), paths) \
        .to_pandas().sort_values("path").reset_index(drop=True)
    assert len(got) == 4
    for _, row in got.iterrows():
        want = texts[os.path.basename(row["path"])]
        assert row["content"] == want
        assert row["size"] == len(want.encode("utf-8"))


def test_whole_file_read_via_ssh_stub(ray_session, tmp_path):
    """The same util through the SSH command stub (local exec_fn), so the
    per-file ReadTask path is exercised with a non-local transport."""
    from logsentinelai_ray.sources import read_whole_files

    p = str(tmp_path / "remote.txt")
    with open(p, "w") as f:
        f.write("line one\nline two\n")

    def exec_fn(command: str) -> bytes:
        return subprocess.run(["sh", "-c", command],
                              capture_output=True).stdout

    tr = SSHTransport("host", "user", exec_fn=exec_fn)
    got = read_whole_files(tr, [p]).to_pandas()
    assert got["content"].tolist() == ["line one\nline two\n"]
    assert got["size"].tolist() == [len("line one\nline two\n")]
