from .remote import (  # noqa: F401
    LocalFileTransport,
    SSHTransport,
    detect_rotation,
    fingerprint,
    read_remote_lines,
    read_whole_files,
)
