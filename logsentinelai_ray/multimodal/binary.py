"""Multimodal (image/audio/video) column plumbing over opaque binary.

Payloads are ``large_binary`` columns with typed metadata columns beside
them — the pattern a 100 TB multimodal pipeline needs: blobs stay Arrow
buffers end-to-end (zero-copy through the object store), small batches
keep blob-batch × concurrency inside a worker heap, and decode runs in an
actor pool so codec/model setup happens once per actor.

The actual image/audio decode libraries are NOT in this container, so
``BinaryFeatureExtractor`` ships a clearly-marked deterministic FAKE
decoder (see ``_fake_decode``); the Ray-side plumbing — schema, actor
signature, batch sizing, output layout — is real and tested. Swapping in
PIL/torchaudio means replacing ``_fake_decode`` only.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def attach_binary_payload(batch: pa.Table, text_col: str = "text",
                          media_type: str = "image/fake") -> pa.Table:
    """Materialize an opaque binary payload column + typed metadata.

    (In production this is the raw blob read from object storage; here the
    deterministic stand-in is the utf-8 encoding of a text column.)
    """
    payload = pc.cast(batch[text_col], pa.large_binary())
    nbytes = pc.binary_length(payload)
    return (batch
            .append_column("payload", payload)
            .append_column("media_type",
                           pa.array([media_type] * batch.num_rows))
            .append_column("payload_bytes", pc.cast(nbytes, pa.int64())))


class BinaryFeatureExtractor:
    """Actor-pool decode/feature stage (``map_batches(cls, concurrency=N,
    batch_size=small)``).

    ``__init__`` is where a real pipeline loads the codec/model once per
    actor (the reference's stateful-stage pattern, core/llm.py:18-79).
    """

    #: set to True to raise instead of faking — documents the stub boundary
    strict = False

    def __init__(self, feature_dim: int = 8):
        self.feature_dim = feature_dim
        if self.strict:
            raise NotImplementedError(
                "real image/audio decoders are not available in this "
                "environment; BinaryFeatureExtractor runs the deterministic "
                "fake decoder unless swapped out")

    def _fake_decode(self, blob: bytes) -> tuple[int, int, np.ndarray]:
        """FAKE DECODE (deterministic): pretends the blob is an image and
        derives (width, height, feature-vector) purely from its bytes."""
        n = len(blob)
        width = n % 640 + 1
        height = (n // 640) % 480 + 1
        digest = hashlib.blake2b(blob, digest_size=self.feature_dim).digest()
        feat = (np.frombuffer(digest, dtype=np.uint8).astype(np.float64)
                / 255.0)
        return width, height, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        widths = np.empty(batch.num_rows, dtype=np.int32)
        heights = np.empty(batch.num_rows, dtype=np.int32)
        feats = np.empty((batch.num_rows, self.feature_dim),
                         dtype=np.float64)
        for i in range(batch.num_rows):
            blob = payloads[i].as_py() or b""
            widths[i], heights[i], feats[i] = self._fake_decode(blob)
        return (batch
                .drop_columns(["payload"])  # blob consumed, don't re-ship
                .append_column("width", pa.array(widths, pa.int32()))
                .append_column("height", pa.array(heights, pa.int32()))
                .append_column("feature", pa.array(
                    list(feats), pa.list_(pa.float64(), self.feature_dim))))


class ImageResizer:
    """Actor-pool resize stage (``map_batches(cls, concurrency=N)``).

    A real pipeline decodes, resamples and re-encodes here (PIL /
    libvips, loaded once per actor in ``__init__``); this container has
    no image libraries, so the pixel work is a clearly-marked stub —
    but the CONTRACT a resize stage owes the pipeline is real and
    exact: fit-inside geometry (aspect-preserving integer downscale,
    never upscaled) and the new payload size, both computed with pure
    integer arithmetic so the SQL oracle reproduces them bit-for-bit.

    out_w = min(w, target_w); out_h = max(1, h * out_w // w);
    resized_bytes = out_w * out_h * 3 (the decoded RGB buffer a real
    re-encode would consume — deterministic, library-free)."""

    strict = False

    def __init__(self, target_w: int = 256):
        self.target_w = int(target_w)
        if self.strict:
            raise NotImplementedError(
                "real image resampling is not available in this "
                "environment; ImageResizer computes exact geometry/size "
                "metadata over the stub decode only")

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = batch["height"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        out_w = np.minimum(w, self.target_w)
        out_h = np.maximum(1, (h * out_w) // w)
        return (batch
                .append_column("out_width",
                               pa.array(out_w, pa.int64()))
                .append_column("out_height",
                               pa.array(out_h, pa.int64()))
                .append_column("resized_bytes",
                               pa.array(out_w * out_h * 3, pa.int64())))


class FrameSampler:
    """Actor-pool video frame-sampling stage — the flat_map multimodal
    layout: ONE input row (a video blob) explodes to one row per
    SAMPLED frame, each carrying the parent id, its frame index and a
    per-frame feature. Codec setup belongs in ``__init__`` (once per
    actor); the decode itself is the deterministic stub (frame count =
    payload_bytes // frame_bytes + 1, uniform stride sampling capped at
    ``max_frames``, ES-side exact: indices are pure integer
    arithmetic). Per-frame features hash blob+index — deterministic,
    non-SQL, covered by rows-only checks."""

    strict = False

    def __init__(self, frame_bytes: int = 1024, max_frames: int = 8,
                 feature_dim: int = 8):
        self.frame_bytes = int(frame_bytes)
        self.max_frames = int(max_frames)
        self.feature_dim = int(feature_dim)
        if self.strict:
            raise NotImplementedError(
                "real video decoding is not available in this "
                "environment; FrameSampler samples deterministic stub "
                "frames")

    def frame_indices(self, n_bytes: int) -> np.ndarray:
        n_frames = n_bytes // self.frame_bytes + 1
        k = min(n_frames, self.max_frames)
        stride = n_frames // k
        return np.arange(k, dtype=np.int64) * stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"]
        if isinstance(payloads, pa.ChunkedArray):
            payloads = payloads.combine_chunks()
        ids, idxs, feats = [], [], []
        id_col = batch["doc_id"].to_numpy(zero_copy_only=False)
        for i in range(batch.num_rows):
            blob = payloads[i].as_py() or b""
            for fi in self.frame_indices(len(blob)):
                ids.append(int(id_col[i]))
                idxs.append(int(fi))
                digest = hashlib.blake2b(
                    blob + int(fi).to_bytes(8, "little"),
                    digest_size=self.feature_dim).digest()
                feats.append((np.frombuffer(digest, dtype=np.uint8)
                              .astype(np.float64) / 255.0).tolist())
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "frame_index": pa.array(idxs, pa.int64()),
            "frame_feature": pa.array(
                feats, pa.list_(pa.float64(), self.feature_dim)),
        })
