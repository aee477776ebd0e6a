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
