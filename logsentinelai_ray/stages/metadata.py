"""Reference-parity metadata stamping + dead-letter handling.

- ``stamp_metadata`` reproduces the reference's ``@``-prefixed metadata
  fields (reference core/commons.py:214-237 stamps 12 of them onto every
  analysis doc) as added columns in one vectorized ``map_batches`` — minus
  the wall-clock fields, which are exactly what breaks reproducibility in
  the reference (core/elasticsearch.py:64 mints ids from utcnow()).
- ``dead_letter_split`` reproduces the failure-document pattern (reference
  core/commons.py:270-351 builds a ``@processing_result="failed"`` doc with
  ``@error_type``/``@error_message[:200]`` and still indexes it): rows that
  fail a validation predicate become quarantine rows instead of aborting
  the partition.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def stamp_metadata(batch: pa.Table, log_type: str, processing_mode: str
                   = "batch", count_col: str | None = None) -> pa.Table:
    """Add the deterministic subset of the reference's @-metadata."""
    n = batch.num_rows
    out = (batch
           .append_column("@log_type",
                          pa.array([log_type] * n, pa.string()))
           .append_column("@processing_mode",
                          pa.array([processing_mode] * n, pa.string()))
           .append_column("@processing_result",
                          pa.array(["success"] * n, pa.string())))
    if count_col is not None:
        out = out.append_column("@log_count",
                                pc.cast(batch[count_col], pa.int64()))
    return out


def dead_letter_split(batch: pa.Table, min_chars: int = 1,
                      text_col: str = "text") -> pa.Table:
    """Mark invalid rows as failed instead of dropping them (the
    reference's error-document semantics, truncating the message to 200
    chars like core/commons.py:331)."""
    length = pc.utf8_length(pc.fill_null(batch[text_col], ""))
    ok = pc.greater_equal(length, min_chars)
    result = pc.if_else(ok, pa.scalar("success"), pa.scalar("failed"))
    err_type = pc.if_else(ok, pa.scalar(None, pa.string()),
                          pa.scalar("ValidationError"))
    msg = pc.if_else(
        ok, pa.scalar(None, pa.string()),
        pc.utf8_slice_codeunits(
            pc.binary_join_element_wise(
                pa.array(["document shorter than min_chars: "] *
                         batch.num_rows),
                pc.cast(length, pa.string()), ""),
            0, 200))
    return (batch
            .append_column("@processing_result", result)
            .append_column("@error_type", err_type)
            .append_column("@error_message", msg))
