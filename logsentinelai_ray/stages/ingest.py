"""ES ingest-pipeline analog: a declarative processor chain compiled to
ONE vectorized Arrow batch transform.

The reference's enrichment path (parse → stamp → rename → coerce,
core/commons.py prompt/post-processing and utils/general.py display
shaping) is what ES factors into ingest pipelines: a JSON list of
processors applied per document before indexing. Here the pipeline spec
compiles ONCE (per actor / per `map_batches` fn) into a chain of
pyarrow.compute kernels — no per-row Python, no re-parse per batch —
and runs anywhere a Dataset transform runs.

Supported processors (the common core of the ES set):

- ``set``        {field, value}                constant column
- ``rename``     {field, target_field}
- ``remove``     {field}
- ``convert``    {field, type: int|double|string}
- ``lowercase`` / ``uppercase`` / ``trim``     {field}
- ``gsub``       {field, pattern, replacement}  (RE2 via pc.replace_substring_regex)
- ``concat``     {fields, target_field, separator}  (ES set+mustache analog)
- ``date``       {field, target_field, format: "%Y-%m-%d"}  timestamp → string
- ``math``       {field, target_field, op: add|mul, operand}  numeric kernel

Failure contract: unknown processor or missing field raises at COMPILE
time when the schema is known (``validate``), else at run time with the
processor index in the message — the ES ``on_failure`` analog is the
caller's dead-letter split (stages/metadata.py), which this composes
with. Spec parity tested in test_functions.py; the driver entry
``ingest_pipeline`` has an exact SQL oracle mirroring every processor.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

_TYPES = {"int": pa.int64(), "double": pa.float64(),
          "string": pa.string()}


def _need(table: pa.Table, field: str, i: int, kind: str):
    if field not in table.column_names:
        raise KeyError(
            f"ingest processor #{i} ({kind}): field '{field}' missing")
    return table[field]


def compile_pipeline(spec: list[dict]) -> Callable[[pa.Table], pa.Table]:
    """Compile the processor list once; returns a pa.Table -> pa.Table
    function suitable for ``map_batches(..., batch_format='pyarrow')``."""
    steps = []
    for i, proc in enumerate(spec):
        if len(proc) != 1:
            raise ValueError(f"processor #{i}: one key expected")
        kind, p = next(iter(proc.items()))

        if kind == "set":
            def step(t, i=i, p=p):
                n = t.num_rows
                arr = pa.array([p["value"]] * n)
                f = p["field"]
                if f in t.column_names:
                    t = t.drop_columns([f])
                return t.append_column(f, arr)
        elif kind == "rename":
            def step(t, i=i, p=p):
                col = _need(t, p["field"], i, "rename")
                return t.drop_columns([p["field"]]) \
                    .append_column(p["target_field"], col)
        elif kind == "remove":
            def step(t, i=i, p=p):
                _need(t, p["field"], i, "remove")
                return t.drop_columns([p["field"]])
        elif kind == "convert":
            ty = _TYPES[p["type"]]

            def step(t, i=i, p=p, ty=ty):
                col = _need(t, p["field"], i, "convert")
                return t.set_column(t.column_names.index(p["field"]),
                                    p["field"], pc.cast(col, ty))
        elif kind in ("lowercase", "uppercase", "trim"):
            fn = {"lowercase": pc.utf8_lower, "uppercase": pc.utf8_upper,
                  "trim": pc.utf8_trim_whitespace}[kind]

            def step(t, i=i, p=p, fn=fn, kind=kind):
                col = _need(t, p["field"], i, kind)
                return t.set_column(t.column_names.index(p["field"]),
                                    p["field"], fn(col))
        elif kind == "gsub":
            def step(t, i=i, p=p):
                col = _need(t, p["field"], i, "gsub")
                out = pc.replace_substring_regex(
                    col, pattern=p["pattern"],
                    replacement=p["replacement"])
                return t.set_column(t.column_names.index(p["field"]),
                                    p["field"], out)
        elif kind == "concat":
            def step(t, i=i, p=p):
                cols = [pc.cast(_need(t, f, i, "concat"), pa.string())
                        for f in p["fields"]]
                out = pc.binary_join_element_wise(
                    *cols, p.get("separator", ""))
                f = p["target_field"]
                if f in t.column_names:
                    t = t.drop_columns([f])
                return t.append_column(f, out)
        elif kind == "date":
            def step(t, i=i, p=p):
                col = _need(t, p["field"], i, "date")
                out = pc.strftime(col, format=p.get("format",
                                                    "%Y-%m-%d"))
                f = p.get("target_field", p["field"])
                if f in t.column_names:
                    t = t.drop_columns([f])
                return t.append_column(f, out)
        elif kind == "grok":
            # the ES grok processor's regex core: named capture groups
            # become columns (one vectorized pc.extract_regex; rows
            # that don't match get nulls — pair with a dead-letter
            # split downstream, stages/metadata.py). The full grok
            # pattern library is sugar over this; see
            # stages/accesslog.py for a real composed example.
            def step(t, i=i, p=p):
                col = _need(t, p["field"], i, "grok")
                st = pc.extract_regex(col, pattern=p["pattern"])
                names = [fld.name for fld in st.type]
                drop = [nm for nm in names if nm in t.column_names]
                if drop:
                    t = t.drop_columns(drop)
                for nm in names:
                    t = t.append_column(nm, pc.struct_field(st, nm))
                return t
        elif kind == "math":
            op = {"add": pc.add, "mul": pc.multiply}[p["op"]]

            def step(t, i=i, p=p, op=op):
                col = _need(t, p["field"], i, "math")
                out = op(col, p["operand"])
                f = p.get("target_field", p["field"])
                if f in t.column_names:
                    t = t.drop_columns([f])
                return t.append_column(f, out)
        else:
            raise ValueError(f"processor #{i}: unknown kind '{kind}'")
        steps.append(step)

    def run(t: pa.Table) -> pa.Table:
        for s in steps:
            t = s(t)
        return t

    return run
