"""ES search-template analog (`_search/template` + `_render/template`):
mustache-parameterized Query-DSL bodies, the subset ES documents for
everyday templating:

- ``{{var}}``                      — scalar substitution
- ``{{#toJson}}var{{/toJson}}``    — JSON-encode a param (arrays/objects)
- ``{{var}}{{^var}}dflt{{/var}}``  — default when the param is absent

Reference parity: the reference's saved Kibana searches are exactly
parameterized queries re-run with different values (dashboard ndjson
panels with query input controls); the template API is the ES-native
form. Rendering happens entirely on the driver (a template is KBs);
the rendered body executes through the verified DSL executor
(query/dsl.py), so templating adds zero new scoring surface.
"""

from __future__ import annotations

import json
import re

_TOJSON = re.compile(r"\{\{#toJson\}\}\s*(\w+)\s*\{\{/toJson\}\}")
_DEFAULT = re.compile(
    r"\{\{(\w+)\}\}\{\{\^\1\}\}(.*?)\{\{/\1\}\}", re.DOTALL)
_VAR = re.compile(r"\{\{(\w+)\}\}")


def render_template(source: str | dict, params: dict | None = None):
    """Render a template to a parsed request body (the
    ``_render/template`` contract). ``source`` may be the JSON string
    form (the canonical ES shape — placeholders can sit outside JSON
    string positions, e.g. ``"size": {{size}}``) or an already-parsed
    dict, which is serialized first."""
    params = params or {}
    s = source if isinstance(source, str) else json.dumps(source)

    def _tojson(m: re.Match) -> str:
        name = m.group(1)
        if name not in params:
            raise KeyError(f"search template: missing param {name!r}")
        return json.dumps(params[name])

    s = _TOJSON.sub(_tojson, s)

    def _default(m: re.Match) -> str:
        name, dflt = m.group(1), m.group(2)
        return str(params[name]) if name in params else dflt

    s = _DEFAULT.sub(_default, s)

    def _var(m: re.Match) -> str:
        name = m.group(1)
        if name not in params:
            raise KeyError(f"search template: missing param {name!r}")
        return str(params[name])

    s = _VAR.sub(_var, s)
    try:
        return json.loads(s)
    except json.JSONDecodeError as e:
        raise ValueError(
            f"search template rendered to invalid JSON: {e}") from e


def search_template(engine, source: str | dict,
                    params: dict | None = None, with_meta: bool = False):
    """``_search/template``: render, then execute through the DSL
    executor — results are identical to sending the rendered body to
    ``dsl_search`` directly."""
    body = render_template(source, params)
    return engine.dsl_search(body, with_meta=with_meta)


def msearch_template(engine, requests: list[dict],
                     with_meta: bool = False):
    """``_msearch/template``: a batch of (source, params) template
    requests rendered on the driver and executed back-to-back, results
    stacked under a leading ``query_id`` column (the request's
    position — the ``_msearch`` response-ordering contract). Each
    body runs through the same verified DSL executor as
    ``search_template``, so per-request results are identical to
    issuing them one by one."""
    import pyarrow as pa

    outs = []
    for qid, r in enumerate(requests):
        body = render_template(r["source"], r.get("params"))
        res = engine.dsl_search(body, with_meta=with_meta)
        outs.append(res.add_column(
            0, "query_id", pa.array([qid] * len(res), pa.int64())))
    return pa.concat_tables(outs)
