"""ES search-template analog (query/template.py): mustache rendering
(scalars, toJson, default blocks, error cases) and end-to-end identity
with the directly-executed DSL body."""

import pytest

from logsentinelai_ray.query.template import (render_template,
                                              search_template)


def test_render_scalars_and_defaults():
    src = ('{"query": {"match": {"content": "{{q}}"}}, '
           '"size": {{size}}{{^size}}10{{/size}}}')
    assert render_template(src, {"q": "err", "size": 3}) == \
        {"query": {"match": {"content": "err"}}, "size": 3}
    assert render_template(src, {"q": "err"}) == \
        {"query": {"match": {"content": "err"}}, "size": 10}


def test_render_tojson_and_dict_source():
    src = '{"query": {"terms": {"lang": {{#toJson}}langs{{/toJson}}}}}'
    assert render_template(src, {"langs": ["en", "de"]}) == \
        {"query": {"terms": {"lang": ["en", "de"]}}}
    # dict source round-trips through serialization
    assert render_template({"size": 5}, {}) == {"size": 5}


def test_render_errors():
    with pytest.raises(KeyError):
        render_template('{"q": "{{missing}}"}', {})
    with pytest.raises(ValueError):
        render_template('{"size": {{n}}', {"n": 1})  # broken JSON


def test_search_template_equals_direct_dsl(engine):
    src = ('{"query": {"bool": {'
           '"must": [{"match": {"content": "{{q}}"}}], '
           '"filter": [{"term": {"lang": "{{lang}}"}}]}}, '
           '"size": {{size}}{{^size}}10{{/size}}}')
    params = {"q": "error merge", "lang": "python"}
    got = search_template(engine, src, params)
    direct = engine.dsl_search(
        {"query": {"bool": {
            "must": [{"match": {"content": "error merge"}}],
            "filter": [{"term": {"lang": "python"}}]}},
         "size": 10})
    assert got.to_pydict() == direct.to_pydict()


def test_msearch_template_equals_sequential(engine):
    """_msearch/template must equal per-request search_template, per
    query_id."""
    import numpy as np

    from logsentinelai_ray.query.template import (msearch_template,
                                                  search_template)

    src = ('{"query": {"bool": {"must": [{"match": {"content": '
           '"{{qtext}}"}}]}}, "size": {{size}}{{^size}}5{{/size}}}')
    reqs = [{"source": src, "params": {"qtext": "error merge"}},
            {"source": src, "params": {"qtext": "import numpy",
                                       "size": 3}}]
    batch = msearch_template(engine, reqs)
    for qid, r in enumerate(reqs):
        solo = search_template(engine, r["source"], r["params"])
        part = batch.filter(np.equal(
            batch["query_id"].to_numpy(zero_copy_only=False), qid)) \
            .drop_columns(["query_id"])
        assert part.to_pydict() == solo.to_pydict(), qid
