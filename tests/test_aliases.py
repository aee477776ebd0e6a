"""ES index-alias analog (index/aliases.py): registry CRUD, filter
AND-merge semantics, single/multi-member search, impossible
conjunctions."""

import pyarrow as pa
import pytest

from logsentinelai_ray.index import aliases as al


def test_registry_crud(tmp_path):
    reg = str(tmp_path / "aliases.json")
    al.put_alias(reg, "a1", [{"index": "/tmp/i1",
                              "filter": {"lang": "en"}}])
    al.put_alias(reg, "a2", [{"index": "/tmp/i2"}])
    assert set(al.list_aliases(reg)) == {"a1", "a2"}
    assert al.get_alias(reg, "a1")[0]["filter"] == {"lang": "en"}
    al.delete_alias(reg, "a1")
    with pytest.raises(KeyError):
        al.get_alias(reg, "a1")
    with pytest.raises(ValueError):
        al.put_alias(reg, "bad", [])
    with pytest.raises(ValueError):
        al.put_alias(reg, "bad", [{"filter": {"x": 1}}])


def test_merge_filters_intersects_not_last_wins():
    # disjoint same-field values -> never-matching sentinel, not a
    # silent overwrite (the parse_query_string lesson from ADVICE r2)
    assert al._merge_filters({"lang": "en"}, {"lang": "de"}) == \
        {"lang": []}
    assert al._merge_filters({"lang": ["en", "de"]},
                             {"lang": "de"}) == {"lang": "de"}
    assert al._merge_filters({"lang": ["en", "de", "fr"]},
                             {"lang": ["de", "fr"]}) == \
        {"lang": ["de", "fr"]}
    assert al._merge_filters({"lang": "en"}, {"repo": "r1"}) == \
        {"lang": "en", "repo": "r1"}
    assert al._merge_filters(None, {"repo": "r1"}) == {"repo": "r1"}
    assert al._merge_filters({"repo": "r1"}, None) == {"repo": "r1"}


def test_single_member_alias_equals_filtered_search(engine, tmp_path):
    reg = str(tmp_path / "aliases.json")
    al.put_alias(reg, "live",
                 [{"index": engine.index_dir,
                   "filter": {"lang": "python"}}])
    got = al.alias_search(reg, "live", "error merge", k=10,
                          get_engine=lambda d: engine)
    exp = engine.search("error merge", k=10,
                        filters={"lang": "python"}, with_meta=False)
    assert got["doc_id"].to_pylist() == exp["doc_id"].to_pylist()
    assert got["score"].to_pylist() == exp["score"].to_pylist()


def test_multi_member_alias_merges_by_score(engine, tmp_path):
    # two members over the same index with disjoint lang filters ==
    # union of the filtered searches, merged (score desc, doc_id asc)
    reg = str(tmp_path / "aliases.json")
    al.put_alias(reg, "both", [
        {"index": engine.index_dir, "filter": {"lang": "python"}},
        {"index": engine.index_dir, "filter": {"lang": "go"}}])
    got = al.alias_search(reg, "both", "error merge", k=8,
                          get_engine=lambda d: engine)
    parts = []
    for lang in ("python", "go"):
        r = engine.search("error merge", k=8, filters={"lang": lang},
                          with_meta=False)
        parts.append(r.select(["doc_id", "score"]))
    merged = pa.concat_tables(parts).to_pandas() \
        .sort_values(["score", "doc_id"], ascending=[False, True]) \
        .head(8)
    assert got["doc_id"].to_pylist() == merged["doc_id"].tolist()
    assert got["score"].to_pylist() == merged["score"].tolist()


def test_alias_request_filter_conjunction(engine, tmp_path):
    reg = str(tmp_path / "aliases.json")
    al.put_alias(reg, "py",
                 [{"index": engine.index_dir,
                   "filter": {"lang": "python"}}])
    # request filter on a DIFFERENT field ANDs in
    got = al.alias_search(reg, "py", "error merge", k=10,
                          filters={"lang": "python"},
                          get_engine=lambda d: engine)
    assert got.num_rows > 0
    # disjoint same-field conjunction -> zero hits, never last-wins
    none = al.alias_search(reg, "py", "error merge", k=10,
                           filters={"lang": "go"},
                           get_engine=lambda d: engine)
    assert none.num_rows == 0
