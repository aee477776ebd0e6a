"""Console entry point (`python -m logsentinelai_ray`, the `ray job
submit` workload surface): gen → build → search / explain → delete →
compact → snapshot, each through main(argv) in-process. The session
fixture owns Ray; `_ray_session` detects the live session and reuses it
(the same contract the driver relies on)."""

import json
import os

import pytest

from logsentinelai_ray.__main__ import main


@pytest.fixture(scope="module")
def cli_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    corpus = str(root / "corpus")
    index = str(root / "index")
    assert main(["gen", "--out", corpus, "--docs", "400",
                 "--files", "4"]) == 0
    assert main(["build", "--corpus", corpus, "--index", index,
                 "--partitions", "8", "--salts", "2"]) == 0
    return corpus, index


def _run(capfd, argv) -> list[dict]:
    """Drain captured output, run main(argv), parse its JSON lines —
    skipping non-JSON noise (raylet warnings sometimes land on stdout
    mid-suite)."""
    capfd.readouterr()
    assert main(argv) == 0
    out, _ = capfd.readouterr()
    rows = []
    for ln in out.strip().splitlines():
        try:
            rows.append(json.loads(ln))
        except json.JSONDecodeError:
            continue
    assert rows, f"no JSON lines in CLI output: {out[:300]!r}"
    return rows


def test_cli_gen_build_outputs(cli_index, capfd):
    corpus, index = cli_index
    assert os.path.exists(os.path.join(index, "stats.json")) or \
        os.path.isdir(os.path.join(index, "segments"))
    assert os.path.isdir(corpus)


def test_cli_search_and_strategies_agree(cli_index, capfd):
    _, index = cli_index
    rows = _run(capfd, ["search", "--index", index, "error value parse",
                        "-k", "5"])
    assert 0 < len(rows) <= 5
    assert {"doc_id", "score"} <= set(rows[0])
    rows_wand = _run(capfd, ["search", "--index", index,
                             "error value parse", "-k", "5",
                             "--strategy", "wand"])
    assert [(r["doc_id"], r["score"]) for r in rows] == \
        [(r["doc_id"], r["score"]) for r in rows_wand]


def test_cli_search_with_terms_filter(cli_index, capfd):
    _, index = cli_index
    rows = _run(capfd, ["search", "--index", index, "error", "-k", "10",
                        "--filter", "lang=python,go"])
    assert rows, "terms filter returned nothing on a python-heavy corpus"
    assert all(r["lang"] in ("python", "go") for r in rows)


def test_cli_explain_sums_to_score(cli_index, capfd):
    _, index = cli_index
    top = _run(capfd, ["search", "--index", index, "error return value",
                       "-k", "1"])[0]
    parts = _run(capfd, ["explain", "--index", index, "error return value",
                         str(top["doc_id"])])
    total = sum(p["contribution"] for p in parts)
    assert total == pytest.approx(top["score"], rel=1e-9)


def test_cli_delete_then_compact(cli_index, capfd, tmp_path):
    _, index = cli_index
    victims = [str(r["doc_id"])
               for r in _run(capfd, ["search", "--index", index,
                                     "error", "-k", "3"])][:2]
    del_report = _run(capfd, ["delete", "--index", index] + victims)[0]
    assert del_report["tombstones"] >= 2
    ids = {str(r["doc_id"])
           for r in _run(capfd, ["search", "--index", index,
                                 "error", "-k", "10"])}
    assert not (ids & set(victims))
    out = str(tmp_path / "compacted")
    _run(capfd, ["compact", "--index", index, "--out", out])
    ids2 = {str(r["doc_id"])
            for r in _run(capfd, ["search", "--index", out,
                                  "error", "-k", "10"])}
    assert not (ids2 & set(victims))


def test_cli_delete_by_query(cli_index, capfd):
    """`delete --query` is the ES _delete_by_query analog: every doc
    matching the query is tombstoned and disappears from search."""
    _, index = cli_index
    hits = _run(capfd, ["search", "--index", index, "timeout", "-k", "5"])
    assert hits, "need at least one match to delete"
    rep = _run(capfd, ["delete", "--index", index,
                       "--query", "timeout"])[0]
    assert rep["deleted"] > 0
    again = _run(capfd, ["delete", "--index", index,
                         "--query", "timeout"])[0]
    assert again["deleted"] == 0  # idempotent


def test_cli_snapshot_roundtrip(cli_index, capfd, tmp_path):
    _, index = cli_index
    out = str(tmp_path / "snap")
    report = _run(capfd, ["snapshot", "--index", index, "--out", out])[0]
    assert report["parts"] > 0 and report["n_postings"] > 0


def test_cli_rollover_and_alias_search(cli_index, capfd, tmp_path):
    """rollover ingests seal at --max-docs and alias-search serves the
    union — identical doc ids to a plain search over one index built
    from the same corpus when everything fits one generation."""
    corpus, index = cli_index
    files = sorted(os.listdir(corpus))
    alias_dir = str(tmp_path / "alias")

    first = _run(capfd, ["rollover", "--corpus",
                         os.path.join(corpus, files[0]),
                         "--alias-dir", alias_dir, "--max-docs", "150",
                         "--partitions", "8", "--salts", "2",
                         "--tag", "r0"])[0]
    assert first["generation"]["name"] == "gen-0000"
    second = _run(capfd, ["rollover", "--corpus",
                          os.path.join(corpus, files[1]),
                          "--alias-dir", alias_dir, "--max-docs", "150",
                          "--partitions", "8", "--salts", "2",
                          "--tag", "r1"])[0]
    assert second["generations"] >= 1

    rows = _run(capfd, ["alias-search", "--alias-dir", alias_dir,
                        "error merge", "-k", "5"])
    assert rows and all({"doc_id", "score"} <= set(r) for r in rows)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_cli_transform_build_and_continue(ray_session, tmp_path, capfd):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(13)
    n = 1200
    ts = np.sort(rng.integers(1_700_000_000_000_000,
                              1_700_050_000_000_000, n))
    tbl = pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 25, n), pa.int64()),
        "event_type": pa.array(
            rng.choice(["view", "click", "error"], n).tolist()),
        "value": pa.array(rng.uniform(0, 9, n), pa.float64()),
    })
    cut = int(np.median(ts))
    first = str(tmp_path / "first.parquet")
    full = str(tmp_path / "full.parquet")
    pq.write_table(tbl.filter(pa.array(ts <= cut)), first)
    pq.write_table(tbl, full)
    dest = str(tmp_path / "dest")

    rows = _run(capfd, ["transform", "--events", first,
                        "--dest", dest, "--partitions", "4"])
    assert rows[-1]["gen"] == 0
    rows = _run(capfd, ["transform", "--events", full,
                        "--dest", dest, "--continue"])
    assert rows[-1]["gen"] == 1
    # destination equals a from-scratch build over the full source
    from logsentinelai_ray.stages.transform import read_transform

    dest2 = str(tmp_path / "dest2")
    _run(capfd, ["transform", "--events", full, "--dest", dest2,
                 "--partitions", "4"])
    a = read_transform(dest).to_pylist()
    b = read_transform(dest2).to_pylist()
    assert a == b


def test_cli_esql(ray_session, capfd):
    rows = _run(capfd, [
        "esql", "FROM events | WHERE event_type == \"error\" "
        "| STATS n = COUNT(*), u = COUNT_DISTINCT(user_id)",
        "--sf-dir", "/root/testdata/sf0.001"])
    import duckdb
    exp = duckdb.sql(
        "SELECT count(*)::BIGINT AS n, "
        "count(DISTINCT user_id)::BIGINT AS u FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet') "
        "WHERE event_type = 'error'").fetchone()
    assert rows[-1] == {"n": exp[0], "u": exp[1]}


def test_cli_alias_put_query_list_delete(cli_index, capfd, tmp_path):
    _, index = cli_index
    reg = str(tmp_path / "aliases.json")
    _run(capfd, ["alias", "put", "--registry", reg, "--name", "py",
                 "--member", f"{index}:lang=python"])
    rows = _run(capfd, ["alias", "query", "--registry", reg,
                        "--name", "py", "--text", "error merge"])
    assert all("doc_id" in r and "score" in r for r in rows)
    # equals the direct filtered search through the same index
    direct = _run(capfd, ["search", "--index", index, "error merge",
                          "--filter", "lang=python"])
    assert [r["doc_id"] for r in rows] == \
        [r["doc_id"] for r in direct]
    listed = _run(capfd, ["alias", "list", "--registry", reg])
    assert "py" in listed[-1]
    _run(capfd, ["alias", "delete", "--registry", reg,
                 "--name", "py"])
    listed = _run(capfd, ["alias", "list", "--registry", reg])
    assert listed[-1] == {}


def test_analyze_reference_corpora(ray_session, capfd):
    """The `analyze` subcommand — the reference's four console-script
    analyzers (pyproject [project.scripts]) — over the reference's own
    sample logs, Statistics shapes pinned to grep-established ground
    truth."""
    base = "/root/reference/sample-logs"
    if not os.path.isdir(base):
        pytest.skip("reference corpora not present")
    out = _run(capfd, ["analyze", "--type", "httpd_server",
                       f"{base}/apache-100.log"])[-1]
    assert out["total_event"] == 100 and out["unparsed_lines"] == 0
    assert "error:70" in out["event_by_level"]
    assert "missing_file:33" in out["event_by_type"]
    out = _run(capfd, ["analyze", "--type", "linux_system",
                       f"{base}/linux-2k.log"])[-1]
    assert out["auth_failures"] == 490
    assert out["unique_users"] == 5 and out["unique_ips"] == 27
    out = _run(capfd, ["analyze", "--type", "httpd_access",
                       f"{base}/access-100.log"])[-1]
    assert out["total_requests"] == 100
    assert out["response_code_dist"][0] == "200:96"
    assert out["error_rate"] == 0.03
    out = _run(capfd, ["analyze", "--type", "general_log",
                       f"{base}/apache-100.log",
                       f"{base}/linux-100.log"])[-1]
    assert out["total_events"] == 200
    assert out["detected_formats"] == ["apache_error:100",
                                       "syslog:100"]
    assert out["unique_sources"] == 5


def test_analyze_categorize_templates(ray_session, capfd):
    """`analyze --type categorize` — ES|QL 9.x CATEGORIZE pointed at a
    real corpus: deterministic template mining over linux-2k.log,
    counts pinned (the top template is the PAM auth-failure line with
    its ids/hosts/timestamps collapsed to '*')."""
    base = "/root/reference/sample-logs"
    if not os.path.isdir(base):
        pytest.skip("reference corpora not present")
    out = _run(capfd, ["analyze", "--type", "categorize", "--top", "3",
                       f"{base}/linux-2k.log"])[-1]
    assert out["total_lines"] == 2000
    assert out["total_categories"] == 156
    top = out["top_categories"]
    assert top[0]["category"] == (
        "Jul * combo * authentication failure; logname= * "
        "tty=NODEVssh ruser= * user=root")
    assert top[0]["n"] == 247
    assert len(top) == 3
    assert top[0]["n"] >= top[1]["n"] >= top[2]["n"]
