"""FOR bitpack codec (``IndexConfig.codec="bitpack"``): roundtrip
properties, size advantage, and end-to-end rank identity vs a varint
build of the same corpus on every query strategy."""

import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from logsentinelai_ray.index.codec import (
    decode_for_block,
    decode_for_stream,
    encode_for,
)


def _roundtrip(values: np.ndarray, block: int) -> None:
    starts = np.arange(0, values.size, block, dtype=np.int64)
    data, offs = encode_for(values, starts)
    counts = np.diff(np.append(starts, values.size))
    offs_full = np.append(offs, len(data))
    got = decode_for_stream(data, offs_full, counts)
    assert np.array_equal(got, values.astype(np.int64))
    buf = np.frombuffer(data, np.uint8)
    for bi in range(starts.size):
        blk = decode_for_block(buf[offs_full[bi]:offs_full[bi + 1]],
                               int(counts[bi]))
        assert np.array_equal(
            blk, values[starts[bi]:starts[bi] + counts[bi]].astype(np.int64))


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=400),
       st.integers(min_value=1, max_value=128))
def test_bitpack_roundtrip(values, block):
    _roundtrip(np.array(values, dtype=np.uint64), block)


def test_bitpack_wide_and_narrow_mix():
    # one block all-zeros (w=1), one block 62-bit, short tail block
    v = np.concatenate([np.zeros(128, np.uint64),
                        np.full(128, (1 << 62) - 1, np.uint64),
                        np.arange(5, dtype=np.uint64)])
    _roundtrip(v, 128)


def test_bitpack_smaller_than_varint_on_dense_gaps():
    from logsentinelai_ray.index.codec import encode_varint

    gaps = np.ones(100_000, dtype=np.uint64)  # dense term: every doc
    starts = np.arange(0, gaps.size, 128, dtype=np.int64)
    packed, _ = encode_for(gaps, starts)
    assert len(packed) * 4 < len(encode_varint(gaps))


@pytest.fixture(scope="module")
def dual_codec_indexes(ray_session, tmp_path_factory):
    import ray.data as rd

    from logsentinelai_ray.config import CorpusConfig, IndexConfig
    from logsentinelai_ray.corpus import generate_corpus
    from logsentinelai_ray.index.build import build_index

    root = tmp_path_factory.mktemp("bitpack")
    tbl = generate_corpus(CorpusConfig(n_docs=400))
    dirs = {}
    for codec in ("varint", "bitpack"):
        cfg = IndexConfig(num_partitions=4, salt_buckets=2, block_size=32,
                          codec=codec)
        d = str(root / codec)
        build_index(rd.from_arrow(tbl), d, cfg, corpus_tag=codec)
        dirs[codec] = d
    return dirs


QUERIES = ["authentication failure error", "parse json config",
           "merge sort window", "http request retry timeout",
           "import numpy pandas"]


def test_bitpack_rank_identity_all_strategies(dual_codec_indexes):
    from logsentinelai_ray.query.shards import SearchEngine

    ev = SearchEngine(dual_codec_indexes["varint"], num_shards=2)
    eb = SearchEngine(dual_codec_indexes["bitpack"], num_shards=2)
    try:
        assert eb.stats["codec"] == "bitpack"
        for q in QUERIES:
            for strategy in ("taat", "wand"):
                rv = ev.search(q, k=10, strategy=strategy)
                rb = eb.search(q, k=10, strategy=strategy)
                assert rv["doc_id"].to_pylist() == rb["doc_id"].to_pylist(), \
                    (q, strategy)
                assert rv["score"].to_pylist() == rb["score"].to_pylist(), \
                    (q, strategy)
            fv = ev.search(q, k=10, filters={"lang": "python"})
            fb = eb.search(q, k=10, filters={"lang": "python"})
            assert fv["doc_id"].to_pylist() == fb["doc_id"].to_pylist()
    finally:
        ev.shutdown()
        eb.shutdown()


def test_bitpack_posting_streams_smaller(dual_codec_indexes):
    """Raw posting-stream bytes (what decode and the object store move)
    shrink under bitpack; tiny-corpus parquet framing is excluded on
    purpose — at scale the streams dominate the file."""
    import pyarrow.dataset as pa_ds

    def stream_bytes(d):
        tbl = pa_ds.dataset(os.path.join(d, "segments"),
                            format="parquet").to_table(
            columns=["doc_data", "tf_data", "dl_data"])
        return sum(sum(len(v) for v in tbl[c].to_pylist())
                   for c in ("doc_data", "tf_data", "dl_data"))

    assert stream_bytes(dual_codec_indexes["bitpack"]) < \
        stream_bytes(dual_codec_indexes["varint"])


def test_bitpack_incremental_update(dual_codec_indexes, tmp_path):
    """An update on a bitpack index derives codec from stats.json and
    stays rank-identical to a fresh rebuild of the full corpus."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from logsentinelai_ray.config import CorpusConfig, IndexConfig
    from logsentinelai_ray.corpus import generate_corpus
    from logsentinelai_ray.index.build import build_index
    from logsentinelai_ray.index.update import update_index
    from logsentinelai_ray.query.shards import SearchEngine

    full = generate_corpus(CorpusConfig(n_docs=450))
    base = full.slice(0, 400)
    delta = full.slice(400, 50)
    cfg = IndexConfig(num_partitions=4, salt_buckets=2, block_size=32,
                      codec="bitpack")

    inc_dir = str(tmp_path / "inc")
    build_index(rd.from_arrow(base), inc_dir, cfg, corpus_tag="b")
    delta_path = str(tmp_path / "delta.parquet")
    pq.write_table(delta, delta_path)
    update_index([delta_path], inc_dir)

    full_dir = str(tmp_path / "full")
    build_index(rd.from_arrow(full), full_dir, cfg, corpus_tag="f")

    ei = SearchEngine(inc_dir, num_shards=2)
    ef = SearchEngine(full_dir, num_shards=2)
    try:
        for q in QUERIES:
            ri = ei.search(q, k=10, with_meta=True)
            rf = ef.search(q, k=10, with_meta=True)
            assert ri["sha256"].to_pylist() == rf["sha256"].to_pylist(), q
            assert ri["score"].to_pylist() == rf["score"].to_pylist(), q
    finally:
        ei.shutdown()
        ef.shutdown()


def test_bitpack_phrase_positions(ray_session, tmp_path):
    """Phrase search on a bitpack index: doc/tf/dl streams bitpack, the
    positions sidecar stays parquet-native — results identical to the
    varint build."""
    import ray.data as rd

    from logsentinelai_ray.config import CorpusConfig, IndexConfig
    from logsentinelai_ray.corpus import generate_corpus
    from logsentinelai_ray.index.build import build_index
    from logsentinelai_ray.query.shards import SearchEngine

    tbl = generate_corpus(CorpusConfig(n_docs=300))
    engines = []
    try:
        for codec in ("varint", "bitpack"):
            cfg = IndexConfig(num_partitions=4, salt_buckets=2,
                              block_size=32, codec=codec,
                              store_positions=True)
            d = str(tmp_path / f"ph_{codec}")
            build_index(rd.from_arrow(tbl), d, cfg, corpus_tag=codec)
            engines.append(SearchEngine(d, num_shards=2))
        ev, eb = engines
        for phrase in ("authentication failure", "merge sort",
                       "request timeout"):
            mv = ev.phrase_match(phrase)
            mb = eb.phrase_match(phrase)
            assert mv["doc_id"].to_pylist() == mb["doc_id"].to_pylist(), \
                phrase
            tv = ev.phrase_topk(phrase, k=5)
            tb = eb.phrase_topk(phrase, k=5)
            assert tv["doc_id"].to_pylist() == tb["doc_id"].to_pylist()
            assert tv["score"].to_pylist() == tb["score"].to_pylist()
    finally:
        for e in engines:
            e.shutdown()
