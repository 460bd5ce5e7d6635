"""Multimodal plumbing tests: batch iteration shape, binary payload
round-trip, fake-feature parity with the numpy reference, and the
payload-pruning claim for metadata-only queries.
"""

from __future__ import annotations

import numpy as np
import pytest

from landsat_tair_data_pipeline_spark.operators.multimodal import (
    HIST_BINS,
    byte_histogram,
    decode_image_real,
    fake_decode_stats,
    media_table,
    mm_decode_stats,
    mm_feature_extract,
    mm_feature_vectors,
    mm_type_summary,
)


def test_payload_roundtrip(spark, sf_dir):
    """payload is the exact UTF-8 encoding of the source text."""
    media = media_table(spark, sf_dir).select("doc_id", "payload").limit(5)
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    for r in media.collect():
        assert bytes(r["payload"]) == docs[r["doc_id"]].encode("utf-8")


def test_decode_stats_match_local(spark, sf_dir):
    """mapInPandas decode stats == driver-side byte math on raw text."""
    got = {
        r["doc_id"]: (r["n_bytes"], r["first_byte"], r["byte_sum"])
        for r in mm_decode_stats(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    for r in docs:
        assert got[r["doc_id"]] == fake_decode_stats(r["text"].encode("utf-8"))


def test_feature_extract_matches_numpy(spark, sf_dir):
    feats = {
        r["doc_id"]: r["features"]
        for r in mm_feature_vectors(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    for r in docs[:20]:
        want = byte_histogram(r["text"].encode("utf-8"))
        got = feats[r["doc_id"]]
        assert len(got) == HIST_BINS
        assert np.allclose(got, want)


def test_feature_extract_surface_is_scalar_and_dense(spark, sf_dir):
    """Registry surface: (doc_id, bin_idx, value) scalar rows, all
    HIST_BINS bins per doc (zero bins included), values summing to ~1."""
    rows = mm_feature_extract(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs * HIST_BINS
    by_doc: dict[int, float] = {}
    for r in rows:
        assert 0 <= r["bin_idx"] < HIST_BINS
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0.0) + r["value"]
    assert all(abs(s - 1.0) < 1e-3 for s in by_doc.values())


def test_metadata_query_prunes_payload(spark, sf_dir):
    """mm_type_summary must not read the binary column: the parquet
    scan's ReadSchema only needs doc_id."""
    plan = mm_type_summary(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan
    assert "text" not in plan.split("ReadSchema")[1][:200] if "ReadSchema" in plan else True


def test_real_decode_is_gated():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_image_real(b"\x89PNG")
