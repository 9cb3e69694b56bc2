"""Unit tests for n-gram novelty scoring and the shard-export manifest."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from legislative_bills_database_spark.operators.corpus import ngram_novelty
from legislative_bills_database_spark.sources.sinks import shard_export


def test_ngram_novelty_crafted_docs(spark):
    # doc 1 and 2 share one 3-gram ("a b c"); doc 3 is entirely unique
    docs = spark.createDataFrame(
        [
            (1, "a b c d"),       # grams: "a b c", "b c d"
            (2, "a b c x"),       # grams: "a b c", "b c x"
            (3, "p q r s"),       # grams: "p q r", "q r s"
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
    assert out[1]["n_grams"] == 2 and out[1]["n_unique"] == 1
    assert out[2]["n_grams"] == 2 and out[2]["n_unique"] == 1
    assert out[3]["n_grams"] == 2 and out[3]["n_unique"] == 2
    assert out[3]["novelty"] == 1.0 and out[1]["novelty"] == 0.5


def test_ngram_novelty_duplicate_docs_score_zero(spark):
    docs = spark.createDataFrame(
        [(1, "x y z w"), (2, "x y z w")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
    assert out[1]["novelty"] == 0.0 and out[2]["novelty"] == 0.0


def test_shard_export_partition_files_and_manifest(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(100)], "doc_id int, text string"
    )
    path = str(tmp_path / "shards")
    manifest = shard_export(
        spark, df, path, n_shards=4, id_col="doc_id",
        digest_cols=["doc_id", "text"],
    ).collect()

    assert sorted(r["shard"] for r in manifest) == [0, 1, 2, 3]
    assert sum(r["n_rows"] for r in manifest) == 100
    # one writer task per shard directory → exactly one data file each
    for s in range(4):
        assert len(glob.glob(f"{path}/shard={s}/part-*.parquet")) == 1

    # the manifest digest is order-independent and reproducible
    again = shard_export(
        spark, df, str(tmp_path / "shards2"), n_shards=4, id_col="doc_id",
        digest_cols=["doc_id", "text"],
    ).collect()
    assert {r["shard"]: r["content_sha"] for r in manifest} == {
        r["shard"]: r["content_sha"] for r in again
    }

    # tampering a shard flips ONLY that shard's digest
    tampered = (
        spark.read.parquet(path)
        .filter(~((F.col("shard") == manifest[0]["shard"]) & (F.col("doc_id") == F.lit(
            spark.read.parquet(path).filter(
                F.col("shard") == manifest[0]["shard"]
            ).agg(F.min("doc_id")).first()[0]
        ))))
    )
    row_sha = F.sha2(
        F.concat_ws("|", F.col("doc_id").cast("string"), F.col("text")), 256
    )
    redone = {
        r["shard"]: r["content_sha"]
        for r in tampered.select(
            F.col("shard").cast("int").alias("shard"), row_sha.alias("__h")
        )
        .groupBy("shard")
        .agg(
            F.sha2(
                F.array_join(F.array_sort(F.collect_list("__h")), ""), 256
            ).alias("content_sha")
        )
        .collect()
    }
    orig = {r["shard"]: r["content_sha"] for r in manifest}
    changed = [s for s in orig if redone[s] != orig[s]]
    assert changed == [manifest[0]["shard"]]
