"""Phase-level wall-time breakdown of q_textrank_summary (guide §1:
measure first).  Each phase materializes one link of the chain with a
noop write in a fresh session; phases overlap (each includes its
upstream), so the marginal cost of a link is the delta to the previous
phase.  Run: python jobs/profile_textrank.py [phase...]"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from pydoxtools_spark.operators import similarity  # noqa: E402
from pydoxtools_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _base(spark):
    d = entrymod._docs(spark, SF_DIR).filter(F.col("doc_id") % 2 == 0).select(
        "doc_id",
        F.regexp_replace(F.trim("text"), r"((\S+\s+){7}\S+)\s+", "$1. ").alias("text"),
    )
    return d


def phase_sents(spark):
    d = _base(spark)
    sents = d.select(
        F.col("doc_id"),
        F.posexplode(F.split(F.trim(F.col("text")), r"(?<=[.!?])\s+")).alias(
            "sent_idx", "sentence"),
    ).filter(F.length(F.trim("sentence")) > 0)
    _noop(sents)


def phase_emb(spark):
    d = _base(spark)
    sents = d.select(
        F.col("doc_id"),
        F.posexplode(F.split(F.trim(F.col("text")), r"(?<=[.!?])\s+")).alias(
            "sent_idx", "sentence"),
    ).filter(F.length(F.trim("sentence")) > 0)
    emb = similarity.hash_embeddings(
        sents.select(
            F.concat_ws("\x00", "doc_id", F.col("sent_idx").cast("string")).alias("doc_id"),
            F.col("sentence").alias("text")),
        dim=64)
    _noop(emb)


def phase_edges(spark):
    d = _base(spark)
    sents = d.select(
        F.col("doc_id"),
        F.posexplode(F.split(F.trim(F.col("text")), r"(?<=[.!?])\s+")).alias(
            "sent_idx", "sentence"),
    ).filter(F.length(F.trim("sentence")) > 0)
    emb = similarity.hash_embeddings(
        sents.select(
            F.concat_ws("\x00", "doc_id", F.col("sent_idx").cast("string")).alias("doc_id"),
            F.col("sentence").alias("text")),
        dim=64,
    ).select(
        F.split(F.col("doc_id"), "\x00")[0].alias("doc_id"),
        F.split(F.col("doc_id"), "\x00")[1].cast("int").alias("sent_idx"),
        "embedding")
    tokens = sents.join(emb, ["doc_id", "sent_idx"]).select(
        "doc_id", F.col("sent_idx").alias("tok_id"),
        F.col("sentence").alias("token"), "embedding")
    edges = similarity.doc_knn_edges(
        tokens, k=4, max_dist=0.6, doc_col="doc_id", id_col="tok_id",
        vec_col="embedding")
    _noop(edges)


def phase_full(spark):
    out = entrymod.q_textrank_summary(spark, SF_DIR)
    out.count()


PHASES = {"sents": phase_sents, "emb": phase_emb, "edges": phase_edges,
          "full": phase_full}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PHASES)
    for name in names:
        spark = get_spark(f"prof-{name}", cores=32, shuffle_partitions=32)
        # JIT/worker warmup on an unrelated tiny job
        spark.range(0, 1000).selectExpr("sum(id)").collect()
        spark.range(0, 100, 1, 4).mapInArrow(lambda it: it, "id long").count()
        t0 = time.monotonic()
        PHASES[name](spark)
        print(f"PHASE {name}: {time.monotonic() - t0:.3f}s", flush=True)
        spark.stop()
