"""Python UDTF (Spark 4) — API-surface demo with a parity check.

The engine's doctrine is "UDFs are the slow path": every scored query
is declarative. This test shows the UDTF surface exists and works —
and that its output is exactly reproducible with built-in expressions
(posexplode + regexp split), which is why no scored query needs one.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

_SENT_RE = r"(?<=[.!?])\s+"


def test_udtf_sentence_split_matches_declarative(spark):
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos int, sentence string")
    class SentenceSplit:
        def eval(self, doc_id: int, text: str):
            import re

            if text is None:
                return
            for i, s in enumerate(re.split(_SENT_RE, text.strip())):
                if s:
                    yield doc_id, i, s

    spark.udtf.register("sentence_split", SentenceSplit)

    from exceldatatransform_py_spark.sources.readers import read_table

    docs = read_table(spark, SF, "documents").limit(50)
    docs.createOrReplaceTempView("__udtf_docs")

    via_udtf = spark.sql(
        "SELECT s.doc_id, s.pos, s.sentence "
        "FROM __udtf_docs, LATERAL sentence_split(doc_id, text) s"
    )

    declarative = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.trim("text"), _SENT_RE), lambda x: x != ""
            )
        ).alias("pos", "sentence"),
    )

    left = {tuple(r) for r in via_udtf.collect()}
    right = {tuple(r) for r in declarative.collect()}
    assert left == right and left
