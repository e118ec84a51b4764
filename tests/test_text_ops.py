"""Round-4 text ops: repetition filter + PII redaction.

Each test runs the Spark operator AND its DuckDB oracle in-process over
sf0.001 documents and asserts the driver-style order-insensitive value-hash
equality (a per-module miniature of scripts/check_oracles.py), plus a
behavioral invariant so a hash-breaking edit localizes fast.
"""

import hashlib
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = "/root/testdata/sf0.001"


def _value_hash(rows, cols):
    def norm(v):
        if v is None:
            return ""
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, float):
            return f"{v:.6g}"
        return str(v)

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    yield con
    con.close()


def _both(spark, ducks, name):
    from table_annotation_spark.operators import text as t

    sdf = t.QUERIES[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    orows = ducks.execute(t.ORACLES[name]).fetchall()
    ocols = [d[0] for d in ducks.description]
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert _value_hash(srows, scols) == _value_hash(orows, ocols)
    return srows, scols


class TestRepetitionFilter:
    def test_oracle_hash_equal(self, spark, ducks):
        rows, cols = _both(spark, ducks, "text_repetition_filter")
        i = {c: k for k, c in enumerate(cols)}
        # discriminative on this corpus: some docs pass, some fail
        passes = [r[i["passes_repetition"]] for r in rows]
        assert any(passes) and not all(passes)
        for r in rows:
            assert r[i["n_distinct_tokens"]] <= r[i["n_tokens"]]
            assert r[i["n_bigrams"]] == max(r[i["n_tokens"]] - 1, 0)
            if r[i["n_bigrams"]] > 0:
                assert 1 <= r[i["top_bigram_freq"]] <= r[i["n_bigrams"]]


class TestPiiRedact:
    def test_oracle_hash_equal(self, spark, ducks):
        rows, cols = _both(spark, ducks, "text_pii_redact")
        i = {c: k for k, c in enumerate(cols)}
        for r in rows:
            aug = r[i["doc_id"]] % 3 == 0
            # exactly the synthesized PII is found on augmented docs,
            # none elsewhere (the corpus itself is PII-free)
            assert r[i["n_emails"]] == (1 if aug else 0)
            assert r[i["n_ipv4"]] == (1 if aug else 0)
            assert r[i["n_phones"]] == (1 if aug else 0)

    def test_redaction_removes_pii(self, spark):
        """Redacted text re-scanned for PII finds nothing (round-trip)."""
        from pyspark.sql import functions as F

        from table_annotation_spark.operators import text as t

        did = F.col("doc_id")
        contact = F.concat(
            F.lit(" contact user"), did.cast("string"),
            F.lit("@example.com at 10.0."), (did % 256).cast("string"),
            F.lit(".7 or +1 555 01"), (did % 100).cast("string"),
        )
        aug = F.concat(F.col("text"),
                       F.when(did % 3 == 0, contact).otherwise(F.lit("")))
        red = F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(aug, t.PII_EMAIL, "<EMAIL>"),
                t.PII_IPV4, "<IP>"),
            t.PII_PHONE, "<PHONE>")
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            red.alias("red"))
        leftover = d.where(
            F.col("red").rlike(t.PII_EMAIL)
            | F.col("red").rlike(t.PII_IPV4)
            | F.col("red").rlike(t.PII_PHONE)
        ).count()
        assert leftover == 0
