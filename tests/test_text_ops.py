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


class TestStratifiedSample:
    def test_oracle_hash_equal(self, spark, ducks):
        rows, cols = _both(spark, ducks, "text_stratified_sample")
        from table_annotation_spark.operators import text as t

        i = {c: k for k, c in enumerate(cols)}
        assert rows, "sample must be non-empty at fixture scale"
        for r in rows:
            rate = t.MIXTURE_RATES_256.get(r[i["lang"]], t.MIXTURE_DEFAULT_256)
            assert r[i["rate_256"]] == rate
            assert 0 <= r[i["bucket"]] < rate

    def test_deterministic_membership(self, spark):
        """Hash-gated sampling is content-addressed: the first md5 byte of
        the decimal doc id decides membership, reproducible off-engine."""
        import hashlib

        from table_annotation_spark.operators import text as t

        rows = t.stratified_sample(spark, SF_DIR).collect()
        for r in rows[:50]:
            b = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:2], 16)
            assert b == r["bucket"]


class TestTokenHistogram:
    def test_oracle_hash_equal(self, spark, ducks):
        rows, cols = _both(spark, ducks, "text_token_hist")
        from table_annotation_spark.operators import text as t

        i = {c: k for k, c in enumerate(cols)}
        total = sum(r[i["n_docs"]] for r in rows)
        n_src = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
        assert total == n_src  # every doc lands in exactly one bin
        for r in rows:
            assert r[i["bin_lo"]] % t.HIST_BIN_TOKENS == 0


class TestSubstringDedup:
    def test_oracle_hash_equal(self, spark):
        from pyspark.sql import functions as F

        from table_annotation_spark.operators import dedup as dd

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
        )
        sdf = dd.QUERIES["dedup_substring"](spark, SF_DIR)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        orows = con.execute(dd.ORACLES["dedup_substring"]).fetchall()
        ocols = [d[0] for d in con.description]
        con.close()
        assert sorted(scols) == sorted(ocols)
        assert len(srows) == len(orows)
        assert _value_hash(srows, scols) == _value_hash(orows, ocols)
        assert srows, "fixture corpus contains near-dups that share shingles"
        i = {c: k for k, c in enumerate(scols)}
        # each reported pair really shares a 40-char substring at a
        # stride-10 offset (re-derive one pair off-engine)
        doc_a, doc_b = srows[0][i["doc_a"]], srows[0][i["doc_b"]]
        texts = {
            r["doc_id"]: r["text"]
            for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .where(F.col("doc_id").isin([doc_a, doc_b]))
            .collect()
        }
        k, s = dd.SHINGLE_K, dd.SHINGLE_STRIDE

        def shingles(txt):
            return {
                txt[j : j + k] for j in range(0, max(len(txt) - k + 1, 0), s)
            }

        assert shingles(texts[doc_a]) & shingles(texts[doc_b])


class TestFunnel:
    def test_oracle_hash_equal_and_monotone(self, spark):
        from table_annotation_spark.operators import sessions as ss

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
        )
        sdf = ss.QUERIES["sess_funnel"](spark, SF_DIR)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        orows = con.execute(ss.ORACLES["sess_funnel"]).fetchall()
        ocols = [d[0] for d in con.description]
        con.close()
        assert sorted(scols) == sorted(ocols)
        assert _value_hash(srows, scols) == _value_hash(orows, ocols)
        counts = dict(srows)
        # strict ordering makes the funnel monotone non-increasing
        assert (
            counts["1_view"]
            >= counts["2_view_click"]
            >= counts["3_view_click_purchase"]
            > 0
        )


class TestTokenPercentiles:
    def test_oracle_hash_equal_and_ordered(self, spark, ducks):
        rows, cols = _both(spark, ducks, "text_token_percentiles")
        i = {c: k for k, c in enumerate(cols)}
        from table_annotation_spark.operators import text as t

        corpus = {
            (r["lang"], r["n_tokens"])
            for r in t._docs(spark, SF_DIR)
            .selectExpr(
                "lang",
                "CASE WHEN trim(text) = '' THEN 0 ELSE"
                " size(split(lower(trim(text)), '\\\\s+')) END AS n_tokens",
            )
            .collect()
        }
        for r in rows:
            p50, p90, p99 = (
                r[i["p50_tokens"]], r[i["p90_tokens"]], r[i["p99_tokens"]],
            )
            assert p50 <= p90 <= p99
            # percentile_disc returns ACTUAL corpus elements, not interpolations
            for v in (p50, p90, p99):
                assert (r[i["lang"]], v) in corpus


class TestDecontaminate:
    def test_oracle_twin(self, spark, ducks):
        rows, cols = _both(spark, ducks, "text_decontaminate")
        assert rows  # predicate tuned non-vacuous on the synthetic corpus
        i_doc = cols.index("doc_id")
        i_bench = cols.index("n_bench_docs")
        for r in rows:
            # flagged docs are never benchmark members, and every flag is
            # backed by at least one benchmark doc
            from table_annotation_spark.operators.text import (
                DECON_MOD,
                DECON_REM,
            )

            assert r[i_doc] % DECON_MOD != DECON_REM
            assert r[i_bench] >= 1

    def test_bench_side_is_broadcast(self, spark):
        from table_annotation_spark.operators import text as t

        df = t.decontaminate(spark, SF_DIR)
        jvm = df.sparkSession._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan


class TestSeqPack:
    def test_oracle_twin_and_conservation(self, spark, ducks):
        rows, cols = _both(spark, ducks, "text_seq_pack")
        from table_annotation_spark.operators.text import PACK_BUDGET
        from table_annotation_spark.operators import text as t

        i_lang, i_bin = cols.index("lang"), cols.index("bin")
        i_docs, i_tok = cols.index("n_docs"), cols.index("sum_tokens")
        # conservation: packing reassigns every doc/token, drops none
        tc = {
            r["lang"]: (r["n_docs"], r["total_tokens"])
            for r in t.token_count(spark, SF_DIR).collect()
        }
        by_lang = {}
        for r in rows:
            d, k = by_lang.get(r[i_lang], (0, 0))
            by_lang[r[i_lang]] = (d + r[i_docs], k + r[i_tok])
        assert by_lang == tc
        # bins are dense from 0 per (lang, shard=0 at this scale) and every
        # bin boundary means the running total crossed the budget: bin b
        # starts only after >= b*budget tokens accumulated
        for lang in by_lang:
            bins = sorted(r[i_bin] for r in rows if r[i_lang] == lang)
            assert bins[0] == 0
            cum = 0
            for b, tok in sorted(
                (r[i_bin], r[i_tok]) for r in rows if r[i_lang] == lang
            ):
                assert cum >= b * PACK_BUDGET
                cum += tok


class TestTfidfTopterms:
    def test_oracle_hash_equal_and_ranked(self, spark, ducks):
        rows, cols = _both(spark, ducks, "text_tfidf_topterms")
        i = {c: k for k, c in enumerate(cols)}
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r[i["doc_id"]], []).append(r)
        for doc, rs in by_doc.items():
            rs.sort(key=lambda r: r[i["rk"]])
            assert [r[i["rk"]] for r in rs] == list(range(1, len(rs) + 1))
            assert len(rs) <= 3
            scores = [r[i["score"]] for r in rs]
            assert scores == sorted(scores, reverse=True) or any(
                # equal rounded scores tie-break on token asc
                scores[k] == scores[k + 1] for k in range(len(scores) - 1)
            )
        # IDF discriminates: the top term is never a corpus-universal token
        # with score 0 unless the whole doc is universal vocabulary
        assert any(r[i["score"]] > 0 for r in rows)


class TestChunkDocuments:
    def test_oracle_hash_equal_and_coverage(self, spark, ducks):
        from table_annotation_spark.operators.text import (
            CHUNK_STRIDE,
            CHUNK_TOKENS,
        )

        rows, cols = _both(spark, ducks, "text_chunk")
        i = {c: k for k, c in enumerate(cols)}
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r[i["doc_id"]], []).append(r)
        # independent per-doc token counts (DuckDB, same tokenizer)
        n_toks = dict(
            duckdb.sql(
                f"SELECT doc_id::BIGINT, len(regexp_split_to_array("
                f"lower(trim(text)), '\\s+'))::BIGINT "
                f"FROM '{SF_DIR}/documents.parquet' WHERE trim(text) <> ''"
            ).fetchall()
        )
        assert set(by_doc) == set(n_toks)
        for doc, rs in by_doc.items():
            rs.sort(key=lambda r: r[i["chunk_id"]])
            n = n_toks[doc]
            # chunk ids contiguous from 0; count = floor((n-1)/stride)+1
            assert [r[i["chunk_id"]] for r in rs] == list(
                range((n - 1) // CHUNK_STRIDE + 1)
            )
            # stride < size → last chunk reaches the final token exactly
            last_start = rs[-1][i["chunk_id"]] * CHUNK_STRIDE + 1
            assert last_start + rs[-1][i["chunk_tokens"]] - 1 == n
            assert all(
                0 < r[i["chunk_tokens"]] <= CHUNK_TOKENS for r in rs
            )


class TestUrlCanonical:
    def test_oracle_hash_equal_and_folded(self, spark, ducks):
        rows, cols = _both(spark, ducks, "text_url_canonical")
        i = {c: k for k, c in enumerate(cols)}
        assert sum(r[i["n_docs"]] for r in rows) == 500  # every doc lands once
        # canonicalization actually folds noisy variants
        assert any(r[i["n_docs"]] > 1 for r in rows)
        assert any(r[i["n_raw_variants"]] > 1 for r in rows)
        for r in rows:
            u = r[i["canon_url"]]
            assert u == u.lower()
            assert "#" not in u and "utm_" not in u and "ref=" not in u
            assert not u.endswith("/")
            assert r[i["keep_doc_id"]] >= 0


class TestLmLogprob:
    def test_oracle_hash_equal_and_gate(self, spark, ducks):
        rows, cols = _both(spark, ducks, "text_lm_logprob")
        from table_annotation_spark.operators.text import LM_NLL_KEEP

        i = {c: k for k, c in enumerate(cols)}
        assert len(rows) > 0
        for r in rows:
            assert r[i["n_tokens"]] >= 1
            assert r[i["mean_nll"]] > 0
            want = "keep" if r[i["mean_nll"]] < LM_NLL_KEEP else "discard"
            # mean_nll is round-6 of the round-9 gate value; only a value
            # inside 5e-7 of the threshold could disagree — assert equality
            # away from that band
            if abs(r[i["mean_nll"]] - LM_NLL_KEEP) > 1e-6:
                assert r[i["verdict"]] == want
        # the LM is trained on the 'en' slice: in-domain docs must score
        # strictly better (lower NLL) on average than out-of-domain ones
        by_lang = {}
        for r in rows:
            by_lang.setdefault(r[i["lang"]], []).append(r[i["mean_nll"]])
        en = sum(by_lang["en"]) / len(by_lang["en"])
        others = [
            sum(v) / len(v) for k, v in by_lang.items() if k != "en"
        ]
        assert others and all(en < o for o in others)


class TestPageRank:
    def _both_graph(self, spark, ducks):
        from table_annotation_spark.operators import graph as g

        sdf = g.QUERIES["graph_pagerank"](spark, SF_DIR)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        orows = ducks.execute(g.ORACLES["graph_pagerank"]).fetchall()
        ocols = [d[0] for d in ducks.description]
        assert sorted(scols) == sorted(ocols)
        assert len(srows) == len(orows)
        assert _value_hash(srows, scols) == _value_hash(orows, ocols)
        return srows, scols

    def test_oracle_hash_equal_and_hubs_win(self, spark, ducks):
        rows, cols = self._both_graph(spark, ducks)
        from table_annotation_spark.operators.graph import PR_TOPK

        i = {c: k for k, c in enumerate(cols)}
        assert len(rows) == PR_TOPK
        ranks = sorted((r[i["pagerank"]] for r in rows), reverse=True)
        n_docs = duckdb.execute(
            f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'"
        ).fetchone()[0]
        uniform = 1.0 / n_docs
        # the u//2 tree map concentrates mass at low ids: every top-k node
        # must beat the uniform rank, and node 0 (the tree root, plus the
        # quadratic map's image of u=0) must be in the top-k
        assert all(r > uniform for r in ranks)
        assert any(r[i["node"]] == 0 for r in rows)
        # probability mass sanity: top-k sum below 1, above k*uniform
        assert PR_TOPK * uniform < sum(ranks) < 1.0
