"""Stages 1-2: embedded-table extraction + preprocessing over the fixtures."""

from pyspark.sql import functions as F

from table_annotation_spark import fixtures
from table_annotation_spark.operators import table_analysis as ta
from table_annotation_spark.operators.preprocessing import (
    body_cells,
    preprocess_cells,
    table_meta,
)
from table_annotation_spark.sources.embedded_tables import (
    extract_cells,
    extract_manifest,
    parse_content_to_grid,
)


class TestGridParse:
    def test_csv(self):
        g = parse_content_to_grid("a.csv", "csv", fixtures.MOVIE_CSV)
        assert g[0] == ["Title", "Year", "Cast", "Genre"]
        assert len(g) == 5

    def test_tsv(self):
        g = parse_content_to_grid("a.tsv", "tsv", fixtures.TSV_CAPITALS)
        assert g[0] == ["country", "capital"]

    def test_json_records(self):
        g = parse_content_to_grid(
            "a.json", "json", '[{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]'
        )
        assert g == [["a", "b"], ["1", "x"], ["2", "y"]]

    def test_non_table(self):
        assert parse_content_to_grid("m.py", "python", fixtures.PY_SOURCE) is None

    def test_semicolon_sniff(self):
        g = parse_content_to_grid("r.csv", "csv", fixtures.RAGGED_CSV)
        assert g[0] == ["name", "country", "note"]


class TestExtract:
    def test_cells_and_manifest(self, spark, src_df):
        cells = extract_cells(src_df)
        man = extract_manifest(src_df)
        assert man.count() == len(fixtures.source_rows())
        kinds = {r["path"]: r["kind"] for r in man.collect()}
        assert kinds["src/main.py"] == "skipped"
        assert kinds["data/films.csv"] == "table"
        # sha256(content) invariant per input row
        expected = {
            fixtures.content_sha(r["content"]) for r in fixtures.source_rows()
        }
        got = {r["content_sha256"] for r in man.collect()}
        assert got == expected
        # movie table grid: 5 rows x 4 cols
        movie_tid = fixtures.table_id_of("acme/movies", "data/films.csv", "a" * 40)
        mv = cells.where(F.col("table_id") == movie_tid)
        assert mv.count() == 20

    def test_cell_values(self, spark, src_df):
        cells = extract_cells(src_df)
        movie_tid = fixtures.table_id_of("acme/movies", "data/films.csv", "a" * 40)
        row1 = {
            (r["col_idx"]): r["cell"]
            for r in cells.where(
                (F.col("table_id") == movie_tid) & (F.col("row_idx") == 1)
            ).collect()
        }
        assert row1 == {0: "Pulp Fiction", 1: "1994", 2: "John Travolta", 3: "Gangster"}


class TestTableAnalysis:
    """Pure-Python decision trees on fixture grids (unit-level)."""

    def _grid(self, content, path="x.csv", lang="csv"):
        return parse_content_to_grid(path, lang, content)

    def test_movie_horizontal_header(self):
        a = ta.analyze_table(self._grid(fixtures.MOVIE_CSV))
        assert a.orientation == "HORIZONTAL"
        assert a.has_header
        assert a.key_col == 0

    def test_city_table(self):
        a = ta.analyze_table(self._grid(fixtures.CITY_CSV))
        assert a.orientation == "HORIZONTAL"
        assert a.has_header
        assert a.key_col == 0

    def test_vertical_table_transposed(self):
        a = ta.analyze_table(self._grid(fixtures.CITY_VERTICAL_CSV))
        assert a.orientation == "VERTICAL"
        # after transpose the grid is attributes-as-columns
        assert a.grid[0] == ["city", "country", "population"]
        assert ["Paris", "France", "2148000"] in a.grid

    def test_noheader_numeric(self):
        a = ta.analyze_table(self._grid(fixtures.NOHEADER_NUMERIC_CSV))
        assert not a.has_header
        # ORDINAL index column detected on col 0
        assert a.col_typing[0][0]["type"] == "ORDINAL"

    def test_ragged_cleaning(self):
        g = self._grid(fixtures.RAGGED_CSV)
        a = ta.analyze_table(g)
        # empty row dropped: header + 3 data rows
        assert len(a.grid) == 4
        # mojibake repaired
        flat = [c for row in a.grid for c in row]
        assert "café" in flat
        # short row padded
        assert all(len(r) == 3 for r in a.grid)

    def test_clean_grid_drops_empty_column(self):
        g = [["a", "", "b"], ["c", "", "d"]]
        assert ta.clean_grid(g) == [["a", "b"], ["c", "d"]]


class TestPreprocessStage:
    def test_preprocess_meta(self, spark, src_df):
        prep = preprocess_cells(extract_cells(src_df)).cache()
        meta = {r["table_id"]: r.asDict() for r in table_meta(prep).collect()}
        movie_tid = fixtures.table_id_of("acme/movies", "data/films.csv", "a" * 40)
        vert_tid = fixtures.table_id_of(
            "acme/geo", "data/capitals_vertical.csv", "c" * 40
        )
        assert meta[movie_tid]["orientation"] == "HORIZONTAL"
        assert meta[movie_tid]["has_header"]
        assert meta[movie_tid]["key_col"] == 0
        assert meta[vert_tid]["orientation"] == "VERTICAL"
        # python file not present (skipped)
        py_tid = fixtures.table_id_of("acme/code", "src/main.py", "0" * 40)
        assert py_tid not in meta

    def test_body_cells_reindexed(self, spark, src_df):
        prep = preprocess_cells(extract_cells(src_df))
        body = body_cells(prep)
        movie_tid = fixtures.table_id_of("acme/movies", "data/films.csv", "a" * 40)
        rows = body.where(F.col("table_id") == movie_tid).collect()
        assert min(r["row_idx"] for r in rows) == 0
        assert {r["cell"] for r in rows if r["row_idx"] == 0 and r["col_idx"] == 0} == {
            "Pulp Fiction"
        }


class TestPrepParity:
    """The relational preprocess (Spark P1-P4/P6 + sample-only decision UDF)
    must be an EXACT twin of the reference-shaped per-table Python pass
    (`_prep_one_table`) — every PREP_SCHEMA column, every table."""

    def test_relational_equals_pertable(self, spark, src_df):
        from table_annotation_spark.operators.preprocessing import (
            PREP_SCHEMA,
            _prep_one_table,
            fix_encoding,
            type_cells,
        )

        cells = extract_cells(src_df)
        new = preprocess_cells(cells)
        typed = type_cells(fix_encoding(cells))
        old = typed.groupBy("table_id").applyInPandas(
            _prep_one_table, schema=PREP_SCHEMA
        )
        cols = [f.name for f in PREP_SCHEMA.fields]
        key = ["table_id", "row_idx", "col_idx"]
        a = sorted(new.select(*cols).collect(), key=lambda r: tuple(r[k] for k in key))
        b = sorted(old.select(*cols).collect(), key=lambda r: tuple(r[k] for k in key))
        assert len(a) == len(b) and len(a) > 0
        for ra, rb in zip(a, b):
            assert ra.asDict() == rb.asDict(), (ra, rb)

    def test_fused_equals_relational(self, spark, src_df):
        """extract_cells_clean + preprocess_clean_cells (the zero-shuffle hot
        path) must emit the identical PREP_SCHEMA frame as the relational
        path over extract_cells."""
        from table_annotation_spark.operators.preprocessing import (
            PREP_SCHEMA,
            preprocess_clean_cells,
        )
        from table_annotation_spark.sources.embedded_tables import (
            extract_cells_clean,
        )

        fused = preprocess_clean_cells(extract_cells_clean(src_df))
        rel = preprocess_cells(extract_cells(src_df))
        cols = [f.name for f in PREP_SCHEMA.fields]
        key = ["table_id", "row_idx", "col_idx"]
        a = sorted(fused.select(*cols).collect(), key=lambda r: tuple(r[k] for k in key))
        b = sorted(rel.select(*cols).collect(), key=lambda r: tuple(r[k] for k in key))
        assert len(a) == len(b) and len(a) > 0
        for ra, rb in zip(a, b):
            assert ra.asDict() == rb.asDict(), (ra, rb)

    def test_big_table_sampling_parity(self, spark):
        """>400-row table: the decision sample (first 10 + lowest-hash 390)
        must agree between the window-based and the in-Python sampler."""
        import pandas as pd

        from table_annotation_spark.operators.preprocessing import (
            PREP_SCHEMA,
            _prep_one_table,
            fix_encoding,
            type_cells,
        )

        rows = []
        for i in range(450):
            rows.append(("bigtid", "sha" * 8, i, 0, f"Name {i}" if i else "name"))
            rows.append(("bigtid", "sha" * 8, i, 1, f"{i * 3}" if i else "count"))
        cells = spark.createDataFrame(
            rows, "table_id string, content_sha256 string, row_idx int, col_idx int, cell string"
        )
        new = preprocess_cells(cells)
        typed = type_cells(fix_encoding(cells))
        old = typed.groupBy("table_id").applyInPandas(
            _prep_one_table, schema=PREP_SCHEMA
        )
        cols = [f.name for f in PREP_SCHEMA.fields]
        key = ["table_id", "row_idx", "col_idx"]
        a = sorted(new.select(*cols).collect(), key=lambda r: tuple(r[k] for k in key))
        b = sorted(old.select(*cols).collect(), key=lambda r: tuple(r[k] for k in key))
        assert len(a) == len(b) == 900
        for ra, rb in zip(a, b):
            assert ra.asDict() == rb.asDict(), (ra, rb)

    def test_big_table_fused_parity(self, spark):
        """Fused parse-time sampler ≡ per-table Python sampler on a >400-row
        document (hash ladder + stable tie order must agree bit-for-bit)."""
        from table_annotation_spark.operators.preprocessing import (
            PREP_SCHEMA,
            _prep_one_table,
            fix_encoding,
            preprocess_clean_cells,
            type_cells,
        )
        from table_annotation_spark.sources.embedded_tables import (
            extract_cells_clean,
        )

        csv = "name,count\n" + "\n".join(f"Name {i},{i * 3}" for i in range(1, 450))
        src = spark.createDataFrame(
            [("big/repo", "data/big.csv", "9" * 40, "csv", csv)],
            "repo string, path string, commit string, lang string, content string",
        )
        fused = preprocess_clean_cells(extract_cells_clean(src))
        typed = type_cells(fix_encoding(extract_cells(src)))
        old = typed.groupBy("table_id").applyInPandas(
            _prep_one_table, schema=PREP_SCHEMA
        )
        cols = [f.name for f in PREP_SCHEMA.fields]
        key = ["table_id", "row_idx", "col_idx"]
        a = sorted(fused.select(*cols).collect(), key=lambda r: tuple(r[k] for k in key))
        b = sorted(old.select(*cols).collect(), key=lambda r: tuple(r[k] for k in key))
        assert len(a) == len(b) == 900
        for ra, rb in zip(a, b):
            assert ra.asDict() == rb.asDict(), (ra, rb)
