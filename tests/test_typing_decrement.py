"""A1 minority-decrement (reference utils.py:226-266 + typing_priority
:43-47), activated by multi-label typing (type_cell_multi): a multi-typed
cell nets exactly one vote — for its column-majority reading — instead of
double-voting every label it matches."""

from table_annotation_spark.functions.ner import make_lexicon_ner
from table_annotation_spark.functions import typing_fns as tf
from table_annotation_spark.operators import table_analysis as ta

GAZ = make_lexicon_ner({"1998": "GPE", "1999": "GPE", "42": "GPE",
                        "paris": "GPE", "london": "GPE"})


def grid_maps(col, **kw):
    grid = [[c] for c in col]
    typing, datatype = ta.build_typing_maps(grid, ner=GAZ, multi_label=True, **kw)
    return grid, typing, datatype


class TestMultiLabelTyping:
    def test_cell_fires_both_regex_and_gazetteer(self):
        assert tf.type_cell_multi("1998", ner=GAZ) == {"DATE", "GPE"}
        assert tf.type_cell_multi("2000", ner=GAZ) == {"DATE"}
        assert tf.type_cell_multi("paris", ner=GAZ) == {"GPE"}
        assert tf.type_cell_multi("", ner=GAZ) == ""

    def test_decrement_strips_minority_votes(self):
        # GPE majority column; the two year-cells are {DATE, GPE} — without
        # the decrement DATE would (wrongly) show 2 phantom votes
        grid, typing, _ = grid_maps(["1998", "1999", "paris", "london"])
        res = ta.typing_per_column(grid, typing, top_k=2)[0]
        assert res[0]["type"] == "GPE" and res[0]["score"] == 1.0
        # DATE: 2 raw votes, both decremented away → absent from top-k
        assert all(r["type"] != "DATE" for r in res)

    def test_no_decrement_without_multilabel(self):
        # the same column under first-match single-label typing: each cell
        # one vote, no decrement path (structural no-op) — parity with the
        # flagship path
        grid = [["1998"], ["1999"], ["paris"], ["london"]]
        typing, _ = ta.build_typing_maps(grid)  # no NER: years → DATE
        res = ta.typing_per_column(grid, typing, top_k=2)[0]
        assert res[0]["type"] == "DATE" and res[0]["score"] == 0.5

    def test_cardinal_loses_priority_tie(self):
        # "42" is {CARDINAL, GPE} with equal counts (1-1): typing_priority
        # ranks GPE above CARDINAL, so CARDINAL takes the decrement
        grid, typing, _ = grid_maps(["42"])
        res = ta.typing_per_column(grid, typing, top_k=2)[0]
        assert [r["type"] for r in res] == ["GPE"]

    def test_sequential_counts_mutate_between_cells(self):
        # two identical multi-typed occurrences: the first decrement lowers
        # DATE before the second cell ranks — reference loop semantics
        grid, typing, _ = grid_maps(["1998", "1998", "1999", "paris"])
        res = ta.typing_per_column(grid, typing, top_k=2)[0]
        assert res[0]["type"] == "GPE" and res[0]["score"] == 1.0
        assert all(r["type"] != "DATE" for r in res)

    def test_datatype_map_multi(self):
        _, _, datatype = grid_maps(["1998"])
        # DATE stays DATE; GPE is concepty → string-type bucket
        assert "DATE" in datatype["1998"] and len(datatype["1998"]) == 2
