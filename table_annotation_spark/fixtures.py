"""Deterministic synthetic fixtures: mini knowledge graph + source-repo table.

Mirrors the golden examples in the reference README
(/root/reference/README.md:40-67) and the fixture plan in FIXTURES.md, with
entirely synthetic-but-Wikidata-shaped ids. Everything is a plain list of
dicts so both the Spark engine and the pure-Python oracle consume the same
rows without touching each other's code.

Determinism constraints honored (SURVEY.md §5): all tables ≤ 400 rows, cells
regex/unit-decidable, ≤1 phone-bearing cell per fixture.
"""

from __future__ import annotations

import hashlib

# ---------------------------------------------------------------------------
# mini-KG: classes
# ---------------------------------------------------------------------------
FILM, HUMAN, GENRE, CITY, COUNTRY, ACTOR_OCC = "Q11424", "Q5", "Q201658", "Q515", "Q6256", "Q33999"


def _label_rows() -> list[dict]:
    """(entity, label, origin, pr) — ES doc shape, entity_indexing.py:88-97."""
    rows: list[tuple[str, str, str, float]] = [
        # films
        ("Q1", "Pulp Fiction", "LABEL", 0.62),
        ("Q2", "Forrest Gump", "LABEL", 0.60),
        ("Q3", "The Matrix", "LABEL", 0.65),
        ("Q3", "Matrix", "MAIN_ALIAS", 0.65),
        ("Q4", "Titanic", "LABEL", 0.63),
        # film distractors
        ("Q5P", "Pulp Fiction", "MAIN_ALIAS", 0.12),   # soundtrack album
        ("Q5P", "Pulp Fiction soundtrack", "LABEL", 0.12),
        ("Q44", "Titanic", "MAIN_ALIAS", 0.35),        # the ship
        ("Q44", "RMS Titanic", "LABEL", 0.35),
        # actors
        ("Q21", "John Travolta", "LABEL", 0.48),
        ("Q22", "Tom Hanks", "LABEL", 0.55),
        ("Q23", "Keanu Reeves", "LABEL", 0.52),
        ("Q24", "Leonardo DiCaprio", "LABEL", 0.56),
        ("Q24", "Leo DiCaprio", "SUB_ALIAS", 0.56),
        # genres
        ("Q31", "crime film", "LABEL", 0.20),
        ("Q31", "Gangster", "MAIN_ALIAS", 0.20),
        ("Q32", "drama film", "LABEL", 0.22),
        ("Q32", "Drama", "MAIN_ALIAS", 0.22),
        ("Q33", "science fiction film", "LABEL", 0.24),
        ("Q33", "Sci-Fi", "MAIN_ALIAS", 0.24),
        ("Q34", "romance film", "LABEL", 0.21),
        ("Q34", "Romance", "MAIN_ALIAS", 0.21),
        # cities
        ("Q90", "Paris", "LABEL", 0.70),
        ("Q84", "London", "LABEL", 0.72),
        ("Q1490", "Tokyo", "LABEL", 0.71),
        ("Q64", "Berlin", "LABEL", 0.66),
        ("Q220", "Rome", "LABEL", 0.64),
        # city distractor
        ("Q91", "Paris", "MAIN_ALIAS", 0.08),          # Paris, Texas
        ("Q91", "Paris, Texas", "LABEL", 0.08),
        # countries
        ("Q142", "France", "LABEL", 0.80),
        ("Q145", "United Kingdom", "LABEL", 0.82),
        ("Q145", "UK", "MAIN_ALIAS", 0.82),
        ("Q17", "Japan", "LABEL", 0.81),
        ("Q183", "Germany", "LABEL", 0.80),
        ("Q38", "Italy", "LABEL", 0.79),
        # hub entity (skew + popularity damping)
        ("Q30", "United States", "LABEL", 0.99),
        ("Q30", "USA", "MAIN_ALIAS", 0.99),
        ("Q30", "United States of America", "SUB_ALIAS", 0.99),
        # football (MUFC golden, README.md:40-47)
        ("Q18656", "Manchester United F.C.", "LABEL", 0.58),
        ("Q18656", "MUFC", "MAIN_ALIAS", 0.58),
        ("Q18656", "Man Utd", "SUB_ALIAS", 0.58),
        ("Q50602", "Manchester City F.C.", "LABEL", 0.50),
        ("Q50602", "MCFC", "MAIN_ALIAS", 0.50),
        # classes (so CTA output labels resolve)
        (FILM, "film", "LABEL", 0.30),
        (HUMAN, "human", "LABEL", 0.30),
        (GENRE, "film genre", "LABEL", 0.30),
        (CITY, "city", "LABEL", 0.30),
        (COUNTRY, "country", "LABEL", 0.30),
        (ACTOR_OCC, "actor", "LABEL", 0.30),
        ("Q11573", "metre", "LABEL", 0.30),
    ]
    return [
        {"entity": e, "label": lb, "length": len(lb), "origin": o, "pr": pr}
        for (e, lb, o, pr) in rows
    ]


def _edge_rows() -> list[dict]:
    """(subj, pred, reverse, obj, obj_kind, obj_type) — flat SPO replacing the
    LMDB hashmap (wd_hashmap_indexing.py:56-75; literal tags per
    annotation_models.py:343-347)."""
    E = []

    def ent(s, p, o, rank="NORMAL"):
        E.append(
            {"subj": s, "pred": p, "reverse": False, "obj": o,
             "obj_kind": "entity", "obj_type": rank}
        )
        E.append(
            {"subj": o, "pred": p, "reverse": True, "obj": s,
             "obj_kind": "entity", "obj_type": rank}
        )

    def lit(s, p, o, littype):
        E.append(
            {"subj": s, "pred": p, "reverse": False, "obj": o,
             "obj_kind": "literal", "obj_type": littype}
        )

    # P31 instance-of
    for f in ("Q1", "Q2", "Q3", "Q4"):
        ent(f, "P31", FILM, "PREFERRED")
    ent("Q5P", "P31", "Q482994")               # album
    ent("Q44", "P31", "Q11446")                # ship
    for h in ("Q21", "Q22", "Q23", "Q24"):
        ent(h, "P31", HUMAN)
        ent(h, "P106", ACTOR_OCC)
        ent(h, "P27", "Q30")                   # shared neighbor → 2-hop paths
    for g in ("Q31", "Q32", "Q33", "Q34"):
        ent(g, "P31", GENRE)
    for c in ("Q90", "Q84", "Q1490", "Q64", "Q220", "Q91"):
        ent(c, "P31", CITY)
    for c in ("Q142", "Q145", "Q17", "Q183", "Q38", "Q30"):
        ent(c, "P31", COUNTRY)
    ent("Q18656", "P31", "Q476028")            # association football club
    ent("Q50602", "P31", "Q476028")

    # P279 subclass chains (3 levels — CTA hierarchy, knowledge_bases.py:136-180)
    ent(FILM, "P279", "Q2431196")              # audiovisual work
    ent("Q2431196", "P279", "Q386724")         # work
    ent(HUMAN, "P279", "Q215627")              # person
    ent("Q215627", "P279", "Q35120")           # entity
    ent(GENRE, "P279", "Q483394")              # genre
    ent("Q483394", "P279", "Q35120")
    ent(CITY, "P279", "Q486972")               # human settlement
    ent("Q486972", "P279", "Q35120")
    ent(COUNTRY, "P279", "Q7275")              # state
    ent("Q7275", "P279", "Q35120")

    # film relations: cast (P161), genre (P136), publication date (P577)
    cast = {"Q1": "Q21", "Q2": "Q22", "Q3": "Q23", "Q4": "Q24"}
    genre = {"Q1": "Q31", "Q2": "Q32", "Q3": "Q33", "Q4": "Q34"}
    pubdate = {
        "Q1": "1994-10-14", "Q2": "1994-07-06",
        "Q3": "1999-03-31", "Q4": "1997-12-19",
    }
    for f in cast:
        ent(f, "P161", cast[f], "PREFERRED")
        ent(f, "P136", genre[f])
        lit(f, "P577", pubdate[f], "DateTime-11")
        lit(f, "P2047", {"Q1": "154 min", "Q2": "142 min",
                         "Q3": "136 min", "Q4": "194 min"}[f], "Quantity-Q7727")

    # capital pairs: city P1376 country / country P36 city
    caps = {"Q90": "Q142", "Q84": "Q145", "Q1490": "Q17",
            "Q64": "Q183", "Q220": "Q38"}
    for city, country in caps.items():
        ent(city, "P1376", country, "PREFERRED")
        ent(country, "P36", city, "PREFERRED")
        ent(city, "P131", country)             # transitive located-in
        ent(city, "P17", country)
    # city populations (Quantity-1 literals)
    pops = {"Q90": "2148000", "Q84": "8982000", "Q1490": "13960000",
            "Q64": "3645000", "Q220": "2873000"}
    for city, p in pops.items():
        lit(city, "P1082", p, "Quantity-1")
    # textual mottos (String literals)
    lit("Q142", "P1451", "Liberté, égalité, fraternité", "String")
    lit("Q30", "P1451", "In God We Trust", "String")

    # unit symbol edge (F7 path): metre → "m"
    lit("Q11573", "P5061", "m", "String")

    # hub: give Q30 a fat 1-hop neighborhood for degree damping / skew
    for i in range(60):
        ent("Q30", "P150", f"QD{i}")           # contains admin entity

    return E


def mini_kg() -> tuple[list[dict], list[dict]]:
    return _label_rows(), _edge_rows()


# ---------------------------------------------------------------------------
# source-repo fixture table (input_hint shape: repo, path, commit, lang, content)
# ---------------------------------------------------------------------------
MOVIE_CSV = (
    "Title,Year,Cast,Genre\n"
    "Pulp Fiction,1994,John Travolta,Gangster\n"
    "Forrest Gump,1994,Tom Hanks,Drama\n"
    "The Matrix,1999,Keanu Reeves,Sci-Fi\n"
    "Titanic,1997,Leonardo DiCaprio,Romance\n"
)

CITY_CSV = (
    "city,country\n"
    "Paris,France\n"
    "London,United Kingdom\n"
    "Tokyo,Japan\n"
    "Berlin,Germany\n"
    "Rome,Italy\n"
)

# transpose of an attributes-as-rows city table → orientation VERTICAL
# (3 rows so the reference's step-1 homogeneity applies: rows>2 and cols>2,
# table_info_extraction_modules.py:80-82)
CITY_VERTICAL_CSV = (
    "city,Paris,London,Tokyo,Berlin,Rome\n"
    "country,France,United Kingdom,Japan,Germany,Italy\n"
    "population,2148000,8982000,13960000,3645000,2873000\n"
)

NOHEADER_NUMERIC_CSV = (
    "1.,12.5,200\n"
    "2.,13.1,210\n"
    "3.,11.8,190\n"
    "4.,14.2,220\n"
)

LITERAL_CONTEXT_CSV = (
    "Film,Released,Runtime,Motto\n"
    "Pulp Fiction,1994-10-14,154 min,none\n"
    "Forrest Gump,1994-07-06,142 min,none\n"
    "The Matrix,1999-03-31,136 min,none\n"
    "Titanic,1997-12-19,194 min,none\n"
)

RAGGED_CSV = (
    "name;country;note\n"
    "Paris;France;cafÃ©\n"          # mojibake cell (utf-8 read as latin-1)
    ";;\n"                           # fully empty row → dropped
    "London;United Kingdom\n"        # short row → padded
    "Tokyo;Japan;ok\n"
)

PY_SOURCE = "def main():\n    return 42\n"

TSV_CAPITALS = (
    "country\tcapital\n"
    "France\tParis\n"
    "Japan\tTokyo\n"
    "Italy\tRome\n"
)


def source_rows() -> list[dict]:
    rows = [
        ("acme/movies", "data/films.csv", "a" * 40, "csv", MOVIE_CSV),
        ("acme/geo", "data/capitals.csv", "b" * 40, "csv", CITY_CSV),
        ("acme/geo", "data/capitals_vertical.csv", "c" * 40, "csv", CITY_VERTICAL_CSV),
        ("acme/metrics", "data/readings.csv", "d" * 40, "csv", NOHEADER_NUMERIC_CSV),
        ("acme/movies", "data/films_detail.csv", "e" * 40, "csv", LITERAL_CONTEXT_CSV),
        ("acme/dirty", "data/ragged.csv", "f" * 40, "csv", RAGGED_CSV),
        ("acme/code", "src/main.py", "0" * 40, "python", PY_SOURCE),
        ("acme/geo", "data/capitals.tsv", "1" * 40, "tsv", TSV_CAPITALS),
    ]
    return [
        {"repo": r, "path": p, "commit": c, "lang": lg, "content": ct}
        for (r, p, c, lg, ct) in rows
    ]


def table_id_of(repo: str, path: str, commit: str) -> str:
    """table_id = sha256(repo ∥ 0x1f ∥ path ∥ 0x1f ∥ commit) — SURVEY §1.3."""
    return hashlib.sha256(
        ("\x1f".join((repo, path, commit))).encode("utf-8")
    ).hexdigest()


def content_sha(content: str) -> str:
    return hashlib.sha256(content.encode("utf-8")).hexdigest()
