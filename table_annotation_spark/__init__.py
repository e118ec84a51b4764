"""table_annotation_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the capabilities of Orange-OpenSource/Table-Annotation
(DAGOBAH): table preprocessing, entity lookup, CEA/CTA/CPA annotation, and
triple materialization — re-expressed as declarative DataFrame plans plus
Arrow-batched pandas UDFs.

Reference semantics are documented per-operator with `file:line` citations
into /root/reference (see SURVEY.md §2); the implementation here is
Spark-first, not a port.
"""

__version__ = "0.1.0"
