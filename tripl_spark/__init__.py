"""tripl_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ``metasoarous/tripl`` (an EAV triple
store; see ``/root/reference/tripl/tripl.py``), re-expressed Spark-first:

* **Layer A (facts layer)** — the triple-store surface: document →
  triple flattening, ``match`` conjunctive pattern queries, ``pull``
  graph projections, the Entity view, JSON dump/load, CSV attr-map
  ingest (``tripl_spark.core``, ``tripl_spark.plans``,
  ``tripl_spark.sources``).
* **Layer B (analytics layer)** — relational/OLAP operators over plain
  DataFrames (joins, aggregation, windows, top-k, set ops), plus
  LLM-data-pipeline operators (dedup, similarity search, text
  analysis, multimodal plumbing) and Structured Streaming
  (``tripl_spark.queries``, ``tripl_spark.operators``,
  ``tripl_spark.streaming``).

Everything is DataFrame/SQL-first so Catalyst handles pushdown,
pruning, join selection and AQE; Python UDFs appear only as
Arrow-batched Pandas UDFs where built-ins genuinely can't express the
semantics.
"""

__version__ = "0.1.0"

from tripl_spark.core.store import TripleStore  # noqa: F401
from tripl_spark.functions.namespaces import (  # noqa: F401
    entity_cons,
    get_in,
    namespaced,
    reverse_lookup,
    some,
)
