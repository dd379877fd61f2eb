"""Query plans: named, oracle-checked dataflows over the fixture tables.

Importing the submodules populates the registry (``QUERIES`` / ``ORACLES``)
consumed by ``__spark_entry__.py``.
"""

from data_ingestion_din_spark.plans.registry import ORACLES, QUERIES, query  # noqa: F401

# Import for registration side effects.
from data_ingestion_din_spark.plans import relational  # noqa: F401,E402
from data_ingestion_din_spark.plans import events  # noqa: F401,E402
from data_ingestion_din_spark.plans import events_ext  # noqa: F401,E402
from data_ingestion_din_spark.plans import text_pipeline  # noqa: F401,E402
from data_ingestion_din_spark.plans import lm_queries  # noqa: F401,E402
from data_ingestion_din_spark.plans import unigram_queries  # noqa: F401,E402
from data_ingestion_din_spark.plans import dedup_queries  # noqa: F401,E402
from data_ingestion_din_spark.plans import dedup_grids  # noqa: F401,E402
from data_ingestion_din_spark.plans import similarity_queries  # noqa: F401,E402
from data_ingestion_din_spark.plans import similarity_sq  # noqa: F401,E402
from data_ingestion_din_spark.plans import graph_queries  # noqa: F401,E402
from data_ingestion_din_spark.plans import similarity_filtered  # noqa: F401,E402
from data_ingestion_din_spark.plans import similarity_bq  # noqa: F401,E402
from data_ingestion_din_spark.plans import similarity_proj  # noqa: F401,E402
from data_ingestion_din_spark.plans import doc_blocks  # noqa: F401,E402
from data_ingestion_din_spark.plans import table_queries  # noqa: F401,E402
from data_ingestion_din_spark.plans import retrieval_queries  # noqa: F401,E402
from data_ingestion_din_spark.plans import asof_range  # noqa: F401,E402
from data_ingestion_din_spark.plans import chunk_queries  # noqa: F401,E402
from data_ingestion_din_spark.plans import pipeline_e2e  # noqa: F401,E402
from data_ingestion_din_spark.plans import multimodal_queries  # noqa: F401,E402
from data_ingestion_din_spark.plans import relational_ext  # noqa: F401,E402
from data_ingestion_din_spark.plans import enrichment_queries  # noqa: F401,E402
from data_ingestion_din_spark.plans import analytic_ext  # noqa: F401,E402
from data_ingestion_din_spark.plans import streaming_cdc  # noqa: F401,E402
from data_ingestion_din_spark.plans import streaming_indexes  # noqa: F401,E402
from data_ingestion_din_spark.plans import streaming_gates  # noqa: F401,E402
from data_ingestion_din_spark.plans import streaming_sketches  # noqa: F401,E402
from data_ingestion_din_spark.plans import curation_queries  # noqa: F401,E402
from data_ingestion_din_spark.plans import curation_audits  # noqa: F401,E402
from data_ingestion_din_spark.plans import partsupp_queries  # noqa: F401,E402
from data_ingestion_din_spark.plans import overlay_queries  # noqa: F401,E402
from data_ingestion_din_spark.plans import eval_queries  # noqa: F401,E402
from data_ingestion_din_spark.plans import dq_queries  # noqa: F401,E402

# Late-bind cross-module oracle shares (no import-order dependency).
from data_ingestion_din_spark.plans.registry import resolve_oracle_refs  # noqa: E402

resolve_oracle_refs()
