"""Model-inference boundary (SURVEY.md §2.10, §7.0).

Every AI call in the reference is an eager per-item HTTP request with
15 s sleeps (ingestion/table_extractor.py:424,516). Here inference is a
DataFrame stage: Arrow-batched ``mapInPandas`` with a per-partition model
client, and a deterministic ``NullModel`` so the entire pipeline runs
without any network (CI mode — mirroring the reference's ubiquitous
rule-based fallbacks, ingestion/document_classifier.py:313-325). Rule
paths are native Column expressions; only the model path pays the Python
boundary.
"""

from data_ingestion_din_spark.ai.classify import (  # noqa: F401
    CLASS_LABELS,
    classify_documents,
    rule_classify,
)
from data_ingestion_din_spark.ai.infer import NullModel, map_inference  # noqa: F401
