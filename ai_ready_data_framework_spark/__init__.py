"""PySpark-native analytics engine with the capabilities of the
``jacobprall/ai-ready-data-framework`` open standard (an AI-ready-data
assessment spec), re-expressed Spark-first.

The reference (read-only at /root/reference) is a documentation-only
standard: 48 requirement checks over five factors
(factors/requirements.yaml:1-203), each returning a normalized float in
[0, 1] (README.md:43-45). This package implements:

- the full relational/dataflow operator core those checks require
  (``operators/``),
- the 48-check assessment engine itself (``checks/``),
- temporal / feature-store operators incl. point-in-time (as-of) joins
  (``operators/temporal.py``),
- LLM-training-data pipeline operators: dedup (exact/MinHash/SimHash),
  similarity search, chunking, text analysis, PII masking, multimodal
  column plumbing (``operators/ai.py``, ``operators/multimodal.py``),
- batch/streaming parity via shared transform functions
  (``streaming/``).

Design rules (SURVEY.md section 4):
- Declarative DataFrame/SQL plans only; Catalyst + AQE pick physical
  strategies. No RDDs in the hot path.
- No Python row-at-a-time UDFs in any hot path; Arrow-batched pandas
  UDFs only where built-ins cannot express the semantics.
- Broadcast small dimensions, partition/bucket big fact tables, enable
  AQE skew handling — every operator is written for 100 TB inputs even
  though tests run at small scale factors.
"""

from ai_ready_data_framework_spark.session import get_spark
from ai_ready_data_framework_spark.io import load_tables, TABLE_NAMES

__all__ = ["get_spark", "load_tables", "TABLE_NAMES"]
__version__ = "0.1.0"
