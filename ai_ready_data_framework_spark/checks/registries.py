"""Metadata registries for the assessment engine.

The reference's metadata-level checks introspect catalog/config state
(e.g. "fraction of data objects with machine-readable semantic
descriptions", /root/reference/factors/requirements.yaml:9-11). The
reference defines no storage for that metadata (documentation-only
standard), so the engine defines it: small declarative registries that
become broadcast-size DataFrames. A real deployment would load these
from its catalog; the shapes below describe the test-corpus "data
product" (FIXTURES.md) and are the engine's catalog-of-record.

Scale note: every registry is O(tables x columns) — catalog-sized, not
data-sized. They broadcast in joins against data-level scans.
"""

from __future__ import annotations

# --- assets -----------------------------------------------------------------
# name -> (owner, target_workloads, format, kind)
ASSETS: dict[str, dict] = {
    "region": {"owner": "ref-data", "workloads": ("serving", "training"), "format": "parquet", "kind": "dimension"},
    "nation": {"owner": "ref-data", "workloads": ("serving", "training"), "format": "parquet", "kind": "dimension"},
    "customer": {"owner": "crm", "workloads": ("serving", "training"), "format": "parquet", "kind": "entity", "personal": True},
    "supplier": {"owner": "procurement", "workloads": ("serving", "training"), "format": "parquet", "kind": "entity"},
    "part": {"owner": "catalog", "workloads": ("serving", "training"), "format": "parquet", "kind": "entity"},
    "orders": {"owner": "sales", "workloads": ("serving", "training"), "format": "parquet", "kind": "fact"},
    "lineitem": {"owner": "sales", "workloads": ("training",), "format": "parquet", "kind": "fact"},
    "events": {"owner": "platform", "workloads": ("serving", "training"), "format": "parquet", "kind": "stream"},
    "documents": {"owner": "content", "workloads": ("training",), "format": "parquet", "kind": "corpus", "external": True},
    "embeddings": {"owner": "ml", "workloads": ("serving", "training"), "format": "parquet", "kind": "vector"},
}

# --- primary / natural keys (entity_identifier_declaration, :17-19) --------
PRIMARY_KEYS: dict[str, str] = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
    # lineitem's key is composite (l_orderkey, l_linenumber) — declared
    # as a natural key expression:
    "lineitem": "l_orderkey,l_linenumber",
}

# --- declared relationships (relationship_declaration, :13-15) --------------
# (child_table, child_col, parent_table, parent_col)
FOREIGN_KEYS: list[tuple[str, str, str, str]] = [
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("events", "user_id", "customer", "c_custkey"),
    ("embeddings", "vec_id", "documents", "doc_id"),
]

# --- semantic documentation (semantic_documentation, :9-11) -----------------
# (table, column) -> description; coverage is measured against all columns.
COLUMN_DESCRIPTIONS: dict[tuple[str, str], str] = {
    ("region", "r_regionkey"): "surrogate key of the region",
    ("region", "r_name"): "region display name",
    ("nation", "n_nationkey"): "surrogate key of the nation",
    ("nation", "n_name"): "nation display name",
    ("nation", "n_regionkey"): "region the nation belongs to",
    ("customer", "c_custkey"): "customer surrogate key",
    ("customer", "c_name"): "customer display name",
    ("customer", "c_nationkey"): "nation of residence",
    ("customer", "c_acctbal"): "current account balance",
    ("customer", "c_mktsegment"): "market segment assignment",
    ("supplier", "s_suppkey"): "supplier surrogate key",
    ("supplier", "s_name"): "supplier display name",
    ("supplier", "s_nationkey"): "nation of incorporation",
    ("supplier", "s_acctbal"): "current account balance",
    ("part", "p_partkey"): "part surrogate key",
    ("part", "p_name"): "part display name",
    ("part", "p_brand"): "brand label",
    ("part", "p_type"): "part type taxonomy string",
    ("part", "p_size"): "integer size class",
    ("part", "p_retailprice"): "list price",
    ("orders", "o_orderkey"): "order surrogate key",
    ("orders", "o_custkey"): "ordering customer",
    ("orders", "o_orderstatus"): "lifecycle status code",
    ("orders", "o_totalprice"): "total order value",
    ("orders", "o_orderdate"): "date the order was placed",
    ("orders", "o_orderpriority"): "priority bucket",
    ("lineitem", "l_orderkey"): "owning order",
    ("lineitem", "l_partkey"): "part sold",
    ("lineitem", "l_suppkey"): "fulfilling supplier",
    ("lineitem", "l_linenumber"): "position within the order",
    ("lineitem", "l_quantity"): "units sold",
    ("lineitem", "l_extendedprice"): "quantity x unit price",
    ("lineitem", "l_discount"): "fractional discount",
    ("lineitem", "l_tax"): "fractional tax",
    ("lineitem", "l_returnflag"): "return status flag",
    ("lineitem", "l_linestatus"): "fulfillment status flag",
    ("lineitem", "l_shipdate"): "ship date",
    ("events", "event_id"): "unique event correlation id",
    ("events", "ts"): "event occurrence time (UTC)",
    ("events", "user_id"): "acting user",
    ("events", "event_type"): "event taxonomy code",
    ("events", "value"): "numeric event measure",
    ("events", "props"): "JSON property bag",
    ("documents", "doc_id"): "document surrogate key",
    ("documents", "text"): "raw document text",
    ("documents", "lang"): "declared language code",
    ("documents", "source"): "ingestion source id",
    ("documents", "n_chars"): "declared character count",
    ("embeddings", "vec_id"): "vector key aligned with doc_id",
    ("embeddings", "embedding"): "64-dim float embedding",
    ("embeddings", "label"): "class label",
}

# --- glossary linkage (business_glossary_linkage, :29-31) -------------------
GLOSSARY_LINKS: dict[tuple[str, str], str] = {
    ("customer", "c_mktsegment"): "market-segment",
    ("customer", "c_acctbal"): "account-balance",
    ("orders", "o_totalprice"): "order-value",
    ("orders", "o_orderpriority"): "order-priority",
    ("lineitem", "l_extendedprice"): "extended-price",
    ("lineitem", "l_discount"): "discount-rate",
    ("events", "event_type"): "event-taxonomy",
    ("documents", "lang"): "language-code",
    ("documents", "source"): "content-source",
    ("embeddings", "label"): "class-label",
}

# --- units (unit_of_measure_declaration, :37-39) ----------------------------
# numeric (table, column) -> unit
UNITS: dict[tuple[str, str], str] = {
    ("customer", "c_acctbal"): "USD",
    ("supplier", "s_acctbal"): "USD",
    ("part", "p_retailprice"): "USD",
    ("part", "p_size"): "size-class",
    ("orders", "o_totalprice"): "USD",
    ("lineitem", "l_quantity"): "count",
    ("lineitem", "l_extendedprice"): "USD",
    ("lineitem", "l_discount"): "ratio",
    ("lineitem", "l_tax"): "ratio",
    ("events", "value"): "score",
    ("documents", "n_chars"): "characters",
}

# --- constraints (constraint_declaration, :33-35) ---------------------------
# (table, column, kind, lo, hi) — kind in {not_null, unique, range}
CONSTRAINTS: list[tuple[str, str, str, float | None, float | None]] = [
    ("customer", "c_custkey", "unique", None, None),
    ("orders", "o_orderkey", "unique", None, None),
    ("events", "event_id", "unique", None, None),
    ("documents", "doc_id", "unique", None, None),
    ("embeddings", "vec_id", "unique", None, None),
    ("lineitem", "l_discount", "range", 0.0, 1.0),
    ("lineitem", "l_tax", "range", 0.0, 1.0),
    ("lineitem", "l_quantity", "range", 0.0, 1e9),
    ("orders", "o_totalprice", "range", 0.0, 1e12),
    ("events", "ts", "not_null", None, None),
    ("events", "user_id", "not_null", None, None),
    ("documents", "text", "not_null", None, None),
]

# --- temporal scope (temporal_scope_declaration, :21-23) --------------------
# table -> event-time column (None = atemporal reference data)
TEMPORAL_SCOPE: dict[str, str | None] = {
    "orders": "o_orderdate",
    "lineitem": "l_shipdate",
    "events": "ts",
    "region": None,
    "nation": None,
    "customer": None,
    "supplier": None,
    "part": None,
    "documents": None,
    "embeddings": None,
}

# --- lineage (lineage_completeness :132-134, dependency_graph :148-150) ----
# (src, dst, transform) — sources are external systems; derived assets
# are engine materializations.
LINEAGE_EDGES: list[tuple[str, str, str]] = [
    ("src:erp", "region", "ingest"),
    ("src:erp", "nation", "ingest"),
    ("src:crm", "customer", "ingest"),
    ("src:erp", "supplier", "ingest"),
    ("src:erp", "part", "ingest"),
    ("src:oms", "orders", "ingest"),
    ("src:oms", "lineitem", "ingest"),
    ("src:tracker", "events", "ingest"),
    ("src:crawler", "documents", "ingest"),
    ("documents", "embeddings", "embed"),
    ("documents", "chunks", "q_chunk"),
    ("documents", "masked_documents", "q_mask_pii"),
    ("events", "hourly_features", "hourly_event_features"),
    ("hourly_features", "training_matrix", "q_join_asof"),
    ("orders", "training_matrix", "q_join_asof"),
]

# --- provenance / licenses / purposes / tags / consent ----------------------
PROVENANCE: dict[str, str] = {
    "region": "src:erp", "nation": "src:erp", "customer": "src:crm",
    "supplier": "src:erp", "part": "src:erp", "orders": "src:oms",
    "lineitem": "src:oms", "events": "src:tracker",
    "documents": "src:crawler", "embeddings": "derived:documents",
}

LICENSES: dict[str, str] = {  # external datasets only (license_compliance :185-187)
    "documents": "CC-BY-SA-4.0",
}

PURPOSES: dict[str, tuple[str, ...]] = {  # purpose_limitation (:181-183)
    "customer": ("analytics", "model-training"),
    "events": ("analytics", "model-training"),
    "documents": ("model-training",),
    "embeddings": ("model-training", "retrieval"),
    "orders": ("analytics",),
    "lineitem": ("analytics",),
    "region": ("analytics",),
    "nation": ("analytics",),
    "supplier": ("analytics",),
    "part": ("analytics",),
}

CLASSIFICATION_TAGS: dict[str, str] = {  # classification (:165-167)
    "customer": "pii",
    "events": "behavioral",
    "documents": "public-content",
    "embeddings": "derived",
    "orders": "transactional",
    "lineitem": "transactional",
    "region": "reference",
    "nation": "reference",
    "supplier": "business",
    "part": "business",
}

# --- read-side masking (field_masking :169-171): columns hashed on
# EVERY read through checks/enforce.py::read_enforced. documents.text/
# source mirror q_mask_pii's graded column_hash legs; customer.c_name
# is the pii-classified entity's direct identifier.
MASKED_FIELDS: dict[str, tuple[str, ...]] = {
    "documents": ("text", "source"),
    "customer": ("c_name",),
}

CONSENT_BASIS: dict[str, str] = {  # consent_coverage (:193-195)
    "customer": "contract",
    "events": "legitimate-interest",
}

RETENTION_DAYS: dict[str, int] = {  # retention_policy (:197-199)
    "events": 3650,
    "orders": 3650,
    "lineitem": 3650,
}

# --- pipelines (incremental_update_coverage :123-125, change_detection) ----
# name -> {incremental: bool, cdc: bool, doc: str}
PIPELINES: dict[str, dict] = {
    "ingest_events": {"incremental": True, "cdc": True, "doc": "stream append from tracker"},
    "ingest_orders": {"incremental": True, "cdc": True, "doc": "CDC feed from OMS"},
    "ingest_lineitem": {"incremental": True, "cdc": True, "doc": "CDC feed from OMS"},
    "hourly_features": {"incremental": True, "cdc": True, "doc": "watermarked streaming agg"},
    "chunk_documents": {"incremental": True, "cdc": False, "doc": "per-file incremental chunking"},
    "embed_documents": {"incremental": True, "cdc": False, "doc": "per-file embedding"},
    "assessment_run": {"incremental": False, "cdc": False, "doc": "full-scan scoring"},
}

# asset -> the pipeline that maintains it (change_detection :91-93)
ASSET_PIPELINES: dict[str, str] = {
    "events": "ingest_events",
    "orders": "ingest_orders",
    "lineitem": "ingest_lineitem",
}

# assets sharing one business timeline for freshness anchoring
# (data_freshness :95-97): orders and lineitem advance together.
TIMELINE_DOMAINS: dict[str, str] = {
    "orders": "oms",
    "lineitem": "oms",
    "events": "tracker",
}

# --- features (feature_materialization_coverage :58-60) ---------------------
# feature -> needs offline+online materialization
FEATURES: dict[str, dict] = {
    "user_hourly_event_count": {"offline": "hourly_features", "online": "hourly_features_online"},
    "user_hourly_value_sum": {"offline": "hourly_features", "online": "hourly_features_online"},
}

# quasi-identifier set for k-anonymity (anonymization_effectiveness)
QUASI_IDENTIFIERS: tuple[str, ...] = ("lang", "source")

# SLAs / thresholds
FRESHNESS_SLA_HOURS = 48
FEATURE_STALENESS_HOURS = 96
SERVING_P99_SLA_MS = 5000.0  # local Spark SQL path; honest SLA (SURVEY.md §6 caveat)
BATCH_THROUGHPUT_TARGET_ROWS_S = 200_000.0
PROPAGATION_SLA_S = 60.0
KANON_K = 5
RECALL_TARGET = 0.6
