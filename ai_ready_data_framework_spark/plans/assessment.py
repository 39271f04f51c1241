"""Assessment entry point — the reference's primary operation
(SURVEY.md §3.1; /root/reference/README.md:43-45).

Flow (definitions.md:23-25, requirements.yaml:3-5):
1. declare a data product (name, owner, assets, target workload) —
   defaults to all discovered assets as a single unnamed product;
2. select requirement checks matching the workload tag;
3. run each check → normalized float in [0,1];
4. roll scores up by factor for dashboards.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_ready_data_framework_spark.checks.engine import factor_scores, run_assessment
from ai_ready_data_framework_spark.registry import query


@dataclass(frozen=True)
class DataProduct:
    """A named, bounded set of data assets with a defined owner serving
    a target workload (definitions.md:23-25)."""

    name: str = "(unnamed)"
    owner: str | None = None
    assets: tuple[str, ...] = ()  # empty = all discovered assets
    workload: str | None = None  # None = both serving and training

    @classmethod
    def from_dict(cls, cfg: dict) -> "DataProduct":
        return cls(
            name=cfg.get("name", "(unnamed)"),
            owner=cfg.get("owner"),
            assets=tuple(cfg.get("assets", ())),
            workload=cfg.get("workload"),
        )


def assess(
    spark: SparkSession,
    sf_dir: str,
    product: DataProduct | None = None,
    run_streaming: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Run the full assessment for a product; returns (check_scores,
    factor_rollup)."""
    product = product or DataProduct()
    scores = run_assessment(
        spark, sf_dir, workload=product.workload, run_streaming=run_streaming
    ).withColumn("product", F.lit(product.name))
    return scores, factor_scores(scores)


@query("q_assessment")  # engine-level measurement (timings, LSH, streaming
# parity) — not ANSI-expressible; rows-only contract
def q_assessment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's primary operation as a declared query: all 48
    requirement checks over the default (unnamed, both-workload) data
    product. Streaming parity runs in fast mode (declared-parity) so
    the driver's per-query budget holds; the full streaming measurement
    runs in tests."""
    scores, _ = assess(spark, sf_dir, run_streaming=False)
    return scores.select("requirement", "factor", "workload", "kind", "value")
