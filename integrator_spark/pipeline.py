"""The integration pipeline — the reference's end-to-end flow as one
composable API (SURVEY.md §3.1):

    ingest (typed source) → harmonize (rule tables, provenance)
    → validate (integrity assertions) → publish (partitioned parquet)

Each stage is a thin composition of the operators in ``operators/``;
the pipeline object only sequences them and carries the batch
metadata. Nothing here collects to the driver except the (small)
validation report, so the same code runs unchanged at cluster scale —
publish writes are partitioned by the harmonized dimension, which is
what downstream partition-pruned readers slice on.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.harmonize import (
    apply_rules,
    assertion_report,
    rules_frame,
    with_lineage,
)


@dataclass
class PipelineResult:
    published_path: str
    n_published: int
    validation: dict[str, int]

    @property
    def is_valid(self) -> bool:
        return all(v == 0 for v in self.validation.values())


@dataclass
class IntegrationPipeline:
    """Rule-driven harmonization pipeline for one source column."""

    spark: SparkSession
    rules: list[tuple[str, str, str]]
    src_col: str
    batch_id: str
    key_cols: list[str] = field(default_factory=list)

    def harmonize(self, df: DataFrame) -> DataFrame:
        """Stage 2: lineage + broadcast rule application."""
        rules_df = rules_frame(self.spark, self.rules)
        return apply_rules(with_lineage(df, self.batch_id),
                           rules_df, self.src_col)

    def validate(self, harmonized: DataFrame) -> DataFrame:
        """Stage 3: integrity assertions on the harmonized output —
        unmapped source values and null keys are integration failures,
        not data to silently publish."""
        checks = {
            "unmapped_values":
                harmonized.filter(F.col("canonical") == "__unmapped__"),
            "null_canonical": harmonized.filter(F.col("canonical").isNull()),
        }
        for kc in self.key_cols:
            checks[f"null_key_{kc}"] = harmonized.filter(F.col(kc).isNull())
        return assertion_report(checks)

    def publish(self, harmonized: DataFrame, path: str) -> None:
        """Stage 4: partitioned parquet, sliceable by the harmonized
        dimension (the engine's analog of the cube publish)."""
        (harmonized.write.mode("overwrite")
         .partitionBy("canonical").parquet(path))

    def run(self, df: DataFrame, sink_path: str,
            allow_unmapped: bool = True) -> PipelineResult:
        harmonized = self.harmonize(df)
        validation = {r["check_name"]: r["n_violations"]
                      for r in self.validate(harmonized).collect()}
        if not allow_unmapped and validation.get("unmapped_values", 0) > 0:
            raise ValueError(
                f"harmonization left {validation['unmapped_values']} rows "
                f"unmapped in batch {self.batch_id}")
        self.publish(harmonized, sink_path)
        n = self.spark.read.parquet(sink_path).count()
        return PipelineResult(published_path=sink_path, n_published=n,
                              validation=validation)
